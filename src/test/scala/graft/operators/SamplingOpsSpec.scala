package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class SamplingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables(spark, TestSpark.sfDir, "documents")

  test("hashSplit is disjoint, complete, roughly sized, and STABLE under repartitioning") {
    val (train, test) = SamplingOps.hashSplit(docs, "doc_id", 80, seed = 42L)
    val trainIds = train.select($"doc_id").as[Long].collect().toSet
    val testIds = test.select($"doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    assert((trainIds & testIds).isEmpty)
    assert((trainIds | testIds) == all)
    val frac = trainIds.size.toDouble / all.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")

    // The property randomSplit does NOT have: identical membership after a
    // layout change (different partitioning = different cluster shape).
    val (train2, _) = SamplingOps.hashSplit(docs.repartition(7), "doc_id", 80, 42L)
    assert(train2.select($"doc_id").as[Long].collect().toSet == trainIds)
  }

  test("hashSample is deterministic per seed and varies across seeds") {
    val a1 = SamplingOps.hashSample(docs, "doc_id", 20, 1L)
      .select($"doc_id").as[Long].collect().toSet
    val a2 = SamplingOps.hashSample(docs, "doc_id", 20, 1L)
      .select($"doc_id").as[Long].collect().toSet
    val b = SamplingOps.hashSample(docs, "doc_id", 20, 2L)
      .select($"doc_id").as[Long].collect().toSet
    assert(a1 == a2)
    assert(a1 != b)
  }

  test("stratifiedFixedN spreads a hot stratum over many salt groups (two-phase)") {
    // One 5000-row stratum. Phase 1 must reduce it in PARALLEL groups —
    // more than one group contributing proves no single-task funnel — and
    // phase 2's input stays bounded by splits*n regardless of stratum size.
    val n = 5; val splits = 8
    val hot = (1L to 5000L).map(i => ("hot", i)).toDF("lang", "doc_id")
    val reduced = SamplingOps.localTopN(hot, "lang", "doc_id", n, seed = 7L, splits)
    val perGroup = reduced.groupBy($"_graft_salt").count()
      .as[(Long, Long)].collect().toMap
    assert(perGroup.size > 1, s"hot stratum funneled through one group: $perGroup")
    assert(perGroup.values.forall(_ <= n.toLong))
    assert(reduced.count() <= (splits * n).toLong)

    // The two-phase pick equals the direct global top-n by (hash, id).
    val expected = hot
      .withColumn("rk", org.apache.spark.sql.functions.xxhash64($"doc_id",
        org.apache.spark.sql.functions.lit(7L)))
      .orderBy($"rk", $"doc_id").limit(n)
      .select($"doc_id").as[Long].collect().toSet
    val got = SamplingOps.stratifiedFixedN(hot, "lang", "doc_id", n, 7L, splits)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("a stratum smaller than n contributes all of its rows") {
    val df = (Seq(("tiny", 1L), ("tiny", 2L)) ++
      (10L to 200L).map(i => ("big", i))).toDF("lang", "doc_id")
    val out = SamplingOps.stratifiedFixedN(df, "lang", "doc_id", n = 5, seed = 3L)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(out == Map("tiny" -> 2L, "big" -> 5L))
  }

  test("stratifiedFixedN returns exactly n per stratum, deterministically") {
    val n = 5
    val sampled = SamplingOps.stratifiedFixedN(docs, "lang", "doc_id", n, seed = 7L)
    val counts = sampled.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val strata = docs.select($"lang").distinct().as[String].collect()
    assert(counts.keySet == strata.toSet)
    assert(counts.values.forall(_ == n.toLong), counts)
    val again = SamplingOps.stratifiedFixedN(docs.repartition(5), "lang", "doc_id", n, 7L)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == sampled.select($"doc_id").as[Long].collect().toSet)
  }

  test("sourceMixture: per-source rates hold, zero-rate excludes, layout-stable") {
    val rates = Map("src0" -> 100, "src1" -> 50, "src2" -> 0)
    def run(df: org.apache.spark.sql.DataFrame) =
      SamplingOps.sourceMixture(df, "source", "doc_id", rates,
        defaultPct = 25, seed = 11L)
    val kept = run(docs)
    val bySrc = kept.groupBy($"source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val totalPerSrc = docs.groupBy($"source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySrc("src0") == totalPerSrc("src0"))          // 100% keeps all
    assert(!bySrc.contains("src2"))                       // 0% keeps none
    assert(bySrc("src1") > 0 && bySrc("src1") < totalPerSrc("src1"))
    // Pure (id, seed) membership: identical under any repartitioning.
    val a = kept.select($"doc_id").as[Long].collect().toSet
    val b = run(docs.repartition(7)).select($"doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("weightedSample: top-k plan, layout-stable membership, n rows") {
    def run(df: org.apache.spark.sql.DataFrame) =
      SamplingOps.weightedSample(df, "doc_id", "n_chars", n = 50, seed = 7L)
    val picked = run(docs)
    // TakeOrdered carries <= n rows per partition to the driver — a global
    // Sort before the limit would be the 100 TB mistake.
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected TakeOrdered plan:\n$plan")
    val ids = picked.select($"doc_id").as[Long].collect()
    assert(ids.length == 50 && ids.toSet.size == 50)
    val again = run(docs.repartition(13)).select($"doc_id").as[Long].collect()
    assert(ids.toSet == again.toSet, "membership must be layout-independent")
  }

  test("weightedSample favors heavy rows across seeds (E-S weighting)") {
    // 100 rows: one with weight 200, the rest weight 1. Over 40 seeds the
    // heavy row should make the top-10 far more often than a uniform
    // sampler's ~10% (its E-S inclusion probability is near 1).
    val df = (0L until 100L).map(i => (i, if (i == 7L) 200 else 1))
      .toDF("id", "w")
    val hits = (1 to 40).count { s =>
      SamplingOps.weightedSample(df, "id", "w", n = 10, seed = s.toLong)
        .select($"id").as[Long].collect().contains(7L)
    }
    assert(hits >= 35, s"heavy row picked only $hits/40 times")
  }

  test("epochShuffle: total order is layout-independent and epoch-decorrelated") {
    val df = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def order(d: org.apache.spark.sql.DataFrame, epoch: Long): Seq[Long] =
      SamplingOps.epochShuffle(d, "doc_id", epoch)
        .select($"doc_id").as[Long].collect().toSeq
    val e1 = order(df, 1L)
    assert(order(df.repartition(7), 1L) == e1,
      "the epoch order must not depend on the input layout")
    val e2 = order(df, 2L)
    assert(e1 != e2, "different epochs must derive different permutations")
    assert(e1.sorted == e2.sorted, "every epoch is a permutation of the corpus")
    assert(e1 != e1.sorted, "epoch 1 must actually shuffle, not echo id order")
  }

  test("groupSplit keeps every group on one side; sides are group-proportional") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // 200 groups x 5 members, member ids deliberately interleaved so a
    // row-keyed split WOULD scatter a group across sides.
    val rows = (0 until 1000).map(i => (i.toLong, (i % 200).toLong))
      .toDF("doc_id", "grp")
    val assigned = SamplingOps.groupSplit(rows, "grp", trainPct = 80, seed = 7L)
    // Leak gate: no group spans sides.
    val leaked = assigned.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter($"ns" > 1).count()
    assert(leaked == 0L)
    // Sizing is ~80/20 in GROUPS (every group carries 5 rows here).
    val trainGroups = assigned.filter($"split" === "train")
      .select($"grp").distinct().count()
    assert(trainGroups >= 140 && trainGroups <= 190, s"train groups: $trainGroups")
    // Stable under layout.
    val again = SamplingOps.groupSplit(rows.repartition(13), "grp", 80, 7L)
      .filter($"split" === "train").select($"doc_id").as[Long].collect().toSet
    val first = assigned.filter($"split" === "train")
      .select($"doc_id").as[Long].collect().toSet
    assert(again == first)
  }

  test("temperatureMixture derives sqrt-damped rates; smallest source keeps 100%") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 6400).map(i => (i.toLong, "web")) ++
      (10000 until 10400).map(i => (i.toLong, "code")) ++
      (20000 until 20100).map(i => (i.toLong, "forum"))
    val df = rows.toDF("doc_id", "source")
    val kept = SamplingOps.temperatureMixture(df, "source", "doc_id", seed = 3L)
    // Exact derived rates: floor(100*sqrt(100/6400)) = 12, sqrt(100/400) = 50%.
    val rates = kept.select(col("source"), col("_graft_rate"))
      .distinct().as[(String, Long)].collect().toMap
    assert(rates == Map("web" -> 12L, "code" -> 50L, "forum" -> 100L), rates)
    val counts = kept.groupBy(col("source")).count()
      .as[(String, Long)].collect().toMap
    assert(counts("forum") == 100L, "smallest source fully kept")
    // Hash membership is ~rate with binomial slack.
    assert(counts("code") > 120 && counts("code") < 280, counts)
    assert(counts("web") > 550 && counts("web") < 1000, counts)
    // Layout-stable membership.
    val again = SamplingOps.temperatureMixture(
      df.repartition(17), "source", "doc_id", seed = 3L)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == kept.select(col("doc_id")).as[Long].collect().toSet)
  }

  test("temperatureMixture clamps a 10^4x-dominant source to 1%, never 0") {
    import org.apache.spark.sql.functions.col
    // 1-row tail vs 50000-row giant: floor(100*sqrt(1/50000)) = 0 — the
    // unclamped rate would silently DROP the giant entirely (the
    // round-10 advisory). The clamp holds it at 1%.
    val rows = (0L until 50000L).map(i => (i, "giant")) :+ (99999L, "tail")
    val kept = SamplingOps.temperatureMixture(
      rows.toDF("doc_id", "source"), "source", "doc_id", seed = 5L)
    val rates = kept.select(col("source"), col("_graft_rate"))
      .distinct().as[(String, Long)].collect().toMap
    assert(rates == Map("giant" -> 1L, "tail" -> 100L), rates)
    val n = kept.filter(col("source") === "giant").count()
    assert(n > 200 && n < 900, s"~1% of 50000 expected, got $n")
  }

  test("epochShuffle plans a range-partitioned distributed sort") {
    val df = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val plan = SamplingOps.epochShuffle(df, "doc_id", 1L)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"global order must range-partition, never single-task sort:\n$plan")
  }
}
