package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checks for the two operators the DuckDB oracle cannot hash-match:
  * approx_count_distinct (HLL sketches aren't cross-engine comparable — the
  * driver records a rows-only check for q20) and current_timestamp
  * (non-deterministic by nature). Both get in-repo contracts instead.
  */
class AccuracySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q20 approx_count_distinct within ±5% of q19 exact counts per group") {
    val exact = SparkEntry.queries("q19_count_distinct")(spark, TestSpark.sfDir)
      .select($"l_returnflag", $"n_parts").as[(String, Long)].collect().toMap
    val approx = SparkEntry.queries("q20_approx_distinct")(spark, TestSpark.sfDir)
      .select($"l_returnflag", $"approx_parts").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, est) <- approx) {
      val truth = exact(flag).toDouble
      val relErr = math.abs(est - truth) / truth
      // Spark's HLL++ default rsd is 5%; the fixture cardinalities (~hundreds
      // to thousands) sit well inside the sketch's accurate range.
      assert(relErr <= 0.05, f"$flag: approx=$est exact=${truth}%.0f relErr=${relErr * 100}%.2f%%")
    }
  }

  test("percentile_approx within 1% of the exact percentile per group") {
    val both = Tables(spark, TestSpark.sfDir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        percentile($"l_extendedprice", lit(0.5)).as("exact"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("approx"))
      .as[(String, Double, Double)].collect()
    assert(both.nonEmpty)
    for ((flag, exact, approx) <- both) {
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.01, f"$flag: approx=$approx exact=$exact relErr=${relErr * 100}%.3f%%")
    }
  }

  test("q100 percentiles_approx within 1% of q39 exact per group and column") {
    // q100 is the 100 TB percentile path (bounded GK sketch); its driver
    // check is rows+schema only, so the VALUE contract lives here: every
    // approximate percentile within 1% of q39's exact answer. GK's actual
    // guarantee is rank error ≤ n/accuracy = n/10000 — far tighter than 1%
    // in value on these distributions.
    val cols = Seq("price_p25", "price_p50", "price_p75", "qty_p90")
    def byFlag(q: String) =
      SparkEntry.queries(q)(spark, TestSpark.sfDir).collect()
        .map(r => r.getString(0) -> cols.map(c => r.getAs[Double](c))).toMap
    val exact = byFlag("q39_percentiles")
    val approx = byFlag("q100_percentiles_approx")
    assert(approx.keySet == exact.keySet && exact.nonEmpty)
    for ((flag, est) <- approx; (e, a) <- exact(flag).zip(est)) {
      val relErr = math.abs(a - e) / math.abs(e)
      assert(relErr <= 0.01, f"$flag: approx=$a exact=$e relErr=${relErr * 100}%.3f%%")
    }
  }

  test("array-form percentile bit-equals the scalar aggs it replaced (round 18)") {
    // q39/q100 moved the three l_extendedprice quantiles into ONE
    // array-form aggregation (one buffer/sketch, one sort, the column
    // shipped once through the partial-agg exchange). The interpolation
    // (and for q100 the GK sketch, a deterministic function of the same
    // input stream) is unchanged, so every value must be BIT-identical
    // to the scalar form — this is the parity gate for both rewrites.
    val li = Tables(spark, TestSpark.sfDir, "lineitem")
    val exactBoth = li.groupBy($"l_returnflag")
      .agg(
        percentile($"l_extendedprice", array(lit(0.25), lit(0.5), lit(0.75))).as("arr"),
        percentile($"l_extendedprice", lit(0.25)).as("s25"),
        percentile($"l_extendedprice", lit(0.5)).as("s50"),
        percentile($"l_extendedprice", lit(0.75)).as("s75"))
      .select($"l_returnflag",
        element_at($"arr", 1), element_at($"arr", 2), element_at($"arr", 3),
        $"s25", $"s50", $"s75")
      .as[(String, Double, Double, Double, Double, Double, Double)].collect()
    assert(exactBoth.nonEmpty)
    for ((flag, a25, a50, a75, s25, s50, s75) <- exactBoth)
      assert((a25, a50, a75) == ((s25, s50, s75)), s"exact percentile drifted at $flag")
    val approxBoth = li.groupBy($"l_returnflag")
      .agg(
        percentile_approx($"l_extendedprice",
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("arr"),
        percentile_approx($"l_extendedprice", lit(0.25), lit(10000)).as("s25"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("s50"),
        percentile_approx($"l_extendedprice", lit(0.75), lit(10000)).as("s75"))
      .select($"l_returnflag",
        element_at($"arr", 1), element_at($"arr", 2), element_at($"arr", 3),
        $"s25", $"s50", $"s75")
      .as[(String, Double, Double, Double, Double, Double, Double)].collect()
    for ((flag, a25, a50, a75, s25, s50, s75) <- approxBoth)
      assert((a25, a50, a75) == ((s25, s50, s75)), s"approx percentile drifted at $flag")
  }

  test("q101 profile_hll: exact fields identical to q97, n_distinct within ±5%") {
    // q101 swaps the exact multi-distinct (Expand, ×4 input replication)
    // for HLL. Everything EXCEPT n_distinct must be bit-identical to the
    // exact profile; n_distinct is the sketch estimate (default rsd 5%,
    // and the fixture cardinalities sit in HLL++'s near-exact range).
    def rows(q: String) =
      SparkEntry.queries(q)(spark, TestSpark.sfDir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    val exact = rows("q97_profile")
    val hll = rows("q101_profile_hll")
    assert(hll.keySet == exact.keySet && exact.nonEmpty)
    for ((c, (n, nNull, nDist, mn, mx)) <- hll) {
      val (en, enNull, enDist, emn, emx) = exact(c)
      assert((n, nNull, mn, mx) == ((en, enNull, emn, emx)),
        s"$c: exact fields drifted: ($n,$nNull,$mn,$mx) vs ($en,$enNull,$emn,$emx)")
      val relErr = math.abs(nDist - enDist).toDouble / enDist
      assert(relErr <= 0.05, f"$c: hll=$nDist exact=$enDist relErr=${relErr * 100}%.2f%%")
    }
  }

  test("IVF search (nprobe=1) beats random-bucket recall vs brute-force top-5") {
    // q81's correctness is hash-matched against its own oracle; this spec
    // pins the QUALITY of the approximation instead: how much of the true
    // (brute-force) top-5 the single-probe bucket search finds. The
    // fixture embeddings are near-uniform noise — true neighbors barely
    // correlate with SRP sign patterns — so absolute recall is LOW here by
    // the nature of the data (clustered real embeddings recall far more).
    // The mechanism gate is relative: searching the query's own bucket
    // must recall clearly more than the 1/16 ≈ 0.06 a random 4-bit bucket
    // assignment would. (Deterministic: fixed data, fixed hashes — the
    // measured fixture value is 0.16, ~2.5× random.) Raising nprobe or
    // coarsening buckets is the recall knob at scale.
    val truth = SparkEntry.queries("q56_knn_bruteforce")(spark, TestSpark.sfDir)
      .filter($"qid" < 5).select($"qid", $"vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SparkEntry.queries("q81_ivf_search")(spark, TestSpark.sfDir)
      .select($"qid", $"vid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet == truth.keySet)
    val recalls = truth.keys.toSeq.sorted.map { q =>
      val hits = (ivf(q) & truth(q)).size.toDouble / truth(q).size
      (q, hits)
    }
    val mean = recalls.map(_._2).sum / recalls.size
    assert(mean >= 2.0 / 16, s"mean IVF recall $mean not above random-bucket baseline: $recalls")
  }

  test("IVF recall rises with nprobe (the documented recall knob)") {
    def recall(nprobe: Int): Double = {
      val truth = SparkEntry.queries("q56_knn_bruteforce")(spark, TestSpark.sfDir)
        .filter($"qid" < 5).select($"qid", $"vid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = graft.queries.VectorQueries.ivfSearch(spark, TestSpark.sfDir, nprobe)
        .select($"qid", $"vid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = truth.keys.toSeq.map(q => (got.getOrElse(q, Set.empty) & truth(q)).size.toDouble / truth(q).size)
      rs.sum / rs.size
    }
    val r1 = recall(1); val r4 = recall(4)
    assert(r4 >= r1, s"recall must not drop with more probes: nprobe=1 -> $r1, nprobe=4 -> $r4")
    assert(r4 > r1, s"on this fixture 4 probes must recover strictly more: $r1 vs $r4")
  }

  test("current_timestamp has statement-level NOW() semantics in a copy (§2.2)") {
    // The reference's incremental test stamps rows with MySQL NOW()
    // (README.md:233,238): one statement → one timestamp. Spark matches:
    // current_timestamp() is fixed at query start, so every row of a load
    // carries the SAME stamp, bounded by the wall clock around the write —
    // the oracle-hostile operator pinned by a clock interval instead.
    val dst = java.nio.file.Files.createTempDirectory("now_sink")
    val t0 = System.currentTimeMillis() - 1 // ms truncation guard
    (1 to 100).toDF("id")
      .repartition(8) // stamp must be task-invariant, not per-partition
      .withColumn("load_ts", current_timestamp())
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/t")
    val t1 = System.currentTimeMillis() + 1
    val stamps = spark.read.parquet(s"$dst/t")
      .select($"load_ts").distinct().as[java.sql.Timestamp].collect()
    assert(stamps.length == 1, s"NOW() must be constant per statement, got ${stamps.length} values")
    val ms = stamps.head.getTime
    assert(ms >= t0 && ms <= t1, s"stamp $ms outside [$t0, $t1]")
  }

  test("contamination recall: every true cross-pair at jaccard >= 0.9 is found (q123/q126)") {
    // The LSH stage is probabilistic, so the oracle can only confirm WHAT
    // the construction emits — this gate pins how much it MISSES. Ground
    // truth: exact all-pairs 3-gram Jaccard between the two fixture sides
    // (affordable at sf0.001 only — this is precisely the quadratic pass
    // the banded construction exists to avoid at scale). bandRecall(0.9,
    // 4, 4) > 0.95 per pair; the fixture's qualifying pairs are all
    // EXACT duplicates (jaccard 1.0), where recall is certainty.
    import graft.functions.TextFunctions.{charHash, shingles, tokens}
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    def side(par: Int) = docs.filter($"doc_id" % 2 === par)
      .filter(size(tokens($"text")) >= 3)
      .select($"doc_id",
        array_distinct(transform(shingles($"text", 3), g => charHash(g))).as("hs"))
    val inter = size(array_intersect($"hs_t", $"hs_r"))
    val truth = side(0).withColumnsRenamed(Map("doc_id" -> "train_id", "hs" -> "hs_t"))
      .crossJoin(side(1).withColumnsRenamed(Map("doc_id" -> "ref_id", "hs" -> "hs_r")))
      .withColumn("j",
        inter.cast("double") / (size($"hs_t") + size($"hs_r") - inter))
      .filter($"j" >= 0.9)
      .select($"train_id", $"ref_id").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture must contain cross-side near-dups for this gate to bite")
    val found = SparkEntry.queries("q123_contamination_verified")(spark, dir)
      .select($"train_id", $"ref_id").as[(Long, Long)].collect().toSet
    val missed = truth -- found
    assert(missed.isEmpty,
      s"${missed.size}/${truth.size} true contamination pairs at j>=0.9 missed: " +
        missed.take(5).mkString(", "))
    // The knob-free q126 variant verifies at its own derived width — its
    // DECISIONS must still cover every exact-duplicate pair (j = 1.0 at
    // ANY n-gram width; band collision is certain for identical docs).
    val exactDups = side(0).withColumnsRenamed(Map("doc_id" -> "train_id", "hs" -> "hs_t"))
      .crossJoin(side(1).withColumnsRenamed(Map("doc_id" -> "ref_id", "hs" -> "hs_r")))
      .filter(inter === size($"hs_t") && inter === size($"hs_r"))
      .select($"train_id", $"ref_id").as[(Long, Long)].collect().toSet
    val foundAuto = SparkEntry.queries("q126_contamination_auto")(spark, dir)
      .select($"train_id", $"ref_id").as[(Long, Long)].collect().toSet
    val missedAuto = exactDups -- foundAuto
    assert(missedAuto.isEmpty,
      s"${missedAuto.size}/${exactDups.size} exact-dup pairs missed at the derived width")
  }

  test("ADC recall vs exact L2: the PQ approximation is MEASURED, not assumed") {
    // The q157 construction (m=4, k=8, iters=1, 5 queries, top-5) scored
    // against the exact squared-L2 ranking over the same candidates —
    // the round-11 LSH-recall discipline applied to the PQ family: a
    // deliberate approximation ships with its delivered accuracy pinned
    // on the fixture, so a codebook/romance regression is a loud test
    // failure, not a silent quality drop.
    import graft.operators.PqOps
    val e = Tables(spark, TestSpark.sfDir, "embeddings")
    val vecs = e.select($"vec_id",
        transform($"embedding", _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    val qs = vecs.filter(_._1 < 5)
    def l2sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exactTop = qs.map { case (qid, qv) =>
      qid -> vecs.map { case (vid, v) => (l2sq(qv, v), vid) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    def recallAt(kCodes: Int, iters: Int): Double = {
      val model = PqOps.fitPq(e, "embedding", "vec_id", m = 4,
        kCodes = kCodes, iters = iters)
      val codes = PqOps.encode(e, "embedding", "vec_id", model)
      val queries = e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding")
      val adcTop = PqOps.adcSearch(codes, "vec_id", queries, "qid", "embedding",
          model, topN = 5)
        .select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      qs.map { case (qid, _) =>
        (adcTop(qid) & exactTop(qid)).size.toDouble / 5.0 }.sum / qs.length
    }
    // Measured on this fixture: recall@5 = 0.40 at the q157 parameters
    // (k=8) — an order of magnitude above the ~5/n chance rate of a
    // blind draw. The absolute level is a property of the FIXTURE, not
    // the operator: these embeddings are near-uniform noise, so
    // per-subspace quantization error dominates the small true-distance
    // gaps between non-neighbors and recall saturates low at any
    // capacity (0.40 → 0.44 at k=64/iters=2). The gate therefore pins
    // the two things a regression would break — far-above-chance, and
    // capacity monotonicity (more codebook reaching the estimates at
    // all) — not a quality SLA the data can't support.
    val rSmall = recallAt(kCodes = 8, iters = 1)
    assert(rSmall >= 0.25,
      f"ADC recall@5 at k=8 collapsed toward chance: $rSmall%.2f")
    val rBig = recallAt(kCodes = 64, iters = 2)
    assert(rBig > rSmall,
      f"recall must grow with codebook capacity: k=8 → $rSmall%.2f, k=64 → $rBig%.2f")
  }

  test("IVFADC recall is monotone in nprobe and reaches flat ADC at nprobe = k") {
    // nprobe is E142's recall/cost knob (the q81 rule restated for the
    // code domain): each extra probed cell can only ADD candidates, so
    // recall measured against the flat-ADC ranking must be
    // non-decreasing in nprobe and reach 1.0 when every cell is probed.
    import graft.operators.{KmeansOps, PqOps}
    val e = Tables(spark, TestSpark.sfDir, "embeddings")
    val coarse = KmeansOps.fit(e, "embedding", "vec_id", k = 8, iters = 1)
    val model = PqOps.fitPq(e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
    val codes = PqOps.attachCells(
      PqOps.encode(e, "embedding", "vec_id", model),
      coarse.assignments.select($"vec_id", $"cluster"), "vec_id")
    val queries = e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding")
    val flatTop = PqOps.adcSearch(codes.drop("cell"), "vec_id", queries, "qid",
        "embedding", model, topN = 5)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallAt(nprobe: Int): Double = {
      val top = PqOps.ivfAdcSearch(codes, "cell", "vec_id", queries, "qid",
          "embedding", model, coarse.centroids, topN = 5, nprobe = nprobe)
        .select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // keys.toSeq, not keys: mapping recall values through a Set would
      // deduplicate equal recalls before the mean.
      flatTop.keys.toSeq.map { qid =>
        (top.getOrElse(qid, Set.empty) & flatTop(qid)).size.toDouble / 5.0
      }.sum / flatTop.size
    }
    val r1 = recallAt(1); val r2 = recallAt(2); val r8 = recallAt(8)
    assert(r1 <= r2 && r2 <= r8,
      f"recall must not drop with more probes: $r1%.2f, $r2%.2f, $r8%.2f")
    assert(r8 == 1.0, f"probing every cell must recover the flat ADC top-5: $r8%.2f")
    assert(r1 > 0.0, f"single-probe recall collapsed to zero: $r1%.2f")
  }

  test("residual IVFADC recall >= raw IVFADC recall at equal (m, kCodes)") {
    // E144's whole claim (Jégou §IV.B): spending the code budget on the
    // within-cell offset instead of re-describing the cell recovers
    // MORE true neighbors at the same (m, kCodes). Both formulations
    // measured against the exact-L2 top-5 ground truth on the same
    // coarse model, queries, and nprobe — the only variable is what the
    // codes quantize.
    import graft.operators.{KmeansOps, PqOps}
    val e = Tables(spark, TestSpark.sfDir, "embeddings")
    val vecs = e.select($"vec_id",
        transform($"embedding", _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    val qs = vecs.filter(_._1 < 5)
    def l2sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exactTop = qs.map { case (qid, qv) =>
      qid -> vecs.map { case (vid, v) => (l2sq(qv, v), vid) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    val coarse = KmeansOps.fit(e, "embedding", "vec_id", k = 8, iters = 1)
    val queries = e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val top = df.select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      qs.map { case (qid, _) =>
        (top.getOrElse(qid, Set.empty[Long]) & exactTop(qid)).size.toDouble / 5.0
      }.sum / qs.length
    }
    val rawModel = PqOps.fitPq(e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
    val rawCodes = PqOps.attachCells(
      PqOps.encode(e, "embedding", "vec_id", rawModel),
      coarse.assignments.select($"vec_id", $"cluster"), "vec_id")
    val rawRecall = recallOf(PqOps.ivfAdcSearch(rawCodes, "cell", "vec_id",
      queries, "qid", "embedding", rawModel, coarse.centroids, topN = 5, nprobe = 2))
    val res = PqOps.residuals(e, "embedding", "vec_id", coarse.centroids)
    val resModel = PqOps.fitPq(res, "residual", "vec_id", m = 4, kCodes = 8, iters = 1)
    val resCodes = PqOps.attachCells(
      PqOps.encode(res, "residual", "vec_id", resModel),
      res.select($"vec_id", $"cell".as("cluster")), "vec_id")
    val resRecall = recallOf(PqOps.ivfAdcSearchResidual(resCodes, "cell", "vec_id",
      queries, "qid", "embedding", resModel, coarse.centroids, topN = 5, nprobe = 2))
    assert(resRecall >= rawRecall,
      f"residual formulation must not recall less than raw at equal capacity: " +
        f"residual $resRecall%.2f vs raw $rawRecall%.2f")
    assert(resRecall > 0.0, f"residual recall collapsed to zero: $resRecall%.2f")
  }

  test("refinement re-rank lifts recall over ADC-only and shrinks the decode error") {
    // E148's whole claim (ICASSP 2011 re-rank with source coding): the
    // second code level explains part of the stage-1 quantization error,
    // so (a) the two-level decode sits strictly closer to the corpus
    // than the one-level decode (mean squared error, measured), and
    // (b) re-ranking the IVFADC shortlist by the two-level decode
    // distance recovers at least the ADC-only recall at the same probe
    // budget — both against the exact-L2 top-5 ground truth.
    import graft.operators.{KmeansOps, PqOps}
    val e = Tables(spark, TestSpark.sfDir, "embeddings")
    val vecs = e.select($"vec_id",
        transform($"embedding", _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    val qs = vecs.filter(_._1 < 5)
    def l2sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exactTop = qs.map { case (qid, qv) =>
      qid -> vecs.map { case (vid, v) => (l2sq(qv, v), vid) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    val coarse = KmeansOps.fit(e, "embedding", "vec_id", k = 8, iters = 1)
    val model = PqOps.fitPq(e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
    val codes = PqOps.attachCells(
      PqOps.encode(e, "embedding", "vec_id", model),
      coarse.assignments.select($"vec_id", $"cluster"), "vec_id")
    val errs = PqOps.reconstructionErrors(e, "embedding", "vec_id", model, codes)
    val rmodel = PqOps.fitPq(errs, "_graft_err", "vec_id", m = 8, kCodes = 8, iters = 1)
    val rcodes = PqOps.attachCells(
      PqOps.encode(errs, "_graft_err", "vec_id", rmodel),
      coarse.assignments.select($"vec_id", $"cluster"), "vec_id")
    val arts = PqOps.PqArtifacts(model, coarse.centroids, codes,
      refinement = Some(rmodel), rcodes = Some(rcodes))
    // (a) the decode error strictly shrinks: mean ||e₂||² < mean ||e₁||²
    // where e₂ = e₁ − ê₂ is the error LEFT after the refinement decode.
    def msq(df: org.apache.spark.sql.DataFrame, vc: String): Double =
      df.select(aggregate(col(vc), lit(0.0), (acc, x) => acc + x * x).as("s"))
        .agg(avg($"s")).as[Double].collect().head
    val err2 = PqOps.reconstructionErrors(
      errs, "_graft_err", "vec_id", rmodel,
      PqOps.encode(errs, "_graft_err", "vec_id", rmodel))
    val mse1 = msq(errs, "_graft_err")
    val mse2 = msq(err2, "_graft_err")
    info(f"decode MSE: one-level $mse1%.4f, two-level $mse2%.4f")
    assert(mse2 < mse1,
      f"the refinement level must explain error: $mse2%.4f !< $mse1%.4f")
    // (b) re-ranked recall >= ADC-only recall at the same probe budget.
    val queries = e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"embedding")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val top = df.select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      qs.map { case (qid, _) =>
        (top.getOrElse(qid, Set.empty[Long]) & exactTop(qid)).size.toDouble / 5.0
      }.sum / qs.length
    }
    val adcOnly = recallOf(PqOps.ivfAdcSearch(codes, "cell", "vec_id",
      queries, "qid", "embedding", model, coarse.centroids, topN = 5, nprobe = 2))
    val short = PqOps.ivfAdcSearch(codes, "cell", "vec_id",
      queries, "qid", "embedding", model, coarse.centroids, topN = 20, nprobe = 2)
    val refined = recallOf(PqOps.refineFromCodes(
      arts, short, "vec_id", queries, "qid", "embedding", topN = 5, nprobe = 2))
    info(f"recall@5: ADC-only $adcOnly%.2f, refined $refined%.2f")
    assert(refined >= adcOnly,
      f"codes re-rank must not recall less than ADC-only: $refined%.2f vs $adcOnly%.2f")
    assert(refined > 0.0, f"refined recall collapsed to zero: $refined%.2f")
  }

  test("balanced permutation recovers recall a contiguous split loses on skewed dims") {
    // E147's whole claim (Ge 2013): PQ quality is only as good as the
    // SPLIT. Synthetic skew — dims 0..7 carry ALL the signal, dims
    // 8..63 are constant — so the contiguous split dumps every signal
    // dim into subspace 0 (one 8-code codebook describing an 8-dim
    // signal; the other three codebooks quantize constants), while the
    // balanced permutation deals exactly 2 signal dims to each of the 4
    // subspaces. Ground truth is exact L2, which any permutation
    // preserves, so one truth serves both formulations.
    import graft.operators.PqOps
    val n = 512
    val df = (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(d =>
        if (d < 8) (((i * (d + 3) + 7 * d) % 17) - 8).toFloat else 0.25f))
    }.toDF("vec_id", "embedding")
    val vecs = df.select($"vec_id",
        transform($"embedding", _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    def l2sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qs = vecs.filter(_._1 < 5)
    val exactTop = qs.map { case (qid, qv) =>
      qid -> vecs.map { case (vid, v) => (l2sq(qv, v), vid) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    def recallOf(frame: org.apache.spark.sql.DataFrame, vecCol: String): Double = {
      val model = PqOps.fitPq(frame, vecCol, "vec_id", m = 4, kCodes = 8, iters = 2)
      val codes = PqOps.encode(frame, vecCol, "vec_id", model)
      val queries = frame.filter($"vec_id" < 5)
        .select($"vec_id".as("qid"), col(vecCol))
      val top = PqOps.adcSearch(codes, "vec_id", queries, "qid", vecCol,
          model, topN = 5)
        .select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      qs.map { case (qid, _) =>
        (top.getOrElse(qid, Set.empty[Long]) & exactTop(qid)).size.toDouble / 5.0
      }.sum / qs.length
    }
    val rContig = recallOf(df, "embedding")
    val perm = PqOps.balancedPerm(df, "embedding", m = 4)
    // The allocation property itself: exactly 2 of the 8 signal dims
    // land in every 16-wide subspace.
    val sigPerSub = (0 until 64).groupBy(_ / 16)
      .map { case (s, ps) => s -> ps.count(p => perm(p) < 8) }
    assert(sigPerSub.values.toSet == Set(2), sigPerSub.toString)
    val pe = PqOps.applyPerm(df, "embedding", perm, "pv")
      .select($"vec_id", $"pv")
    val rBal = recallOf(pe, "pv")
    info(f"skewed-dim recall@5: contiguous $rContig%.2f, balanced $rBal%.2f")
    assert(rBal >= rContig,
      f"balanced split must not recall less on skewed dims: " +
        f"balanced $rBal%.2f vs contiguous $rContig%.2f")
    assert(rBal > 0.0, f"balanced recall collapsed to zero: $rBal%.2f")
  }
}
