package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The two LSH scale hazards, provoked directly: a flood of sub-3-token
  * docs (all-zero signatures) must NOT form a quadratic candidate bucket,
  * and a hot bucket over the cap is dropped and reported instead of
  * exploding the join. */
class LshOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("1000 short docs yield zero candidate pairs, not O(n^2)") {
    // Pre-fix, every short doc shared the identical all-zero signature:
    // 1000 docs -> one bucket -> 499_500 pairs. A <3-token doc has no
    // 3-gram shingles, so by definition it can near-dup nothing.
    val shorts = (1L to 1000L).map(i => (i, s"w$i")).toDF("doc_id", "text")
    val banded = LshOps.bandedMinhash(shorts, "text", "doc_id")
    assert(banded.bands.count() == 0L, "short docs must be filtered before banding")
    assert(LshOps.candidatePairs(banded.bands, "doc_id").count() == 0L)
    assert(banded.overflowBuckets == 0L, "filtered docs must not count as overflow")
  }

  test("short docs do not disturb real near-dup pairs") {
    val real = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "completely different words here now then")).toDF("doc_id", "text")
    val shorts = (100L to 300L).map(i => (i, "a b")).toDF("doc_id", "text")
    val banded = LshOps.bandedMinhash(real.union(shorts), "text", "doc_id")
    val pairs = LshOps.candidatePairs(banded.bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    assert(LshOps.purgeList(banded.bands, "doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("one-pass corpusRegime == the two-pass count + exploded sketch (round 18)") {
    // The regime derivation fused its doc count into the vocabulary
    // sketch's pass (posexplode_outer marker rows). Both numbers must be
    // identical to the former two-pass form — including docs with no
    // tokens, null text, and an empty frame.
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    def twoPass(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val n = df.count()
      if (n == 0L) (0L, 2L)
      else (n, math.max(2L, df
        .select(explode(array_distinct(tokens(col("text")))).as("t"))
        .agg(approx_count_distinct(col("t"), 0.05)).head().getLong(0)))
    }
    val mixed = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha alpha alpha"), (3L, ""),
      (4L, "   "), (5L, null.asInstanceOf[String]), (6L, "delta beta"))
      .toDF("doc_id", "text")
    assert(LshOps.corpusRegime(mixed, "text") == twoPass(mixed))
    val fixture = graft.Tables(spark, TestSpark.sfDir, "documents")
    assert(LshOps.corpusRegime(fixture, "text") == twoPass(fixture))
    val empty = mixed.filter(org.apache.spark.sql.functions.lit(false))
    assert(LshOps.corpusRegime(empty, "text") == ((0L, 2L)))
  }

  test("meanOccupancy flags band-space saturation on a bounded-vocabulary corpus") {
    // Hazard 3: 3000 DISTINCT docs drawn from a 5-word vocabulary — the
    // 3-shingle universe is 5^3 = 125, so MinHash order statistics
    // concentrate and buckets fill long before any single bucket is
    // boilerplate-hot. The occupancy gauge must say so.
    val vocab = Array("va", "vb", "vc", "vd", "ve")
    def doc(i: Long) = (0 until 12)
      .map(j => vocab((math.abs(i * 2654435761L + j * 40503L + i * j) % 5).toInt))
      .mkString(" ")
    val saturated = LshOps.bandedMinhash(
      (1L to 3000L).map(i => (i, doc(i))).toDF("doc_id", "text"), "text", "doc_id")
    assert(saturated.meanOccupancy > 10.0,
      s"saturated corpus not flagged: occupancy=${saturated.meanOccupancy}")
    // A diverse corpus (per-doc vocabulary) stays near 1 — no false alarm.
    val diverse = LshOps.bandedMinhash(
      (1L to 3000L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e")).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(diverse.meanOccupancy < 1.5,
      s"diverse corpus false-flagged: occupancy=${diverse.meanOccupancy}")
    assert(diverse.bandRows == 4L * 3000L && diverse.distinctBuckets > 0L)
  }

  test("auto banding promotes a bounded-vocabulary corpus to wider shingles") {
    // 3000 DISTINCT docs over a 5-word vocabulary (per-position seeded RNG
    // -- unlike the gauge test's generator, no two docs are identical).
    // 3-gram universe = 125 << 3000 docs, so manual shingleN=3 saturates;
    // the auto path must choose the smallest n with 5^n >= 100 x 3000 =
    // 3e5, i.e. n = 8 (5^8 = 390 625), restoring the selective regime.
    val vocab = Array("va", "vb", "vc", "vd", "ve")
    def doc(i: Long) = {
      val rng = new scala.util.Random(i * 12289L + 7L)
      (0 until 12).map(_ => vocab(rng.nextInt(5))).mkString(" ")
    }
    val docs = (1L to 3000L).map(i => (i, doc(i))).toDF("doc_id", "text")
    val auto = LshOps.bandedMinhashAuto(docs, "text", "doc_id")
    assert(auto.shingleN == 8, s"expected promotion to 8-grams, got ${auto.shingleN}")
    assert(auto.docCount == 3000L)
    assert(auto.banded.meanOccupancy <= 8.0,
      s"auto-promoted frame still saturated: ${auto.banded.meanOccupancy}")
    // A diverse corpus keeps the requested minimum -- no needless promotion
    // (wider shingles cost recall on genuinely-near docs).
    val diverse = LshOps.bandedMinhashAuto(
      (1L to 3000L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e")).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(diverse.shingleN == 3, s"diverse corpus needlessly promoted: ${diverse.shingleN}")
  }

  test("auto banding fails loudly when no shingle width can clear saturation") {
    // 2-word vocabulary, 100k docs: 2^8 = 256 << 100x100k -- near-dup via
    // shingles is meaningless here and the API must say so, not emit junk.
    val docs = spark.range(1, 100001).selectExpr(
      "id as doc_id",
      "concat('x y x y x y x y x y') as text")
    val e = intercept[IllegalStateException] {
      LshOps.bandedMinhashAuto(docs.toDF("doc_id", "text"), "text", "doc_id")
    }
    assert(e.getMessage.contains("cannot clear saturation"))
  }

  test("hot bucket over the cap is dropped and reported, cool buckets survive") {
    // 50 identical long docs -> one bucket of 50 in each of the 4 bands.
    val hot = (1L to 50L).map(i => (i, "one two three four five six seven")).toDF("doc_id", "text")
    val cool = Seq(
      (900L, "red orange yellow green blue indigo violet"),
      (901L, "red orange yellow green blue indigo violet")).toDF("doc_id", "text")
    val banded = LshOps.bandedMinhash(hot.union(cool), "text", "doc_id", maxBucket = 10)
    assert(banded.overflowBuckets == 4L, "one over-cap bucket per band")
    val pairs = LshOps.candidatePairs(banded.bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((900L, 901L)), "capped bucket emits no pairs; cool bucket unaffected")
  }

  test("crossCorpusPairs: bipartite evidence pairs, no within-side pairs") {
    val train = Seq(
      (2L, "alpha beta gamma delta epsilon zeta"),
      (4L, "alpha beta gamma delta epsilon zeta"), // dup of 2 AND of ref 1
      (6L, "totally unrelated training document content here")).toDF("doc_id", "text")
    val ref = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // benchmark copy
      (3L, "another benchmark question nothing like the corpus")).toDF("doc_id", "text")
    val pairs = LshOps.crossCorpusPairs(train, ref, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    // Both contaminated training docs pair with the benchmark copy; the
    // train-train dup (2,4) and ref-ref relations are NOT emitted — this
    // is decontamination evidence, not corpus self-dedup.
    assert(pairs == Set((2L, 1L), (4L, 1L)))
  }

  test("crossCorpusPairs: short docs filtered on both sides") {
    val train = Seq((2L, "a b"), (4L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val ref = Seq((1L, "a b"), (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val pairs = LshOps.crossCorpusPairs(train, ref, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 3L)), "sub-shingle docs must never pair")
  }

  test("verifiedContamination: collision evidence must survive exact Jaccard") {
    // Docs 2 and 1 are exact dups (jaccard 1.0). Doc 4 is a NEAR-dup of
    // ref 1 (shared 20-token body + 3 appended tokens → jaccard 18/21 ≈
    // 0.857): high enough to band-collide at 4×4 (the premise below
    // asserts it does, deterministically — the hash family is fixed),
    // but below the 0.9 bar, so the verification stage must drop the
    // pair a collision-only purge keeps.
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val train = Seq(
      (2L, boiler),
      (4L, s"$boiler extra1 extra2 extra3")
    ).toDF("doc_id", "text")
    val ref = Seq((1L, boiler)).toDF("doc_id", "text")
    val candidates = LshOps.crossCorpusPairs(train, ref, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(candidates == Set((2L, 1L), (4L, 1L)),
      "both docs should band-collide (the premise of the verify stage)")
    val verified = LshOps.verifiedContamination(
        train, ref, "text", "doc_id", minJaccard = 0.9)
      .select($"train_id", $"ref_id", $"jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(verified == Set((2L, 1L, 1.0)),
      s"only the exact dup clears 0.9, got $verified")
    intercept[IllegalArgumentException](
      LshOps.verifiedContamination(train, ref, "text", "doc_id", minJaccard = 1.5))
  }

  test("crossCorpusPairsAuto: one derived width, pinned identically on both sides") {
    val train = Seq(
      (2L, "alpha beta gamma delta epsilon zeta"),
      (4L, "alpha beta gamma delta epsilon zeta"),
      (6L, "totally unrelated training document content here")).toDF("doc_id", "text")
    val ref = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (3L, "another benchmark question nothing like the corpus")).toDF("doc_id", "text")
    val auto = LshOps.crossCorpusPairsAuto(train, ref, "text", "doc_id")
    // Whatever width the train regime derives, the result must equal the
    // fixed-width construction at that SAME width on both sides — the
    // identical-construction contract.
    val fixed = LshOps.crossCorpusPairs(train, ref, "text", "doc_id",
      shingleN = auto.shingleN)
    assert(auto.pairs.as[(Long, Long)].collect().toSet ==
      fixed.as[(Long, Long)].collect().toSet)
    assert(auto.pairs.as[(Long, Long)].collect().toSet == Set((2L, 1L), (4L, 1L)))
    // And the verified twin scores at the derived width: the exact dup
    // clears any bar, the unrelated docs never appear.
    val verified = LshOps.verifiedContaminationAuto(
        train, ref, "text", "doc_id", minJaccard = 0.9)
      .select($"train_id", $"ref_id", $"jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(verified == Set((2L, 1L, 1.0), (4L, 1L, 1.0)))
  }

  test("bandRecall: the S-curve separates near-dups from mere overlap") {
    // The 16-hash 4x4 corpus construction: strong recall above s ~ 0.8,
    // strong rejection below s ~ 0.4 - and the closed form is monotone in
    // s, rises with bands, falls with rows per band.
    assert(LshOps.bandRecall(0.9, 4, 4) > 0.95)
    assert(LshOps.bandRecall(0.4, 4, 4) < 0.15)
    assert(LshOps.bandRecall(0.9, 4, 4) > LshOps.bandRecall(0.8, 4, 4))
    assert(LshOps.bandRecall(0.6, 4, 8) > LshOps.bandRecall(0.6, 4, 4))
    assert(LshOps.bandRecall(0.6, 8, 4) < LshOps.bandRecall(0.6, 4, 4))
  }

  test("MEASURED candidate recall vs the exact join's ground truth") {
    // bandRecall above is the closed-form PROMISE; this measures the
    // delivered recall end to end on the fixture, with E131's exact
    // prefix join as the in-engine ground truth (the same shingle width
    // the banding uses, so both operators score the same set space).
    // Every hash seed is fixed, so the measured value is deterministic
    // — the gate can pin it instead of tolerating a stochastic band.
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables(spark, TestSpark.sfDir, "documents")
    val truth = SetJoinOps.prefixJaccardJoin(
      docs.select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("text"), 3).as("sh")),
      "doc_id", "sh", tau = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 20, s"fixture lost its planted near-dups: ${truth.size}")
    val banded = LshOps.bandedMinhash(docs, "text", "doc_id", 16, 3, 4, 4, 10000)
    val cand = LshOps.candidatePairs(banded.bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    banded.unpersist()
    val recall = truth.count(cand).toDouble / truth.size
    // bandRecall(0.8, 4, 4) ~ 0.88 is the per-pair floor at J = 0.8
    // exactly; the fixture's planted pairs sit at J in [0.8, 1.0] where
    // the S-curve is higher. Measured on this corpus: 1.0.
    assert(recall >= 0.9, s"delivered recall $recall < 0.9 over ${truth.size} " +
      s"exact pairs (missed: ${truth.diff(cand).toSeq.sorted.take(5)}...)")
  }

  test("dedupRecall audits the pinned banded path against exact Jaccard truth (E155)") {
    // Round-17 (verdict #6): the E154 recall gate's text twin — the
    // audit reads the LEDGER's construction pin, re-bands the corpus at
    // exactly those parameters, and scores against the verify stage's
    // own exact-Jaccard arithmetic. The spec recomputes BOTH sides
    // independently (driver-side string shingle sets for truth, the
    // public banding ops for candidates) and demands bit-equality.
    import org.apache.spark.sql.functions.col
    val ledger = java.nio.file.Files.createTempDirectory("graft_dedup_recall")
      .resolve("bands").toString
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven nine"),        // near-dup of 3
      (5L, "unique words here that match nothing else at all"),
      (6L, "another completely distinct document with its own tokens"))
    val docs = rows.toDF("doc_id", "text")
    LshOps.incrementalNeardup(spark, docs, "text", "doc_id", ledger).commitLedger()
    val r = LshOps.dedupRecall(spark, ledger, docs, "text", "doc_id",
      minJaccard = 0.7, nQueries = 6)
    assert(r.pin == "k=16,shingleN=3,nBands=4,rowsPerBand=4", r.pin)
    assert(r.nQueries == 6)
    // Independent truth: driver-side 3-gram string shingle sets, the
    // verify stage's 4-dp rounding.
    def shingleSet(t: String) =
      t.split(" ").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
    def jac(a: Set[String], b: Set[String]): Double = {
      val i = (a & b).size
      BigDecimal(i.toDouble / (a.size + b.size - i))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val sets = rows.map { case (id, t) => id -> shingleSet(t) }.toMap
    val truth = (for {
      q <- rows.map(_._1); v <- rows.map(_._1)
      if q != v && jac(sets(q), sets(v)) >= 0.7
    } yield (q, v)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(truth.keySet == Set(1L, 2L, 3L, 4L),
      s"fixture sanity: dup + near-dup pairs only, got $truth")
    assert(r.queriesWithTruth == 4 && r.truePairs == 4L)
    // Independent candidates: the public banding path at the pin.
    val banded = LshOps.bandedMinhash(docs, "text", "doc_id", 16, 3, 4, 4)
    val cand0 = LshOps.candidatePairs(banded.bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    banded.unpersist()
    val cand = cand0 ++ cand0.map(p => (p._2, p._1))
    val want = truth.keys.toSeq.map { q =>
      truth(q).count(v => cand((q, v))).toDouble / truth(q).size
    }.sum / truth.size
    assert(r.recall == want, s"engine ${r.recall} != local $want")
    // The exact-dup queries are certainly recalled (identical signatures
    // collide in every band), so the mean can never be below 0.5 here.
    assert(r.recall >= 0.5)
    // Zero-truth audits refuse rather than reporting NaN.
    val e = intercept[IllegalArgumentException](LshOps.dedupRecall(
      spark, ledger, docs.filter(col("doc_id") >= 3L), "text", "doc_id",
      minJaccard = 0.99, nQueries = 4))
    assert(e.getMessage.contains("zero truths") ||
      e.getMessage.contains("no exact near-dup"), e.getMessage)
    // A pin-less directory refuses: the audit never bands at guessed
    // parameters.
    val bare = java.nio.file.Files.createTempDirectory("graft_dr_nopin")
      .resolve("l").toString
    docs.select(col("doc_id")).write.parquet(bare)
    val e2 = intercept[IllegalArgumentException](LshOps.dedupRecall(
      spark, bare, docs, "text", "doc_id", 0.7, 2))
    assert(e2.getMessage.contains("construction pin"), e2.getMessage)
  }
}
