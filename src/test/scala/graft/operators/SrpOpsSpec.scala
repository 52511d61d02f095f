package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Banded SRP near-dup: seeded high-cosine pairs are recalled, random
  * vectors don't flood the candidate join, hot buckets cap + report, and
  * the saturation gauge can be enforced. */
class SrpOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 32

  private def unitVec(seed: Long, noiseOf: Option[(Array[Float], Double)] = None): Array[Float] = {
    val rng = new scala.util.Random(seed)
    val raw = noiseOf match {
      case None => Array.fill(Dim)(rng.nextGaussian())
      case Some((base, eps)) => base.map(_.toDouble + eps * rng.nextGaussian())
    }
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  test("seeded near-dups are recalled; random vectors stay out; candidates are bounded") {
    val base = (0L until 2000L).map(i => (i, unitVec(i * 7919L + 3L)))
    // 20 perturbed copies at cos ~ 0.99 of vectors 0-19.
    val dups = (0 until 20).map { i =>
      (3000L + i, unitVec(i * 104729L, Some((base(i)._2, 0.02))))
    }
    val vecs = (base ++ dups).toDF("vec_id", "embedding")
    val banded = SrpOps.bandedSrp(vecs, "embedding", "vec_id")
    val pairs = SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.9)
      .select($"vid_a", $"vid_b").as[(Long, Long)].collect().toSet
    val found = (0 until 20).count(i => pairs.contains((i.toLong, 3000L + i)))
    assert(found >= 15, s"recall too low: $found/20 seeded pairs found")
    // Exact verification means nothing below the threshold survives, and
    // random unit vectors at dim 32 never reach cos 0.9.
    assert(pairs.forall { case (a, b) => b >= 3000L || a >= 3000L },
      s"random-pair false positives: ${pairs.filter { case (a, b) => b < 3000L && a < 3000L }}")
    assert(banded.overflowBuckets == 0L)
    assert(banded.meanOccupancy < 4.0,
      s"selective corpus saturated the band space: ${banded.meanOccupancy}")
  }

  test("a hot bucket over the cap is dropped and reported") {
    val same = unitVec(42L)
    val hot = (0L until 50L).map(i => (i, same))
    val cool = Seq((900L, unitVec(1L)), (901L, unitVec(1L)))
    // The 50-identical-vector fixture is a saturated corpus by construction
    // (occupancy 26 trips the default gauge before the cap is reached) —
    // disable the gauge to exercise the cap in isolation.
    val banded = SrpOps.bandedSrp((hot ++ cool).toDF("vec_id", "embedding"),
      "embedding", "vec_id", maxBucket = 10,
      maxMeanOccupancy = Double.PositiveInfinity)
    assert(banded.overflowBuckets >= 4L, s"over-cap buckets: ${banded.overflowBuckets}")
    val pairs = SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.99)
      .select($"vid_a", $"vid_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((900L, 901L)), "capped bucket emits no pairs; cool pair survives")
  }

  test("the saturation gauge can be enforced loudly") {
    val same = unitVec(7L)
    val docs = (0L until 500L).map(i => (i, same)).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      SrpOps.bandedSrp(docs, "embedding", "vec_id", maxMeanOccupancy = 2.0)
    }
    assert(e.getMessage.contains("saturated"))
  }

  test("a saturating corpus fails loudly BY DEFAULT (round-7: finite gauge)") {
    // 200 copies of one vector into a 4-value band space (2 bits/band):
    // occupancy 200 >> the 24.0 default — the silent-saturation regime the
    // round-6 default of +inf let through.
    val same = unitVec(11L)
    val docs = (0L until 200L).map(i => (i, same)).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      SrpOps.bandedSrp(docs, "embedding", "vec_id", bitsPerBand = 2, maxBucket = 1000)
    }
    assert(e.getMessage.contains("saturated"))
  }

  test("srpAuto picks the band width from the corpus size") {
    val vecs = (0L until 2000L).map(i => (i, unitVec(i * 7919L + 3L)))
      .toDF("vec_id", "embedding")
    val auto = SrpOps.srpAuto(vecs, "embedding", "vec_id")
    // 2^bits >= n / targetOccupancy = 1000 => 10 bits.
    assert(auto.bitsPerBand == 10, s"chose ${auto.bitsPerBand}")
    assert(auto.vecCount == 2000L)
    assert(auto.banded.meanOccupancy <= SrpOps.DefaultMaxMeanOccupancy)
    // A small corpus stays at the floor width (recall is the scarce
    // resource when selectivity is already free).
    val small = (0L until 100L).map(i => (i, unitVec(i * 31L + 7L)))
      .toDF("vec_id", "embedding")
    assert(SrpOps.srpAuto(small, "embedding", "vec_id").bitsPerBand == 8)
  }

  test("srpAuto accepts a precomputed count and derives the same construction") {
    // A micro-batch caller already knows its row count; knownCount skips
    // the extra count() action. The derivation must not care which path
    // supplied n — and the stated count is authoritative (width follows
    // it, not the frame).
    val vecs = (0L until 2000L).map(i => (i, unitVec(i * 7919L + 3L)))
      .toDF("vec_id", "embedding")
    val counted = SrpOps.srpAuto(vecs, "embedding", "vec_id")
    val stated = SrpOps.srpAuto(vecs, "embedding", "vec_id",
      knownCount = Some(2000L))
    assert(stated.bitsPerBand == counted.bitsPerBand
      && stated.nBands == counted.nBands && stated.vecCount == 2000L)
    // A different stated count changes the width exactly as a different
    // corpus would: 100 /2.0 target => the 8-bit floor.
    assert(SrpOps.srpAuto(vecs, "embedding", "vec_id",
      knownCount = Some(100L)).bitsPerBand == 8)
  }

  test("srpAuto derives the band count from a recall target") {
    val vecs = (0L until 2000L).map(i => (i, unitVec(i * 7919L + 3L)))
      .toDF("vec_id", "embedding")
    // At the 10-bit width the occupancy rule picks here, a cos-0.99 pair
    // retains p_band = 0.955^10 ~ 0.63 per band: 2 bands give 0.86, 3 give
    // 0.95 — the smallest count clearing 0.9 is 3.
    val auto = SrpOps.srpAuto(vecs, "embedding", "vec_id", targetRecall = 0.9)
    assert(auto.bitsPerBand == 10 && auto.nBands == 3, s"$auto")
    assert(SrpOps.bandRecall(0.99, auto.bitsPerBand, auto.nBands) >= 0.9)
    assert(auto.banded.bands.select($"b").distinct().count() == 3L,
      "the built frame must actually carry the derived band count")
    // An unreachable target refuses loudly instead of silently under-recalling.
    val e = intercept[IllegalStateException] {
      SrpOps.srpAuto(vecs, "embedding", "vec_id",
        targetRecall = 0.999, recallAtCos = 0.9, maxBands = 2)
    }
    assert(e.getMessage.contains("recall target unreachable"))
  }

  test("srpAuto refuses a corpus beyond the allowed band width, up front") {
    // Don't build a billion rows: shrink the width/occupancy budget so the
    // refusal arithmetic (projected occupancy at the WIDEST allowed band
    // still over the gauge) trips on a small frame.
    val vecs = (0L until 1000L).map(i => (i, unitVec(i))).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      SrpOps.srpAuto(vecs, "embedding", "vec_id",
        minBitsPerBand = 4, maxBitsPerBand = 4,
        targetOccupancy = 0.001, maxMeanOccupancy = 0.05)
    }
    assert(e.getMessage.contains("cannot clear saturation"))
  }

  test("wide bands past the old 60-bit total: 4 x 20-bit bands recall exact dups") {
    // Round 6 sliced one 60-bit signature (4 x 20 was impossible); per-band
    // plane ranges lift the cap. An exact copy shares every plane sign, so
    // recall is guaranteed at ANY width; random dim-32 vectors never reach
    // cos 0.9, so the wide bands keep them out.
    val base = unitVec(3L)
    val vecs = ((0L until 300L).map(i => (i, unitVec(i * 6151L + 11L))) ++
      Seq((900L, base), (901L, base))).toDF("vec_id", "embedding")
    val banded = SrpOps.bandedSrp(vecs, "embedding", "vec_id",
      nBands = 4, bitsPerBand = 20)
    val pairs = SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.9)
      .select($"vid_a", $"vid_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((900L, 901L)), s"got $pairs")
  }

  test("dedupRecall audits the pinned SRP path against exact cosine truth (E155)") {
    // Round-17 (verdict #6): the vector twin of LshOps.dedupRecall. The
    // LEDGER contributes the pinned construction AND its own verify
    // threshold; the measurement runs on the CORPUS the pipeline
    // ingests — deliberately not the ledger's survivors, which are
    // mutually non-near-dup except for exactly the pairs the banding
    // missed (a survivor-only audit is selection-biased toward zero).
    import org.apache.spark.sql.functions.col
    val ledger = java.nio.file.Files.createTempDirectory("graft_srp_recall")
      .resolve("bands").toString
    val base0 = unitVec(41L)
    val base1 = unitVec(97L)
    val corpus = Seq(
      (0L, base0),
      (1L, base0),                                   // exact dup of 0
      (2L, base1),
      (3L, unitVec(511L, Some((base1, 0.02)))),      // near-dup of 2
      (4L, unitVec(1234L)),
      (5L, unitVec(5678L)))
      .toDF("vec_id", "embedding")
    SrpOps.incrementalNeardup(
      spark, corpus, "embedding", "vec_id", ledger).commitLedger()
    val r = SrpOps.dedupRecall(spark, ledger, corpus, "embedding", "vec_id",
      nQueries = 6)
    assert(r.pin == "nBands=4,bitsPerBand=10,minCos=0.9", r.pin)
    assert(r.nQueries == 6)
    // Independent truth: driver-side exact cosine at the PINNED 0.9.
    // The fixture keeps every pair far from the threshold (dups at ~1.0,
    // the seeded near pair > 0.95, random pairs < 0.6 at dim 32), so
    // Double-arithmetic association order cannot flip a verdict.
    val vecs = corpus.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val ids = vecs.keys.toSeq
    val truth = (for {
      q <- ids; v <- ids if q != v && cos(vecs(q), vecs(v)) >= 0.9
    } yield (q, v)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(truth.keySet == Set(0L, 1L, 2L, 3L),
      s"fixture sanity: two planted pairs only, got $truth")
    assert(r.queriesWithTruth == 4 && r.truePairs == 4L)
    // Independent candidates: the public banding + verify path at the
    // pinned construction (neardupPairs IS the hit arithmetic).
    val banded = SrpOps.bandedSrp(corpus, "embedding", "vec_id", 4, 10, 200)
    val cand0 = SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.9)
      .select($"vid_a", $"vid_b").as[(Long, Long)].collect().toSet
    banded.unpersist()
    val cand = cand0 ++ cand0.map(p => (p._2, p._1))
    val want = truth.keys.toSeq.map { q =>
      truth(q).count(v => cand((q, v))).toDouble / truth(q).size
    }.sum / truth.size
    assert(r.recall == want, s"engine ${r.recall} != local $want")
    // Exact dups share every band value: the mean can never be below 0.5.
    assert(r.recall >= 0.5)
    // Pin-less directories refuse (never band at guessed parameters).
    val bare = java.nio.file.Files.createTempDirectory("graft_srp_nopin")
      .resolve("l").toString
    corpus.select(col("vec_id")).write.parquet(bare)
    val e = intercept[IllegalArgumentException](SrpOps.dedupRecall(
      spark, bare, corpus, "embedding", "vec_id", 2))
    assert(e.getMessage.contains("construction pin"), e.getMessage)
  }
}
