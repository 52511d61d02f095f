package graft.operators

import graft.{Tables, TestSpark}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The three SimHash-LSH scale hazards, provoked directly (short docs, hot
  * buckets — as in LshOpsSpec) plus the recall guarantee the 4×15-bit
  * banding buys: ANY pair within hamming ≤ 3 must surface as a candidate
  * (pigeonhole — 3 differing bits cannot touch all 4 bands). */
class SimhashOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("short docs are filtered before banding, not mega-bucketed") {
    // A sub-shingleN doc has an empty shingle set → the all-ones majority
    // signature, identical for every such doc: unfiltered, 1000 of them
    // form one bucket per band → ~2M candidate pairs.
    val shorts = (1L to 1000L).map(i => (i, s"w$i")).toDF("doc_id", "text")
    val banded = SimhashOps.bandedSimhash(shorts, "text", "doc_id", shingleN = 2)
    assert(banded.bands.count() == 0L, "short docs must be filtered before banding")
    assert(SimhashOps.neardupPairs(banded.bands, "doc_id").count() == 0L)
    assert(banded.overflowBuckets == 0L, "filtered docs must not count as overflow")
  }

  test("meanOccupancy flags band-space saturation on a bounded-vocabulary corpus") {
    // Same hazard-3 gauge as LshOps: distinct docs over a 5-word
    // vocabulary concentrate the bigram-shingle SimHash, filling the
    // 15-bit band space; a per-doc-vocabulary corpus stays near 1.
    val vocab = Array("va", "vb", "vc", "vd", "ve")
    def doc(i: Long) = (0 until 12)
      .map(j => vocab((math.abs(i * 2654435761L + j * 40503L + i * j) % 5).toInt))
      .mkString(" ")
    // Gauge disabled here: this block MEASURES the gauge value on a
    // saturated-by-construction corpus; enforcement is asserted below.
    val saturated = SimhashOps.bandedSimhash(
      (1L to 3000L).map(i => (i, doc(i))).toDF("doc_id", "text"), "text", "doc_id",
      maxMeanOccupancy = Double.PositiveInfinity)
    assert(saturated.meanOccupancy > 10.0,
      s"saturated corpus not flagged: occupancy=${saturated.meanOccupancy}")
    val diverse = SimhashOps.bandedSimhash(
      (1L to 3000L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e")).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(diverse.meanOccupancy < 2.0,
      s"diverse corpus false-flagged: occupancy=${diverse.meanOccupancy}")
    // The optional hard gate (parity with LshOps.bandedMinhashAuto): the
    // saturated corpus must FAIL when a threshold is set, and the diverse
    // corpus must pass the same threshold.
    val e = intercept[IllegalStateException] {
      SimhashOps.bandedSimhash(
        (1L to 3000L).map(i => (i, doc(i))).toDF("doc_id", "text"),
        "text", "doc_id", maxMeanOccupancy = 8.0)
    }
    assert(e.getMessage.contains("saturated"))
    SimhashOps.bandedSimhash(
      (1L to 3000L).map(i => (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e")).toDF("doc_id", "text"),
      "text", "doc_id", maxMeanOccupancy = 8.0) // must not throw
    // Round 7: the gate is ON BY DEFAULT (shared 24.0 calibration) — the
    // saturated corpus fails with no knob at all.
    val e2 = intercept[IllegalStateException] {
      SimhashOps.bandedSimhash(
        (1L to 3000L).map(i => (i, doc(i))).toDF("doc_id", "text"), "text", "doc_id")
    }
    assert(e2.getMessage.contains("saturated"))
  }

  test("hot bucket over the cap is dropped and reported, cool buckets survive") {
    // 50 identical docs → one bucket of 50 in each of the 4 bands.
    val hot = (1L to 50L).map(i => (i, "one two three four five six seven")).toDF("doc_id", "text")
    val cool = Seq(
      (900L, "red orange yellow green blue indigo violet"),
      (901L, "red orange yellow green blue indigo violet")).toDF("doc_id", "text")
    // The 50-identical-doc fixture is saturated by construction (occupancy
    // 26 trips the round-7 default gauge) — disable it to exercise the cap
    // in isolation, as in SrpOpsSpec.
    val banded = SimhashOps.bandedSimhash(hot.union(cool), "text", "doc_id",
      shingleN = 2, maxBucket = 10, maxMeanOccupancy = Double.PositiveInfinity)
    assert(banded.overflowBuckets == 4L, "one over-cap bucket per band")
    val pairs = SimhashOps.neardupPairs(banded.bands, "doc_id")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((900L, 901L)), "capped bucket emits no pairs; cool bucket unaffected")
  }

  test("pigeonhole recall: every fixture pair at hamming <= 3 is found") {
    // Ground truth by brute force over the fixture signatures (500 docs at
    // sf0.001 — quadratic is fine in a test), then assert the banded
    // operator reproduces exactly the <= 3 subset plus only-verified pairs
    // beyond it (all output passed the exact hamming filter, so precision
    // is 100% by construction; completeness is guaranteed only <= 3).
    val docs = Tables(spark, TestSpark.sfDir, "documents")
    val sigs = docs.filter(size(TextFunctions.tokens($"text")) >= 2)
      .select($"doc_id", TextFunctions.simhashShingle60($"text", 2).as("sh"))
    val a = sigs.select($"doc_id".as("doc_a"), $"sh".as("sha"))
    val b = sigs.select($"doc_id".as("doc_b"), $"sh".as("shb"))
    val truth3 = a.join(b, $"doc_a" < $"doc_b")
      .filter(bit_count($"sha".bitwiseXOR($"shb")) <= 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    val banded = SimhashOps.bandedSimhash(docs, "text", "doc_id", shingleN = 2)
    val found = SimhashOps.neardupPairs(banded.bands, "doc_id", maxHamming = 6)
    val found3 = found.filter($"hamming" <= 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(found3 == truth3,
      s"pigeonhole guarantee violated: missing=${(truth3 -- found3).take(5)}")
    // And the exact filter bounds every reported pair.
    assert(found.filter($"hamming" > 6).count() == 0L)
  }

  test("candidate pairs are bounded linearly by the cap") {
    // sum over buckets of c² with c <= K is <= K · (band rows): the join
    // can never exceed maxBucket × bandRows rows — the linear-scale bound.
    val docs = Tables(spark, TestSpark.sfDir, "documents")
    val banded = SimhashOps.bandedSimhash(docs, "text", "doc_id", shingleN = 2, maxBucket = 5)
    val bandRows = banded.bands.count()
    val joinRows = banded.bands.select($"b", $"bv")
      .groupBy($"b", $"bv").agg(count(lit(1)).as("c"))
      .agg(sum($"c" * $"c")).as[Long].head()
    assert(joinRows <= 5L * bandRows, s"join rows $joinRows > cap*rows ${5L * bandRows}")
  }
}
