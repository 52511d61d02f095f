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
    val banded = SrpOps.bandedSrp((hot ++ cool).toDF("vec_id", "embedding"),
      "embedding", "vec_id", maxBucket = 10)
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
}
