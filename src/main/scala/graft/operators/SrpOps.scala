package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Banded signed-random-projection LSH for embedding near-dup — the scale
  * path the round-6 measurement demands: the single-table 8-bit SRP bucket
  * join (q58's fixture-scale construction) is n²/256 — measured 0.52 s →
  * 42.3 s (81×) for 10× vectors at 200 k, exactly SimhashOps hazard 3 in
  * embedding space. This operator is [[SimhashOps]] transplanted onto SRP
  * signatures: a 60-bit signature (60 independent pseudo-random
  * hyperplanes via the codegen'd `SrpBucketExpr`), banded 4 × 15 bits, a
  * per-bucket occupancy cap with an overflow metric, and an exact cosine
  * verification on candidates only.
  *
  * Geometry sets the recall: P(one bit agrees) = 1 − θ/π for angle θ, so
  * a 15-bit band retains ≈ (1 − θ/π)¹⁵ and 4 bands give
  * 1 − (1 − p_band)⁴ — ≈ 0.94 at cos 0.99, ≈ 0.6 at cos 0.95, small for
  * anything weaker. That is the right shape for near-DUP detection
  * (seeded dups sit at cos ≈ 0.99); for a looser similarity threshold use
  * more bands of fewer bits (parameters exposed), or the IVF path (q81)
  * for genuine top-k search. Candidates are bounded by
  * `maxBucket · nBands · n` (linear in n) at ANY corpus size, with
  * dropped buckets reported, and the occupancy gauge can be enforced
  * loudly like [[LshOps.bandedMinhashAuto]].
  */
object SrpOps {

  /** @param bands capped banded frame: (idCol, vecCol, b, bv)
    * @param overflowBuckets number of (band, value) buckets dropped by the cap
    * @param bandRows        total (vec, band) rows before the cap
    * @param distinctBuckets number of distinct (band, value) buckets
    */
  final case class Banded(
      bands: DataFrame,
      overflowBuckets: Long,
      bandRows: Long,
      distinctBuckets: Long) {
    /** Saturation gauge — see [[LshOps.Banded.meanOccupancy]]. */
    def meanOccupancy: Double =
      if (distinctBuckets == 0L) 0.0 else bandRows.toDouble / distinctBuckets
  }

  /** Explode vectors into capped (id, vec, band, bandValue) rows. One
    * shuffle on (b, bv) for the occupancy window; the candidate self-join
    * reuses that partitioning. */
  def bandedSrp(
      vecs: DataFrame,
      vecCol: String,
      idCol: String,
      nBands: Int = 4,
      bitsPerBand: Int = 15,
      maxBucket: Int = 200,
      maxMeanOccupancy: Double = Double.PositiveInfinity): Banded = {
    require(nBands > 0 && bitsPerBand > 0 && nBands * bitsPerBand <= 60,
      s"signature is at most 60 bits: nBands=$nBands x bitsPerBand=$bitsPerBand")
    require(maxBucket > 0, s"maxBucket must be positive: $maxBucket")
    val mask = (1L << bitsPerBand) - 1
    val sig = srpBucket(col(vecCol), nBands * bitsPerBand)
    val exploded = vecs
      .select(col(idCol), col(vecCol), posexplode(array(
        (0 until nBands).map(b =>
          shiftright(sig, b * bitsPerBand).bitwiseAND(lit(mask))): _*
      )).as(Seq("b", "bv")))
      .withColumn("_graft_bn", count(lit(1)).over(Window.partitionBy(col("b"), col("bv"))))
      .persist()
    // Eager materialization + the three health metrics in one job (the
    // signature computes once, before any join side can race on the cache).
    val stats = exploded
      .select(col("b"), col("bv"), col("_graft_bn").as("c")).distinct()
      .agg(
        sum(when(col("c") > maxBucket, 1L).otherwise(0L)),
        sum(col("c")),
        count(lit(1)))
      .head()
    val banded = Banded(
      exploded.filter(col("_graft_bn") <= maxBucket).drop("_graft_bn"),
      overflowBuckets = if (stats.isNullAt(0)) 0L else stats.getLong(0),
      bandRows = if (stats.isNullAt(1)) 0L else stats.getLong(1),
      distinctBuckets = stats.getLong(2))
    if (banded.meanOccupancy > maxMeanOccupancy) {
      banded.bands.unpersist()
      throw new IllegalStateException(
        f"SRP band space saturated: meanOccupancy=${banded.meanOccupancy}%.1f > " +
          f"$maxMeanOccupancy%.1f (bandRows=${banded.bandRows}, buckets=${banded.distinctBuckets}). " +
          "Candidate pairs are heading to n²/B; widen bitsPerBand or dedup exactly.")
    }
    banded
  }

  /** Distinct near-dup pairs (a < b) with exact cosine ≥ `minCos`.
    * Candidates meet on the (b, bv) key — never a cross join; the cosine
    * runs only on candidate pairs. */
  def neardupPairs(bands: DataFrame, vecCol: String, idCol: String, minCos: Double): DataFrame = {
    val a = bands.select(col("b"), col("bv"), col(idCol).as("vid_a"), col(vecCol).as("_va"))
    val b2 = bands.select(col("b"), col("bv"), col(idCol).as("vid_b"), col(vecCol).as("_vb"))
    a.join(b2, Seq("b", "bv")).filter(col("vid_a") < col("vid_b"))
      .select(col("vid_a"), col("vid_b"), col("_va"), col("_vb")).distinct()
      .select(col("vid_a"), col("vid_b"), cosine(col("_va"), col("_vb")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
