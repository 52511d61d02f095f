package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SimHash hamming-LSH near-dup detection as a reusable operator (SURVEY
  * §2.3 E71) — the shared machinery behind q84, structured exactly like
  * [[LshOps]] because it faces the same two O(n²) crawl hazards (short
  * docs, hot buckets) plus one of its own:
  *
  *  3. '''Band-space saturation.''' With B possible values per band,
  *     random (non-near-dup) band collisions grow as n²/B. The round-5
  *     sf1 measurement caught the original 30-bit/3×10-band construction
  *     doing exactly that: 3 072 total buckets saturated and the candidate
  *     join grew 58 k → 5.9 M rows for 10× data (11.9× runtime). The fix
  *     is a wider signature banded wider — 60-bit SimHash in 4 bands of
  *     15 bits (32 768 values/band) — which ALSO upgrades the pigeonhole
  *     recall guarantee: 4 bands mean any pair within hamming ≤ 3 shares a
  *     clean band and is guaranteed a candidate (3 differing bits cannot
  *     touch all 4 bands). Beyond the guarantee, standard LSH recall
  *     (measured 23/25 seeded near-dup pairs at hamming ≤ 6 on the sf0.01
  *     fixture). Band width is still fixed, so collisions are still n²/B
  *     asymptotically — the occupancy cap is what bounds the join at any
  *     scale: with cap K, candidate pairs ≤ K·nBands·n (linear in n), and
  *     dropped buckets are REPORTED, not silent (organic max bucket at sf1
  *     is 71, so cap 200 never binds on non-degenerate data).
  *
  * The signature frame is persisted and materialized eagerly for the same
  * reason as LshOps: the per-doc SimHash is the dominant cost and must
  * compute once, not once per self-join side.
  */
object SimhashOps {

  /** Bits per band (4 bands × 15 bits = the 60-bit signature). */
  val BandBits = 15
  val NBands = 4

  /** @param bands capped banded frame: (idCol, sh, b, bv)
    * @param overflowBuckets number of (band, value) buckets dropped by the cap
    * @param bandRows        total (doc, band) rows before the cap
    * @param distinctBuckets number of distinct (band, value) buckets
    */
  final case class Banded(
      bands: DataFrame,
      overflowBuckets: Long,
      bandRows: Long,
      distinctBuckets: Long)(
      private[operators] val persisted: DataFrame) {
    /** Mean bucket occupancy — the saturation gauge (see LshOps.Banded):
      * growing with the corpus means the 15-bit band space is filling and
      * candidate pairs are heading to n²/B; the cap then bounds the join
      * while this number tells the caller WHY buckets are hot. */
    def meanOccupancy: Double =
      if (distinctBuckets == 0L) 0.0 else bandRows.toDouble / distinctBuckets
    /** Release the persisted signature frame. `bands` is a projection OVER
      * the persisted frame, so `bands.unpersist()` would be a silent no-op
      * (non-cascading unpersist matches only the exact cached plan) — this
      * targets the real cache entry. */
    def unpersist(): Unit = { persisted.unpersist(); () }
  }

  /** Explode docs into capped (id, signature, band, bandValue) rows.
    * One shuffle on (b, bv) for the bucket-size window; the downstream
    * self-join reuses that partitioning.
    */
  def bandedSimhash(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 2,
      maxBucket: Int = 200,
      maxMeanOccupancy: Double = SrpOps.DefaultMaxMeanOccupancy): Banded = {
    require(maxBucket > 0, s"maxBucket must be positive: $maxBucket")
    val exploded = docs
      // Hazard 1 (short docs): < shingleN tokens → empty shingle set → the
      // all-ones majority signature, shared by EVERY such doc — one
      // mega-bucket on a real crawl. Such docs can't be shingle near-dups
      // of anything, so drop them before banding. The guard, signature,
      // and band extraction are FUSED into one codegen'd expression
      // (round 18): empty array below shingleN tokens so the posexplode
      // drops them — one tokenization per doc where the former shape paid
      // a tokenCount filter pass plus the signature's own (the guarded
      // scalar and generator alternatives measured worse; see
      // Simhash60BandedExpr).
      .select(col(idCol), posexplode(
        simhash60Banded(col(textCol), shingleN, NBands, BandBits)).as(Seq("b", "_graft_x")))
      .select(col(idCol), col("_graft_x.sh").as("sh"), col("b"), col("_graft_x.bv").as("bv"))
      // Hazard 2 (hot buckets): occupancy computed on the same (b, bv)
      // partitioning the self-join will use.
      .withColumn("_graft_bn", count(lit(1)).over(Window.partitionBy(col("b"), col("bv"))))
      .persist()
    // Eager materialization AND all three health metrics in one job
    // (signatures compute exactly once, before any join side can race on
    // the cache): one row per (band, value) bucket, then overflow count,
    // row count, and bucket count together.
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
      distinctBuckets = stats.getLong(2))(exploded)
    // LOUD saturation gate, ENFORCED by default since round 7 (the shared
    // 24.0 calibration: the measured-good regime — 500 k docs at gsf10 —
    // runs at occupancy 15.7 with the cap reporting 258 over-limit
    // buckets, while genuine saturation like the round-5 30-bit
    // construction runs at 100s). The 15-bit band space is fixed, so past
    // ~32 k × 4 well-spread docs the gauge rises by construction — a
    // 100 TB caller handles the failure (wider signature, exact dedup)
    // instead of paying for a junk-dominated candidate join the cap
    // merely bounds.
    if (banded.meanOccupancy > maxMeanOccupancy) {
      banded.unpersist()
      throw new IllegalStateException(
        f"SimHash band space saturated: meanOccupancy=${banded.meanOccupancy}%.1f > " +
          f"$maxMeanOccupancy%.1f (bandRows=${banded.bandRows}, buckets=${banded.distinctBuckets}). " +
          "Candidate pairs are heading to n²/B; widen the signature/bands or dedup exactly.")
    }
    banded
  }

  /** Distinct near-dup pairs (a < b) within `maxHamming` over the 60-bit
    * signatures. Candidates meet on the (b, bv) key — never a cross join;
    * the exact hamming filter (native bit_count over XOR) runs only on
    * candidate pairs. */
  def neardupPairs(bands: DataFrame, idCol: String, maxHamming: Int = 6): DataFrame = {
    val a = bands.select(col("b"), col("bv"), col(idCol).as("doc_a"), col("sh").as("sha"))
    val b2 = bands.select(col("b"), col("bv"), col(idCol).as("doc_b"), col("sh").as("shb"))
    a.join(b2, Seq("b", "bv")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sha"), col("shb")).distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
