package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Explicit bloom-filter join prefilter (SURVEY §2.3 E79) — the runtime-
  * filter pattern for "large fact ⋈ selective dim" when the dim side is too
  * big (or too late-bound) to broadcast as rows but its KEY SET compresses
  * into a few megabytes of bitmap.
  *
  * Why it matters at 100 TB: a shuffled join materializes and redistributes
  * EVERY fact row, matching or not. Prefiltering against the dim's bloom
  * filter drops non-matching fact rows at the scan — before the exchange —
  * so the shuffle carries only (matches + fpp·non-matches). With a 1%-
  * selective dim and fpp=1%, that is ~50× less shuffled data for the price
  * of a broadcast bitmap (~1.2 MB per million keys at 1% fpp). Bloom
  * filters have no false negatives, so the subsequent real join makes the
  * result exact; false positives only cost wasted shuffle rows.
  *
  * Both halves are Spark's OWN runtime-filter machinery, driven explicitly:
  * the filter is built by the `BloomFilterAggregate` Catalyst aggregate
  * (distributed partials, map-side combine — not a driver-side RDD fold)
  * and the probe is `BloomFilterMightContain`, a codegen'd native
  * predicate. The probe therefore stays INSIDE whole-stage codegen on the
  * fact scan — the earlier Scala-UDF probe broke the scan's codegen span —
  * and both sides hash with the same `XxHash64`, the invariant Spark's own
  * `InjectRuntimeFilter` relies on. Spark's automatic injection
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) only triggers on
  * statistics it can see; this operator is the explicit, always-available
  * form.
  */
object BloomOps {

  /** The dim side's key set as a serialized bloom filter (one distributed
    * aggregate; partials merge map-side). Keys are hashed as
    * `xxhash64(cast(key as long))` — the probe must use the identical
    * hash, which [[bloomSemiFilter]] does. */
  private def buildFilter(
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val hashed = new XxHash64(Seq(ColumnBridge.expression(col(dimKey).cast("long"))))
    val agg = new BloomFilterAggregate(hashed, Literal(expectedItems), Literal(numBits))
      .toAggregateExpression()
    dim.select(ColumnBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0)
  }

  /** `fact` reduced to rows whose `factKey` is PROBABLY in `dim.dimKey`
    * (no false negatives; ≈`fpp` false positives). The predicate is the
    * native `might_contain` — codegen'd, so the fact scan's whole-stage
    * span survives. NULL keys never match (a bloom filter holds no null). */
  def bloomSemiFilter(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(dim, dimKey, expectedItems, fpp)
    val probe = BloomFilterMightContain(
      Literal(bytes),
      new XxHash64(Seq(ColumnBridge.expression(col(factKey).cast("long")))))
    fact.filter(ColumnBridge.column(probe))
  }

  /** Exact inner join with the bloom prefilter applied to the fact side
    * first. Equivalent to `fact.join(dim, fact(factKey) === dim(dimKey))`,
    * shuffling only the prefiltered fact. */
  def bloomJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    bloomSemiFilter(fact, factKey, dim, dimKey, expectedItems, fpp)
      .join(dim, col(factKey) === col(dimKey))
}
