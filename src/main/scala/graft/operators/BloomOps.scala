package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * The filter itself is `DataFrameStatFunctions.bloomFilter` (one pass over
  * the dim, sketch merged driver-side) + a broadcast probe. The probe is a
  * deliberate exception to the no-UDF rule: it guards a shuffle that would
  * otherwise move ~everything, and Spark's own runtime bloom injection
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) only triggers on
  * statistics it can see — this operator is the explicit, always-available
  * form.
  */
object BloomOps {

  /** `fact` reduced to rows whose `factKey` is PROBABLY in `dim.dimKey`
    * (no false negatives; ≈`fpp` false positives). */
  def bloomSemiFilter(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    fact.filter(might(col(factKey).cast("long")))
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
