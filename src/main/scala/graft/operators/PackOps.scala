package graft.operators

import graft.functions.TextFunctions.{tokenCount, tokens}
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing (SURVEY §2.3 E82) — the GPT-style pretraining layout:
  * concatenate the corpus in a deterministic document order and cut every
  * `exampleTokens` tokens into one training example. Each document is
  * assigned the example index its first token lands in, plus whether it
  * straddles an example boundary (loses context at the cut).
  *
  * The whole computation is a GLOBAL running sum of token counts — the
  * textbook way (`sum().over(Window.orderBy(id))` with no partition key)
  * funnels the entire corpus through ONE task. This operator is the
  * two-phase parallel prefix sum instead:
  *
  *   1. range-partition by id (contiguous ordered ranges), local running
  *      sums per partition — fully parallel;
  *   2. per-partition TOTALS (one row per partition) come to the driver,
  *      their prefix sums become each partition's global offset — O(#
  *      partitions), broadcast back;
  *   3. global cumsum = local cumsum + partition offset — narrow map.
  *
  * Range boundaries only decide which partition a row computes in, never
  * the result, so the output is layout-independent (spec-gated at two
  * different range counts).
  */
object PackOps {

  /** One row per doc: `(idCol, n_tok, pack_id, straddles)` under
    * concatenate-in-id-order-and-cut-every-`exampleTokens` packing. */
  def packSequences(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      exampleTokens: Int,
      nRanges: Int = 0): DataFrame = {
    require(exampleTokens >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val nR = if (nRanges > 0) nRanges else spark.sparkContext.defaultParallelism

    val counts = docs.select(
      col(idCol).cast("long").as("id"),
      tokenCount(col(textCol)).cast("long").as("n_tok"))

    // Phase 1: contiguous ordered ranges, local running sums. Materialized
    // eagerly — phase 2 aggregates it and phase 3 maps over it; without the
    // checkpoint the shuffle would replay for each.
    val local = counts
      .repartitionByRange(nR, col("id"))
      .sortWithinPartitions(col("id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var cum = 0L
        it.map { case (id, n) => cum += n; (pid, id, n, cum) }
      }
      .toDF("pid", "id", "n_tok", "cum_incl")
      .localCheckpoint(true)

    // Phase 2: partition totals → prefix offsets (empty ranges contribute 0).
    val totals = local.groupBy(col("pid")).agg(max(col("cum_incl")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val offsets = (0 until nR).scanLeft(0L) {
      case (acc, p) => acc + totals.getOrElse(p, 0L)
    }.init.zipWithIndex.map { case (off, p) => (p, off) }
    val offDf = offsets.toDF("pid", "off")

    // Phase 3: narrow map; the offsets frame is #partitions rows, broadcast.
    local.join(broadcast(offDf), "pid")
      .withColumn("cum0", col("off") + col("cum_incl") - col("n_tok"))
      .select(
        col("id").as(idCol),
        col("n_tok"),
        expr(s"cum0 div $exampleTokens").as("pack_id"),
        ((col("cum0") % exampleTokens) + col("n_tok") > exampleTokens)
          .as("straddles"))
  }
}
