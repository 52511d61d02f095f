package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling (SURVEY §2.3 E83) — the data-quality report an
  * ingestion pipeline computes before trusting a new source: per column,
  * row count, null count, distinct count, min/max. The reference's catalog
  * pass trusts its `tables_list` metadata blindly; this is the "measure the
  * data itself" counterpart.
  *
  * ONE job for all columns: every metric is a single wide `agg`, then the
  * row unpivots with `stack` — the input is scanned once, partial
  * aggregates combine map-side. `exact=false` (the 100 TB default) swaps
  * `count_distinct` for the HLL sketch: multi-column exact distinct counts
  * expand the input (one replica per distinct column — Spark's Expand
  * operator), which is fine at audit scale and ruinous at corpus scale.
  */
object ProfileOps {

  /** Profile numeric columns: `(column, n, n_null, n_distinct, min, max)`
    * with min/max as doubles.
    *
    * `rsd` is the HLL relative standard deviation for `exact=false`.
    * Spark's HLL++ has no sparse-mode small-cardinality shortcut, so tiny
    * cardinalities see the full register noise — rsd 0.02 (~2.6 k registers,
    * ~5 KB per sketch) keeps low-cardinality estimates inside ±5% where the
    * 0.05 default does not, at negligible memory cost for a profiler. */
  def profileNumeric(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true,
      rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty)
    val n = count(lit(1)).as("_n")
    val metrics = cols.flatMap { c =>
      val d = if (exact) count_distinct(col(c)) else approx_count_distinct(col(c), rsd)
      Seq(
        sum(col(c).isNull.cast("long")).as(s"_null_$c"),
        d.as(s"_dist_$c"),
        min(col(c).cast("double")).as(s"_min_$c"),
        max(col(c).cast("double")).as(s"_max_$c"))
    }
    val wide = df.agg(n, metrics: _*)
    val stacked = cols.map(c =>
      s"'$c', _null_$c, _dist_$c, _min_$c, _max_$c").mkString(", ")
    wide.select(
      expr(s"stack(${cols.size}, $stacked) AS (column, n_null, n_distinct, min, max)"),
      col("_n").as("n"))
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        col("min"), col("max"))
  }
}
