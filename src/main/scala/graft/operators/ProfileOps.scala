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
    // A profiler's whole point is untrusted new sources, so column NAMES
    // are untrusted input: nothing user-supplied is ever parsed. Input
    // columns resolve through a backtick-escaped reference, intermediate
    // aliases are POSITIONAL (_null_0, not _null_<name>), and the unpivot
    // is built from Column objects (explode of a struct array — same
    // single-scan, one-row shape as stack) instead of an expr() string a
    // quoted/backticked name would break out of.
    def c(name: String) = col(s"`${name.replace("`", "``")}`")
    val n = count(lit(1)).as("_n")
    val metrics = cols.zipWithIndex.flatMap { case (cn, i) =>
      val d = if (exact) count_distinct(c(cn)) else approx_count_distinct(c(cn), rsd)
      Seq(
        sum(c(cn).isNull.cast("long")).as(s"_null_$i"),
        d.as(s"_dist_$i"),
        min(c(cn).cast("double")).as(s"_min_$i"),
        max(c(cn).cast("double")).as(s"_max_$i"))
    }
    val wide = df.agg(n, metrics: _*)
    val unpivot = explode(array(cols.zipWithIndex.map { case (cn, i) =>
      struct(
        lit(cn).as("column"),
        col(s"_null_$i").as("n_null"),
        col(s"_dist_$i").as("n_distinct"),
        col(s"_min_$i").as("min"),
        col(s"_max_$i").as("max"))
    }: _*))
    wide.select(unpivot.as("_m"), col("_n").as("n"))
      .select(col("_m.column").as("column"), col("n"), col("_m.n_null").as("n_null"),
        col("_m.n_distinct").as("n_distinct"), col("_m.min").as("min"),
        col("_m.max").as("max"))
  }
}
