package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-relative quantile gating (SURVEY §2.3 E93) — keep the rows that
  * clear a threshold derived from their OWN group's value distribution
  * (e.g. "each source keeps its documents at or above that source's median
  * length"). Fixed-threshold gates (E62, q75) misfire on a heterogeneous
  * corpus: a cutoff tuned for encyclopedic prose purges an entire
  * short-form source, while a cutoff tuned for the short-form source keeps
  * every low-quality row of the long-form one. Deriving the cutoff per
  * group adapts the gate to each source's regime with no hand tuning.
  *
  * Scale shape: ONE shuffle (the grouped percentile); the threshold frame
  * is |groups| rows — tiny at any corpus size, the group count does not
  * grow with rows — so it applies back as a BROADCAST equi-join, never a
  * second shuffle of the full rows and never a per-group window sort.
  *
  * The default exact `percentile` buffers every group member in one
  * aggregation buffer — the q39/q100 hazard: fine up to millions of rows
  * per group, an OOM class at 100 TB group sizes. Pass `approxAccuracy`
  * (e.g. 10000) to switch the threshold to `percentile_approx`
  * (Greenwald-Khanna, bounded sketch, rank error ≤ n/accuracy); the gate
  * then inherits the sketch's threshold tolerance but keeps the same plan.
  */
object GateOps {

  /** Rows of `df` whose `valueCol` is at or above their `groupCol` group's
    * `q`-quantile, with the group threshold attached as `gate_threshold`
    * for auditability. Ties at the threshold survive (>=), so at q=0.5 at
    * least half of every group survives. */
  def groupQuantileGate(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      q: Double,
      approxAccuracy: Option[Int] = None): DataFrame = {
    require(q > 0.0 && q < 1.0, s"quantile must be in (0,1), got $q")
    require(approxAccuracy.forall(_ > 0), "approxAccuracy must be positive")
    val v = col(valueCol).cast("double")
    val thr = approxAccuracy match {
      case Some(acc) => percentile_approx(v, lit(q), lit(acc))
      case None      => percentile(v, lit(q))
    }
    val thresholds = df.groupBy(col(groupCol)).agg(thr.as("gate_threshold"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(v >= col("gate_threshold"))
  }

  /** Per-group PERCENTILE NORMALIZATION: attach each row's percent rank
    * within its group — `pct_rank = |{rows in group with strictly
    * smaller value}| / (group size − 1)`, the SQL `percent_rank()`
    * definition (0 for a single-row group). The calibration step a
    * heterogeneous corpus needs BEFORE any cross-source threshold: raw
    * quality scores from different sources live on different scales
    * (an encyclopedic source's median length would be a short-form
    * source's 99th percentile), but each row's within-source percentile
    * is scale-free, so one global cut on `pct_rank` takes the same
    * FRACTION from every source. [[groupQuantileGate]] is the
    * one-threshold special case; this emits the whole calibrated score,
    * reusable across downstream mixing/gating decisions.
    *
    * Scale shape — deliberately NOT `percent_rank().over(Window
    * .partitionBy(group).orderBy(value))`, which funnels each group
    * through ONE task and sorts it there (the E76 window hazard; a
    * 10 TB source = one executor's death): aggregate per (group, value)
    * counts — the frame is DISTINCT-VALUE-sized, not row-sized — run
    * the cumulative "strictly below" sum over that small frame, and
    * broadcast it back onto the rows as an equi-join. Contract: the
    * caller bounds the distinct values per group (integer scores, or
    * rounded doubles) — the value table must stay maintenance-sized,
    * which is what makes the window-over-counts harmless. The contract
    * is ENFORCED, not trusted (the E87/E98 gauge discipline): the
    * distinct-value count per group rides the same window pass and any
    * group over `maxDistinctValues` refuses loudly at execution — a
    * caller passing raw unrounded doubles would otherwise silently
    * rebuild the one-task-per-group row-sized window this operator
    * exists to avoid. The division is two exact integers in IEEE double
    * (deterministic on any engine); the result is rounded to 6 dp on
    * both sides of the oracle. */
  def percentileNormalize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      maxDistinctValues: Long = 1L << 22): DataFrame = {
    require(maxDistinctValues >= 1,
      s"maxDistinctValues must be positive: $maxDistinctValues")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val counts = df.groupBy(col(groupCol), v.as("_pn_v"))
      .agg(count(lit(1)).as("_pn_n"))
    // Cumulative strictly-below count + group total, both over the
    // distinct-value frame (small by contract — and gauged below).
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_pn_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col(groupCol))
    val ranks = counts
      // The gauge: rows per group in the counts frame = distinct values
      // per group. Same window partition the totals already use, so it
      // costs no extra pass; the raise_error is woven into the frame
      // and cannot be pruned.
      .withColumn("_pn_nv", count(lit(1)).over(wTot))
      .withColumn("_pn_below",
        when(col("_pn_nv") > maxDistinctValues, raise_error(concat(
          lit("percentileNormalize: group "), col(groupCol).cast("string"),
          lit(" has "), col("_pn_nv").cast("string"),
          lit(s" distinct $valueCol values — over the $maxDistinctValues bound. " +
            "The distinct-value frame must stay maintenance-sized (integer or " +
            "pre-rounded scores): round/bucket the value column, or raise " +
            "maxDistinctValues knowingly."))).cast("long"))
          .otherwise(coalesce(sum(col("_pn_n")).over(w), lit(0L))))
      .withColumn("_pn_tot", sum(col("_pn_n")).over(wTot))
      .select(col(groupCol).as("_pn_g"), col("_pn_v"),
        col("_pn_below"), col("_pn_tot"))
    // Null-safe join: a null score (or group) must keep its row — the
    // engine's percent_rank() semantics this operator mirrors (Spark
    // sorts nulls FIRST ascending, so a null value ranks 0 within its
    // group; the window over the counts frame applies the same order).
    // An equi-join here would silently drop null-scored rows from the
    // calibrated corpus.
    df.join(broadcast(ranks),
        col(groupCol) <=> col("_pn_g") && v <=> col("_pn_v"))
      .drop("_pn_g", "_pn_v")
      .withColumn("pct_rank",
        when(col("_pn_tot") === 1L, lit(0.0)).otherwise(
          round(col("_pn_below").cast("double") / (col("_pn_tot") - 1L), 6)))
      .drop("_pn_below", "_pn_tot")
  }
}
