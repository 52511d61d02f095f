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
}
