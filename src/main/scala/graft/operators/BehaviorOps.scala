package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral event analytics: ordered funnels and cohort retention —
  * the BI queries the reference pipeline exists to feed (it copies
  * operational tables into a warehouse for exactly this downstream
  * analysis; here they are first-class operators).
  *
  * Both share the scalable shape of every per-entity sequence operator
  * here (q135): ONE shuffle on the entity key, bounded per-entity state,
  * integer outputs (hash-exact against any engine). No window over a
  * global ordering, no driver-side iteration.
  */
object BehaviorOps {

  /** Per-user funnel stage: the longest PREFIX of `steps` matched as a
    * subsequence of the user's time-ordered events (the standard ordered
    * funnel: a later 'view' can start the funnel, but 'click' only counts
    * after a matched 'view'). One groupBy(user) + an array fold — the
    * fold state is a single int, so a power user costs array length, not
    * joins. Sort key (ts, event_id): same-timestamp ties break
    * identically on every engine.
    *
    * @return (userCol, stage) — stage ∈ [0, steps.length]
    */
  def funnelStages(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "empty funnel")
    val k = steps.length
    val stepArr = array(steps.map(lit): _*)
    events
      .groupBy(col(userCol))
      .agg(array_sort(collect_list(
        struct(col(tsCol), col(idCol), col(typeCol).as("t")))).as("seq"))
      .select(col(userCol),
        aggregate(col("seq"), lit(0),
          (st, x) => when(st < k && x.getField("t") === element_at(stepArr, st + 1),
            st + 1).otherwise(st)).as("stage"))
  }

  /** Funnel report: one row per step with the count of users whose stage
    * reached it. The per-user stages table is users-sized; the step
    * explode is k rows per user (k tiny), aggregated right back down. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    val stages = funnelStages(events, userCol, tsCol, idCol, typeCol, steps)
    val stepDf = spark.range(1, steps.length + 1)
      .select(col("id").cast("int").as("step"),
        element_at(array(steps.map(lit): _*), col("id").cast("int")).as("step_type"))
    stages.crossJoin(broadcast(stepDf))
      .groupBy(col("step"), col("step_type"))
      .agg(count(when(col("stage") >= col("step"), 1)).as("n_users"))
  }

  /** Weekly cohort retention: users bucketed by first-seen week, counted
    * in every week they were active. `week_n` is the offset in weeks
    * (both ends are Monday-truncated so the difference is an exact
    * multiple of 7 days). Two user-keyed aggregations + one join on the
    * user id — cohort output is |cohorts|·|weeks|, tiny at any scale. */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    first.join(active, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_n"))
      .agg(count(lit(1)).as("n_users"))
  }
}
