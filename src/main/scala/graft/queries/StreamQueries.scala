package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming-semantics corpus (SURVEY §2.3 E41-E45, E55-E56, E69),
  * oracle-checked in
  * batch mode: `window()`, `session_window()` and dedup semantics are
  * identical on batch DataFrames, and DuckDB reproduces them with epoch
  * arithmetic / gap-and-cumsum sessionization. The live Structured
  * Streaming execution of the same operators (readStream, withWatermark,
  * foreachBatch) is exercised by the ScalaTest suite in
  * `graft.streaming`.
  */
object StreamQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E86 transformWithState (typed ValueState/MapState per key): per-user
    // running profile. In batch mode state starts empty and each key's
    // rows arrive as one group, so the result is the plain per-user
    // aggregate — which is exactly what the oracle states. The live
    // cross-batch state carry is StreamingSpec's TWS test.
    "q99_tws_stats" -> ((s, dir) => {
      import s.implicits._
      graft.streaming.StreamingOps.runningStats(
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("value"))
          .as[graft.streaming.StreamingOps.TypedEvent])
        .toDF()
    }),

    // E41 tumbling window (10 min) per event type.
    "q60_tumbling_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
    }),

    // E41 sliding window (10 min, slide 5 min).
    "q61_sliding_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("n"))
    }),

    // E42 session window: 30-min inactivity gap per user. Spark's
    // session_window.end = last event + gap; the oracle reproduces it with
    // lag/gap-flag/cumsum sessionization.
    "q62_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(
          col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"), col("sum_value"))
    }),

    // E44 stateful dedup semantics: first event per (user, type), keyed
    // deterministically by (ts, event_id).
    "q63_stateful_dedup" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
    }),

    // Custom keyed state via flatMapGroupsWithState: per-user running
    // sequence numbers (graft.streaming.StreamingOps.runningSeq). In batch
    // the operator starts from empty state, so the oracle is a row_number
    // window; the cross-batch state carryover is exercised live in
    // StreamingSpec.
    "q67_stateful_seq" -> ((s, dir) => {
      import s.implicits._
      graft.streaming.StreamingOps.runningSeq(
        t(s, dir, "events")
          .select(col("event_id"), col("ts"), col("user_id"))
          .as[graft.streaming.StreamingOps.EventKey])
        .toDF()
    }),

    // Stream-stream interval join semantics in batch: every click within
    // the hour BEFORE each purchase by the same user (all matches — the
    // join-variant of q54's as-of single match). Equi join on user_id with
    // a residual time filter: one shuffle, scales with key cardinality.
    "q69_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      graft.streaming.StreamingOps
        .intervalJoin(p, "p_ts", c, "c_ts", Seq("user_id"), "1 HOUR")
        .select(col("purchase_id"), col("click_id"))
    }),

    // E69 stream-static enrichment in batch: every event decorated with
    // its user's static customer attributes via a broadcast left join —
    // events without a matching dimension row survive with nulls.
    "q83_stream_enrich" -> ((s, dir) => {
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_name"), col("c_nationkey"))
      graft.streaming.StreamingOps
        .enrichStatic(t(s, dir, "events"), dim, Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("c_name"), col("c_nationkey"))
    }),

    // E43 watermark late-data drop semantics in batch: only events within
    // 24h of the stream's max timestamp survive, then windowed counts.
    "q64_watermark_drop" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val maxTs = e.agg(max(col("ts")).as("max_ts"))
      e.crossJoin(broadcast(maxTs))
        .filter(col("ts") >= col("max_ts") - expr("INTERVAL 24 HOURS"))
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("n"))
    }),

    // E141 windowed heavy hitters (round 12): "what dominated each
    // hour" — one Misra–Gries sketch per tumbling window (the SAME
    // single-agg shape runs live under readStream + watermark,
    // live-spec'd in StreamingSpec), top-3 per window. Capacity 16 >
    // the 5 event types, so the sketch is exact and err_max 0 — both
    // oracle-pinned, the q153 discipline.
    "q158_windowed_heavy_hitters" -> ((s, dir) =>
      graft.operators.SketchOps.windowedHeavyHitters(
        t(s, dir, "events"), "ts", "event_type", "1 hour",
        capacity = 16, k = 3))
  )

  // Epoch-aligned bucket start (identical to Spark's window() alignment).
  private def bucketSql(sec: Int, shift: Int = 0): String =
    if (shift == 0)
      s"CAST(to_timestamp(floor(epoch(ts) / $sec) * $sec) AS TIMESTAMP)"
    else
      s"CAST(to_timestamp(floor((epoch(ts) - $shift) / $sec) * $sec + $shift) AS TIMESTAMP)"

  val oracle: Map[String, String] = Map(
    // Batch TWS with empty initial state ≡ the plain per-key aggregate.
    "q99_tws_stats" ->
      """SELECT user_id, count(*) AS n_events,
         CAST(count(DISTINCT event_type) AS INT) AS n_types,
         max(value) AS max_value
         FROM events GROUP BY user_id""",
    "q60_tumbling_window" ->
      s"""SELECT ${bucketSql(600)} AS window_start, event_type,
          count(*) AS n, round(sum(value), 2) AS sum_value
          FROM events GROUP BY 1, 2""",
    "q61_sliding_window" ->
      s"""SELECT window_start, count(*) AS n FROM (
            SELECT CAST(to_timestamp(
                     floor((epoch(ts) - k * 300) / 600) * 600 + k * 300)
                   AS TIMESTAMP) AS window_start
            FROM events, unnest(range(0, 2)) AS u(k))
          GROUP BY window_start""",
    "q62_session_window" ->
      """WITH flagged AS (
           SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                       THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sess AS (
           SELECT user_id, ts, value,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, min(ts) AS session_start,
                max(ts) + INTERVAL 30 MINUTE AS session_end,
                count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM sess GROUP BY user_id, sid""",
    "q63_stateful_dedup" ->
      """SELECT user_id, event_type, event_id, ts FROM (
           SELECT user_id, event_type, event_id, ts,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
           FROM events)
         WHERE rn = 1""",
    "q67_stateful_seq" ->
      """SELECT user_id, event_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS BIGINT) AS seq
         FROM events""",
    "q69_interval_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
         WHERE p.event_type = 'purchase' AND c.event_type = 'click'""",
    "q64_watermark_drop" ->
      s"""SELECT ${bucketSql(3600)} AS window_start, count(*) AS n
          FROM events
          WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
          GROUP BY 1""",
    "q83_stream_enrich" ->
      """SELECT event_id, user_id, c_name, c_nationkey
         FROM events LEFT JOIN customer ON user_id = c_custkey""",
    // Per-window exact counts (capacity > distinct types → the sketch
    // IS exact), ranked (est desc, value asc), window_end = start + 1h.
    "q158_windowed_heavy_hitters" ->
      s"""SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
                 CAST(rank AS INT) AS rank, value, est,
                 CAST(0 AS BIGINT) AS err_max
          FROM (
            SELECT window_start, value, est,
                   row_number() OVER (PARTITION BY window_start
                     ORDER BY est DESC, value) AS rank
            FROM (SELECT ${bucketSql(3600)} AS window_start,
                         event_type AS value, count(*) AS est
                  FROM events GROUP BY 1, 2))
          WHERE rank <= 3"""
  )
}
