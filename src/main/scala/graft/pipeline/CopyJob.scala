package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Result of one table copy. The reference communicates the new watermark to
  * its orchestrator by printing `NEW_WATERMARK_<T>=<v>` to stdout
  * (`/root/reference/app.py:160-172`); we return it in-process (SURVEY §7.3
  * hazard 7).
  */
final case class CopyResult(
    table: String,
    rowsCopied: Long,
    newWatermark: Option[WatermarkValue],
    skipped: Boolean)

/** One-table copy: the Spark-native rebuild of the reference's per-table
  * loop body (`/root/reference/app.py:88-177`).
  *
  * Dataflow: `source.read` → optional pushed-down watermark filter
  * (`util.py:149-159` rebuilt as a `Column` predicate — Catalyst pushes `>`
  * into the parquet/JDBC scan, SURVEY §4) → empty-delta skip
  * (`app.py:147-153`) → sink write → `agg(max(wm))` over the copied delta
  * (`util.py:403-426`: the reference computes the watermark from the fetched
  * data, not the source — we keep that definition, SURVEY §7.3 hazard 3).
  *
  * Scale notes: no driver materialization of table data (the delta count and
  * max are single-row aggregates); the strictly-greater `>` semantics match
  * the reference (`util.py:156,159`) including its documented lossiness for
  * equal-timestamp late arrivals (hazard 1).
  */
object CopyJob {

  def run(
      spark: SparkSession,
      spec: TableSpec,
      source: Source,
      sink: Sink,
      state: WatermarkState,
      mode: SaveMode = SaveMode.Append): CopyResult = {

    val full = source.read(spark, spec.tableName)

    val wm: Option[(String, WatermarkValue)] = for {
      wmCol <- spec.watermarkColumn
      wmType <- spec.watermarkType
      value <- WatermarkValue.decode(state.get(spec.tableName), wmType)
    } yield (wmCol, value)

    val delta = wm match {
      case Some((c, WatermarkValue.IdValue(v)))  => full.filter(col(c) > lit(v))
      case Some((c, WatermarkValue.TsValue(v)))  => full.filter(col(c) > lit(v))
      case None                                  => full
    }

    // Incremental runs (an existing watermark pushed into the scan) probe
    // the delta with a limit-1 existence check BEFORE writing: the common
    // steady-state is "no new rows", and skipping the write entirely keeps
    // sinks free of empty parquet parts (the reference skips the load too,
    // app.py:147-153). The probe reads at most one row off the
    // pushed-filtered scan — negligible next to the write it avoids.
    // Initial full loads skip the probe: they are never empty in practice
    // and the probe would be a wasted scan start-up.
    if (wm.isDefined && delta.isEmpty)
      return CopyResult(spec.tableName, 0L, None, skipped = true)

    // SINGLE scan: the row count and max(watermark) are collected as
    // observed metrics DURING the write, so the delta is read exactly once
    // (at 100 TB a second stats pass would double the dominant cost).
    val obs = org.apache.spark.sql.Observation(s"copy_${spec.tableName}")
    val metricCols = count(lit(1)).as("n") +:
      spec.watermarkColumn.map(c => max(col(c)).as("wm")).toSeq
    val observed = delta.observe(obs, metricCols.head, metricCols.tail: _*)
    sink match {
      case is: IdempotentSink =>
        // Batch token = the watermark this delta was read FROM (not to):
        // a crash before the state write replays the exact same token, so
        // the retry REPLACES the earlier attempt (hazard 2 closed for
        // sinks that can overwrite a batch). The path-safe encoding is
        // INJECTIVE — ASCII [A-Za-z0-9.-] pass through, everything else
        // (including '_', the escape marker) becomes _XXXX hex — because a
        // lossy sanitizer could collide two distinct watermarks onto one
        // token, letting a later batch dynamically overwrite an earlier
        // batch's partition and silently delete its rows.
        val token = wm.map(_._2.serialized).getOrElse("full").flatMap {
          case c if (c.isLetterOrDigit && c < 0x80) || c == '.' || c == '-' => c.toString
          case c => f"_${c.toInt}%04X"
        }
        is.writeBatch(observed, spec.tableName, token)
      case other => other.write(observed, spec.tableName, mode)
    }
    val stats = obs.get
    val n = stats("n").asInstanceOf[Long]
    val maxRaw =
      if (spec.watermarkColumn.isDefined) Option(stats("wm")) else None

    if (n == 0L) {
      // Empty delta: skip load, do NOT advance the watermark
      // (/root/reference/app.py:147-153).
      CopyResult(spec.tableName, 0L, None, skipped = true)
    } else {
      // The observed max arrives as whatever external type the session's
      // datetime config produces: java.sql.Timestamp by default,
      // java.time.Instant/LocalDateTime under datetime.java8API.enabled.
      // An UNRECOGNIZED type must fail loudly: silently returning None here
      // would copy rows but never advance the watermark, so every later run
      // re-appends the full table with no visible error.
      val newWm: Option[WatermarkValue] = (spec.watermarkType, maxRaw) match {
        case (Some(WatermarkType.Id), Some(v: Number)) =>
          Some(WatermarkValue.IdValue(v.longValue()))
        case (Some(WatermarkType.Timestamp), Some(t: java.sql.Timestamp)) =>
          Some(WatermarkValue.TsValue(t))
        case (Some(WatermarkType.Timestamp), Some(i: java.time.Instant)) =>
          Some(WatermarkValue.TsValue(java.sql.Timestamp.from(i)))
        case (Some(WatermarkType.Timestamp), Some(l: java.time.LocalDateTime)) =>
          Some(WatermarkValue.TsValue(java.sql.Timestamp.valueOf(l)))
        case (None, _) => None
        case (Some(wt), bad) =>
          throw new IllegalStateException(
            s"table ${spec.tableName}: watermark metric of type " +
              s"${bad.map(_.getClass.getName).getOrElse("null")} not usable as $wt " +
              "— refusing to advance silently (would re-copy forever)")
      }
      // State write strictly AFTER the sink commit (SURVEY §7.3 hazard 2).
      newWm.foreach(v => state.put(spec.tableName, v.serialized))
      CopyResult(spec.tableName, n, newWm, skipped = false)
    }
  }
}
