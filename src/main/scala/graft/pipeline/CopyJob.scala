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
      state: StateStore,
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

    // One pass computes count + max(wm) together; with a watermark column
    // this is a single scan producing a 1-row aggregate (never a collect of
    // table data). The write is a second scan — at 100 TB the source scan
    // dominates, and parquet/JDBC pushdown means only the delta is read.
    val aggCols = count(lit(1)).as("n") +:
      spec.watermarkColumn.map(c => max(col(c)).as("wm")).toSeq
    val writeAndStats = {
      val cached = delta // rely on pushdown; avoid caching 100TB deltas
      val stats = cached.agg(aggCols.head, aggCols.tail: _*).collect().head
      val n = stats.getLong(0)
      if (n > 0L) sink.write(cached, spec.tableName, mode)
      (n, if (spec.watermarkColumn.isDefined && !stats.isNullAt(1)) Some(stats.get(1)) else None)
    }
    val (n, maxRaw) = writeAndStats

    if (n == 0L) {
      // Empty delta: skip load, do NOT advance the watermark
      // (/root/reference/app.py:147-153).
      CopyResult(spec.tableName, 0L, None, skipped = true)
    } else {
      val newWm: Option[WatermarkValue] = (spec.watermarkType, maxRaw) match {
        case (Some(WatermarkType.Id), Some(v: Number)) =>
          Some(WatermarkValue.IdValue(v.longValue()))
        case (Some(WatermarkType.Timestamp), Some(t: java.sql.Timestamp)) =>
          Some(WatermarkValue.TsValue(t))
        case _ => None
      }
      // State write strictly AFTER the sink commit (SURVEY §7.3 hazard 2).
      newWm.foreach(v => state.put(spec.tableName, v.serialized))
      CopyResult(spec.tableName, n, newWm, skipped = false)
    }
  }
}
