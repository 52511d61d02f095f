package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Watermark state store — the engine's analogue of Airflow Variables
  * (`/root/reference/dags/data_pipeline_with_incremental.py:38-79`).
  *
  * A flat `table=value` properties file, written atomically
  * (temp-file + move) so a crash between data commit and state update never
  * leaves a torn file. The reference's data-commit and watermark-update are
  * non-atomic across a process boundary (SURVEY §7.3 hazard 2); we can't
  * make file-sink + state a real transaction either, but we (a) write state
  * only AFTER the sink commit succeeds, and (b) keep re-runs idempotent at
  * the sink (overwrite-partition staging), so a crash in between only
  * re-copies, never corrupts.
  */
/** Minimal watermark-state contract: the copy path reads and advances
  * watermarks through this, so run-scoped overlays (env-injected values)
  * can wrap the durable store without mutating it. */
trait WatermarkState {
  def get(table: String): Option[String]
  def put(table: String, value: String): Unit
}

/** Run-scoped watermark overrides layered over a durable store — the
  * engine's version of the reference's `LAST_WATERMARK_<T>` env injection
  * (`app.py:100-117`), which is owned by the ORCHESTRATOR and scoped to one
  * run. Reads prefer the injected value; writes go to the durable store and
  * retire the override (the table's copy succeeded, so its REAL new
  * watermark now rules). Crucially, a FAILED injected run leaves the
  * durable store untouched — injecting a rolled-back watermark must not
  * permanently rewind state when the forced re-copy never committed.
  */
final class RunOverrides(
    base: WatermarkState,
    initial: Map[String, String]) extends WatermarkState {
  private var overrides = initial
  def get(table: String): Option[String] =
    this.synchronized(overrides.get(table)).orElse(base.get(table))
  def put(table: String, value: String): Unit = {
    base.put(table, value)
    this.synchronized { overrides -= table }
  }
}

final class StateStore(path: Path) extends WatermarkState {

  def get(table: String): Option[String] = read().get(table)

  /** Thread-safe: the orchestrator runs up to N table copies in parallel and
    * each finishes with a `put` on this shared store. The read-modify-write
    * must be one critical section or a concurrent pair can interleave and
    * silently drop a watermark (whose table would then re-copy its full
    * history on the next run). The atomic temp+move below protects against
    * torn FILES, not lost UPDATES — this lock covers the latter.
    */
  def put(table: String, value: String): Unit = this.synchronized {
    val m = read() + (table -> value)
    write(m)
  }

  def asMap: Map[String, String] = read()

  private def read(): Map[String, String] =
    if (!Files.exists(path)) Map.empty
    else
      Files.readAllLines(path, StandardCharsets.UTF_8).asScala
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _           => None
          }
        }.toMap

  private def write(m: Map[String, String]): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    val tmp = Files.createTempFile(
      Option(path.getParent).getOrElse(Paths.get(".")), ".state", ".tmp")
    val body = m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

object StateStore {
  def apply(path: String): StateStore = new StateStore(Paths.get(path))
}
