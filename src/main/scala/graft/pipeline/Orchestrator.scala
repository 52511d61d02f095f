package graft.pipeline

import java.util.concurrent.Executors
import org.apache.spark.sql.{SaveMode, SparkSession}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

/** Run report for one pipeline execution — in-process replacement for the
  * reference's stdout/XCom contract (`/root/reference/app.py:168`,
  * `dags/...:52-79`).
  */
final case class RunReport(results: Map[String, Try[CopyResult]]) {
  def succeeded: Map[String, CopyResult] =
    results.collect { case (k, Success(v)) => k -> v }
  def failed: Map[String, Throwable] =
    results.collect { case (k, Failure(e)) => k -> e }
}

/** Bounded-parallel per-table execution with per-table fault isolation.
  *
  * The reference runs at most 4 concurrent Docker copy tasks
  * (`/root/reference/dags/data_pipeline_with_incremental.py:89-90`) and, in
  * CLI mode, logs-and-continues on per-table error
  * (`/root/reference/app.py:175-177`). Here: a fixed thread pool of
  * `parallelism` submits independent Spark jobs against the shared session
  * (Spark schedules them concurrently — the in-process analogue of the DAG's
  * parallel chains, SURVEY §2.1 R13), and each table is wrapped in `Try`.
  */
object Orchestrator {

  /** @param tableTimeout bound on how long we wait for any single table.
    *        A hung source (dead JDBC endpoint, stuck filesystem) must not
    *        hang the WHOLE run forever: the await is bounded per table and a
    *        timeout is recorded as that table's failure in the report,
    *        preserving the reference's per-table fault isolation
    *        (`app.py:175-177`) under hangs. On timeout the stuck job is
    *        actively killed — its Spark job group is cancelled (aborting
    *        in-flight stages) and its pool thread interrupted — so a
    *        timed-out table cannot later wake up, commit its sink, and
    *        advance the watermark underneath an external retry. The one
    *        unavoidable window (sink already committed, state not yet
    *        written) is the standard hazard-2 crash window; pair with
    *        [[IdempotentSink]] to make the retry overwrite, not append.
    */
  def runAll(
      spark: SparkSession,
      specs: Seq[TableSpec],
      source: Source,
      sink: Sink,
      state: WatermarkState,
      mode: SaveMode = SaveMode.Append,
      parallelism: Int = 4,
      tableTimeout: Duration = Duration.Inf): RunReport = {

    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = specs.zipWithIndex.map { case (spec, i) =>
        val group = s"graft-copy-$i-${spec.tableName}"
        val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
        val worker = new java.util.concurrent.atomic.AtomicReference[Thread]()
        // `worker` handoff is lock-protected so a post-timeout interrupt can
        // never land on the pool thread AFTER it moved on to another table.
        val lock = new Object
        val f = Future {
          // A table cancelled while still QUEUED (pool saturated by other
          // hung tables) must not run at all — its job group was never set,
          // so cancelJobGroup alone could not stop it. The check and the
          // worker/job-group registration are ONE atomic step under `lock`:
          // otherwise a timeout firing between them would cancel an
          // unregistered group and interrupt a null worker, and the table
          // would run to completion un-killed (committing sink + watermark
          // despite its recorded timeout failure).
          val started = lock.synchronized {
            if (cancelled.get()) false
            else {
              worker.set(Thread.currentThread())
              spark.sparkContext.setJobGroup(group, s"copy ${spec.tableName}",
                interruptOnCancel = true)
              true
            }
          }
          if (!started)
            Failure(new java.util.concurrent.TimeoutException(
              s"table ${spec.tableName} cancelled before start"))
          else {
            try Try(CopyJob.run(spark, spec, source, sink, state, mode))
            finally {
              spark.sparkContext.clearJobGroup()
              lock.synchronized {
                worker.set(null)     // no further interrupts aimed here
                Thread.interrupted() // clear any that already landed
              }
            }
          }
        }
        (spec.tableName, group, cancelled, worker, lock, f)
      }
      val done = futures.map { case (name, group, cancelled, worker, lock, f) =>
        name -> Try(Await.result(f, tableTimeout)).recover {
          case _: java.util.concurrent.TimeoutException =>
            // Kill, don't abandon: forbid a queued start, cancel the
            // table's Spark jobs, and interrupt its driver-side thread so
            // it cannot commit sink or state later. Under the SAME lock as
            // the task's start step, so exactly one of two worlds holds:
            // the task never starts, or the cancel/interrupt targets a
            // fully registered worker + job group.
            lock.synchronized {
              cancelled.set(true)
              spark.sparkContext.cancelJobGroup(group)
              Option(worker.get()).foreach(_.interrupt())
            }
            Failure(new java.util.concurrent.TimeoutException(
              s"table $name did not finish within $tableTimeout"))
        }.flatten
      }
      RunReport(done.toMap)
    } finally pool.shutdown()
  }
}
