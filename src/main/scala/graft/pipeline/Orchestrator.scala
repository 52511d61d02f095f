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
    *        (`app.py:175-177`) under hangs. The stuck job itself cannot be
    *        safely killed mid-write; it is abandoned on the pool thread and
    *        the pool is not awaited at shutdown.
    */
  def runAll(
      spark: SparkSession,
      specs: Seq[TableSpec],
      source: Source,
      sink: Sink,
      state: StateStore,
      mode: SaveMode = SaveMode.Append,
      parallelism: Int = 4,
      tableTimeout: Duration = Duration.Inf): RunReport = {

    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = specs.map { spec =>
        spec.tableName -> Future {
          Try(CopyJob.run(spark, spec, source, sink, state, mode))
        }
      }
      val done = futures.map { case (name, f) =>
        name -> Try(Await.result(f, tableTimeout)).recover {
          case e: java.util.concurrent.TimeoutException =>
            Failure(new java.util.concurrent.TimeoutException(
              s"table $name did not finish within $tableTimeout"))
        }.flatten
      }
      RunReport(done.toMap)
    } finally pool.shutdown()
  }
}
