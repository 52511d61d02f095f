package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}
import scala.concurrent.duration.{Duration, DurationLong}

/** CLI entry point — the engine's `app.py` (`/root/reference/app.py:31-46`).
  *
  * {{{
  * GraftApp <env> <table|t1,t2|all> [--tables-list-path P] [--source fmt:loc]
  *          [--sink fmt:loc] [--state P] [--mode append|overwrite]
  *          [--parallelism N] [--table-timeout-sec N]
  * }}}
  *
  * Contract parity with the reference CLI:
  *  - positional `env` + comma-separated table arg or `all`
  *    (`app.py:32-40`); `--tables-list-path` default `tables_list`
  *    (`app.py:41-46`),
  *  - connection settings resolve from the env-keyed config with creds in
  *    the process environment (`app.py:55-60` → [[PipelineConfig]]);
  *    `--source`/`--sink` override them explicitly,
  *  - `LAST_WATERMARK_<TABLE>` process-env entries seed the state store
  *    (`app.py:100-117`: the orchestrator injects watermarks via env), and
  *    new watermarks are printed as `NEW_WATERMARK_<TABLE>=<v>` lines
  *    (`app.py:168`),
  *  - per-table errors log and continue (`app.py:175-177`); only setup
  *    failures (unknown env, empty catalog) and unhandled errors exit
  *    non-zero (`app.py:188-193`).
  *
  * `run` is the testable core: it takes the session and an output callback
  * and returns the exit code, so the E2E spec drives the full CLI without
  * forking a JVM or calling System.exit.
  */
object GraftApp {

  final case class Args(
      env: String,
      tableArg: String,
      tablesListPath: String = "tables_list",
      sourceOverride: Option[String] = None,
      sinkOverride: Option[String] = None,
      statePath: Option[String] = None,
      mode: SaveMode = SaveMode.Append,
      parallelism: Int = 4,
      tableTimeout: Duration = Duration.Inf,
      strict: Boolean = false)

  /** Valueless flags (presence = true). */
  private val boolFlags = Set("strict")

  def parseArgs(argv: Seq[String]): Args = {
    val (pos, flags) = {
      var positional = Vector.empty[String]
      var kv = Map.empty[String, String]
      var rest = argv.toList
      while (rest.nonEmpty) rest match {
        case flag :: t if flag.startsWith("--") && boolFlags(flag.stripPrefix("--")) =>
          kv += (flag.stripPrefix("--") -> "true"); rest = t
        case flag :: v :: t if flag.startsWith("--") =>
          kv += (flag.stripPrefix("--") -> v); rest = t
        case flag :: _ if flag.startsWith("--") =>
          throw new IllegalArgumentException(s"flag $flag needs a value")
        case p :: t => positional :+= p; rest = t
        case Nil    =>
      }
      (positional, kv)
    }
    if (pos.length != 2)
      throw new IllegalArgumentException(
        "usage: GraftApp <env> <table|t1,t2|all> [--tables-list-path P] " +
          "[--source fmt:loc] [--sink fmt:loc] [--state P] " +
          "[--mode append|overwrite] [--parallelism N] [--table-timeout-sec N] " +
          "[--strict]")
    val known = Set("tables-list-path", "source", "sink", "state",
      "mode", "parallelism", "table-timeout-sec") ++ boolFlags
    val unknown = flags.keySet -- known
    // A typo'd flag must be loud, not silently fall back to defaults.
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown flags: ${unknown.toSeq.sorted.map("--" + _).mkString(", ")}")
    Args(
      env = pos(0),
      tableArg = pos(1),
      tablesListPath = flags.getOrElse("tables-list-path", "tables_list"),
      sourceOverride = flags.get("source"),
      sinkOverride = flags.get("sink"),
      statePath = flags.get("state"),
      mode = flags.get("mode").map {
        case "append"    => SaveMode.Append
        case "overwrite" => SaveMode.Overwrite
        case other       => throw new IllegalArgumentException(s"unknown mode: $other")
      }.getOrElse(SaveMode.Append),
      parallelism = flags.get("parallelism").map(_.toInt).getOrElse(4),
      tableTimeout =
        flags.get("table-timeout-sec").map(_.toLong.seconds: Duration).getOrElse(Duration.Inf),
      strict = flags.contains("strict"))
  }

  /** Testable core; returns the process exit code. */
  def run(
      a: Args,
      spark: SparkSession,
      getenv: String => Option[String] = k => sys.env.get(k),
      out: String => Unit = println,
      log: String => Unit = s => System.err.println(s"[graft] $s")): Int = {

    // Connection resolution is PER SIDE: an explicit override wins and its
    // side's config (env vars, JDBC creds) is never consulted — overriding
    // only --sink must not demand GRAFT_SINK or TARGET_DB_* to exist.
    val source = a.sourceOverride
      .map(PipelineConfig.parseEndpoint).map { case (f, l) => Connectors.source(f, l) }
      .getOrElse(PipelineConfig.loadEndpoint(a.env, "SOURCE", getenv).asSource)
    val sink = a.sinkOverride
      .map(PipelineConfig.parseEndpoint).map { case (f, l) => Connectors.sink(f, l) }
      .getOrElse(PipelineConfig.loadEndpoint(a.env, "TARGET", getenv).asSink)

    val requested =
      if (a.tableArg.equalsIgnoreCase("all")) None
      else Some(a.tableArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val specs = Catalog.load(spark, a.tablesListPath, requested, warn = log)
    if (specs.isEmpty) {
      log(s"no tables found to process for '${a.tableArg}' in ${a.tablesListPath}")
      return 1
    }
    log(s"tables to process: ${specs.map(_.tableName).mkString(", ")}")

    val store = StateStore(a.statePath.getOrElse("graft_state.properties"))
    // Watermark injection: when the orchestrator supplies
    // LAST_WATERMARK_<TABLE>, that value IS this run's watermark — it
    // overrides stored state for the READ, exactly as in the reference
    // where the env var is consulted each run (app.py:100-117). The
    // override is RUN-SCOPED: it is never written to the durable store, so
    // a failed forced re-copy cannot permanently rewind state; only a
    // successful copy's post-commit watermark persists.
    val injected = (for {
      spec <- specs
      v <- getenv(s"LAST_WATERMARK_${spec.tableName.toUpperCase}")
      if v.trim.nonEmpty && !v.equalsIgnoreCase("none")
    } yield spec.tableName -> v.trim).toMap
    val state: WatermarkState =
      if (injected.isEmpty) store else new RunOverrides(store, injected)

    val report = Orchestrator.runAll(
      spark, specs, source, sink, state, a.mode, a.parallelism, a.tableTimeout)

    for ((t, r) <- report.succeeded.toSeq.sortBy(_._1)) {
      val status = if (r.skipped) "skipped (empty delta)" else s"${r.rowsCopied} rows"
      log(s"table $t: $status")
      r.newWatermark.foreach(w => out(s"NEW_WATERMARK_${t.toUpperCase}=${w.serialized}"))
    }
    for ((t, e) <- report.failed.toSeq.sortBy(_._1))
      log(s"table $t FAILED: ${e.getMessage}")

    // Per-table errors continue (app.py:175-177) and do not fail the run —
    // by default, for reference parity. `--strict` opts into a non-zero
    // exit when any table failed, so an orchestrator can distinguish
    // "everything copied" from "silently all-failed" without log scraping.
    if (a.strict && report.failed.nonEmpty) 1 else 0
  }

  def main(argv: Array[String]): Unit = {
    val code =
      try {
        val a = parseArgs(argv.toIndexedSeq)
        val spark = graft.GraftSession
          .builder(s"local[${graft.GraftSession.defaultCpus}]")
          .getOrCreate()
        try run(a, spark)
        finally spark.stop()
      } catch {
        case e: Throwable =>
          System.err.println(s"[graft] fatal: ${e.getMessage}")
          1
      }
    if (code != 0) sys.exit(code)
  }
}
