package graft.pipeline

/** Environment-keyed pipeline configuration — the Spark-native rebuild of the
  * reference's `config.py` + `load_db_details`
  * (`/root/reference/config.py:3-20`, `/root/reference/util.py:339-349`).
  *
  * The reference keeps a static dict keyed by environment name (`'dev'`),
  * each entry holding SOURCE_DB / TARGET_DB connection settings, with
  * credentials pulled from the process environment at load time
  * (`SOURCE_DB_USER`/`SOURCE_DB_PASS`/`TARGET_DB_USER`/`TARGET_DB_PASS`).
  * Same contract here, restated for format-dispatched Spark connectors:
  *
  *  - an unknown environment is an ERROR (`util.py:347-349` logs and returns
  *    None; we throw — a silent None would NPE later anyway),
  *  - endpoint locations come from `GRAFT_SOURCE`/`GRAFT_SINK` process-env
  *    entries of the form `format:location` (the file-based analogue of the
  *    reference's DB_HOST/DB_NAME fields),
  *  - JDBC credentials come from the SAME env var names the reference uses,
  *    and a JDBC endpoint with missing credentials fails at LOAD time — the
  *    reference stores `None` and fails much later at connect time.
  *
  * `getenv` is injectable so specs can cover the missing-env/missing-cred
  * paths without mutating the process environment.
  */
final case class EndpointConfig(
    format: String,
    location: String,
    props: Map[String, String]) {

  def asSource: Source = format match {
    case "jdbc" => Connectors.JdbcSource(location, props)
    case f      => Connectors.source(f, location)
  }

  def asSink: Sink = format match {
    case "jdbc" => Connectors.JdbcSink(location, props)
    case f      => Connectors.sink(f, location)
  }
}

final case class PipelineConfig(source: EndpointConfig, target: EndpointConfig)

object PipelineConfig {

  val KnownEnvs: Set[String] = Set("dev", "prod")

  /** Parse `format:location`. A string starting with `jdbc:` is taken whole
    * as a JDBC url (JDBC urls begin with `jdbc:` themselves, so the prefix
    * IS the format tag). */
  def parseEndpoint(s: String): (String, String) =
    if (s.startsWith("jdbc:")) ("jdbc", s)
    else s.split(":", 2) match {
      case Array(f, loc) if loc.nonEmpty => (f.toLowerCase, loc)
      case _ =>
        throw new IllegalArgumentException(
          s"endpoint '$s' is not format:location (e.g. parquet:/data/in, jdbc:derby:memory:db)")
    }

  def load(
      env: String,
      getenv: String => Option[String] = k => sys.env.get(k)): PipelineConfig =
    PipelineConfig(
      source = loadEndpoint(env, "SOURCE", getenv),
      target = loadEndpoint(env, "TARGET", getenv))

  /** Resolve ONE side's endpoint. Per-side resolution matters for the CLI:
    * an explicitly overridden side must not force the other side's env vars
    * (or JDBC creds) to exist. `role` is `"SOURCE"` or `"TARGET"` (the
    * reference's cred-var prefixes, config.py:8-9,15-16). */
  def loadEndpoint(
      env: String,
      role: String,
      getenv: String => Option[String] = k => sys.env.get(k)): EndpointConfig = {

    if (!KnownEnvs.contains(env.toLowerCase))
      throw new IllegalArgumentException(
        s"environment '$env' not found in configuration (known: ${KnownEnvs.toSeq.sorted.mkString(", ")})")
    val locVar = role match {
      case "SOURCE" => "GRAFT_SOURCE"
      case "TARGET" => "GRAFT_SINK"
      case other    => throw new IllegalArgumentException(s"unknown endpoint role: $other")
    }
    val raw = getenv(locVar).getOrElse(
      throw new IllegalArgumentException(
        s"environment '$env' needs $locVar (format:location) in the process environment"))
    val (fmt, loc) = parseEndpoint(raw)
    val props =
      if (fmt != "jdbc") Map.empty[String, String]
      else {
        // Missing creds on a JDBC endpoint fail HERE, not at first connect.
        val user = getenv(s"${role}_DB_USER")
        val pass = getenv(s"${role}_DB_PASS")
        if (user.isEmpty || pass.isEmpty)
          throw new IllegalArgumentException(
            s"JDBC $role endpoint needs ${role}_DB_USER and ${role}_DB_PASS in the process environment")
        Map("user" -> user.get, "password" -> pass.get)
      }
    EndpointConfig(fmt, loc, props)
  }
}
