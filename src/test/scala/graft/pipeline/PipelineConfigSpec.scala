package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Env-keyed config contract (R12, `config.py:3-20` + `util.py:339-349`):
  * known env resolves endpoints from the process environment, unknown env is
  * an error, JDBC endpoints demand credentials at LOAD time. */
class PipelineConfigSpec extends AnyFunSuite {

  private def env(kv: (String, String)*): String => Option[String] =
    kv.toMap.get _

  test("dev env resolves file endpoints from GRAFT_SOURCE/GRAFT_SINK") {
    val cfg = PipelineConfig.load("dev", env(
      "GRAFT_SOURCE" -> "parquet:/data/in",
      "GRAFT_SINK" -> "csv:/data/out"))
    assert(cfg.source == EndpointConfig("parquet", "/data/in", Map.empty))
    assert(cfg.target == EndpointConfig("csv", "/data/out", Map.empty))
    assert(cfg.source.asSource.isInstanceOf[Connectors.ParquetSource])
    assert(cfg.target.asSink.isInstanceOf[Connectors.CsvSink])
  }

  test("unknown environment is an error (util.py:347-349, made loud)") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.load("staging", env("GRAFT_SOURCE" -> "parquet:/x", "GRAFT_SINK" -> "parquet:/y"))
    }
    assert(e.getMessage.contains("staging"))
  }

  test("missing endpoint env var is an error naming the variable") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.load("dev", env("GRAFT_SOURCE" -> "parquet:/x"))
    }
    assert(e.getMessage.contains("GRAFT_SINK"))
  }

  test("JDBC endpoint without credentials fails at load time, not at connect") {
    val e = intercept[IllegalArgumentException] {
      PipelineConfig.load("dev", env(
        "GRAFT_SOURCE" -> "jdbc:derby:memory:cfgdb",
        "GRAFT_SINK" -> "parquet:/out"))
    }
    assert(e.getMessage.contains("SOURCE_DB_USER"))
  }

  test("JDBC endpoint picks up the reference's cred var names (config.py:8-9)") {
    val cfg = PipelineConfig.load("dev", env(
      "GRAFT_SOURCE" -> "jdbc:derby:memory:cfgdb",
      "SOURCE_DB_USER" -> "u", "SOURCE_DB_PASS" -> "p",
      "GRAFT_SINK" -> "parquet:/out"))
    assert(cfg.source.props == Map("user" -> "u", "password" -> "p"))
    assert(cfg.source.asSource.isInstanceOf[Connectors.JdbcSource])
  }

  test("parseEndpoint: jdbc urls are taken whole; malformed strings error") {
    assert(PipelineConfig.parseEndpoint("jdbc:derby:memory:db") == ("jdbc", "jdbc:derby:memory:db"))
    assert(PipelineConfig.parseEndpoint("parquet:/a/b") == ("parquet", "/a/b"))
    intercept[IllegalArgumentException](PipelineConfig.parseEndpoint("noformat"))
  }
}
