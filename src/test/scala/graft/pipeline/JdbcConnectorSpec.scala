package graft.pipeline

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC source/sink (SURVEY §2.3 E4/E6) against embedded Derby — the same
  * `spark.read/write.format("jdbc")` path a MySQL/Postgres deployment
  * uses, including the reference-parity `batchsize=1000`
  * (`/root/reference/util.py:226`) and the partitioned parallel scan that
  * replaces the reference's single-cursor fetch (`util.py:167,170`). */
class JdbcConnectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def url = {
    val dir = Files.createTempDirectory("graft_derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("JDBC sink writes and source reads back (E4+E6)") {
    val u = url
    val df = (1L to 500L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "val")
    Connectors.JdbcSink(u).write(df, "t_roundtrip", SaveMode.Overwrite)
    val back = Connectors.JdbcSource(u).read(spark, "t_roundtrip")
    assert(back.count() == 500L)
    assert(back.agg(sum($"id")).as[Long].head() == (1L to 500L).sum)
  }

  test("partitioned JDBC scan fans out over numPartitions (fixes util.py single cursor)") {
    val u = url
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "grp")
    Connectors.JdbcSink(u).write(df, "t_part", SaveMode.Overwrite)
    val src = Connectors.JdbcSource(u, partitionColumn = Some("id"), numPartitions = 4)
    val back = src.read(spark, "t_part")
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000L)
  }

  test("watermark `>` predicate is pushed into the JDBC scan (R2 at the source)") {
    val u = url
    val df = (1L to 100L).map(i => (i, s"r$i")).toDF("id", "payload")
    Connectors.JdbcSink(u).write(df, "t_push", SaveMode.Overwrite)
    // The same shape CopyJob builds for an Id watermark: full.filter(col > v).
    val scan = Connectors.JdbcSource(u).read(spark, "t_push").filter(col("id") > 50L)
    val plan = scan.queryExecution.executedPlan.toString
    // The predicate must reach the JDBC relation (become SQL in the remote
    // query), not run as a post-scan Spark filter over a full fetch.
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,50)"), plan)
    assert(scan.count() == 50L)
  }

  test("CopyJob runs parquet -> JDBC with incremental watermark") {
    val u = url
    val src = Files.createTempDirectory("graft_jdbc_src")
    val state = StateStore(s"$src/state.properties")
    (1L to 100L).map(i => (i, s"r$i")).toDF("id", "payload")
      .write.mode(SaveMode.Overwrite).parquet(s"$src/t")
    val spec = TableSpec("t", toBeLoaded = true, Some("id"), Some(WatermarkType.Id))

    val r1 = CopyJob.run(spark, spec,
      Connectors.ParquetSource(src.toString), Connectors.JdbcSink(u), state,
      mode = SaveMode.Append)
    assert(r1.rowsCopied == 100L)
    assert(state.get("t").contains("100"))

    (1L to 120L).map(i => (i, s"r$i")).toDF("id", "payload")
      .write.mode(SaveMode.Overwrite).parquet(s"$src/t")
    val r2 = CopyJob.run(spark, spec,
      Connectors.ParquetSource(src.toString), Connectors.JdbcSink(u), state,
      mode = SaveMode.Append)
    assert(r2.rowsCopied == 20L)

    val target = Connectors.JdbcSource(u).read(spark, "t")
    assert(target.count() == 120L)
    assert(target.select(countDistinct($"id")).as[Long].head() == 120L)
  }
}
