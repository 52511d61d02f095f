package graft.pipeline

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration.DurationInt

/** Orchestrator hardening: a hung table must not hang the run (bounded
  * per-table await), and concurrent watermark commits must not lose updates
  * (StateStore.put is a critical section). */
class OrchestratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-table timeout: one hung source fails that table, not the run") {
    val src = Files.createTempDirectory("orch_src")
    val dst = Files.createTempDirectory("orch_dst")
    (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode(SaveMode.Overwrite).parquet(s"$src/fast")

    val parquet = Connectors.ParquetSource(src.toString)
    val zombieCommitted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hangingSource = new Source {
      def read(spark: SparkSession, table: String): DataFrame =
        if (table == "hung") {
          Thread.sleep(4 * 1000) // interrupted by the timeout kill at ~2s
          zombieCommitted.set(true)
          parquet.read(spark, "fast")
        } else parquet.read(spark, table)
    }
    val specs = Seq(
      TableSpec("fast", toBeLoaded = true, None, None),
      TableSpec("hung", toBeLoaded = true, None, None))
    val state = StateStore(s"$dst/state.properties")

    val t0 = System.nanoTime()
    val report = Orchestrator.runAll(spark, specs, hangingSource,
      Connectors.ParquetSink(dst.toString), state,
      parallelism = 4, tableTimeout = 2.seconds)
    val elapsedSec = (System.nanoTime() - t0) / 1e9

    assert(report.succeeded.keySet == Set("fast"))
    assert(report.failed.keySet == Set("hung"))
    assert(report.failed("hung").isInstanceOf[java.util.concurrent.TimeoutException])
    assert(elapsedSec < 30, s"run blocked for ${elapsedSec}s — timeout not applied")

    // The timed-out job must be KILLED, not abandoned: give the would-be
    // zombie time past its sleep and assert it never proceeded to read or
    // write (an abandoned thread would wake at 4 s and commit the table,
    // racing any external retry).
    Thread.sleep(3 * 1000)
    assert(!zombieCommitted.get(), "timed-out table kept running and committed")
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(s"$dst/hung")))
    assert(state.get("hung").isEmpty)
  }

  test("concurrent StateStore.put never loses an update") {
    val state = StateStore(
      Files.createTempDirectory("orch_state").resolve("state.properties").toString)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // 32 tables commit watermarks concurrently — the unsynchronized
    // read-modify-write this guards against dropped ~half of them.
    val fs = (1 to 32).map(i => Future(state.put(s"table_$i", i.toString)))
    Await.result(Future.sequence(fs), Duration.Inf)
    val m = state.asMap
    assert(m.size == 32, s"lost updates: ${(1 to 32).map(i => s"table_$i").filterNot(m.contains)}")
    assert((1 to 32).forall(i => m(s"table_$i") == i.toString))
  }

  test("partitioned sink writes hive layout; readers prune partitions") {
    val dst = Files.createTempDirectory("part_dst")
    val df = (1 to 1000).map(i => (i.toLong, 1992 + i % 5, s"p$i")).toDF("id", "y", "payload")
    Connectors.PartitionedParquetSink(dst.toString, Seq("y"))
      .write(df, "orders_p", SaveMode.Overwrite)

    // Hive layout on disk: one directory per partition value.
    val dirs = java.nio.file.Files.list(dst.resolve("orders_p")).iterator()
    val partDirs = Iterator.continually(dirs).takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(_.startsWith("y=")).toSet
    assert(partDirs == (1992 to 1996).map(y => s"y=$y").toSet)

    // A filter on the partition column must become a PartitionFilter (prunes
    // directories before file listing), NOT a row-level data filter.
    val pruned = spark.read.parquet(s"$dst/orders_p").filter($"y" === 1994)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(y#"), plan)
    assert(pruned.count() == 200L)
  }

  test("connector registry covers every declared format, including the idempotent sink") {
    for (f <- Seq("parquet", "csv", "json", "text", "binary", "orc"))
      assert(Connectors.source(f, "/tmp/x") != null, f)
    assert(Connectors.sink("parquet-idempotent", "/tmp/x")
      .isInstanceOf[Connectors.IdempotentParquetSink])
    intercept[IllegalArgumentException](Connectors.source("xml", "/tmp/x"))
    intercept[IllegalArgumentException](Connectors.sink("xml", "/tmp/x"))
  }

  test("orc round-trips through the registry with pushdown-capable scans") {
    val root = java.nio.file.Files.createTempDirectory("orc_rt")
    val df = (1L to 200L).map(i => (i, s"name$i", i % 7)).toDF("id", "name", "grp")
    Connectors.sink("orc", root.toString).write(df, "t", SaveMode.Overwrite)
    val back = Connectors.source("orc", root.toString).read(spark, "t")
    assert(back.count() == 200L)
    assert(back.columns.toSeq == Seq("id", "name", "grp"))
    // The native vectorized ORC scan takes filters, like parquet.
    val plan = back.filter($"id" > 100L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,100)]"),
      s"orc scan must push the predicate:\n$plan")
  }

  test("text source reads line-per-row; binary source feeds the multimodal decode") {
    val src = Files.createTempDirectory("orch_raw_src")
    Files.writeString(src.resolve("corpus.txt"), "first line\nsecond line\nthird line\n")
    val lines = Connectors.source("text", src.toString).read(spark, "corpus")
    assert(lines.columns.toSeq == Seq("value"))
    assert(lines.as[String].collect().sorted.toSeq ==
      Seq("first line", "second line", "third line"))

    // binary source: one row per file, payload bytes executor-side — the
    // ingestion shape decodeMeta consumes.
    val mediaDir = src.resolve("media"); Files.createDirectory(mediaDir)
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "png", mediaDir.resolve("a.png").toFile)
    Files.write(mediaDir.resolve("b.bin"), Array[Byte](1, 2, 3))
    val media = Connectors.source("binary", src.toString).read(spark, "media")
    assert(media.count() == 2L)
    assert(media.columns.contains("content") && media.columns.contains("path"))
    import org.apache.spark.sql.functions.col
    val rows = graft.multimodal.Multimodal.decodeMeta(spark,
      media.select(
        // media_id from the file name's ordinal position is enough here
        org.apache.spark.sql.functions.length(col("path")).cast("long").as("media_id"),
        col("content").as("payload")))
      .collect().map(m => m.format -> ((m.width, m.height))).toMap
    assert(rows("png") == ((3, 2)))
    assert(rows.contains("stub"))
  }

  test("json source/sink round-trip through the connector registry (E3/E5)") {
    val src = Files.createTempDirectory("orch_json_src")
    val dst = Files.createTempDirectory("orch_json_dst")
    val df = (1 to 7).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "score")
    df.write.mode(SaveMode.Overwrite).json(s"$src/t.json")

    val read = Connectors.source("json", src.toString).read(spark, "t")
    assert(read.count() == 7L)
    Connectors.sink("json", dst.toString).write(read, "t_out", SaveMode.Overwrite)
    val back = spark.read.json(s"$dst/t_out")
    assert(back.count() == 7L)
    assert(back.columns.sorted.toSeq == Seq("id", "name", "score"))
  }
}
