package graft.pipeline

import graft.TestSpark
import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end copy-pipeline behavior: full load, incremental delta,
  * empty-delta skip, watermark advancement, bounded-parallel orchestration
  * with fault isolation — the incremental scenario mirrors the reference's
  * manual test script (`/root/reference/README.md:209-268`). */
class CopyJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): Path = Files.createTempDirectory("graft_copy")

  /** Seed a parquet "source database" with an orders-like table. */
  private def seedSource(dir: Path, upToId: Long): Unit =
    ordersLike(1L to upToId).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/orders_like")

  private def ordersLike(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, java.sql.Timestamp.valueOf(f"2024-01-${(i % 27) + 1}%02d 00:00:00")))
      .toDF("order_id", "order_date")

  private val spec = TableSpec("orders_like", toBeLoaded = true,
    Some("order_id"), Some(WatermarkType.Id))

  test("full load then incremental loads only the delta and advances state") {
    val src = tmp(); val dst = tmp()
    val state = StateStore(s"$dst/state.properties")
    seedSource(src, 100L)
    val source = Connectors.ParquetSource(src.toString)
    val sink = Connectors.ParquetSink(dst.toString)

    // 1. initial full load (no state → full-load branch)
    val r1 = CopyJob.run(spark, spec, source, sink, state)
    assert(r1.rowsCopied == 100L && !r1.skipped)
    assert(state.get("orders_like").contains("100"))

    // 2. append a delta upstream (rows 101..120), re-run incrementally
    seedSource(src, 120L)
    val r2 = CopyJob.run(spark, spec, source, sink, state)
    assert(r2.rowsCopied == 20L)
    assert(state.get("orders_like").contains("120"))

    // target holds exactly one copy of every row (full + delta, no overlap)
    val loaded = spark.read.parquet(s"$dst/orders_like")
    assert(loaded.count() == 120L)
    assert(loaded.select(countDistinct(col("order_id"))).as[Long].head() == 120L)

    // 3. no new data → empty-delta skip, watermark unchanged (app.py:147-153)
    val r3 = CopyJob.run(spark, spec, source, sink, state)
    assert(r3.skipped && r3.rowsCopied == 0L)
    assert(state.get("orders_like").contains("120"))
    assert(spark.read.parquet(s"$dst/orders_like").count() == 120L)
  }

  test("timestamp watermark uses strictly-greater semantics (util.py:156)") {
    val src = tmp(); val dst = tmp()
    val state = StateStore(s"$dst/state.properties")
    seedSource(src, 54L) // dates cycle 2024-01-01..27
    val tsSpec = TableSpec("orders_like", toBeLoaded = true,
      Some("order_date"), Some(WatermarkType.Timestamp))
    val r1 = CopyJob.run(spark, tsSpec,
      Connectors.ParquetSource(src.toString), Connectors.ParquetSink(dst.toString), state)
    assert(r1.rowsCopied == 54L)
    val wm = state.get("orders_like").get
    assert(wm.startsWith("2024-01-27")) // max(order_date) over the copied data

    // re-run: rows AT the watermark are not re-copied (strict >)
    val r2 = CopyJob.run(spark, tsSpec,
      Connectors.ParquetSource(src.toString), Connectors.ParquetSink(dst.toString), state)
    assert(r2.skipped)
  }

  test("full-load spec (no watermark) recopies everything and keeps no state") {
    val src = tmp(); val dst = tmp()
    val state = StateStore(s"$dst/state.properties")
    seedSource(src, 10L)
    val fullSpec = TableSpec("orders_like", toBeLoaded = true, None, None)
    val source = Connectors.ParquetSource(src.toString)
    val sink = Connectors.ParquetSink(dst.toString)
    CopyJob.run(spark, fullSpec, source, sink, state)
    CopyJob.run(spark, fullSpec, source, sink, state)
    assert(spark.read.parquet(s"$dst/orders_like").count() == 20L) // append x2
    assert(state.get("orders_like").isEmpty)
  }

  test("property: full load == initial + incremental for arbitrary split points") {
    // Watermark algebra (SURVEY §5 item 3): for any split s, copying [1,s]
    // then incrementally copying the rest equals one full copy.
    for (split <- Seq(1L, 7L, 50L, 99L, 100L)) {
      val src = tmp(); val dst = tmp()
      val state = StateStore(s"$dst/state.properties")
      seedSource(src, split)
      val source = Connectors.ParquetSource(src.toString)
      val sink = Connectors.ParquetSink(dst.toString)
      CopyJob.run(spark, spec, source, sink, state)
      seedSource(src, 100L)
      CopyJob.run(spark, spec, source, sink, state)
      val got = spark.read.parquet(s"$dst/orders_like")
        .select(col("order_id")).as[Long].collect().sorted
      assert(got.toSeq == (1L to 100L), s"split=$split")
    }
  }

  test("idempotent sink: crash-replayed delta overwrites its batch, no duplicates") {
    val src = tmp(); val dst = tmp()
    val state = StateStore(s"$dst/state.properties")
    val source = Connectors.ParquetSource(src.toString)
    val sink = Connectors.IdempotentParquetSink(dst.toString)

    seedSource(src, 100L)
    CopyJob.run(spark, spec, source, sink, state)
    seedSource(src, 120L)
    CopyJob.run(spark, spec, source, sink, state)
    assert(state.get("orders_like").contains("120"))
    assert(spark.read.parquet(s"$dst/orders_like").count() == 120L)

    // Crash simulation: the delta committed but the state write was lost —
    // roll the watermark back and re-run. An append sink would now hold
    // rows 101..120 twice; the idempotent sink must overwrite the replayed
    // batch (same origin-watermark token) instead.
    state.put("orders_like", "100")
    CopyJob.run(spark, spec, source, sink, state)
    val target = spark.read.parquet(s"$dst/orders_like")
    assert(target.count() == 120L, "replayed delta duplicated rows")
    assert(target.select(countDistinct(col("order_id"))).as[Long].head() == 120L)
    assert(state.get("orders_like").contains("120"))

    // The batch lineage column records which watermark each batch came from.
    val tokens = target.select(col("_graft_batch")).distinct()
      .as[String].collect().toSet
    assert(tokens == Set("full", "100"))
  }

  test("timestamp watermark batch tokens are path-safe and collision-free") {
    // Timestamp serializations carry spaces and colons; the token encoding
    // must stay injective (distinct watermarks → distinct partitions — a
    // lossy sanitizer could let a later batch overwrite an earlier one)
    // while emitting only path-safe characters.
    val src = tmp(); val dst = tmp()
    val state = StateStore(s"$dst/state.properties")
    val tsSpec = TableSpec("orders_like", toBeLoaded = true,
      Some("order_date"), Some(WatermarkType.Timestamp))
    def seed(upTo: Long): Unit =
      (1L to upTo).map(i => (i, new java.sql.Timestamp(1704067200000L + i * 1000)))
        .toDF("order_id", "order_date")
        .write.mode(SaveMode.Overwrite).parquet(s"$src/orders_like")
    val source = Connectors.ParquetSource(src.toString)
    val sink = Connectors.IdempotentParquetSink(dst.toString)

    seed(20L)
    CopyJob.run(spark, tsSpec, source, sink, state) // full
    seed(40L)
    CopyJob.run(spark, tsSpec, source, sink, state) // delta from wm t=20s
    seed(41L)
    CopyJob.run(spark, tsSpec, source, sink, state) // delta from wm t=40s
    val target = spark.read.parquet(s"$dst/orders_like")
    assert(target.count() == 41L)
    assert(target.select(countDistinct(col("order_id"))).as[Long].head() == 41L)
    val tokens = target.select(col("_graft_batch")).distinct().as[String].collect().toSet
    assert(tokens.size == 3, s"tokens collided: $tokens")
    assert(tokens.contains("full"))
    // Only path-safe characters survive; the '_' escape marker never
    // appears bare (it always leads a 4-hex-digit code).
    assert(tokens.forall(_.matches("([A-Za-z0-9.-]|_[0-9A-F]{4})+|full")), tokens)
  }

  test("orchestrator: bounded parallel run isolates per-table failure (app.py:175-177)") {
    val src = tmp(); val dst = tmp()
    val state = StateStore(s"$dst/state.properties")
    seedSource(src, 25L)
    val good = spec
    val bad = TableSpec("missing_table", toBeLoaded = true, None, None)
    val report = Orchestrator.runAll(spark, Seq(good, bad),
      Connectors.ParquetSource(src.toString), Connectors.ParquetSink(dst.toString),
      state, parallelism = 4)
    assert(report.succeeded.keySet == Set("orders_like"))
    assert(report.succeeded("orders_like").rowsCopied == 25L)
    assert(report.failed.keySet == Set("missing_table"))
  }

  test("csv source/sink round-trip through the connector registry (R10)") {
    val src = tmp(); val dst = tmp()
    ordersLike(1L to 5L)
      .withColumn("order_date", col("order_date").cast("string"))
      .write.option("header", "true").mode(SaveMode.Overwrite).csv(s"$src/t.csv")
    val df = Connectors.source("csv", src.toString).read(spark, "t")
    assert(df.count() == 5L)
    Connectors.sink("csv", dst.toString).write(df, "t_out", SaveMode.Overwrite)
    assert(spark.read.option("header", "true").csv(s"$dst/t_out").count() == 5L)
  }
}
