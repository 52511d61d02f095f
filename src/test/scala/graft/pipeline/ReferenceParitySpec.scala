package graft.pipeline

import graft.TestSpark
import java.nio.file.{Files, Path}
import java.sql.Timestamp
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end replay of the reference's own verification scenario
  * (SURVEY §5 items 4-5): the retail_db-shaped tables driven by a copy of
  * the reference's `tables_list` catalog (`/root/reference/tables_list:2-7`),
  * orchestrated like the DAG (3 incremental chains + full-load tables,
  * bounded parallelism 4, `dags/...:89-110`), then the README's manual
  * incremental test (`/root/reference/README.md:209-268`): append 2
  * customers / 2 orders / 2 order_items upstream, re-run, assert only the
  * delta moves and each watermark advances per its type.
  */
class ReferenceParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2014-07-$day%02d 00:00:00")

  private def seed(src: Path, nCust: Int, nOrd: Int, nItems: Int): Unit = {
    (1 to nCust).map(i => (i, s"fname$i", s"lname$i", s"mail$i", "pw", s"street$i", "city", "ST", "00000"))
      .toDF("customer_id", "customer_fname", "customer_lname", "customer_email",
        "customer_password", "customer_street", "customer_city", "customer_state", "customer_zipcode")
      .write.mode(SaveMode.Overwrite).parquet(s"$src/customers")
    (1 to nOrd).map(i => (i, ts((i % 27) + 1), i % nCust + 1, "CLOSED"))
      .toDF("order_id", "order_date", "order_customer_id", "order_status")
      .write.mode(SaveMode.Overwrite).parquet(s"$src/orders")
    (1 to nItems).map(i => (i, i % nOrd + 1, i % 50 + 1, 2, 59.98, 29.99))
      .toDF("order_item_id", "order_item_order_id", "order_item_product_id",
        "order_item_quantity", "order_item_subtotal", "order_item_product_price")
      .write.mode(SaveMode.Overwrite).parquet(s"$src/order_items")
    for (t <- Seq("departments", "categories", "products"))
      (1 to 10).map(i => (i, s"${t}_$i")).toDF(s"${t.dropRight(1)}_id", "name")
        .write.mode(SaveMode.Overwrite).parquet(s"$src/$t")
  }

  test("catalog-driven full load then README-style incremental run") {
    val src = Files.createTempDirectory("retail_src")
    val dst = Files.createTempDirectory("retail_dst")
    val state = StateStore(s"$dst/state.properties")
    val catalogCsv = Files.createTempFile("tables_list", ".csv")
    // Verbatim shape of /root/reference/tables_list.
    Files.writeString(catalogCsv,
      """table_name,to_be_loaded,watermark_column,watermark_type
        |customers,yes,customer_id,id
        |departments,yes,,
        |categories,yes,,
        |products,yes,,
        |orders,yes,order_date,timestamp
        |order_items,yes,order_item_id,id""".stripMargin)

    seed(src, nCust = 40, nOrd = 60, nItems = 120)
    val specs = Catalog.load(spark, catalogCsv.toString)
    val source = Connectors.ParquetSource(src.toString)
    val sink = Connectors.ParquetSink(dst.toString)

    // Run 1: everything full-loads (no prior state), 4-way parallel (R13).
    val run1 = Orchestrator.runAll(spark, specs, source, sink, state, parallelism = 4)
    assert(run1.failed.isEmpty)
    assert(run1.succeeded("customers").rowsCopied == 40L)
    assert(run1.succeeded("orders").rowsCopied == 60L)
    assert(run1.succeeded("order_items").rowsCopied == 120L)
    assert(state.get("customers").contains("40"))
    assert(state.get("order_items").contains("120"))
    assert(state.get("orders").exists(_.startsWith("2014-07-27"))) // max order_date
    assert(state.get("departments").isEmpty) // full-load tables keep no state

    // README.md:209-268: insert 2 customers, 2 orders (NOW()-analogue:
    // later than every existing order_date), 2 order_items upstream.
    seed(src, nCust = 42, nOrd = 60, nItems = 122)
    Seq((1000, Timestamp.valueOf("2014-08-01 12:00:00"), 41, "CLOSED"),
        (1001, Timestamp.valueOf("2014-08-01 12:30:00"), 42, "PENDING"))
      .toDF("order_id", "order_date", "order_customer_id", "order_status")
      .write.mode(SaveMode.Append).parquet(s"$src/orders")

    val run2 = Orchestrator.runAll(spark, specs, source, sink, state, parallelism = 4)
    assert(run2.failed.isEmpty)
    // Only the delta moved (README.md:270-275 eyeball check, automated):
    assert(run2.succeeded("customers").rowsCopied == 2L)
    assert(run2.succeeded("orders").rowsCopied == 2L)
    assert(run2.succeeded("order_items").rowsCopied == 2L)
    // Full-load tables re-copied entirely (append mode, like the reference).
    assert(run2.succeeded("products").rowsCopied == 10L)
    // Watermarks advanced per type: id strictly greater, timestamp ISO.
    assert(state.get("customers").contains("42"))
    assert(state.get("order_items").contains("122"))
    assert(state.get("orders").exists(_.startsWith("2014-08-01 12:30")))

    // Target holds exactly one copy of every incremental row.
    val tgtOrders = spark.read.parquet(s"$dst/orders")
    assert(tgtOrders.count() == 62L)
    assert(tgtOrders.select(countDistinct($"order_id")).as[Long].head() == 62L)

    // Run 3: nothing new → every incremental table skips, state unchanged,
    // and the skipped tables' sink dirs gain NO files (no empty-part litter).
    import scala.jdk.CollectionConverters._
    def sinkFiles(t: String): Set[String] =
      Files.list(Path.of(s"$dst/$t")).iterator.asScala.map(_.getFileName.toString).toSet
    val incrementals = Seq("customers", "orders", "order_items")
    val filesBefore = incrementals.map(t => t -> sinkFiles(t)).toMap
    val before = state.asMap
    val run3 = Orchestrator.runAll(spark, specs, source, sink, state, parallelism = 4)
    assert(run3.succeeded("customers").skipped)
    assert(run3.succeeded("orders").skipped)
    assert(run3.succeeded("order_items").skipped)
    assert(state.asMap == before)
    assert(spark.read.parquet(s"$dst/orders").count() == 62L)
    for (t <- incrementals)
      assert(sinkFiles(t) == filesBefore(t), s"empty delta littered $t's sink dir")
  }
}
