package graft.pipeline

import graft.TestSpark
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Catalog semantics parity with the reference's `get_tables`
  * (`/root/reference/util.py:352-400`) and watermark-type degradation
  * (`/root/reference/app.py:113-117`). */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeCatalog(lines: String*): String = {
    val f = Files.createTempFile("tables_list", ".csv")
    Files.writeString(f,
      ("table_name,to_be_loaded,watermark_column,watermark_type" +: lines).mkString("\n"))
    f.toString
  }

  // Mirrors the reference's tables_list (/root/reference/tables_list:2-7).
  private def referenceCatalog: String = writeCatalog(
    "customers,yes,customer_id,id",
    "departments,yes,,",
    "categories,yes,,",
    "products,yes,,",
    "orders,yes,order_date,timestamp",
    "order_items,yes,order_item_id,id")

  test("loads only to_be_loaded=yes rows with typed watermarks") {
    val specs = Catalog.load(spark, referenceCatalog)
    assert(specs.map(_.tableName) ==
      Seq("customers", "departments", "categories", "products", "orders", "order_items"))
    assert(specs.find(_.tableName == "customers").get.watermarkType.contains(WatermarkType.Id))
    assert(specs.find(_.tableName == "orders").get.watermarkType.contains(WatermarkType.Timestamp))
    assert(specs.find(_.tableName == "departments").get.watermarkColumn.isEmpty)
  }

  test("no-flag rows are excluded") {
    val path = writeCatalog("a,yes,,", "b,no,,", "c,maybe,,")
    assert(Catalog.load(spark, path).map(_.tableName) == Seq("a"))
  }

  test("requested-list filter keeps order and warns on misses") {
    var warned = Seq.empty[String]
    val specs = Catalog.load(spark, referenceCatalog,
      requested = Some(Seq("orders", "nope", "customers")),
      warn = w => warned :+= w)
    assert(specs.map(_.tableName).toSet == Set("orders", "customers"))
    assert(warned.exists(_.contains("nope")))
  }

  test("unknown watermark type degrades to full load (reference app.py:113-117)") {
    val path = writeCatalog("t,yes,c,bogus_type")
    val spec = Catalog.load(spark, path).head
    assert(spec.watermarkColumn.contains("c"))
    assert(spec.watermarkType.isEmpty) // → CopyJob takes the full-load branch
  }
}
