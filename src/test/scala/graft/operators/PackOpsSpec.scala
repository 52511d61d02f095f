package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

class PackOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaGlobalWindow(n: Int) = {
    import graft.functions.TextFunctions.tokens
    Tables(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", size(tokens($"text")).cast("long").as("n_tok"))
      .withColumn("cum0",
        sum($"n_tok").over(Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, 0)) - $"n_tok")
      .select($"doc_id", $"n_tok",
        expr(s"cum0 div $n").as("pack_id"),
        (($"cum0" % n) + $"n_tok" > n).as("straddles"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
  }

  test("two-phase prefix sum equals the serial global-window packing") {
    val serial = viaGlobalWindow(512)
    val parallel = PackOps.packSequences(
        Tables(spark, TestSpark.sfDir, "documents"), "text", "doc_id", 512)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(parallel == serial)
  }

  test("result is independent of the range count (boundaries never leak)") {
    val docs = Tables(spark, TestSpark.sfDir, "documents")
    def run(nR: Int) = PackOps.packSequences(docs, "text", "doc_id", 128, nRanges = nR)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(run(3) == run(7))
  }

  test("never plans a global (partition-less) window") {
    val plan = PackOps.packSequences(
        Tables(spark, TestSpark.sfDir, "documents"), "text", "doc_id", 512)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window found:\n$plan")
  }
}
