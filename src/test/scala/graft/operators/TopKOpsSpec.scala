package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

class TopKOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("grouped top-k equals the window row_number formulation") {
    val orders = Tables(spark, TestSpark.sfDir, "orders")
    val viaWindow = orders
      .withColumn("rank", row_number().over(
        Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")))
      .filter($"rank" <= 3)
      .select($"o_custkey", $"rank", $"o_orderkey", $"o_totalprice")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val viaAgg = TopKOps.groupedTopK(
        orders, "o_custkey", "o_totalprice", "o_orderkey", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    assert(viaAgg == viaWindow)
  }

  test("value ties rank by ascending id (layout-independent determinism)") {
    val df = Seq(
      (1L, 10.0, 5L), (1L, 10.0, 2L), (1L, 10.0, 9L), (1L, 3.0, 1L))
      .toDF("g", "v", "id")
    val got = TopKOps.groupedTopK(df, "g", "v", "id", k = 3)
      .orderBy($"rank")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 2L), (2, 5L), (3, 9L)))
  }

  test("string tie-break is UTF-8 byte order, not UTF-16 code units") {
    // U+FFFD (UTF-8: EF BF BD) vs U+1F600 emoji (UTF-8: F0 9F 98 80):
    // byte order ranks the replacement char FIRST; UTF-16 code units
    // (0xFFFD vs surrogate 0xD83D) would rank it LAST. Spark's
    // UTF8String and DuckDB's binary collation both use byte order —
    // the aggregator must agree on real (emoji-bearing) corpus text.
    val replacement = "\uFFFD"
    val emoji = new String(Character.toChars(0x1F600))
    val agg = TopKOps.TopKStrAgg(1)
    val picked = agg.finish(Seq(emoji, replacement).foldLeft(agg.zero)(
      (b, t) => agg.reduce(b, TopKOps.ScoredStr(1.0, t)))).items.head.id
    assert(picked == replacement, "UTF-8 byte order must win the tie")
    assert(TopKOps.utf8Less(replacement, emoji) && !TopKOps.utf8Less(emoji, replacement))
  }

  test("plans as partial aggregation before one exchange — never a window sort") {
    // The fixture parquet is one split (where the exchange is elided);
    // repartition first so the multi-partition (cluster) shape is what's
    // asserted. Exchanges appear at EnsureRequirements time, so assert on
    // the executed plan: exactly one hash exchange, with the PARTIAL
    // aggregate printed below it — the shuffle carries ≤k-entry buffers
    // per group, not rows — and no window anywhere.
    val text = TopKOps.groupedTopK(
        Tables(spark, TestSpark.sfDir, "orders").repartition(4),
        "o_custkey", "o_totalprice", "o_orderkey", k = 3)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(text).size == 1, text)
    val exIdx = text.indexOf("Exchange hashpartitioning")
    val partialIdx = text.indexOf("partial_topkagg")
    assert(partialIdx > exIdx, s"partial aggregate not below the exchange:\n$text")
    assert(!text.contains("Window"), s"top-k must not plan a window:\n$text")
  }
}
