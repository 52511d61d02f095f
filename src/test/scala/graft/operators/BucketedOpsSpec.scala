package graft.operators

import graft.{Tables, TestSpark}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed co-located join must (a) produce the same result as the
  * plain join and (b) read both sides pre-partitioned — NO shuffle exchange
  * in the physical plan. At 100 TB (b) is the entire point: the join cost
  * collapses from 2 full-table shuffles to zero. */
class BucketedOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same-bucketed join elides both exchanges and matches the plain join") {
    val wh = Files.createTempDirectory("bucketed_wh")
    val li = Tables(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    BucketedOps.writeBucketed(li, "li_b", Seq("l_orderkey"), 8, s"$wh/li_b")
    BucketedOps.writeBucketed(ord, "ord_b", Seq("l_orderkey"), 8, s"$wh/ord_b")
    try {
      // Force a sort-merge path so the exchange question is meaningful
      // (broadcast would trivially skip shuffles at this fixture size).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedOps.coLocatedJoin(spark, "li_b", "ord_b", Seq("l_orderkey"))
      val n = joined.count()

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      val plain = li.join(ord, Seq("l_orderkey")).count()
      assert(n == plain && n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
