package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom join is exact — identical to the plain join") {
    val orders = Tables(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val dim = Tables(spark, TestSpark.sfDir, "customer")
      .filter($"c_acctbal" > 9000).select($"c_custkey", $"c_acctbal")
    val plain = orders.join(dim, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val bloom = BloomOps.bloomJoin(orders, "o_custkey", dim, "c_custkey", 10000L)
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    assert(bloom == plain)
  }

  test("no false negatives, and the prefilter actually reduces the fact side") {
    val orders = Tables(spark, TestSpark.sfDir, "orders")
    val dim = Tables(spark, TestSpark.sfDir, "customer")
      .filter($"c_acctbal" > 9000).select($"c_custkey")
    val kept = BloomOps.bloomSemiFilter(orders, "o_custkey", dim, "c_custkey", 10000L)
    val matching = orders.join(dim, $"o_custkey" === $"c_custkey", "left_semi")
    // Every true match survives the prefilter...
    assert(matching.join(kept.select($"o_orderkey"), Seq("o_orderkey"), "left_anti")
      .count() == 0L)
    // ...and the prefiltered fact is much closer to the matches than to the
    // full table (fpp=1% ⇒ kept ≈ matches + 1% of the rest).
    val (total, keptN, matchN) = (orders.count(), kept.count(), matching.count())
    assert(keptN < matchN + (total - matchN) / 10,
      s"prefilter too weak: kept=$keptN match=$matchN total=$total")
  }

  test("native probe keeps the fact scan inside whole-stage codegen") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.execution.{FilterExec, WholeStageCodegenExec}
    // The round-4 probe was a Scala UDF — the filter evaluated row-by-row
    // through the interpreter and BROKE the scan's codegen span. The native
    // BloomFilterMightContain predicate must sit inside a
    // WholeStageCodegenExec subtree (same shape Spark's own
    // InjectRuntimeFilter produces).
    val orders = Tables(spark, TestSpark.sfDir, "orders")
    val dim = Tables(spark, TestSpark.sfDir, "customer")
      .filter($"c_acctbal" > 9000).select($"c_custkey")
    val kept = BloomOps.bloomSemiFilter(orders, "o_custkey", dim, "c_custkey", 10000L)
    kept.collect() // AQE finalizes codegen spans only after execution
    val exec = kept.queryExecution.executedPlan
    val probeInCodegen = exec.collect {
      case w: WholeStageCodegenExec => w.collect {
        case f: FilterExec if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
      }
    }.flatten
    assert(probeInCodegen.nonEmpty, s"bloom probe not codegen'd:\n$exec")
  }
}
