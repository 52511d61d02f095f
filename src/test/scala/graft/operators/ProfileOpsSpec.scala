package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class ProfileOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx profile matches exact on n/null/min/max, distinct within 10%, and skips Expand") {
    val li = Tables(spark, TestSpark.sfDir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    val exact = toMap(ProfileOps.profileNumeric(li, cols))
    val approxDf = ProfileOps.profileNumeric(li, cols, exact = false)
    val approx = toMap(approxDf)
    for (c <- cols) {
      val (en, enull, edist, emin, emax) = exact(c)
      val (an, anull, adist, amin, amax) = approx(c)
      assert((an, anull, amin, amax) == (en, enull, emin, emax))
      assert(math.abs(adist - edist).toDouble / edist < 0.10,
        s"$c: approx distinct $adist vs exact $edist")
    }
    // Multi-column exact distinct plans an Expand (input replicated per
    // column); the HLL path must not — that's its scale point.
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("hostile column names (quotes, backticks, dots, spaces) profile cleanly") {
    // A profiler exists to meet UNTRUSTED new sources; a column name must
    // never break out of an identifier or an expr() string. These four
    // names each killed the old stack()-string construction.
    import spark.implicits._
    val hostile = Seq((1.0, 2.0, 3.0, Some(4.0)), (5.0, 6.0, 7.0, None))
      .toDF("it's", "back`tick", "dot.ted", "with space")
    val names = Seq("it's", "back`tick", "dot.ted", "with space")
    for (exact <- Seq(true, false)) {
      val out = ProfileOps.profileNumeric(hostile, names, exact = exact).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out.keySet == names.toSet, s"exact=$exact: ${out.keySet}")
      assert(out("it's") == (2L, 0L))
      assert(out("with space") == (2L, 1L), "null in a hostile-named column miscounted")
    }
  }
}
