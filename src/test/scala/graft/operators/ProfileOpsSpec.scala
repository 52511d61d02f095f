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

  test("exactQuantiles: both dispatch paths bit-equal the builtin percentile") {
    // The q39 rewrite's whole contract: BOTH strategy paths must
    // reproduce Percentile.getPercentile to the BIT, or the size
    // dispatch (or replacing a builtin call site) moves an oracle hash.
    // Cases: the real fixture (many distinct doubles, duplicated ints),
    // plus an adversarial frame with single-row groups,
    // single-distinct-value groups, null values, a column null where
    // the other is not, negative and non-integral doubles, and boundary
    // quantiles {0, 1}.
    import org.apache.spark.sql.functions._
    val qsets = Seq(Seq(0.25, 0.5, 0.75), Seq(0.0, 0.9, 1.0), Seq(0.5))
    val li = Tables(spark, TestSpark.sfDir, "lineitem")
    import spark.implicits._
    val adversarial = Seq(
      ("a", Some(1.5), Some(1)), ("a", Some(-2.25), None), ("a", Some(1.5), Some(3)),
      ("a", None, Some(9)),
      ("b", Some(42.0), None),                           // single row; w all-null
      ("c", Some(7.0), Some(2)), ("c", Some(7.0), Some(2)), // single distinct value
      ("d", None, None),                                 // all-null group (absent)
      ("e", Some(0.1), Some(4)), ("e", Some(0.2), Some(5)),
      ("e", Some(0.3), Some(6)), ("e", Some(0.4), Some(7))
    ).toDF("g", "v", "w")
    def builtinRef(df: org.apache.spark.sql.DataFrame, g: String,
                   specs: Seq[(String, Seq[Double])]) = {
      val keep = specs.map { case (c, _) => col(c).cast("double").isNotNull }.reduce(_ || _)
      df.filter(keep).groupBy(col(g))
        .agg(
          percentile(col(specs.head._1).cast("double"),
            array(specs.head._2.map(lit(_)): _*)).as("_q0"),
          specs.tail.zipWithIndex.map { case ((c, qs), i) =>
            percentile(col(c).cast("double"), array(qs.map(lit(_)): _*)).as(s"_q${i + 1}")
          }: _*)
        .collect()
        .map(r => r.get(0).toString -> specs.indices.map(i =>
          if (r.isNullAt(i + 1)) null else r.getSeq[Double](i + 1).toList))
        .toMap
    }
    for (qs <- qsets) {
      val cases = Seq(
        (li, "l_returnflag",
          Seq("l_extendedprice" -> qs, "l_quantity" -> Seq(0.9))),
        (adversarial, "g", Seq("v" -> qs, "w" -> Seq(0.5))))
      for ((df, g, specs) <- cases; forced <- Seq("0", Long.MaxValue.toString)) {
        spark.conf.set(ProfileOps.DistributedQuantilesMinBytesKey, forced)
        try {
          val mine = ProfileOps.exactQuantiles(df, g, specs).collect()
            .map(r => r.get(0).toString -> specs.indices.map(i =>
              if (r.isNullAt(i + 1)) null else r.getSeq[Double](i + 1).toList))
            .toMap
          assert(mine == builtinRef(df, g, specs),
            s"qs=$qs on $g, distributedMinBytes=$forced")
        } finally spark.conf.unset(ProfileOps.DistributedQuantilesMinBytesKey)
      }
    }
    // All-null group: documented absence on both paths.
    for (forced <- Seq("0", Long.MaxValue.toString)) {
      spark.conf.set(ProfileOps.DistributedQuantilesMinBytesKey, forced)
      try {
        val out = ProfileOps.exactQuantiles(adversarial, "g", Seq("v" -> Seq(0.5)))
          .collect().map(_.getString(0)).toSet
        assert(out == Set("a", "b", "c", "e"), s"distributedMinBytes=$forced")
      } finally spark.conf.unset(ProfileOps.DistributedQuantilesMinBytesKey)
    }
  }

  test("exactQuantiles plan: dispatch picks the expected shape on each side") {
    // Below the threshold: ONE wide Percentile aggregation (the pre-r18
    // q39 shape, no Window). At/above: no Percentile anywhere; per value
    // column exactly 2 new exchanges (the (group, value) counts agg and
    // the cumulative window's group exchange) — the bracketing aggs and
    // the spec join must REUSE the group partitioning, so a 2-spec call
    // plans ≤ 2×2 exchanges over this already-partitioned input. More
    // means a reuse broke.
    import org.apache.spark.sql.functions._
    val li = Tables(spark, TestSpark.sfDir, "lineitem")
      .repartition(8)  // pin input partitioning noise out of the count
    val specs = Seq("l_extendedprice" -> Seq(0.25, 0.5, 0.75), "l_quantity" -> Seq(0.9))
    def planOf(forced: String) = {
      spark.conf.set(ProfileOps.DistributedQuantilesMinBytesKey, forced)
      try {
        val df = ProfileOps.exactQuantiles(li, "l_returnflag", specs)
        df.collect()
        df.queryExecution.executedPlan.toString
      } finally spark.conf.unset(ProfileOps.DistributedQuantilesMinBytesKey)
    }
    val small = planOf(Long.MaxValue.toString)
    assert(small.contains("percentile") && !small.contains("Window"))
    // The AQE plan string repeats the shape under "== Initial Plan ==" —
    // count only the executed (final) section.
    val big = planOf("0").split("== Initial Plan ==")(0)
    assert(!big.toLowerCase.contains("percentile("))
    val exchanges = big.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges <= 4, s"distributed exactQuantiles plans $exchanges exchanges:\n$big")
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
