package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E93 group-relative quantile gate: the threshold comes from each group's
  * OWN distribution, ties at the threshold survive, and the plan applies
  * the |groups|-row threshold frame back as a broadcast join over ONE
  * shuffle (the grouped percentile) — never a per-group window sort. */
class GateOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    // group a: values 1..4 → median 2.5, survivors 3,4
    ("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L), ("a", 4.0, 4L),
    // group b: all-equal values → median 7, EVERY row ties and survives
    ("b", 7.0, 5L), ("b", 7.0, 6L), ("b", 7.0, 7L),
    // group c: odd count 10,20,30 → median 20, survivors 20,30
    ("c", 10.0, 8L), ("c", 20.0, 9L), ("c", 30.0, 10L))
    .toDF("g", "v", "id")

  test("each group gates on its own median; ties at the threshold survive") {
    val got = GateOps.groupQuantileGate(df, "g", "v", q = 0.5)
      .select($"id", $"gate_threshold")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(3L -> 2.5, 4L -> 2.5, 5L -> 7.0, 6L -> 7.0,
      7L -> 7.0, 9L -> 20.0, 10L -> 20.0))
  }

  test("at q=0.5 at least half of every group survives") {
    val in = df.groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = GateOps.groupQuantileGate(df, "g", "v", q = 0.5)
      .groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    in.foreach { case (g, n) =>
      assert(out.getOrElse(g, 0L) * 2 >= n, s"group $g lost more than half") }
  }

  test("the approx path thresholds on a GROUP ELEMENT, never an interpolation") {
    // percentile_approx (Greenwald-Khanna) returns an actual group member;
    // exact `percentile` interpolates. On odd-count and all-equal groups
    // the two coincide; on even-count group a the exact threshold is 2.5
    // (interpolated) while GK's is the element 2.0 — so the approx gate
    // additionally keeps the row AT that element. This is the designed
    // difference of the 100 TB-group-size path, pinned here so a silent
    // semantic change in either function shows up.
    val exact = GateOps.groupQuantileGate(df, "g", "v", q = 0.5)
      .select($"id").as[Long].collect().toSet
    val approx = GateOps.groupQuantileGate(df, "g", "v", q = 0.5,
        approxAccuracy = Some(10000))
      .select($"id").as[Long].collect().toSet
    assert(exact == Set(3L, 4L, 5L, 6L, 7L, 9L, 10L))
    assert(approx == exact + 2L)
  }

  test("plans as one shuffle + broadcast application — no window sort") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = GateOps.groupQuantileGate(df, "g", "v", q = 0.5)
        .queryExecution.executedPlan
      assert(plan.toString.contains("BroadcastHashJoin"),
        "threshold frame must apply back as a broadcast join")
      assert(!plan.toString.contains("Window"),
        "a per-group window sort would shuffle and sort the full rows")
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      assert(shuffles <= 1, s"expected ≤1 shuffle (grouped percentile), got $shuffles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("invalid quantile and accuracy refuse loudly") {
    intercept[IllegalArgumentException](
      GateOps.groupQuantileGate(df, "g", "v", q = 0.0))
    intercept[IllegalArgumentException](
      GateOps.groupQuantileGate(df, "g", "v", q = 1.0))
    intercept[IllegalArgumentException](
      GateOps.groupQuantileGate(df, "g", "v", q = 0.5, approxAccuracy = Some(0)))
  }

  test("percentileNormalize matches percent_rank semantics, ties and all") {
    val rows = Seq(
      // group a: 1,2,2,4 — percent_rank 0, 1/3, 1/3, 1
      ("a", 1L, 10L), ("a", 2L, 11L), ("a", 2L, 12L), ("a", 4L, 13L),
      // group b: all equal — every row 0
      ("b", 5L, 20L), ("b", 5L, 21L), ("b", 5L, 22L),
      // group c: single row — defined as 0, never 0/0
      ("c", 9L, 30L))
      .toDF("g", "v", "id")
    val got = GateOps.percentileNormalize(rows, "g", "v")
      .select($"id", $"pct_rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(
      10L -> 0.0, 11L -> 0.333333, 12L -> 0.333333, 13L -> 1.0,
      20L -> 0.0, 21L -> 0.0, 22L -> 0.0,
      30L -> 0.0))
    // Null scores keep their rows (the SQL semantics: nulls sort first,
    // rank 0) — an equi-join formulation would silently drop them.
    val withNull = Seq(("a", Some(5L), 40L), ("a", None, 41L), ("a", Some(7L), 42L))
      .toDF("g", "v", "id")
    val gotNull = GateOps.percentileNormalize(withNull, "g", "v")
      .select($"id", $"pct_rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotNull == Map(41L -> 0.0, 40L -> 0.5, 42L -> 1.0),
      s"null-valued rows must survive with rank 0: $gotNull")

    // Agreement with the engine's own percent_rank window (the semantics
    // source of truth), on data where rounding can't mask a mismatch.
    val viaWindow = rows.withColumn("pr", round(percent_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v")), 6))
      .select($"id", $"pr")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == viaWindow)
  }

  test("percentileNormalize never plans a row-sized window: counts frame + broadcast back") {
    // AQE's plan wrapper hides children from collect — read the static
    // plan (same discipline as the shuffle gate above).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      val rows = (1L to 400L).map(i => (s"s${i % 4}", i % 37, i)).toDF("g", "v", "id")
      GateOps.percentileNormalize(rows, "g", "v").queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // The window is allowed — but only OVER THE COUNTS AGGREGATION
    // (distinct-value-sized), never directly over the input rows: every
    // WindowExec in the plan must have an aggregate below it.
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected the cumulative sum over the counts frame")
    windows.foreach { w =>
      val hasAggBelow = w.find {
        case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
        case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
        case _ => false
      }.isDefined
      assert(hasAggBelow,
        s"WindowExec without an aggregation below it — a row-sized window:\n$w")
    }
    assert(plan.toString.contains("BroadcastHashJoin"),
      "the ranks frame must apply back as a broadcast join")
  }

  test("percentileNormalize enforces its value-domain contract with a loud gauge") {
    // Raw unrounded doubles: every row a distinct value — exactly the
    // misuse the scaladoc used to merely describe. With the bound set
    // below the distinct count, the gauge must refuse loudly.
    val raw = (1 to 64).map(i => ("s", math.log(i.toDouble + 0.1), i.toLong))
      .toDF("g", "v", "id")
    val e = intercept[Exception](
      GateOps.percentileNormalize(raw, "g", "v", maxDistinctValues = 16).collect())
    assert(e.getMessage != null && e.getMessage.contains("distinct"),
      s"expected the distinct-value gauge, got: ${e.getMessage}")
    // At or under the bound: same answer as the default path.
    val ok = GateOps.percentileNormalize(raw, "g", "v", maxDistinctValues = 64)
      .select($"id", $"pct_rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ok.size == 64 && ok(1L) == 0.0 && ok(64L) == 1.0)
    intercept[IllegalArgumentException](
      GateOps.percentileNormalize(raw, "g", "v", maxDistinctValues = 0))
  }
}
