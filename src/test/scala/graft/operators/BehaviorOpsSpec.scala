package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the funnel/cohort operators — ORDER sensitivity is
  * the thing a count-only oracle diff can't explain when it breaks. */
class BehaviorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def events(rows: (Long, Int, Long, String)*) =
    rows.map { case (u, t, id, ty) => (u, ts(t), id, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")

  private val Steps = Seq("view", "click", "purchase")

  test("funnel stage advances only on IN-ORDER matches") {
    val e = events(
      // user 1: full path in order -> stage 3
      (1L, 1, 1L, "view"), (1L, 2, 2L, "click"), (1L, 3, 3L, "purchase"),
      // user 2: click BEFORE its view -> the click can't count; stage 1
      (2L, 1, 4L, "click"), (2L, 2, 5L, "view"),
      // user 3: purchase without click -> stage 1 (view only)
      (3L, 1, 6L, "view"), (3L, 2, 7L, "purchase"),
      // user 4: noise only -> stage 0
      (4L, 1, 8L, "error"),
      // user 5: late restart still completes (view click view purchase)
      (5L, 1, 9L, "view"), (5L, 2, 10L, "click"),
      (5L, 3, 11L, "view"), (5L, 4, 12L, "purchase"))
    val stages = BehaviorOps.funnelStages(e, "user_id", "ts", "event_id",
      "event_type", Steps).as[(Long, Int)].collect().toMap
    assert(stages == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 3))
  }

  test("same-timestamp ties break on event_id, deterministically") {
    // view and click at the SAME ts: event_id order decides. Here the
    // click's id sorts first -> it precedes the view -> stage 1.
    val e = events((1L, 1, 2L, "view"), (1L, 1, 1L, "click"))
    val st = BehaviorOps.funnelStages(e, "user_id", "ts", "event_id",
      "event_type", Steps).as[(Long, Int)].collect().toMap
    assert(st == Map(1L -> 1))
    // Reversed ids -> view first -> click counts -> stage 2.
    val e2 = events((1L, 1, 1L, "view"), (1L, 1, 2L, "click"))
    val st2 = BehaviorOps.funnelStages(e2, "user_id", "ts", "event_id",
      "event_type", Steps).as[(Long, Int)].collect().toMap
    assert(st2 == Map(1L -> 2))
  }

  test("funnel report counts are prefix-monotone") {
    val e = events(
      (1L, 1, 1L, "view"), (1L, 2, 2L, "click"), (1L, 3, 3L, "purchase"),
      (2L, 1, 4L, "view"), (2L, 2, 5L, "click"),
      (3L, 1, 6L, "view"))
    val rep = BehaviorOps.funnel(e, "user_id", "ts", "event_id",
      "event_type", Steps)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(rep.toSeq == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("sequence bigrams stream in time order with one element of state") {
    val e = events(
      (1L, 1, 1L, "view"), (1L, 3, 3L, "purchase"), (1L, 2, 2L, "click"),
      (2L, 1, 4L, "view"),                      // <2 events -> no bigrams
      (3L, 1, 5L, "click"), (3L, 1, 6L, "view")) // same-ts tie: id order
    val bgs = BehaviorOps.sequenceBigrams(e, "user_id", "ts", "event_id",
      "event_type").as[(Long, String)].collect().sorted.toSeq
    assert(bgs == Seq((1L, "click>purchase"), (1L, "view>click"),
      (3L, "click>view")))
  }

  /** The round-10 shape held each user's whole sequence in ONE
    * collect_list array inside a hash aggregate — the only per-entity
    * unbounded state in the engine. The bounded replacement must show up
    * structurally: a streaming MapGroups over Spark's external
    * (spillable) group sort, and NO array-building aggregate anywhere in
    * the physical plan. This gate is what makes the power-user test
    * below meaningful — with it, a 10^8-event user costs spilled disk,
    * not executor heap. */
  test("per-user operators plan as streaming folds, not collect_list arrays") {
    val e = events((1L, 1, 1L, "view"))
    for (df <- Seq(
        BehaviorOps.funnelStages(e, "user_id", "ts", "event_id", "event_type", Steps),
        BehaviorOps.sequenceBigrams(e, "user_id", "ts", "event_id", "event_type"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("MapGroups"), s"expected streaming MapGroups in:\n$plan")
      assert(!plan.toLowerCase.contains("collect_list"),
        s"per-user array materialization crept back in:\n$plan")
    }
  }

  test("a power user orders of magnitude above the rest stays exact") {
    // 200k events for ONE user (the fixture's busiest user has ~40): under
    // the old collect_list shape this is a 200k-element in-memory array in
    // a single aggregate buffer (an OOM at the real-data power-user scale
    // this models); under the streaming fold it is one int / one string of
    // state over a spillable sort. Alternating types make every adjacent
    // pair distinct-checkable in closed form.
    val n = 200000
    val big = spark.range(n).selectExpr(
      "CAST(7 AS LONG) AS user_id",
      "timestamp_micros(1700000000000000 + id * 1000000) AS ts",
      "id AS event_id",
      "CASE WHEN id % 2 = 0 THEN 'view' ELSE 'click' END AS event_type")
    val bg = BehaviorOps.sequenceBigrams(big, "user_id", "ts", "event_id",
      "event_type")
      .groupBy($"bg").count().as[(String, Long)].collect().toMap
    assert(bg == Map("view>click" -> (n / 2).toLong,
      "click>view" -> (n / 2 - 1).toLong))
    val st = BehaviorOps.funnelStages(big, "user_id", "ts", "event_id",
      "event_type", Steps).as[(Long, Int)].collect().toMap
    assert(st == Map(7L -> 2)) // view then click, never a purchase
  }

  test("sessionize cuts strictly-greater-than-gap boundaries, per user") {
    // Gap 600 s. User 1: events at 0, 5, 15, 16 min -> gap 10 min is NOT
    // > 600 s (exactly equal), so one session... 0->5 (300 s), 5->15
    // (600 s, equal -> same session), 15->16. All one session.
    val e = events(
      (1L, 0, 1L, "view"), (1L, 5, 2L, "view"),
      (1L, 15, 3L, "view"), (1L, 16, 4L, "view"),
      // User 2: 0, then 11 min (660 s > 600) -> two sessions.
      (2L, 0, 5L, "view"), (2L, 11, 6L, "view"))
    val r = BehaviorOps.sessionize(e, "user_id", "ts", "event_id", 600L)
      .select($"user_id", $"session_n", $"n_events", $"duration_s")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r == Set(
      (1L, 1L, 4L, 16 * 60L),
      (2L, 1L, 1L, 0L), (2L, 2L, 1L, 0L)), r)
  }

  test("sessionize ordinals are time-ordered and ties break on event_id") {
    val e = events(
      (1L, 0, 2L, "b"), (1L, 0, 1L, "a"),     // same ts: one session
      (1L, 60, 3L, "c"))                       // 60 min later: new session
    val r = BehaviorOps.sessionize(e, "user_id", "ts", "event_id", 600L)
      .orderBy($"session_n")
      .select($"session_n", $"n_events").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L), (2L, 1L)), r)
    intercept[IllegalArgumentException](
      BehaviorOps.sessionize(e, "user_id", "ts", "event_id", 0L))
  }

  test("cohort retention: week 0 holds the whole cohort; later weeks only returners") {
    val week = 7 * 24 * 60
    val e = events(
      (1L, 0, 1L, "view"), (1L, week + 5, 2L, "view"),  // active weeks 0 and 1
      (2L, 1, 3L, "view"),                               // week 0 only
      (3L, week + 1, 4L, "view"))                        // later cohort, its own week 0
    val r = BehaviorOps.cohortRetention(e, "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect()
    val byOffset = r.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    // Every user appears at offset 0; only user 1 returns at offset 1.
    assert(byOffset(0) == 3L)
    assert(byOffset(1) == 1L)
    assert(r.map(_._2).forall(_ >= 0))
  }
}
