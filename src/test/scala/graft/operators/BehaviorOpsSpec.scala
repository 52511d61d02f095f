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
