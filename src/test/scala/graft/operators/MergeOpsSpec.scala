package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dim(rows: (Long, Double)*) =
    rows.toSeq.toDF("k", "bal")
      .withColumn("valid_from", lit(java.sql.Date.valueOf("2026-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  test("upsert: update wins, unmatched target survives, new key inserts") {
    val target = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "bal")
    val updates = Seq((2L, 99.0), (4L, 40.0)).toDF("k", "bal")
    val got = MergeOps.upsert(target, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
  }

  test("scd2: changed key closes + reopens, no-op and absent keys untouched, new key opens") {
    val updates = Seq((1L, 11.0), (2L, 20.0), (4L, 40.0)).toDF("k", "bal")
    val got = MergeOps.scd2(
      dim((1L, 10.0), (2L, 20.0), (3L, 30.0)), updates, "k", Seq("bal"),
      lit(java.sql.Date.valueOf("2026-06-01")))
    val rows = got.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getDate(2).toString, Option(r.getDate(3)).map(_.toString), r.getBoolean(4))).toSet
    assert(rows == Set(
      (1L, 10.0, "2026-01-01", Some("2026-06-01"), false), // closed
      (1L, 11.0, "2026-06-01", None, true),                // reopened
      (2L, 20.0, "2026-01-01", None, true),                // no-op update
      (3L, 30.0, "2026-01-01", None, true),                // untouched
      (4L, 40.0, "2026-06-01", None, true)))               // brand-new
  }

  test("scd2 invariant: exactly one open row per key, even across two merges") {
    val first = MergeOps.scd2(
      dim((1L, 10.0), (2L, 20.0)),
      Seq((1L, 11.0)).toDF("k", "bal"), "k", Seq("bal"),
      lit(java.sql.Date.valueOf("2026-03-01")))
    val second = MergeOps.scd2(
      first,
      Seq((1L, 12.0), (2L, 21.0)).toDF("k", "bal"), "k", Seq("bal"),
      lit(java.sql.Date.valueOf("2026-06-01")))
    val openPerKey = second.filter($"is_current")
      .groupBy($"k").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(openPerKey == Map(1L -> 1L, 2L -> 1L))
    // Key 1's history chain: two closed versions abutting the open one.
    val chain = second.filter($"k" === 1L)
      .orderBy($"valid_from")
      .collect().map(r => (r.getDouble(1), Option(r.getDate(3)).map(_.toString)))
    assert(chain.toSeq == Seq(
      (10.0, Some("2026-03-01")), (11.0, Some("2026-06-01")), (12.0, None)))
  }

  test("scd2 refuses updates that carry bookkeeping columns") {
    val bad = dim((1L, 10.0))
    intercept[IllegalArgumentException] {
      MergeOps.scd2(dim((1L, 10.0)), bad, "k", Seq("bal"), lit("2026-06-01").cast("date"))
    }
  }
}
