package graft.operators

import graft.TestSpark
import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the behavioral operators and the top-k
  * aggregator against independent Scala reference implementations —
  * the fixture/oracle specs prove engine parity on real data; these
  * prove the OPERATOR SEMANTICS on adversarial inputs (tie pile-ups,
  * single-event users, boundary-exact gaps, arbitrary partition
  * splits) that fixtures rarely contain. */
class BehaviorPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(name: String, p: Prop, cases: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // ---- TopKStrAgg: pure aggregator laws, no Spark round-trip ----

  // Values/ids from SMALL pools so ties (the tricky case) are common.
  private val scored: Gen[(Double, String)] = for {
    v <- Gen.oneOf(1.0, 2.0, 2.0, 3.0, 5.5)
    id <- Gen.oneOf("aa", "ab", "b", "c", "dd", "e")
  } yield (v, id)

  test("TopKStrAgg: any chunking + insertion order equals global sort-take") {
    val gen = for {
      xs <- Gen.listOf(scored)
      k <- Gen.chooseNum(1, 4)
      // A random chunking models arbitrary map-partition splits; each
      // chunk is reduced independently and the buffers merged — the
      // partial-aggregation contract Spark relies on.
      cuts <- Gen.listOf(Gen.chooseNum(0, math.max(xs.size, 1)))
    } yield (xs, k, cuts)
    run("topKStr", Prop.forAll(gen) { case (xs, k, cuts) =>
      val agg = TopKOps.TopKStrAgg(k)
      val bounds = (cuts :+ 0 :+ xs.size).distinct.sorted
      val chunks = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
      val merged = chunks
        .map(_.foldLeft(agg.zero)((b, x) =>
          agg.reduce(b, TopKOps.ScoredStr(x._1, x._2))))
        .foldLeft(agg.zero)(agg.merge)
      val expected = xs.map { case (v, id) => TopKOps.ScoredStr(v, id) }
        .sortWith((a, b) => a.v > b.v || (a.v == b.v && a.id < b.id))
        .take(k)
      agg.finish(merged).items == expected
    }, cases = 300)
  }

  // ---- Behavioral operators vs Scala references (Spark round-trips,
  //      so fewer but larger cases; one dataset exercises all three) ----

  private case class Ev(u: Long, min: Int, id: Long, t: String)

  private val events: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(0, 24)
    // 1-3 users, minute offsets 0..40 WITH collisions, types from the
    // funnel alphabet + noise; ids made unique after generation.
    raw <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(1L, 3L)
      m <- Gen.chooseNum(0, 40)
      t <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (u, m, t))
  } yield raw.zipWithIndex.map { case ((u, m, t), i) => Ev(u, m, i.toLong, t) }

  private val Steps = Seq("view", "click", "purchase")
  private val GapS = 600L // 10 min — the minute grid makes exact-gap cases common

  private def df(es: List[Ev]) =
    es.map(e => (e.u, new Timestamp(1700000000000L + e.min * 60000L), e.id, e.t))
      .toDF("user_id", "ts", "event_id", "event_type")

  private def ordered(es: List[Ev]) =
    es.groupBy(_.u).view.mapValues(_.sortBy(e => (e.min, e.id))).toMap

  test("funnel stage / bigrams / sessions all equal their Scala references") {
    val gen = for { es <- events; parts <- Gen.chooseNum(1, 5) } yield (es, parts)
    run("behavioral", Prop.forAll(gen) { case (es, parts) =>
      val d = df(es).repartition(parts) // layout must never matter
      val byU = ordered(es)

      val refStages = byU.map { case (u, seq) =>
        u -> seq.foldLeft(0) { (st, e) =>
          if (st < Steps.size && e.t == Steps(st)) st + 1 else st }
      }
      val gotStages = BehaviorOps
        .funnelStages(d, "user_id", "ts", "event_id", "event_type", Steps)
        .as[(Long, Int)].collect().toMap

      val refBigrams = byU.toList.flatMap { case (u, seq) =>
        seq.map(_.t).sliding(2).filter(_.size == 2)
          .map(p => (u, s"${p(0)}>${p(1)}")).toList
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val gotBigrams = BehaviorOps
        .sequenceBigrams(d, "user_id", "ts", "event_id", "event_type")
        .as[(Long, String)].collect().toList
        .groupBy(identity).view.mapValues(_.size.toLong).toMap

      val refSessions = byU.toList.flatMap { case (u, seq) =>
        if (seq.isEmpty) Nil
        else {
          val cuts = seq.zip(seq.head :: seq.toList).map { case (cur, prev) =>
            (cur, cur.min * 60L - prev.min * 60L > GapS) }
          var sn = 0L
          val tagged = cuts.zipWithIndex.map { case ((e, isNew), i) =>
            if (i == 0 || isNew) sn += 1
            (e, sn) }
          tagged.groupBy(_._2).map { case (s, grp) =>
            val mins = grp.map(_._1.min)
            (u, s, grp.size.toLong, (mins.max - mins.min) * 60L) }
        }
      }.toSet
      val gotSessions = BehaviorOps
        .sessionize(d, "user_id", "ts", "event_id", GapS)
        .select($"user_id", $"session_n", $"n_events", $"duration_s")
        .as[(Long, Long, Long, Long)].collect().toSet

      gotStages == refStages && gotBigrams == refBigrams &&
        gotSessions == refSessions
    }, cases = 25)
  }
}
