package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Gates for the prefix-filtered EXACT Jaccard join (E131). The DuckDB
  * oracle (q146) pins fixture values; these pin the two claims a hash
  * diff can't explain when it breaks: (1) the prefix filter is LOSSLESS
  * — the output equals brute force on arbitrary inputs; (2) the
  * rarest-first canonical order keeps ubiquitous elements out of
  * prefixes — the property the join's candidate bound rests on. */
class SetJoinOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def items(rows: (Long, Seq[String])*) =
    rows.toDF("id", "elems")

  private def bruteForce(
      rows: Seq[(Long, Seq[String])], tau: Double): Set[(Long, Long, Double)] = {
    val sets = rows.map { case (id, es) => id -> es.toSet }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= tau
    } yield (a, b, j)).toSet
  }

  private def run(d: org.apache.spark.sql.DataFrame, tau: Double) =
    SetJoinOps.prefixJaccardJoin(d, "id", "elems", tau)
      .as[(Long, Long, Double)].collect().toSet

  test("prefix filter is lossless: equals brute force on random corpora") {
    val rng = new Random(42)
    val vocab = ('a' to 'z').map(_.toString)
    // Rows share a skewed vocabulary (some near-ubiquitous elements, a
    // rare tail) plus planted near-duplicate pairs — the regime where a
    // buggy prefix would silently drop pairs.
    val base = (1L to 40L).map { i =>
      i -> (Seq("the", "of") ++ // ubiquitous
        rng.shuffle(vocab).take(3 + rng.nextInt(6)))
    }
    val dups = base.take(5).map { case (id, es) =>
      (id + 100L) -> (es :+ vocab(rng.nextInt(vocab.size)))
    }
    val rows = base ++ dups
    for (tau <- Seq(0.5, 0.7, 0.9, 1.0)) {
      assert(run(items(rows: _*), tau) == bruteForce(rows, tau),
        s"prefix join diverged from brute force at tau=$tau")
    }
  }

  test("identical, disjoint, singleton, and empty sets behave at the boundaries") {
    val d = items(
      1L -> Seq("x", "y", "z"),
      2L -> Seq("x", "y", "z"),       // == doc 1 -> jaccard 1.0
      3L -> Seq("p", "q"),            // disjoint from 1/2
      4L -> Seq.empty,                // no elements -> no rows
      5L -> Seq("x", "x", "y", "z"),  // dup elements dedup to doc 1's set
      6L -> Seq("p"),                 // singletons: prefix IS the whole set
      7L -> Seq("p"))
    val r = run(d, 0.5)
    assert(r == Set(
      (1L, 2L, 1.0), (1L, 5L, 1.0), (2L, 5L, 1.0),
      (3L, 6L, 0.5), (3L, 7L, 0.5), (6L, 7L, 1.0)), r)
    // tau = 1.0 keeps only exact-set duplicates.
    assert(run(d, 1.0) ==
      Set((1L, 2L, 1.0), (1L, 5L, 1.0), (2L, 5L, 1.0), (6L, 7L, 1.0)))
    intercept[IllegalArgumentException](run(d, 0.0))
    intercept[IllegalArgumentException](run(d, 1.5))
  }

  test("rarest-first order keeps ubiquitous elements out of prefixes") {
    // Every doc shares 'the'; each doc has one unique element. At
    // tau = 0.8 the prefix is 1 element, which MUST be the rare one —
    // a frequency-blind order would flood the 'the' bucket with every
    // document and regress the join toward all-pairs.
    val n = 20L
    val elems = (1L to n).flatMap(i => Seq((i, "the"), (i, s"rare_$i")))
      .toDF("id", "e")
    val prefix = SetJoinOps.prefixOf(elems, 0.8)
      .select("id", "e").as[(Long, String)].collect()
    assert(prefix.length == n.toInt)
    assert(prefix.forall(_._2.startsWith("rare_")),
      s"ubiquitous element entered a prefix: ${prefix.toSeq}")
  }

  test("prefix length covers the rounded-gate band and IEEE ceil boundaries") {
    // (1) The output gate keeps pairs whose ROUNDED Jaccard >= tau, i.e.
    // true J down to tau - 0.00005 — candidate prefixes must be derived
    // from the relaxed threshold. At sz = 14999, tau = 0.5:
    // strict  len = sz - ceil(0.5*14999) + 1          = 7500
    // relaxed len = sz - ceil(0.49995*14999 - 1e-9) + 1 = 7501
    val big = (1L to 14999L).map(i => (1L, f"e$i%06d")).toDF("id", "e")
    assert(SetJoinOps.prefixOf(big, 0.5).count() == 7501L,
      "prefix not derived from the rounded-gate-relaxed threshold")
    // (2) One IEEE multiply can overshoot an exact integer bound:
    // double(0.2) > 1/5, so 0.2*5 rounds to 1.0000000000000002 and a
    // naive ceil returns 2, shortening the prefix. With the epsilon the
    // 5-element set keeps all 5 elements (len = 5 - ceil(0.99975-) + 1).
    val five = (1L to 5L).map(i => (1L, s"e$i")).toDF("id", "e")
    assert(SetJoinOps.prefixOf(five, 0.2).count() == 5L,
      "IEEE ceil overshoot shortened the prefix")
  }

  test("releases its persisted element frame; pinned result survives") {
    val d = items(1L -> Seq("a", "b"), 2L -> Seq("a", "b"), 3L -> Seq("c"))
    val out = SetJoinOps.prefixJaccardJoin(d, "id", "elems", 0.5)
    assert(spark.sharedState.cacheManager.isEmpty,
      "prefixJaccardJoin leaked its persisted element frame")
    assert(out.count() == 1L)
  }
}
