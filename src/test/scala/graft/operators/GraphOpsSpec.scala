package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain merges transitively — the case pairwise purging gets wrong") {
    // a-b, b-c, no a-c edge: one cluster of three, labeled by its min.
    val labels = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("orientation, duplicates, and self-loops don't disturb the labeling") {
    val labels = cc(Seq((5L, 2L), (2L, 5L), (5L, 2L), (7L, 7L), (2L, 9L)))
    // 7's only edge is a self-loop: it's a singleton and singletons are
    // not emitted (callers union them back as component = id).
    assert(labels == Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("dropping the symmetrize dedup cannot move the labeling (round 18)") {
    // connectedComponents no longer .distinct()s its symmetrized edge
    // list (one full edge-set exchange fewer per invocation): min is
    // multiplicity-insensitive, so a heavily DUPLICATED multigraph must
    // label bit-identically to its distinct form — same clusters, same
    // min labels — including when duplicates ride both orientations.
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (1L, 4L))
    val dup = base ++ base.map(_.swap) ++ base ++ Seq((2L, 2L), (10L, 10L))
    assert(cc(dup) == cc(base.distinct))
  }

  test("a long path converges within the diameter and labels to the global min") {
    val path = (1L until 12L).map(i => (i, i + 1))
    assert(cc(path) == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("non-convergence is loud, not a silently partial labeling") {
    val path = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] { cc(path, maxIter = 2) }
    assert(e.getMessage.contains("still moving"))
  }

  test("empty edge list yields an empty labeling") {
    assert(cc(Seq.empty) == Map.empty)
  }

  test("a propagation round is exactly ONE join (round 7: no convergence re-join)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.functions.col
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b"), col("a")))
    val labels = sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("component"))
    val round = GraphOps.propagateOnce(sym, labels)
    val joins = round.queryExecution.analyzed.collect { case j: Join => j }
    assert(joins.size == 1, s"expected 1 join per round, found ${joins.size}")
    // The mover count must still be readable off the round itself.
    assert(round.columns.contains("_graft_prev"))
  }

  test("auto components: propagation solves the shallow graph, stars rescues the deep one") {
    // Shallow clustered graph: propagation converges well inside the auto
    // default, labels match the direct call.
    val clustered = Seq((5L, 2L), (2L, 9L), (20L, 21L))
    val auto = GraphOps.connectedComponentsAuto(clustered.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(auto == cc(clustered))
    // Deep path: propagation's refusal fires internally and the stars
    // fallback lands the identical fixed point — every vertex labeled to
    // the global min.
    val path = (0L until 200L).map(i => (i, i + 1))
    val labels = GraphOps.connectedComponentsAuto(path.toDF("a", "b"), "a", "b")
    import org.apache.spark.sql.functions.col
    val m = labels.select(col("v"), col("component"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 201 && m.values.forall(_ == 0L))
  }

  private def stars(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] =
    GraphOps.connectedComponentsStars(edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("a star round's edge SET is insensitive to largeStar's dropped dedup (round 18)") {
    // largeStar no longer ends with .distinct() (one exchange fewer per
    // round): smallStar takes a min per key and ends with its own
    // distinct, so input multiplicity must not change the round's output
    // edge set. Checked against the explicitly-deduplicated reference on
    // a graph with parallel edges, a path tail, and a clique.
    import org.apache.spark.sql.functions.{col, greatest, least}
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L), (12L, 10L), (20L, 21L))
      .toDF("a", "b")
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
    val large = GraphOps.largeStar(edges)
    // The pre-distinct output really does carry duplicates on this graph
    // (else the test is vacuous) …
    assert(large.count() > large.distinct().count())
    // … and the round output is the same SET either way.
    val viaRaw = GraphOps.smallStar(large).as[(Long, Long)].collect().toSet
    val viaDedup = GraphOps.smallStar(large.distinct()).as[(Long, Long)].collect().toSet
    assert(viaRaw == viaDedup)
  }

  test("smallStar's explode emission equals the former two-branch union (round 18)") {
    // The rewrite replaced union(select(u,m), filter(v=!=m).select(v,m))
    // — which planned the withM join TWICE — with one explode; the
    // emitted multiset (pre-filter/distinct it's a multiset!) must be
    // identical, so the round's edge set and the convergence counts
    // cannot move. Checked on a graph with duplicate largeStar rewrites.
    import org.apache.spark.sql.functions._
    val e = Seq((5L, 1L), (5L, 2L), (6L, 1L), (6L, 5L), (7L, 7L), (9L, 3L))
      .toDF("u", "v")
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
    val withM = e.join(mins, "u")
    val oldForm = withM.select(col("u"), col("m").as("v"))
      .union(withM.filter(col("v") =!= col("m")).select(col("v").as("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .as[(Long, Long)].collect().toSeq.sorted
    val newForm = GraphOps.smallStar(e)  // distinct form
    // Pre-distinct multiset parity (rebuild the emission inline):
    val newMultiset = e.join(mins, "u")
      .select(explode(when(col("v") =!= col("m"),
        array(struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b"))))
        .otherwise(array(struct(col("u").as("a"), col("m").as("b"))))).as("_s"))
      .select(col("_s.a"), col("_s.b"))
      .filter(col("a") =!= col("b"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(newMultiset == oldForm)
    assert(newForm.as[(Long, Long)].collect().toSet == oldForm.toSet)
  }

  test("star contraction solves the path graph label propagation refuses") {
    // A 1000-vertex path has diameter 999: label propagation at the
    // default 25 rounds must refuse loudly...
    val path = (1L until 1000L).map(i => (i, i + 1))
    val refusal = intercept[IllegalStateException] {
      cc(path, maxIter = 5)
    }
    assert(refusal.getMessage.contains("still moving"))
    // ...while alternating large-star/small-star halves path lengths every
    // round pair and lands the same labeling in O(log^2 n) rounds.
    assert(stars(path) == (1L to 1000L).map(_ -> 1L).toMap)
  }

  test("pageRank: hub outranks leaves, mass ~conserved, determinism across layouts") {
    // Star: hub 0 with leaves 1..6, plus a detached 2-clique (7, 8).
    val edges = ((1L to 6L).map(i => (0L, i)) :+ (7L, 8L)).toDF("a", "b")
    val r = GraphOps.pageRank(edges, "a", "b", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(r.size == 9)
    // The hub receives 6 leaves' full rank each iteration.
    assert(r(0L) > r(1L) * 3, s"hub must dominate: $r")
    // Leaves are symmetric.
    assert((1L to 6L).map(r).distinct.size == 1)
    // The 2-clique members exchange rank losslessly: exactly 1/N each.
    assert(math.abs(r(7L) - 1.0 / 9) < 1e-6 && r(7L) == r(8L))
    // Total mass stays ~1 (no dangling nodes by construction).
    assert(math.abs(r.values.sum - 1.0) < 1e-3, r.values.sum)
    // Layout-independent (the 6-dp per-iteration quantization contract).
    val again = GraphOps.pageRank(edges.repartition(7), "a", "b", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(again == r)
  }

  test("pageRankConverged: a deep chain under-budgeted is loud, converged it is exact") {
    // 30-vertex path: rank needs ~diameter hops to propagate, so 3
    // iterations are PROVABLY insufficient (the quantized ranks are
    // still moving) — the fixed-iteration variant would hand back that
    // under-converged ranking silently; the guard refuses it loudly.
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException](
      GraphOps.pageRankConverged(chain, "a", "b", maxIter = 3))
    assert(e.getMessage.contains("still moving after 3"), e.getMessage)
    // With budget, the same chain converges (period-2 detection fires at
    // round 46 — the bipartite limit cycle, see the operator scaladoc).
    val r = GraphOps.pageRankConverged(chain, "a", "b", maxIter = 150)
      .as[(Long, Double)].collect().toMap
    assert(r.size == 30)
    // Symmetric path: mirrored vertices tie (symmetry is preserved by
    // every iteration); interior outranks endpoints.
    assert(r(0L) == r(29L) && r(14L) == r(15L) && r(14L) > r(0L), r)
    assert(math.abs(r.values.sum - 1.0) < 1e-3)
    // Deterministic across layouts — the stopping round is a pure
    // function of the graph, so the returned phase is too.
    val again = GraphOps.pageRankConverged(chain.repartition(7), "a", "b",
      maxIter = 150).as[(Long, Double)].collect().toMap
    assert(again == r)
    // Shallow star (bipartite as well; its cycle onsets at round 64):
    // the converged semantic properties hold exactly.
    val star = ((1L to 6L).map(i => (0L, i)) :+ (7L, 8L)).toDF("a", "b")
    val conv = GraphOps.pageRankConverged(star, "a", "b", maxIter = 100)
      .as[(Long, Double)].collect().toMap
    assert(conv(0L) > conv(1L) * 3, s"hub must dominate: $conv")
    assert((1L to 6L).map(conv).distinct.size == 1)
    assert(math.abs(conv(7L) - 1.0 / 9) < 1e-5 && conv(7L) == conv(8L))
    assert(math.abs(conv.values.sum - 1.0) < 1e-3)
  }

  test("star contraction agrees with label propagation on a clustered graph") {
    val rng = new scala.util.Random(7)
    // 40 clusters of 5 around hubs + random intra-cluster chords: the
    // near-dup shape, plus orientation noise.
    val edges = (0L until 40L).flatMap { c =>
      val base = c * 100L
      val members = (0 to 4).map(base + _)
      val spokes = members.tail.map(m => (m, base))
      val chords = Seq.fill(3)((members(rng.nextInt(5)), members(rng.nextInt(5))))
      spokes ++ chords
    }
    assert(stars(edges) == cc(edges))
  }
}
