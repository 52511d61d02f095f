package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns
  * PAIRWISE near-dup evidence (LSH/SimHash candidate pairs, q48/q84) into
  * dedup CLUSTERS. Pairwise keep-min-id purging handles a pair; a chain
  * a–b, b–c with no a–c edge needs the transitive closure, or b and c are
  * judged against different survivors and the cluster keeps 2 of its 3
  * members. The output labels every vertex with the minimum id reachable
  * from it, so "keep the min-id representative per component" is a direct
  * groupBy.
  *
  * Implementation is min-label propagation as iterative DataFrame joins —
  * deliberately NOT a driver-side union-find: edges stay distributed, each
  * round is one shuffle join + one aggregation, and the only thing the
  * driver ever sees is a one-row convergence count per round. Rounds needed
  * = the graph diameter, and near-dup graphs are shallow (clusters are
  * quasi-cliques around a template; the fixture's seeded dups converge in
  * 2-3 rounds). For deep path-shaped graphs the alternating small-star /
  * large-star construction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") converges in O(log n) rounds at the cost of more
  * complex rounds; label propagation is the right default for the dedup
  * shape.
  *
  * Scale notes: per-round lineage is cut with [[Tables.materialize]]
  * (localCheckpoint by default, reliable checkpoint under
  * `spark.graft.reliableCheckpoint` — an iterative plan would otherwise
  * nest `maxIter` joins deep and overwhelm the optimizer); labels are
  * (vertex, long) pairs, far smaller than the documents they describe; the
  * per-round join shuffles on the vertex id, and AQE's skew handling
  * splits a hub vertex's partition like any other skewed join key.
  */
object GraphOps {

  /** Both orientations of every edge in ONE pass (round 18): the
    * `e.union(swap(e))` symmetrize planned the caller's edge SUBTREE
    * twice — for the CC/stars/pageRank queries that subtree is the whole
    * candidate-pair join, whose exchanges were reused across the union
    * branches but whose dedup aggregation and projections re-ran per
    * branch. One explode emits the identical multiset from one
    * computation (and half the input partitions downstream). */
  private def bothOrientations(
      edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges.select(explode(array(
      struct(col(aCol).as("src"), col(bCol).as("dst")),
      struct(col(bCol).as("src"), col(aCol).as("dst")))).as("_graft_e"))
      .select(col("_graft_e.src").as("src"), col("_graft_e.dst").as("dst"))

  /** Label every vertex of the undirected graph `edges` with the smallest
    * vertex id in its connected component.
    *
    * @param edges one row per undirected edge (self-loops and duplicates
    *              are harmless; orientation is ignored)
    * @return (vertex, component) — one row per distinct vertex; singleton
    *         vertices never appear in an edge list, so callers union them
    *         back with `component = id` if they need total coverage
    * @throws IllegalStateException if labels are still moving after
    *         `maxIter` rounds (a pathological deep-path graph — see the
    *         small-star/large-star note above) rather than returning a
    *         silently-wrong partial labeling.
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive: $maxIter")
    // Symmetrize once: propagation below only needs to look at incoming
    // (src -> dst) labels if every edge appears in both orientations.
    // LAZY checkpoints (round 17): sym and the init are marked for
    // storage up front (their plans truncate, and a checkpoint-marked
    // RDD persists its blocks the first time a job computes it), but no
    // job runs until round 1's mover count — which therefore computes
    // symmetrization, init aggregation, and round 1 in ONE pass where
    // the eager form paid three.
    // NO dedup (round 18): min-propagation is multiplicity-insensitive
    // (min over a multiset equals min over its set), so duplicate edges
    // cannot move the fixed point — the former `.distinct()` here paid a
    // full edge-set exchange per invocation purely defensively, and
    // every in-repo producer (LshOps.candidatePairs, SrpOps.neardupPairs)
    // already emits distinct a<b pairs, whose two orientations cannot
    // collide. Symmetrization is therefore exchange-FREE. Duplicates a
    // caller does pass flow through every round's join; a caller with a
    // heavily duplicated edge list should distinct it first.
    val sym = Tables.materializeLazy(
      bothOrientations(edges, aCol, bCol)
        .filter(col("src") =!= col("dst")))
    // Label init = the first propagation round's OUTPUT, computed without
    // its join: from identity labels, round 1 produces exactly
    // min(v, min neighbor), which is one aggregation over the symmetrized
    // edges. Measured rounds-to-converge on dedup graphs is 2-4, so this
    // head start removes 25-50% of the join work per invocation; the
    // fixed point (and therefore every oracle hash) is unchanged.
    var labels = Tables.materializeLazy(
      sym.groupBy(col("src")).agg(min(col("dst")).as("_mn"))
        .select(col("src").as("v"), least(col("src"), col("_mn")).as("component")))
    var moved = 1L
    // The join-free init IS round 1's output, so it counts as round 1:
    // the loop then adds at most maxIter-1 join rounds, keeping the
    // documented "maxIter propagation rounds before the loud failure"
    // contract exact (round 7 started at 0 and ran up to maxIter+1
    // effective rounds).
    var round = 1
    // One ACTION per round (round 17, guide §1.2): the LAZY checkpoint
    // truncates the plan immediately (each round reads its input twice,
    // so an uncut loop builds a 2^rounds plan) and the mover count is
    // the forcing action that computes AND stores the round — the old
    // eager-checkpoint-then-count pair paid a full extra pass per round.
    while (moved > 0L && round < maxIter) {
      round += 1
      val next = Tables.materializeLazy(propagateOnce(sym, labels))
      moved = next.filter(col("component") =!= col("_graft_prev")).count()
      labels = next.drop("_graft_prev")
    }
    if (moved > 0L)
      throw new IllegalStateException(
        s"connected components still moving after $maxIter rounds — " +
          s"pathologically deep graph; raise maxIter or use [[connectedComponentsStars]]")
    labels
  }

  /** One propagation round — exactly ONE join (gated by GraphOpsSpec).
    * Each vertex adopts min(own label, neighbors' labels). The join
    * shuffles (edge, label) on the vertex id; the aggregation combines
    * map-side, so a high-degree hub contributes one partial min per
    * partition, not one row per neighbor. The vertex's own-label branch of
    * the union carries the label AGAIN as `_graft_prev` (each vertex has
    * exactly one labels row, so `max` reconstructs it through the
    * aggregation), letting the caller count movers without re-joining. */
  private[graft] def propagateOnce(sym: DataFrame, labels: DataFrame): DataFrame = {
    val prevType = labels.schema("component").dataType
    sym.join(labels.withColumnRenamed("v", "src"), "src")
      .select(col("dst").as("v"), col("component"), lit(null).cast(prevType).as("_graft_prev"))
      .union(labels.select(col("v"), col("component"), col("component").as("_graft_prev")))
      .groupBy(col("v"))
      .agg(min(col("component")).as("component"), max(col("_graft_prev")).as("_graft_prev"))
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond": large-star / small-star
    * rounds) — the deep-graph fallback [[connectedComponents]]'s failure
    * message points at. Label propagation needs diameter-many rounds, the
    * right default for near-dup graphs (shallow quasi-cliques) but a
    * refusal on path-shaped graphs; star contraction halves path lengths
    * every round pair, converging in O(log² n) rounds on ANY shape, at the
    * cost of heavier rounds (two grouped rewrites per iteration instead of
    * one join).
    *
    * Each round is edge-local: large-star points every larger neighbor of
    * u at u's minimum neighbor, small-star does the same for the
    * smaller-or-equal neighbors. Both are one groupBy over the (distinct,
    * canonically oriented) edge list — never a cross join, lineage cut per
    * round like the propagation loop. At the fixed point the edges form
    * stars centered at each component's minimum id, which is exactly the
    * (vertex, component) labeling.
    *
    * Same contract as [[connectedComponents]]: one row per vertex that
    * appears in an edge; singletons are the caller's union; loud failure
    * past `maxIter`.
    */
  /** [[connectedComponents]] with the deep-graph fallback applied
    * AUTOMATICALLY: propagation first (lighter rounds — the right default
    * for near-dup graphs, whose measured diameter is 2–4), and on its
    * loud maxIter refusal — the shape signal that the graph is deep, not
    * a transient — one [[connectedComponentsStars]] run from scratch.
    * Both algorithms land on the same fixed point, so the switch is
    * invisible in the labeling; the cost in the fallback case is the
    * wasted `maxIter` propagation rounds, which is why `maxIter` here
    * defaults LOWER than propagation's own (a graph that hasn't settled
    * in 8 rounds is already past every measured near-dup diameter).
    * Callers that KNOW their graph shape should call the specific
    * algorithm; this is for pipelines over graphs of unknown depth. */
  def connectedComponentsAuto(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 8,
      starsMaxIter: Int = 50): DataFrame =
    try connectedComponents(edges, aCol, bCol, maxIter)
    catch {
      case e: IllegalStateException if e.getMessage.contains("still moving") =>
        connectedComponentsStars(edges, aCol, bCol, starsMaxIter)
    }

  def connectedComponentsStars(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 50): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive: $maxIter")
    // LAZY checkpoint + count = ONE forcing pass for the init and for
    // each round (round 17; the eager-checkpoint-then-count pairs paid a
    // second full pass each). Plans still truncate every round — a star
    // round reads its input four times, so an uncut loop is 4^rounds.
    var e = Tables.materializeLazy(
      edges.select(col(aCol).as("x"), col(bCol).as("y"))
        .filter(col("x") =!= col("y"))
        .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
        .distinct())
    var changed = 1L
    var round = 0
    // |e| carries across rounds (this round's |B| is next round's |A|),
    // so the fixed-point check costs two jobs per round, not three.
    var eCount = e.count()
    while (changed > 0L && round < maxIter) {
      round += 1
      // The largeStar output is checkpoint-marked too (round 18):
      // smallStar reads its input TWICE (per-u mins + the join back), and
      // without a shared materialization point the whole largeStar
      // join subtree computes once per consumer. Its former `.distinct()`
      // provided that sharing as a full exchange of the rewritten edges;
      // the lazy checkpoint provides it as block reuse inside the same
      // forcing action — one exchange fewer per round, still one job.
      val next = Tables.materializeLazy(
        smallStar(Tables.materializeLazy(largeStar(e))))
      // Fixed point = edge SET unchanged. |A △ B| = 2|A ∪ B| − |A| − |B|;
      // both sides are materialized and distinct, so this is one cheap
      // distinct-count over small (id, id) pairs — and it only needs to
      // run when the counts MATCH (round 17): distinct sets of different
      // size are different, so every still-shrinking round answers from
      // the count it already paid.
      val nextCount = next.count()
      changed =
        if (nextCount != eCount) 1L
        else 2L * next.union(e).distinct().count() - nextCount - eCount
      e = next
      eCount = nextCount
    }
    if (changed > 0L)
      throw new IllegalStateException(
        s"star contraction still moving after $maxIter rounds — " +
          "raise maxIter (O(log^2 n) rounds suffice for any graph)")
    // Stars: every remaining edge (u, m) points a vertex at its component
    // minimum; the minima label themselves.
    e.select(col("u").as("v"), col("v").as("component"))
      .union(e.select(col("v"), col("v")))
      .distinct()
  }

  /** Fixed-iteration PageRank (Page et al. 1999, public) over the
    * undirected graph `edges` — the centrality signal on top of the same
    * near-dup evidence the components operators consume: within a dedup
    * cluster, the highest-rank member is the best-connected template
    * (most duplicated ⇒ most "endorsed"), a retention-policy signal
    * complementary to q112's longest-member pick.
    *
    * r₀(v) = 1/N;  r_{k+1}(v) = (1−d)/N + d·Σ_{u∈Γ(v)} r_k(u)/deg(u),
    * rounded to 6 dp each iteration — the rounding quantizes away
    * float-summation order, so every iteration's input (and therefore
    * the fixed output) is a pure function of the graph on any engine.
    * N counts vertices WITH edges (symmetrized, so deg ≥ 1 everywhere:
    * no dangling mass to redistribute by construction).
    *
    * Scale shape: each iteration is one shuffle join on the vertex id +
    * one aggregation over (vertex, double) pairs — the same profile as a
    * label-propagation round; lineage is cut per iteration with
    * [[Tables.materialize]]. Fixed `iters` (not convergence-tested):
    * ranking stabilizes in a handful of iterations on shallow near-dup
    * graphs, and a fixed count keeps the oracle expressible as unrolled
    * CTEs. For a graph whose depth is NOT known to be shallow, use
    * [[pageRankConverged]] — the fixed-count variant cannot tell an
    * under-converged deep chain from a finished ranking.
    *
    * The result is LAZY (round 17: no per-round lineage cut — the
    * bounded ≤20-round nested plan is one job at the consumer): a caller
    * performing MULTIPLE actions on it recomputes all iterations per
    * action and should `Tables.materialize` it first. */
  def pageRank(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      iters: Int = 3,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters out of [1,20]: $iters")
    require(damping > 0 && damping < 1, s"damping out of (0,1): $damping")
    val (sym, deg, nDf, init) = pageRankInit(edges, aCol, bCol)
    var ranks = init
    // No per-round lineage cut (round 17, guide §2.4): each round reads
    // the previous round's ranks exactly ONCE, so the fixed-count loop
    // is a single ≤20-deep nested plan (bounded by the require above) —
    // one job at the consumer instead of one forcing job per round.
    // The convergence-guarded sibling below still cuts per round: it
    // reads each round twice (step + probe) and needs a driver decision.
    for (_ <- 1 to iters)
      ranks = pageRankStep(sym, deg, nDf, ranks, damping, cut = false)
    ranks
  }

  /** Convergence-guarded PageRank — the loud maxIter discipline of the
    * components siblings ([[connectedComponents]]' still-moving throw),
    * for graphs whose diameter is not known in advance. Runs the SAME
    * 6-dp-quantized recurrence as [[pageRank]]; convergence = exact
    * FIXPOINT or exact PERIOD-2 CYCLE of the quantized map. The cycle
    * clause is load-bearing, not an escape hatch: on a bipartite graph
    * (any path or star is) the oscillating eigencomponent decays with
    * alternating sign, and the rounding feedback locks the iteration
    * into a genuine period-2 limit cycle — measured amplitude a few to
    * a few TENS of quanta (30-path: 5e-6, onset round 46; 7-star:
    * 1.6e-5, onset round 64) — which never reaches fixpoint at ANY
    * budget, so an amplitude threshold either spins forever or is an
    * arbitrary tolerance in disguise. Either cycle phase is the answer
    * to the precision the quantization contract promises; the state at
    * first detection is returned, and because each iteration is
    * exact-per-round on any engine, the stopping round (and thus the
    * returned ranks) is a pure function of the graph. Detection is one
    * vertex-sized equality join per round over frames the iteration
    * already materialized. A graph still moving after `maxIter` rounds
    * (deeper than the budget, or a longer-period cycle) fails loudly
    * instead of handing the caller a silently under-converged ranking
    * (the deep-chain hazard: a fixed 3 rounds only propagates rank 3
    * hops). */
  def pageRankConverged(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 100,
      damping: Double = 0.85): DataFrame = {
    // Default 100, not a round 40: the measured cycle onsets above (46
    // and 64) are where CONVERGENT graphs stop — a default below them
    // would throw on the scaladoc's own examples.
    require(maxIter >= 1 && maxIter <= 200, s"maxIter out of [1,200]: $maxIter")
    require(damping > 0 && damping < 1, s"damping out of (0,1): $damping")
    val (sym, deg, nDf, init) = pageRankInit(edges, aCol, bCol)
    var prev: DataFrame = null // r_{k-1}
    var ranks = init           // r_k
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      it += 1
      // LAZY checkpoint: the probe's head() below is the forcing action
      // (its aggregation reads every row of next), so each round costs
      // one job, not a lineage-cut job plus the probe (round 17).
      val next = Tables.materializeLazy(
        pageRankStep(sym, deg, nDf, ranks, damping, cut = false))
      // ONE vertex-sized join+aggregation answers both the fixpoint and
      // the period-2 test (two separate probe jobs per round doubled the
      // driver's job count for nothing — all three frames are
      // materialized already).
      val probe = next.join(ranks.select(col("v"), col("rank").as("_r1")), "v")
      val row = (if (prev == null) probe.withColumn("_r2", col("_r1"))
                 else probe.join(prev.select(col("v"), col("rank").as("_r2")), "v"))
        .agg(
          max(when(col("rank") =!= col("_r1"), 1).otherwise(0)).as("m1"),
          max(when(col("rank") =!= col("_r2"), 1).otherwise(0)).as("m2"))
        .head()
      // max over ZERO rows is null — an empty graph is trivially fixed.
      val fixpoint = row.isNullAt(0) || row.getInt(0) == 0
      val cycle2 = prev != null && (row.isNullAt(1) || row.getInt(1) == 0)
      converged = fixpoint || cycle2
      prev = ranks
      ranks = next
    }
    if (!converged)
      throw new IllegalStateException(
        s"PageRank still moving after $maxIter iterations — the graph is " +
          "deeper than the iteration budget (rank needs ~diameter hops to " +
          "propagate), or the quantized map entered a cycle of period > 2; " +
          "raise maxIter")
    ranks
  }

  /** Shared setup: symmetrized distinct edge list, per-vertex degrees,
    * the vertex count, and the uniform 1/N initial ranks. */
  private def pageRankInit(
      edges: DataFrame,
      aCol: String,
      bCol: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // LAZY checkpoints (round 17): plans truncate up front, blocks store
    // on the first forcing action — the first iteration's probe (or the
    // fixed-count caller's one job) computes symmetrization and degrees
    // in the same pass instead of two eager setup jobs.
    // distinct() stays: deg counts rows per src, and PageRank divides by
    // deg — unlike min-propagation, MULTIPLICITY-SENSITIVE.
    val sym = Tables.materializeLazy(
      bothOrientations(edges, aCol, bCol)
        .filter(col("src") =!= col("dst"))
        .distinct())
    val deg = Tables.materializeLazy(
      sym.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val nDf = deg.agg(count(lit(1)).as("n"))
    val init = deg.select(col("src").as("v")).crossJoin(broadcast(nDf))
      .select(col("v"), (lit(1.0) / col("n")).as("rank"))
    (sym, deg, nDf, init)
  }

  /** One PageRank iteration: contribution join + aggregation, output
    * quantized to 6 dp and lineage-cut. */
  private def pageRankStep(
      sym: DataFrame,
      deg: DataFrame,
      nDf: DataFrame,
      ranks: DataFrame,
      damping: Double,
      cut: Boolean = true): DataFrame = {
    val contrib = sym
      .join(ranks.withColumnRenamed("v", "src"), "src")
      .join(deg, "src")
      .select(col("dst").as("v"), (col("rank") / col("deg")).as("c"))
    // (1.0 - damping), not a pre-computed 0.15: both engines fold the
    // subtraction with the same IEEE semantics, and 1.0 - 0.85 is NOT
    // the same double as the literal 0.15.
    val step = contrib.groupBy(col("v")).agg(sum(col("c")).as("in"))
      .crossJoin(broadcast(nDf))
      .select(col("v"), round(
        (lit(1.0) - lit(damping)) / col("n") + lit(damping) * col("in"),
        6).as("rank"))
    if (cut) Tables.materialize(step) else step
  }

  /** Large-star round: for each vertex x, point every STRICTLY LARGER
    * neighbor at m = min(Γ(x) ∪ {x}). Output is canonically oriented
    * (first > second: y > x ≥ m) but NOT deduplicated (round 18, guide
    * §2.4): [[smallStar]] — its only consumer — takes a min per key and
    * ends with its own distinct, so duplicates cannot change the round's
    * edge SET, and the former per-round `.distinct()` here was a whole
    * extra exchange of the rewritten edges. Multiplicity stays bounded:
    * the pre-distinct output is at most the 2|e| neighbor rows. */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val nbr = bothOrientations(e, "u", "v")
      .select(col("src").as("x"), col("dst").as("y"))
    val mins = nbr.groupBy(col("x")).agg(min(col("y")).as("_my"))
      .select(col("x"), least(col("_my"), col("x")).as("m"))
    nbr.join(mins, "x")
      .filter(col("y") > col("x") && col("y") =!= col("m"))
      .select(col("y").as("u"), col("m").as("v"))
  }

  /** Small-star round: for each vertex u, point itself and every
    * SMALLER neighbor at m = min of the smaller neighborhood. Input and
    * output are canonically oriented (first > second) and distinct.
    *
    * The two emissions per joined row — (u, m) always, (v, m) when
    * v ≠ m — are produced by ONE explode over the join output
    * (round 18): the former self-union of two projections of `withM`
    * planned the join subtree TWICE per round (the exchanges were
    * reused, the join compute was not). Identical multiset, one join
    * execution — and keeping the join (rather than a per-u window)
    * keeps AQE's skew-split available for hub vertices, which is the
    * exact graph shape the stars algorithm exists for. */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
    e.join(mins, "u")
      .select(explode(when(col("v") =!= col("m"),
        array(struct(col("u").as("a"), col("m").as("b")),
          struct(col("v").as("a"), col("m").as("b"))))
        .otherwise(array(struct(col("u").as("a"), col("m").as("b"))))).as("_s"))
      .select(col("_s.a").as("u"), col("_s.b").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }
}
