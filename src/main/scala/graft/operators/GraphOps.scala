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
    val sym = Tables.materialize(
      edges.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct())
    var labels = Tables.materialize(
      sym.select(col("src").as("v")).distinct()
        .select(col("v"), col("v").as("component")))
    var moved = 1L
    var round = 0
    while (moved > 0L && round < maxIter) {
      round += 1
      // Each vertex adopts min(own label, neighbors' labels). The join
      // shuffles (edge, label) on the vertex id; the aggregation combines
      // map-side, so a high-degree hub contributes one partial min per
      // partition, not one row per neighbor.
      val next = Tables.materialize(
        sym.join(labels.withColumnRenamed("v", "src"), "src")
          .select(col("dst").as("v"), col("component"))
          .union(labels)
          .groupBy(col("v")).agg(min(col("component")).as("component")))
      // Convergence = one scalar to the driver, not a data collect. The
      // superseded rounds' checkpoint blocks are dereferenced here and
      // reaped by the ContextCleaner.
      moved = next.join(labels.withColumnRenamed("component", "prev"), "v")
        .filter(col("component") =!= col("prev")).count()
      labels = next
    }
    if (moved > 0L)
      throw new IllegalStateException(
        s"connected components still moving after $maxIter rounds — " +
          "pathologically deep graph; raise maxIter or use a star-contraction variant")
    labels
  }
}
