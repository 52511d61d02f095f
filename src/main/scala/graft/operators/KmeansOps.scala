package graft.operators

import graft.Tables
import graft.functions.VectorFunctions.{cosine, l2Distance}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's iterations) over an embedding column, plus
  * the SemDeDup-style semantic purge built on top of it (SURVEY §2.3
  * E97/E98) — the clustering half of a pretraining-data curation pipeline:
  * coarse-partition the embedding space, then drop semantic duplicates
  * WITHIN each cluster instead of paying the corpus-wide O(n²) cosine join.
  *
  * ==Scale design==
  * The model state is k×dim doubles — centroids, not data — and is the ONLY
  * thing that ever touches the driver. Per Lloyd iteration:
  *
  *  - '''Assignment is a narrow projection.''' For k ≤ [[LiteralPathMaxK]]
  *    the centroids are inlined as array literals and the arg-min over k
  *    codegen'd [[graft.plans.L2DistExpr]] distances runs inside
  *    whole-stage codegen: zero shuffle, zero join, pushes to the scan.
  *    For larger k (an IVF-grade quantizer) the same arg-min runs as a
  *    broadcast nested-loop join against the centroid table followed by a
  *    `min` over a packed (dist, cluster) long whose map-side combine
  *    reduces every partition to one row per vector id before the exchange
  *    (a primitive buffer — a struct-valued min would silently degrade to
  *    SortAggregate over the n×k explosion).
  *  - '''The update is one aggregation''' over (cluster, dim) cells —
  *    `posexplode` + `avg` with map-side partial aggregation, so each task
  *    contributes at most k×dim partial sums regardless of row count. The
  *    k×dim result (a few MB even at k=100k, dim=64) is collected as the
  *    next round's model.
  *
  * Nothing in the loop materializes an n-row intermediate on the driver,
  * and the assignment never shuffles the corpus — at 100 TB the data is
  * read iters+1 times and shuffled zero times (small-k path).
  *
  * ==Determinism (the oracle contract)==
  * Seeding is data-derived and layout-independent: the k vectors with the
  * SMALLEST ids (a `TakeOrdered`, not `rdd.takeSample`). Distances are
  * rounded at 6 dp before the arg-min and ties break toward the smaller
  * cluster index; centroid means are rounded at 6 dp before the next
  * round. Every step is restatable in ANSI SQL, so a fixed (k, iters) run
  * hash-matches the DuckDB oracle (q115/q116).
  */
object KmeansOps {

  /** Above this k the inlined-literal arg-min stops being reasonable (the
    * expression tree grows linearly with k and codegen methods hit JVM
    * size limits); the broadcast-join path takes over. */
  val LiteralPathMaxK = 64

  /** Cluster-index bits in the join path's packed arg-min code (k < 2^20 ≈
    * 1M clusters; distances up to ~8.8e6 before the long overflows — unit
    * or near-unit embeddings are far inside both bounds). */
  val ClusterBits = 20

  /** Fitted model: `centroids(c)(d)` after the final update, and the final
    * assignment `(idCol, cluster: int, dist: double)` — dist is the 6-dp
    * L2 distance to the assigned (final) centroid. `assignments` is a
    * narrow projection over the input (small-k path): consumers that also
    * need payload columns should use [[assign]] directly. */
  final case class KmeansFit(centroids: Array[Array[Double]], assignments: DataFrame)

  /** `iters` Lloyd update rounds from the deterministic seed, then one
    * final assignment against the settled centroids. */
  def fit(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int): KmeansFit = {
    require(k > 0, s"k must be positive: $k")
    require(iters >= 0, s"iters must be non-negative: $iters")
    var cents: Array[Array[Double]] = df
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("_graft_v"))
      .orderBy(col(idCol))
      .limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(cents.length == k,
      s"need at least k=$k rows to seed k-means, got ${cents.length}")
    for (_ <- 1 to iters) cents = updateStep(df, vecCol, idCol, cents)
    val asg = assign(df, vecCol, idCol, cents)
      .select(col(idCol), col("cluster"), col("dist"))
    KmeansFit(cents, asg)
  }

  /** Assign every row to its nearest centroid: input columns plus
    * `cluster` (int, arg-min of 6-dp L2 distance, ties to the smaller
    * index) and `dist` (that 6-dp distance). Narrow zero-shuffle
    * projection for k ≤ [[LiteralPathMaxK]]; broadcast-join + map-side
    * arg-min aggregation above it (payload columns rejoin by id). */
  def assign(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      cents: Array[Array[Double]]): DataFrame =
    assignPath(df, vecCol, idCol, cents, literal = cents.length <= LiteralPathMaxK)

  /** Path-pinned [[assign]] — package-visible so the spec can prove both
    * paths produce identical assignments. */
  private[operators] def assignPath(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      cents: Array[Array[Double]],
      literal: Boolean): DataFrame =
    if (literal) {
      val dists = cents.map(c => l2Distance(col(vecCol), typedLit(c.toSeq)))
      val minD = dists.reduceLeft((a, b) => least(a, b))
      // First-match when-chain = smallest index wins ties (the SQL
      // `ORDER BY dist, cluster` twin).
      val cluster = dists.zipWithIndex.reverse.foldLeft(lit(-1): Column) {
        case (acc, (d, i)) => when(d === minD, lit(i)).otherwise(acc)
      }
      df.withColumn("dist", minD).withColumn("cluster", cluster)
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      require(cents.length < (1 << ClusterBits),
        s"join-path assignment packs the cluster index into $ClusterBits bits; " +
          s"k=${cents.length} exceeds ${1 << ClusterBits} — use a two-level " +
          "(IVF-style) assignment instead")
      val centDf = broadcast(
        cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
          .toSeq.toDF("_graft_cl", "_graft_c"))
      // The arg-min rides ONE long: code = round(dist·1e6)·2^20 + cluster.
      // min(code) is a primitive-buffer aggregate, so it HASH-aggregates
      // with map-side combine — the n×k exploded rows reduce to one row
      // per vector per partition before any exchange. (min over a
      // struct(dist, cluster) has no mutable buffer type and silently
      // degrades to SortAggregate: the gsf10 probe measured the sort of
      // the 156 M-row explosion dominating the whole fit.) The 6-dp
      // distance survives the round trip exactly — round(dist·1e6) is
      // integral, and long/1e6 re-yields the same nearest double as
      // round(dist, 6). Tie-break: equal-dist codes order by cluster,
      // the literal path's first-match rule.
      val code = round(l2Distance(col(vecCol), col("_graft_c")) * 1e6).cast("long") *
        lit(1L << ClusterBits) + col("_graft_cl")
      val best = df.select(col(idCol), col(vecCol))
        .crossJoin(centDf)
        .select(col(idCol), code.as("_graft_code"))
        .groupBy(col(idCol))
        .agg(min(col("_graft_code")).as("_graft_code"))
        .select(col(idCol),
          (shiftright(col("_graft_code"), ClusterBits).cast("double") / 1e6).as("dist"),
          col("_graft_code").bitwiseAND(lit((1L << ClusterBits) - 1))
            .cast("int").as("cluster"))
      df.join(best, idCol)
    }

  /** One Lloyd update: assign against `cents`, re-average per (cluster,
    * dim), round at 6 dp. Clusters that captured no rows keep their
    * previous centroid. */
  private[operators] def updateStep(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      cents: Array[Array[Double]]): Array[Array[Double]] = {
    val assigned = assign(df, vecCol, idCol, cents)
    val cells = assigned
      .select(col("cluster"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("cluster"), col("i"))
      .agg(round(avg(col("x").cast("double")), 6).as("m"))
      .collect()
    // Clusters that captured no rows keep their previous centroid (`next`
    // starts as a copy and only observed cells are overwritten).
    val next = cents.map(_.clone())
    cells.foreach { r =>
      next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    next
  }

  /** SemDeDup-style semantic dedup (E98, after Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embeddings, compare pairs only
    * WITHIN a cluster, and purge every vector that has a same-cluster
    * partner with smaller id and cosine ≥ `minCos` (the repo's standard
    * keep-min-id pairwise policy, q52's twin in embedding space).
    *
    * Returns one row per input vector: `(idCol, cluster, kept)`.
    *
    * ==Scale contract==
    * Pairs meet through ONE shuffle on the cluster id; the join is
    * quadratic in CLUSTER size, never in corpus size — that is the entire
    * point of clustering first. k must therefore scale with the corpus
    * (SemDeDup uses n/k ≈ 10⁴–10⁵ members per cluster at web scale; the
    * paper runs k=11k over 1.3B embeddings). The `maxClusterForPairs`
    * gauge REFUSES loudly when any cluster exceeds it instead of silently
    * planning a quadratic blow-up — raise k (or the gauge, knowingly).
    */
  def semanticPurge(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int,
      minCos: Double,
      maxClusterForPairs: Long = 10000L): DataFrame = {
    val fitted = fit(df, vecCol, idCol, k, iters)
    // Materialized ALREADY PARTITIONED on the cluster key: both sides of
    // the pair self-join below read the same hash layout, so the join
    // re-shuffles neither side — one up-front shuffle instead of two
    // join-time shuffles of the same frame (PlanSpec budgets the plan).
    val asg = Tables.materialize(
      assign(df.select(col(idCol), col(vecCol)), vecCol, idCol, fitted.centroids)
        .select(col(idCol), col(vecCol), col("cluster"))
        .repartition(col("cluster")))
    val biggest = asg.groupBy(col("cluster")).count()
      .agg(max(col("count"))).first().getLong(0)
    if (biggest > maxClusterForPairs)
      throw new IllegalStateException(
        s"semanticPurge: largest cluster has $biggest members " +
          s"(> maxClusterForPairs=$maxClusterForPairs); the within-cluster " +
          s"pair join would be quadratic in that. Raise k (currently $k) so " +
          "clusters shrink, or raise the gauge knowingly.")
    // Distinct column names on each side: a self-join condition written as
    // a("cluster") === b("cluster") resolves BOTH sides to the same
    // attribute (Spark's self-join ambiguity) and collapses to `true`,
    // silently turning the bounded within-cluster join into a corpus-wide
    // cross join. KmeansOpsSpec gates the plan for the equi-join.
    val a = asg.select(col("cluster").as("_graft_cla"),
      col(idCol).as("_graft_ida"), col(vecCol).as("_graft_va"))
    val b = asg.select(col("cluster").as("_graft_clb"),
      col(idCol).as("_graft_idb"), col(vecCol).as("_graft_vb"))
    val purged = a.join(b,
        col("_graft_cla") === col("_graft_clb") &&
          col("_graft_ida") < col("_graft_idb"))
      .filter(cosine(col("_graft_va"), col("_graft_vb")) >= minCos)
      .select(col("_graft_idb").as(idCol))
      .distinct()
    asg.select(col(idCol), col("cluster"))
      .join(purged.withColumn("_graft_hit", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(!col("_graft_hit"), lit(true)).as("kept"))
  }
}
