package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity corpus (SURVEY §2.3 E39-E40, E52-E53, E67 + the ANN
  * extension surface) over the `embeddings` fixture (`array<float>`,
  * length 64): cosine/L2/KNN, SRP buckets, bucket-local near-dup, IVF
  * centroid build and single-probe IVF search.
  *
  * Scale design: the brute-force paths bound one side (a broadcast-able
  * query subset) so the join is broadcast-nested-loop over a small side —
  * never an unbounded O(n²) cross join. The SRP-bucket path is the scale
  * story: vectors meet through a shuffle on their LSH bucket id, so work is
  * bucket-local and grows linearly with data for fixed bucket occupancy.
  * Ranks are computed over ROUNDED similarity (6 dp) with vec_id
  * tie-breaks, so a last-ulp float divergence between engines cannot
  * reorder results.
  */
object VectorQueries {

  // Vector math is per-row compute: spread single-row-group inputs across
  // cores (no-op on already-parallel inputs).
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.parallel(Tables(s, dir, name))

  /** q108's committed batch-1 SRP band ledger (even vec_ids = "yesterday's
    * corpus"), keyed by input dir — the same build-once-per-dir fixture
    * discipline (and Bench prewarm hook) as TextQueries.q104Ledger. */
  private val q108Ledgers =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q108Ledger(s: SparkSession, dir: String): String = q108Ledgers.synchronized {
    q108Ledgers.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_q108_ledger")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }))
      val path = root.resolve("bands").toString
      val batch1 = Tables(s, dir, "embeddings").filter(col("vec_id") % 2 === 0)
      graft.operators.SrpOps.incrementalNeardup(
        s, batch1, "embedding", "vec_id", path,
        nBands = 4, bitsPerBand = 10, maxBucket = 200, minCos = 0.35)
        .commitLedger()
      path
    })
  }

  /** q161's committed PQ artifact store (even vec_ids = "yesterday's
    * corpus": codebooks + coarse quantizer fitted on them, their codes
    * committed as the 'base' epoch, construction pin written first),
    * keyed by input dir — the same build-once-per-dir fixture discipline
    * (and Bench prewarm hook) as [[q108Ledger]]. */
  private val q161Stores =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def ensureQ161Store(s: SparkSession, dir: String): String = q161Stores.synchronized {
    q161Stores.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_q161_pq")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }))
      val path = root.resolve("pq").toString
      val batch1 = Tables(s, dir, "embeddings").filter(col("vec_id") % 2 === 0)
      graft.operators.PqOps.writePqArtifacts(
        s, batch1, "embedding", "vec_id", path,
        m = 4, kCodes = 8, iters = 1, coarseK = 4, coarseIters = 1)
      path
    })
  }

  /** q119's committed batch-1 semantic ledger (even vec_ids = "yesterday's
    * corpus", model pinned at their fit), keyed by input dir — the same
    * build-once-per-dir fixture discipline (and Bench prewarm hook) as
    * [[q108Ledger]]. */
  private val q119Ledgers =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q119Ledger(s: SparkSession, dir: String): String = q119Ledgers.synchronized {
    q119Ledgers.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_q119_ledger")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }))
      val path = root.resolve("clusters").toString
      val batch1 = Tables(s, dir, "embeddings").filter(col("vec_id") % 2 === 0)
      graft.operators.KmeansOps.incrementalSemantic(
        s, batch1, "embedding", "vec_id", path, k = 8, iters = 2, minCos = 0.4)
        .commitLedger()
      path
    })
  }

  // DuckDB double-cast vector + dot/norm fragments (lockstep with
  // VectorFunctions: left-to-right IEEE-double folds, rounded at 6 dp).
  private val VecSql = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))"
  private def cosSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E39 cosine similarity: bounded query side × all candidates,
    // thresholded. The query side is broadcast (50 rows).
    "q55_cosine_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("vid"), col("embedding").as("cv"))
      c.join(broadcast(q), col("qid") < col("vid"))
        .select(col("qid"), col("vid"), cosine(col("qv"), col("cv")).as("cos"))
        .filter(col("cos") > 0.3)
    }),

    // E40 brute-force top-k nearest neighbors (k=5) for 20 query vectors.
    "q56_knn_bruteforce" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.select(col("vec_id").as("vid"), col("embedding").as("cv"))
      val scored = c.join(broadcast(q), col("qid") =!= col("vid"))
        .select(col("qid"), col("vid"), cosine(col("qv"), col("cv")).as("cos"))
      // Bounded-buffer grouped top-k (E76), not a per-query row_number
      // window: identical (cos desc, vid asc) pick, but the shuffle
      // carries ≤ 5 rows per query × partition instead of sorting each
      // query's full candidate list in one task (round-14 hygiene swap;
      // hash-pinned unchanged by the oracle).
      graft.operators.TopKOps.groupedTopK(scored, "qid", "cos", "vid", 5)
        .select(col("qid"), col("vid"), col("cos"), col("rank"))
    }),

    // ANN scale path: sign-random-projection bucket per vector (8 bits).
    "q57_ann_srp_buckets" -> ((s, dir) => {
      t(s, dir, "embeddings").select(
        col("vec_id"),
        srpBucket(col("embedding"), 8).as("bucket"))
    }),

    // Embedding near-dup (re-pinned round 8): banded-SRP candidates +
    // exact cosine on candidates only. Through round 7 this ran the
    // single-table 8-bit bucket join — a FIXED 256-value bucket space, so
    // the self-join is n²/256 at any corpus size (measured 81× wall for
    // 10× vectors at 200 k; BASELINE.md round-6 vector table). The banded
    // construction keeps candidates bounded by maxBucket·nBands·n. 5
    // bands × 12 bits here — deliberately a DIFFERENT parameterization
    // than q106's 4×10, so the corpus pins the per-band plane-offset
    // packing at two widths (bandRecall at cos 0.99: ≈0.986 here, ≈0.981
    // for q106 — wider bands are more selective per band, recovered by
    // the extra band).
    "q58_embed_neardup" -> ((s, dir) => {
      val banded = graft.operators.SrpOps.bandedSrp(
        t(s, dir, "embeddings"), "embedding", "vec_id",
        nBands = 5, bitsPerBand = 12, maxBucket = 200)
      graft.operators.SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.35)
    }),

    // Embedding-cosine dedup CLUSTERS (re-pinned round 8): connected
    // components over the q58 banded-SRP pairs — SEMANTIC dedup's
    // transitive closure, the same completion GraphOps gives the
    // shingle-LSH pairs in q103 (a chain a~b, b~c of paraphrases is one
    // cluster even when cos(a,c) dips under the threshold). Banded pair
    // generation (q58's 5×12 construction; the 8-bit fixed-bucket join is
    // gone from the corpus), labeled by STAR CONTRACTION rather than
    // propagation: a 0.35-cosine graph chains weak links into genuinely
    // deep components once the corpus grows (measured: propagation's loud
    // maxIter refusal at 20 k vectors), which is the O(log² n) fallback's
    // home turf — and the fixed point (so the oracle) is identical, which
    // puts BOTH labeling algorithms under oracle coverage (q107 pins
    // propagation on the shallower 4×10 graph). Never a cross join, never
    // a driver union-find.
    "q105_embed_components" -> ((s, dir) => {
      val banded = graft.operators.SrpOps.bandedSrp(
        t(s, dir, "embeddings"), "embedding", "vec_id",
        nBands = 5, bitsPerBand = 12, maxBucket = 200)
      val pairs = graft.operators.SrpOps
        .neardupPairs(banded.bands, "embedding", "vec_id", 0.35)
        .select(col("vid_a"), col("vid_b"))
      graft.operators.GraphOps.connectedComponentsStars(pairs, "vid_a", "vid_b")
        .select(col("v").as("vec_id"), col("component"))
    }),

    // BANDED-SRP embedding near-dup (round 7) — the scale-safe construction
    // the round-6 measurement demanded: q58's single-table 8-bit bucket
    // join is n²/256 (measured 81× wall at 10× vectors, 200 k), while the
    // banded frame (operators/SrpOps: per-band bucket join + occupancy cap
    // + enforced saturation gauge + exact cosine on candidates only)
    // measured 1.4× wall for the same scale-up. Fixture-scale
    // parameterization: 4 bands × 10 bits — the width SrpOps.srpAuto
    // derives at the sf0.1 vector count (2 000/2.0 target ⇒ 2^10), pinned
    // explicitly because the oracle must restate one construction across
    // all oracle scales (srpAuto would pick 8 bits at sf0.01's 500
    // vectors). Occupancy measured 2.0 (sf0.01) / 3.7 (sf0.1), far under
    // the 24.0 default gauge.
    "q106_srp_neardup" -> ((s, dir) => {
      val banded = graft.operators.SrpOps.bandedSrp(
        t(s, dir, "embeddings"), "embedding", "vec_id",
        nBands = 4, bitsPerBand = 10, maxBucket = 200)
      graft.operators.SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.35)
    }),

    // Components over the q106 banded-SRP pairs (round 7): the scale-safe
    // twin of q105 — same distributed label propagation, but the pair
    // generation is the banded construction above instead of the
    // fixture-pinned 8-bit bucket join.
    "q107_srp_components" -> ((s, dir) => {
      val banded = graft.operators.SrpOps.bandedSrp(
        t(s, dir, "embeddings"), "embedding", "vec_id",
        nBands = 4, bitsPerBand = 10, maxBucket = 200)
      val pairs = graft.operators.SrpOps
        .neardupPairs(banded.bands, "embedding", "vec_id", 0.35)
        .select(col("vid_a"), col("vid_b"))
      graft.operators.GraphOps.connectedComponents(pairs, "vid_a", "vid_b")
        .select(col("v").as("vec_id"), col("component"))
    }),

    // AUTO-TUNED banded SRP (round 7) — the q102 pattern for vectors: the
    // engine derives BOTH construction knobs from stated requirements
    // (width from the occupancy target, band count from a 0.9 recall
    // target at cos 0.99) and the oracle restates the derived choice, so
    // the hash-compare pins the derivation as deterministic. The vec_id <
    // 500 subset makes the corpus size — and therefore the choice (8-bit
    // bands, 2 of them) — identical at every oracle scale; the loud
    // require converts a future drift into an error, not a silent
    // hash mismatch.
    "q109_srp_auto" -> ((s, dir) => {
      val vecs = t(s, dir, "embeddings").filter(col("vec_id") < 500)
      val auto = graft.operators.SrpOps.srpAuto(
        vecs, "embedding", "vec_id", targetRecall = 0.9)
      require(auto.bitsPerBand == 8 && auto.nBands == 2,
        s"q109's oracle pins 2 bands x 8 bits but the auto rules chose " +
          s"${auto.nBands} x ${auto.bitsPerBand} (n=${auto.vecCount}) — re-pin the oracle")
      graft.operators.SrpOps.neardupPairs(auto.banded.bands, "embedding", "vec_id", 0.35)
    }),

    // Incremental EMBEDDING near-dup (round 7) — the q104 ledger pattern in
    // vector space: even vec_ids are "yesterday's corpus" (their survivor
    // (band, bucket, vector) rows committed to a ledger fixture, built once
    // per dir); odd vec_ids are "today's embeddings", near-deduped against
    // the ledger and then within themselves. Unlike the MinHash twin,
    // every ledger collision is VERIFIED by exact cosine before it drops —
    // an SRP bucket space is small by construction, so collision-only
    // dropping would mass-purge on a full corpus (see
    // SrpOps.incrementalNeardup). Same 4×10 construction as q106.
    "q108_srp_incr_neardup" -> ((s, dir) => {
      val ledger = q108Ledger(s, dir)
      val batch2 = t(s, dir, "embeddings").filter(col("vec_id") % 2 === 1)
      graft.operators.SrpOps.incrementalNeardup(
        s, batch2, "embedding", "vec_id", ledger,
        nBands = 4, bitsPerBand = 10, maxBucket = 200, minCos = 0.35)
        .survivors.select(col("vec_id"))
    }),

    // Per-bucket centroids (the IVF coarse-quantizer build step): explode
    // to (bucket, dim, value), aggregate element-wise means. One shuffle on
    // (bucket, dim); output is buckets × 64 rows. 4-bit buckets so each
    // centroid averages a meaningful population.
    "q65_bucket_centroids" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(
          srpBucket(col("embedding"), 4).as("bucket"),
          posexplode(transform(col("embedding"), x => x.cast("double"))).as(Seq("i", "x")))
        .groupBy(col("bucket"), col("i"))
        .agg(round(avg(col("x")), 6).as("centroid"), count(lit(1)).as("n_vecs"))
    }),

    // L2 normalization (unit vectors — the standard pre-step before cosine
    // ANN): narrow per-row transform, flattened for comparison on a bounded
    // subset.
    "q66_l2_normalize" -> ((s, dir) => {
      val v = transform(col("embedding"), x => x.cast("double"))
      t(s, dir, "embeddings").filter(col("vec_id") < 50)
        .withColumn("v", v)
        .withColumn("norm",
          sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
        .select(col("vec_id"),
          posexplode(transform(col("v"), x => round(x / col("norm"), 6)))
            .as(Seq("i", "val")))
    }),

    // E80 int8 scalar quantization — the 4× memory cut that makes
    // billion-vector ANN fit executor RAM: per-vector (min, scale) affine
    // codes in 0..255, plus the per-dimension reconstruction error that
    // tells the user whether 8 bits suffice. Narrow projection (no
    // shuffle). Codes use floor(y + 0.5) instead of round(): identical
    // IEEE-double ops in both engines, so the INTEGER codes are
    // bit-identical (HALF_UP-vs-shortest-repr round() divergence can't
    // occur).
    "q94_embed_quantize" -> ((s, dir) => {
      val segTok = transform(col("embedding"), x => x.cast("double"))
      t(s, dir, "embeddings")
        .withColumn("v", segTok)
        .withColumn("mn", array_min(col("v")))
        .withColumn("scale", (array_max(col("v")) - col("mn")) / 255.0)
        .select(col("vec_id"), col("mn"), col("scale"),
          posexplode(col("v")).as(Seq("i", "x")))
        .withColumn("code",
          when(col("scale") === 0.0, lit(0L))
            .otherwise(floor((col("x") - col("mn")) / col("scale") + 0.5))
            .cast("int"))
        .select(col("vec_id"), col("i"), col("code"),
          (round(abs(col("x") - (col("mn") + col("code") * col("scale"))) * 1e6) / 1e6)
            .as("err"))
    }),

    // E67 IVF SEARCH — the query-time half of the q65 coarse quantizer;
    // see [[ivfSearch]]. Declared at nprobe=1; AccuracySpec asserts the
    // recall knob (recall rises with nprobe).
    "q81_ivf_search" -> ((s, dir) => ivfSearch(s, dir, nprobe = 1)),

    // L2 distance variant on a bounded pair set.
    "q59_l2_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val c = e.filter(col("vec_id") < 200)
        .select(col("vec_id").as("vid"), col("embedding").as("cv"))
      c.join(broadcast(q), col("qid") < col("vid"))
        .select(col("qid"), col("vid"), l2Distance(col("qv"), col("cv")).as("l2"))
    }),

    // E97 distributed k-means (Lloyd, k=8, 2 update rounds, deterministic
    // smallest-id seed): final assignment + 6-dp distance to the settled
    // centroid. Assignment is a zero-shuffle codegen'd projection; each
    // update is one map-side-combined (cluster, dim) aggregation — the
    // oracle replays the whole fit as unrolled SQL.
    "q115_kmeans" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      graft.operators.KmeansOps.fit(e, "embedding", "vec_id", k = 8, iters = 2)
        .assignments
    }),

    // E98 SemDeDup semantic dedup: q115's clusters, cosine pairs WITHIN a
    // cluster only, purge the larger id of any pair at cos >= 0.4
    // (keep-min-id, q52's embedding twin). One row per vector with its
    // cluster and keep verdict.
    "q116_semdedup" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      graft.operators.KmeansOps.semanticPurge(
        e, "embedding", "vec_id", k = 8, iters = 2, minCos = 0.4)
    }),

    // E100 derived-k SemDeDup (round 9) — the knob-free rule the round-8
    // verdict asked for: k = ceil(n / targetClusterSize), the family's
    // srpAuto twin. Pinned on the 500-vector subset (identical at every
    // oracle scale) at target 64 ⇒ k=8; the loud require converts a
    // future drift of the derivation into an error, not a silent hash
    // mismatch (the q109 discipline).
    "q118_semdedup_auto" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 500)
      val n = e.count()
      val k = graft.operators.KmeansOps.deriveK(n, 64L)
      require(k == 8,
        s"q118's oracle pins k=8 but deriveK chose $k (n=$n) — re-pin the oracle")
      graft.operators.KmeansOps.semanticPurgeAuto(
        e, "embedding", "vec_id", iters = 2, minCos = 0.4,
        targetClusterSize = Some(64L), knownCount = Some(n))
    }),

    // E101 incremental SemDeDup (round 9) — the q104/q108 ledger pattern
    // in cluster space: even vec_ids are "yesterday's corpus" (model
    // FITTED and PINNED on them, their purge survivors' (cluster, vector)
    // rows committed to a ledger fixture, built once per dir); odd
    // vec_ids are "today's crawl", assigned against the PINNED centroids
    // (never re-fit), dropped on a same-cluster cosine hit against the
    // ledger, then purged keep-min-id within their own clusters.
    "q119_incr_semdedup" -> ((s, dir) => {
      val ledger = q119Ledger(s, dir)
      val batch2 = t(s, dir, "embeddings").filter(col("vec_id") % 2 === 1)
      graft.operators.KmeansOps.incrementalSemantic(
        s, batch2, "embedding", "vec_id", ledger, k = 8, iters = 2, minCos = 0.4)
        .survivors.select(col("vec_id"))
    }),

    // E133 two-level (IVF-style) k-means (round 12) — the shape
    // deriveK's refusal names once a flat quantizer outgrows its 2^20
    // packing bound: 3 coarse cells (flat Lloyd), then 3 fine clusters
    // fitted WITHIN every cell simultaneously (one cell-equi-join per
    // round, never a per-cell driver loop). Output pins the full
    // hierarchy: cell, the global leaf label cell*k2+fcl, and the 6-dp
    // distance to the settled fine centroid — the oracle replays both
    // levels as unrolled SQL.
    "q148_kmeans_twolevel" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      graft.operators.KmeansOps.fitTwoLevel(
        e, "embedding", "vec_id", k1 = 3, k2 = 3, iters = 1).assignments
    }),

    // E139 product quantization (round 12): 4 subspaces × 8 codes over
    // the dim-64 vectors — all 4 codebooks fitted simultaneously (one
    // sub-equi-join per Lloyd round, the E133 fine-fit discipline with
    // the subspace as the cell), corpus encoded to (id, sub, code) rows
    // at 64× compression. The oracle replays the per-subspace fit and
    // the final arg-min as unrolled SQL.
    "q156_pq_encode" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val model = graft.operators.PqOps.fitPq(
        e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
      graft.operators.PqOps.encode(e, "embedding", "vec_id", model)
    }),

    // E140 ADC batch search over the PQ codes: 5 queries, each scored
    // against every candidate as the SUM of 4 table lookups (the query
    // stays exact, the corpus never re-reads a raw vector), top-5 per
    // query by (squared distance asc, id asc) via the bounded-buffer
    // grouped top-k.
    "q157_pq_adc_search" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val model = graft.operators.PqOps.fitPq(
        e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
      val codes = graft.operators.PqOps.encode(e, "embedding", "vec_id", model)
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding"))
      graft.operators.PqOps.adcSearch(
        codes, "vec_id", queries, "qid", "embedding", model, topN = 5)
    }),

    // E142 IVFADC (round 12): the paper's full system — the coarse
    // quantizer (8 k-means cells) restricts which codes a query meets,
    // ADC ranks within the probed cell. The flat q157 sums lookups for
    // EVERY candidate; here the per-query scan is the probed cell's
    // population (~n/8). Both levels + the codebooks restated in SQL.
    "q159_ivfadc_search" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      val model = graft.operators.PqOps.fitPq(
        e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
      // Materialized once (the q166/q167 fixture discipline, round 15):
      // the lazy encode chain otherwise re-derives the full fit lineage
      // inside the search's scored join — exactly what the stored-
      // artifact path gets for free from its parquet codes. encodeAttached
      // (round 17) fuses the cell assignment into the encode projection —
      // the old attachCells call joined two projections of the same scan.
      val codes = graft.Tables.materialize(graft.operators.PqOps.encodeAttached(
        e, "embedding", "vec_id", model, coarse.centroids))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding"))
      graft.operators.PqOps.ivfAdcSearch(
        codes, "cell", "vec_id", queries, "qid", "embedding",
        model, coarse.centroids, topN = 5)
    }),

    // E142 at nprobe = 2 (round 13): each query unions its TWO nearest
    // coarse cells before the same ADC — the recall/cost knob the
    // single-probe q159 leaves at its cheapest point. A candidate lives
    // in exactly one cell, so the union never double-scores; the oracle
    // restates the 2-best probe as a row_number <= 2 over (6-dp L2
    // distance, cell) against the settled centroids.
    "q160_ivfadc_nprobe" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      val model = graft.operators.PqOps.fitPq(
        e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
      val codes = graft.Tables.materialize(graft.operators.PqOps.encodeAttached(
        e, "embedding", "vec_id", model, coarse.centroids))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding"))
      graft.operators.PqOps.ivfAdcSearch(
        codes, "cell", "vec_id", queries, "qid", "embedding",
        model, coarse.centroids, topN = 5, nprobe = 2)
    }),

    // E143 incremental PQ encode (round 13): even vec_ids are
    // "yesterday's corpus" — fitted, encoded and committed as the 'base'
    // epoch of a pinned artifact store (the fixture); odd vec_ids are
    // "today's crawl", encoded against those PINNED codebooks (the E101
    // fitted-once discipline — never re-fit per batch) through the real
    // epoch-replay ledger API. The result is the corpus-lifetime code
    // view; the oracle replays the even-only fit and the all-ids encode
    // as unrolled SQL.
    "q161_pq_incr_encode" -> ((s, dir) => {
      val store = ensureQ161Store(s, dir)
      val batch2 = t(s, dir, "embeddings").filter(col("vec_id") % 2 === 1)
      graft.operators.PqOps.incrementalPqEncode(
          s, batch2, "embedding", "vec_id", store, epochToken = "b2")
        .codes.select(col("vec_id"), col("sub"), col("code"), col("dist"))
    }),

    // E144 residual PQ (round 13): Jégou 2011's ACTUAL IVFADC quantizes
    // the residual v − coarseCentroid(cell(v)), not the raw vector — the
    // cell id already says where the vector coarsely sits, so all m
    // codes describe the within-cell offset. The oracle recomputes the
    // residual table from the same coarse fit and replays the full PQ
    // chain over it.
    "q162_pq_residual_encode" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      // res feeds the fit AND the encode — materialize once (round 15).
      val res = graft.Tables.materialize(graft.operators.PqOps.residuals(
        e, "embedding", "vec_id", coarse.centroids))
      val model = graft.operators.PqOps.fitPq(
        res, "residual", "vec_id", m = 4, kCodes = 8, iters = 1)
      graft.operators.PqOps.encode(res, "residual", "vec_id", model)
    }),

    // E145 IVFADC+R (round 13): the two-stage search — IVFADC's code-
    // domain shortlist (top-20, nprobe=2) re-ranked by the EXACT 6-dp L2
    // over only the Q × 20 shortlisted raw vectors, cut to top-5. The
    // exact pass is workload-sized: its cost is independent of n.
    "q163_ivfadc_rerank" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      val model = graft.operators.PqOps.fitPq(
        e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
      val codes = graft.Tables.materialize(graft.operators.PqOps.encodeAttached(
        e, "embedding", "vec_id", model, coarse.centroids))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding"))
      val short = graft.operators.PqOps.ivfAdcSearch(
        codes, "cell", "vec_id", queries, "qid", "embedding",
        model, coarse.centroids, topN = 20, nprobe = 2)
      graft.operators.PqOps.refine(
        short, e, "embedding", "vec_id", queries, "qid", topN = 5)
    }),

    // E144 completed (round 14): residual-aware IVFADC SEARCH — q162's
    // residual codes actually searched, per Jégou §IV.B: the ADC lookup
    // table is residualized PER (query, probed cell) — for probed cell
    // ℓ the query contributes q − coarseCentroid(ℓ) — and a candidate
    // in cell ℓ is scored only against that cell's entries. nprobe = 2
    // on purpose: each query carries TWO residualized LUTs, so the
    // per-(query, cell) structure is what the oracle hash pins (at
    // nprobe = 1 a raw-LUT bug could hide behind a single shared cell).
    "q164_ivfadc_residual" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      // The residual table feeds THREE consumers (the fit, the encode,
      // and the cell side of attachCells) — materialize it once, and the
      // codes once more for the search (round 15, the q166 discipline).
      val res = graft.Tables.materialize(graft.operators.PqOps.residuals(
        e, "embedding", "vec_id", coarse.centroids))
      val model = graft.operators.PqOps.fitPq(
        res, "residual", "vec_id", m = 4, kCodes = 8, iters = 1)
      // The residual frame already carries its cell: encodeWithCell
      // (round 17) keeps it through the encode projection instead of
      // re-joining the frame with its own projection.
      val codes = graft.Tables.materialize(graft.operators.PqOps.encodeWithCell(
        res, "residual", "vec_id", model, "cell"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding"))
      graft.operators.PqOps.ivfAdcSearchResidual(
        codes, "cell", "vec_id", queries, "qid", "embedding",
        model, coarse.centroids, topN = 5, nprobe = 2)
    }),

    // E147 OPQ-lite (round 14): variance-balanced subspace permutation —
    // dims ranked by 6-dp variance are dealt round-robin across the m
    // subspaces before the UNCHANGED fit/encode chain, so no single
    // codebook carries all the corpus's spread (Ge 2013's eigenvalue-
    // allocation move, restricted to the engine-portable permutation).
    // The oracle recomputes the variance ranking, rebuilds the permuted
    // vectors, and replays the PQ chain over them.
    "q165_pq_balanced_perm" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val perm = graft.operators.PqOps.balancedPerm(e, "embedding", m = 4)
      val pe = graft.operators.PqOps.applyPerm(e, "embedding", perm, "pv")
        .select(col("vec_id"), col("pv"))
      // The permuted frame feeds both fit actions and the encode —
      // checkpoint once per run (round 17).
      val pem = graft.Tables.materialize(pe)
      val model = graft.operators.PqOps.fitPq(
        pem, "pv", "vec_id", m = 4, kCodes = 8, iters = 1)
      graft.operators.PqOps.encode(pem, "pv", "vec_id", model)
    }),

    // E148 re-rank with source coding (round 14, ICASSP 2011): a SECOND,
    // finer PQ (m2=8) fitted on the stage-1 reconstruction errors; the
    // IVFADC shortlist (top-20, nprobe=2) is re-scored against the
    // two-level decode x̂₂ = x̂₁ + ê₂ by exact 6-dp L2 and cut to
    // top-5 — the q163 two-stage shape with NO raw corpus vector in the
    // query path (at 10^12 vectors the raw store is the piece this
    // drops). The oracle replays both fits, both decodes, and the
    // element-wise sum.
    "q166_pq_refine_codes" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      val model = graft.operators.PqOps.fitPq(
        e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
      // codes/errs/rcodes each feed 2-3 downstream consumers (the
      // shortlist search + both re-rank decode levels) — materialize
      // once, exactly what the stored-artifact path gets for free.
      // Round 17: the cell rides every stage's own projection
      // (encodeAttached → errs-with-cell → encodeWithCell) instead of
      // three attachCells joins against the same coarse assignment.
      val codes = graft.Tables.materialize(graft.operators.PqOps.encodeAttached(
        e, "embedding", "vec_id", model, coarse.centroids))
      val errs = graft.Tables.materialize(
        graft.operators.PqOps.reconstructionErrorsWithCell(
          e, "embedding", "vec_id", model, codes))
      val rmodel = graft.operators.PqOps.fitPq(
        errs, "_graft_err", "vec_id", m = 8, kCodes = 8, iters = 1)
      val rcodes = graft.Tables.materialize(graft.operators.PqOps.encodeWithCell(
        errs, "_graft_err", "vec_id", rmodel, "cell"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding"))
      val short = graft.operators.PqOps.ivfAdcSearch(
        codes, "cell", "vec_id", queries, "qid", "embedding",
        model, coarse.centroids, topN = 20, nprobe = 2)
      val arts = graft.operators.PqOps.PqArtifacts(
        model, coarse.centroids, codes,
        refinement = Some(rmodel), rcodes = Some(rcodes))
      graft.operators.PqOps.refineFromCodes(
        arts, short, "vec_id", queries, "qid", "embedding",
        topN = 5, nprobe = 2)
    }),

    // E149 store audit (round 14): per-cell population + decode
    // distortion straight from the stored codes' dist columns — the
    // 10^12-vector store's health report without one raw-vector read:
    // Σ_sub dist² IS ‖v − x̂‖², so hot cells (nprobe scan cost) and
    // badly-described cells (quantization quality) fall out of two
    // aggregations over the code artifact; r_mean_sq_err is the error
    // left AFTER the E148 two-level decode, per cell.
    "q167_pq_store_audit" -> ((s, dir) => {
      // The corpus feeds SIX actions here (both fit seeds and updates,
      // the codes build, the error source) — checkpoint it once per run
      // (a localCheckpoint never matches across runs, unlike persist,
      // so every bench invocation still computes from the parquet).
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      val model = graft.operators.PqOps.fitPq(
        e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
      val codes = graft.Tables.materialize(graft.operators.PqOps.encodeAttached(
        e, "embedding", "vec_id", model, coarse.centroids))
      val errs = graft.Tables.materialize(
        graft.operators.PqOps.reconstructionErrorsWithCell(
          e, "embedding", "vec_id", model, codes))
      val rmodel = graft.operators.PqOps.fitPq(
        errs, "_graft_err", "vec_id", m = 8, kCodes = 8, iters = 1)
      val rcodes = graft.operators.PqOps.encodeWithCell(
        errs, "_graft_err", "vec_id", rmodel, "cell")
      val arts = graft.operators.PqOps.PqArtifacts(
        model, coarse.centroids, codes,
        refinement = Some(rmodel), rcodes = Some(rcodes))
      graft.operators.PqOps.pqAudit(arts, "vec_id")
    }),

    // E150 hot-cell split (round 14): the act-on-the-audit maintenance
    // — every cell whose population exceeds ⌈n/10⌉ (mean is n/8, so at
    // least one cell is always hot) splits into ⌈pop/maxPop⌉ children
    // by a LOCAL per-cell k-means (seeds = the k smallest ids, one
    // Lloyd round); cold cells and their members are untouched, child 0
    // keeps the parent id, children ≥ 1 number densely after the
    // table in (parent, child) order — empty children RESERVE their id
    // (the numbering is structural, not data-dependent).
    "q168_cell_rebalance" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      val asg = graft.operators.KmeansOps.assign(
          e.select(col("vec_id"), col("embedding")),
          "embedding", "vec_id", coarse.centroids)
        .select(col("vec_id"), col("embedding"), col("cluster"))
      val maxPop = math.ceil(e.count() / 10.0).toLong
      graft.operators.KmeansOps.splitHotCells(
        asg, "embedding", "vec_id", "cluster", coarse.centroids,
        maxPop, iters = 1).assignments
    }),

    // E151 residual-store rebalance (round 15, closing the round-14
    // declared edge): the q168 hot-cell split applied to a RESIDUAL code
    // table — q162's codes quantize v − coarseCentroid(cell), so every
    // SPLIT cell's member (child 0's centroid settles too) re-encodes
    // against its DECLARED child centroid with the PINNED codebooks,
    // while cold cells' code rows pass through byte-identical. Cost ∝
    // hot members, never the corpus. Output: the rebuilt store's code
    // table (vec_id, cell, sub, code, dist).
    "q169_residual_rebalance" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      val res = graft.Tables.materialize(graft.operators.PqOps.residuals(
        e, "embedding", "vec_id", coarse.centroids))
      val model = graft.operators.PqOps.fitPq(
        res, "residual", "vec_id", m = 4, kCodes = 8, iters = 1)
      val codes = graft.Tables.materialize(graft.operators.PqOps.encodeWithCell(
        res, "residual", "vec_id", model, "cell"))
      val asg = res.select(col("vec_id"), col("cell").as("cluster"))
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      val maxPop = math.ceil(e.count() / 10.0).toLong
      val split = graft.operators.KmeansOps.splitHotCells(
        asg, "embedding", "vec_id", "cluster", coarse.centroids,
        maxPop, iters = 1)
      val hotSeq = split.hotCells.toSeq.sorted.map(Integer.valueOf)
      val moved = split.assignments.withColumnRenamed("cell", "ncell")
        .join(res.filter(col("cell").isin(hotSeq: _*))
          .select(col("vec_id")), Seq("vec_id"))
        .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      val res2 = graft.operators.PqOps.residualsAt(
        moved, "embedding", "vec_id", "ncell", split.centroids)
      val hot = graft.operators.PqOps.encodeWithCell(
        res2, "residual", "vec_id", model, "cell")
      val out = Seq("vec_id", "cell", "sub", "code", "dist").map(col)
      codes.filter(!col("cell").isin(hotSeq: _*)).select(out: _*)
        .unionByName(hot.select(out: _*))
    }),

    // E153 takedown-aware search (round 15): the searchable contract of
    // pqStoreDelete — after a right-to-erasure pass removes a denylist's
    // code rows (vec_id % 97 = 3 here), IVFADC over the surviving store
    // ranks EXACTLY as if the deleted candidates never existed: no
    // re-fit, no re-encode, the erased ids simply absent from every
    // shortlist (a deleted id may still ASK as a query — only its
    // candidacy is gone). The file-level op (leaf swaps, pins, audit,
    // both namespaces) is spec-gated in PqOpsSpec/MaintenanceOpsSpec;
    // this pins the post-delete ranking against the oracle.
    "q170_takedown_search" -> ((s, dir) => {
      val e = graft.Tables.materialize(t(s, dir, "embeddings"))
      val coarse = graft.operators.KmeansOps.fit(
        e, "embedding", "vec_id", k = 8, iters = 1)
      val model = graft.operators.PqOps.fitPq(
        e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1)
      val codes = graft.Tables.materialize(
        graft.operators.PqOps.encodeAttached(
          e, "embedding", "vec_id", model, coarse.centroids)
        .filter(col("vec_id") % 97 =!= 3))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding"))
      graft.operators.PqOps.ivfAdcSearch(
        codes, "cell", "vec_id", queries, "qid", "embedding",
        model, coarse.centroids, topN = 5, nprobe = 2)
    })
  )

  /** IVF search: assign each query vector (vec_id < 5) to its `nprobe`
    * nearest centroids (broadcast 16-row centroid table, built as in q65),
    * then rank ONLY those buckets' vectors by native codegen'd cosine. At
    * 100 TB this is the shape that replaces brute force: the probe is
    * O(k_centroids) per query and the scan touches nprobe bucket
    * partitions, not the corpus. `nprobe` is the recall knob — each extra
    * probed bucket recovers neighbors the nearest centroid missed at the
    * cost of one more bucket's candidates. Centroid elements are rounded
    * at 6 dp before the probe cosine (as in q65) so both engines rank
    * identical centroids; all ranks use rounded cosine + id tie-breaks.
    */
  def ivfSearch(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1: $nprobe")
    val vecD = transform(col("embedding"), x => x.cast("double"))
    val bucketed = t(s, dir, "embeddings").select(
      col("vec_id"), col("embedding"),
      srpBucket(col("embedding"), 4).as("bucket"))
      .persist()
    bucketed.count() // eager: SRP buckets compute once across build+probe+search
    val cent = bucketed
      .select(col("bucket"), posexplode(vecD).as(Seq("i", "x")))
      .groupBy(col("bucket"), col("i")).agg(round(avg(col("x")), 6).as("m"))
      .groupBy(col("bucket"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        st => st.getField("m")).as("centroid"))
    // Probe: tiny (5 queries × 16 centroids) — interpreted HOF math is fine.
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val qvD = transform(col("qv"), x => x.cast("double"))
    val pcos = round(dotD(qvD, col("centroid")) /
      (sqrt(dotD(qvD, qvD)) * sqrt(dotD(col("centroid"), col("centroid")))), 6)
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("pcos").desc, col("bucket"))
    val probe = bucketed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("pcos", pcos)
      .withColumn("prn", row_number().over(wProbe)).filter(col("prn") <= nprobe)
      .select(col("qid"), col("qv"), col("bucket"))
    // Search: only the probed buckets, native codegen'd cosine. A vector
    // can appear through at most one (qid, bucket) pair, so no dedup is
    // needed before ranking.
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    probe
      .join(bucketed.select(col("bucket"), col("vec_id").as("vid"),
        col("embedding").as("cv")), Seq("bucket"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
  }

  val oracle: Map[String, String] = {
    def srpBucketSql(bits: Int): String =
      s"""CAST(list_sum(list_transform(range(0, $bits), j ->
           CASE WHEN list_sum(list_transform(range(0, 64), i ->
                  CAST(((j * 64 + i) * 2654435761) % 97 - 48 AS DOUBLE) * v[i + 1])) >= 0
                THEN CAST(power(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END))
         AS BIGINT)"""
    // The BANDED construction (q106/q107): band b's value packs the sign
    // bits of hyperplanes b*bits .. b*bits+bits-1 — identical to
    // (srpBucket(v, nBands*bits) >> b*bits) & (2^bits - 1), restated
    // per-band so every summed power of two stays far under 2^53 (the
    // DOUBLE-exact integer ceiling list_sum must respect). The QUALIFY
    // window restates the per-(band, value) occupancy cap.
    def srpBandsSqlF(pfx: String, filt: String, nBands: Int, bits: Int, maxBucket: Int): String =
      s"""${pfx}e AS (SELECT vec_id, $VecSql AS v FROM embeddings WHERE $filt),
          ${pfx}bands AS (
            SELECT vec_id, v, CAST(b AS INT) AS b,
                   CAST(list_sum(list_transform(range(0, $bits), r ->
                     CASE WHEN list_sum(list_transform(range(0, 64), i ->
                            CAST((((b * $bits + r) * 64 + i) * 2654435761) % 97 - 48 AS DOUBLE)
                              * v[i + 1])) >= 0
                          THEN CAST(power(2, r) AS BIGINT) ELSE CAST(0 AS BIGINT) END))
                     AS BIGINT) AS bv
            FROM ${pfx}e, unnest(range(0, $nBands)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bv) <= $maxBucket)"""
    def srpBandsSql(nBands: Int, bits: Int, maxBucket: Int): String =
      srpBandsSqlF("", "TRUE", nBands, bits, maxBucket)
    // q115/q116/q118/q119: the whole k-means fit unrolled — c0 =
    // smallest-id seed, then per round an assignment CTE (arg-min of 6-dp
    // L2, ties to the smaller cluster) and an update CTE (6-dp per-dim
    // mean; LEFT JOIN keeps the previous centroid for clusters that
    // captured nothing), ending in `${pfx}af`, the final assignment
    // against the settled centroids. `pfx`/`where` parameterize the CTE
    // names and the fit population (the srpBandsSqlF discipline) so q119
    // can fit on the even half only; `assignAgainst` restates the pinned-
    // model assignment of a DIFFERENT population against those settled
    // centroids. Lockstep rule with KmeansOps: change both or neither.
    def l2Sql(a: String, b: String): String =
      s"round(sqrt(list_sum(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))), 6)"
    def assignAgainst(name: String, src: String, cents: String, withDist: Boolean): String = {
      val d = if (withDist) s", ${l2Sql(s"$src.v", s"$cents.c")} AS d" else ""
      val dOut = if (withDist) ", d" else ""
      s"""$name AS (SELECT vec_id, v, cl$dOut FROM (
           SELECT $src.vec_id, $src.v, $cents.cl$d,
                  row_number() OVER (PARTITION BY $src.vec_id
                    ORDER BY ${l2Sql(s"$src.v", s"$cents.c")}, $cents.cl) AS rn
           FROM $src CROSS JOIN $cents) WHERE rn = 1)"""
    }
    def kmeansCtesF(pfx: String, where: String, k: Int, iters: Int): String = {
      val sb = new StringBuilder
      sb ++= s"""${pfx}e AS (SELECT vec_id, $VecSql AS v FROM embeddings WHERE $where),
        ${pfx}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v AS c
               FROM (SELECT vec_id, v FROM ${pfx}e ORDER BY vec_id LIMIT $k))"""
      for (r <- 0 until iters) {
        sb ++= ",\n" + assignAgainst(s"${pfx}a$r", s"${pfx}e", s"${pfx}c$r", withDist = false)
        sb ++= s""",
          ${pfx}c${r + 1} AS (SELECT p.cl, coalesce(u.c, p.c) AS c
            FROM ${pfx}c$r p LEFT JOIN (
              SELECT cl, list(m ORDER BY j) AS c FROM (
                SELECT cl, j, round(avg(v[j]), 6) AS m
                FROM ${pfx}a$r, unnest(range(1, 65)) AS u(j) GROUP BY cl, j)
              GROUP BY cl) u ON u.cl = p.cl)"""
      }
      sb ++= ",\n" + assignAgainst(s"${pfx}af", s"${pfx}e", s"${pfx}c$iters", withDist = true)
      sb.toString
    }
    def kmeansCtes(k: Int, iters: Int): String = kmeansCtesF("", "TRUE", k, iters)
    // PQ (q156/q157): subvector slicing + per-subspace Lloyd, ending in
    // `af` = the final (vec_id, sub, code, dist) encoding against the
    // settled codebook `b$iters`. Subspace L2 runs over subDim dims.
    // Lockstep rule with PqOps: change both or neither.
    def pqL2Sql(a: String, b: String, subDim: Int): String =
      s"round(sqrt(list_sum(list_transform(range(1, ${subDim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))), 6)"
    def pqCtesF(pfx: String, m: Int, kCodes: Int, iters: Int, subDim: Int,
        fitWhere: String = "TRUE",
        srcSql: String = s"SELECT vec_id, $VecSql AS v FROM embeddings"): String = {
      def argmin(name: String, src: String, book: String, withDist: Boolean): String = {
        val d = if (withDist) s", ${pqL2Sql("s.sv", s"$book.c", subDim)} AS dist" else ""
        val dOut = if (withDist) ", dist" else ""
        s"""$name AS (SELECT vec_id, sub, sv, code$dOut FROM (
             SELECT s.vec_id, s.sub, s.sv, $book.code$d,
                    row_number() OVER (PARTITION BY s.vec_id, s.sub
                      ORDER BY ${pqL2Sql("s.sv", s"$book.c", subDim)}, $book.code) AS rn
             FROM $src s JOIN $book ON $book.sub = s.sub) WHERE rn = 1)"""
      }
      val sb = new StringBuilder
      // `fitWhere` restricts the FIT population (seeds + Lloyd rounds)
      // the q161 way — the final `af` encode always covers every vector
      // (the pinned-model assignAgainst discipline).
      sb ++= s"""${pfx}pe AS ($srcSql),
        ${pfx}subs AS (SELECT vec_id, CAST(u.s AS INT) AS sub,
                        v[u.s * $subDim + 1 : u.s * $subDim + $subDim] AS sv
                 FROM ${pfx}pe, unnest(range(0, $m)) AS u(s)),
        ${pfx}fsubs AS (SELECT * FROM ${pfx}subs WHERE $fitWhere),
        ${pfx}b0 AS (SELECT sub, CAST(rn - 1 AS INT) AS code, sv AS c FROM (
                 SELECT sub, sv,
                        row_number() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
                 FROM ${pfx}fsubs) WHERE rn <= $kCodes)"""
      for (r <- 0 until iters) {
        sb ++= ",\n" + argmin(s"${pfx}a$r", s"${pfx}fsubs", s"${pfx}b$r", withDist = false)
        sb ++= s""",
          ${pfx}b${r + 1} AS (SELECT p.sub, p.code, coalesce(u.c, p.c) AS c
            FROM ${pfx}b$r p LEFT JOIN (
              SELECT sub, code, list(m ORDER BY j) AS c FROM (
                SELECT a.sub, a.code, j, round(avg(a.sv[j]), 6) AS m
                FROM ${pfx}a$r a, unnest(range(1, ${subDim + 1})) AS u(j)
                GROUP BY a.sub, a.code, j)
              GROUP BY sub, code) u ON u.sub = p.sub AND u.code = p.code)"""
      }
      sb ++= ",\n" + argmin(s"${pfx}af", s"${pfx}subs", s"${pfx}b$iters", withDist = true)
      sb.toString
    }
    def pqCtes(m: Int, kCodes: Int, iters: Int, subDim: Int): String =
      pqCtesF("", m, kCodes, iters, subDim)
    Map(
      "q55_cosine_pairs" ->
        s"""WITH e AS (SELECT vec_id, $VecSql AS v FROM embeddings)
            SELECT q.vec_id AS qid, c.vec_id AS vid, ${cosSql("q.v", "c.v")} AS cos
            FROM e q JOIN e c ON q.vec_id < c.vec_id
            WHERE q.vec_id < 50 AND ${cosSql("q.v", "c.v")} > 0.3""",
      "q56_knn_bruteforce" ->
        s"""WITH e AS (SELECT vec_id, $VecSql AS v FROM embeddings),
            scored AS (
              SELECT q.vec_id AS qid, c.vec_id AS vid, ${cosSql("q.v", "c.v")} AS cos
              FROM e q JOIN e c ON q.vec_id <> c.vec_id
              WHERE q.vec_id < 20)
            SELECT qid, vid, cos, CAST(rank AS INT) AS rank FROM (
              SELECT qid, vid, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rank
              FROM scored)
            WHERE rank <= 5""",
      "q57_ann_srp_buckets" ->
        s"""SELECT vec_id, ${srpBucketSql(8)} AS bucket
            FROM (SELECT vec_id, $VecSql AS v FROM embeddings)""",
      // The banded 5×12 construction restated (the 8-bit fixed-bucket join
      // was retired round 8): capped bands → distinct candidate pairs →
      // exact cosine filter, mirroring SrpOps.neardupPairs at q58's
      // parameterization.
      "q58_embed_neardup" ->
        s"""WITH ${srpBandsSql(5, 12, 200)},
            pairs AS (
              SELECT DISTINCT a.vec_id AS vid_a, c.vec_id AS vid_b
              FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
              WHERE a.vec_id < c.vec_id)
            SELECT vid_a, vid_b, ${cosSql("x.v", "y.v")} AS cos
            FROM pairs JOIN e x ON x.vec_id = vid_a JOIN e y ON y.vec_id = vid_b
            WHERE ${cosSql("x.v", "y.v")} >= 0.35""",
      // q58's banded pair construction + the same recursive-CTE closure as
      // q103.
      "q105_embed_components" ->
        s"""WITH RECURSIVE ${srpBandsSql(5, 12, 200)},
            pairs AS (
              SELECT DISTINCT a.vec_id AS vid_a, c.vec_id AS vid_b
              FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
              WHERE a.vec_id < c.vec_id
                AND ${cosSql("a.v", "c.v")} >= 0.35),
            edges AS (
              SELECT vid_a AS src, vid_b AS dst FROM pairs
              UNION SELECT vid_b, vid_a FROM pairs),
            reach AS (
              SELECT src AS v, src AS r FROM edges
              UNION
              SELECT e2.src AS v, r.r
              FROM edges e2 JOIN reach r ON e2.dst = r.v)
            SELECT v AS vec_id, min(r) AS component FROM reach GROUP BY v""",
      // The banded construction restated: capped bands → distinct candidate
      // pairs → exact cosine filter, mirroring SrpOps.neardupPairs.
      "q106_srp_neardup" ->
        s"""WITH ${srpBandsSql(4, 10, 200)},
            pairs AS (
              SELECT DISTINCT a.vec_id AS vid_a, c.vec_id AS vid_b
              FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
              WHERE a.vec_id < c.vec_id)
            SELECT vid_a, vid_b, ${cosSql("x.v", "y.v")} AS cos
            FROM pairs JOIN e x ON x.vec_id = vid_a JOIN e y ON y.vec_id = vid_b
            WHERE ${cosSql("x.v", "y.v")} >= 0.35""",
      // q106's pair construction + the same recursive-CTE closure as q105.
      "q107_srp_components" ->
        s"""WITH RECURSIVE ${srpBandsSql(4, 10, 200)},
            pairs AS (
              SELECT DISTINCT a.vec_id AS vid_a, c.vec_id AS vid_b
              FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
              WHERE a.vec_id < c.vec_id
                AND ${cosSql("a.v", "c.v")} >= 0.35),
            edges AS (
              SELECT vid_a AS src, vid_b AS dst FROM pairs
              UNION SELECT vid_b, vid_a FROM pairs),
            reach AS (
              SELECT src AS v, src AS r FROM edges
              UNION
              SELECT e2.src AS v, r.r
              FROM edges e2 JOIN reach r ON e2.dst = r.v)
            SELECT v AS vec_id, min(r) AS component FROM reach GROUP BY v""",
      // The auto-derived construction (2 bands × 8 bits on the 500-vector
      // subset) restated — a changed derivation would hash-mismatch,
      // pinning both auto rules as deterministic (the q102 discipline).
      "q109_srp_auto" ->
        s"""WITH ${srpBandsSqlF("", "vec_id < 500", 2, 8, 200)},
            pairs AS (
              SELECT DISTINCT a.vec_id AS vid_a, c.vec_id AS vid_b
              FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv
              WHERE a.vec_id < c.vec_id)
            SELECT vid_a, vid_b, ${cosSql("x.v", "y.v")} AS cos
            FROM pairs JOIN e x ON x.vec_id = vid_a JOIN e y ON y.vec_id = vid_b
            WHERE ${cosSql("x.v", "y.v")} >= 0.35""",
      // Both halves restated: evens band + verified self-purge → ledger
      // rows (band, bucket, vector); odds drop on a cosine-VERIFIED ledger
      // collision, then self-purge. Mirrors SrpOps.incrementalNeardup.
      "q108_srp_incr_neardup" ->
        s"""WITH ${srpBandsSqlF("e_", "vec_id % 2 = 0", 4, 10, 200)},
            e_drops AS (
              SELECT DISTINCT c.vec_id AS drop_id
              FROM e_bands a JOIN e_bands c ON a.b = c.b AND a.bv = c.bv
              WHERE a.vec_id < c.vec_id AND ${cosSql("a.v", "c.v")} >= 0.35),
            eledger AS (
              SELECT b, bv, v FROM e_bands
              WHERE vec_id NOT IN (SELECT drop_id FROM e_drops)),
            ${srpBandsSqlF("o_", "vec_id % 2 = 1", 4, 10, 200)},
            hits AS (
              SELECT DISTINCT o.vec_id
              FROM o_bands o JOIN eledger l ON o.b = l.b AND o.bv = l.bv
              WHERE ${cosSql("o.v", "l.v")} >= 0.35),
            kept AS (
              SELECT * FROM o_bands
              WHERE vec_id NOT IN (SELECT vec_id FROM hits)),
            o_drops AS (
              SELECT DISTINCT c.vec_id AS drop_id
              FROM kept a JOIN kept c ON a.b = c.b AND a.bv = c.bv
              WHERE a.vec_id < c.vec_id AND ${cosSql("a.v", "c.v")} >= 0.35)
            SELECT vec_id FROM embeddings WHERE vec_id % 2 = 1
              AND vec_id NOT IN (SELECT vec_id FROM hits)
              AND vec_id NOT IN (SELECT drop_id FROM o_drops)""",
      // Same floor(y+0.5) code rule and round(x*1e6)/1e6 error idiom.
      "q94_embed_quantize" ->
        s"""WITH e AS (SELECT vec_id, $VecSql AS v FROM embeddings),
            m AS (SELECT vec_id, v, list_min(v) AS mn,
                    (list_max(v) - list_min(v)) / 255.0 AS scale FROM e),
            c AS (SELECT vec_id, CAST(j - 1 AS INT) AS i, v[j] AS x, mn, scale,
                    CAST(CASE WHEN scale = 0 THEN 0
                         ELSE floor((v[j] - mn) / scale + 0.5) END AS INT) AS code
                  FROM m, unnest(range(1, 65)) AS u(j))
            SELECT vec_id, i, code,
              round(abs(x - (mn + code * scale)) * 1e6) / 1e6 AS err
            FROM c""",
      "q65_bucket_centroids" ->
        s"""SELECT bucket, CAST(j - 1 AS INT) AS i,
              round(avg(val), 6) AS centroid, count(*) AS n_vecs
            FROM (SELECT bucket, j, v[j] AS val
                  FROM (SELECT ${srpBucketSql(4)} AS bucket, v
                        FROM (SELECT $VecSql AS v FROM embeddings)),
                       unnest(range(1, 65)) AS u(j))
            GROUP BY bucket, j""",
      "q66_l2_normalize" ->
        s"""WITH e AS (SELECT vec_id, $VecSql AS v FROM embeddings WHERE vec_id < 50),
              n AS (SELECT vec_id, v,
                      sqrt(list_sum(list_transform(v, x -> x * x))) AS norm FROM e)
            SELECT vec_id, CAST(j - 1 AS INT) AS i, round(v[j] / norm, 6) AS val
            FROM n, unnest(range(1, 65)) AS u(j)""",
      "q59_l2_pairs" ->
        s"""WITH e AS (SELECT vec_id, $VecSql AS v FROM embeddings)
            SELECT q.vec_id AS qid, c.vec_id AS vid,
                   round(sqrt(list_sum(list_transform(range(1, 65),
                         i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i])))), 6) AS l2
            FROM e q JOIN e c ON q.vec_id < c.vec_id
            WHERE q.vec_id < 10 AND c.vec_id < 200""",
      "q81_ivf_search" ->
        s"""WITH e AS (SELECT vec_id, $VecSql AS v FROM embeddings),
            b AS (SELECT vec_id, v, ${srpBucketSql(4)} AS bucket FROM e),
            cm AS (SELECT bucket, j, round(avg(v[j]), 6) AS m
                   FROM b, unnest(range(1, 65)) AS u(j) GROUP BY bucket, j),
            cent AS (SELECT bucket, list(m ORDER BY j) AS c FROM cm GROUP BY bucket),
            probe AS (
              SELECT qid, bucket FROM (
                SELECT q.vec_id AS qid, cent.bucket,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                         round(${dotSql("q.v", "cent.c")} /
                           (sqrt(${dotSql("q.v", "q.v")}) * sqrt(${dotSql("cent.c", "cent.c")})), 6) DESC,
                         cent.bucket) AS prn
                FROM b q CROSS JOIN cent WHERE q.vec_id < 5)
              WHERE prn = 1),
            scored AS (
              SELECT p.qid, c.vec_id AS vid, ${cosSql("q.v", "c.v")} AS cos
              FROM probe p
              JOIN b q ON q.vec_id = p.qid
              JOIN b c ON c.bucket = p.bucket AND c.vec_id <> p.qid)
            SELECT qid, vid, cos, CAST(rank AS INT) AS rank FROM (
              SELECT qid, vid, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rank
              FROM scored)
            WHERE rank <= 5""",
      "q115_kmeans" ->
        s"""WITH ${kmeansCtes(8, 2)}
            SELECT vec_id, cl AS cluster, d AS dist FROM af""",
      "q116_semdedup" ->
        s"""WITH ${kmeansCtes(8, 2)},
            purged AS (SELECT DISTINCT y.vec_id
              FROM af x JOIN af y ON x.cl = y.cl AND x.vec_id < y.vec_id
              WHERE ${cosSql("x.v", "y.v")} >= 0.4)
            SELECT af.vec_id, af.cl AS cluster,
                   purged.vec_id IS NULL AS kept
            FROM af LEFT JOIN purged ON purged.vec_id = af.vec_id""",
      // The derived construction (k=8 from 500/64 on the pinned subset)
      // restated — a changed derivation would hash-mismatch (the q109
      // discipline).
      "q118_semdedup_auto" ->
        s"""WITH ${kmeansCtesF("", "vec_id < 500", 8, 2)},
            purged AS (SELECT DISTINCT y.vec_id
              FROM af x JOIN af y ON x.cl = y.cl AND x.vec_id < y.vec_id
              WHERE ${cosSql("x.v", "y.v")} >= 0.4)
            SELECT af.vec_id, af.cl AS cluster,
                   purged.vec_id IS NULL AS kept
            FROM af LEFT JOIN purged ON purged.vec_id = af.vec_id""",
      // Both halves restated: evens fit the model (e_c2 = the settled,
      // pinned centroids) and self-purge into the ledger; odds assign
      // against e_c2, drop on a same-cluster cosine hit, then self-purge
      // keep-min-id. Mirrors KmeansOps.incrementalSemantic.
      "q119_incr_semdedup" ->
        s"""WITH ${kmeansCtesF("e_", "vec_id % 2 = 0", 8, 2)},
            e_drops AS (
              SELECT DISTINCT y.vec_id AS drop_id
              FROM e_af x JOIN e_af y ON x.cl = y.cl AND x.vec_id < y.vec_id
              WHERE ${cosSql("x.v", "y.v")} >= 0.4),
            eledger AS (
              SELECT cl, v FROM e_af
              WHERE vec_id NOT IN (SELECT drop_id FROM e_drops)),
            o AS (SELECT vec_id, $VecSql AS v FROM embeddings WHERE vec_id % 2 = 1),
            ${assignAgainst("oa", "o", "e_c2", withDist = false)},
            hits AS (
              SELECT DISTINCT oa.vec_id
              FROM oa JOIN eledger l ON oa.cl = l.cl
              WHERE ${cosSql("oa.v", "l.v")} >= 0.4),
            kept AS (
              SELECT * FROM oa
              WHERE vec_id NOT IN (SELECT vec_id FROM hits)),
            o_drops AS (
              SELECT DISTINCT c.vec_id AS drop_id
              FROM kept a JOIN kept c ON a.cl = c.cl AND a.vec_id < c.vec_id
              WHERE ${cosSql("a.v", "c.v")} >= 0.4)
            SELECT vec_id FROM embeddings WHERE vec_id % 2 = 1
              AND vec_id NOT IN (SELECT vec_id FROM hits)
              AND vec_id NOT IN (SELECT drop_id FROM o_drops)""",
      // Both levels unrolled: the coarse fit is kmeansCtes(3,1) ending in
      // af (the settled coarse assignment), then fine seeds = the 3
      // smallest ids per cell, one fine Lloyd round (assign by 6-dp L2
      // with ties to the smaller fcl, re-average per (cell, fcl, dim) at
      // 6 dp, LEFT JOIN keeps empty fine clusters), and the final fine
      // assignment. Lockstep rule with KmeansOps.fitTwoLevel: change
      // both or neither.
      "q148_kmeans_twolevel" ->
        s"""WITH ${kmeansCtes(3, 1)},
            f0 AS (SELECT cell, CAST(rn - 1 AS INT) AS fcl, v AS c FROM (
                     SELECT cl AS cell, v,
                            row_number() OVER (PARTITION BY cl ORDER BY vec_id) AS rn
                     FROM af) WHERE rn <= 3),
            fa0 AS (SELECT vec_id, v, cell, fcl FROM (
                     SELECT a.vec_id, a.v, a.cl AS cell, f.fcl,
                            row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY ${l2Sql("a.v", "f.c")}, f.fcl) AS rn
                     FROM af a JOIN f0 f ON f.cell = a.cl) WHERE rn = 1),
            f1 AS (SELECT p.cell, p.fcl, coalesce(u.c, p.c) AS c
                   FROM f0 p LEFT JOIN (
                     SELECT cell, fcl, list(m ORDER BY j) AS c FROM (
                       SELECT cell, fcl, j, round(avg(v[j]), 6) AS m
                       FROM fa0, unnest(range(1, 65)) AS u(j) GROUP BY cell, fcl, j)
                     GROUP BY cell, fcl) u
                   ON u.cell = p.cell AND u.fcl = p.fcl),
            faf AS (SELECT vec_id, cell, fcl, d FROM (
                     SELECT a.vec_id, a.cl AS cell, f.fcl,
                            ${l2Sql("a.v", "f.c")} AS d,
                            row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY ${l2Sql("a.v", "f.c")}, f.fcl) AS rn
                     FROM af a JOIN f1 f ON f.cell = a.cl) WHERE rn = 1)
            SELECT vec_id, cell, CAST(cell AS BIGINT) * 3 + fcl AS cluster, d AS dist
            FROM faf""",
      "q156_pq_encode" ->
        s"""WITH ${pqCtes(4, 8, 1, 16)}
            SELECT vec_id, sub, code, dist FROM af""",
      // The lookup table: per (query, sub, code) the SQUARED 6-dp
      // subspace distance; ADC = sum of the candidate's 4 lookups,
      // rounded 6 dp, top-5 per query (adc asc, id asc).
      "q157_pq_adc_search" ->
        s"""WITH ${pqCtes(4, 8, 1, 16)},
            lut AS (SELECT s.vec_id AS qid, s.sub, b1.code,
                           ${pqL2Sql("s.sv", "b1.c", 16)} * ${pqL2Sql("s.sv", "b1.c", 16)} AS part
                    FROM subs s JOIN b1 ON b1.sub = s.sub
                    WHERE s.vec_id < 5),
            scored AS (SELECT l.qid, a.vec_id, round(sum(l.part), 6) AS adc
                       FROM af a JOIN lut l ON l.sub = a.sub AND l.code = a.code
                       GROUP BY l.qid, a.vec_id)
            SELECT qid, CAST(rank AS INT) AS rank, vec_id, adc FROM (
              SELECT qid, vec_id, adc,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY adc, vec_id) AS rank
              FROM scored)
            WHERE rank <= 5""",
      // Coarse cells from kmeansCtes (af = the corpus assignment, which
      // IS the query probe — identical arg-min rule, queries drawn from
      // the corpus), codebooks/codes from the q-prefixed pqCtes; ADC
      // restricted to candidates sharing the query's cell.
      "q159_ivfadc_search" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("q", 4, 8, 1, 16)},
            lut AS (SELECT s.vec_id AS qid, s.sub, b.code,
                           ${pqL2Sql("s.sv", "b.c", 16)} * ${pqL2Sql("s.sv", "b.c", 16)} AS part
                    FROM qsubs s JOIN qb1 b ON b.sub = s.sub
                    WHERE s.vec_id < 5),
            qc AS (SELECT vec_id AS qid, cl AS qcell FROM af WHERE vec_id < 5),
            scored AS (SELECT l.qid, a.vec_id, round(sum(l.part), 6) AS adc
                       FROM qaf a
                       JOIN af c ON c.vec_id = a.vec_id
                       JOIN qc ON qc.qcell = c.cl
                       JOIN lut l ON l.qid = qc.qid
                                 AND l.sub = a.sub AND l.code = a.code
                       GROUP BY l.qid, a.vec_id)
            SELECT qid, CAST(rank AS INT) AS rank, vec_id, adc FROM (
              SELECT qid, vec_id, adc,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY adc, vec_id) AS rank
              FROM scored)
            WHERE rank <= 5""",
      // q159 at nprobe = 2: the probe is the TWO nearest settled
      // centroids per query (row_number <= 2 over the 6-dp L2 with the
      // cell tie-break — the n-best extension of the assignAgainst
      // rule); a candidate lives in exactly one cell, so the two probed
      // cells' candidate sets union disjointly before the same ADC.
      "q160_ivfadc_nprobe" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("q", 4, 8, 1, 16)},
            lut AS (SELECT s.vec_id AS qid, s.sub, b.code,
                           ${pqL2Sql("s.sv", "b.c", 16)} * ${pqL2Sql("s.sv", "b.c", 16)} AS part
                    FROM qsubs s JOIN qb1 b ON b.sub = s.sub
                    WHERE s.vec_id < 5),
            qp AS (SELECT vec_id AS qid, cl AS qcell FROM (
                     SELECT e.vec_id, f.cl,
                            row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY ${l2Sql("e.v", "f.c")}, f.cl) AS pr
                     FROM e CROSS JOIN c1 f WHERE e.vec_id < 5)
                   WHERE pr <= 2),
            scored AS (SELECT l.qid, a.vec_id, round(sum(l.part), 6) AS adc
                       FROM qaf a
                       JOIN af c ON c.vec_id = a.vec_id
                       JOIN qp ON qp.qcell = c.cl
                       JOIN lut l ON l.qid = qp.qid
                                 AND l.sub = a.sub AND l.code = a.code
                       GROUP BY l.qid, a.vec_id)
            SELECT qid, CAST(rank AS INT) AS rank, vec_id, adc FROM (
              SELECT qid, vec_id, adc,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY adc, vec_id) AS rank
              FROM scored)
            WHERE rank <= 5""",
      // Incremental encode: the fit population (seeds + Lloyd) is the
      // even half only — yesterday's corpus, the pinned model — while
      // the final arg-min encodes EVERY vector against those settled
      // codebooks (fitWhere restricts fsubs; af always runs over subs).
      "q161_pq_incr_encode" ->
        s"""WITH ${pqCtesF("", 4, 8, 1, 16, fitWhere = "vec_id % 2 = 0")}
            SELECT vec_id, sub, code, dist FROM af""",
      // Residual PQ: the same coarse fit feeds a residual table
      // (v − settled centroid of the vector's own cell — exact double
      // subtraction, both engines bit-identical), and the whole PQ
      // chain replays over it (the r-prefixed CTEs source from `res`).
      "q162_pq_residual_encode" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("r", 4, 8, 1, 16, srcSql =
              "SELECT a.vec_id, list_transform(range(1, 65), i -> a.v[i] - f.c[i]) AS v " +
                "FROM af a JOIN c1 f ON f.cl = a.cl")}
            SELECT vec_id, sub, code, dist FROM raf""",
      // IVFADC+R: the q160 construction widened to a top-20 shortlist,
      // then the exact 6-dp L2 re-rank over only the shortlisted pairs.
      "q163_ivfadc_rerank" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("q", 4, 8, 1, 16)},
            lut AS (SELECT s.vec_id AS qid, s.sub, b.code,
                           ${pqL2Sql("s.sv", "b.c", 16)} * ${pqL2Sql("s.sv", "b.c", 16)} AS part
                    FROM qsubs s JOIN qb1 b ON b.sub = s.sub
                    WHERE s.vec_id < 5),
            qp AS (SELECT vec_id AS qid, cl AS qcell FROM (
                     SELECT e.vec_id, f.cl,
                            row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY ${l2Sql("e.v", "f.c")}, f.cl) AS pr
                     FROM e CROSS JOIN c1 f WHERE e.vec_id < 5)
                   WHERE pr <= 2),
            scored AS (SELECT l.qid, a.vec_id, round(sum(l.part), 6) AS adc
                       FROM qaf a
                       JOIN af c ON c.vec_id = a.vec_id
                       JOIN qp ON qp.qcell = c.cl
                       JOIN lut l ON l.qid = qp.qid
                                 AND l.sub = a.sub AND l.code = a.code
                       GROUP BY l.qid, a.vec_id),
            short AS (SELECT qid, vec_id FROM (
                        SELECT qid, vec_id,
                               row_number() OVER (PARTITION BY qid
                                 ORDER BY adc, vec_id) AS rn
                        FROM scored) WHERE rn <= 20),
            re AS (SELECT s.qid, s.vec_id, ${l2Sql("q.v", "c.v")} AS dist
                   FROM short s
                   JOIN e q ON q.vec_id = s.qid
                   JOIN e c ON c.vec_id = s.vec_id)
            SELECT qid, CAST(rank AS INT) AS rank, vec_id, dist FROM (
              SELECT qid, vec_id, dist,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY dist, vec_id) AS rank
              FROM re)
            WHERE rank <= 5""",
      // Residual-aware IVFADC: q162's residual chain (r-prefixed CTEs)
      // searched the way the paper means it — the LUT is built from the
      // RESIDUALIZED query per probed cell (q − that cell's settled
      // centroid), and a candidate meets only its own cell's entries
      // (l.qcell = c.cl). The probe is q160's 2-best rule.
      "q164_ivfadc_residual" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("r", 4, 8, 1, 16, srcSql =
              "SELECT a.vec_id, list_transform(range(1, 65), i -> a.v[i] - f.c[i]) AS v " +
                "FROM af a JOIN c1 f ON f.cl = a.cl")},
            qp AS (SELECT vec_id AS qid, cl AS qcell FROM (
                     SELECT e.vec_id, f.cl,
                            row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY ${l2Sql("e.v", "f.c")}, f.cl) AS pr
                     FROM e CROSS JOIN c1 f WHERE e.vec_id < 5)
                   WHERE pr <= 2),
            rq AS (SELECT qp.qid, qp.qcell,
                          list_transform(range(1, 65), i -> e.v[i] - f.c[i]) AS rv
                   FROM qp JOIN e ON e.vec_id = qp.qid
                           JOIN c1 f ON f.cl = qp.qcell),
            rqsubs AS (SELECT qid, qcell, CAST(u.s AS INT) AS sub,
                              rv[u.s * 16 + 1 : u.s * 16 + 16] AS sv
                       FROM rq, unnest(range(0, 4)) AS u(s)),
            lut AS (SELECT s.qid, s.qcell, s.sub, b.code,
                           ${pqL2Sql("s.sv", "b.c", 16)} * ${pqL2Sql("s.sv", "b.c", 16)} AS part
                    FROM rqsubs s JOIN rb1 b ON b.sub = s.sub),
            scored AS (SELECT l.qid, a.vec_id, round(sum(l.part), 6) AS adc
                       FROM raf a
                       JOIN af c ON c.vec_id = a.vec_id
                       JOIN lut l ON l.qcell = c.cl
                                 AND l.sub = a.sub AND l.code = a.code
                       GROUP BY l.qid, a.vec_id)
            SELECT qid, CAST(rank AS INT) AS rank, vec_id, adc FROM (
              SELECT qid, vec_id, adc,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY adc, vec_id) AS rank
              FROM scored)
            WHERE rank <= 5""",
      // OPQ-lite: per-dim population variance at 6 dp (avg(x²)−avg(x)²,
      // the engines' shared grain), rank over (variance desc, dim asc),
      // rank r lands at permuted position (r % 4)·16 + r//4, and the
      // permuted vectors feed the unchanged p-prefixed PQ chain.
      "q165_pq_balanced_perm" ->
        s"""WITH e AS (SELECT vec_id, $VecSql AS v FROM embeddings),
            vars AS (SELECT CAST(u.i AS INT) AS dim,
                            round(avg(v[u.i + 1] * v[u.i + 1])
                              - avg(v[u.i + 1]) * avg(v[u.i + 1]), 6) AS vr
                     FROM e, unnest(range(0, 64)) AS u(i) GROUP BY 1),
            pp AS (SELECT dim,
                          CAST(((rn - 1) % 4) * 16 + ((rn - 1) // 4) AS INT) AS pos
                   FROM (SELECT dim,
                                row_number() OVER (ORDER BY vr DESC, dim) AS rn
                         FROM vars)),
            psrc AS (SELECT e.vec_id, list(e.v[pp.dim + 1] ORDER BY pp.pos) AS v
                     FROM e CROSS JOIN pp GROUP BY e.vec_id),
            ${pqCtesF("p", 4, 8, 1, 16, srcSql = "SELECT vec_id, v FROM psrc")}
            SELECT vec_id, sub, code, dist FROM paf""",
      // Re-rank with source coding: the q163 construction, but the
      // re-rank decodes x̂₂ = x̂₁ + ê₂ from BOTH code levels (stage-1
      // codewords + the r-prefixed refinement chain fitted on the
      // stage-1 errors) instead of reading raw corpus vectors. flatten(
      // list(c ORDER BY sub)) is the reconstruct concatenation rule.
      "q166_pq_refine_codes" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("q", 4, 8, 1, 16)},
            errs AS (SELECT a.vec_id, a.sub,
                            list_transform(range(1, 17), i -> a.sv[i] - b.c[i]) AS ev
                     FROM qaf a JOIN qb1 b ON b.sub = a.sub AND b.code = a.code),
            errv AS (SELECT vec_id, flatten(list(ev ORDER BY sub)) AS v
                     FROM errs GROUP BY vec_id),
            ${pqCtesF("r", 8, 8, 1, 8, srcSql = "SELECT vec_id, v FROM errv")},
            lut AS (SELECT s.vec_id AS qid, s.sub, b.code,
                           ${pqL2Sql("s.sv", "b.c", 16)} * ${pqL2Sql("s.sv", "b.c", 16)} AS part
                    FROM qsubs s JOIN qb1 b ON b.sub = s.sub
                    WHERE s.vec_id < 5),
            qp AS (SELECT vec_id AS qid, cl AS qcell FROM (
                     SELECT e.vec_id, f.cl,
                            row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY ${l2Sql("e.v", "f.c")}, f.cl) AS pr
                     FROM e CROSS JOIN c1 f WHERE e.vec_id < 5)
                   WHERE pr <= 2),
            scored AS (SELECT l.qid, a.vec_id, round(sum(l.part), 6) AS adc
                       FROM qaf a
                       JOIN af c ON c.vec_id = a.vec_id
                       JOIN qp ON qp.qcell = c.cl
                       JOIN lut l ON l.qid = qp.qid
                                 AND l.sub = a.sub AND l.code = a.code
                       GROUP BY l.qid, a.vec_id),
            short AS (SELECT qid, vec_id FROM (
                        SELECT qid, vec_id,
                               row_number() OVER (PARTITION BY qid
                                 ORDER BY adc, vec_id) AS rn
                        FROM scored) WHERE rn <= 20),
            rec1 AS (SELECT a.vec_id, flatten(list(b.c ORDER BY a.sub)) AS v1
                     FROM qaf a JOIN qb1 b ON b.sub = a.sub AND b.code = a.code
                     GROUP BY a.vec_id),
            rec2 AS (SELECT a.vec_id, flatten(list(b.c ORDER BY a.sub)) AS v2
                     FROM raf a JOIN rb1 b ON b.sub = a.sub AND b.code = a.code
                     GROUP BY a.vec_id),
            rec AS (SELECT r1.vec_id,
                           list_transform(range(1, 65), i -> r1.v1[i] + r2.v2[i]) AS rv
                    FROM rec1 r1 JOIN rec2 r2 ON r2.vec_id = r1.vec_id),
            re AS (SELECT s.qid, s.vec_id, ${l2Sql("q.v", "c.rv")} AS dist
                   FROM short s
                   JOIN e q ON q.vec_id = s.qid
                   JOIN rec c ON c.vec_id = s.vec_id)
            SELECT qid, CAST(rank AS INT) AS rank, vec_id, dist FROM (
              SELECT qid, vec_id, dist,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY dist, vec_id) AS rank
              FROM re)
            WHERE rank <= 5""",
      // Store audit: per-id squared decode error = sum of the encode
      // rows' dist² (each dist is the 6-dp per-subspace quantization
      // L2), aggregated per coarse cell; the r-prefixed chain's dists
      // are the error left after the two-level decode.
      "q167_pq_store_audit" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("q", 4, 8, 1, 16)},
            errs AS (SELECT a.vec_id, a.sub,
                            list_transform(range(1, 17), i -> a.sv[i] - b.c[i]) AS ev
                     FROM qaf a JOIN qb1 b ON b.sub = a.sub AND b.code = a.code),
            errv AS (SELECT vec_id, flatten(list(ev ORDER BY sub)) AS v
                     FROM errs GROUP BY vec_id),
            ${pqCtesF("r", 8, 8, 1, 8, srcSql = "SELECT vec_id, v FROM errv")},
            sq1 AS (SELECT vec_id, sum(dist * dist) AS s FROM qaf GROUP BY vec_id),
            sq2 AS (SELECT vec_id, sum(dist * dist) AS s FROM raf GROUP BY vec_id)
            SELECT c.cl AS cell, count(*) AS population,
                   round(avg(s1.s), 6) AS mean_sq_err,
                   round(max(s1.s), 6) AS max_sq_err,
                   round(avg(s2.s), 6) AS r_mean_sq_err
            FROM af c
            JOIN sq1 s1 ON s1.vec_id = c.vec_id
            JOIN sq2 s2 ON s2.vec_id = c.vec_id
            GROUP BY c.cl""",
      // Hot-cell split: hot = pop > ceil(n/10); per-cell k =
      // ceil(pop/maxpop); seeds = the k smallest ids per hot cell; one
      // local Lloyd round (assign to own cell's seeds → 6-dp means with
      // the empty-child coalesce → settle); child 0 keeps the parent
      // id, children >= 1 number densely over ALL reserved (cl, fcl)
      // slots in (cl, fcl) order — the constant 256-range join
      // enumerates reserved slots so an EMPTY child still holds its id.
      "q168_cell_rebalance" ->
        s"""WITH ${kmeansCtes(8, 1)},
            tot AS (SELECT CAST(ceil(count(*) / 10.0) AS BIGINT) AS maxpop FROM af),
            pop AS (SELECT cl, count(*) AS pop FROM af GROUP BY cl),
            hot AS (SELECT p.cl, CAST(ceil(p.pop * 1.0 / t.maxpop) AS INT) AS k
                    FROM pop p, tot t WHERE p.pop > t.maxpop),
            mem AS (SELECT a.vec_id, a.v, a.cl, h.k
                    FROM af a JOIN hot h ON h.cl = a.cl),
            seeds AS (SELECT cl, CAST(rn - 1 AS INT) AS fcl, v AS c FROM (
                        SELECT cl, vec_id, v, k,
                               row_number() OVER (PARTITION BY cl
                                 ORDER BY vec_id) AS rn
                        FROM mem) WHERE rn <= k),
            la0 AS (SELECT vec_id, cl, v, fcl FROM (
                      SELECT m.vec_id, m.cl, m.v, s.fcl,
                             row_number() OVER (PARTITION BY m.vec_id
                               ORDER BY ${l2Sql("m.v", "s.c")}, s.fcl) AS rn
                      FROM mem m JOIN seeds s ON s.cl = m.cl) WHERE rn = 1),
            lc1 AS (SELECT p.cl, p.fcl, coalesce(u.c, p.c) AS c
                    FROM seeds p LEFT JOIN (
                      SELECT cl, fcl, list(m ORDER BY j) AS c FROM (
                        SELECT cl, fcl, j, round(avg(v[j]), 6) AS m
                        FROM la0, unnest(range(1, 65)) AS u(j)
                        GROUP BY cl, fcl, j)
                      GROUP BY cl, fcl) u
                    ON u.cl = p.cl AND u.fcl = p.fcl),
            laf AS (SELECT vec_id, cl, fcl FROM (
                      SELECT m.vec_id, m.cl, c.fcl,
                             row_number() OVER (PARTITION BY m.vec_id
                               ORDER BY ${l2Sql("m.v", "c.c")}, c.fcl) AS rn
                      FROM mem m JOIN lc1 c ON c.cl = m.cl) WHERE rn = 1),
            numb AS (SELECT cl, fcl,
                            CAST(7 + row_number() OVER (ORDER BY cl, fcl) AS INT)
                              AS newcell
                     FROM (SELECT h.cl, CAST(u.f AS INT) AS fcl
                           FROM hot h
                           JOIN (SELECT CAST(u.f AS INT) AS f
                                 FROM unnest(range(1, 256)) AS u(f)) u
                             ON u.f < h.k))
            SELECT a.vec_id, a.cl AS cell
            FROM af a LEFT JOIN hot h ON h.cl = a.cl WHERE h.cl IS NULL
            UNION ALL
            SELECT l.vec_id,
                   CASE WHEN l.fcl = 0 THEN l.cl ELSE n.newcell END AS cell
            FROM laf l LEFT JOIN numb n ON n.cl = l.cl AND n.fcl = l.fcl""",
      // Residual-store rebalance: q168's split CTEs (tot..numb) over the
      // same coarse fit, composed with q162's residual PQ chain
      // (r-prefixed CTEs). Cold cells keep their raf rows; split-cell
      // members re-residualize against their settled child centroid
      // (child 0 included — its centroid moved too) and re-encode
      // against the SETTLED rb1 codebooks (the pinned-model rule).
      "q169_residual_rebalance" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("r", 4, 8, 1, 16, srcSql =
              "SELECT a.vec_id, list_transform(range(1, 65), i -> a.v[i] - f.c[i]) AS v " +
                "FROM af a JOIN c1 f ON f.cl = a.cl")},
            tot AS (SELECT CAST(ceil(count(*) / 10.0) AS BIGINT) AS maxpop FROM af),
            pop AS (SELECT cl, count(*) AS pop FROM af GROUP BY cl),
            hot AS (SELECT p.cl, CAST(ceil(p.pop * 1.0 / t.maxpop) AS INT) AS k
                    FROM pop p, tot t WHERE p.pop > t.maxpop),
            mem AS (SELECT a.vec_id, a.v, a.cl, h.k
                    FROM af a JOIN hot h ON h.cl = a.cl),
            seeds AS (SELECT cl, CAST(rn - 1 AS INT) AS fcl, v AS c FROM (
                        SELECT cl, vec_id, v, k,
                               row_number() OVER (PARTITION BY cl
                                 ORDER BY vec_id) AS rn
                        FROM mem) WHERE rn <= k),
            la0 AS (SELECT vec_id, cl, v, fcl FROM (
                      SELECT m.vec_id, m.cl, m.v, s.fcl,
                             row_number() OVER (PARTITION BY m.vec_id
                               ORDER BY ${l2Sql("m.v", "s.c")}, s.fcl) AS rn
                      FROM mem m JOIN seeds s ON s.cl = m.cl) WHERE rn = 1),
            lc1 AS (SELECT p.cl, p.fcl, coalesce(u.c, p.c) AS c
                    FROM seeds p LEFT JOIN (
                      SELECT cl, fcl, list(m ORDER BY j) AS c FROM (
                        SELECT cl, fcl, j, round(avg(v[j]), 6) AS m
                        FROM la0, unnest(range(1, 65)) AS u(j)
                        GROUP BY cl, fcl, j)
                      GROUP BY cl, fcl) u
                    ON u.cl = p.cl AND u.fcl = p.fcl),
            laf AS (SELECT vec_id, cl, fcl FROM (
                      SELECT m.vec_id, m.cl, c.fcl,
                             row_number() OVER (PARTITION BY m.vec_id
                               ORDER BY ${l2Sql("m.v", "c.c")}, c.fcl) AS rn
                      FROM mem m JOIN lc1 c ON c.cl = m.cl) WHERE rn = 1),
            numb AS (SELECT cl, fcl,
                            CAST(7 + row_number() OVER (ORDER BY cl, fcl) AS INT)
                              AS newcell
                     FROM (SELECT h.cl, CAST(u.f AS INT) AS fcl
                           FROM hot h
                           JOIN (SELECT CAST(u.f AS INT) AS f
                                 FROM unnest(range(1, 256)) AS u(f)) u
                             ON u.f < h.k)),
            nres AS (SELECT l.vec_id,
                            CASE WHEN l.fcl = 0 THEN l.cl ELSE n.newcell END AS cell,
                            list_transform(range(1, 65), i -> m.v[i] - c.c[i]) AS rv
                     FROM laf l
                     JOIN mem m ON m.vec_id = l.vec_id
                     JOIN lc1 c ON c.cl = l.cl AND c.fcl = l.fcl
                     LEFT JOIN numb n ON n.cl = l.cl AND n.fcl = l.fcl),
            nsubs AS (SELECT vec_id, cell, CAST(u.s AS INT) AS sub,
                             rv[u.s * 16 + 1 : u.s * 16 + 16] AS sv
                      FROM nres, unnest(range(0, 4)) AS u(s)),
            nenc AS (SELECT vec_id, cell, sub, code, dist FROM (
                       SELECT s.vec_id, s.cell, s.sub, b.code,
                              ${pqL2Sql("s.sv", "b.c", 16)} AS dist,
                              row_number() OVER (PARTITION BY s.vec_id, s.sub
                                ORDER BY ${pqL2Sql("s.sv", "b.c", 16)}, b.code) AS rn
                       FROM nsubs s JOIN rb1 b ON b.sub = s.sub) WHERE rn = 1)
            SELECT a.vec_id, a.cl AS cell, r.sub, r.code, r.dist
            FROM raf r JOIN af a ON a.vec_id = r.vec_id
            LEFT JOIN hot h ON h.cl = a.cl WHERE h.cl IS NULL
            UNION ALL
            SELECT vec_id, cell, sub, code, dist FROM nenc""",
      // Takedown-aware search: q160's IVFADC at nprobe = 2, with the
      // erased ids (vec_id % 97 = 3) absent from the CANDIDATE side only
      // (the store's codes are gone; queries are unrestricted).
      "q170_takedown_search" ->
        s"""WITH ${kmeansCtes(8, 1)},
            ${pqCtesF("q", 4, 8, 1, 16)},
            lut AS (SELECT s.vec_id AS qid, s.sub, b.code,
                           ${pqL2Sql("s.sv", "b.c", 16)} * ${pqL2Sql("s.sv", "b.c", 16)} AS part
                    FROM qsubs s JOIN qb1 b ON b.sub = s.sub
                    WHERE s.vec_id < 5),
            qp AS (SELECT vec_id AS qid, cl AS qcell FROM (
                     SELECT e.vec_id, f.cl,
                            row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY ${l2Sql("e.v", "f.c")}, f.cl) AS pr
                     FROM e CROSS JOIN c1 f WHERE e.vec_id < 5)
                   WHERE pr <= 2),
            scored AS (SELECT l.qid, a.vec_id, round(sum(l.part), 6) AS adc
                       FROM qaf a
                       JOIN af c ON c.vec_id = a.vec_id
                       JOIN qp ON qp.qcell = c.cl
                       JOIN lut l ON l.qid = qp.qid
                                 AND l.sub = a.sub AND l.code = a.code
                       WHERE a.vec_id % 97 <> 3
                       GROUP BY l.qid, a.vec_id)
            SELECT qid, CAST(rank AS INT) AS rank, vec_id, adc FROM (
              SELECT qid, vec_id, adc,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY adc, vec_id) AS rank
              FROM scored)
            WHERE rank <= 5"""
    )
  }
}
