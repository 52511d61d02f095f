package graft

import org.apache.spark.sql.functions._

/** LSH shingle-regime probe: `runMain graft.LshRegime <docsDir> [headroom]`.
  *
  * Runs [[graft.operators.LshOps.bandedMinhashAuto]] over a `documents`
  * parquet table (e.g. a `GenScale` output) and prints one JSON line with
  * the regime evidence: the auto-chosen `shingleN`, the vocabulary/doc
  * counts it was derived from, band-join pair count, mean bucket occupancy,
  * and wall seconds. This is the no-manual-knob re-run of the round-5 sf10
  * saturation measurement (BASELINE.md §round-5 second decade): the
  * operator itself now picks the shingle width that round 5 had to find by
  * hand, and the printed `bandPairs` shows whether the join stayed in the
  * selective (near-linear) regime.
  */
object LshRegime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: LshRegime <dir> [headroom | incr <shingleN> | cc | canon | stars | srp | srpincr | streamembed [nBatches] | kmeans | kmeans2 | semincr | wsample | contam | contamauto | chunk | spans | spansincr | shuffleorder | split | prefixjoin | pq | pqres | pqrefine | pqrebalance | pqresrebalance | pqdelete | pqfold | pqrecall | dedrecall]")
    val dir = args(0)
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 1 && args(1) == "incr") { incr(spark, dir, args(2).toInt); return }
    if (args.length > 1 && args(1) == "cc") { cc(spark, dir); return }
    if (args.length > 1 && args(1) == "canon") { canon(spark, dir); return }
    if (args.length > 1 && args(1) == "stars") { stars(spark, dir); return }
    if (args.length > 1 && args(1) == "srp") { srp(spark, dir); return }
    if (args.length > 1 && args(1) == "srpincr") { srpIncr(spark, dir); return }
    if (args.length > 1 && args(1) == "streamembed") {
      streamEmbed(spark, dir, if (args.length > 2) args(2).toInt else 8); return
    }
    if (args.length > 1 && args(1) == "kmeans") { kmeans(spark, dir); return }
    if (args.length > 1 && args(1) == "kmeans2") { kmeansTwoLevel(spark, dir); return }
    if (args.length > 1 && args(1) == "semincr") { semIncr(spark, dir); return }
    if (args.length > 1 && args(1) == "wsample") { wsample(spark, dir); return }
    if (args.length > 1 && args(1) == "contam") { contam(spark, dir); return }
    if (args.length > 1 && args(1) == "chunk") { chunk(spark, dir); return }
    if (args.length > 1 && args(1) == "spans") { spans(spark, dir); return }
    if (args.length > 1 && args(1) == "contamauto") { contamAuto(spark, dir); return }
    if (args.length > 1 && args(1) == "shuffleorder") { shuffleOrder(spark, dir); return }
    if (args.length > 1 && args(1) == "spansincr") { spansIncr(spark, dir); return }
    if (args.length > 1 && args(1) == "split") { split(spark, dir); return }
    if (args.length > 1 && args(1) == "prefixjoin") { prefixJoin(spark, dir); return }
    if (args.length > 1 && args(1) == "pq") { pqSearch(spark, dir, residual = false); return }
    if (args.length > 1 && args(1) == "pqres") { pqSearch(spark, dir, residual = true); return }
    if (args.length > 1 && args(1) == "pqrefine") { pqRefine(spark, dir); return }
    if (args.length > 1 && args(1) == "pqrebalance") { pqRebalance(spark, dir); return }
    if (args.length > 1 && args(1) == "pqresrebalance") { pqResRebalance(spark, dir); return }
    if (args.length > 1 && args(1) == "pqdelete") { pqDelete(spark, dir); return }
    if (args.length > 1 && args(1) == "pqfold") { pqFold(spark, dir); return }
    if (args.length > 1 && args(1) == "pqrecall") { pqRecall(spark, dir); return }
    if (args.length > 1 && args(1) == "dedrecall") { dedupRecallProbe(spark, dir); return }
    val headroom = if (args.length > 1) args(1).toDouble else 100.0
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val auto = graft.operators.LshOps.bandedMinhashAuto(
      docs, "text", "doc_id", headroom = headroom)
    // Band-join pair count = sum over buckets of C(size, 2) — the size of
    // the self-join the candidate stage would materialize.
    val pairs = auto.banded.bands
      .groupBy(col("b"), col("bh")).agg(count(lit(1)).as("c"))
      .agg(sum((col("c") * (col("c") - 1) / 2).cast("long"))).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"lsh_regime","shingleN":${auto.shingleN},"vocab":${auto.vocabEstimate},""" +
        f""""docs":${auto.docCount},"bandPairs":$pairs,"meanOccupancy":${auto.banded.meanOccupancy}%.3f,""" +
        f""""overflowBuckets":${auto.banded.overflowBuckets},"secs":$secs%.2f}""")
    spark.stop()
  }

  /** Exact prefix-join-at-scale probe (E131): regime-rule shingle width
    * → prefix-filtered exact Jaccard τ-join. Prints the chosen width,
    * result pairs, and wall seconds — the corpus path for q146 (whose
    * fixture query REQUIRE-pins the rule's 4-gram choice against the
    * oracle). Near-linear wall across a decade means the rarest-first
    * prefixes stayed selective at the width the rule picked. */
  private def prefixJoin(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count() // untimed, and not re-scanned for the print
    val t0 = System.nanoTime()
    val n = operators.LshOps.autoShingleN(docs, "text")
    val pairs = operators.SetJoinOps.prefixJaccardJoin(
      docs.select(col("doc_id"),
        functions.TextFunctions.shingles(col("text"), n).as("sh")),
      "doc_id", "sh", tau = 0.5)
    val nPairs = pairs.agg(count(lit(1))).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"prefix_join","shingleN":$n,"docs":$nDocs,""" +
        f""""pairs":$nPairs,"secs":$secs%.2f}""")
    spark.stop()
  }

  /** Components-at-scale probe: auto-width banding → candidate pairs →
    * connected components. Prints cluster stats + wall seconds — the
    * scale path for q103 (whose corpus query keeps the oracle's fixed
    * 3-gram setting). */
  private def cc(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, max}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val auto = operators.LshOps.bandedMinhashAuto(docs, "text", "doc_id")
    val pairs = operators.LshOps.candidatePairs(auto.banded.bands, "doc_id")
    val labels = operators.GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
    val stats = labels.groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)), max(col("sz"))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"lsh_cc","shingleN":${auto.shingleN},"docs":${auto.docCount},""" +
        f""""pairedVertices":${labels.count()},"components":${stats.getLong(0)},""" +
        f""""maxCluster":${stats.getLong(1)},"secs":$secs%.2f}""")
    spark.stop()
  }

  /** E128 probe: [[cc]]'s pipeline extended by the leakage-safe group
    * split + leak gate — the scale path for q143 (whose corpus query
    * REQUIRE-pins the oracle's fixed 4-gram setting). The delta vs cc
    * at the same dir is one broadcast-ish left join on doc_id, the
    * narrow hash-bucket projection, and two small aggregations — it
    * must stay a small constant fraction of cc's wall at every decade,
    * and n_leaked_groups must be 0 by construction. */
  private def split(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val auto = operators.LshOps.bandedMinhashAuto(docs, "text", "doc_id")
    val assigned = operators.SamplingOps.componentSplit(
      docs, "doc_id", auto.banded.bands, trainPct = 90, seed = 42L,
      bucket = operators.SamplingOps.portableBucket)
    val leaked = assigned.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    val bySide = assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"lsh_split","shingleN":${auto.shingleN},"docs":${auto.docCount},""" +
        f""""train":${bySide.getOrElse("train", 0L)},"holdout":${bySide.getOrElse("holdout", 0L)},""" +
        f""""leakedGroups":$leaked,"secs":$secs%.2f}""")
    spark.stop()
  }

  /** E94 probe: [[cc]]'s pipeline extended by the canonical pick — the
    * member↔length join plus the single component agg (bounded-buffer
    * top-1 + cluster size). The DELTA vs cc at the same dir is the cost
    * of the retention policy itself; it is one linear join + one agg on
    * the member frame, so the delta must stay a small constant fraction
    * of cc's wall at every decade. */
  private def canon(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, element_at, lit, max}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val auto = operators.LshOps.bandedMinhashAuto(docs, "text", "doc_id")
    val pairs = operators.LshOps.candidatePairs(auto.banded.bands, "doc_id")
    val labels = operators.GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("v").as("doc_id"), col("component"))
    val sized = labels.join(
      docs.selectExpr("doc_id", "length(text) AS n_chars"), Seq("doc_id"))
    val canonical = sized.groupBy(col("component"))
      .agg(operators.TopKOps.topK(1)(col("n_chars"), col("doc_id")).as("_tk"),
        count(lit(1)).cast("int").as("cluster_size"))
      .select(col("component"),
        element_at(col("_tk.items"), 1).getField("id").as("canonical_doc_id"),
        col("cluster_size"))
    val stats = canonical.agg(count(lit(1)), max(col("cluster_size"))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"lsh_canon","shingleN":${auto.shingleN},"docs":${auto.docCount},""" +
        f""""clusters":${stats.getLong(0)},"maxCluster":${stats.getInt(1)},""" +
        f""""secs":$secs%.2f}""")
    spark.stop()
  }

  /** Star-contraction twin of [[cc]]: the SAME auto-width pairs, labeled
    * by [[graft.operators.GraphOps.connectedComponentsStars]] instead of
    * label propagation. Run both at one scale and compare `secs`: on
    * near-dup graphs (shallow quasi-cliques, diameter 2-4) propagation's
    * one-join rounds win; stars exists for the deep-path shapes where
    * propagation refuses past maxIter. The printed stats must MATCH cc's
    * (same components by construction) — only the wall differs. */
  private def stars(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, max}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val auto = operators.LshOps.bandedMinhashAuto(docs, "text", "doc_id")
    val pairs = operators.LshOps.candidatePairs(auto.banded.bands, "doc_id")
    val labels = operators.GraphOps.connectedComponentsStars(pairs, "doc_a", "doc_b")
    val stats = labels.groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)), max(col("sz"))).head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"lsh_stars","shingleN":${auto.shingleN},"docs":${auto.docCount},""" +
        f""""pairedVertices":${labels.count()},"components":${stats.getLong(0)},""" +
        f""""maxCluster":${stats.getLong(1)},"secs":$secs%.2f}""")
    spark.stop()
  }

  /** Sustained-ingest probe for the STREAMING embed-ledger path (the CLI's
    * `--stream --dedup embed`): feeds the embeddings table through a
    * MemoryStream in `nBatches` micro-batches into
    * [[graft.streaming.StreamingOps.foreachBatchLedgerNeardupVec]] — the
    * full per-epoch protocol (foreign-epoch guard, epoch banding, ledger
    * join, cosine verify, idempotent survivor write, epoch-partition
    * commit). Prints per-batch wall seconds and sustained rows/sec; the
    * batch operator alone is measured by [[srpIncr]], so the DELTA here is
    * the protocol overhead (checkpointing, epoch partition writes). */
  private def streamEmbed(
      spark: org.apache.spark.sql.SparkSession, dir: String, nBatches: Int): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val root = java.nio.file.Files.createTempDirectory("graft_regime_streamembed")
    val mem = MemoryStream[(Long, Array[Float])]
    val writer = mem.toDF().toDF("vec_id", "embedding")
      .writeStream.option("checkpointLocation", root.resolve("ckpt").toString)
    val q = graft.streaming.StreamingOps.foreachBatchLedgerNeardupVec(
      writer, "embedding", "vec_id", root.resolve("bands").toString,
      pipeline.Connectors.IdempotentParquetSink(root.resolve("out").toString),
      "stream_embed", nBands = 4, bitsPerBand = 15, minCos = 0.9).start()
    val per = rows.grouped(math.max(1, rows.length / nBatches)).map { slice =>
      val t0 = System.nanoTime()
      mem.addData(slice.toSeq)
      q.processAllAvailable()
      (slice.length, (System.nanoTime() - t0) / 1e9)
    }.toSeq
    q.stop()
    val survivors = spark.read.parquet(root.resolve("out").resolve("stream_embed").toString).count()
    val total = per.map(_._2).sum
    println(
      f"""{"metric":"stream_embed","rows":${rows.length},"batches":${per.length},""" +
        f""""survivors":$survivors,"rowsPerSec":${rows.length / total}%.0f,""" +
        s""""batchSecs":${per.map(p => f"${p._2}%.2f").mkString("[", ",", "]")}}""")
    spark.stop()
  }

  /** Banded-SRP probe over an `embeddings` table: the scale path for
    * embedding near-dup (the single-table 8-bit bucket join measured
    * 81× slower at 10× vectors — SrpOps scaladoc). No manual knobs:
    * [[graft.operators.SrpOps.srpAuto]] picks the band width from the
    * vector count and the default gauge stays enforced. Prints the chosen
    * width + candidate/pair counts + wall seconds. */
  /** E97/E98 probe: k-means fit + SemDeDup purge at the decade's scale.
    * k follows the SemDeDup discipline — scale it with the corpus so
    * cluster size (the quadratic term) stays constant: k = ⌈n/256⌉,
    * which at both decades lands in the broadcast-join assignment path
    * (k > 64), the one that must prove itself at scale. `purgeSecs` is
    * the operator end-to-end (it runs its own fit — by design the purge
    * is self-contained); the fit-only number isolates Lloyd's share. */
  private def kmeans(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    // The round-9 derivation rule itself (deriveK at target 256), so the
    // probe measures exactly what semanticPurgeAuto would run; at both
    // decades this lands in the broadcast-join assignment path (k > 64),
    // the one that must prove itself at scale.
    val k = math.max(8, operators.KmeansOps.deriveK(n, 256L))
    val t0 = System.nanoTime()
    val fitted = operators.KmeansOps.fit(vecs, "embedding", "vec_id", k, iters = 2)
    val assigned = fitted.assignments.count()
    val fitSecs = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val verdict = operators.KmeansOps.semanticPurge(
      vecs, "embedding", "vec_id", k, iters = 2, minCos = 0.9)
    val purged = verdict.filter(!col("kept")).count()
    val purgeSecs = (System.nanoTime() - t1) / 1e9
    // The LOUD path, on record like the SRP refusal table: a deliberately
    // under-clustered purge (k=8 ⇒ ~n/8 members per cluster) must refuse
    // up front once n/8 outruns the default gauge (gsf10: 25 k-member
    // clusters vs the 10 k gauge) — time-to-refusal is the cost of the
    // guard, not of the quadratic join it prevented. At gsf1 n/8 = 2.5 k
    // sits INSIDE the gauge, so the same call legitimately runs —
    // "within-gauge-ran" there is the gauge telling the truth, not a
    // missed refusal.
    val t2 = System.nanoTime()
    val refusal =
      try {
        operators.KmeansOps.semanticPurge(
          vecs, "embedding", "vec_id", k = 8, iters = 0, minCos = 0.9)
          .count()
        "within-gauge-ran"
      } catch { case e: IllegalStateException =>
        if (e.getMessage.contains("maxClusterForPairs")) "refused" else "wrong-error"
      }
    val refuseSecs = (System.nanoTime() - t2) / 1e9
    println(
      f"""{"metric":"kmeans_semdedup","vectors":$n,"k":$k,"assigned":$assigned,""" +
        f""""fitSecs":$fitSecs%.2f,"purged":$purged,"purgeSecs":$purgeSecs%.2f,""" +
        f""""k8Gauge":"$refusal","refuseSecs":$refuseSecs%.2f}""")
    spark.stop()
  }

  /** E133 probe: the TWO-LEVEL fit + purge at the flat probe's leaf
    * granularity (target 256, k1 = ceil(sqrt(k)) cells, k2 = ceil(k/k1)
    * fine per cell) — the 100 TB SemDeDup shape exercised at decade
    * scale. The numbers that must hold across a decade: fit wall grows
    * ~linearly (each fine round is one cell-equi-join + two map-side
    * aggs), and the pair stage stays bounded by LEAF size (maxLeaf), not
    * corpus size — purge wall tracks sum-of-leaf-squares, which the
    * derivation keeps per-leaf-constant as n grows. */
  private def kmeansTwoLevel(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val k = math.max(16L, operators.KmeansOps.deriveKLong(n, 256L))
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
    val k2 = ((k + k1 - 1) / k1).toInt
    val t0 = System.nanoTime()
    val fit2 = operators.KmeansOps.fitTwoLevel(
      vecs, "embedding", "vec_id", k1, k2, iters = 2)
    val assigned = fit2.assignments.count()
    val fitSecs = (System.nanoTime() - t0) / 1e9
    // Leaf occupancy: the pair stage is quadratic in THESE, so the probe
    // records the bound it claims (max leaf + the C(size,2) pair total).
    val occ = fit2.assignments.groupBy(col("cluster"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("mx"),
        sum((col("c") * (col("c") - 1) / 2).cast("long")).as("pairs"))
      .head()
    val t1 = System.nanoTime()
    val purged = operators.KmeansOps.semanticPurgeTwoLevel(
      vecs, "embedding", "vec_id", k1, k2, iters = 2, minCos = 0.9)
      .filter(!col("kept")).count()
    val purgeSecs = (System.nanoTime() - t1) / 1e9
    println(
      f"""{"metric":"kmeans_twolevel","vectors":$n,"k1":$k1,"k2":$k2,""" +
        f""""leaves":${k1.toLong * k2},"assigned":$assigned,""" +
        f""""maxLeaf":${occ.getLong(0)},"leafPairs":${occ.getLong(1)},""" +
        f""""fitSecs":$fitSecs%.2f,"purged":$purged,"purgeSecs":$purgeSecs%.2f}""")
    spark.stop()
  }

  /** E99 probe: weighted sample (n=1000, weight = n_chars) over the
    * decade's documents — the narrow-projection + TakeOrdered shape whose
    * wall must track the scan, not a sort. */
  private def wsample(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val picked = operators.SamplingOps
      .weightedSample(docs, "doc_id", "n_chars", n = 1000, seed = 7L)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"weighted_sample","docs":${docs.count()},"picked":$picked,""" +
        f""""secs":$secs%.2f}""")
    spark.stop()
  }

  /** E103/E104 probe: fuzzy cross-corpus decontamination at decade scale.
    * The corpus is hash-split 49:1 into a "training" side and a small
    * "benchmark" side (the real-world shape: the reference side is orders
    * of magnitude smaller and broadcastable). Measures BOTH stages at the
    * corpus' auto-derived shingle width: the banded bipartite candidate
    * join (q122) and the exact-Jaccard verification (q123) — the verified
    * count must be ≤ candidates, and the verify DELTA must stay linear in
    * candidate count, never in |train|×|ref|. */
  private def contam(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{abs, col, xxhash64}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val isRef = abs(xxhash64(col("doc_id"))) % 50 === 0
    val train = docs.filter(!isRef)
    val ref = docs.filter(isRef)
    val t0 = System.nanoTime()
    // Mine once, verify the SAME pairs frame: verifiedSecs must be the
    // verification DELTA (linear in candidate count), not a re-run of the
    // banding stage — re-mining inside the verify leg would misattribute
    // a superlinear candidate stage to verification.
    val pairs = operators.LshOps
      .crossCorpusPairs(train, ref, "text", "doc_id").localCheckpoint(true)
    val candidates = pairs.count()
    val t1 = System.nanoTime()
    val verified = operators.LshOps
      .verifyPairs(pairs, train, ref, "text", "doc_id", 3, minJaccard = 0.5)
      .count()
    val t2 = System.nanoTime()
    println(
      f"""{"metric":"contam","train":${train.count()},"ref":${ref.count()},""" +
        f""""candidates":$candidates,"verified":$verified,""" +
        f""""candidateSecs":${(t1 - t0) / 1e9}%.2f,"verifiedSecs":${(t2 - t1) / 1e9}%.2f}""")
    spark.stop()
  }

  /** E107 probe: the KNOB-FREE decontamination at decade scale — same
    * 49:1 hash split as [[contam]], but the width comes from the train
    * regime. The point of the comparison: [[contam]]'s fixed 3-gram
    * candidates grow superlinearly as the bucket space fills (110× for
    * 10× docs at gsf10); the derived width must keep candidate growth
    * near-linear while the verified count stays in the same band. */
  private def contamAuto(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.{abs, col, xxhash64}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val isRef = abs(xxhash64(col("doc_id"))) % 50 === 0
    val train = docs.filter(!isRef)
    val ref = docs.filter(isRef)
    val t0 = System.nanoTime()
    val auto = operators.LshOps.crossCorpusPairsAuto(train, ref, "text", "doc_id")
    val pairs = auto.pairs.localCheckpoint(true)
    val candidates = pairs.count()
    val t1 = System.nanoTime()
    // Same mine-once rule as [[contam]]: verify the pinned pairs frame at
    // the derived width instead of re-running derivation + banding.
    val verified = operators.LshOps
      .verifyPairs(pairs, train, ref, "text", "doc_id", auto.shingleN,
        minJaccard = 0.5)
      .count()
    val t2 = System.nanoTime()
    println(
      f"""{"metric":"contam_auto","train":${auto.trainCount},"ref":${ref.count()},""" +
        f""""shingleN":${auto.shingleN},"candidates":$candidates,"verified":$verified,""" +
        f""""candidateSecs":${(t1 - t0) / 1e9}%.2f,"verifiedSecs":${(t2 - t1) / 1e9}%.2f}""")
    spark.stop()
  }

  /** E108 probe: the per-epoch corpus shuffle at decade scale. A
    * range-partitioned global sort's wall must track n·log(n) on the
    * scan — the gauge here is simply that 10× docs cost ~10× wall, never
    * a single-task funnel (the plan gate lives in SamplingOpsSpec; this
    * measures the executed shape). */
  private def shuffleOrder(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = java.nio.file.Files
      .createTempDirectory("graft_regime_shuffle").resolve("epoch3").toString
    val t0 = System.nanoTime()
    // Write the ordered corpus (a bare count would let Catalyst eliminate
    // the sort) — part files land in partition order, so the written
    // concatenation IS the epoch's order, the operator's real use.
    operators.SamplingOps.epochShuffle(docs, "doc_id", epoch = 3L)
      .write.mode("overwrite").parquet(out)
    val secs = (System.nanoTime() - t0) / 1e9
    val n = spark.read.parquet(out).count()
    println(f"""{"metric":"epoch_shuffle","docs":$n,"secs":$secs%.2f}""")
    spark.stop()
  }

  /** E105/E106 probe: duplicate-span detection + span surgery at decade
    * scale. Measures BOTH stages separately: the detection agg (narrow
    * explode → one key-grouped agg → flag-back join) and the surgery
    * (per-doc starts agg + corpus join + narrow rebuild). Both walls must
    * track the corpus linearly — nothing here may go quadratic, and the
    * flagged-position count is the workload gauge. */
  private def spans(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val flagged = operators.DedupOps
      .duplicateSpans(docs, "text", "doc_id", spanTokens = 8).count()
    val t1 = System.nanoTime()
    val scrub = operators.DedupOps
      .scrubSpans(docs, "text", "doc_id", spanTokens = 8)
    val removedDocs = scrub.filter(org.apache.spark.sql.functions
      .col("n_removed") > 0).count()
    val t2 = System.nanoTime()
    println(
      f"""{"metric":"spans","docs":${docs.count()},"flaggedPositions":$flagged,""" +
        f""""scrubbedDocs":$removedDocs,"detectSecs":${(t1 - t0) / 1e9}%.2f,""" +
        f""""scrubSecs":${(t2 - t1) / 1e9}%.2f}""")
    spark.stop()
  }

  /** E109 probe: incremental span ingest — evens committed as the
    * span-frequency ledger, odds flagged against it. The batch wall must
    * track the BATCH's span volume (one explode + one key-grouped join
    * against summed counts), never the ledger's row count — the
    * append-only ledger grows with corpus history and the sum-aggregate
    * is the only thing that reads it. */
  private def spansIncr(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ledgerDir = java.nio.file.Files
      .createTempDirectory("graft_regime_spansincr").resolve("spans").toString
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    operators.DedupOps.incrementalSpans(
      spark, evens, "text", "doc_id", ledgerDir, spanTokens = 8).commitLedger()
    val t0 = System.nanoTime()
    val pending = operators.DedupOps.incrementalSpans(
      spark, odds, "text", "doc_id", ledgerDir, spanTokens = 8)
    val nFlags = pending.flags.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"spans_incr","batch":${odds.count()},"flaggedPositions":$nFlags,""" +
        f""""secs":$secs%.2f}""")
    spark.stop()
  }

  /** E102 probe: token-window chunking (64/48) over the decade's
    * documents. Narrow end to end — the wall must track the scan+tokenize
    * cost and the chunk fan-out must sit at the construction-bounded
    * ratio, both decades. */
  private def chunk(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val chunks = operators.ChunkOps
      .chunkByTokens(docs, "text", "doc_id", chunkTokens = 64, strideTokens = 48)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    val nDocs = docs.count()
    println(
      f"""{"metric":"chunk","docs":$nDocs,"chunks":$chunks,""" +
        f""""fanOut":${chunks.toDouble / nDocs}%.2f,"secs":$secs%.2f}""")
    spark.stop()
  }

  private def srp(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val auto = operators.SrpOps.srpAuto(vecs, "embedding", "vec_id")
    val pairs = operators.SrpOps.neardupPairs(auto.banded.bands, "embedding", "vec_id", 0.9)
    val n = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"srp_banded","vectors":${auto.vecCount},"bitsPerBand":${auto.bitsPerBand},""" +
        f""""neardupPairs":$n,"meanOccupancy":${auto.banded.meanOccupancy}%.3f,""" +
        f""""overflowBuckets":${auto.banded.overflowBuckets},"secs":$secs%.2f}""")
    spark.stop()
  }

  /** Incremental EMBEDDING ingest probe: even vec_ids = ledgered corpus,
    * odds = today's embeddings, banded at the full 15-bit width (what
    * srpAuto picks at these counts). Prints hit/survivor counts + wall
    * seconds for the batch ingest alone — the q108 operator's scale
    * shape: band the batch + one bucket-keyed ledger join + exact cosine
    * on candidates only. */
  private def srpIncr(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val ledgerDir = java.nio.file.Files
      .createTempDirectory("graft_regime_srpincr").resolve("bands").toString
    val evens = vecs.filter(col("vec_id") % 2 === 0)
    val odds = vecs.filter(col("vec_id") % 2 === 1)
    operators.SrpOps.incrementalNeardup(
      spark, evens, "embedding", "vec_id", ledgerDir, bitsPerBand = 15).commitLedger()
    val t0 = System.nanoTime()
    val pending = operators.SrpOps.incrementalNeardup(
      spark, odds, "embedding", "vec_id", ledgerDir, bitsPerBand = 15)
    val (nBatch, nHits, nSurv) = (odds.count(), pending.ledgerHits.count(), pending.survivors.count())
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"srp_incr","batch":$nBatch,"ledgerHits":$nHits,""" +
        f""""survivors":$nSurv,"secs":$secs%.2f}""")
    spark.stop()
  }

  /** Incremental SEMANTIC ingest probe (E101): evens = yesterday's corpus
    * (model fitted and pinned on them at the deriveK(n,256) width — the
    * k > 64 broadcast-join assignment path at both decades), odds =
    * today's crawl, assigned against the PINNED model. Prints hit /
    * survivor counts + wall seconds for the batch ingest alone — the
    * q119 operator's scale shape: one assignment pass + one cluster-keyed
    * ledger join + exact cosine on same-cluster candidates. */
  private def semIncr(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val ledgerDir = java.nio.file.Files
      .createTempDirectory("graft_regime_semincr").resolve("clusters").toString
    val evens = vecs.filter(col("vec_id") % 2 === 0)
    val odds = vecs.filter(col("vec_id") % 2 === 1)
    val k = math.max(8, operators.KmeansOps.deriveK(evens.count(), 256L))
    operators.KmeansOps.incrementalSemantic(
      spark, evens, "embedding", "vec_id", ledgerDir,
      k = k, iters = 2, minCos = 0.9).commitLedger()
    val t0 = System.nanoTime()
    val pending = operators.KmeansOps.incrementalSemantic(
      spark, odds, "embedding", "vec_id", ledgerDir,
      k = k, iters = 2, minCos = 0.9)
    val (nBatch, nHits, nSurv) = (odds.count(), pending.ledgerHits.count(), pending.survivors.count())
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"sem_incr","batch":$nBatch,"k":$k,"ledgerHits":$nHits,""" +
        f""""survivors":$nSurv,"secs":$secs%.2f}""")
    spark.stop()
  }

  /** Incremental-ingest regime probe: evens = ledgered corpus, odds =
    * today's batch, both banded at the given width. Prints hit/survivor
    * counts + wall seconds — the number that shows 3-grams over-dropping
    * on a saturated corpus (46% of a gsf10 batch) while the auto width
    * drops ≈ the true near-dup rate. */
  private def incr(spark: org.apache.spark.sql.SparkSession, dir: String, shingleN: Int): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ledgerDir = java.nio.file.Files
      .createTempDirectory("graft_regime_incr").resolve("bands").toString
    val evens = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val odds = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    operators.LshOps.incrementalNeardup(
      spark, evens, "text", "doc_id", ledgerDir, shingleN = shingleN).commitLedger()
    val t0 = System.nanoTime()
    val pending = operators.LshOps.incrementalNeardup(
      spark, odds, "text", "doc_id", ledgerDir, shingleN = shingleN)
    val (nBatch, nHits, nSurv) = (odds.count(), pending.ledgerHits.count(), pending.survivors.count())
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"lsh_incr","shingleN":$shingleN,"batch":$nBatch,"ledgerHits":$nHits,""" +
        f""""survivors":$nSurv,"secs":$secs%.2f}""")
    spark.stop()
  }

  /** E142's scale claim, isolated: SEARCH-ONLY wall against the STORED
    * cell-partitioned codes must track the probed cells' population, not
    * the corpus. coarseK scales with n (target ~2 500 vectors/cell), so
    * across a 10× decade the per-cell population — and therefore the
    * pruned search — should stay near-FLAT while the corpus grows 10×.
    * The build (fit + encode + write) is timed separately: it IS ∝ n by
    * design. Median of 3 searches, model read back through the pinned
    * artifact API (the real consumer path, PartitionFilters and all). */
  private def pqSearch(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      residual: Boolean): Unit = {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val coarseK = math.max(8L, n / 2500L).toInt
    val store = java.nio.file.Files
      .createTempDirectory("graft_pq_probe").resolve("pq").toString
    val t0 = System.nanoTime()
    operators.PqOps.writePqArtifacts(spark, vecs, "embedding", "vec_id", store,
      m = 4, kCodes = 8, iters = 1, coarseK = coarseK, coarseIters = 1,
      residual = residual)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val arts = operators.PqOps.readPqArtifacts(spark, store)
    val queries = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    // Probed population = vectors living in the 5 queries' own cells.
    val qcells = operators.KmeansOps.assign(queries, "embedding", "qid", arts.coarse)
      .select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).toSet
    val probedPop = arts.codes
      .filter(col("cell").isInCollection(qcells.map(Integer.valueOf)))
      .select(col("vec_id")).distinct().count()
    // searchArtifacts routes by the pin — the real consumer path for
    // both formulations (round 14 adds the residual decade evidence).
    def once(): Double = {
      val t = System.nanoTime()
      operators.PqOps.searchArtifacts(arts, "vec_id", queries,
        "qid", "embedding", topN = 5, nprobe = 1).count()
      (System.nanoTime() - t) / 1e9
    }
    val walls = Seq.fill(3)(once()).sorted
    val metric = if (residual) "pq_search_residual" else "pq_search"
    println(
      f"""{"metric":"$metric","n":$n,"coarseK":$coarseK,"probedPop":$probedPop,""" +
        f""""buildSecs":$buildSecs%.2f,"searchSecsMedian":${walls(1)}%.3f,""" +
        f""""searchSecs":[${walls.map(w => f"$w%.3f").mkString(",")}]}""")
    spark.stop()
  }

  /** E148's scale claim, isolated: the TWO-STAGE compressed-domain
    * search (IVFADC shortlist top-20 → codes re-rank → top-5) must
    * track the probed population + the Q × R shortlist, not the corpus
    * — across a 10× decade at flat probed population the end-to-end
    * search wall should stay near-flat, with NO raw-vector read
    * anywhere. Build (both levels) timed separately; it is ∝ n. */
  private def pqRefine(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val coarseK = math.max(8L, n / 2500L).toInt
    val store = java.nio.file.Files
      .createTempDirectory("graft_pq_refine_probe").resolve("pq").toString
    val t0 = System.nanoTime()
    operators.PqOps.writePqArtifacts(spark, vecs, "embedding", "vec_id", store,
      m = 4, kCodes = 8, iters = 1, coarseK = coarseK, coarseIters = 1,
      refineM = 8, refineK = 8)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val arts = operators.PqOps.readPqArtifacts(spark, store)
    val queries = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding"))
    val qcells = operators.KmeansOps.assign(queries, "embedding", "qid", arts.coarse)
      .select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).toSet
    val probedPop = arts.codes
      .filter(col("cell").isInCollection(qcells.map(Integer.valueOf)))
      .select(col("vec_id")).distinct().count()
    def once(): Double = {
      val t = System.nanoTime()
      operators.PqOps.searchArtifactsRefined(arts, "vec_id", queries,
        "qid", "embedding", topR = 20, topN = 5, nprobe = 1).count()
      (System.nanoTime() - t) / 1e9
    }
    val walls = Seq.fill(3)(once()).sorted
    println(
      f"""{"metric":"pq_refine_search","n":$n,"coarseK":$coarseK,"probedPop":$probedPop,""" +
        f""""buildSecs":$buildSecs%.2f,"searchSecsMedian":${walls(1)}%.3f,""" +
        f""""searchSecs":[${walls.map(w => f"$w%.3f").mkString(",")}]}""")
    spark.stop()
  }

  /** E150's scale claim, isolated: the REBALANCE wall must be the local
    * hot-cell re-fit (∝ hot members) plus the fresh-store rewrite
    * (∝ n, sequential parquet) — nothing super-linear, and no cold
    * member's vector is ever read. maxPop is set at 0.8× the mean cell
    * population (this generator's k-means lands near-balanced, so the
    * 0.8 gauge makes roughly every cell hot — the worst case: the
    * local re-fit touches ~the whole corpus), the same relative
    * threshold at every scale. */
  private def pqRebalance(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val coarseK = math.max(8L, n / 2500L).toInt
    val root = java.nio.file.Files.createTempDirectory("graft_pq_rebalance_probe")
    val store = root.resolve("pq").toString
    operators.PqOps.writePqArtifacts(spark, vecs, "embedding", "vec_id", store,
      m = 4, kCodes = 8, iters = 1, coarseK = coarseK, coarseIters = 1)
    val maxPop = (n * 8L) / (coarseK.toLong * 10L)
    val t0 = System.nanoTime()
    val (arts, nHot) = operators.PqOps.rebalanceStore(
      spark, store, vecs, "embedding", "vec_id",
      root.resolve("pq2").toString, maxPop, iters = 1)
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"pq_rebalance","n":$n,"coarseK":$coarseK,"maxPop":$maxPop,""" +
        f""""nHot":$nHot,"newCoarseK":${arts.coarse.length},"rebalanceSecs":$secs%.2f}""")
    spark.stop()
  }

  /** E151 probe: RESIDUAL-store rebalance at the same deliberately
    * worst-case shape as [[pqRebalance]] (every cell hot) — here the
    * split cells' members RE-ENCODE against the child centroids with the
    * pinned codebooks, so this measures the partial re-encode's ceiling
    * (hot members = the whole corpus). Production splits touch a few
    * cells; cost is ∝ their members. */
  private def pqResRebalance(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val coarseK = math.max(8L, n / 2500L).toInt
    val root = java.nio.file.Files.createTempDirectory("graft_pq_resrebal_probe")
    val store = root.resolve("pq").toString
    operators.PqOps.writePqArtifacts(spark, vecs, "embedding", "vec_id", store,
      m = 4, kCodes = 8, iters = 1, coarseK = coarseK, coarseIters = 1,
      residual = true)
    val maxPop = (n * 8L) / (coarseK.toLong * 10L)
    val t0 = System.nanoTime()
    val (arts, nHot) = operators.PqOps.rebalanceStore(
      spark, store, vecs, "embedding", "vec_id",
      root.resolve("pq2").toString, maxPop, iters = 1)
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"pq_res_rebalance","n":$n,"coarseK":$coarseK,"maxPop":$maxPop,""" +
        f""""nHot":$nHot,"newCoarseK":${arts.coarse.length},"rebalanceSecs":$secs%.2f}""")
    spark.stop()
  }

  /** E153 probe: takedown into the PQ store — a FIXED 100-id denylist
    * against a growing store (both namespaces). The wall is one columnar
    * ledger scan plus atomic rewrites of ONLY the hit (epoch, cell)
    * leaves (≤ denylist-bounded), so it should grow far slower than n. */
  private def pqDelete(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val coarseK = math.max(8L, n / 2500L).toInt
    val root = java.nio.file.Files.createTempDirectory("graft_pq_delete_probe")
    val store = root.resolve("pq").toString
    operators.PqOps.writePqArtifacts(spark, vecs, "embedding", "vec_id", store,
      m = 4, kCodes = 8, iters = 1, coarseK = coarseK, coarseIters = 1,
      refineM = 8, refineK = 8)
    val deny = (0L until 100L).toSeq
    val t0 = System.nanoTime()
    val rs = operators.PqOps.pqStoreDelete(
      spark, store, "vec_id", deny, root.resolve("audit").toString)
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"pq_delete","n":$n,"coarseK":$coarseK,"deny":${deny.size},""" +
        f""""deleted":${rs("codes").deleted},"rdeleted":${rs("rcodes").deleted},""" +
        f""""leaves":${rs("codes").leavesRewritten + rs("rcodes").leavesRewritten},""" +
        f""""deleteSecs":$secs%.2f}""")
    spark.stop()
  }

  /** E154 probe: ANN recall audit — a FIXED 20-query sample against a
    * growing store. The claim under test: the audit's wall is ONE
    * corpus scan (exact ground truth, queries broadcast, bounded
    * top-k) plus the production search itself — ∝ n at fixed Q, never
    * Q × n scans or a driver-side corpus. Also prints the recall it
    * measured: the number is the artifact, the wall is the cost. */
  private def pqRecall(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val coarseK = math.max(8L, n / 2500L).toInt
    val root = java.nio.file.Files.createTempDirectory("graft_pq_recall_probe")
    val store = root.resolve("pq").toString
    operators.PqOps.writePqArtifacts(spark, vecs, "embedding", "vec_id", store,
      m = 4, kCodes = 8, iters = 1, coarseK = coarseK, coarseIters = 1)
    val arts = operators.PqOps.readPqArtifacts(spark, store)
    val t0 = System.nanoTime()
    val r = operators.PqOps.annRecall(arts, vecs, "embedding", "vec_id",
      k = 10, nQueries = 20, nprobe = 2)
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"metric":"pq_recall","n":$n,"coarseK":$coarseK,"k":10,""" +
        f""""queries":20,"nprobe":2,"recall":$r%.4f,"auditSecs":$secs%.2f}""")
    spark.stop()
  }

  /** E155 probe: the dedup-ledger recall audits at their decades. Builds
    * each space's ledger from the fixture (pinning the construction the
    * audit then reads), times ONLY the audit call — the ingest is the
    * production path, already probed elsewhere. The claim is the COST
    * SHAPE (one exact-truth corpus pass with Q queries broadcast + one
    * banding pass); the recall number is the audit's deliverable. A
    * fixture whose sampled queries have no true pair refuses by design —
    * reported as recall −1 so the probe still lands its timing. */
  private def dedupRecallProbe(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_dedrecall_probe")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val ledgerT = root.resolve("lsh").toString
    operators.LshOps.incrementalNeardup(
      spark, docs, "text", "doc_id", ledgerT).commitLedger()
    val t0 = System.nanoTime()
    val (recT, truthT) =
      try {
        val r = operators.LshOps.dedupRecall(
          spark, ledgerT, docs, "text", "doc_id",
          minJaccard = 0.8, nQueries = 50)
        (r.recall, r.truePairs)
      } catch { case _: IllegalArgumentException => (-1.0, 0L) }
    val secT = (System.nanoTime() - t0) / 1e9
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = vecs.count()
    val ledgerS = root.resolve("srp").toString
    // Band width sized from the corpus (the srpAuto rule) — the default
    // 10-bit band saturates past ~5k vectors and the gauge rightly
    // refuses; a real ledger owner pins a corpus-sized width.
    val bits = math.min(30, math.max(10,
      math.ceil(math.log(nVecs.toDouble / 2.0) / math.log(2.0)).toInt))
    operators.SrpOps.incrementalNeardup(
      spark, vecs, "embedding", "vec_id", ledgerS,
      bitsPerBand = bits).commitLedger()
    val t1 = System.nanoTime()
    val (recS, truthS) =
      try {
        val r = operators.SrpOps.dedupRecall(
          spark, ledgerS, vecs, "embedding", "vec_id", nQueries = 50)
        (r.recall, r.truePairs)
      } catch { case _: IllegalArgumentException => (-1.0, 0L) }
    val secS = (System.nanoTime() - t1) / 1e9
    println(
      f"""{"metric":"dedup_recall","nDocs":$nDocs,"recallText":$recT%.4f,""" +
        f""""truePairsText":$truthT,"textSecs":$secT%.2f,"nVecs":$nVecs,""" +
        f""""recallSrp":$recS%.4f,"truePairsSrp":$truthS,"srpSecs":$secS%.2f,""" +
        """"queries":50}""")
    spark.stop()
  }

  /** E152 probe: PQ epoch fold — half the corpus as base, the other half
    * appended as 8 `epoch<N>` drains, then one fold into base. Measures
    * the fold wall and the leaf-file collapse (the read-amplification
    * the fold exists to remove). */
  private def pqFold(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val coarseK = math.max(8L, n / 2500L).toInt
    val root = java.nio.file.Files.createTempDirectory("graft_pq_fold_probe")
    val store = root.resolve("pq").toString
    operators.PqOps.writePqArtifacts(
      spark, vecs.filter(col("vec_id") % 2 === 0), "embedding", "vec_id", store,
      m = 4, kCodes = 8, iters = 1, coarseK = coarseK, coarseIters = 1)
    // 8 disjoint odd-id slices: epoch j holds vec_id ≡ 2j+1 (mod 16) —
    // batches are NEW ids by the ledger contract.
    for (j <- 0 until 8)
      operators.PqOps.incrementalPqEncode(
        spark, vecs.filter(col("vec_id") % 16 === 2 * j + 1),
        "embedding", "vec_id", store, s"epoch$j").commitLedger()
    val t0 = System.nanoTime()
    val reps = operators.PqOps.foldPqEpochs(spark, store, upToBatchId = 7L)
    val secs = (System.nanoTime() - t0) / 1e9
    val r = reps("codes")
    println(
      f"""{"metric":"pq_fold","n":$n,"coarseK":$coarseK,"epochs":8,""" +
        f""""filesBefore":${r.filesBefore},"filesAfter":${r.filesAfter},""" +
        f""""rows":${r.rows},"foldSecs":$secs%.2f}""")
    spark.stop()
  }
}
