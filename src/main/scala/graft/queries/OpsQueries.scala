package graft.queries

import graft.Tables
import graft.operators.{BloomOps, DedupOps, ExportOps, GateOps, MergeOps, SamplingOps, TopKOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-backed corpus entries for the pipeline OPERATORS (SURVEY §2.3
  * E58/E64): unlike the projection corpora, these drive the stateful
  * operator APIs end-to-end (ledger build → second-batch dedup; split by
  * portable hash) and assert the RESULT against a DuckDB restatement of the
  * same semantics.
  */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** q77's committed batch-1 ledger, keyed by input dir (see the q77 note). */
  private val q77Ledgers =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Build (once per input dir) and return q77's committed batch-1 ledger.
    * Synchronized: TrieMap.getOrElseUpdate may run a racing builder twice
    * and discard one result — harmless for a value, not for a committed
    * ledger directory on disk. The temp dir is removed on JVM exit (the
    * parquet files under it appear after createTempDirectory, so a
    * recursive shutdown-hook delete, not deleteOnExit, is needed).
    * Bench calls this from its untimed warm-up so run 1 of 3 measures the
    * same steady-state anti-join as runs 2-3; Verify does NOT, so its
    * single call still exercises the full write-then-commit protocol. */
  def ensureQ77Ledger(s: SparkSession, dir: String): String = q77Ledgers.synchronized {
    q77Ledgers.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_q77_ledger")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }))
      val path = root.resolve("fp").toString
      val batch1 = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
      DedupOps.incrementalDedup(s, batch1, "text", "doc_id", path).commitLedger()
      path
    })
  }

  /** q151's orc copy of the documents table, keyed by input dir — written
    * once through the REGISTRY sink (the dispatch path under test), read
    * back through the registry source on every query run. Same temp-dir +
    * shutdown-hook lifecycle as the q77 ledger. */
  private val q151OrcDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def ensureQ151Orc(s: SparkSession, dir: String): String = q151OrcDirs.synchronized {
    q151OrcDirs.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_q151_orc")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }))
      graft.pipeline.Connectors.sink("orc", root.toString)
        .write(t(s, dir, "documents"), "documents",
          org.apache.spark.sql.SaveMode.Overwrite)
      root.toString
    })
  }

  /** q155's committed batch-1 heavy-hitter ledger, keyed by input dir —
    * same temp-dir + shutdown-hook lifecycle as the q77 ledger, same
    * warm-up contract (Bench prewarms it; Verify's single call still
    * exercises write-then-commit). */
  private val q155Ledgers =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def ensureQ155Ledger(s: SparkSession, dir: String): String = q155Ledgers.synchronized {
    q155Ledgers.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_q155_hh")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }))
      val path = root.resolve("hh").toString
      import graft.functions.TextFunctions.tokens
      val batch1 = t(s, dir, "documents").filter(col("doc_id") % 2 === 0)
        .select(explode(tokens(col("text"))).as("hh_value"))
      graft.operators.SketchOps.incrementalHeavyHitters(
        s, batch1, "hh_value", path, capacity = 64, k = 10).commitLedger()
      path
    })
  }

  /** charHash(e) SQL — same fold as TextFunctions.charHash (lockstep rule:
    * change both or neither). */
  private def charHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      "(a, b) -> (a * 31 + b) % 1000000007)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E58 incremental ledger dedup, end-to-end: even doc_ids are "yesterday's
    // corpus" (batch 1 → ledger commit), odd doc_ids are "today's crawl";
    // the result is today's survivors — docs whose text was not ledgered,
    // one per fingerprint. Runs the real two-step API: batch 1 commits its
    // fingerprints (write-then-commit protocol), batch 2 stays uncommitted.
    // The batch-1 ledger is a FIXTURE (pure function of the input dir), so
    // it is built once per dir and reused: Bench runs each query 3× and a
    // per-run tmpfs parquet write would otherwise dominate the timing of
    // what is, at steady state, an anti-join against an existing ledger.
    // The first call (and therefore Verify's single call) still exercises
    // the full write-then-commitLedger protocol end-to-end.
    "q77_ledger_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ledger = ensureQ77Ledger(s, dir)
      val batch2 = docs.filter(col("doc_id") % 2 === 1)
      DedupOps.incrementalDedup(s, batch2, "text", "doc_id", ledger)
        .survivors.select(col("doc_id"))
    }),

    // E64 layout-stable hash split, via the portable (oracle-expressible)
    // bucket: every doc labeled with its side. Membership is a pure
    // function of (doc_id, seed) — DuckDB recomputes it independently.
    "q78_hash_split" -> ((s, dir) => {
      val (train, test) = SamplingOps.hashSplit(
        t(s, dir, "documents"), "doc_id", 80, 42L, SamplingOps.portableBucket)
      train.select(col("doc_id"), lit("train").as("side"))
        .unionByName(test.select(col("doc_id"), lit("test").as("side")))
    }),

    // E64's stratified pick, oracle-backed end-to-end: exactly 10 docs per
    // language, chosen by the portable seeded rank — DuckDB independently
    // recomputes the identical rank order, so the exact membership (not
    // just the per-stratum count) is hash-checked. Runs the real two-phase
    // operator (salt-group pre-filter, then bounded global pick).
    "q88_stratified_sample" -> ((s, dir) => {
      SamplingOps.stratifiedFixedN(
        t(s, dir, "documents"), "lang", "doc_id", n = 10, seed = 5L,
        rank = SamplingOps.portableRank)
        .select(col("lang"), col("doc_id"))
    }),

    // E76 grouped top-k via partial aggregation: 3 highest-value orders per
    // customer through the bounded-buffer Aggregator — never a per-group
    // window sort. One shuffle; map-side partials carry ≤ k entries per
    // (group × partition).
    "q89_grouped_topk" -> ((s, dir) =>
      TopKOps.groupedTopK(
        t(s, dir, "orders"), "o_custkey", "o_totalprice", "o_orderkey", k = 3)),

    // E92 per-source cap (domain balancing): no source may contribute more
    // than K documents to the corpus, keeping its best K (longest, doc_id
    // tie-break) — the standard web-corpus step that stops one crawled
    // domain from dominating a training mix. The keep-list is the
    // bounded-buffer grouped top-k (one shuffle, ≤ k entries per group ×
    // map partition) and is sources × K rows — tiny at ANY corpus size —
    // so the cap applies back to the full rows as a BROADCAST semi-join:
    // no second shuffle, no window sort over whole sources.
    "q110_source_cap" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val keep = TopKOps.groupedTopK(docs, "source", "n_chars", "doc_id", k = 5)
        .select(col("doc_id"))
      docs.join(broadcast(keep), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    }),

    // E93 group-relative quantile gate: each source keeps its documents at
    // or above that source's OWN median length — the heterogeneous-corpus
    // fix for fixed-threshold gates (q75's cutoffs tuned for one source's
    // regime purge or flood another's). One shuffle (grouped exact
    // percentile — the q39 pairing that matches DuckDB's quantile_cont);
    // the |sources|-row threshold frame applies back as a BROADCAST join.
    // `percentile_approx` is the documented 100 TB-group-size path
    // (GateOps scaladoc), exactly as q100 is for q39.
    "q111_quantile_gate" -> ((s, dir) => {
      GateOps.groupQuantileGate(t(s, dir, "documents"), "source", "n_chars", q = 0.5)
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(col("gate_threshold"), 4).as("source_p50"))
    }),

    // E93's 100 TB path, oracle-pinned: the SAME group-relative gate with
    // the threshold from `percentile_approx` (Greenwald–Khanna bounded
    // sketch) instead of the exact buffering `percentile` — the q39→q100
    // pairing applied to the gate. At oracle scale the sketch retains
    // every sample (accuracy ≫ group size), so GK's pick degenerates to a
    // deterministic DISCRETE element and the oracle can restate it
    // exactly: the smallest group value whose 1-based rank reaches
    // ceil(q·n) — unlike q100, where both engines run their own sketch
    // and only a tolerance gate is possible. Same plan as q111: one
    // grouped shuffle, |sources|-row broadcast back, filter.
    "q120_quantile_gate_gk" -> ((s, dir) => {
      GateOps.groupQuantileGate(t(s, dir, "documents"), "source", "n_chars",
          q = 0.5, approxAccuracy = Some(1000000))
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(col("gate_threshold"), 4).as("source_p50"))
    }),

    // E95 export-integrity manifest: the order-independent per-shard
    // (count, xor, modular-sum) census a downstream trainer re-derives to
    // trust a shipped corpus. ONE aggregation over (shard, rowHash) pairs
    // — map-side partials reduce every task to ≤nShards rows, so the
    // shuffle is tiny at any corpus size. The portable charHash row hash
    // lets DuckDB recompute the identical checksums; the sum rides a
    // decimal accumulator then reduces mod 1e9+7 (a long sum would
    // ANSI-overflow at ~1e10 rows). The full export+verify protocol
    // (write, manifest file, re-derive from the files BY DIRECTORY,
    // refuse loudly) is spec-gated in ExportOpsSpec.
    "q113_shard_manifest" -> ((s, dir) =>
      ExportOps.shardManifest(
        t(s, dir, "documents"), "doc_id", Seq("text"),
        nShards = 8, seed = 7L, ExportOps.portableRowHash)),

    // E96 corpus drift monitor: per source, compare yesterday's snapshot
    // (even doc_ids) against today's (odd) — volume log-ratio and mean
    // document length, flagging sources whose inflow shifted. The plan
    // lesson: ONE-PASS conditional aggregation (count/avg over CASE) —
    // one scan and one shuffle — where the naive restatement aggregates
    // each snapshot separately and joins, i.e. two scans of a 100 TB
    // corpus plus a join. A source missing a cohort yields NULL ratio and
    // drifts by definition (appeared/vanished is the loudest drift).
    "q114_drift_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val old_ = col("doc_id") % 2 === 0
      val neu = col("doc_id") % 2 === 1
      docs.groupBy(col("source")).agg(
          count(when(old_, 1)).as("n_old"),
          count(when(neu, 1)).as("n_new"),
          round(avg(when(old_, col("n_chars"))), 4).as("mean_chars_old"),
          round(avg(when(neu, col("n_chars"))), 4).as("mean_chars_new"))
        .withColumn("count_log_ratio",
          when(col("n_old") > 0 && col("n_new") > 0,
            round(log(col("n_new").cast("double") / col("n_old")), 4)))
        .withColumn("drifted",
          col("count_log_ratio").isNull || abs(col("count_log_ratio")) > 0.15)
    }),

    // E99 weighted sampling without replacement (Efraimidis–Spirakis
    // priorities): 100 documents, inclusion probability ∝ n_chars,
    // deterministic portable-hash uniforms — narrow projection into a
    // TakeOrdered, never a global sort. The oracle replays the exact
    // priority formula.
    "q117_weighted_sample" -> ((s, dir) =>
      SamplingOps.weightedSample(
          t(s, dir, "documents"), "doc_id", "n_chars", n = 100, seed = 13L)
        .select(col("doc_id"), col("n_chars"), col("priority"))),

    // E108 deterministic per-epoch corpus shuffle: reproducible global
    // training order as a pure function of (id, epoch) — range-partitioned
    // distributed sort, portable rank key. The oracle pins the key values;
    // the ORDER itself (and its layout-independence) is gated in
    // SamplingOpsSpec, since the driver compare is order-insensitive.
    "q127_epoch_shuffle" -> ((s, dir) =>
      SamplingOps.epochShuffle(t(s, dir, "documents"), "doc_id", epoch = 3L)
        .select(col("doc_id"), col("shuffle_key"))),

    // E78 SCD2 merge, end-to-end: a customer dimension (opened 2026-01-01)
    // takes an update batch — odd keys change balance (+100), every 10th
    // key arrives unchanged (no-op update) — effective 2026-06-01. Changed
    // keys close their open row and open a new one; unchanged and
    // untouched keys pass through. One keyed full-outer join.
    "q91_scd2_merge" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val dim = cust
        .withColumn("valid_from", lit(java.sql.Date.valueOf("2026-01-01")))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(true))
      val updates = cust.filter(col("c_custkey") % 2 === 1)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .unionByName(cust.filter(col("c_custkey") % 10 === 0))
      MergeOps.scd2(dim, updates, "c_custkey", Seq("c_acctbal"),
        lit(java.sql.Date.valueOf("2026-06-01")))
    }),

    // E78's simpler form — last-write-wins upsert: odd keys take the
    // updated balance, five brand-new keys insert, evens pass through.
    "q92_upsert" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val updates = cust.filter(col("c_custkey") % 2 === 1)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .unionByName(cust.filter(col("c_custkey") <= 5)
          .select((col("c_custkey") + 1000000L).as("c_custkey"), col("c_acctbal")))
      MergeOps.upsert(cust, updates, Seq("c_custkey"))
    }),

    // E79 bloom-prefiltered join: orders against the ~10% of customers
    // with high balances. The bloom pass drops most non-matching orders
    // before the join shuffle; the real join makes the result exact, so
    // the oracle is the PLAIN join — correctness must be independent of
    // fpp.
    "q93_bloom_join" -> ((s, dir) => {
      val rich = t(s, dir, "customer")
        .filter(col("c_acctbal") > 9000).select(col("c_custkey"), col("c_acctbal"))
      BloomOps.bloomJoin(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        "o_custkey", rich, "c_custkey", expectedItems = 200000L)
        .select(col("o_orderkey"), col("o_custkey"), col("c_acctbal"))
    }),

    // E84 corpus-mixture sampling + context cap: per-source keep rates
    // (100/50/0%, default 25%) via the portable id-bucket, then truncate
    // the kept docs to their first 64 tokens — the mixture-weighting +
    // context-length-cap pass a pretraining pipeline runs last. Narrow:
    // filter + projection, no shuffle.
    "q98_source_mixture" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val kept = SamplingOps.sourceMixture(
        t(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 100, "src1" -> 50, "src2" -> 0), defaultPct = 25,
        seed = 11L, bucket = SamplingOps.portableBucket)
      kept.select(col("doc_id"), col("source"),
        array_join(slice(tokens(col("text")), 1, 64), " ").as("text_capped"),
        least(size(tokens(col("text"))), lit(64)).as("n_tok_out"))
    }),

    // E83 column profiling: one-scan numeric data-quality report over
    // lineitem (row/null/distinct counts, min/max per column). The exact
    // multi-distinct Expand multiplies per-row work ×4 — spread a
    // single-split input across cores first (no-op on real layouts).
    "q97_profile" -> ((s, dir) =>
      graft.operators.ProfileOps.profileNumeric(
        Tables.parallel(t(s, dir, "lineitem")),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // E83's 100 TB path: the same one-scan profile with HLL distinct counts
    // (`exact=false`) — no Expand, so the input is NOT replicated once per
    // profiled column. n / n_null / min / max stay exact; n_distinct is the
    // sketch estimate, so the oracle (DuckDB's own HLL) gates rows+schema
    // rather than the value hash; AccuracySpec bounds the estimate against
    // the exact count and ProfileOpsSpec gates the plan against the Expand.
    "q101_profile_hll" -> ((s, dir) =>
      graft.operators.ProfileOps.profileNumeric(
        Tables.parallel(t(s, dir, "lineitem")),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        exact = false)),

    // E82 sequence packing: concatenate documents in doc_id order, cut
    // every 512 tokens into one training example. Runs the two-phase
    // parallel prefix sum — the oracle restates it as the naive global
    // window, so the parallel decomposition must be EXACTLY the serial
    // semantics.
    "q96_sequence_pack" -> ((s, dir) =>
      graft.operators.PackOps.packSequences(
        t(s, dir, "documents"), "text", "doc_id", exampleTokens = 512)),

    // The integration showcase: the corpus-curation chain a training-data
    // pipeline runs end-to-end — normalize → length gate → exact dedup on
    // the normalized fingerprint (keep-min-id) → deterministic 90/10
    // split. Each stage is one of the declared operators; the oracle
    // restates the whole chain, so a semantic drift in ANY stage breaks
    // the hash. All narrow except one shuffle on the fingerprint and one
    // on nothing (the split is a pure row function).
    "q85_curation_pipeline" -> ((s, dir) => {
      import graft.functions.TextFunctions.{charHash, tokens}
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      val survivors = t(s, dir, "documents")
        .withColumn("norm", norm)
        .filter(size(tokens(col("norm"))) >= 50)
        .groupBy(charHash(col("norm")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      survivors.select(
        col("doc_id"),
        when(SamplingOps.portableBucket(col("doc_id"), 7L) < 90, lit("train"))
          .otherwise(lit("holdout")).as("split"))
    }),

    // E119 temperature-scaled source mixture (α = 1/2): keep-rates
    // DERIVED from per-source counts — rate_s = floor(100·√(n_min/n_s)),
    // so the dominant source is damped toward √-proportions. The result
    // reports (source, derived rate, totals, kept) so the oracle pins
    // BOTH the rate derivation and the membership filter.
    "q136_temperature_mixture" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val totals = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      SamplingOps.temperatureMixture(docs, "source", "doc_id", seed = 11L,
          bucket = SamplingOps.portableBucket)
        .groupBy(col("source"), col("_graft_rate").as("rate_pct"))
        .agg(count(lit(1)).as("n_kept"))
        .join(broadcast(totals), "source")
    }),

    // E116 Z-order clustering key: the Morton z-value that
    // MaintenanceOps.zorderCluster range-partitions files by. The query
    // pins the interleave arithmetic AND demonstrates the locality
    // contract the layout relies on: bucketing by the z-value's high
    // bits bounds EVERY bucket's min/max box in BOTH key columns (what
    // parquet file/row-group skipping prunes on). Pure integer math —
    // hash-exact against the oracle; one vocabulary-of-32 aggregation.
    "q133_zorder_stats" -> ((s, dir) => {
      import graft.operators.MaintenanceOps
      val z = MaintenanceOps.zorderValue(
        col("l_partkey") % 65536, col("l_suppkey") % 65536, 16)
      t(s, dir, "lineitem")
        .select(z.as("zval"), col("l_partkey"), col("l_suppkey"))
        .groupBy(shiftright(col("zval"), 27).as("zbucket"))
        .agg(
          count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
          min(col("zval")).as("min_z"), max(col("zval")).as("max_z"))
    }),

    // E116's n-ary extension (round 12): the THREE-column Morton curve —
    // bit i of column j lands at position 3·i + j, so every z-bucket is
    // box-bounded in all three keys at once. Same pure-integer hash-exact
    // contract as q133; bits = 8 per key keeps the oracle's per-bit list
    // fold short (z < 2^24, buckets = top 5 bits).
    "q150_zorder3_stats" -> ((s, dir) => {
      import graft.operators.MaintenanceOps
      val z = MaintenanceOps.zorderValueN(Seq(
        col("l_partkey") % 256, col("l_suppkey") % 256, col("l_orderkey") % 256), 8)
      t(s, dir, "lineitem")
        .select(z.as("zval"),
          col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
        .groupBy(shiftright(col("zval"), 19).as("zbucket"))
        .agg(
          count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
          min(col("l_orderkey")).as("min_ord"), max(col("l_orderkey")).as("max_ord"),
          min(col("zval")).as("min_z"), max(col("zval")).as("max_z"))
    }),

    // E3b's oracle query (round 12): documents round-tripped through the
    // REGISTRY's orc sink + source (the same dispatch path R10 pins), then
    // aggregated per source — counts, char totals, id bounds, and the
    // charHash SUM of every text body, so a single corrupted byte anywhere
    // in the round-trip breaks the hash. The oracle reads the parquet
    // originals: the assertion IS that orc preserved every value.
    "q151_orc_roundtrip" -> ((s, dir) => {
      val base = ensureQ151Orc(s, dir)
      graft.pipeline.Connectors.source("orc", base).read(s, "documents")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(graft.functions.TextFunctions.charHash(col("text"))).as("sum_fp"))
    }),

    // E137 per-source percentile normalization (round 12): each doc's
    // within-source percent rank of its length — the scale-free
    // calibration a cross-source threshold needs (E93 is the
    // one-threshold special case). The plan is counts-then-broadcast,
    // never percent_rank() over row-sized windows (one task per source
    // at 100 TB); n_chars is integral so the distinct-value frame is
    // bounded and the rank division is exact-integer IEEE.
    "q154_source_pct_rank" -> ((s, dir) =>
      graft.operators.GateOps.percentileNormalize(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        "source", "n_chars")),

    // E138 incremental heavy hitters (round 12): batch 2's token stream
    // against batch 1's committed sketch ledger — corpus-lifetime top-10
    // without re-reading batch 1. Capacity 64 > the 31-token vocab, so
    // every per-batch sketch is exact, the summed estimates ARE the
    // whole-corpus counts, and the additive error mass is 0 — all three
    // pinned by the oracle over the full documents table.
    "q155_incr_heavy_hitters" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokens
      val ledger = ensureQ155Ledger(s, dir)
      val batch2 = t(s, dir, "documents").filter(col("doc_id") % 2 === 1)
        .select(explode(tokens(col("text"))).as("hh_value"))
      graft.operators.SketchOps.incrementalHeavyHitters(
        s, batch2, "hh_value", ledger, capacity = 64, k = 10).top
    })
  )

  val oracle: Map[String, String] = Map(
    // The oracle asserts on the charHash half of the (charHash, xxhash64)
    // fingerprint pair — xxhash64 isn't restatable in DuckDB, and on
    // fixture data the charHash projection alone determines membership.
    "q77_ledger_dedup" ->
      s"""WITH fp AS (SELECT doc_id, ${charHashSql("text")} AS fp FROM documents),
          b1 AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
          b2 AS (SELECT doc_id, fp FROM fp WHERE doc_id % 2 = 1)
          SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM b2 WHERE fp NOT IN (SELECT fp FROM b1))
          WHERE rn = 1""",
    "q78_hash_split" ->
      s"""SELECT doc_id,
          CASE WHEN ${charHashSql("CAST(doc_id AS VARCHAR) || ':42'")} % 100 < 80
               THEN 'train' ELSE 'test' END AS side
          FROM documents""",
    "q88_stratified_sample" ->
      s"""SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
              row_number() OVER (PARTITION BY lang
                ORDER BY ${charHashSql("CAST(doc_id AS VARCHAR) || ':5'")}, doc_id) AS rn
            FROM documents)
          WHERE rn <= 10""",
    // The cap restated: rank within source by (n_chars desc, doc_id), keep
    // rank ≤ K, return the surviving document rows.
    "q110_source_cap" ->
      """SELECT doc_id, source, lang, n_chars FROM documents
         QUALIFY row_number() OVER (PARTITION BY source
           ORDER BY n_chars DESC, doc_id) <= 5""",
    // The gate restated: per-source median (quantile_cont ≡ Spark's exact
    // interpolating `percentile`, the q39 pairing), keep rows at/above it.
    "q111_quantile_gate" ->
      """SELECT d.doc_id, d.source, d.n_chars, round(t.thr, 4) AS source_p50
         FROM documents d
         JOIN (SELECT source, quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS thr
               FROM documents GROUP BY source) t USING (source)
         WHERE CAST(d.n_chars AS DOUBLE) >= t.thr""",
    // The GK gate restated discretely: at accuracy ≫ n the sketch keeps
    // every sample, and its pick is the smallest value with 1-based rank
    // ≥ ceil(q·n) in the group's ascending order — restated with an
    // explicit row_number, NOT quantile_disc (engines differ on the
    // discrete rank rule; the explicit rank pins Spark's).
    "q120_quantile_gate_gk" ->
      """WITH ranked AS (
           SELECT source, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
             count(*) OVER (PARTITION BY source) AS n
           FROM documents),
         thr AS (
           SELECT source, min(n_chars) AS thr
           FROM ranked WHERE rk >= CAST(ceil(0.5 * n) AS BIGINT)
           GROUP BY source)
         SELECT d.doc_id, d.source, d.n_chars,
           round(CAST(t.thr AS DOUBLE), 4) AS source_p50
         FROM documents d JOIN thr t USING (source)
         WHERE CAST(d.n_chars AS DOUBLE) >= t.thr""",

    // The manifest restated: shard = charHash(id:seed) % 8, row hash =
    // charHash(id:text:seed); per shard the count, the bit-XOR, and the
    // exact (HUGEINT) sum reduced mod 1e9+7.
    "q113_shard_manifest" ->
      s"""SELECT CAST(shard AS INT) AS shard,
          count(*) AS n_rows,
          bit_xor(h) AS xor_hash,
          CAST(sum(h) % 1000000007 AS BIGINT) AS sum_hash
          FROM (SELECT
                  ${charHashSql("CAST(doc_id AS VARCHAR) || ':7'")} % 8 AS shard,
                  ${charHashSql("CAST(doc_id AS VARCHAR) || ':' || text || ':7'")} AS h
                FROM documents)
          GROUP BY shard""",
    // The drift report restated with FILTERed aggregates (the same
    // one-pass conditional aggregation).
    "q114_drift_report" ->
      """SELECT source, n_old, n_new, mean_chars_old, mean_chars_new,
           count_log_ratio,
           (count_log_ratio IS NULL OR abs(count_log_ratio) > 0.15) AS drifted
         FROM (
           SELECT source,
             count(*) FILTER (doc_id % 2 = 0) AS n_old,
             count(*) FILTER (doc_id % 2 = 1) AS n_new,
             round(avg(n_chars) FILTER (doc_id % 2 = 0), 4) AS mean_chars_old,
             round(avg(n_chars) FILTER (doc_id % 2 = 1), 4) AS mean_chars_new,
             CASE WHEN count(*) FILTER (doc_id % 2 = 0) > 0
                   AND count(*) FILTER (doc_id % 2 = 1) > 0
                  THEN round(ln(CAST(count(*) FILTER (doc_id % 2 = 1) AS DOUBLE)
                              / count(*) FILTER (doc_id % 2 = 0)), 4)
             END AS count_log_ratio
           FROM documents GROUP BY source)""",
    // Lockstep with SamplingOps.weightedSample: u = (charHash("<id>:13")
    // mod 1e6 + 1) / 1000001, priority = round(ln(u)/w, 6), top-100 by
    // (priority desc, id).
    "q117_weighted_sample" ->
      s"""SELECT doc_id, n_chars,
            round(ln((${charHashSql("CAST(doc_id AS VARCHAR) || ':13'")} % 1000000 + 1)
                     / 1000001.0) / n_chars, 6) AS priority
          FROM documents
          WHERE n_chars > 0
          ORDER BY priority DESC, doc_id
          LIMIT 100""",
    // The multiplicative permutation key restated in BIGINT arithmetic:
    // p = 1e9+7, a = 2654435761 mod p = 654435747, multiplier a^(3+1)
    // mod p inlined as a power chain (each product < 2^63).
    "q127_epoch_shuffle" ->
      s"""SELECT doc_id,
            ((doc_id % 1000000007) *
             ((((((CAST(654435747 AS BIGINT) * 654435747) % 1000000007)
                * 654435747) % 1000000007) * 654435747) % 1000000007))
             % 1000000007 AS shuffle_key
          FROM documents""",
    // Same rank rule as the operator: (value desc, id asc), rank ≤ k.
    "q89_grouped_topk" ->
      """SELECT o_custkey, CAST(rank AS INT) AS rank, o_orderkey, o_totalprice
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rank
           FROM orders)
         WHERE rank <= 3""",
    // SCD2 restated set-wise: kept/closed rows for every base key, plus a
    // new open row per changed key.
    "q91_scd2_merge" ->
      """WITH base AS (SELECT c_custkey, c_acctbal FROM customer)
         SELECT c_custkey, c_acctbal, DATE '2026-01-01' AS valid_from,
           CASE WHEN c_custkey % 2 = 1 THEN DATE '2026-06-01' ELSE NULL END AS valid_to,
           c_custkey % 2 = 0 AS is_current
         FROM base
         UNION ALL
         SELECT c_custkey, c_acctbal + 100, DATE '2026-06-01', NULL, true
         FROM base WHERE c_custkey % 2 = 1""",
    "q92_upsert" ->
      """WITH base AS (SELECT c_custkey, c_acctbal FROM customer)
         SELECT c_custkey,
           CASE WHEN c_custkey % 2 = 1 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal
         FROM base
         UNION ALL
         SELECT c_custkey + 1000000, c_acctbal FROM base WHERE c_custkey <= 5""",
    // Mixture: same portable bucket, same rate table, same 64-token cap.
    "q98_source_mixture" -> {
      val toks = "list_filter(string_split(text, ' '), t -> t <> '')"
      s"""WITH b AS (
            SELECT doc_id, source, text,
              ${charHashSql("CAST(doc_id AS VARCHAR) || ':11'")} % 100 AS bucket
            FROM documents),
          k AS (
            SELECT doc_id, source, text FROM b
            WHERE bucket < CASE source WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
                                       WHEN 'src2' THEN 0 ELSE 25 END)
          SELECT doc_id, source,
            array_to_string(($toks)[1:64], ' ') AS text_capped,
            CAST(least(len($toks), 64) AS INT) AS n_tok_out
          FROM k"""
    },
    // q101: same restatement as q97 but with DuckDB's own HLL sketch for
    // n_distinct — approx-by-nature, so the driver's rows+schema checks
    // (not the value hash) are the cross-engine gate; AccuracySpec bounds
    // the estimates and tools/check.py compares with a tolerance.
    "q101_profile_hll" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS n_null,
            CAST(approx_count_distinct($c) AS BIGINT) AS n_distinct,
            CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max
            FROM lineitem""")
      .mkString("\nUNION ALL\n"),
    // One SELECT per profiled column, stitched with UNION ALL.
    "q97_profile" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c =>
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS n_null,
            CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
            CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max
            FROM lineitem""")
      .mkString("\nUNION ALL\n"),
    // The serial statement of the packing: one global running sum.
    "q96_sequence_pack" ->
      """WITH c AS (
           SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tok
           FROM documents),
         s AS (
           SELECT doc_id, n_tok,
             CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
               - n_tok AS cum0
           FROM c)
         SELECT doc_id, n_tok,
           CAST(cum0 // 512 AS BIGINT) AS pack_id,
           (cum0 % 512) + n_tok > 512 AS straddles
         FROM s""",
    // The bloom prefilter must be invisible in the result: plain join.
    "q93_bloom_join" ->
      """SELECT o_orderkey, o_custkey, c_acctbal
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_acctbal > 9000""",
    "q85_curation_pipeline" ->
      s"""WITH norm AS (
            SELECT doc_id,
              trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                   ' +', ' ', 'g')) AS norm
            FROM documents),
          gated AS (
            SELECT doc_id, norm FROM norm
            WHERE len(list_filter(string_split(norm, ' '), t -> t <> '')) >= 50),
          dedup AS (
            SELECT min(doc_id) AS doc_id FROM gated
            GROUP BY ${charHashSql("norm")})
          SELECT doc_id,
            CASE WHEN ${charHashSql("CAST(doc_id AS VARCHAR) || ':7'")} % 100 < 90
                 THEN 'train' ELSE 'holdout' END AS split
          FROM dedup""",
    // Rates re-derived in SQL: sqrt and division are correctly-rounded
    // IEEE ops, so the floor'd integer rates match Spark's exactly.
    "q136_temperature_mixture" ->
      s"""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
          m AS (SELECT min(n) AS nmin FROM c),
          r AS (SELECT source, n AS n_total,
                  GREATEST(
                    CAST(floor(100.0 * sqrt(CAST(nmin AS DOUBLE) / n)) AS BIGINT),
                    1) AS rate_pct
                FROM c, m),
          kept AS (
            SELECT d.source, r.rate_pct, r.n_total FROM documents d
            JOIN r USING (source)
            WHERE ${charHashSql("CAST(doc_id AS VARCHAR) || ':11'")} % 100
                  < r.rate_pct)
          SELECT source, rate_pct, count(*) AS n_kept, n_total
          FROM kept GROUP BY source, rate_pct, n_total""",
    // The interleave restated as a per-bit list fold: even positions from
    // l_partkey, odd from l_suppkey (disjoint bits, so + is |).
    "q133_zorder_stats" ->
      """WITH z AS (
           SELECT l_partkey, l_suppkey,
             CAST(list_sum(list_transform(range(0, 16), i ->
               ((((l_partkey % 65536) >> i) & 1) << (2*i))
               + ((((l_suppkey % 65536) >> i) & 1) << (2*i + 1)))) AS BIGINT)
               AS zval
           FROM lineitem)
         SELECT zval >> 27 AS zbucket, count(*) AS n,
                min(l_partkey) AS min_part, max(l_partkey) AS max_part,
                min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
                min(zval) AS min_z, max(zval) AS max_z
         FROM z GROUP BY zbucket""",
    // The 3-ary interleave: bit i of key j at position 3*i + j (disjoint
    // bits, so + is |).
    "q150_zorder3_stats" ->
      """WITH z AS (
           SELECT l_partkey, l_suppkey, l_orderkey,
             CAST(list_sum(list_transform(range(0, 8), i ->
               ((((l_partkey % 256) >> i) & 1) << (3*i))
               + ((((l_suppkey % 256) >> i) & 1) << (3*i + 1))
               + ((((l_orderkey % 256) >> i) & 1) << (3*i + 2)))) AS BIGINT)
               AS zval
           FROM lineitem)
         SELECT zval >> 19 AS zbucket, count(*) AS n,
                min(l_partkey) AS min_part, max(l_partkey) AS max_part,
                min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
                min(l_orderkey) AS min_ord, max(l_orderkey) AS max_ord,
                min(zval) AS min_z, max(zval) AS max_z
         FROM z GROUP BY zbucket""",
    // The oracle aggregates the parquet ORIGINALS; the Spark side reads
    // its orc round-trip copy — equality is the format-fidelity claim.
    "q151_orc_roundtrip" ->
      s"""SELECT source, count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                 min(doc_id) AS min_id, max(doc_id) AS max_id,
                 CAST(sum(${charHashSql("text")}) AS BIGINT) AS sum_fp
          FROM documents GROUP BY source""",
    // percent_rank() is (rank-1)/(n-1) with rank = 1 + |strictly
    // below| — the same exact-integer division the Spark side computes
    // from the counts frame; rounded 6 dp on both sides.
    "q154_source_pct_rank" ->
      """SELECT doc_id, source, n_chars,
                round(percent_rank() OVER (
                  PARTITION BY source ORDER BY n_chars), 6) AS pct_rank
         FROM documents"""
    ,
    // Ledger + batch sketches are all exact at this capacity, so the
    // summed estimates are the whole-corpus token counts and the
    // additive error mass is literally zero.
    "q155_incr_heavy_hitters" ->
      """SELECT token AS value, count(*) AS est, CAST(0 AS BIGINT) AS err_max
         FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
                 AS token FROM documents)
         GROUP BY token
         ORDER BY est DESC, value
         LIMIT 10"""
  )
}
