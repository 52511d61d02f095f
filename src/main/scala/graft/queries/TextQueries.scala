package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication corpus (SURVEY §2.3 E36-E38, E51,
  * E60-E62, E65, E68, E71 and the LLM-pipeline extension surface): token
  * stats, n-grams, language ID, quality scoring, token-count estimation,
  * fingerprinting, MinHash/LSH, SimHash (+ hamming-LSH pairs), n-gram
  * Jaccard, decontamination, PII scrubbing, and multimodal (binary
  * column) plumbing.
  *
  * The Spark side uses the native codegen'd Catalyst expressions behind
  * [[graft.functions.TextFunctions]] (HOF twins kept for parity tests);
  * the oracle side restates the same integer formulas from the shared SQL
  * fragments below, so both engines produce bit-identical Long results.
  * Everything is a per-row projection (narrow, whole-stage-codegen'd)
  * except the candidate-pair joins, which shuffle on (band, hash) /
  * n-gram — the standard scalable shape for near-dup detection at 100 TB
  * (never an O(n²) cross join).
  */
object TextQueries {

  // Every query here is dominated by per-row text work (hashing, shingling,
  // regex): ensure it spreads across cores even when the input is a
  // single-row-group file (no-op on already-parallel inputs).
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.parallel(Tables(s, dir, name))

  // ---- shared DuckDB fragments (keep in lockstep with TextFunctions) ----

  /** tokens(text): split on space, drop empties. */
  private val TokSql = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** charHash(e): fold (acc*31 + codepoint) mod 1e9+7, seed 7. */
  private def charHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      "(a, b) -> (a * 31 + b) % 1000000007)"

  /** distinct token-hash set. */
  private val TokHashesSql =
    s"list_distinct(list_transform($TokSql, t -> ${charHashSql("t")}))"

  // ---- codepoint-tier fragments (round 12) --------------------------

  /** The q149 augmentation suffix: U+3000 ideographic space, accented
    * BMP chars with a U+00A0 no-break space inside "déjà vu", and the
    * astral U+1F600 fused to the source value. One Scala constant feeds
    * BOTH the Spark literal and the SQL literal, so the two engines hash
    * identical bytes. */
  private[queries] val UnicodeProbeSuffix =
    "　déjà vu 😀"

  /** RE2 character class of the Unicode White_Space set, GENERATED from
    * [[graft.plans.TextHash.WhitespaceCp]] — the lockstep is by
    * construction, not by convention. */
  private val CpWsClassSql: String =
    graft.plans.TextHash.WhitespaceCp.map(cp => f"\\x{$cp%04X}")
      .mkString("[", "", "]")

  /** tokensCp(e): split on any White_Space codepoint, drop empties.
    * charHashSql already folds codepoints (string_split(s, '') splits
    * per codepoint and unicode(c) yields it), so the hash fragments are
    * shared between tiers; only the tokenizer differs. */
  private def cpTokSql(e: String): String =
    s"list_filter(regexp_split_to_array($e, '$CpWsClassSql'), t -> t <> '')"

  /** 3-gram word shingles over toks (`toks[i:i+2]` is 3 elements — DuckDB
    * slices are inclusive). */
  private val Shingle3Sql =
    "list_transform(range(1, greatest(len(toks) - 2, 0) + 1), " +
      "i -> array_to_string(toks[i:i+2], ' '))"

  /** distinct 3-gram shingle hashes (from a `toks` column). */
  private val ShingleHashes3Sql =
    s"list_distinct(list_transform($Shingle3Sql, g -> ${charHashSql("g")}))"

  /** distinct n-gram shingle hashes (from a `toks` column) — the
    * generalized form for the auto-tuned LSH oracle (q102). */
  private def shingleHashesSql(n: Int): String =
    s"list_distinct(list_transform(${shingleStrSql(n)}, g -> ${charHashSql("g")}))"

  /** MinHash sig element for permutation i over hash set hs. Empty hs →
    * list_min yields NULL → coalesce to 0, matching the native expression's
    * zero-fill empty-set contract (TextHash.minhashSig). */
  private val MinhashElemSql =
    "coalesce(list_min(list_transform(hs, h -> ((i + 1) * h + 7919 * i) % 2147483647)), 0)"

  /** Word n-gram shingle STRINGS over a `toks` column (DuckDB slices are
    * inclusive: toks[i:i+n-1] is n elements). */
  private def shingleStrSql(n: Int): String =
    s"list_transform(range(1, greatest(len(toks) - ${n - 1}, 0) + 1), " +
      s"i -> array_to_string(toks[i:i+${n - 1}], ' '))"

  /** Per-(band,hash) bucket-size cap for the LSH queries — matched by a
    * QUALIFY window filter in the oracle SQL so both engines drop the same
    * (fixture: zero) buckets. */
  private val LshMaxBucket = 10000

  /** The split-quality report q134/q143 share over a
    * [[graft.operators.SamplingOps.componentSplit]] assignment:
    * per-side doc/group counts plus the IN-ENGINE leak gate (groups
    * seen on both sides — 0 by construction of the group key). */
  private def groupSplitReport(assigned: DataFrame): DataFrame = {
    val leaked = assigned.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1)
      .agg(count(lit(1)).as("n_leaked_groups"))
    assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("grp")).as("n_groups"))
      .crossJoin(broadcast(leaked))
  }

  /** The MinHash→bands→pairs→min-label-closure restatement shared by the
    * components oracles (q103 appends its projection; q112 extends with the
    * canonical pick). Ends at the `reach` CTE — append `SELECT ...` or
    * `, more AS (...) SELECT ...`. The pairs CTE is q48's construction
    * verbatim. */
  private def minhashComponentsCteSql(shingleN: Int) =
    s"""WITH RECURSIVE sigs AS (
          SELECT doc_id,
                 list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
          FROM (SELECT doc_id, ${shingleHashesSql(shingleN)} AS hs
                FROM (SELECT doc_id, $TokSql AS toks FROM documents)
                WHERE len(toks) >= $shingleN)),
        bands AS (
          SELECT doc_id, CAST(b AS INT) AS b,
                 list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                             (a, x) -> (a * 31 + x) % 1000000007) AS bh
          FROM sigs, unnest(range(0, 4)) AS u(b)
          QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
          FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bh = b2.bh
          WHERE a.doc_id < b2.doc_id),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach AS (
          SELECT src AS v, src AS r FROM edges
          UNION
          SELECT e.src AS v, r.r
          FROM edges e JOIN reach r ON e.dst = r.v)"""

  private lazy val MinhashComponentsCteSql = minhashComponentsCteSql(3)

  /** q104's committed batch-1 band ledger, keyed by input dir — the same
    * build-once-per-dir fixture discipline (and Bench prewarm hook) as
    * OpsQueries' q77 ledger. */
  private val q104Ledgers =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q104Ledger(s: SparkSession, dir: String): String = q104Ledgers.synchronized {
    q104Ledgers.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_q104_ledger")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }))
      val path = root.resolve("bands").toString
      val batch1 = Tables(s, dir, "documents").filter(col("doc_id") % 2 === 0)
      graft.operators.LshOps.incrementalNeardup(
        s, batch1, "text", "doc_id", path, 16, 3, 4, 4, LshMaxBucket)
        .commitLedger()
      path
    })
  }

  /** q128's committed even-docs span-frequency ledger, keyed by input
    * dir — the same build-once-per-dir fixture discipline as
    * [[q104Ledger]]. */
  private val q128Ledgers =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def q128Ledger(s: SparkSession, dir: String): String = q128Ledgers.synchronized {
    q128Ledgers.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_q128_ledger")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }))
      val path = root.resolve("spans").toString
      val batch1 = Tables(s, dir, "documents").filter(col("doc_id") % 2 === 0)
      graft.operators.DedupOps.incrementalSpans(
        s, batch1, "text", "doc_id", path, spanTokens = 8)
        .commitLedger()
      path
    })
  }

  /** Per-(band,value) cap for the SimHash hamming-LSH query — organic max
    * bucket at sf1 is 71, so 200 never binds on non-degenerate data while
    * bounding candidate pairs linearly (see SimhashOps hazard 3). */
  private val SimhashMaxBucket = 200

  /** PII patterns (q82), restricted to syntax Java regex and RE2 (DuckDB)
    * interpret identically — no backreferences, no lookaround. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def markerListSql(lang: String): String =
    langMarkers.toMap.apply(lang).map(m => s"'$m'").mkString("(", ", ", ")")

  private def markerCountSql(lang: String): String =
    s"len(list_filter(toks, t -> t IN ${markerListSql(lang)}))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E36 token statistics per document.
    "q40_token_stats" -> ((s, dir) => {
      val toks = tokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_unique"),
        length(col("text")).as("n_chars_computed"))
    }),

    // E36 document frequency: docs containing each token. The explode →
    // groupBy shape is the scalable inverted-index build (map-side partial
    // aggregation; vocabulary-sized output).
    "q41_doc_frequency" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
    }),

    // E37 word-bigram shingles with corpus counts. Per-doc counts fold
    // natively (round 16): the explode emits distinct-per-doc bigrams
    // with counts, so the corpus aggregation's input shrinks by the
    // repetition factor; the vocabulary-keyed shuffle stays.
    "q42_ngrams" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(shingleCounts(col("text"), 2)))
        .groupBy(col("key"))
        .agg(sum(col("value")).as("n"))
        .select(col("key").as("ngram"), col("n"))
    }),

    // Language ID: deterministic marker-stopword argmax (fixture text is
    // synthetic word soup; the heuristic's contract is determinism).
    "q43_langid" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), col("lang").as("lang_label"),
        langId(col("text")).as("lang_pred"))
    }),

    // Quality scoring: length/stopword/size blend in [0,1].
    "q44_quality" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        round(stopwordRatio(col("text")), 4).as("stop_ratio"),
        qualityScore(col("text")).as("quality"))
    }),

    // Token counting: whitespace + BPE-ish regex estimate.
    "q45_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        tokenCountEstimate(col("text")).as("n_bpe_est"))
    }),

    // Document fingerprint: rolling char hash (exact-dup detection key).
    "q46_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        charHash(col("text")).as("fingerprint"))
    }),

    // E38 MinHash signatures (k=16) over 3-gram shingle sets, flattened to
    // (doc_id, i, h). Shingles, not unigram tokens: with a small vocabulary
    // the unigram token SET is near-identical across docs and every pair
    // collides; 3-gram shingles restore discriminative power (and match
    // the standard MinHash construction).
    "q47_minhash_sig" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(minhashShingleSignature(col("text"), 16, 3)).as(Seq("i", "h")))
    }),

    // E38 LSH banding (4 bands × 4 rows): docs sharing any band hash are
    // near-dup candidates. Shuffle key = (band, hash): candidates meet in
    // the same partition, no cross join — the 100 TB dedup shape. The
    // operator ([[graft.operators.LshOps]]) filters sub-3-token docs before
    // banding (empty shingle sets would all share one all-zero-signature
    // mega-bucket → O(n²) pairs on a real crawl), caps per-bucket occupancy,
    // and eagerly persists the banded frame so signatures compute once, not
    // once per self-join side.
    "q48_lsh_candidates" -> ((s, dir) => {
      val banded = graft.operators.LshOps.bandedMinhash(
        t(s, dir, "documents"), "text", "doc_id", 16, 3, 4, 4, LshMaxBucket)
      graft.operators.LshOps.candidatePairs(banded.bands, "doc_id")
    }),

    // E38 auto-tuned LSH (round 6): the engine PICKS the shingle width from
    // its own regime estimate (vocab sketch + doc count; the measured
    // saturation rule, SURVEY §7.3 hazard 9) and enforces the occupancy
    // gauge. On the fixture corpus (31-word vocabulary) the rule lands on
    // 4-gram shingles at every oracle scale — 31³ ≈ 30 k is below 100× the
    // doc count, 31⁴ ≈ 923 k clears it — so the oracle restates the 4-gram
    // construction and the hash-compare doubles as a pin on the choice
    // being deterministic.
    "q102_lsh_auto" -> ((s, dir) => {
      val auto = graft.operators.LshOps.bandedMinhashAuto(
        t(s, dir, "documents"), "text", "doc_id",
        k = 16, minShingleN = 3, nBands = 4, rowsPerBand = 4,
        maxBucket = LshMaxBucket)
      // The oracle SQL hardcodes the 4-gram choice, so the auto rule
      // flipping (the fixture's 31-word vocabulary flips to 5-grams past
      // ~9.2 k docs, i.e. beyond sf0.1's 5 k) must fail HERE, not as a
      // silent hash mismatch at the next fixture scale-up. If this trips,
      // re-pin shingleHashesSql(n) in the q102 oracle to the new choice.
      require(auto.shingleN == 4,
        s"q102's oracle pins 4-gram shingles but the auto rule chose " +
          s"${auto.shingleN} (docs=${auto.docCount}, vocab=${auto.vocabEstimate})")
      graft.operators.LshOps.candidatePairs(auto.banded.bands, "doc_id")
    }),

    // Near-dup CLUSTERS (round 6): connected components over the q48
    // candidate pairs — the transitive closure pairwise purging lacks
    // (a–b, b–c with no a–c edge is ONE cluster of three, not two
    // independent pairs). Iterative min-label propagation, all distributed
    // (see graft.operators.GraphOps); output labels every paired doc with
    // its component's minimum doc_id.
    "q103_dedup_components" -> ((s, dir) => {
      val banded = graft.operators.LshOps.bandedMinhash(
        t(s, dir, "documents"), "text", "doc_id", 16, 3, 4, 4, LshMaxBucket)
      val pairs = graft.operators.LshOps.candidatePairs(banded.bands, "doc_id")
      graft.operators.GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("v").as("doc_id"), col("component"))
    }),

    // E94 cluster-canonical selection: the retention policy production
    // near-dup dedup actually wants — per cluster keep the BEST member
    // (longest, doc_id tie-break), not an arbitrary id (q52's keep-min-id
    // drops the richer copy whenever the fuller document has the larger
    // id). Components as q103; the member→length join shuffles on doc_id;
    // the canonical pick is the bounded-buffer grouped top-1 (≤1 row per
    // cluster×partition in the shuffle) with the cluster size riding the
    // same frame — never a per-cluster window sort over the members.
    "q112_canonical_pick" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val banded = graft.operators.LshOps.bandedMinhash(
        docs, "text", "doc_id", 16, 3, 4, 4, LshMaxBucket)
      val pairs = graft.operators.LshOps.candidatePairs(banded.bands, "doc_id")
      val comp = graft.operators.GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
        .select(col("v").as("doc_id"), col("component"))
      val sized = comp.join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      // ONE aggregation: the bounded-buffer top-1 AND the cluster size ride
      // the same shuffle (a separate size agg would re-shuffle the members
      // and pay a second component-keyed join).
      sized.groupBy(col("component"))
        .agg(
          graft.operators.TopKOps.topK(1)(col("n_chars"), col("doc_id")).as("_tk"),
          count(lit(1)).cast("int").as("cluster_size"))
        .select(col("component"),
          element_at(col("_tk.items"), 1).getField("id").as("canonical_doc_id"),
          // topK carries the value as Double; restore the column's own type
          // (lossless: n_chars are exact in a double) for oracle parity.
          element_at(col("_tk.items"), 1).getField("v").cast("long")
            .as("canonical_n_chars"),
          col("cluster_size"))
    }),

    // Incremental NEAR-dup (round 6): the q77 ledger pattern extended to
    // LSH. Even doc_ids are "yesterday's corpus" (their survivor band
    // buckets committed to a ledger fixture, built once per dir — see the
    // q77 note on why); odd doc_ids are "today's crawl", near-deduped
    // against the ledger buckets and then within themselves. Drop-on-
    // collision semantics; see LshOps.incrementalNeardup.
    "q104_incr_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ledger = q104Ledger(s, dir)
      val batch2 = docs.filter(col("doc_id") % 2 === 1)
      graft.operators.LshOps.incrementalNeardup(
        s, batch2, "text", "doc_id", ledger, 16, 3, 4, 4, LshMaxBucket)
        .survivors.select(col("doc_id"))
    }),

    // E103 FUZZY cross-corpus decontamination: MinHash-banded BIPARTITE
    // join — training docs (even ids) that near-dup any held-out/benchmark
    // doc (odd ids), as (train_id, ref_id) evidence pairs. The near-dup
    // generalization of q73's exact 13-gram pass: exact matching misses
    // the paraphrased benchmark copy a crawl actually contains. One
    // equi-join on (band, bucket); at real scale the benchmark side is
    // tiny and broadcasts. See LshOps.crossCorpusPairs.
    "q122_cross_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.LshOps.crossCorpusPairs(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", 16, 3, 4, 4, LshMaxBucket)
    }),

    // E104 VERIFIED decontamination: q122's candidate pairs re-scored with
    // the exact n-gram Jaccard of the two documents, keeping pairs ≥ 0.5
    // — the text twin of the SRP/SemDeDup cosine-verify rule (purge on a
    // verified similarity, not on bucket-collision evidence alone). The
    // shingle-set projection is narrow and computed once per SIDE; only
    // LSH candidates pay the set-intersection score.
    "q123_contamination_verified" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.LshOps.verifiedContamination(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", minJaccard = 0.5, 16, 3, 4, 4, LshMaxBucket)
    }),

    // E105 cross-document duplicate-SPAN detection (Lee et al. 2022
    // ExactSubstr, restated shuffle-native): every 8-token window appearing
    // verbatim in >= 2 distinct documents, flagged at its position. The
    // span-level pass document-level dedup cannot replace — shared
    // license headers / boilerplate never near-dup as whole documents.
    "q124_duplicate_spans" -> ((s, dir) =>
      graft.operators.DedupOps.duplicateSpans(
        t(s, dir, "documents"), "text", "doc_id",
        spanTokens = 8, minDocs = 2)),

    // E106 span surgery: REMOVE every flagged duplicate span and keep the
    // document — the remedy for boilerplate that whole-doc purging
    // over-applies (dropping a 1 %-contaminated doc loses the 99 %).
    "q125_scrub_spans" -> ((s, dir) =>
      graft.operators.DedupOps.scrubSpans(
        t(s, dir, "documents"), "text", "doc_id",
        spanTokens = 8, minDocs = 2)),

    // E109 incremental duplicate-span detection: odd docs flagged against
    // the committed even-docs span-frequency ledger — cross-batch span
    // duplication the batch-local q124 pass cannot see. The ledger rule's
    // fifth space (fingerprints, band buckets, SRP buckets, clusters,
    // spans); see DedupOps.incrementalSpans.
    "q128_incr_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ledger = q128Ledger(s, dir)
      graft.operators.DedupOps.incrementalSpans(
        s, docs.filter(col("doc_id") % 2 === 1), "text", "doc_id", ledger,
        spanTokens = 8).flags
    }),

    // E112 hashed-feature linear classifier — the fastText/CCNet quality-
    // filter shape with fixture weights (pure function of the bucket
    // index, SQL-restatable) and integer scoring so the oracle
    // hash-matches instead of tolerance-gating. kept = score >= 0.
    "q129_classifier_gate" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        hashedLinearScore(col("text"), 4096, fixtureWeight).as("score"))
        .withColumn("kept", col("score") >= 0L)),

    // E107 knob-free decontamination: q123's verified decision at the
    // width DERIVED from the train side's regime (E87 rule), gauge
    // enforced — the construction a 100 TB corpus needs after the gsf10
    // measurement showed fixed 3-gram collisions growing 110× for 10×
    // docs. headroom=200 keeps the derivation at 4-grams across all
    // three fixture scales; the oracle pins 4, so a rule flip fails HERE
    // loudly (the q102 discipline), never as a silent hash mismatch.
    "q126_contamination_auto" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 2 === 0)
      val ref = docs.filter(col("doc_id") % 2 === 1)
      val auto = graft.operators.LshOps.crossCorpusPairsAuto(
        train, ref, "text", "doc_id", 16, 4, 4, LshMaxBucket, headroom = 200.0)
      require(auto.shingleN == 4,
        s"q126's oracle pins 4-gram shingles but the auto rule chose " +
          s"${auto.shingleN} (docs=${auto.trainCount}, vocab=${auto.vocabEstimate})")
      // Verify the SAME candidate frame the pin was checked on — calling
      // verifiedContaminationAuto here would re-run the whole banding
      // stage a second time per (timed) execution.
      graft.operators.LshOps.verifyPairs(
        auto.pairs, train, ref, "text", "doc_id", auto.shingleN, minJaccard = 0.5)
    }),

    // E102 overlapping token-window chunking: 64-token windows advancing
    // by 48 (16-token overlap) — the context-window preparation step
    // between curation and encoding. Narrow end to end (tokenize, window
    // count, posexplode, slice); no shuffle. See ChunkOps.chunkByTokens.
    "q121_chunk_windows" -> ((s, dir) =>
      graft.operators.ChunkOps.chunkByTokens(
        t(s, dir, "documents"), "text", "doc_id",
        chunkTokens = 64, strideTokens = 48)),

    // E120 PageRank centrality over the near-dup candidate graph (3
    // fixed iterations, d = 0.85): within a dedup cluster the
    // highest-rank member is the best-connected template — a retention
    // signal beside q112's longest-member pick. Per-iteration 6-dp
    // rounding quantizes away float-summation order, so the ranks are a
    // pure function of the graph on both engines.
    "q137_pagerank" -> ((s, dir) => {
      val banded = graft.operators.LshOps.bandedMinhash(
        t(s, dir, "documents"), "text", "doc_id", 16, 3, 4, 4, LshMaxBucket)
      val pairs = graft.operators.LshOps.candidatePairs(banded.bands, "doc_id")
      graft.operators.GraphOps.pageRank(pairs, "doc_a", "doc_b", iters = 3)
        .select(col("v").as("doc_id"), col("rank"))
    }),

    // E117 leakage-safe group-aware split: assign train/holdout by the
    // NEAR-DUP CLUSTER (components as q103; docs without candidates are
    // their own singleton group), so no near-duplicate pair ever spans
    // the boundary. The output carries the leak gate computed IN-ENGINE
    // (clusters with >1 distinct split — zero by construction, and the
    // oracle must reproduce that zero end-to-end) beside the per-split
    // doc/group counts.
    "q134_group_split" -> ((s, dir) => {
      val banded = graft.operators.LshOps.bandedMinhash(
        t(s, dir, "documents"), "text", "doc_id", 16, 3, 4, 4, LshMaxBucket)
      groupSplitReport(graft.operators.SamplingOps.componentSplit(
        t(s, dir, "documents"), "doc_id", banded.bands, trainPct = 90,
        seed = 42L, bucket = graft.operators.SamplingOps.portableBucket))
    }),

    // E113 tf-idf keyword extraction: top-3 terms per document. Corpus
    // statistics (df, N) are vocabulary-sized aggregates broadcast back;
    // the per-doc rank is a doc-partitioned window.
    "q130_tfidf_keywords" -> ((s, dir) =>
      graft.operators.RankOps.tfidfTopK(
        t(s, dir, "documents"), "text", "doc_id", k = 3)),

    // E114 BM25 ranked retrieval: global top-100 docs for a fixed bag of
    // query terms — scan → isin-pruned term explode → broadcast-joined
    // statistics → TakeOrderedAndProject (no full sort materialization).
    "q131_bm25_search" -> ((s, dir) =>
      graft.operators.RankOps.bm25(
        t(s, dir, "documents"), "text", "doc_id",
        terms = Seq("scan", "merge", "window", "stream"))),

    // E115 bigram-LM negative-log-likelihood scoring (the CCNet-style
    // perplexity-proxy quality signal), self-trained on the corpus: LM
    // count tables are vocab-sized, joined back by bigram / first token.
    "q132_bigram_lm" -> ((s, dir) =>
      graft.operators.RankOps.bigramLmScore(
        t(s, dir, "documents"), "text", "doc_id")),

    // E123 PMI collocation extraction: top-50 most-associated adjacent
    // word pairs (≥5 instances), integer counts + one rounded ln,
    // deterministic (pmi, bigram) cut via TakeOrderedAndProject.
    "q140_pmi_collocations" -> ((s, dir) =>
      graft.operators.RankOps.pmiCollocations(
        t(s, dir, "documents"), "text", minCount = 5, topN = 50)),

    // E128 auto-width leakage-safe split: q134's plan with the banding
    // width chosen by the corpus-regime rule instead of pinned 3-grams
    // (the decade probe shows the 3-gram pair input saturating at
    // gsf10; the auto rule is the corpus path). The q102/q126 oracle
    // discipline: the oracle SQL hardcodes the 4-gram choice the rule
    // makes on this corpus, so a flipped choice must fail HERE, loudly,
    // not as a silent hash mismatch at the next fixture scale-up. If
    // this trips, re-pin minhashComponentsCteSql(n) in the q143 oracle.
    "q143_group_split_auto" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val auto = graft.operators.LshOps.bandedMinhashAuto(
        docs, "text", "doc_id",
        k = 16, minShingleN = 3, nBands = 4, rowsPerBand = 4,
        maxBucket = LshMaxBucket)
      require(auto.shingleN == 4,
        s"q143's oracle pins 4-gram shingles but the auto rule chose " +
          s"${auto.shingleN} (docs=${auto.docCount}, vocab=${auto.vocabEstimate})")
      groupSplitReport(graft.operators.SamplingOps.componentSplit(
        docs, "doc_id", auto.banded.bands, trainPct = 90, seed = 42L,
        bucket = graft.operators.SamplingOps.portableBucket))
    }),

    // E126 conjunctive (AND) BM25: q131's bag restricted to documents
    // containing EVERY query term — the gate is a count over the same
    // pruned tf table the score reads (one row per present (doc, term)),
    // semi-joined back; no second corpus pass.
    "q141_conjunctive_search" -> ((s, dir) =>
      graft.operators.RankOps.conjunctiveBm25(
        t(s, dir, "documents"), "text", "doc_id",
        terms = Seq("scan", "merge", "window", "stream"))),

    // E127 exact-phrase retrieval: a phrase of length n IS an n-gram
    // shingle, so the match is the existing shingle explode + an
    // equality filter (narrow, no join); the only shuffle is the
    // doc-keyed occurrence count.
    "q142_phrase_match" -> ((s, dir) =>
      graft.operators.RankOps.phraseMatch(
        t(s, dir, "documents"), "text", "doc_id",
        phrase = Seq("sort", "merge"))),

    // E131 EXACT Jaccard τ-join via prefix filtering (AllPairs/PPJoin):
    // q50's contract without its per-shared-element join — candidates
    // only from short rarest-first prefixes, then exact verification.
    // The oracle is the NAIVE all-pairs join: the filter must reproduce
    // it bit for bit (exactness is the whole point). The prefix
    // filter's pruning power IS element rarity (measured at sf0.1:
    // 3-gram shingles saturate this generator's phrase inventory —
    // avg df 9.6, 409 k candidates for 256 true pairs — while 4-grams
    // prune perfectly: 256 candidates = 256 pairs), so the shingle
    // width comes from the SAME corpus-regime rule as the banded
    // family, with the q143 oracle discipline: the oracle SQL
    // hardcodes the 4-gram choice the rule makes on this corpus, and a
    // flipped choice fails HERE loudly, not as a silent hash mismatch.
    "q146_prefix_jaccard_join" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val n = graft.operators.LshOps.autoShingleN(docs, "text")
      require(n == 4, {
        // Lazy: the regime re-derivation runs only when the pin fires,
        // and reports the numbers the re-pin decision needs (the q143
        // message discipline).
        val (nDocs, vocab) = graft.operators.LshOps.corpusRegime(docs, "text")
        s"q146's oracle pins 4-gram shingles but the regime rule chose " +
          s"$n (docs=$nDocs, vocab=$vocab)"
      })
      graft.operators.SetJoinOps.prefixJaccardJoin(
        docs.select(col("doc_id"), shingles(col("text"), n).as("sh")),
        "doc_id", "sh", tau = 0.5)
    }),

    // E132 class-based tf-idf (c-TF-IDF): top-5 terms characterizing
    // each SOURCE, each class one concatenated pseudo-document — the
    // corpus-auditing complement of per-doc tf-idf (q130).
    "q147_source_ctfidf" -> ((s, dir) =>
      graft.operators.RankOps.classTfidf(
        t(s, dir, "documents"), "text", "source", k = 5)),

    // E135 BATCH BM25 (round 12): a query TABLE scored in ONE corpus
    // pass — Q queries must not cost Q corpus explodes. Three queries
    // sharing a term ('scan') pin the fan-out join; per-query top-10.
    "q152_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq(
        (1L, "scan"), (1L, "merge"), (1L, "window"),
        (2L, "stream"), (2L, "filter"),
        (3L, "join"), (3L, "hash"), (3L, "scan"))
        .toDF("query_id", "term")
      graft.operators.RankOps.bm25Batch(
        t(s, dir, "documents"), "text", "doc_id", qs, topN = 10)
    }),

    // E136 heavy hitters (round 12): Misra–Gries frequent-items sketch
    // — fixed-memory map-side state, mergeable, undercount bounded by
    // the reported err_max. Capacity 64 exceeds this fixture's 31-token
    // vocab, so the sketch never decrements: est is EXACT and err_max
    // is 0, which is precisely what the oracle pins (the lossy regime
    // is driven against exact counts in SketchOpsSpec).
    "q153_heavy_hitters" -> ((s, dir) =>
      graft.operators.SketchOps.heavyHitterTokens(
        t(s, dir, "documents"), "text", capacity = 64, k = 10)),

    // E134 codepoint text tier (round 12): the dedup primitives on
    // Unicode-correct semantics — codepoint hash folds (astral chars are
    // ONE codepoint, not two UTF-16 units) and tokenization on the full
    // Unicode White_Space set (TextHash.WhitespaceCp; the oracle's
    // regex class is generated from the same array). The fixture text is
    // ASCII, so the query plants the hard cases itself: every doc gets a
    // suffix holding an ideographic space (U+3000), accented BMP chars,
    // a no-break space INSIDE "déjà vu" (a token boundary only on this
    // tier), and an astral emoji fused to the per-doc source — then
    // fingerprints, MinHash, and SimHash must match the oracle's
    // codepoint arithmetic bit for bit. The suffix guarantees >= 2
    // tokens per doc, so the empty-shingle contract is never in play.
    "q149_unicode_text_tier" -> ((s, dir) => {
      val aug = concat(col("text"), lit(UnicodeProbeSuffix), col("source"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(tokensCp(aug)).as("n_toks"),
        charHashCp(aug).as("fingerprint"),
        element_at(minhashShingleSignatureCp(aug, 4, 2), 1).as("mh0"),
        element_at(minhashShingleSignatureCp(aug, 4, 2), 2).as("mh1"),
        simhashShingle60Cp(aug, 2).as("sim60"))
    }),

    // Dedup purge list: the keep-min-id policy applied to the LSH candidate
    // pairs — every doc that collides with a smaller doc_id is dropped.
    // Since candidates are emitted with doc_a < doc_b, the purge set is
    // exactly the distinct doc_b side. Shares the persisted band frame with
    // q48 via the cache manager (same canonical plan → same cache entry).
    "q52_neardup_purge" -> ((s, dir) => {
      val banded = graft.operators.LshOps.bandedMinhash(
        t(s, dir, "documents"), "text", "doc_id", 16, 3, 4, 4, LshMaxBucket)
      graft.operators.LshOps.purgeList(banded.bands, "doc_id")
    }),

    // SimHash (30-bit) per document.
    "q49_simhash" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"), simhash30(col("text")).as("simhash"))
    }),

    // E71 SimHash near-dup pairs via hamming-LSH banding: 60-bit
    // bigram-shingle SimHash split into 4 bands of 15 bits; docs sharing
    // any band value are candidates, then the exact hamming distance
    // filters to ≤ 6. Same keyed-join-never-cross-join shape as q48.
    // Bigram shingles (not unigram tokens) because the fixture's small
    // vocabulary makes token-set SimHashes cluster into one near-identical
    // blob; 60 bits (not 30) because 10-bit bands saturate at corpus scale
    // — the round-5 sf1 measurement caught candidate pairs growing O(n²)
    // (58 k → 5.9 M for 10× data). 4 bands ⇒ pairs with ≤ 3 differing bits
    // are guaranteed candidates (pigeonhole); beyond that, standard LSH
    // recall. Short-doc filter + per-bucket cap + overflow metric live in
    // the operator ([[graft.operators.SimhashOps]]), like LshOps.
    "q84_simhash_neardup" -> ((s, dir) => {
      val banded = graft.operators.SimhashOps.bandedSimhash(
        t(s, dir, "documents"), "text", "doc_id", 2, SimhashMaxBucket)
      graft.operators.SimhashOps.neardupPairs(banded.bands, "doc_id", 6)
    }),

    // n-gram Jaccard similarity on a bounded subset: candidate pairs meet
    // via the shared-ngram join (inverted index), never a cross join.
    // The subset bound is the operator's honest limit — one join row per
    // SHARED n-gram saturates on common shingles; the corpus-scale exact
    // path is the prefix-filtered join (E131/q146), which meets pairs
    // only through rarest-first prefixes and verifies exactly.
    "q50_ngram_jaccard" -> ((s, dir) => {
      // `grams` feeds three plan branches (sizes + both inter sides):
      // persist so shingling runs once, not three times.
      val grams = t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(array_distinct(shingles(col("text"), 2))).as("ng"))
        .persist()
      grams.count() // eager: shingling runs once, no cache-population race
      val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = grams.select(col("doc_id").as("doc_a"), col("ng"))
        .join(grams.select(col("doc_id").as("doc_b"), col("ng")), Seq("ng"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .select(
          col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.08)
    }),

    // Benchmark decontamination: flag corpus docs sharing any 5-gram
    // shingle with the "benchmark" set (docs 0-19) — the standard eval-set
    // contamination check run before training. The benchmark shingle set is
    // tiny and broadcast; the corpus side is a narrow explode → one
    // broadcast join, no shuffle of document text.
    "q73_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") < 20)
        .select(explode(array_distinct(shingles(col("text"), 5))).as("sh"))
        .distinct()
      val corpus = docs.filter(col("doc_id") >= 20)
        .select(col("doc_id"), explode(array_distinct(shingles(col("text"), 5))).as("sh"))
      corpus.join(broadcast(bench), Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // Repetition ratio (Gopher-style quality rule): fraction of repeated
    // word bigrams per doc. Narrow projection.
    "q74_repetition" -> ((s, dir) => {
      val bi = shingles(col("text"), 2)
      t(s, dir, "documents")
        .filter(size(tokens(col("text"))) >= 2)
        .select(
          col("doc_id"),
          size(bi).as("n_bigrams"),
          size(array_distinct(bi)).as("n_unique_bigrams"),
          round(lit(1.0) -
            size(array_distinct(bi)).cast("double") / size(bi).cast("double"), 4)
            .as("rep_ratio"))
    }),

    // Composite quality gate (length + mean token length + stopword ratio
    // thresholds): the keep/drop decision a filtering pipeline applies per
    // doc. Booleans compare UNROUNDED doubles — both engines compute the
    // identical int/int division, so the comparison is deterministic.
    "q75_quality_gate" -> ((s, dir) => {
      val nTok = size(tokens(col("text"))).cast("double")
      val avgLen = length(col("text")).cast("double") / nTok
      val stopRatio = langMarkerCount(col("text"), "en").cast("double") / nTok
      t(s, dir, "documents").select(
        col("doc_id"),
        nTok.cast("int").as("n_tokens"),
        round(avgLen, 4).as("avg_len"),
        round(stopRatio, 4).as("stop_ratio"),
        (nTok >= 50 && nTok <= 100000 &&
          avgLen >= 3.0 && avgLen <= 12.0 && stopRatio >= 0.01).as("pass"))
    }),

    // Text normalization — the canonicalization step before fingerprinting
    // or dedup: lowercase, strip punctuation, collapse runs of whitespace,
    // trim. Narrow projection; emitted alongside a fingerprint OVER the
    // normalized form to show the compose-with-dedup shape.
    "q76_normalize" -> ((s, dir) => {
      val normalized = trim(
        regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " "))
      t(s, dir, "documents").select(
        col("doc_id"),
        normalized.as("norm_text"),
        charHash(normalized).as("norm_fingerprint"))
    }),

    // E75 token entropy (Shannon, natural log) per document — the
    // "gibberish or natural text" quality signal (low entropy = repeated
    // boilerplate, high = random noise). H = ln(n) − (Σ c·ln c)/n over
    // per-token counts. Both engines fold the SAME token-sorted order
    // (array_sort here, list(... ORDER BY tok) in the oracle), so float
    // addition order — normally partition-dependent in a groupBy — is
    // pinned and the result is bit-identical and layout-independent.
    "q87_token_entropy" -> ((s, dir) => {
      // Round 16: ONE native codegen'd expression per row — the former
      // two shuffles (groupBy(doc, tok) then collect_list) became a
      // projection, and the intermediate HOF formulation (two `aggregate`
      // folds over array_sort(map_entries)) was measured 3.6× SLOWER at
      // the 10× corpus: HOFs are CodegenFallback, so the projection ran
      // interpreted and re-evaluated the array per consuming column.
      // TokenEntropyExpr folds the identical token-sorted float sums
      // (UTF8String binary order = array_sort's = the oracle's ORDER BY)
      // and returns the UNROUNDED raw value; the round(6) stays here.
      // Token-less docs are null → filtered, as the explode-based row
      // drop always did.
      t(s, dir, "documents")
        .select(col("doc_id"), tokenEntropy(col("text")).as("_e"))
        .filter(col("_e").isNotNull)
        .select(
          col("doc_id"),
          round(col("_e").getField("raw"), 6).as("entropy"),
          col("_e").getField("n_unique").as("n_unique"))
    }),

    // E77 BM25 keyword extraction: top-3 highest-BM25 terms per document —
    // TF-IDF/BM25 scoring as the corpus-relevance primitive plus a per-doc
    // keyword pick. k1=1.2, b=0.75 (the standard Robertson parameters).
    // Scale shape: tf is ONE shuffle on (doc_id, token); df reuses tf with
    // one more agg; the two global scalars (N, avg doc length) ride a
    // 1-row broadcast; the final per-doc rank windows over doc_id, whose
    // group size is bounded by a document's vocabulary — never corpus-wide.
    // Rank is over the ROUNDED score with a token tie-break (cross-engine
    // float rule), and ln inputs are "random real" ratios so 4 dp is
    // boundary-safe.
    "q90_bm25_keywords" -> ((s, dir) => {
      val k1 = 1.2; val b = 0.75
      val docs = t(s, dir, "documents")
      // The tf frame feeds three consumers (corpus stats, doc frequency,
      // the scoring join): materialize it so the corpus is tokenized ONCE
      // — unpersisted, the plan replicates the explode+agg subtree per
      // consumer (round 4's shuffle-count gate caught exactly that: 13
      // exchanges, 3 corpus scans). Tables.materialize picks
      // localCheckpoint (bench) or reliable checkpoint (cluster) from
      // spark.graft.reliableCheckpoint — see its scaladoc for the
      // executor-loss tradeoff.
      // Round 16: the native per-doc count map makes tf scan→project —
      // no per-occurrence explode, no (doc, token) exchange at all, and
      // dlen rides along from the same struct (the former plan re-derived
      // it with a window sum over the rank window's partitioning).
      val tf = graft.Tables.materialize(docs
        .select(col("doc_id"), tokenCounts(col("text")).as("_tc"))
        .select(col("doc_id"), col("_tc").getField("dl").cast("double").as("dlen"),
          explode(col("_tc").getField("counts")))
        .select(col("doc_id"), col("dlen"), col("key").as("token"),
          col("value").cast("double").as("tf")))
      // Corpus scalars from tf alone: avg doc length = Σtf / #docs (token
      // counts are integer-valued doubles, so the sums are exact and the
      // division matches the oracle's avg() bit-for-bit).
      val stats = tf.agg(
        countDistinct(col("doc_id")).cast("double").as("n_docs"),
        sum(col("tf")).as("total_tok"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
      import org.apache.spark.sql.expressions.Window
      val idf = log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val tfPart = col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dlen") / col("avg_len")))
      tf
        .join(dfreq, "token")
        .crossJoin(broadcast(stats))
        .withColumn("avg_len", col("total_tok") / col("n_docs"))
        .withColumn("score", round(idf * tfPart * 1e4) / 1e4)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("token"))))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("token"), col("score"))
    }),

    // E81 sub-document (segment) dedup — the C4-style boilerplate strip:
    // any 10-token segment occurring ≥2× corpus-wide is removed from every
    // doc; unique prose survives. See graft.operators.LineDedupOps.
    "q95_line_dedup" -> ((s, dir) =>
      graft.operators.LineDedupOps.stripRepeatedSegments(
        t(s, dir, "documents"), "text", "doc_id", segTokens = 10, maxOcc = 2)),

    // E74 cross-source overlap audit: for every pair of ingestion sources,
    // how many distinct 5-gram shingles they share — the "is source B just
    // a re-crawl of source A" question asked before merging corpora.
    // Inverted-index shape: shuffle on the shingle, so per-shingle work is
    // bounded by the (small) source count squared, never doc², and the
    // output is sources² rows regardless of corpus size.
    "q86_source_overlap" -> ((s, dir) => {
      val sh = t(s, dir, "documents")
        .select(col("source"), explode(array_distinct(shingles(col("text"), 5))).as("sh"))
        .distinct()
      val a = sh.select(col("source").as("src_a"), col("sh"))
      val b = sh.select(col("source").as("src_b"), col("sh"))
      a.join(b, Seq("sh")).filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // E68 PII scrubbing — the redaction pass a training-data pipeline runs
    // before any text ships: count and replace emails / IPv4 literals.
    // Synthetic PII is injected deterministically (the word-soup fixture
    // has none), so the scrubber has real matches and both engines build
    // the identical input. Narrow regex projection: linear at 100 TB.
    "q82_pii_scrub" -> ((s, dir) => {
      val enriched = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0.0."),
        pmod(col("doc_id"), lit(256)).cast("string"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(enriched, lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(enriched, lit(Ipv4Re), lit(0))).as("n_ips"),
        regexp_replace(regexp_replace(enriched, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
          .as("scrubbed"))
    }),

    // Multimodal plumbing: opaque binary payload column + typed metadata.
    // The "decode" is a clearly-stubbed deterministic fake (no image libs
    // in this environment); the schema/expression shape is the real part.
    "q51_multimodal_meta" -> ((s, dir) => {
      val payload = col("text").cast("binary")
      val fp = charHash(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        length(payload).as("n_bytes"),
        // STUB decode: width/height derived from the payload fingerprint.
        (fp % 640).cast("int").as("fake_width"),
        (fp % 480).cast("int").as("fake_height"),
        lit(3).as("fake_channels"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q40_token_stats" ->
      s"""SELECT doc_id,
          CAST(len($TokSql) AS INT) AS n_tokens,
          CAST(len(list_distinct($TokSql)) AS INT) AS n_unique,
          CAST(length(text) AS INT) AS n_chars_computed
          FROM documents""",
    "q41_doc_frequency" ->
      s"""SELECT token, count(*) AS df FROM
          (SELECT doc_id, unnest(list_distinct($TokSql)) AS token FROM documents)
          GROUP BY token""",
    "q42_ngrams" ->
      s"""SELECT ngram, count(*) AS n FROM
          (SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                  i -> array_to_string(toks[i:i+1], ' '))) AS ngram
           FROM (SELECT $TokSql AS toks FROM documents))
          GROUP BY ngram""",
    "q43_langid" ->
      s"""SELECT doc_id, lang AS lang_label,
          CASE WHEN en >= de AND en >= es AND en >= fr THEN 'en'
               WHEN de >= es AND de >= fr THEN 'de'
               WHEN es >= fr THEN 'es'
               ELSE 'fr' END AS lang_pred
          FROM (SELECT doc_id, lang,
                ${markerCountSql("en")} AS en, ${markerCountSql("de")} AS de,
                ${markerCountSql("es")} AS es, ${markerCountSql("fr")} AS fr
                FROM (SELECT doc_id, lang, $TokSql AS toks FROM documents))""",
    "q44_quality" ->
      s"""SELECT doc_id,
          CAST(n_tok AS INT) AS n_tokens,
          round(CAST(n_stop AS DOUBLE) / n_tok, 4) AS stop_ratio,
          round((least((length(text) / CAST(n_tok AS DOUBLE)) / 10.0, 1.0) * 0.4
              + (CAST(n_stop AS DOUBLE) / n_tok) * 0.4
              + least(n_tok / 100.0, 1.0) * 0.2) * 10000) / 10000 AS quality
          FROM (SELECT doc_id, text, len(toks) AS n_tok,
                ${markerCountSql("en")} AS n_stop
                FROM (SELECT doc_id, text, $TokSql AS toks FROM documents))""",
    "q45_token_count" ->
      s"""SELECT doc_id,
          CAST(len($TokSql) AS INT) AS n_ws_tokens,
          CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))
             + CAST(ceil(length(text) / 4.0) AS BIGINT) AS INT) AS n_bpe_est
          FROM documents""",
    "q46_fingerprint" ->
      s"""SELECT doc_id, ${charHashSql("text")} AS fingerprint FROM documents""",
    "q47_minhash_sig" ->
      s"""SELECT doc_id, CAST(i AS INT) AS i, $MinhashElemSql AS h
          FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                FROM (SELECT doc_id, $TokSql AS toks FROM documents)),
               unnest(range(0, 16)) AS u(i)""",
    "q48_lsh_candidates" ->
      s"""WITH sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents)
                  WHERE len(toks) >= 3)),
          bands AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM sigs, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket)
          SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
          FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bh = b2.bh
          WHERE a.doc_id < b2.doc_id""",
    // The auto-tuned construction with the choice the regime rule makes on
    // this corpus (4-gram shingles) spelled out — a changed choice would
    // hash-mismatch, pinning the auto path's determinism at oracle scales.
    "q102_lsh_auto" ->
      s"""WITH sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, ${shingleHashesSql(4)} AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents)
                  WHERE len(toks) >= 4)),
          bands AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM sigs, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket)
          SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
          FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bh = b2.bh
          WHERE a.doc_id < b2.doc_id""",
    // Transitive closure via a recursive CTE: component(v) = min reachable
    // id. The pairs CTE is q48's construction verbatim (shared prefix:
    // MinhashComponentsCteSql).
    "q103_dedup_components" ->
      s"""$MinhashComponentsCteSql
          SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v""",
    // The retention policy on top of the same closure: rank each cluster
    // member by (n_chars desc, doc_id), keep rank 1 as the canonical.
    "q112_canonical_pick" ->
      s"""$MinhashComponentsCteSql,
          comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
          sized AS (SELECT c.component, c.doc_id, d.n_chars
                    FROM comp c JOIN documents d USING (doc_id))
          SELECT component, doc_id AS canonical_doc_id,
                 n_chars AS canonical_n_chars, CAST(sz AS INT) AS cluster_size
          FROM (SELECT component, doc_id, n_chars,
                       row_number() OVER (PARTITION BY component
                         ORDER BY n_chars DESC, doc_id) AS rn,
                       count(*) OVER (PARTITION BY component) AS sz
                FROM sized)
          WHERE rn = 1""",
    // Both halves restated: evens band + self-purge → survivor buckets
    // (the ledger), then odds drop on ledger collision and self-purge.
    "q104_incr_neardup" ->
      s"""WITH e_sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents
                        WHERE doc_id % 2 = 0)
                  WHERE len(toks) >= 3)),
          e_bands AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM e_sigs, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket),
          e_drops AS (
            SELECT DISTINCT b2.doc_id AS drop_id
            FROM e_bands a JOIN e_bands b2 ON a.b = b2.b AND a.bh = b2.bh
            WHERE a.doc_id < b2.doc_id),
          eledger AS (
            SELECT DISTINCT b, bh FROM e_bands
            WHERE doc_id NOT IN (SELECT drop_id FROM e_drops)),
          o_sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents
                        WHERE doc_id % 2 = 1)
                  WHERE len(toks) >= 3)),
          o_bands AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM o_sigs, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket),
          hits AS (
            SELECT DISTINCT doc_id
            FROM o_bands JOIN eledger USING (b, bh)),
          kept AS (
            SELECT * FROM o_bands
            WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
          o_drops AS (
            SELECT DISTINCT b2.doc_id AS drop_id
            FROM kept a JOIN kept b2 ON a.b = b2.b AND a.bh = b2.bh
            WHERE a.doc_id < b2.doc_id)
          SELECT doc_id FROM documents WHERE doc_id % 2 = 1
            AND doc_id NOT IN (SELECT doc_id FROM hits)
            AND doc_id NOT IN (SELECT drop_id FROM o_drops)""",
    // Bipartite restatement of q122: evens' bands × odds' bands, per-side
    // occupancy caps (each side is banded independently), distinct pairs.
    "q122_cross_contamination" ->
      s"""WITH e_sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents
                        WHERE doc_id % 2 = 0)
                  WHERE len(toks) >= 3)),
          e_bands AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM e_sigs, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket),
          o_sigs2 AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents
                        WHERE doc_id % 2 = 1)
                  WHERE len(toks) >= 3)),
          o_bands2 AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM o_sigs2, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket)
          SELECT DISTINCT e.doc_id AS train_id, o.doc_id AS ref_id
          FROM e_bands e JOIN o_bands2 o ON e.b = o.b AND e.bh = o.bh""",
    // q122's pair CTEs + the exact-Jaccard verification: per side the
    // distinct shingle-hash set, per pair |∩| / (|a|+|b|−|∩|), keep ≥ 0.5.
    "q123_contamination_verified" ->
      s"""WITH e_sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents
                        WHERE doc_id % 2 = 0)
                  WHERE len(toks) >= 3)),
          e_bands AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM e_sigs, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket),
          o_sigs2 AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents
                        WHERE doc_id % 2 = 1)
                  WHERE len(toks) >= 3)),
          o_bands2 AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM o_sigs2, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket),
          pairs AS (
            SELECT DISTINCT e.doc_id AS train_id, o.doc_id AS ref_id
            FROM e_bands e JOIN o_bands2 o ON e.b = o.b AND e.bh = o.bh),
          ths AS (
            SELECT doc_id AS train_id, $ShingleHashes3Sql AS hs
            FROM (SELECT doc_id, $TokSql AS toks FROM documents
                  WHERE doc_id % 2 = 0)),
          rhs AS (
            SELECT doc_id AS ref_id, $ShingleHashes3Sql AS hs
            FROM (SELECT doc_id, $TokSql AS toks FROM documents
                  WHERE doc_id % 2 = 1))
          SELECT train_id, ref_id, jaccard FROM (
            SELECT p.train_id, p.ref_id,
              round(CAST(len(list_intersect(t.hs, r.hs)) AS DOUBLE)
                / (len(t.hs) + len(r.hs) - len(list_intersect(t.hs, r.hs))), 4)
                AS jaccard
            FROM pairs p
            JOIN ths t USING (train_id)
            JOIN rhs r USING (ref_id))
          WHERE jaccard >= 0.5""",
    // Span semantics restated by grouping on the window STRING (the native
    // side groups on the 94-bit hash pair it never emits; the two differ
    // only on a hash collision). DuckDB slices are inclusive and lambda
    // indexes are 1-based — hence toks[i:i+7] and the i-1 shift.
    "q124_duplicate_spans" ->
      s"""WITH tk AS (SELECT doc_id, $TokSql AS toks FROM documents),
          sp AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS start_tok,
                   array_to_string(toks[i:i+7], ' ') AS g
            FROM tk, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)),
          f AS (
            SELECT g, count(DISTINCT doc_id) AS n_docs
            FROM sp GROUP BY g HAVING count(DISTINCT doc_id) >= 2)
          SELECT sp.doc_id, sp.start_tok, f.n_docs FROM sp JOIN f USING (g)""",
    "q125_scrub_spans" ->
      s"""WITH tk AS (SELECT doc_id, $TokSql AS toks FROM documents),
          sp AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS start_tok,
                   array_to_string(toks[i:i+7], ' ') AS g
            FROM tk, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)),
          f AS (SELECT g FROM sp GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
          starts AS (
            SELECT doc_id, list(DISTINCT start_tok) AS sts
            FROM sp JOIN f USING (g) GROUP BY doc_id),
          clean AS (
            SELECT tk.doc_id, toks,
              list_filter(toks, (x, i) ->
                len(list_filter(coalesce(sts, CAST([] AS INT[])),
                                st -> i - 1 >= st AND i - 1 < st + 8)) = 0) AS kept
            FROM tk LEFT JOIN starts USING (doc_id))
          SELECT doc_id,
                 coalesce(array_to_string(kept, ' '), '') AS clean_text,
                 CAST(len(toks) - len(kept) AS INT) AS n_removed
          FROM clean""",
    // Integer bag-of-words dot product over hashed buckets; empty token
    // lists coalesce to 0 (list_sum of [] is NULL in DuckDB, Spark's
    // aggregate seed is 0).
    "q129_classifier_gate" ->
      s"""SELECT doc_id,
            CAST(coalesce(list_sum(list_transform($TokSql, t ->
              ((${charHashSql("t")} % 4096) * CAST(2654435761 AS BIGINT))
                % 1000000007 % 2001 - 1000)), 0) AS BIGINT) AS score,
            CAST(coalesce(list_sum(list_transform($TokSql, t ->
              ((${charHashSql("t")} % 4096) * CAST(2654435761 AS BIGINT))
                % 1000000007 % 2001 - 1000)), 0) AS BIGINT) >= 0 AS kept
          FROM documents""",
    // Ledger counts restated as the even side's per-gram distinct-doc
    // counts; a flag needs even + odd distinct docs >= 2 and reports the
    // combined count (the operator's n_docs contract).
    "q128_incr_spans" ->
      s"""WITH tk AS (SELECT doc_id, $TokSql AS toks FROM documents),
          sp AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS start_tok,
                   array_to_string(toks[i:i+7], ' ') AS g
            FROM tk, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)),
          ec AS (
            SELECT g, count(DISTINCT doc_id) AS n FROM sp
            WHERE doc_id % 2 = 0 GROUP BY g),
          osp AS (SELECT * FROM sp WHERE doc_id % 2 = 1),
          oc AS (SELECT g, count(DISTINCT doc_id) AS n FROM osp GROUP BY g),
          tot AS (
            SELECT oc.g, oc.n + coalesce(ec.n, 0) AS n_docs
            FROM oc LEFT JOIN ec USING (g)
            WHERE oc.n + coalesce(ec.n, 0) >= 2)
          SELECT osp.doc_id, osp.start_tok, tot.n_docs
          FROM osp JOIN tot USING (g)""",
    // q123's construction re-pinned at the auto-derived 4-gram width
    // (headroom=200 holds the derivation at 4 across all fixture scales;
    // the Spark side REQUIREs the match before running).
    "q126_contamination_auto" ->
      s"""WITH e_sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, ${shingleHashesSql(4)} AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents
                        WHERE doc_id % 2 = 0)
                  WHERE len(toks) >= 4)),
          e_bands AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM e_sigs, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket),
          o_sigs2 AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, ${shingleHashesSql(4)} AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents
                        WHERE doc_id % 2 = 1)
                  WHERE len(toks) >= 4)),
          o_bands2 AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM o_sigs2, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket),
          pairs AS (
            SELECT DISTINCT e.doc_id AS train_id, o.doc_id AS ref_id
            FROM e_bands e JOIN o_bands2 o ON e.b = o.b AND e.bh = o.bh),
          ths AS (
            SELECT doc_id AS train_id, ${shingleHashesSql(4)} AS hs
            FROM (SELECT doc_id, $TokSql AS toks FROM documents
                  WHERE doc_id % 2 = 0)),
          rhs AS (
            SELECT doc_id AS ref_id, ${shingleHashesSql(4)} AS hs
            FROM (SELECT doc_id, $TokSql AS toks FROM documents
                  WHERE doc_id % 2 = 1))
          SELECT train_id, ref_id, jaccard FROM (
            SELECT p.train_id, p.ref_id,
              round(CAST(len(list_intersect(t.hs, r.hs)) AS DOUBLE)
                / (len(t.hs) + len(r.hs) - len(list_intersect(t.hs, r.hs))), 4)
                AS jaccard
            FROM pairs p
            JOIN ths t USING (train_id)
            JOIN rhs r USING (ref_id))
          WHERE jaccard >= 0.5""",
    // The window rule restated serially: m = 1 + ceil((n-64)/48) windows,
    // starts i*48, slice truncated at the document end.
    "q121_chunk_windows" ->
      s"""WITH tk AS (
            SELECT doc_id, $TokSql AS toks FROM documents),
          m AS (
            SELECT doc_id, toks,
              CASE WHEN len(toks) <= 64 THEN 1
                   ELSE ((len(toks) - 17) // 48) + 1 END AS m
            FROM tk WHERE len(toks) > 0)
          SELECT doc_id, CAST(i AS INT) AS chunk_id,
            CAST(i * 48 AS INT) AS start_tok,
            CAST(len(toks[i*48+1 : i*48+64]) AS INT) AS n_tok,
            array_to_string(toks[i*48+1 : i*48+64], ' ') AS chunk_text
          FROM m, unnest(range(0, m)) AS u(i)""",
    // Three unrolled iterations over the shared edges CTE (the recursive
    // `reach` CTE in the fragment goes unreferenced and unplanned).
    // (1.0 - 0.85) stays unfolded: it is NOT the same double as 0.15.
    "q137_pagerank" -> {
      def iter(prev: String): String =
        s"""SELECT e.dst AS v,
              round((1.0 - 0.85) / nn.n + 0.85 * sum(r.rank / d.deg), 6) AS rank
            FROM edges e JOIN $prev r ON e.src = r.v
                 JOIN deg d ON e.src = d.src, nn
            GROUP BY e.dst, nn.n"""
      s"""$MinhashComponentsCteSql,
          deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
          nn AS (SELECT count(*) AS n FROM deg),
          r0 AS (SELECT d.src AS v, 1.0 / nn.n AS rank FROM deg d, nn),
          r1 AS (${iter("r0")}),
          r2 AS (${iter("r1")}),
          r3 AS (${iter("r2")})
          SELECT v AS doc_id, rank FROM r3"""
    },
    // The closure as q103, then the split keyed on the group: singleton
    // docs group under their own id; the leak count (always 0) is
    // recomputed from the doc-level assignment, not assumed.
    "q134_group_split" ->
      s"""$MinhashComponentsCteSql,
          comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
          assigned AS (
            SELECT d.doc_id, coalesce(c.component, d.doc_id) AS grp,
              CASE WHEN ${charHashSql(
                "CAST(coalesce(c.component, d.doc_id) AS VARCHAR) || ':42'")} % 100 < 90
                   THEN 'train' ELSE 'holdout' END AS split
            FROM documents d LEFT JOIN comp c USING (doc_id)),
          leaked AS (
            SELECT count(*) AS n_leaked_groups FROM (
              SELECT grp FROM assigned
              GROUP BY grp HAVING count(DISTINCT split) > 1))
          SELECT split, count(*) AS n_docs,
                 count(DISTINCT grp) AS n_groups, n_leaked_groups
          FROM assigned, leaked
          GROUP BY split, n_leaked_groups""",
    // tf-idf restated: within-doc term frequencies joined to the
    // vocabulary-sized df table; rank on the ROUNDED score (both engines
    // order identically), token as the deterministic tiebreak.
    "q130_tfidf_keywords" ->
      s"""WITH t AS (SELECT doc_id, $TokSql AS toks FROM documents),
          ex AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM t),
          tf AS (SELECT doc_id, dl, token, count(*) AS tf
                 FROM ex GROUP BY doc_id, dl, token),
          df AS (SELECT token, count(*) AS df
                 FROM (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t)
                 GROUP BY token),
          n AS (SELECT count(*) AS n_docs FROM documents),
          sc AS (SELECT tf.doc_id, tf.token,
                   round(CAST(tf.tf AS DOUBLE) / tf.dl
                         * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score
                 FROM tf JOIN df USING (token), n)
          SELECT doc_id, token, score, CAST(rn AS INT) AS rn FROM (
            SELECT doc_id, token, score,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, token) AS rn
            FROM sc)
          WHERE rn <= 3""",
    // BM25 with k1=1.2, b=0.75 over the fixed query bag; constant
    // arithmetic is written unfolded ((1.2 + 1.0), (1.0 - 0.75)) so both
    // engines fold it with the same IEEE semantics.
    "q131_bm25_search" ->
      s"""WITH t AS (SELECT doc_id, $TokSql AS toks FROM documents),
          ex AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM t),
          tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM ex
                 WHERE token IN ('scan', 'merge', 'window', 'stream')
                 GROUP BY doc_id, dl, token),
          df AS (SELECT token, count(*) AS df
                 FROM (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t)
                 WHERE token IN ('scan', 'merge', 'window', 'stream')
                 GROUP BY token),
          s AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t)
          SELECT doc_id,
                 round(sum(
                   ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * (1.2 + 1.0))
                   / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl / s.avgdl))), 4)
                   AS score
          FROM tf JOIN df USING (token), s
          GROUP BY doc_id
          ORDER BY score DESC, doc_id
          LIMIT 100""",
    // q134's oracle at the width the auto rule derives on this corpus
    // (4-gram shingles — a changed choice fails the Spark-side REQUIRE).
    "q143_group_split_auto" ->
      s"""${minhashComponentsCteSql(4)},
          comp AS (SELECT v AS doc_id, min(r) AS component FROM reach GROUP BY v),
          assigned AS (
            SELECT d.doc_id, coalesce(c.component, d.doc_id) AS grp,
              CASE WHEN ${charHashSql(
                "CAST(coalesce(c.component, d.doc_id) AS VARCHAR) || ':42'")} % 100 < 90
                   THEN 'train' ELSE 'holdout' END AS split
            FROM documents d LEFT JOIN comp c USING (doc_id)),
          leaked AS (
            SELECT count(*) AS n_leaked_groups FROM (
              SELECT grp FROM assigned
              GROUP BY grp HAVING count(DISTINCT split) > 1))
          SELECT split, count(*) AS n_docs,
                 count(DISTINCT grp) AS n_groups, n_leaked_groups
          FROM assigned, leaked
          GROUP BY split, n_leaked_groups""",
    // q131's oracle with the conjunction as a HAVING gate over the same
    // pruned tf CTE (count of present terms = query size), joined back.
    "q141_conjunctive_search" ->
      s"""WITH t AS (SELECT doc_id, $TokSql AS toks FROM documents),
          ex AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM t),
          tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM ex
                 WHERE token IN ('scan', 'merge', 'window', 'stream')
                 GROUP BY doc_id, dl, token),
          m AS (SELECT doc_id FROM tf GROUP BY doc_id HAVING count(*) = 4),
          df AS (SELECT token, count(*) AS df
                 FROM (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t)
                 WHERE token IN ('scan', 'merge', 'window', 'stream')
                 GROUP BY token),
          s AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t)
          SELECT doc_id,
                 round(sum(
                   ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * (1.2 + 1.0))
                   / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl / s.avgdl))), 4)
                   AS score
          FROM tf JOIN df USING (token), s
          WHERE doc_id IN (SELECT doc_id FROM m)
          GROUP BY doc_id
          ORDER BY score DESC, doc_id
          LIMIT 100""",
    // The phrase restated as a 2-gram shingle equality; occurrences are
    // overlap-counted exactly like the Spark-side sliding shingles.
    "q142_phrase_match" ->
      s"""WITH t AS (SELECT doc_id, $TokSql AS toks FROM documents),
          sh AS (SELECT doc_id, unnest(${shingleStrSql(2)}) AS s FROM t)
          SELECT doc_id, count(*) AS n_hits FROM sh
          WHERE s = 'sort merge' GROUP BY doc_id""",
    // The NAIVE exact all-pairs join — the prefix-filtered Spark plan
    // must reproduce it exactly (same τ gate on the same 4-dp round).
    "q146_prefix_jaccard_join" ->
      s"""WITH t AS (SELECT doc_id, $TokSql AS toks FROM documents),
          grams AS (SELECT doc_id, unnest(list_distinct(${shingleStrSql(4)})) AS ng
                    FROM t),
          sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM grams a JOIN grams b ON a.ng = b.ng AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
          SELECT doc_a, doc_b,
                 round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.5""",
    // Codepoint tier restated: the SAME hash fold (charHashSql is
    // already a codepoint fold — string_split(s,'') + unicode(c)), the
    // tokenizer regex class generated from TextHash.WhitespaceCp, the
    // same augmentation literal (one Scala constant feeds both engines),
    // bigram shingles, MinHash permutations 0/1, and the 60-bit SimHash.
    // The suffix guarantees >= 2 tokens, so no empty-shingle guard.
    "q149_unicode_text_tier" ->
      s"""WITH aug AS (SELECT doc_id, concat(text, '$UnicodeProbeSuffix', source) AS t
                       FROM documents),
          tk AS (SELECT doc_id, t, ${cpTokSql("t")} AS toks FROM aug),
          hsx AS (SELECT doc_id, t, toks,
                    list_distinct(list_transform(${shingleStrSql(2)},
                      g -> ${charHashSql("g")})) AS hs
                  FROM tk)
          SELECT doc_id,
            CAST(len(toks) AS INT) AS n_toks,
            ${charHashSql("t")} AS fingerprint,
            coalesce(list_min(list_transform(hs, h -> (1 * h + 7919 * 0) % 2147483647)), 0) AS mh0,
            coalesce(list_min(list_transform(hs, h -> (2 * h + 7919 * 1) % 2147483647)), 0) AS mh1,
            CAST(list_sum(list_transform(range(0, 30), j ->
              CASE WHEN list_sum(list_transform(hs, h ->
                     ((h >> j) & 1) * 2 - 1)) >= 0
                   THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END))
              AS BIGINT)
            + CAST(list_sum(list_transform(range(0, 30), j ->
              CASE WHEN list_sum(list_transform(hs, h ->
                     ((((h * 1103515245 + 12345) % 2147483647) >> j) & 1) * 2 - 1)) >= 0
                   THEN (CAST(1 AS BIGINT) << (j + 30)) ELSE CAST(0 AS BIGINT) END))
              AS BIGINT) AS sim60
          FROM hsx""",
    // c-TF-IDF per source: integer counts, one divide·ln float step
    // rounded 4 dp, (score desc, token asc) tie-break.
    "q147_source_ctfidf" ->
      s"""WITH ex AS (SELECT source AS cls, unnest($TokSql) AS token
                      FROM documents),
          ctf AS (SELECT cls, token, count(*) AS ctf FROM ex GROUP BY cls, token),
          cl AS (SELECT cls, sum(ctf) AS cls_len FROM ctf GROUP BY cls),
          ta AS (SELECT token, sum(ctf) AS ctf_all FROM ctf GROUP BY token),
          a AS (SELECT CAST(sum(cls_len) AS DOUBLE) / count(*) AS avg_len FROM cl),
          sc AS (SELECT ctf.cls, ctf.token,
                   round(CAST(ctf.ctf AS DOUBLE) / cl.cls_len
                         * ln(1.0 + a.avg_len / ta.ctf_all), 4) AS score
                 FROM ctf JOIN cl USING (cls) JOIN ta USING (token), a)
          SELECT cls AS source, token, score, CAST(rn AS INT) AS rn FROM (
            SELECT cls, token, score,
                   row_number() OVER (PARTITION BY cls
                     ORDER BY score DESC, token) AS rn
            FROM sc)
          WHERE rn <= 5""",
    // Batch BM25: the q131 arithmetic with the query table as a VALUES
    // CTE; df derives from the pruned tf (one row per doc,token) exactly
    // as the Spark side does. Rank restated as the per-query row_number
    // (score desc, doc_id asc) — the q89 grouped-top-k discipline.
    "q152_bm25_batch" ->
      s"""WITH q(query_id, token) AS (VALUES
            (1, 'scan'), (1, 'merge'), (1, 'window'),
            (2, 'stream'), (2, 'filter'),
            (3, 'join'), (3, 'hash'), (3, 'scan')),
          t AS (SELECT doc_id, $TokSql AS toks FROM documents),
          ex AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS token FROM t),
          tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM ex
                 WHERE token IN (SELECT token FROM q)
                 GROUP BY doc_id, dl, token),
          df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
          s AS (SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM t),
          sc AS (SELECT q.query_id, tf.doc_id,
                   round(sum(
                     ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     * (tf.tf * (1.2 + 1.0))
                     / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl / s.avgdl))), 4)
                     AS score
                 FROM tf JOIN q USING (token) JOIN df USING (token), s
                 GROUP BY q.query_id, tf.doc_id)
          SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS INT) AS rank,
                 doc_id, score
          FROM (SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, doc_id) AS rank
                FROM sc)
          WHERE rank <= 10""",
    // Heavy hitters at capacity > vocab: the sketch is exact and its
    // tracked error mass is zero — both pinned literally.
    "q153_heavy_hitters" ->
      s"""SELECT token AS value, count(*) AS est, CAST(0 AS BIGINT) AS err_max
          FROM (SELECT unnest($TokSql) AS token FROM documents)
          GROUP BY token
          ORDER BY est DESC, value
          LIMIT 10""",
    // PMI over bigram instances; numerator/denominator cast to double
    // BEFORE multiplying, same as the Spark side (overflow discipline).
    "q140_pmi_collocations" ->
      s"""WITH t AS (SELECT doc_id, $TokSql AS toks FROM documents),
          b AS (SELECT unnest(${shingleStrSql(2)}) AS bigram FROM t),
          c12 AS (SELECT bigram, count(*) AS c12 FROM b GROUP BY bigram
                  HAVING count(*) >= 5),
          firsts AS (SELECT string_split(bigram, ' ')[1] AS w1, count(*) AS cf
                     FROM b GROUP BY 1),
          seconds AS (SELECT string_split(bigram, ' ')[2] AS w2, count(*) AS cs
                      FROM b GROUP BY 1),
          n AS (SELECT count(*) AS n_bigrams FROM b)
          SELECT bigram, c12,
                 round(ln(CAST(n.n_bigrams AS DOUBLE) * c12.c12
                          / (CAST(f.cf AS DOUBLE) * s.cs)), 4) AS pmi
          FROM c12
          JOIN firsts f ON f.w1 = string_split(c12.bigram, ' ')[1]
          JOIN seconds s ON s.w2 = string_split(c12.bigram, ' ')[2], n
          ORDER BY pmi DESC, bigram
          LIMIT 50""",
    // Bigram LM with add-one smoothing, self-trained: all counts are
    // integers, so P(w2|w1) is exactly rational and ln is the only float
    // step; the per-doc mean is rounded on both sides.
    "q132_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, $TokSql AS toks FROM documents),
          db AS (SELECT doc_id, unnest(${shingleStrSql(2)}) AS bigram FROM t),
          c2 AS (SELECT bigram, count(*) AS c2 FROM db GROUP BY bigram),
          c1 AS (SELECT token, count(*) AS c1
                 FROM (SELECT unnest(toks) AS token FROM t) GROUP BY token),
          v AS (SELECT count(*) AS v FROM c1)
          SELECT db.doc_id, count(*) AS n_bigrams,
                 round(avg(-ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v))), 4)
                   AS nll
          FROM db JOIN c2 USING (bigram)
               JOIN c1 ON c1.token = string_split(db.bigram, ' ')[1], v
          GROUP BY db.doc_id""",
    "q52_neardup_purge" ->
      s"""WITH sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 16), i -> $MinhashElemSql) AS sig
            FROM (SELECT doc_id, $ShingleHashes3Sql AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents)
                  WHERE len(toks) >= 3)),
          bands AS (
            SELECT doc_id, CAST(b AS INT) AS b,
                   list_reduce(list_prepend(CAST(7 AS BIGINT), sig[b*4+1:b*4+4]),
                               (a, x) -> (a * 31 + x) % 1000000007) AS bh
            FROM sigs, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bh) <= $LshMaxBucket)
          SELECT DISTINCT b2.doc_id AS drop_id
          FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bh = b2.bh
          WHERE a.doc_id < b2.doc_id""",
    "q49_simhash" ->
      s"""SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 30), j ->
            CASE WHEN list_sum(list_transform(hs, h ->
                   (CAST(floor(h / power(2, j)) AS BIGINT) % 2) * 2 - 1)) >= 0
                 THEN CAST(power(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END))
            AS BIGINT) AS simhash
          FROM (SELECT doc_id, $TokHashesSql AS hs FROM documents)""",
    "q84_simhash_neardup" ->
      s"""WITH s AS (
            SELECT doc_id,
              CAST(list_sum(list_transform(range(0, 30), j ->
                CASE WHEN list_sum(list_transform(hs, h ->
                       ((h >> j) & 1) * 2 - 1)) >= 0
                     THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END))
                AS BIGINT)
              + CAST(list_sum(list_transform(range(0, 30), j ->
                CASE WHEN list_sum(list_transform(hs, h ->
                       ((((h * 1103515245 + 12345) % 2147483647) >> j) & 1) * 2 - 1)) >= 0
                     THEN (CAST(1 AS BIGINT) << (j + 30)) ELSE CAST(0 AS BIGINT) END))
                AS BIGINT) AS sh
            FROM (SELECT doc_id,
                    list_distinct(list_transform(${shingleStrSql(2)}, g -> ${charHashSql("g")})) AS hs
                  FROM (SELECT doc_id, $TokSql AS toks FROM documents)
                  WHERE len(toks) >= 2)),
          bands AS (
            SELECT doc_id, sh, b, (sh >> (15 * b)) & 32767 AS bv
            FROM s, unnest(range(0, 4)) AS u(b)
            QUALIFY count(*) OVER (PARTITION BY b, bv) <= $SimhashMaxBucket),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                   a.sh AS sha, b2.sh AS shb
            FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bv = b2.bv
            WHERE a.doc_id < b2.doc_id)
          SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS INT) AS hamming
          FROM cand
          WHERE bit_count(xor(sha, shb)) <= 6""",
    "q50_ngram_jaccard" ->
      s"""WITH grams AS (
            SELECT doc_id, unnest(list_distinct(
              list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                             i -> array_to_string(toks[i:i+1], ' ')))) AS ng
            FROM (SELECT doc_id, $TokSql AS toks FROM documents WHERE doc_id < 50)),
          sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM grams a JOIN grams b ON a.ng = b.ng AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id)
          SELECT doc_a, doc_b,
                 round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.08""",
    "q76_normalize" ->
      s"""SELECT doc_id, norm_text, ${charHashSql("norm_text")} AS norm_fingerprint
          FROM (SELECT doc_id,
                  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                       ' +', ' ', 'g')) AS norm_text
                FROM documents)""",
    "q73_decontaminate" ->
      s"""WITH toksed AS (SELECT doc_id, $TokSql AS toks FROM documents),
          bench AS (SELECT DISTINCT unnest(${shingleStrSql(5)}) AS sh
                    FROM toksed WHERE doc_id < 20),
          corpus AS (SELECT doc_id, unnest(list_distinct(${shingleStrSql(5)})) AS sh
                     FROM toksed WHERE doc_id >= 20)
          SELECT c.doc_id, count(*) AS n_shared
          FROM corpus c JOIN bench b ON c.sh = b.sh
          GROUP BY c.doc_id""",
    "q74_repetition" ->
      s"""SELECT doc_id,
          CAST(len(bi) AS INT) AS n_bigrams,
          CAST(len(list_distinct(bi)) AS INT) AS n_unique_bigrams,
          round(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi), 4) AS rep_ratio
          FROM (SELECT doc_id, ${shingleStrSql(2)} AS bi, toks
                FROM (SELECT doc_id, $TokSql AS toks FROM documents))
          WHERE len(toks) >= 2""",
    "q75_quality_gate" ->
      s"""SELECT doc_id,
          CAST(n_tok AS INT) AS n_tokens,
          round(CAST(length(text) AS DOUBLE) / n_tok, 4) AS avg_len,
          round(CAST(n_stop AS DOUBLE) / n_tok, 4) AS stop_ratio,
          (n_tok >= 50 AND n_tok <= 100000
           AND CAST(length(text) AS DOUBLE) / n_tok >= 3.0
           AND CAST(length(text) AS DOUBLE) / n_tok <= 12.0
           AND CAST(n_stop AS DOUBLE) / n_tok >= 0.01) AS pass
          FROM (SELECT doc_id, text, len(toks) AS n_tok,
                ${markerCountSql("en")} AS n_stop
                FROM (SELECT doc_id, text, $TokSql AS toks FROM documents))""",
    "q87_token_entropy" ->
      s"""WITH c AS (
            SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c
            FROM (SELECT doc_id, unnest($TokSql) AS tok FROM documents)
            GROUP BY 1, 2),
          g AS (SELECT doc_id, list(c ORDER BY tok) AS cs FROM c GROUP BY doc_id)
          SELECT doc_id,
            round(ln(n) - list_sum(list_transform(cs, x -> x * ln(x))) / n, 6) AS entropy,
            CAST(len(cs) AS INT) AS n_unique
          FROM (SELECT doc_id, cs, list_sum(cs) AS n FROM g)""",
    // Segment stripping: same stride segmentation, occurrence window,
    // ordered reassembly.
    "q95_line_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $TokSql AS toks FROM documents),
          seg AS (
            SELECT doc_id, j AS seg_idx,
              array_to_string(toks[(j*10+1):(j*10+10)], ' ') AS seg
            FROM toks,
              unnest(range(0, CAST(ceil(len(toks)/10.0) AS BIGINT))) AS u(j)),
          occ AS (
            SELECT doc_id, seg_idx, seg,
              count(*) OVER (PARTITION BY seg) AS occ
            FROM seg)
          SELECT doc_id,
            coalesce(string_agg(CASE WHEN occ < 2 THEN seg END, ' '
                                ORDER BY seg_idx), '') AS clean_text,
            CAST(count(*) FILTER (occ < 2) AS INT) AS n_kept,
            CAST(count(*) FILTER (occ >= 2) AS INT) AS n_dropped
          FROM occ GROUP BY doc_id""",
    // BM25: same k1/b, same round(x*1e4)/1e4 product idiom, same
    // (rounded score desc, token asc) rank rule.
    "q90_bm25_keywords" ->
      s"""WITH toks AS (
            SELECT doc_id, unnest($TokSql) AS token FROM documents),
          tf AS (
            SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
            FROM toks GROUP BY 1, 2),
          dlen AS (
            SELECT doc_id, CAST(len($TokSql) AS DOUBLE) AS dlen FROM documents),
          dfreq AS (
            SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
          stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dlen) AS avg_len
            FROM dlen),
          scored AS (
            SELECT tf.doc_id, tf.token,
              round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                    * tf.tf * 2.2
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dlen / avg_len))
                    * 1e4) / 1e4 AS score
            FROM tf
            JOIN dlen ON tf.doc_id = dlen.doc_id
            JOIN dfreq ON tf.token = dfreq.token
            CROSS JOIN stats)
          SELECT doc_id, CAST(rank AS INT) AS rank, token, score FROM (
            SELECT doc_id, token, score,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, token) AS rank
            FROM scored)
          WHERE rank <= 3""",
    "q86_source_overlap" ->
      s"""WITH sh AS (SELECT DISTINCT source, sh FROM (
            SELECT source, unnest(list_distinct(${shingleStrSql(5)})) AS sh
            FROM (SELECT source, $TokSql AS toks FROM documents)))
          SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
          GROUP BY 1, 2""",
    "q82_pii_scrub" ->
      s"""WITH en AS (SELECT doc_id,
            text || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS s
            FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(s, '$EmailRe')) AS INT) AS n_emails,
            CAST(len(regexp_extract_all(s, '$Ipv4Re')) AS INT) AS n_ips,
            regexp_replace(regexp_replace(s, '$EmailRe', '<EMAIL>', 'g'),
                           '$Ipv4Re', '<IP>', 'g') AS scrubbed
          FROM en""",
    "q51_multimodal_meta" ->
      s"""SELECT doc_id,
          CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
          CAST(${charHashSql("text")} % 640 AS INT) AS fake_width,
          CAST(${charHashSql("text")} % 480 AS INT) AS fake_height,
          3 AS fake_channels
          FROM documents"""
  )
}
