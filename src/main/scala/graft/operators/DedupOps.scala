package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A prepared dedup batch: the surviving rows, plus a ledger commit the
  * caller invokes strictly AFTER those survivors are durably written.
  *
  * The two-step protocol is the same hazard-2 rule the pipeline applies to
  * watermarks (state write strictly after the sink commit, CopyJob):
  * appending fingerprints BEFORE the caller's sink commit would mean a
  * failed write + re-run finds its own documents already ledgered and
  * anti-joins them away — silent, permanent corpus loss. With the split,
  * a crash before `commitLedger` leaves the ledger unchanged and the
  * re-run reproduces the identical survivors.
  */
final class PendingDedup private[operators] (
    /** Batch rows new to the corpus (fingerprint columns removed). */
    val survivors: DataFrame,
    commit: () => Unit) {

  /** Write the survivors' fingerprints to the ledger. Call ONLY after the
    * survivors have been durably written to their destination. Reads the
    * eagerly-checkpointed frame, so it never recomputes the batch. */
  def commitLedger(): Unit = commit()
}

/** Incremental exact deduplication against a persistent fingerprint ledger —
  * the "dedup today's crawl against the whole corpus" operation an LLM data
  * pipeline runs on every ingest. The corpus itself is never re-read: only
  * its FINGERPRINTS (16 bytes/doc) live in the ledger, so the per-batch cost
  * is one anti-join of the batch against the ledger, shuffling on the
  * fingerprint. At 100 TB corpus / 1 TB batch that is a join of a ~100 GB
  * ledger against the batch — and the ledger side is pure longs, so AQE
  * will often broadcast partitions of it.
  *
  * Contract: within-batch duplicates keep the smallest id (same canonical
  * pick as the q24 exact-dedup query); across batches, first COMMITTED
  * batch wins. See [[PendingDedup]] for the write-then-commit ordering.
  */
object DedupOps {

  /** Compute the batch rows that are new to the corpus. Returns a
    * [[PendingDedup]]; the ledger is NOT touched until the caller commits.
    *
    * Fingerprint = (xxhash64, charHash mod 1e9+7) — two independent hashes,
    * ~94 combined bits. A single ~30-bit hash would see birthday collisions
    * after ~35 k docs and silently drop distinct documents forever (the
    * ledger entry persists); at ~94 bits the expected first collision sits
    * beyond 10^13 docs, comfortably past a billions-of-docs corpus.
    */
  def incrementalDedup(
      spark: SparkSession,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      ledgerDir: String): PendingDedup = {
    val survivors = dedupAgainst(batch, textCol, idCol,
      readLedger(spark, ledgerDir, Set("_graft_fp", "_graft_fp2")))
    val fps = survivors.select(col("_graft_fp"), col("_graft_fp2"))
    new PendingDedup(
      survivors.drop("_graft_fp", "_graft_fp2"),
      () => fps.write.mode(SaveMode.Append).parquet(ledgerDir))
  }

  /** Epoch-keyed variant for at-least-once replayed callers (streaming
    * foreachBatch): fingerprints land in an `_graft_epoch=<token>` ledger
    * partition, the anti-join EXCLUDES the batch's own epoch, and the
    * commit dynamically overwrites only that partition. So a crash at ANY
    * point — before the sink write, between write and commit, or after
    * commit but before the caller's checkpoint — replays to the identical
    * survivor set and an identical ledger (plain [[incrementalDedup]]
    * would find its own post-commit fingerprints and anti-join the whole
    * replayed batch away).
    */
  def incrementalDedupEpoch(
      spark: SparkSession,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      ledgerDir: String,
      epochToken: String): PendingDedup = {
    val prior = readLedger(spark, ledgerDir,
      Set("_graft_fp", "_graft_fp2", "_graft_epoch"))
      .map(_.filter(col("_graft_epoch") =!= epochToken))
    val survivors = dedupAgainst(batch, textCol, idCol, prior)
    val fps = survivors.select(col("_graft_fp"), col("_graft_fp2"))
    new PendingDedup(
      survivors.drop("_graft_fp", "_graft_fp2"),
      () => fps.withColumn("_graft_epoch", lit(epochToken))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_graft_epoch")
        .parquet(ledgerDir))
  }

  /** Read the ledger if present, refusing a schema we don't own (e.g. a
    * pre-two-hash single-column ledger, or a plain ledger opened in epoch
    * mode) with an actionable error instead of a downstream
    * AnalysisException — the ledger is permanent state. */
  private def readLedger(
      spark: SparkSession,
      ledgerDir: String,
      expected: Set[String]): Option[DataFrame] = {
    val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ledgerPath)) None
    else {
      val ledger = spark.read.parquet(ledgerDir)
      if (ledger.columns.toSet != expected)
        throw new IllegalStateException(
          s"fingerprint ledger at $ledgerDir has columns " +
            s"${ledger.columns.mkString("[", ",", "]")}, expected " +
            s"${expected.toSeq.sorted.mkString("[", ",", "]")} — " +
            "rebuild the ledger (re-fingerprint the corpus) before ingesting")
      Some(ledger)
    }
  }

  /** Fingerprint the batch, drop rows whose fingerprint is in `prior`, keep
    * the smallest-id representative per within-batch fingerprint. Returns
    * the survivor frame WITH its fingerprint columns, eagerly checkpointed:
    * the eventual ledger write lands on a path this plan reads, which
    * invalidates any cache/file-index over it — a plain persist() would
    * silently recompute against the post-commit ledger and anti-join the
    * batch's own rows away. localCheckpoint pins the pre-commit result
    * (and runs fingerprint + anti-join exactly once). */
  private def dedupAgainst(
      batch: DataFrame,
      textCol: String,
      idCol: String,
      prior: Option[DataFrame]): DataFrame = {
    val withFp = batch
      .withColumn("_graft_fp", TextFunctions.charHash(col(textCol)))
      .withColumn("_graft_fp2", xxhash64(col(textCol)))
    val unseen = prior match {
      case Some(ledger) =>
        withFp.join(ledger.select(col("_graft_fp"), col("_graft_fp2")),
          Seq("_graft_fp", "_graft_fp2"), "left_anti")
      case None => withFp
    }
    // Bounded window (round-14 audit): the partition key is the ~128-bit
    // fingerprint pair, so a partition holds only BYTE-IDENTICAL texts —
    // duplicate-multiplicity-sized, never corpus-sized.
    val w = Window.partitionBy(col("_graft_fp"), col("_graft_fp2")).orderBy(col(idCol))
    unseen
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
      .localCheckpoint(true)
  }

  /** E105: cross-document duplicate-SPAN detection — every `spanTokens`-token
    * window that appears verbatim in at least `minDocs` DISTINCT documents,
    * emitted as (doc, start_tok, n_docs) flags. This is the span-level pass
    * document-level dedup cannot replace: two documents 1 % identical (a
    * shared license header, a boilerplate footer, a quoted passage) never
    * near-dup as WHOLES, yet the repeated span still memorizes.
    * Deduplicating repeated substrings rather than whole documents is the
    * published remedy (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" — their ExactSubstr pass); a suffix array is
    * the single-machine tool, and this is its shuffle-native restatement:
    * rolling token windows → window key → corpus-wide frequency → flag
    * positions.
    *
    * Scale shape: the window explode is NARROW with fan-out ≈ tokens/doc
    * (each token starts at most one window — same bound as tokenization
    * itself); the frequency pass is ONE key-grouped aggregation with
    * map-side partial counts; the flag pass re-derives the (cheap, narrow)
    * window frame and joins it to the flagged-key set, which is tiny
    * relative to the corpus (only keys repeated across documents survive
    * the HAVING), so AQE broadcasts it in practice. Nothing here is
    * quadratic and nothing holds per-doc state: a 100 TB corpus pays two
    * scans plus one agg-shuffle of (key, id) longs.
    *
    * The window key is the (xxhash64, charHash) PAIR — the same ~94-bit
    * fingerprint rule as [[incrementalDedup]], because a corpus-scale span
    * frequency table holds ~10^12 distinct windows and a single 30-bit
    * charHash would collide pervasively (birthday bound ~35 k), silently
    * flagging unrelated spans. The key never appears in the output, so the
    * oracle restates the semantics by grouping on the window STRING — the
    * two differ only on a 94-bit collision.
    *
    * `countDistinct` (exact) on the doc id is deliberate: a repeated span
    * WITHIN one document (a chorus, a table row) is intra-doc structure,
    * not cross-doc contamination, and must not trip the `minDocs` bar.
    */
  def duplicateSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      spanTokens: Int,
      minDocs: Int = 2): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive: $spanTokens")
    require(minDocs >= 2,
      s"minDocs must be at least 2 (1 would flag every window): $minDocs")
    def spans = df
      .select(col(idCol),
        posexplode(TextFunctions.shingles(col(textCol), spanTokens))
          .as(Seq("start_tok", "_graft_g")))
      .select(col(idCol), col("start_tok").cast("int"),
        xxhash64(col("_graft_g")).as("_graft_h1"),
        TextFunctions.charHash(col("_graft_g")).as("_graft_h2"))
    val flagged = spans
      .groupBy(col("_graft_h1"), col("_graft_h2"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    spans.join(flagged, Seq("_graft_h1", "_graft_h2"))
      .select(col(idCol), col("start_tok"), col("n_docs"))
  }

  /** [[incrementalSpans]]' two-step result: flagged positions now, ledger
    * append only after the caller's sink commit — the same write-then-
    * commit protocol as [[PendingDedup]]. */
  final class PendingSpanFlags private[operators] (
      /** (id, start_tok, n_docs) positions in THIS batch whose span
        * appears in ≥ minDocs distinct documents across ledger + batch. */
      val flags: DataFrame,
      commit: () => Unit) {
    /** Append the batch's span frequencies to the ledger. Call ONLY after
      * the batch's processed output is durably written. */
    def commitLedger(): Unit = commit()
  }

  /** E109: INCREMENTAL duplicate-span detection — [[duplicateSpans]]
    * against a persistent span-frequency ledger, so today's crawl is
    * flagged against every span the corpus has EVER seen without
    * re-reading the corpus (the q77/q104/q108/q119 ledger rule applied to
    * its fifth space: exact fingerprints, band buckets, SRP buckets,
    * cluster ids, and now span keys). The ledger holds one
    * (spanKey → distinct-doc-count) row per committed batch per span —
    * APPEND-only, read back as one sum-aggregate — so the per-batch cost
    * is the batch's own span explode plus one key-grouped join against
    * counts, never a corpus rescan.
    *
    * A span flags when ledgered + in-batch distinct docs reach `minDocs`;
    * `n_docs` in the output is that combined count. Within-batch-only
    * duplication therefore still flags exactly as the batch operator
    * would. Contract: batch ids are NEW to the corpus (run the exact
    * fingerprint ledger upstream, the same assumption every ledger
    * operator here makes) — a re-ingested doc would double-count its own
    * spans. `spanTokens` is pinned in ledger metadata with a loud drift
    * refusal (a 4-token batch against an 8-token ledger would silently
    * never collide); `minDocs` is a READ-time knob, deliberately not
    * pinned — tightening the bar next epoch needs no ledger rebuild.
    */
  def incrementalSpans(
      spark: SparkSession,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      ledgerDir: String,
      spanTokens: Int,
      minDocs: Int = 2): PendingSpanFlags =
    spansCore(spark, batch, textCol, idCol, ledgerDir, spanTokens, minDocs,
      epochToken = None)

  /** Epoch-keyed [[incrementalSpans]] for at-least-once replayed callers
    * (streaming foreachBatch): the batch's counts land in an
    * `_graft_epoch=<token>` partition, the frequency read EXCLUDES the
    * batch's own epoch, and the commit dynamically overwrites only that
    * partition — a replayed batch reproduces identical flags instead of
    * double-counting its own spans. */
  def incrementalSpansEpoch(
      spark: SparkSession,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      ledgerDir: String,
      epochToken: String,
      spanTokens: Int,
      minDocs: Int = 2): PendingSpanFlags =
    spansCore(spark, batch, textCol, idCol, ledgerDir, spanTokens, minDocs,
      epochToken = Some(epochToken))

  private val SpanMetaFile = "_graft_span_construction"

  private def spansCore(
      spark: SparkSession,
      batch: DataFrame,
      textCol: String,
      idCol: String,
      ledgerDir: String,
      spanTokens: Int,
      minDocs: Int,
      epochToken: Option[String]): PendingSpanFlags = {
    require(spanTokens > 0, s"spanTokens must be positive: $spanTokens")
    require(minDocs >= 2,
      s"minDocs must be at least 2 (1 would flag every window): $minDocs")
    val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val params = s"spanTokens=$spanTokens"
    val prior: Option[DataFrame] =
      if (!fs.exists(ledgerPath)) None
      else {
        // One directory listing for both the pin-or-refuse check and
        // the empty-ledger short-circuit (a remote LIST is not free).
        val hasData = MaintenanceOps.ledgerHasData(fs, ledgerPath)
        val metaPath = new org.apache.hadoop.fs.Path(ledgerDir, SpanMetaFile)
        if (fs.exists(metaPath)) {
          val in = fs.open(metaPath)
          val stored =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          if (stored != params)
            throw new IllegalStateException(
              s"span ledger at $ledgerDir was built with [$stored] but this ingest " +
                s"windows with [$params] — duplicate spans would silently never " +
                "collide. Use the ledger's width or rebuild it.")
        } else if (hasData)
          // Pin-or-refuse (round 13): committed span counts without the
          // width pin cannot be validated — a different-width ingest
          // would pass silently and spans would never collide.
          throw new IllegalStateException(
            s"span ledger at $ledgerDir holds committed batches but no " +
              s"$SpanMetaFile construction pin — its window width cannot be " +
              "validated. Restore the pin or rebuild the ledger.")
        // A pinned-but-empty dir (crash between pin and first data
        // commit) is an empty ledger, not a readable parquet store.
        if (!hasData) None
        else {
          // Counts are SUMMED at read, so epoch leftovers of a crashed
          // fold (already merged into base, dirs not yet deleted — see
          // MaintenanceOps.foldEpochs' crash contract) must be excluded
          // or they double-count; membership ledgers tolerate them, this
          // one cannot.
          val unfolded = MaintenanceOps.excludeFoldLeftovers(
            fs, ledgerPath, spark.read.parquet(ledgerDir))
          Some(epochToken.fold(unfolded)(t =>
            unfolded.filter(col("_graft_epoch") =!= t)))
        }
      }
    // Pinned eagerly: every downstream frame must keep seeing the
    // PRE-commit batch/ledger state even if evaluated after commitLedger.
    val spans = batch
      .select(col(idCol),
        posexplode(TextFunctions.shingles(col(textCol), spanTokens))
          .as(Seq("start_tok", "_graft_g")))
      .select(col(idCol), col("start_tok").cast("int"),
        xxhash64(col("_graft_g")).as("_graft_h1"),
        TextFunctions.charHash(col("_graft_g")).as("_graft_h2"))
      .localCheckpoint(true)
    val batchCounts = spans
      .groupBy(col("_graft_h1"), col("_graft_h2"))
      .agg(countDistinct(col(idCol)).as("_graft_n"))
      .localCheckpoint(true)
    val totals = prior match {
      case Some(l) =>
        val ln = l.groupBy(col("_graft_h1"), col("_graft_h2"))
          .agg(sum(col("_graft_n")).as("_graft_ln"))
        batchCounts.join(ln, Seq("_graft_h1", "_graft_h2"), "left")
          .withColumn("n_docs",
            col("_graft_n") + coalesce(col("_graft_ln"), lit(0L)))
      case None => batchCounts.withColumn("n_docs", col("_graft_n"))
    }
    val flags = spans
      .join(totals.filter(col("n_docs") >= minDocs)
          .select(col("_graft_h1"), col("_graft_h2"), col("n_docs")),
        Seq("_graft_h1", "_graft_h2"))
      .select(col(idCol), col("start_tok"), col("n_docs"))
      .localCheckpoint(true)
    new PendingSpanFlags(
      flags,
      () => {
        // Pin BEFORE data (round 13): a crash between the two leaves a
        // pinned-but-empty ledger, never committed counts whose width
        // can no longer be validated.
        val metaPath = new org.apache.hadoop.fs.Path(ledgerDir, SpanMetaFile)
        if (!fs.exists(metaPath)) {
          val outS = fs.create(metaPath, true)
          try outS.write(params.getBytes("UTF-8")) finally outS.close()
        }
        epochToken match {
          case None =>
            batchCounts.write.mode(SaveMode.Append).parquet(ledgerDir)
          case Some(t) =>
            batchCounts.withColumn("_graft_epoch", lit(t))
              .write.mode(SaveMode.Overwrite)
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("_graft_epoch")
              .parquet(ledgerDir)
        }
        // Counts sum at read → foldEpochs must re-aggregate, declared
        // here by the writer (never sniffed from the schema).
        MaintenanceOps.declareCountFoldRule(fs, ledgerPath)
      })
  }

  /** E106: span SURGERY — remove every [[duplicateSpans]]-flagged window
    * from the document and keep the rest, instead of purging the whole
    * document. Whole-doc near-dup purging over-applies to boilerplate: a
    * document that is 1 % shared license header and 99 % unique content
    * should lose the header, not the corpus its content. Returns
    * (id, clean_text, n_removed) for EVERY input document (unflagged docs
    * pass through with n_removed = 0); `clean_text` is the surviving
    * tokens joined by single spaces — the same whitespace normalization
    * the tokenizer itself applies, stated contract of this operator.
    *
    * Scale shape: the flagged frame aggregates to ONE small array of
    * start positions per flagged doc (bounded by doc length, and only
    * flagged docs appear), which joins back to the corpus — tiny build
    * side, broadcast in practice under AQE. The removal itself is NARROW:
    * an index-aware `filter` over the token array against the start-set
    * (`exists` over a per-doc array bounded by doc length), no explode of
    * the text, no shuffle of the text beyond the one join.
    */
  def scrubSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      spanTokens: Int,
      minDocs: Int = 2): DataFrame = {
    val starts = duplicateSpans(df, textCol, idCol, spanTokens, minDocs)
      .groupBy(col(idCol))
      .agg(collect_set(col("start_tok")).as("_graft_starts"))
    df.join(starts, Seq(idCol), "left")
      .select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("_graft_toks"),
        coalesce(col("_graft_starts"), array().cast("array<int>"))
          .as("_graft_starts"))
      .withColumn("_graft_kept",
        filter(col("_graft_toks"), (_, i) =>
          !exists(col("_graft_starts"),
            st => i >= st && i < st + lit(spanTokens))))
      .select(col(idCol),
        array_join(col("_graft_kept"), " ").as("clean_text"),
        (size(col("_graft_toks")) - size(col("_graft_kept")))
          .cast("int").as("n_removed"))
  }
}
