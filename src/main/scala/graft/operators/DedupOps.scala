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
    fingerprints: DataFrame,
    ledgerDir: String) {

  /** Append the survivors' fingerprints to the ledger. Call ONLY after the
    * survivors have been durably written to their destination. Reads the
    * eagerly-checkpointed frame, so it never recomputes the batch. */
  def commitLedger(): Unit =
    fingerprints.write.mode(SaveMode.Append).parquet(ledgerDir)
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

    val withFp = batch
      .withColumn("_graft_fp", TextFunctions.charHash(col(textCol)))
      .withColumn("_graft_fp2", xxhash64(col(textCol)))

    val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val unseen =
      if (fs.exists(ledgerPath)) {
        val ledger = spark.read.parquet(ledgerDir)
        // The ledger is permanent state — refuse a schema we don't own
        // (e.g. a pre-two-hash single-column ledger) with an actionable
        // error instead of a downstream AnalysisException.
        val expected = Set("_graft_fp", "_graft_fp2")
        if (ledger.columns.toSet != expected)
          throw new IllegalStateException(
            s"fingerprint ledger at $ledgerDir has columns " +
              s"${ledger.columns.mkString("[", ",", "]")}, expected " +
              s"${expected.toSeq.sorted.mkString("[", ",", "]")} — " +
              "rebuild the ledger (re-fingerprint the corpus) before ingesting")
        withFp.join(ledger, Seq("_graft_fp", "_graft_fp2"), "left_anti")
      } else withFp

    // Within-batch dedup: deterministic smallest-id representative.
    val w = Window.partitionBy(col("_graft_fp"), col("_graft_fp2")).orderBy(col(idCol))
    val survivors = unseen
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
      // Materialize EAGERLY with severed lineage: the eventual ledger
      // append writes to a path this plan reads, which invalidates any
      // cache/file-index over it — a plain persist() would silently
      // recompute against the post-append ledger and anti-join the batch's
      // own rows away. localCheckpoint pins the pre-append result (and runs
      // fingerprint + anti-join exactly once).
      .localCheckpoint(true)

    new PendingDedup(
      survivors.drop("_graft_fp", "_graft_fp2"),
      survivors.select(col("_graft_fp"), col("_graft_fp2")),
      ledgerDir)
  }
}
