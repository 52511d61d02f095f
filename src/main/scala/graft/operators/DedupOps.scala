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
    val w = Window.partitionBy(col("_graft_fp"), col("_graft_fp2")).orderBy(col(idCol))
    unseen
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
      .localCheckpoint(true)
  }
}
