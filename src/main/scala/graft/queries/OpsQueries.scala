package graft.queries

import graft.Tables
import graft.operators.{DedupOps, SamplingOps}
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
    "q77_ledger_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ledger = java.nio.file.Files
        .createTempDirectory("graft_q77_ledger").resolve("fp").toString
      val batch1 = docs.filter(col("doc_id") % 2 === 0)
      DedupOps.incrementalDedup(s, batch1, "text", "doc_id", ledger).commitLedger()
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
          FROM dedup"""
  )
}
