package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export integrity (SURVEY §2.3 E95) — the last step of a training-data
  * pipeline: ship the curated corpus as deterministic shards WITH a
  * content manifest a downstream consumer can re-derive and compare, so
  * a truncated copy, a lost file, or a silently modified row is caught
  * before a training run consumes it, not after.
  *
  * Shard assignment is a pure function of the id (`hash(id:seed) %
  * nShards`): layout-stable across re-exports, so an incremental consumer
  * can fetch only changed shards. The per-shard manifest is
  * order-independent — (row count, bit-XOR of row hashes, modular SUM of
  * row hashes) — because parquet readers return rows in file/row-group
  * order, which is NOT stable across writers; xor+sum commute, so any
  * read order verifies. The two checksums cover each other's blind spot:
  * xor misses a duplicated+dropped pair (x⊕x=0), sum misses compensating
  * deltas; a corruption passing both while counts match is engineered,
  * not accidental.
  *
  * Scale shape: the manifest is ONE aggregation over (shard, rowHash)
  * pairs — map-side partials reduce every task to ≤nShards rows, so the
  * shuffle carries nShards×tasks tiny rows at any corpus size. The sum
  * rides a decimal(38,0) accumulator then reduces mod 1e9+7: a plain
  * long sum would overflow (ANSI error) at ~1e10 rows, a decimal never
  * does within parquet's practical limits, and both engines agree on the
  * exact modular value.
  */
object ExportOps {

  /** Row-hash over (id ++ content ++ seed). Two stock choices below. */
  type RowHashFn = (Seq[Column], Long) => Column

  /** xxhash64 (full avalanche, fastest) — self-consistent export+verify
    * within Spark; NOT restatable in other engines. */
  val xxRowHash: RowHashFn = (cols, seed) => xxhash64((cols :+ lit(seed)): _*)

  /** The repo's portable polynomial charHash over `a:b:…:seed` —
    * restatable verbatim in any SQL engine (the q113 DuckDB oracle), at
    * O(chars) cost. Values in [0, 1e9+7). */
  val portableRowHash: RowHashFn = (cols, seed) =>
    graft.functions.TextFunctions.charHash(
      concat_ws(":", (cols.map(_.cast("string")) :+ lit(seed.toString)): _*))

  private val HashMod = 1000000007L

  private def shardCol(idCol: String, nShards: Int, seed: Long,
      rowHash: RowHashFn): Column =
    pmod(rowHash(Seq(col(idCol)), seed), lit(nShards.toLong)).cast("int")

  /** The one-aggregation manifest over explicit (shard, rowHash) pairs. */
  private def aggManifest(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_hash"),
        pmod(sum(col("h").cast("decimal(38,0)")), lit(HashMod))
          .cast("long").as("sum_hash"))

  /** The order-independent per-shard manifest of `df`:
    * (shard, n_rows, xor_hash, sum_hash). Shards with no rows are absent
    * (and have no directory on disk either — the comparison stays
    * symmetric). */
  def shardManifest(
      df: DataFrame,
      idCol: String,
      contentCols: Seq[String],
      nShards: Int,
      seed: Long,
      rowHash: RowHashFn = xxRowHash): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = rowHash((idCol +: contentCols).map(col), seed)
    aggManifest(df.select(
      shardCol(idCol, nShards, seed, rowHash).as("shard"), h.as("h")))
  }

  /** Write `df` under `outDir` partitioned by `_graft_shard` and store the
    * manifest beside it as `_graft_manifest.json` (one JSON object per
    * line, shard-ordered — nShards lines, driver-side tiny by
    * construction). The manifest is derived from the FILES just written
    * (re-read, attributed by shard directory), never from a second
    * evaluation of `df`: a non-deterministic input frame (a re-read
    * mutable source, a sampled subset) must not yield a manifest
    * describing rows that are not the ones on disk — the manifest's only
    * job is to describe the bytes shipped. The data write runs FIRST: a
    * crash between the two leaves data without a manifest, which
    * [[verifyShards]] refuses loudly, never silently passes. */
  def shardedExport(
      df: DataFrame,
      outDir: String,
      idCol: String,
      contentCols: Seq[String],
      nShards: Int,
      seed: Long,
      rowHash: RowHashFn = xxRowHash): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val spark = df.sparkSession
    df.withColumn("_graft_shard", shardCol(idCol, nShards, seed, rowHash))
      // one shuffle keyed on the shard id: each task writes whole shards
      // (at real scale raise numPartitions to spread a shard over several
      // files — the manifest is layout-independent either way)
      .repartition(nShards, col("_graft_shard"))
      .write.mode("overwrite").partitionBy("_graft_shard").parquet(outDir)
    val written = spark.read.parquet(outDir)
    val h = rowHash((idCol +: contentCols).map(col), seed)
    val rows = aggManifest(written.select(
        col("_graft_shard").cast("int").as("shard"), h.as("h")))
      .orderBy(col("shard")).collect()
    val json = rows.map { r =>
      s"""{"shard":${r.getInt(0)},"n_rows":${r.getLong(1)},""" +
        s""""xor_hash":${r.getLong(2)},"sum_hash":${r.getLong(3)}}"""
    }.mkString("", "\n", "\n")
    val p = new org.apache.hadoop.fs.Path(outDir, "_graft_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Re-derive the manifest from the FILES under `outDir` and compare it
    * to the stored `_graft_manifest.json`. Rows are attributed to the
    * shard DIRECTORY they physically sit in (the `_graft_shard` partition
    * value), not re-derived from the id — so a row misfiled into the
    * wrong shard corrupts two directories' checksums instead of
    * vanishing. Throws [[IllegalStateException]] naming every mismatched
    * shard (missing / extra / count / checksum) — a verification that
    * cannot silently pass on a damaged export. */
  def verifyShards(
      spark: SparkSession,
      outDir: String,
      idCol: String,
      contentCols: Seq[String],
      seed: Long,
      rowHash: RowHashFn = xxRowHash): Unit = {
    val p = new org.apache.hadoop.fs.Path(outDir, "_graft_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"no _graft_manifest.json under $outDir — refusing to trust unmanifested data")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stored = text.linesIterator.filter(_.nonEmpty).map { line =>
      val n = mapper.readTree(line)
      n.get("shard").asInt() ->
        (n.get("n_rows").asLong(), n.get("xor_hash").asLong(), n.get("sum_hash").asLong())
    }.toMap
    val reread = spark.read.parquet(outDir)
    val h = rowHash((idCol +: contentCols).map(col), seed)
    val actual = aggManifest(reread.select(
        col("_graft_shard").cast("int").as("shard"), h.as("h")))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val problems = scala.collection.mutable.ListBuffer.empty[String]
    (stored.keySet -- actual.keySet).toSeq.sorted.foreach(s =>
      problems += s"shard $s: in manifest but no rows on disk")
    (actual.keySet -- stored.keySet).toSeq.sorted.foreach(s =>
      problems += s"shard $s: rows on disk but not in manifest")
    (stored.keySet & actual.keySet).toSeq.sorted.foreach { s =>
      val (en, ex, es) = stored(s); val (an, ax, as_) = actual(s)
      if (en != an) problems += s"shard $s: manifest n_rows=$en, disk=$an"
      else if (ex != ax || es != as_)
        problems += s"shard $s: content checksum mismatch (rows match: $an)"
    }
    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"export verification FAILED for $outDir:\n  ${problems.mkString("\n  ")}")
  }

  /** Verify every `_graft_epoch=<n>` export under `rootDir` (the layout
    * [[graft.streaming.StreamingOps.foreachBatchShardedExport]] writes) and
    * return the number of epochs checked. An empty tree is refused — "no
    * epochs found" must never read as "verified". */
  def verifyExportTree(
      spark: SparkSession,
      rootDir: String,
      idCol: String,
      contentCols: Seq[String],
      seed: Long,
      rowHash: RowHashFn = xxRowHash): Int = {
    val root = new org.apache.hadoop.fs.Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val epochs =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.Path]
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("_graft_epoch="))
    if (epochs.isEmpty)
      throw new IllegalStateException(
        s"no _graft_epoch=* exports under $rootDir — nothing to verify is a failure, not a pass")
    epochs.sortBy(_.getName).foreach(p =>
      verifyShards(spark, p.toString, idCol, contentCols, seed, rowHash))
    epochs.length
  }
}
