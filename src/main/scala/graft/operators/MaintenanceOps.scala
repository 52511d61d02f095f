package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet directories. Long-running incremental
  * pipelines (CopyJob appends a part per run) accumulate files far smaller
  * than a scan partition; at cluster scale the file-listing and per-file
  * open costs come to dominate reads. Compaction rewrites the directory
  * into ~`targetMB`-sized files.
  *
  * The swap never has a moment with ZERO copies on disk: the live dir is
  * renamed to a backup, the compacted dir renamed into place, then the
  * backup deleted — a crash at any step leaves either the original (as
  * `.<name>_compact_bak`, restorable) or the new data live. Each rename's
  * boolean result is checked (Hadoop signals failure by return value, not
  * exception). On HDFS each rename is atomic; on object stores it is not —
  * there, the standard play is compact-to-new-prefix + repoint the table
  * location.
  */
object MaintenanceOps {

  final case class CompactionReport(filesBefore: Int, filesAfter: Int, rows: Long)

  private def dataDirs(fs: org.apache.hadoop.fs.FileSystem, path: Path) =
    fs.listStatus(path).filter { s =>
      val n = s.getPath.getName
      // A `col=value` name is a Hive partition directory even when the
      // column is underscore-prefixed — the idempotent sink's
      // `_graft_batch=` and the band ledgers' `_graft_epoch=` layouts.
      // Excluding those here made compactPartitioned a silent NO-OP on
      // exactly the directories its scaladoc promises to preserve.
      s.isDirectory && (n.contains("=") || (!n.startsWith("_") && !n.startsWith(".")))
    }

  def compactParquet(
      spark: SparkSession,
      dir: String,
      targetMB: Int = 128): CompactionReport = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles() = fs.listStatus(path).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

    // A Hive-partitioned directory (col=value subdirs — what
    // PartitionedParquetSink / IdempotentParquetSink write) must NOT be
    // flat-rewritten: the partition columns would fold into the data files
    // (readers lose directory pruning) and a later idempotent-batch replay
    // would write token subdirs BESIDE flat files — a mixed, unreadable
    // layout that breaks replace-on-replay. Refuse loudly; the
    // per-partition variant preserves the layout.
    val subdirs = dataDirs(fs, path)
    if (subdirs.nonEmpty)
      throw new IllegalArgumentException(
        s"$dir contains partition subdirectories " +
          s"(${subdirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
          "a flat rewrite would fold partition columns into data files; " +
          "use compactPartitioned to compact leaf-by-leaf")

    val before = dataFiles()
    if (before.isEmpty) return CompactionReport(0, 0, 0L)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes / (targetMB * 1024.0 * 1024.0)).toInt)

    // Row count rides the rewrite as an observed metric — a separate
    // count() pass would double the dominant I/O cost (same single-scan
    // rule as CopyJob).
    val obs = org.apache.spark.sql.Observation(s"compact_${path.getName}")
    val tmp = new Path(path.getParent, s".${path.getName}_compact_tmp")
    spark.read.parquet(dir)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val rows = obs.get("n").asInstanceOf[Long]

    val bak = new Path(path.getParent, s".${path.getName}_compact_bak")
    fs.delete(bak, true)
    def renameOrThrow(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"compaction swap failed: rename $from -> $to")
    renameOrThrow(path, bak)
    renameOrThrow(tmp, path)
    // In-leaf `_graft_*` pins/markers (a folded base partition carries
    // its fold marker INSIDE the leaf since round 17) ride out of the
    // bak before it drops — the compacted tmp never had them.
    copyGraftPins(fs, bak, path)
    fs.delete(bak, true)
    CompactionReport(before.length, dataFiles().length, rows)
  }

  /** Targeted-delete report: rows scanned, rows removed, requested ids
    * that were not present (already gone / never existed — the
    * idempotence signal), and files after the rewrite. */
  final case class DeleteReport(
      rowsBefore: Long, deleted: Long, rowsAfter: Long, notFound: Long)

  /** Governance pass: remove specific ids from a parquet corpus
    * directory — the takedown/right-to-erasure operation every
    * training-data store eventually owes someone. Costs exactly ONE
    * corpus scan: the rewrite's anti-join observes the counts AND the
    * matched deny ids in the same pass (spec-gated by input-records
    * accounting), so the audit derivation never re-reads the corpus —
    * at 100 TB the second scan this replaced doubled every takedown.
    * Same atomic
    * rewrite-then-swap protocol as [[compactParquet]] (readers never see
    * a half-deleted directory; a crash before the swap leaves the
    * original untouched), with the delete audited to `auditDir` as a
    * tombstone record per requested id: `(id, found)` — the proof of
    * WHAT was deleted (and what was already absent, making replays
    * idempotent by inspection) without retaining any deleted CONTENT,
    * which would defeat the point.
    *
    * The denylist is broadcast (takedown lists are small against a
    * corpus; a list large enough to break that assumption should go
    * through the anti-join ingest filters instead) and DEDUPED at entry:
    * takedown lists routinely repeat ids across request batches, and a
    * duplicate entry would otherwise multiply matched rows through the
    * join (inflating the report) and append duplicate tombstones. The
    * anti-join is null-safe on the id. Flat directories only — the
    * partitioned variant would rewrite leaf-by-leaf like
    * [[compactPartitioned]]; refused loudly rather than silently
    * flattened.
    *
    * Atomicity caveat (same as [[compactParquet]]): the swap is two
    * renames, and between rename(path→bak) and rename(tmp→path) the
    * corpus directory briefly does not exist — a reader racing that
    * ~ms window fails its scan, and a crash INSIDE it strands the data
    * in the hidden `.<name>_delete_bak` sibling — restored automatically
    * at the next entry (round 17: [[recoverEraseBaks]] sweeps the
    * `_delete_*` artifacts too; re-running the delete converges, swept
    * boundary-by-boundary in CrashSweepSpec). "Readers never see a
    * HALF-deleted directory" is the
    * guarantee — they can transiently see a missing one. A cluster
    * deployment wanting a truly atomic swap puts a table format's
    * metadata commit (or a view flip) in front of the directory. */
  def targetedDelete(
      spark: SparkSession,
      dir: String,
      idCol: String,
      ids: Seq[Long],
      auditDir: String): DeleteReport = {
    import org.apache.spark.sql.functions.{broadcast, col, collect_set, count, lit, sum, when}
    require(ids.nonEmpty, "empty deletion list — refusing a no-op audit")
    val idsDistinct = ids.distinct
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Self-healing re-entry (round 17; previously the scaladoc said
    // "recover by renaming it back" — the one swap in the family whose
    // recovery was manual): a crash between the two renames leaves the
    // corpus ONLY at its `.<name>_delete_bak` — restore it before the
    // scan, exactly the [[ledgerDelete]] rule.
    recoverEraseBaks(fs, path)
    val subdirs = dataDirs(fs, path)
    if (subdirs.nonEmpty)
      throw new IllegalArgumentException(
        s"$dir contains partition subdirectories — targetedDelete rewrites flat " +
          "directories only (a flat rewrite would fold partition columns into data files)")
    val denyDf = spark.createDataFrame(
      spark.sparkContext.parallelize(idsDistinct.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_graft_deny_id",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val src = spark.read.parquet(dir)
    val obs = org.apache.spark.sql.Observation(s"delete_${path.getName}")
    val tmp = new Path(path.getParent, s".${path.getName}_delete_tmp")
    // ONE scan: the anti-joined rewrite observes the before/hit counts
    // AND the set of deny ids that actually matched (collect_set skips
    // the anti-join survivors' nulls; the metric row is bounded by the
    // denylist, which is broadcast-small by this operator's stated
    // contract — a 100 TB takedown costs exactly one corpus read).
    src
      .join(broadcast(denyDf), col(idCol) === col("_graft_deny_id"), "left")
      .observe(obs,
        count(lit(1)).as("before"),
        sum(when(col("_graft_deny_id").isNotNull, 1L).otherwise(0L)).as("hit"),
        collect_set(col("_graft_deny_id")).as("found_ids"))
      .filter(col("_graft_deny_id").isNull)
      .drop("_graft_deny_id")
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val before = obs.get("before").asInstanceOf[Long]
    val hit = Option(obs.get("hit")).map(_.asInstanceOf[Long]).getOrElse(0L)
    // Tombstone audit BEFORE the swap: if the audit cannot be written,
    // the corpus must not change (an unaudited takedown is the failure
    // the audit exists to prevent).
    val foundIds = obs.get("found_ids")
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    import spark.implicits._
    idsDistinct.map(i => (i, foundIds.contains(i))).toDF("id", "found")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(auditDir)
    val bak = new Path(path.getParent, s".${path.getName}_delete_bak")
    fs.delete(bak, true)
    def renameOrThrow(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"delete swap failed: rename $from -> $to")
    renameOrThrow(path, bak)
    renameOrThrow(tmp, path)
    fs.delete(bak, true)
    DeleteReport(before, hit, before - hit, idsDistinct.size.toLong - foundIds.size)
  }

  /** [[ledgerDelete]]'s report: `notFound` keys were already absent (the
    * idempotence signal); `leavesRewritten` counts swapped or deleted
    * leaf directories. */
  final case class LedgerDeleteReport(
      rowsBefore: Long, deleted: Long, rowsAfter: Long, notFound: Long,
      leavesRewritten: Int)

  /** E153 (round 15, closing the round-14 declared edge): takedown reach
    * into the LEDGER/ARTIFACT spaces — [[targetedDelete]] erases ids from
    * a flat corpus, but the derived spaces retain per-row content: the
    * SRP/semantic ledgers carry the raw VECTOR, the fingerprint ledger
    * the content hash, the PQ store per-id codes. A right-to-erasure
    * delete that leaves those behind retains derived content for the
    * deleted id. This removes every ledger row whose `keyCol` matches a
    * key in `keys` (a one-column frame, takedown-sized by contract —
    * broadcast), preserving what a ledger cannot lose: the `_graft_*`
    * construction pins and the epoch/cell partition LAYOUT (leaves
    * rewrite in place via the [[compactParquet]] swap protocol; a leaf
    * whose rows all match is deleted — its partition simply vanishes).
    *
    * The ledgers are not id-keyed, so the KEY RECIPE is per space and
    * the caller derives it from the corpus BEFORE the corpus delete:
    *  - PQ store codes/rcodes: `keyCol` = the id column
    *    ([[PqOps.pqStoreDelete]] wraps both namespaces);
    *  - SRP band ledger: `keyCol = "_graft_vec"`, keys = the deleted
    *    rows' vector column (stored verbatim at ingest);
    *  - semantic ledger: `keyCol = "_graft_vec"` likewise;
    *  - fingerprint ledger: `keyCols = Seq("_graft_fp", "_graft_fp2")`
    *    (the composite overload), keys = the deleted docs' fingerprints
    *    recomputed with the ingest's two hashes — the PAIR, because
    *    `_graft_fp` alone collides at birthday scale ~35 k docs and a
    *    single-hash takedown would erase unrelated docs' rows.
    * Count ledgers (span counts) hold no per-id rows — nothing to erase.
    *
    * Cost: ONE full ledger scan (a left broadcast join groups total/hit
    * counts and the matched keys per FILE via `_metadata.file_path` —
    * driver state is one small row per ledger file, each carrying at
    * most denylist-many matched keys), then a rewrite of ONLY the leaf
    * directories that contain hits (≤ denylist-bounded). Survivors
    * never write over the directory being read (the foldEpochs rule,
    * here by construction): the partitioned branch stages ALL hit
    * leaves' survivors into a hidden tmp tree in one job, then swaps
    * each hit leaf via the family's rename protocol (old leaf aside to
    * `.bak`, staged leaf in, bak dropped — the [[compactParquet]]
    * discipline), and the flat branch tmp-rewrites + swaps the root.
    * The audit tombstones `(key, found)` append BEFORE any rewrite (an
    * unaudited takedown is the failure the audit exists to prevent);
    * a crash mid-way leaves whole leaves either old or new (per-leaf
    * atomic swaps), and a re-run converges (anti-join idempotent, the
    * already-gone keys simply audit `found = false`). With
    * `hashKeys = true` the tombstone stores `sha2(to_json(key), 256)`
    * instead of the key itself — for vector-keyed spaces the key IS the
    * erased content, and a right-to-erasure audit must not retain it
    * (found/not-found remains answerable: hash the probe key). Run it
    * between drains (the compaction rule): a later epoch REPLAY would
    * re-add a deleted id's rows — delete behind the committed replay
    * horizon. */
  def ledgerDelete(
      spark: SparkSession,
      ledgerDir: String,
      keyCol: String,
      keys: org.apache.spark.sql.DataFrame,
      auditDir: String,
      hashKeys: Boolean = false): LedgerDeleteReport =
    ledgerDelete(spark, ledgerDir, Seq(keyCol), keys, auditDir, hashKeys)

  /** COMPOSITE-key [[ledgerDelete]] (round 17, closing the round-16
    * advice): a ledger whose row identity is a PAIR of columns — the
    * fingerprint ledger keys dedup on `(_graft_fp, _graft_fp2)` exactly
    * because `_graft_fp` alone (charHash mod 1e9+7, ~30 bits) collides
    * at birthday scale ~35 k docs — must be erased on the pair: keyed on
    * `_graft_fp` alone, a corpus-scale takedown also deletes UNRELATED
    * docs' rows, silently disabling their dedup on re-ingest. The match
    * is the conjunction of null-safe equalities over `keyCols`; the
    * audit tombstones carry one column per key (named after the ledger's
    * own key columns; the single-key form keeps its historical `key`
    * name), and `hashKeys` hashes the canonical JSON of the full key
    * struct. Everything else — one-scan accounting, staged swaps, pin
    * preservation, refusals — is the single-key contract verbatim. */
  def ledgerDelete(
      spark: SparkSession,
      ledgerDir: String,
      keyCols: Seq[String],
      keys: org.apache.spark.sql.DataFrame,
      auditDir: String,
      hashKeys: Boolean): LedgerDeleteReport = {
    import org.apache.spark.sql.functions.{broadcast, col, collect_set, count, lit, regexp_replace, sha2, struct, to_json, when}
    require(keyCols.nonEmpty && keyCols.distinct == keyCols,
      s"keyCols must be non-empty and distinct: ${keyCols.mkString(", ")}")
    val path = new Path(ledgerDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery FIRST (round-16 review): a crash between the swap's
    // two renames leaves a leaf only at its dot-hidden `_erase_bak` —
    // invisible to the pass-1 scan, and a naive re-run would delete the
    // staged tmp tree holding the only survivor copy. Restore any bak
    // whose leaf is missing (the rename back is the inverse of the crash
    // step), drop any bak whose leaf exists (crash was after the staged
    // leaf landed), THEN scan. The flat-root bak lives in the root's
    // PARENT, so it is checked before the existence require.
    recoverEraseBaks(fs, path)
    require(fs.exists(path), s"ledger directory $ledgerDir does not exist")
    // Crashed-fold leftovers are already merged into base — physically
    // remove them before scanning so their rows neither double-count the
    // hits nor pay a staged rewrite of a doomed partition (the rule
    // pqStoreDelete applied to the PQ namespaces, generalized to every
    // ledger space).
    deleteFoldLeftovers(fs, path)
    keyCols.foreach(kc => require(keys.columns.contains(kc),
      s"keys frame must carry the key column '$kc', has " +
        keys.columns.mkString(", ")))
    val src = spark.read.parquet(ledgerDir)
    keyCols.foreach(kc => require(src.columns.contains(kc),
      s"ledger at $ledgerDir has no column '$kc' (columns: " +
        s"${src.columns.mkString(", ")}) — pass the space's key column" +
        "(s) (see the per-space key recipes in the scaladoc)"))
    // Takedown-sized by contract: the distinct keys collect driver-side
    // for the audit and rebroadcast exactly once.
    val keyRows = keys.select(keyCols.map(col): _*).distinct().collect().toSeq
    require(keyRows.nonEmpty, "empty deletion key set — refusing a no-op audit")
    val keyTypes = keyCols.map(kc => keys.schema(kc).dataType)
    val dkCols = keyCols.indices.map(i => s"_graft_dk_$i")
    // The extra constant marker makes "this row matched" observable
    // independently of the key VALUES: with composite keys a legitimate
    // null key component would otherwise make both hit-counting and the
    // matched-key collection blind to its row.
    val dkSchema = org.apache.spark.sql.types.StructType(
      dkCols.zip(keyTypes).map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n, t)
      } :+ org.apache.spark.sql.types.StructField("_graft_dk_hit",
        org.apache.spark.sql.types.BooleanType, nullable = false))
    def dkFrame(sess: SparkSession) = broadcast(sess.createDataFrame(
      sess.sparkContext.parallelize(
        keyRows.map(r => org.apache.spark.sql.Row.fromSeq(r.toSeq :+ true)), 1),
      dkSchema))
    val keyDf = dkFrame(spark)
    // The conjunction of null-safe equalities — a null key component can
    // only match a null ledger value, never silently everything.
    val matchCond = keyCols.zip(dkCols)
      .map { case (k, d) => col(k) <=> col(d) }.reduce(_ && _)
    // ONE ledger scan: per-LEAF-DIRECTORY total rows, hit rows, and the
    // matched keys. Grouping by the
    // file's PARENT keeps the driver state at one row per leaf
    // partition, not per file — a compacted 10^12-row store has ~cells
    // leaves but can have millions of files.
    val perFile = src
      .select(keyCols.map(col) :+
        regexp_replace(col("_metadata.file_path"), "/[^/]+$", "").as("_graft_f"): _*)
      .join(keyDf, matchCond, "left")
      .groupBy(col("_graft_f"))
      .agg(count(lit(1)).as("all"), count(col("_graft_dk_hit")).as("hit"),
        collect_set(when(col("_graft_dk_hit"),
          struct(dkCols.map(col): _*))).as("ks"))
      .collect()
    val rowsBefore = perFile.map(_.getLong(1)).sum
    val hit = perFile.map(_.getLong(2)).sum
    val foundKeys = perFile.flatMap(_.getSeq[org.apache.spark.sql.Row](3))
      .map(_.toSeq).toSet
    val rootUri = fs.makeQualified(path).toUri
    // _graft_f is already the leaf DIRECTORY (the per-file path had its
    // last segment stripped inside the aggregation).
    def leafOf(leafUri: String): Path =
      fs.makeQualified(new Path(new java.net.URI(leafUri)))
    // A PARTITION column cannot be the deletion key (round-16 verdict):
    // pass 1 read it with type inference ON (typed) while the staged
    // rewrite reads with inference OFF (verbatim strings), so the same
    // key could match in one pass and not the other — and no ledger
    // space in this family keys by its partition column anyway. Checked
    // against EVERY leaf's layout BEFORE the audit lands (a tombstone
    // for a refused delete would claim an erasure that never ran).
    val layoutPartCols = perFile.iterator.flatMap { r =>
      leafOf(r.getString(0)).toUri.getPath
        .stripPrefix(rootUri.getPath)
        .split("/").filter(_.nonEmpty).map(_.split("=")(0))
    }.toSet
    val partKeyClash = keyCols.filter(layoutPartCols.contains)
    require(partKeyClash.isEmpty,
      s"keyCol '${partKeyClash.mkString(", ")}' is a partition column of " +
        s"the ledger at $ledgerDir — ledgerDelete keys on DATA columns " +
        "(partition values are directory names, typed inconsistently " +
        "across the two passes); drop whole partitions by path instead")
    // Tombstone audit BEFORE the rewrites (the targetedDelete rule):
    // (key, found) per requested key — or, with hashKeys, the key's
    // sha2-256 over its canonical JSON encoding: content-free for
    // vector-keyed erasure (the raw vector IS the erased content), and
    // still probe-able (hash the key you're asking about). Composite
    // keys tombstone one column per key, named after the ledger's own
    // key columns; the single-key form keeps its historical `key` name
    // (and hash encoding) so existing trails stay appendable.
    val auditKeyCols = if (keyCols.size == 1) Seq("key") else keyCols
    val auditRaw = spark.createDataFrame(
        spark.sparkContext.parallelize(
          keyRows.map(r => org.apache.spark.sql.Row.fromSeq(
            r.toSeq :+ foundKeys.contains(r.toSeq))), 1),
        org.apache.spark.sql.types.StructType(
          auditKeyCols.zip(keyTypes).map { case (n, t) =>
            org.apache.spark.sql.types.StructField(n, t)
          } :+ org.apache.spark.sql.types.StructField("found",
            org.apache.spark.sql.types.BooleanType, nullable = false)))
    val audit =
      if (hashKeys)
        auditRaw.select(
          sha2(to_json(struct(auditKeyCols.map(col): _*)), 256).as("key_sha256"),
          col("found"))
      else auditRaw
    // An audit trail mixing raw-key and hashed-key schemas in one
    // directory is unreadable as parquet afterwards (round-16 advice:
    // hashKeys toggled across runs). Refuse the append when the existing
    // trail's columns disagree — hashed and raw audits belong in
    // separate directories.
    val auditPath = new Path(auditDir)
    val auditFs = auditPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (auditFs.exists(auditPath) && auditFs.listStatus(auditPath).exists { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }) {
      val existing = spark.read.parquet(auditDir).columns.toSet
      val incoming = audit.columns.toSet
      require(existing == incoming,
        s"audit schema mismatch at $auditDir: existing columns " +
          s"${existing.toSeq.sorted.mkString(", ")} vs this run's " +
          s"${incoming.toSeq.sorted.mkString(", ")} (hashKeys toggled?) — " +
          "write hashed audits to their own directory")
    }
    audit.coalesce(1)
      .write.mode(SaveMode.Append).parquet(auditDir)
    // Rewrite only the leaf directories holding hits. Per-leaf survivor
    // counts come from the pass-1 accounting (no extra read).
    val hitLeaves = perFile.filter(_.getLong(2) > 0L)
      .map(r => leafOf(r.getString(0))).distinct.toSeq
    // Per-leaf totals count files WITHOUT hits inside the same leaf too
    // (the left join saw every file) — survivors(leaf) = all − hit.
    val allByLeaf = perFile.groupBy(r => leafOf(r.getString(0))).view
      .mapValues(_.map(r => r.getLong(1)).sum).toMap
    val hitByLeaf = perFile.groupBy(r => leafOf(r.getString(0))).view
      .mapValues(_.map(r => r.getLong(2)).sum).toMap
    def renameOrThrow(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"ledgerDelete swap failed: rename $from -> $to")
    val flatRoot = hitLeaves.exists(l => fs.makeQualified(l).toUri == rootUri)
    if (flatRoot) {
      // FLAT ledger: the root itself is the one leaf — atomic
      // tmp-rewrite + swap, with the root-level `_graft_*` pins
      // snapshotted and restored (the compactLedger rule).
      require(hitLeaves.length == 1,
        s"ledger at $ledgerDir mixes root-level files with partition " +
          "subdirectories — a layout no writer of this family produces")
      val leaf = hitLeaves.head
      if (allByLeaf(leaf) - hitByLeaf(leaf) == 0L)
        throw new IllegalStateException(
          s"ledgerDelete would remove EVERY row of the flat ledger at " +
            s"$ledgerDir — delete the directory (and its pins) explicitly " +
            "instead of erasing it empty.")
      val metaSnapshot = fs.listStatus(leaf).filter { s =>
        s.isFile && s.getPath.getName.startsWith("_graft_")
      }.map { s =>
        val in = fs.open(s.getPath)
        try s.getPath.getName -> {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
          buf.toByteArray
        } finally in.close()
      }.toMap
      val tmp = new Path(leaf.getParent, s".${leaf.getName}_erase_tmp")
      fs.delete(tmp, true)
      spark.read.parquet(leaf.toString)
        .join(keyDf, matchCond, "left_anti")
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val bak = new Path(leaf.getParent, s".${leaf.getName}_erase_bak")
      fs.delete(bak, true)
      renameOrThrow(leaf, bak)
      renameOrThrow(tmp, leaf)
      // Pins restored BEFORE the bak is dropped (round-17 reorder): the
      // staged tmp never carried the `_graft_*` pins, so until they are
      // rewritten the leaf is not whole — the family's own protocol
      // ("bak kept until the staged leaf is in") demands the bak outlive
      // the gap. A crash inside it now leaves the pins recoverable from
      // the bak, and [[recoverEraseBaks]] copies them out before it
      // drops a bak whose original exists.
      metaSnapshot.foreach { case (name, bytes) =>
        val p = new Path(leaf, name)
        if (!fs.exists(p)) {
          val out = fs.create(p, true)
          try out.write(bytes) finally out.close()
        }
      }
      fs.delete(bak, true)
    } else if (hitLeaves.nonEmpty) {
      // PARTITIONED ledger: ONE job stages every hit leaf's survivors
      // into a hidden tmp tree — a takedown touching 200 leaves must
      // not pay 200 sequential job launches (measured 0.4 s each at the
      // probe scale; one job is ~flat in leaf count) — then each hit
      // leaf swaps via the family's rename protocol. Staging (rather
      // than dynamic partition overwrite of ledgerDir itself) buys two
      // things at once: the job never writes over the directory it is
      // reading (the foldEpochs rule, satisfied by construction instead
      // of a checkpoint pin), and the per-leaf swap is two renames with
      // the bak kept until the staged leaf is in — whole-leaf old-or-new
      // under any crash, where dynamic overwrite's commit (delete
      // existing partition, then rename staged) can lose a leaf's
      // SURVIVORS between its two steps. The affected leaves read back
      // WITH their partition columns (basePath); a leaf whose rows ALL
      // matched stages no output directory and is deleted outright (a
      // crash between the two re-runs convergently: pass 1 still finds
      // its hits). Partition column names parse from the leaf's
      // relative `col=value` path segments.
      val partCols = {
        val rel = hitLeaves.head.toUri.getPath
          .stripPrefix(fs.makeQualified(path).toUri.getPath)
          .split("/").filter(_.nonEmpty)
        val cols = rel.map(_.split("=")(0)).toSeq
        require(cols.nonEmpty && hitLeaves.forall { l =>
          l.toUri.getPath.stripPrefix(fs.makeQualified(path).toUri.getPath)
            .split("/").filter(_.nonEmpty).map(_.split("=")(0)).toSeq == cols
        }, s"ledger at $ledgerDir has an inconsistent partition layout " +
          "across its hit leaves — rewrite it with compactLedger first")
        cols
      }
      val tmpRoot = new Path(path, "._graft_erase_tmp")
      fs.delete(tmpRoot, true)
      // Partition VALUES must round-trip as the exact directory-name
      // strings (round-16 review): with type inference on, a value like
      // a zero-padded manual epoch token `007` reads back as int 7 and
      // the staged write renders `=7` — a name the swap loop below would
      // not find, mis-inferring "every row matched" and deleting the
      // leaf's survivors. Inference OFF keeps every partition value the
      // verbatim dir string, so staged names equal the original names by
      // construction; nothing is persisted typed (partitionBy stores the
      // value only in the dir name). The setting is scoped to a CLONED
      // session (round-16 advice: flipping the shared session conf let
      // any concurrent query on the same SparkSession observe inference
      // disabled for the duration of the rewrite); the deletion keys are
      // re-broadcast inside the clone from the already-collected rows.
      val eraseSession = spark.newSession()
      eraseSession.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      eraseSession.read.option("basePath", ledgerDir)
        .parquet(hitLeaves.map(_.toString): _*)
        .join(dkFrame(eraseSession), matchCond, "left_anti")
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partCols: _*)
        .parquet(tmpRoot.toString)
      val rootQ = fs.makeQualified(path).toUri.getPath
      hitLeaves.foreach { leaf =>
        val rel = leaf.toUri.getPath.stripPrefix(rootQ).stripPrefix("/")
        val staged = new Path(tmpRoot, rel)
        val survivors = allByLeaf(leaf) - hitByLeaf(leaf)
        if (fs.exists(staged)) {
          val bak = new Path(leaf.getParent, s".${leaf.getName}_erase_bak")
          fs.delete(bak, true)
          renameOrThrow(leaf, bak)
          renameOrThrow(staged, leaf)
          // In-leaf `_graft_*` pins/markers (the folded base partition
          // carries its fold marker INSIDE the leaf since round 17)
          // ride out of the bak before it drops — the staged tree never
          // had them, and losing the in-base marker would re-open the
          // replay horizon the fold just committed.
          copyGraftPins(fs, bak, leaf)
          fs.delete(bak, true)
        } else if (survivors == 0L) {
          // Every row matched (pass-1 accounting, not inferred from the
          // staged dir's absence) — the partition vanishes, except any
          // in-leaf `_graft_*` pins/markers, which stay behind in a
          // data-less shell: an erased-empty base partition must not
          // take the fold horizon with it.
          val pins = fs.listStatus(leaf).filter { f =>
            f.isFile && f.getPath.getName.startsWith("_graft_")
          }.map(_.getPath.getName)
          if (pins.isEmpty) fs.delete(leaf, true)
          else fs.listStatus(leaf).foreach { f =>
            if (!pins.contains(f.getPath.getName)) fs.delete(f.getPath, true)
          }
        } else {
          // Survivors exist but their staged copy is not where the swap
          // expects it — refuse loudly rather than delete survivors. The
          // leaf is untouched; a re-run converges.
          throw new IllegalStateException(
            s"ledgerDelete: staged survivors missing for leaf $leaf " +
              s"($survivors expected at $staged) — refusing the swap; " +
              "the leaf is untouched, inspect ._graft_erase_tmp")
        }
      }
      fs.delete(tmpRoot, true)
    }
    LedgerDeleteReport(rowsBefore, hit, rowsBefore - hit,
      (keyRows.size - foundKeys.size).toLong, hitLeaves.length)
  }

  /** Cluster a dataset's FILE layout for scan pruning: range-partition on
    * the cluster columns, sort within each partition, write parquet. Every
    * output file then covers a narrow, near-disjoint range of the cluster
    * key, so parquet min/max statistics (and any engine's file skipping)
    * prune most files for a selective predicate — at 100 TB, the
    * difference between scanning a date slice and scanning everything,
    * WITHOUT the directory explosion a high-cardinality `partitionBy`
    * would cause. One range shuffle (samples the key distribution) + a
    * per-partition sort; equal keys land in one file.
    */
  def clusterBy(
      df: org.apache.spark.sql.DataFrame,
      dir: String,
      cols: Seq[String],
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(nFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Morton z-value of two columns, low `bits` bits each (inputs are cast
    * to long; callers fold high-cardinality keys into the budget with a
    * `% (1 << bits)` first — the curve only needs enough resolution to
    * separate files, not to order every key). */
  def zorderValue(x: org.apache.spark.sql.Column,
                  y: org.apache.spark.sql.Column,
                  bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.BitInterleaveExpr(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))
  }

  /** N-ary [[zorderValue]]: Morton z-value of 2–6 columns, `bits` low
    * bits each, round-robin bit layout (the 2-column case is
    * bit-identical to the binary form). Real layout tuning clusters 3–4
    * keys; the budget must fit one long (`bits·k ≤ 63`). */
  def zorderValueN(cols: Seq[org.apache.spark.sql.Column],
                   bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.BitInterleaveNExpr(
      cols.map(c => ColumnBridge.expression(c.cast("long"))), bits))
  }

  /** Z-order clustering: [[clusterBy]]'s two-dimensional sibling. A
    * single-column range cluster gives file-level min/max locality in ONE
    * column and none in the other; range-partitioning by the interleaved
    * z-value bounds every output file in BOTH columns at once, so
    * selective predicates on EITHER (or both) prune files/row-groups at
    * the scan (`PartitionFilters`/parquet stats). Same cost shape as
    * clusterBy: one range shuffle (samples the z distribution) + a
    * per-partition sort; the z column is dropped before the write. */
  def zorderCluster(
      df: org.apache.spark.sql.DataFrame,
      dir: String,
      colX: String,
      colY: String,
      bits: Int,
      nFiles: Int): Unit =
    zorderClusterN(df, dir, Seq(colX, colY), bits, nFiles)

  /** N-column [[zorderCluster]] (2–6 cluster keys, [[zorderValueN]]'s
    * curve): every output file gets a bounded min/max box in ALL
    * interleaved columns at once. Same cost shape regardless of k: one
    * range shuffle + a per-partition sort. */
  def zorderClusterN(
      df: org.apache.spark.sql.DataFrame,
      dir: String,
      cols: Seq[String],
      bits: Int,
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val z = zorderValueN(cols.map(col), bits)
    df.withColumn("_graft_zval", z)
      .repartitionByRange(nFiles, col("_graft_zval"))
      .sortWithinPartitions(col("_graft_zval"))
      .drop("_graft_zval")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Compact a near-dup band LEDGER directory ([[LshOps]]/[[SrpOps]]
    * incremental ingest state). Epoch-keyed ledgers grow one
    * `_graft_epoch=<token>` partition per micro-batch FOREVER — a daily
    * 100 TB ingest accumulates thousands of small parquet leaves, and the
    * per-batch ledger read comes to be dominated by file listing/opens.
    * This compacts the data files while preserving the two things a
    * ledger cannot lose:
    *
    *  - the `_graft_*_meta` construction-parameter pin. A partitioned
    *    ledger keeps it naturally (only `col=value` leaves are rewritten);
    *    a FLAT ledger's [[compactParquet]] swap replaces the whole
    *    directory, so the root-level `_`-prefixed metadata files are
    *    snapshotted (they are bytes-small) and restored after the swap.
    *    Losing the pin would not corrupt data but would disarm the
    *    width-drift refusal — the next mismatched ingest would silently
    *    never collide and then RE-pin at the drifted parameters.
    *  - the epoch partition layout (replay safety): leaves are compacted
    *    in place, never folded together, so a crash-replayed epoch still
    *    dynamically overwrites exactly its own partition. Fold/expire of
    *    epochs known to be beyond checkpoint replay is a separate,
    *    deliberately manual decision.
    *
    * Run it between drains (the ingest protocol holds no locks). Safe on
    * both ledger families and both layouts; refuses nothing a plain
    * compaction would accept.
    */
  def compactLedger(
      spark: SparkSession,
      ledgerDir: String,
      targetMB: Int = 128): CompactionReport = {
    val path = new Path(ledgerDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Same entry sweep as [[foldEpochs]]: a bak-hidden leaf must be
    // restored before the compaction walks the layout, or its rows are
    // left out of the rewrite it believes is whole.
    recoverEraseBaks(fs, path)
    val metaFiles = fs.listStatus(path).filter { s =>
      s.isFile && s.getPath.getName.startsWith("_graft_")
    }.map { s =>
      val in = fs.open(s.getPath)
      try s.getPath.getName -> {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 8192, false)
        buf.toByteArray
      } finally in.close()
    }.toMap
    val report =
      if (dataDirs(fs, path).nonEmpty) compactPartitioned(spark, ledgerDir, targetMB)
      else compactParquet(spark, ledgerDir, targetMB)
    metaFiles.foreach { case (name, bytes) =>
      val p = new Path(path, name)
      if (!fs.exists(p)) {
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
      }
    }
    report
  }

  /** Fold committed epoch partitions of a band ledger into one `base`
    * partition — the lifecycle step AFTER [[compactLedger]]: compaction
    * shrinks files within partitions, but a year of daily drains is still
    * 365 directories, and the per-batch ledger read pays the listing.
    * Folding is safe exactly for epochs that can never be REPLAYED (the
    * epoch replay protocol dynamically overwrites the replayed epoch's own
    * partition — folding a replayable epoch would duplicate it on replay):
    * the caller states the highest provably-committed batch id, and the
    * CLI derives it from the streaming checkpoint's commit log rather
    * than trusting a human.
    *
    * The fold token `base` is outside the `epoch<N>` namespace, so (a) it
    * can never collide with a live epoch's dynamic overwrite, (b) the
    * foreign-epoch checkpoint-reset guard ignores it, and (c) collision
    * reads (`_graft_epoch =!= "epoch<batchId>"`) always include it.
    *
    * MEMBERSHIP ledgers (fingerprint/band/SRP/cluster rows) fold as a
    * plain union — bucket membership is a set, and hit reads are
    * semi-join/distinct. COUNT ledgers (the span ledger's
    * `(spanKey, _graft_n)` rows, detected by schema) RE-AGGREGATE on
    * fold: the base keeps one summed row per distinct key instead of one
    * row per (batch, key), so the read-side sum stays bounded by the
    * distinct-span count over years of drains instead of growing with
    * drain count — and, because counts are summed at read time,
    * duplicates are NOT harmless there, which is what the marker below
    * exists for.
    *
    * Crash contract (hardened round 17, after the crash-point sweep
    * found the dynamic-overwrite commit gap): the merged base is staged
    * into a hidden sibling tmp WITH the new `_graft_folded_through`
    * marker inside it, then swapped in behind a bak
    * ([[swapBasePartition]]) — the old base exists until the new one is
    * whole, and data + horizon commit in ONE rename. Then the folded
    * epoch directories are deleted. Epoch dirs at-or-under the marker
    * are LEFTOVERS of a crashed fold — already merged into base — so a
    * re-run deletes them without re-merging (convergent for the count
    * ledger, where a re-merge would double counts) and the span
    * ledger's collision read excludes them meanwhile. Every boundary of
    * this sequence is enumerated convergent by CrashSweepSpec — the
    * former base-write→marker-write gap no longer exists, because the
    * marker rides the swap. Run between drains, like compaction.
    */
  def foldEpochs(
      spark: SparkSession,
      ledgerDir: String,
      upToBatchId: Long): CompactionReport = {
    import org.apache.spark.sql.functions.{col, lit, sum}
    require(upToBatchId >= 0L, s"upToBatchId must be >= 0: $upToBatchId")
    val path = new Path(ledgerDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Erase-crash recovery BEFORE anything lists epochs (round-17 lead
    // fix): an epoch hidden at its `_erase_bak` by a crashed
    // [[ledgerDelete]] swap is invisible to this listing — without the
    // sweep the fold would advance the marker past it, and the eventual
    // recovery would restore an epoch [[deleteFoldLeftovers]] then
    // deletes UNMERGED (committed batch silently lost). Restored here,
    // it folds with everything else or stays live above the marker.
    recoverEraseBaks(fs, path)
    val priorMark = foldedThrough(fs, path)
    // The shared digits-only parse — see foldableEpochId's scaladoc for
    // why every fold-protocol site must use it.
    def epochId(name: String): Option[Long] = epochDirId(name)
    val all = fs.listStatus(path).filter { s =>
      s.isDirectory && epochId(s.getPath.getName).isDefined
    }
    // Leftovers of a crashed fold: their rows are already in base.
    all.filter(d => epochId(d.getPath.getName).exists(_ <= priorMark))
      .foreach(d => fs.delete(d.getPath, true))
    val folded = all.filter(d => epochId(d.getPath.getName)
      .exists(id => id > priorMark && id <= upToBatchId))
    if (folded.isEmpty) return CompactionReport(0, 0, 0L)
    val foldTokens = folded.map(_.getPath.getName.stripPrefix("_graft_epoch=")).toSet
    val maxFolded = folded.flatMap(d => epochId(d.getPath.getName)).max
    val filesBefore = folded.map(d => fs.listStatus(d.getPath).count(_.isFile)).sum
    // One read of the whole ledger, filtered to base + the folded epochs;
    // rewrite as the new base via dynamic partition overwrite (only the
    // base partition is replaced — live epochs are untouched).
    // Materialized BEFORE the write: the write replaces the base partition
    // of the very directory the rows were read from, and Spark (rightly)
    // refuses a write whose input files live under the output path. The
    // pinned copy also makes the subsequent write independent of the
    // delete step. Maintenance-sized data by construction (band/bucket
    // keys + vectors, not the corpus).
    val unioned = spark.read.parquet(ledgerDir)
      .filter(col("_graft_epoch") === "base" ||
        col("_graft_epoch").isInCollection(foldTokens))
      .withColumn("_graft_epoch", lit("base"))
    val merged =
      if (!countFoldRule(fs, path)) unioned
      else {
        // Count-ledger fold (declared by the writer via _graft_fold_rule,
        // never sniffed from a column name): one summed row per distinct
        // key.
        require(unioned.columns.contains("_graft_n"),
          s"ledger at $ledgerDir declares the count fold rule but has no " +
            "_graft_n column — refusing a fold whose semantics can't hold")
        val keys = unioned.columns
          .filterNot(c => c == "_graft_n" || c == "_graft_epoch")
        unioned.groupBy(keys.map(col): _*)
          .agg(sum(col("_graft_n")).as("_graft_n"))
          .withColumn("_graft_epoch", lit("base"))
          .select(unioned.columns.map(col): _*)
      }
    val rowsDf = merged.localCheckpoint(true)
    val rows = rowsDf.count()
    // Staged base swap with the marker inside (round 17) — see
    // [[swapBasePartition]] for why the former dynamic partition
    // overwrite could destroy the pre-fold base, and how riding the
    // marker in the same rename closes the count-ledger double-merge
    // window.
    swapBasePartition(fs, path, rowsDf.drop("_graft_epoch"),
      math.max(priorMark, maxFolded))
    folded.foreach(d => fs.delete(d.getPath, true))
    val filesAfter = fs.listStatus(new Path(path, "_graft_epoch=base"))
      .count { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    CompactionReport(filesBefore, filesAfter, rows)
  }

  /** Name PREFIX of the fold high-water marker (`_`-prefixed: invisible
    * to parquet directory reads, preserved by [[compactLedger]]). The
    * folded-through id lives in the FILE NAME, not the content — a
    * `create` is atomic in a way a write-then-flush is not, so a crash
    * mid-marker can only mean "marker absent" (the prior fold's marker
    * still stands), never a torn file that bricks every later read with
    * a parse error. Superseded markers are best-effort deleted; extras
    * left by a crash are harmless (the max still wins). */
  private[operators] val FoldMarkerPrefix = "_graft_folded_through_"

  /** THE one parse of a fold-addressable epoch token (round 16): defined
    * ONLY for the digits-only `epoch<N>` shape. Every part of the fold
    * protocol — what [[foldEpochs]]/`foldPqEpochs` fold, what
    * [[excludeFoldLeftovers]] hides, what [[deleteFoldLeftovers]]
    * removes, what the replay guards refuse — MUST share this parse: the
    * round-16 review found the guard's regex (`epoch\d+`) and the fold
    * machinery's `stripPrefix("epoch").toLong` had drifted, so a manual
    * token like `epoch-1` or `epoch+5` committed unguarded (regex says
    * manual) and was then excluded from reads and physically deleted as
    * a crashed-fold leftover (toLong says folded) — a committed batch
    * silently lost. With one parse a non-`epoch<digits>` token is MANUAL
    * everywhere: never folded, never excluded, never deleted, never
    * refused. */
  def foldableEpochId(token: String): Option[Long] =
    if (token.matches("epoch\\d+"))
      scala.util.Try(token.stripPrefix("epoch").toLong).toOption
    else None

  /** [[foldableEpochId]] of a `_graft_epoch=<token>` directory name. */
  def epochDirId(dirName: String): Option[Long] =
    if (dirName.startsWith("_graft_epoch="))
      foldableEpochId(dirName.stripPrefix("_graft_epoch="))
    else None

  /** Restore/clear leftover `.<name>_erase_bak` / `.<name>_compact_bak`
    * swap backups under (and beside) a ledger root (the name predates
    * round 17's widening to the compaction family — every staged swap
    * of the family shares this one recovery). A [[ledgerDelete]] (or
    * [[compactParquet]], or fold-base — [[swapBasePartition]]) crash
    * between its two renames leaves the original leaf ONLY at the
    * hidden bak: rename it
    * back when the leaf is missing (the re-run then re-finds its hits —
    * convergent), delete it when the leaf exists (the staged leaf
    * landed; the bak is a stale copy — but any `_graft_*` pin files the
    * restored leaf is MISSING are copied out of the bak first: a crash
    * between the flat branch's tmp→leaf rename and its pin restore
    * leaves the bak holding the only copy of the construction pins and
    * the fold marker, and deleting it would silently disarm the
    * width-drift refusal and the replay-horizon guard). Stale
    * `_erase_tmp` staging is swept too. The flat-root bak/tmp live in
    * the root's PARENT.
    *
    * MUST run at the entry of EVERY maintenance op that reads epoch
    * state or advances the fold marker — not just [[ledgerDelete]]
    * (round-17 lead fix): a fold that runs between a crashed erase swap
    * and its recovery does not see the bak-hidden epoch, advances
    * `_graft_folded_through_` past it, and the eventual recovery then
    * restores an epoch the leftover sweep deletes as "already merged" —
    * a committed batch silently lost, with [[excludeFoldLeftovers]]
    * hiding it from reads in the meantime. With the recovery sweep at
    * fold/compact entry the hidden epoch is restored BEFORE the fold
    * lists epochs, so it either folds with everything else or stays a
    * live epoch above the marker. */
  /** Copy `_graft_*` pin/marker files present in `from` but missing in
    * `to` — the whole-leaf-old-or-new rule's tail: a staged rewrite's
    * tmp never carries the in-leaf pins (construction pins, the in-base
    * fold marker), so every swap that drops its bak must first copy the
    * pins out of it, and every recovery that drops a bak whose original
    * exists must do the same. */
  private def copyGraftPins(
      fs: org.apache.hadoop.fs.FileSystem, from: Path, to: Path): Unit =
    fs.listStatus(from).foreach { f =>
      if (f.isFile && f.getPath.getName.startsWith("_graft_")) {
        val dst = new Path(to, f.getPath.getName)
        if (!fs.exists(dst)) {
          val in = fs.open(f.getPath)
          val out = fs.create(dst, true)
          try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          finally { in.close(); out.close() }
        }
      }
    }

  /** Swap-artifact suffixes this sweep recovers: the erase family's
    * ([[ledgerDelete]], [[swapBasePartition]]) and the compaction
    * family's ([[compactParquet]]) — both share the tmp → bak → swap
    * protocol, so both share the recovery (round 17: a leaf hidden at
    * its `_compact_bak` by a crashed compaction was previously
    * restorable only by hand, and a fold could advance its marker past
    * a compact-hidden epoch exactly like the erase case). */
  private val SwapBakSuffixes = Seq("_erase_bak", "_compact_bak", "_delete_bak")
  private val SwapTmpSuffixes = Seq("_erase_tmp", "_compact_tmp", "_delete_tmp")

  private[graft] def recoverEraseBaks(
      fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit = {
    def restoreOrDrop(bak: Path, orig: Path): Unit =
      if (!fs.exists(orig)) {
        if (!fs.rename(bak, orig))
          throw new java.io.IOException(
            s"swap recovery failed: rename $bak -> $orig")
      } else {
        copyGraftPins(fs, bak, orig)
        fs.delete(bak, true)
      }
    def handle(s: org.apache.hadoop.fs.FileStatus): Unit = {
      val n = s.getPath.getName
      val bakSuffix = SwapBakSuffixes.find(n.endsWith)
      if (s.isDirectory && n.startsWith(".") && bakSuffix.isDefined) {
        restoreOrDrop(s.getPath,
          new Path(s.getPath.getParent,
            n.stripPrefix(".").stripSuffix(bakSuffix.get)))
      } else if (s.isDirectory && n.startsWith(".") &&
          SwapTmpSuffixes.exists(n.endsWith)) {
        fs.delete(s.getPath, true)
      } else if (s.isDirectory &&
          (n.contains("=") || (!n.startsWith("_") && !n.startsWith(".")))) {
        // Recurse into ANY `col=value` partition directory, including
        // `_`-prefixed ones (`_graft_epoch=…`): a multi-level layout
        // whose FIRST level is `_`-prefixed would otherwise never have
        // its nested baks restored after a crash (round-16 advice). The
        // same partition-dir rule as [[dataDirs]].
        fs.listStatus(s.getPath).foreach(handle)
      }
    }
    // Flat-root swap artifacts sit BESIDE the root, not under it.
    val parent = root.getParent
    if (parent != null && fs.exists(parent)) {
      SwapBakSuffixes.foreach { sfx =>
        val bak = new Path(parent, s".${root.getName}$sfx")
        if (fs.exists(bak)) restoreOrDrop(bak, root)
      }
      SwapTmpSuffixes.foreach { sfx =>
        fs.delete(new Path(parent, s".${root.getName}$sfx"), true)
      }
    }
    if (fs.exists(root)) fs.listStatus(root).foreach(handle)
  }

  /** Remove crashed-fold leftover epoch partitions (at-or-under the
    * ledger's fold marker — already merged into base, their delete was
    * pending when the fold crashed). The physical-delete counterpart of
    * [[excludeFoldLeftovers]]'s read-side filter; [[ledgerDelete]] runs
    * it on entry so no erase double-counts a leftover's rows or pays a
    * rewrite of a partition already slated for deletion — for EVERY
    * ledger space, not just the PQ store (round-16 review: the cleanup
    * was previously bolted onto pqStoreDelete alone). */
  private[graft] def deleteFoldLeftovers(
      fs: org.apache.hadoop.fs.FileSystem, ledgerPath: Path): Unit = {
    val mark = foldedThrough(fs, ledgerPath)
    if (mark >= 0L && fs.exists(ledgerPath))
      fs.listStatus(ledgerPath).foreach { s =>
        if (s.isDirectory &&
            epochDirId(s.getPath.getName).exists(_ <= mark))
          fs.delete(s.getPath, true)
      }
  }

  /** Highest batch id a completed fold has merged into base (−1 if the
    * ledger has never folded). Epoch partitions at-or-under this id that
    * still exist are crash leftovers: already merged, pending delete —
    * [[foldEpochs]] removes them on its next run and the count ledgers'
    * collision reads exclude them in the meantime. */
  def foldedThrough(fs: org.apache.hadoop.fs.FileSystem, ledgerPath: Path): Long = {
    def idsIn(p: Path): Iterator[Long] =
      if (!fs.exists(p)) Iterator.empty
      else fs.listStatus(p).iterator.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith(FoldMarkerPrefix))
          scala.util.Try(n.stripPrefix(FoldMarkerPrefix).toLong).toOption
        else None
      }
    // Since round 17 the fold commits its marker INSIDE the staged base
    // partition (data + horizon land in ONE rename — see
    // [[swapBasePartition]]); root-level markers remain valid (written
    // by rebalances carrying a horizon into a fresh namespace, and by
    // pre-round-17 folds). Max over both locations wins, as ever.
    val ids = (idsIn(ledgerPath) ++
      idsIn(new Path(ledgerPath, "_graft_epoch=base"))).toSeq
    if (ids.isEmpty) -1L else ids.max
  }

  private[operators] def writeFoldedThrough(
      fs: org.apache.hadoop.fs.FileSystem, ledgerPath: Path, id: Long): Unit = {
    val prior = fs.listStatus(ledgerPath)
      .filter(_.getPath.getName.startsWith(FoldMarkerPrefix)).map(_.getPath)
    fs.create(new Path(ledgerPath, s"$FoldMarkerPrefix$id"), true).close()
    // Cleanup AFTER the new marker exists; a crash between the two
    // leaves extra markers, and max() still answers correctly.
    prior.foreach(p => fs.delete(p, false))
  }

  /** Commit a fold's new `_graft_epoch=base` partition by STAGED SWAP
    * (round 17; both folds previously used Spark's dynamic partition
    * overwrite). The crash-point sweep (CrashSweepSpec) caught the
    * overwrite's commit gap: dynamic overwrite DELETES the existing
    * base partition and then renames its hidden staging in — a crash
    * between the two destroys the only copy of the pre-fold base rows
    * (the epochs still on disk hold none of them). The family's own
    * tmp → bak → swap protocol closes it: the bak keeps the old base
    * until the staged one is in, and [[recoverEraseBaks]] — already run
    * at every maintenance entry — converges both crash sides.
    *
    * The NEW fold marker is created INSIDE the staged tmp before the
    * swap, so the merged data and the advanced horizon commit in the
    * SAME rename. That closes the protocol's last declared
    * non-convergent window (base-write → marker-write): a re-entry
    * after ANY post-swap crash reads the new horizon from inside base,
    * classifies the folded epochs as leftovers, and deletes them
    * WITHOUT re-merging — so a count ledger can no longer double its
    * epoch contributions from that gap. Root-level markers superseded
    * by the swapped-in one are best-effort deleted afterwards.
    *
    * `df` must NOT carry the `_graft_epoch` column (base's files never
    * do — it is a partition directory name); deeper partitioning (the
    * PQ store's `cell`) rides `partitionCols`. */
  private[operators] def swapBasePartition(
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      df: org.apache.spark.sql.DataFrame,
      newMark: Long,
      partitionCols: Seq[String] = Nil): Unit = {
    require(!df.columns.contains("_graft_epoch"),
      "swapBasePartition: drop _graft_epoch before staging — base's " +
        "files never carry the partition column")
    val leaf = new Path(root, "_graft_epoch=base")
    val tmp = new Path(root, "._graft_epoch=base_erase_tmp")
    fs.delete(tmp, true)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    writeFoldedThrough(fs, tmp, newMark)
    val bak = new Path(root, "._graft_epoch=base_erase_bak")
    fs.delete(bak, true)
    if (fs.exists(leaf) && !fs.rename(leaf, bak))
      throw new java.io.IOException(s"fold swap failed: rename $leaf -> $bak")
    if (!fs.rename(tmp, leaf))
      throw new java.io.IOException(s"fold swap failed: rename $tmp -> $leaf")
    fs.delete(bak, true)
    // The inner marker is authoritative and >= any root-level one;
    // superseded root markers are debris (crash here leaves extras —
    // max still answers correctly).
    fs.listStatus(root)
      .filter(_.getPath.getName.startsWith(FoldMarkerPrefix))
      .foreach(p => fs.delete(p.getPath, false))
  }

  /** Name of the ledger's fold-rule declaration. Content `sum` = count
    * ledger: [[foldEpochs]] must RE-AGGREGATE `_graft_n` per key on fold
    * (duplicates double-count at read). Absent = membership ledger:
    * fold is a plain union (sets tolerate duplicates). Written by the
    * count-ledger operators at commit — fold semantics are declared by
    * the writer, never inferred from a column name (a future ledger
    * carrying a non-additive `_graft_n` must not be silently summed). */
  private[operators] val FoldRuleFile = "_graft_fold_rule"

  /** True when a ledger directory holds committed DATA — epoch
    * partition dirs or bare part files; maintenance markers and pins
    * (`_graft_*`, `_SUCCESS`, dotfiles) don't count. Backs the ledger
    * family's pin-or-refuse read rule: a NON-EMPTY ledger whose
    * construction pin is missing must refuse reads instead of silently
    * skipping validation — a crash between data commit and pin write
    * (or a deleted pin) would otherwise let a later ingest with
    * different construction parameters pass the drift check and quietly
    * change what the ledger's numbers mean. */
  private[operators] def ledgerHasData(
      fs: org.apache.hadoop.fs.FileSystem, ledgerPath: Path): Boolean =
    fs.exists(ledgerPath) && fs.listStatus(ledgerPath).exists { s =>
      val n = s.getPath.getName
      n.startsWith("_graft_epoch=") || !(n.startsWith("_") || n.startsWith("."))
    }

  /** Declare the count-ledger fold rule (idempotent). */
  private[operators] def declareCountFoldRule(
      fs: org.apache.hadoop.fs.FileSystem, ledgerPath: Path): Unit = {
    val p = new Path(ledgerPath, FoldRuleFile)
    if (!fs.exists(p)) {
      val out = fs.create(p, true)
      try out.write("sum".getBytes("UTF-8")) finally out.close()
    }
  }

  private def countFoldRule(
      fs: org.apache.hadoop.fs.FileSystem, ledgerPath: Path): Boolean = {
    val p = new Path(ledgerPath, FoldRuleFile)
    fs.exists(p) && {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      s == "sum"
    }
  }

  /** Drop crashed-fold leftover epochs from a count-ledger read: epoch
    * partitions at-or-under the fold marker are already merged into
    * base (their delete is pending), so summing reads must exclude them
    * — the shared rule of every count ledger (spans E109, heavy hitters
    * E138). Membership ledgers don't need this (duplicates are
    * set-harmless). */
  private[operators] def excludeFoldLeftovers(
      fs: org.apache.hadoop.fs.FileSystem,
      ledgerPath: Path,
      raw: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val mark = foldedThrough(fs, ledgerPath)
    val leftovers: Set[String] =
      if (mark < 0L) Set.empty
      else fs.listStatus(ledgerPath).iterator.collect {
        case s if s.isDirectory &&
            epochDirId(s.getPath.getName).exists(_ <= mark) =>
          s.getPath.getName.stripPrefix("_graft_epoch=")
      }.toSet
    if (leftovers.isEmpty) raw
    else raw.filter(!col("_graft_epoch").isInCollection(leftovers))
  }

  /** Highest batch id with a COMMIT entry in a Structured Streaming
    * checkpoint — the replay horizon [[foldEpochs]] needs: a committed
    * batch never re-executes, so its ledger epoch can be folded. Returns
    * None for a missing/empty commit log (refuse to fold rather than
    * guess). */
  def lastCommittedBatch(
      spark: SparkSession,
      checkpointDir: String): Option[Long] = {
    val commits = new Path(checkpointDir, "commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) None
    else fs.listStatus(commits)
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      .reduceOption(_ max _)
  }

  /** Compact a Hive-partitioned directory leaf-by-leaf, preserving the
    * `col=value` layout (and therefore partition pruning and the
    * idempotent-sink replace-on-replay contract). Each leaf is an
    * independent crash-safe swap, so a failure mid-way leaves every leaf
    * either fully old or fully new — never mixed. */
  def compactPartitioned(
      spark: SparkSession,
      dir: String,
      targetMB: Int = 128): CompactionReport = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path): Seq[Path] = {
      val subs = dataDirs(fs, p)
      if (subs.isEmpty) Seq(p) else subs.toSeq.flatMap(s => leaves(s.getPath))
    }
    val reports = leaves(path).map(l => compactParquet(spark, l.toString, targetMB))
    CompactionReport(
      reports.map(_.filesBefore).sum,
      reports.map(_.filesAfter).sum,
      reports.map(_.rows).sum)
  }
}
