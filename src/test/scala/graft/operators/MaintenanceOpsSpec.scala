package graft.operators

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compaction collapses small files and preserves the data") {
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    // 32 tiny appended parts — the CopyJob-appends-forever failure mode.
    (1 to 4000).toDF("id").repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(dir)

    val report = MaintenanceOps.compactParquet(spark, dir, targetMB = 128)
    assert(report.filesBefore >= 32)
    assert(report.filesAfter == 1, report) // 4000 ints << 128 MB
    assert(report.rows == 4000L)

    val back = spark.read.parquet(dir).as[Int].collect().sorted
    assert(back.toSeq == (1 to 4000))
  }

  test("flat compaction refuses a Hive-partitioned directory") {
    val dir = Files.createTempDirectory("compact_part").resolve("t").toString
    (1 to 100).map(i => (i, i % 3)).toDF("id", "p")
      .write.mode(SaveMode.Overwrite).partitionBy("p").parquet(dir)
    val e = intercept[IllegalArgumentException](
      MaintenanceOps.compactParquet(spark, dir))
    assert(e.getMessage.contains("partition subdirectories"), e.getMessage)
    // The refusal must leave the layout untouched and prunable.
    assert(spark.read.parquet(dir).filter($"p" === 1).count() == 34L)
  }

  test("clusterBy writes near-disjoint key ranges per file (min/max pruning layout)") {
    import org.apache.spark.sql.functions.{col, input_file_name, max => fmax, min => fmin}
    val dir = Files.createTempDirectory("clustered").resolve("t").toString
    // Shuffled input: without clustering, every file would span the whole
    // key range and min/max stats would prune nothing.
    val shuffled = (1 to 10000).map(i => ((i * 7919) % 10000, i)).toDF("k", "v")
    MaintenanceOps.clusterBy(shuffled, dir, Seq("k"), nFiles = 8)

    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(fmin(col("k")).as("lo"), fmax(col("k")).as("hi"))
      .as[(String, Int, Int)].collect().map(r => (r._2, r._3)).sortBy(_._1)
    assert(ranges.length == 8)
    // Ranges must be pairwise non-overlapping (boundary equality allowed —
    // range partitioning keeps equal keys together).
    for (pair <- ranges.toSeq.sliding(2) if pair.size == 2)
      assert(pair(0)._2 <= pair(1)._1,
        s"overlapping file ranges: ${ranges.mkString(", ")}")
    // Data intact.
    assert(spark.read.parquet(dir).count() == 10000L)
  }

  test("compactPartitioned compacts leaf-by-leaf, preserving layout and pruning") {
    val dir = Files.createTempDirectory("compact_leaves").resolve("t").toString
    (1 to 3000).map(i => (i, i % 3)).toDF("id", "p").repartition(16)
      .write.mode(SaveMode.Overwrite).partitionBy("p").parquet(dir)

    val report = MaintenanceOps.compactPartitioned(spark, dir, targetMB = 128)
    assert(report.filesBefore >= 16 * 3 / 2, report) // many small parts existed
    assert(report.filesAfter == 3, report)           // one file per partition value
    assert(report.rows == 3000L)

    val back = spark.read.parquet(dir)
    assert(back.count() == 3000L)
    assert(back.filter($"p" === 2).count() == 1000L)
    // Partition column survives as a PARTITION (directory), not a data col:
    // the pruned scan must show a PartitionFilters entry, proving readers
    // still skip directories.
    val plan = back.filter($"p" === 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  private val Dim = 32
  private def unitVec(seed: Long, noiseOf: Option[(Array[Float], Double)] = None): Array[Float] = {
    val rng = new scala.util.Random(seed)
    val raw = noiseOf match {
      case None => Array.fill(Dim)(rng.nextGaussian())
      case Some((base, eps)) => base.map(_.toDouble + eps * rng.nextGaussian())
    }
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / n).toFloat)
  }

  test("compactLedger: epoch SRP ledger keeps its pin, partitions, and drift refusal") {
    val ledger = Files.createTempDirectory("compact_srp_ledger").resolve("bands").toString
    val base2 = unitVec(2L)
    // Two epochs of commits → two _graft_epoch partitions of small files.
    SrpOps.incrementalNeardupEpoch(spark,
      Seq((2L, base2), (4L, unitVec(4L))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch0").commitLedger()
    SrpOps.incrementalNeardupEpoch(spark,
      Seq((6L, unitVec(6L))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch1").commitLedger()

    val report = MaintenanceOps.compactLedger(spark, ledger, targetMB = 128)
    assert(report.filesAfter <= report.filesBefore && report.filesAfter >= 2, report)
    // The construction pin survived (epoch leaves were rewritten in place).
    val fs = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(ledger, "_graft_srp_meta")))
    // Epoch partitions survived as partitions (replay overwrites in place).
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(ledger))
      .count(_.getPath.getName.startsWith("_graft_epoch=")) == 2)
    // Post-compaction ingest still VERIFIES and drops a near-dup of the
    // compacted corpus...
    val pending = SrpOps.incrementalNeardupEpoch(spark,
      Seq((11L, unitVec(111L, Some((base2, 0.02))))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch2")
    assert(pending.ledgerHits.as[Long].collect().toSet == Set(11L))
    // ...and still refuses a width-drifted ingest loudly.
    val e = intercept[IllegalStateException] {
      SrpOps.incrementalNeardupEpoch(spark,
        Seq((13L, unitVec(13L))).toDF("vec_id", "embedding"),
        "embedding", "vec_id", ledger, "epoch2", bitsPerBand = 12)
    }
    assert(e.getMessage.contains("never collide"))
  }

  test("compactLedger: flat LSH ledger restores the pin the dir swap would drop") {
    val ledger = Files.createTempDirectory("compact_lsh_ledger").resolve("bands").toString
    LshOps.incrementalNeardup(spark,
      Seq((2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "text", "doc_id", ledger).commitLedger()
    LshOps.incrementalNeardup(spark,
      Seq((4L, "one two three four five six seven")).toDF("doc_id", "text"),
      "text", "doc_id", ledger).commitLedger()

    MaintenanceOps.compactLedger(spark, ledger, targetMB = 128)
    // The flat compaction swap replaces the whole directory — the meta pin
    // must have been carried across, or the drift refusal is disarmed.
    val fs = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(ledger, "_graft_lsh_meta")))
    val pending = LshOps.incrementalNeardup(spark,
      Seq((9L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "text", "doc_id", ledger)
    assert(pending.ledgerHits.as[Long].collect().toSet == Set(9L))
    val e = intercept[IllegalStateException] {
      LshOps.incrementalNeardup(spark,
        Seq((13L, "totally different words here")).toDF("doc_id", "text"),
        "text", "doc_id", ledger, shingleN = 4)
    }
    assert(e.getMessage.contains("never collide"))
  }

  test("foldEpochs merges only committed epochs into base; the ledger still answers") {
    val ledger = Files.createTempDirectory("fold_srp_ledger").resolve("bands").toString
    val base2 = unitVec(2L)
    val v6 = unitVec(6L)
    SrpOps.incrementalNeardupEpoch(spark,
      Seq((2L, base2)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch0").commitLedger()
    SrpOps.incrementalNeardupEpoch(spark,
      Seq((4L, unitVec(4L))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch1").commitLedger()
    SrpOps.incrementalNeardupEpoch(spark,
      Seq((6L, v6)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch2").commitLedger()

    val r = MaintenanceOps.foldEpochs(spark, ledger, upToBatchId = 1L)
    assert(r.rows == 8L, r) // 2 vectors x 4 bands folded
    val fs = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts() = fs.listStatus(new org.apache.hadoop.fs.Path(ledger))
      .map(_.getPath.getName).filter(_.startsWith("_graft_epoch=")).toSet
    // epoch0/epoch1 folded into base; epoch2 (beyond the stated horizon)
    // keeps its own partition for replay overwrite.
    assert(parts() == Set("_graft_epoch=base", "_graft_epoch=epoch2"), parts())
    // A near-dup of a FOLDED corpus vector still drops (base partition is
    // included in every collision read)...
    val pending = SrpOps.incrementalNeardupEpoch(spark,
      Seq((11L, unitVec(111L, Some((base2, 0.02))))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch3")
    assert(pending.ledgerHits.as[Long].collect().toSet == Set(11L))
    // ...and the unfolded epoch2 still replays exactly-once onto itself
    // (its own partition exists to be overwritten; base is excluded from
    // nothing, so 6 is not "a near-dup of itself" only because the replay
    // excludes epoch2 — the protocol must be undisturbed by the fold).
    val replay = SrpOps.incrementalNeardupEpoch(spark,
      Seq((6L, v6)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch2")
    replay.commitLedger()
    assert(replay.survivors.select($"vec_id").as[Long].collect().toSet == Set(6L))
    // Folding again with a horizon covering epoch2 converges to base only.
    MaintenanceOps.foldEpochs(spark, ledger, upToBatchId = 2L)
    assert(parts() == Set("_graft_epoch=base"), parts())
    val pending2 = SrpOps.incrementalNeardupEpoch(spark,
      Seq((13L, unitVec(113L, Some((v6, 0.02))))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch3")
    assert(pending2.ledgerHits.as[Long].collect().toSet == Set(13L))
  }

  test("lastCommittedBatch reads the streaming commit log; missing log refuses") {
    val ckpt = Files.createTempDirectory("fold_ckpt").toString
    assert(MaintenanceOps.lastCommittedBatch(spark, ckpt).isEmpty)
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    Files.createDirectories(commits)
    Seq("0", "1", "2").foreach(b => Files.write(commits.resolve(b), "v1".getBytes))
    assert(MaintenanceOps.lastCommittedBatch(spark, ckpt).contains(2L))
  }

  test("the --fold-epochs CLI mode derives its horizon from the checkpoint") {
    val root = Files.createTempDirectory("fold_cli")
    val ledger = root.resolve("bands").toString
    SrpOps.incrementalNeardupEpoch(spark,
      Seq((2L, unitVec(2L))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch0").commitLedger()
    SrpOps.incrementalNeardupEpoch(spark,
      Seq((4L, unitVec(4L))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger, "epoch1").commitLedger()
    val ckpt = root.resolve("ckpt")
    Files.createDirectories(ckpt.resolve("commits"))
    Files.write(ckpt.resolve("commits").resolve("0"), "v1".getBytes)
    var lines = Vector.empty[String]
    val code = graft.pipeline.GraftApp.run(
      graft.pipeline.GraftApp.parseArgs(Seq("prod", "all",
        "--fold-epochs", "--ledger", ledger, "--checkpoint", ckpt.toString)),
      spark, getenv = _ => None, out = lines :+= _)
    assert(code == 0)
    assert(lines.exists(_.startsWith("FOLD_EPOCHS_ upTo=0")), lines)
    // Only the committed batch 0 folded; epoch1 kept for replay.
    val fs = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(ledger))
      .map(_.getPath.getName).filter(_.startsWith("_graft_epoch=")).toSet
    assert(parts == Set("_graft_epoch=base", "_graft_epoch=epoch1"), parts)
  }

  test("the --compact-ledger CLI mode compacts and exits zero") {
    val ledger = Files.createTempDirectory("compact_cli_ledger").resolve("bands").toString
    SrpOps.incrementalNeardup(spark,
      Seq((2L, unitVec(2L))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger).commitLedger()
    var lines = Vector.empty[String]
    val code = graft.pipeline.GraftApp.run(
      graft.pipeline.GraftApp.parseArgs(
        Seq("prod", "all", "--compact-ledger", "--ledger", ledger)),
      spark, getenv = _ => None, out = lines :+= _)
    assert(code == 0)
    assert(lines.exists(_.startsWith("COMPACT_LEDGER_")), lines)
    // The ledger still answers: an exact copy of the corpus vector drops.
    val pending = SrpOps.incrementalNeardup(spark,
      Seq((11L, unitVec(2L))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", ledger)
    assert(pending.ledgerHits.as[Long].collect().toSet == Set(11L))
  }

  test("targetedDelete removes exactly the listed ids, audits, and replays idempotently") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("tdelete")
    val dir = root.resolve("corpus").toString
    val audit = root.resolve("audit").toString
    (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      .repartition(4).write.mode(SaveMode.Overwrite).parquet(dir)

    // id 999 is not present — it must audit as found=false, not fail.
    val r = MaintenanceOps.targetedDelete(spark, dir, "doc_id",
      Seq(7L, 40L, 999L), audit)
    assert(r == MaintenanceOps.DeleteReport(
      rowsBefore = 100L, deleted = 2L, rowsAfter = 98L, notFound = 1L), r)
    val back = spark.read.parquet(dir).select($"doc_id").as[Long].collect().toSet
    assert(back == ((1L to 100L).toSet -- Set(7L, 40L)))
    val tomb = spark.read.parquet(audit).as[(Long, Boolean)].collect().toSet
    assert(tomb == Set((7L, true), (40L, true), (999L, false)))
    // The audit retains NO deleted content — ids and outcomes only.
    assert(spark.read.parquet(audit).columns.toSeq == Seq("id", "found"))

    // Replay of the same takedown: nothing left to delete, corpus
    // byte-stable, audit records the now-absent ids as found=false.
    val r2 = MaintenanceOps.targetedDelete(spark, dir, "doc_id",
      Seq(7L, 40L, 999L), audit)
    assert(r2 == MaintenanceOps.DeleteReport(98L, 0L, 98L, 3L), r2)
    assert(spark.read.parquet(dir).count() == 98L)
    assert(spark.read.parquet(audit).count() == 6L, "audit is append-only")
  }

  test("targetedDelete dedupes a repeated denylist: one row, one tombstone, exact report") {
    // Takedown lists repeat ids across request batches; a duplicate
    // entry must not multiply matched rows through the join (round-10
    // advisory: it inflated rowsBefore/deleted, overcounted notFound,
    // and doubled tombstones).
    val root = Files.createTempDirectory("tdelete_dupes")
    val dir = root.resolve("corpus").toString
    val audit = root.resolve("audit").toString
    (1L to 20L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val r = MaintenanceOps.targetedDelete(spark, dir, "doc_id",
      Seq(5L, 5L, 5L, 999L, 999L), audit)
    assert(r == MaintenanceOps.DeleteReport(
      rowsBefore = 20L, deleted = 1L, rowsAfter = 19L, notFound = 1L), r)
    val tomb = spark.read.parquet(audit).as[(Long, Boolean)].collect().toSeq
    assert(tomb.sorted == Seq((5L, true), (999L, false)), tomb)
  }

  test("targetedDelete refuses a partitioned directory and an empty list") {
    val root = Files.createTempDirectory("tdelete_refuse")
    val part = root.resolve("part").toString
    (1 to 50).map(i => (i.toLong, i % 3)).toDF("doc_id", "p")
      .write.mode(SaveMode.Overwrite).partitionBy("p").parquet(part)
    val e = intercept[IllegalArgumentException](
      MaintenanceOps.targetedDelete(spark, part, "doc_id", Seq(1L),
        root.resolve("a").toString))
    assert(e.getMessage.contains("partition subdirectories"))
    assert(spark.read.parquet(part).count() == 50L, "refusal leaves data intact")
    val flat = root.resolve("flat").toString
    (1 to 10).map(_.toLong).toDF("doc_id")
      .write.mode(SaveMode.Overwrite).parquet(flat)
    intercept[IllegalArgumentException](
      MaintenanceOps.targetedDelete(spark, flat, "doc_id", Seq.empty,
        root.resolve("a2").toString))
  }

  test("targetedDelete costs exactly ONE corpus scan (input-records accounting)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val root = Files.createTempDirectory("tdelete_onescan")
    val dir = root.resolve("corpus").toString
    val audit = root.resolve("audit").toString
    val n = 20000L
    (1L to n).map(i => (i, s"doc$i")).toDF("doc_id", "text")
      .repartition(4).write.mode(SaveMode.Overwrite).parquet(dir)
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          records.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = MaintenanceOps.targetedDelete(spark, dir, "doc_id",
        Seq(5L, 17L, 999999L), audit)
      assert(r == MaintenanceOps.DeleteReport(n, 2L, n - 2L, 1L), r)
      // The listener bus is asynchronous: wait for the counter to settle.
      var last = -1L; var stable = 0; var polls = 0
      while (stable < 3 && polls < 100) {
        Thread.sleep(100); polls += 1
        val cur = records.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // One pass over the n corpus rows (plus denylist-sized slack). The
    // audit's foundIds derivation re-scanning the corpus would land
    // near 2n — the 100 TB cost this gate pins down.
    assert(records.get() >= n, "sanity: the rewrite must have scanned the corpus")
    assert(records.get() <= (n * 1.2).toLong,
      s"targetedDelete read ${records.get()} records for an n=$n corpus — " +
        "more than one scan")
    // The one-scan re-plan must not have weakened the audit.
    val tomb = spark.read.parquet(audit).as[(Long, Boolean)].collect().toSet
    assert(tomb == Set((5L, true), (17L, true), (999999L, false)))
  }

  test("ledgerDelete erases a vector's SRP-ledger rows; pins, layout and ingest survive") {
    // E153 (round 15): the SRP band ledger stores the raw VECTOR per
    // survivor row (it is the cosine-verify state), so a right-to-
    // erasure takedown must reach it — keyed by the vector itself (the
    // ledger is not id-keyed; the caller derives the key from the corpus
    // BEFORE the corpus delete). The construction pin and the epoch
    // layout survive, and the next ingest still verifies against the
    // remaining rows.
    import org.apache.spark.sql.functions.col
    val dim = 8
    def unit(seed: Long): Array[Float] = {
      val rng = new scala.util.Random(seed)
      val raw = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val root = Files.createTempDirectory("graft_ledger_delete")
    val ledger = root.resolve("bands").toString
    val corpus = (0L until 6L).map(i => (i, unit(i * 7919L + 1L)))
      .toDF("vec_id", "embedding")
    graft.operators.SrpOps.incrementalNeardup(
      spark, corpus, "embedding", "vec_id", ledger).commitLedger()
    val beforeRows = spark.read.parquet(ledger).count()
    val nBands = spark.read.parquet(ledger)
      .filter(col("_graft_vec") === org.apache.spark.sql.functions.typedLit(
        unit(3L * 7919L + 1L).toSeq)).count()
    assert(nBands > 0, "fixture vector must be ledgered")
    // The key recipe: the deleted id's vector, as the corpus holds it.
    val keys = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding").as("_graft_vec"))
    val audit = root.resolve("audit").toString
    val r = MaintenanceOps.ledgerDelete(spark, ledger, "_graft_vec", keys, audit)
    assert(r.deleted == nBands && r.notFound == 0L, r.toString)
    assert(r.rowsAfter == beforeRows - nBands)
    val left = spark.read.parquet(ledger)
    assert(left.count() == beforeRows - nBands)
    assert(left.filter(col("_graft_vec") === org.apache.spark.sql.functions.typedLit(
      unit(3L * 7919L + 1L).toSeq)).count() == 0L, "the vector's rows are gone")
    // Pin preserved: the next ingest's width-drift check still runs, and
    // a near-dup of a REMAINING vector still drops.
    val batch2 = Seq(
      (10L, unit(0L * 7919L + 1L)),          // exact twin of remaining id 0
      (11L, unit(99L)))                       // fresh
      .toDF("vec_id", "embedding")
    val pending = graft.operators.SrpOps.incrementalNeardup(
      spark, batch2, "embedding", "vec_id", ledger)
    assert(pending.survivors.select(col("vec_id")).as[Long].collect().toSet == Set(11L))
    // Tombstone audit: one row, found.
    val tomb = spark.read.parquet(audit).as[(Seq[Double], Boolean)].collect()
    assert(tomb.length == 1 && tomb.head._2)
    // Replay: already gone, found = false.
    val r2 = MaintenanceOps.ledgerDelete(spark, ledger, "_graft_vec", keys, audit)
    assert(r2.deleted == 0L && r2.notFound == 1L)
    // A wrong key column refuses loudly with the recipe hint.
    val bad = intercept[IllegalArgumentException](MaintenanceOps.ledgerDelete(
      spark, ledger, "no_such_col", keys.withColumnRenamed("_graft_vec", "no_such_col"),
      audit))
    assert(bad.getMessage.contains("key column") ||
      bad.getMessage.contains("no column"), bad.getMessage)
  }

  test("ledgerDelete partitioned branch: Spark-job count is FLAT in hit-leaf count") {
    // Round 16: the partitioned rewrite stages ALL hit leaves' survivors
    // in ONE write job and swaps each leaf with filesystem renames (no
    // job). The per-leaf-job alternative measured 0.4 s/launch at the
    // probe scale (64 s for 160 leaves, BASELINE round-15) — this gate
    // pins the flat-job-count property with 48 hit leaves: a per-leaf
    // implementation would launch ≥ 48 jobs; the staged protocol stays
    // a small constant (pass-1 scan, audit write, staged write, plus
    // AQE/broadcast bookkeeping).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("ldelete_flatjobs")
    val dir = root.resolve("ledger").toString
    val nLeaves = 48
    (0 until nLeaves).flatMap(p => Seq(("kill", p), (s"keep$p", p)))
      .toDF("k", "p")
      .write.partitionBy("p").mode(SaveMode.Overwrite).parquet(dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val r = try {
      val rep = MaintenanceOps.ledgerDelete(spark, dir, "k",
        Seq("kill").toDF("k"), root.resolve("audit").toString)
      var last = -1; var stable = 0; var polls = 0
      while (stable < 3 && polls < 100) {
        Thread.sleep(100); polls += 1
        val cur = jobs.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      rep
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(r.leavesRewritten == nLeaves && r.deleted == nLeaves.toLong, r)
    assert(jobs.get() >= 3, s"sanity: expected the protocol's own jobs, saw ${jobs.get()}")
    assert(jobs.get() <= 20,
      s"ledgerDelete launched ${jobs.get()} jobs for $nLeaves hit leaves — " +
        "job count must be flat in leaf count (the one-staged-write protocol)")
    // Every leaf survived (each kept one row), the denied key is gone,
    // and no tmp/bak debris remains.
    val left = spark.read.parquet(dir)
    assert(left.count() == nLeaves.toLong)
    assert(left.filter(col("k") === "kill").count() == 0L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val debris = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(n => n.contains("_erase_"))
    assert(debris.isEmpty, debris.mkString(", "))
  }

  test("ledgerDelete hashKeys: tombstones carry sha2(key), never the key itself") {
    // Round-16 ADVICE: for vector-keyed erasure a raw tombstone would
    // persist the deleted row's embedding forever — the right-to-erasure
    // op itself retaining the erased derived content. hashKeys = true
    // stores sha2-256 of the key's canonical JSON instead; found/
    // not-found stays probe-able (hash the probe key the same way).
    import org.apache.spark.sql.functions.{col, sha2, struct, to_json}
    val dim = 8
    def unit(seed: Long): Array[Float] = {
      val rng = new scala.util.Random(seed)
      val raw = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val root = Files.createTempDirectory("graft_ledger_hash_audit")
    val ledger = root.resolve("bands").toString
    val corpus = (0L until 6L).map(i => (i, unit(i * 7919L + 1L)))
      .toDF("vec_id", "embedding")
    graft.operators.SrpOps.incrementalNeardup(
      spark, corpus, "embedding", "vec_id", ledger).commitLedger()
    val keys = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding").as("_graft_vec"))
    val audit = root.resolve("audit").toString
    val r = MaintenanceOps.ledgerDelete(spark, ledger, "_graft_vec", keys, audit,
      hashKeys = true)
    assert(r.deleted > 0L && r.notFound == 0L, r.toString)
    val tomb = spark.read.parquet(audit)
    assert(tomb.columns.toSeq == Seq("key_sha256", "found"), tomb.columns.toSeq)
    // The hash equals an independent recompute of the SAME canonical
    // encoding (field name "key", as the audit row carries it) — so an
    // auditor can answer "was THIS vector's erasure audited?" without
    // the audit ever storing the vector.
    val want = keys
      .select(sha2(to_json(struct(col("_graft_vec").as("key"))), 256))
      .as[String].collect().head
    val got = tomb.as[(String, Boolean)].collect().toSeq
    assert(got == Seq((want, true)), s"$got != $want")
  }

  test("foldEpochs re-aggregates span-ledger counts; crashed-fold leftovers converge") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("fold_spans")
    val ledger = root.resolve("spans").toString
    def doc(id: Long, text: String) =
      Seq((id, text)).toDF("doc_id", "text")
    // The span "a b c d" appears in both committed batches.
    DedupOps.incrementalSpansEpoch(spark, doc(1L, "a b c d x"),
      "text", "doc_id", ledger, "epoch0", spanTokens = 4).commitLedger()
    val p1 = DedupOps.incrementalSpansEpoch(spark, doc(2L, "a b c d y"),
      "text", "doc_id", ledger, "epoch1", spanTokens = 4)
    p1.commitLedger()

    val r = MaintenanceOps.foldEpochs(spark, ledger, upToBatchId = 1L)
    // COUNT-merging fold: one summed row per distinct span — 3 spans
    // ("a b c d" 2x, "b c d x", "b c d y") from 4 ledgered rows; a
    // union fold would keep 4 and grow with every drain.
    assert(r.rows == 3L, r)
    val base = spark.read.parquet(ledger)
    assert(base.count() == 3L)
    assert(base.agg(org.apache.spark.sql.functions.sum(col("_graft_n")))
      .head().getLong(0) == 4L, "summed counts must survive the fold")
    val fs = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(MaintenanceOps.foldedThrough(
      fs, new org.apache.hadoop.fs.Path(ledger)) == 1L)

    // The folded ledger still answers: a third doc carrying the span
    // sees 2 ledgered + 1 in-batch distinct docs.
    val p2 = DedupOps.incrementalSpansEpoch(spark, doc(3L, "a b c d z"),
      "text", "doc_id", ledger, "epoch2", spanTokens = 4)
    assert(p2.flags.as[(Long, Int, Long)].collect().toSet == Set((3L, 0, 3L)))

    // Crash simulation: epoch1's directory resurrected AFTER its rows
    // were merged into base (the fold's base-write→delete window).
    p1.commitLedger()
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      ledger, "_graft_epoch=epoch1")))
    // Read side: the leftover is at-or-under the fold marker, so the
    // collision read EXCLUDES it — n_docs stays 3, not 4.
    val p3 = DedupOps.incrementalSpansEpoch(spark, doc(4L, "a b c d w"),
      "text", "doc_id", ledger, "epoch3", spanTokens = 4)
    assert(p3.flags.as[(Long, Int, Long)].collect().toSet == Set((4L, 0, 3L)),
      "a crashed fold's leftover epoch must not double-count")
    // Re-running the fold deletes the leftover WITHOUT re-merging.
    val r2 = MaintenanceOps.foldEpochs(spark, ledger, upToBatchId = 1L)
    assert(r2 == MaintenanceOps.CompactionReport(0, 0, 0L), r2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      ledger, "_graft_epoch=epoch1")))
    val after = spark.read.parquet(ledger)
      .filter(col("_graft_epoch") === "base")
    assert(after.count() == 3L &&
      after.agg(org.apache.spark.sql.functions.sum(col("_graft_n")))
        .head().getLong(0) == 4L, "convergent: base unchanged by the re-run")
  }

  test("fold marker is name-based: torn or stray files cannot brick reads") {
    val root = Files.createTempDirectory("fold_marker")
    val fs = new org.apache.hadoop.fs.Path(root.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root.toString)
    assert(MaintenanceOps.foldedThrough(fs, p) == -1L)
    // The id lives in the NAME — a crash can only leave extra markers,
    // and max() still answers; garbage names and an empty legacy
    // content-based file are ignored, never a parse crash.
    fs.create(new org.apache.hadoop.fs.Path(p, "_graft_folded_through_3"), true).close()
    fs.create(new org.apache.hadoop.fs.Path(p, "_graft_folded_through_7"), true).close()
    fs.create(new org.apache.hadoop.fs.Path(p, "_graft_folded_through_junk"), true).close()
    fs.create(new org.apache.hadoop.fs.Path(p, "_graft_folded_through"), true).close()
    assert(MaintenanceOps.foldedThrough(fs, p) == 7L)
  }

  test("zorderValueN matches the round-robin model; the 2-ary case equals zorderValue") {
    import org.apache.spark.sql.functions.col
    def model(xs: Seq[Long], bits: Int): Long = {
      val k = xs.length
      (0 until bits).foldLeft(0L) { (z, i) =>
        xs.zipWithIndex.foldLeft(z) { case (zz, (x, j)) =>
          zz | (((x >> i) & 1L) << (i * k + j)) } }
    }
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (255L, 255L, 255L), (170L, 85L, 204L)) ++
      (1 to 50).map(i =>
        ((i * 7919L) % 256, (i * 104729L) % 256, (i * 1299709L) % 256))
    val got = rows.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        MaintenanceOps.zorderValueN(Seq(col("x"), col("y"), col("w")), 8).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    for ((x, y, w, z) <- got) {
      assert(z == model(Seq(x, y, w), 8), s"($x, $y, $w)")
      // Round-trip: position 3i+j carries bit i of column j.
      val back = (0 until 3).map(j =>
        (0 until 8).map(i => ((z >> (3 * i + j)) & 1L) << i).sum)
      assert(back == Seq(x, y, w))
    }
    // k = 2 is bit-identical to the binary expression.
    val pair = (1 to 30).map(i => ((i * 7919L) % 65536, (i * 104729L) % 65536))
      .toDF("x", "y")
      .select(
        MaintenanceOps.zorderValue(col("x"), col("y"), 16).as("z2"),
        MaintenanceOps.zorderValueN(Seq(col("x"), col("y")), 16).as("zn"))
      .as[(Long, Long)].collect()
    assert(pair.forall { case (z2, zn) => z2 == zn })
    // A null key has no place on the curve.
    val withNull = Seq((Some(1L), 2L), (None, 3L)).toDF("x", "y")
      .select(MaintenanceOps.zorderValueN(Seq(col("x"), col("y")), 8).as("z"))
      .collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0))
    // The bit budget must fit one long.
    intercept[IllegalArgumentException](
      graft.plans.BitInterleaveNExpr(Seq.fill(4)(
        org.apache.spark.sql.catalyst.expressions.Literal(1L)), 16))
  }

  test("zorderClusterN bounds every file's box in all THREE columns") {
    import org.apache.spark.sql.functions.{col, input_file_name, max => fmax, min => fmin}
    val dir = Files.createTempDirectory("zordered3").resolve("t").toString
    val grid = scala.util.Random.shuffle(
      (for (a <- 0 until 32; b <- 0 until 32; c <- 0 until 32)
        yield (a, b, c)).toVector).toDF("a", "b", "c")
    // 64 files: each covers ~2^9 of the 2^15 z-range, pinning the top
    // six z-bits = bits 4 and 3 of ALL THREE columns — an 8x8x8 block
    // (16x16x16 for a range-boundary straddler), against a random
    // layout's ~31-per-dimension span.
    MaintenanceOps.zorderClusterN(grid, dir, Seq("a", "b", "c"),
      bits = 5, nFiles = 64)
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(fmin(col("a")).as("alo"), fmax(col("a")).as("ahi"),
        fmin(col("b")).as("blo"), fmax(col("b")).as("bhi"),
        fmin(col("c")).as("clo"), fmax(col("c")).as("chi"))
      .as[(String, Int, Int, Int, Int, Int, Int)].collect()
    assert(boxes.length == 64)
    assert(spark.read.parquet(dir).count() == 32768L)
    // Selective box predicate (every coordinate < 8 = 1/64 of the
    // volume): under a random layout all 64 files intersect it.
    val hit = boxes.count { case (_, alo, _, blo, _, clo, _) =>
      alo <= 7 && blo <= 7 && clo <= 7 }
    assert(hit <= 12, s"3-D box query should prune most files, hit $hit/64")
    // Tight in EVERY dimension on average (random layout spans ~31).
    for ((span, dim) <- Seq(
        (boxes.map(b => b._3 - b._2), "a"),
        (boxes.map(b => b._5 - b._4), "b"),
        (boxes.map(b => b._7 - b._6), "c")))
      assert(span.sum.toDouble / boxes.length <= 20.0,
        s"mean $dim-span ${span.sum.toDouble / boxes.length}")
  }

  test("zorderValue matches the bit-interleave model (codegen path)") {
    import org.apache.spark.sql.functions.col
    def model(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)) }
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L), (7L, 8L)) ++
      (1 to 50).map(i => ((i * 7919L) % 65536, (i * 104729L) % 65536))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        MaintenanceOps.zorderValue(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    for ((x, y, z) <- got) assert(z == model(x, y, 16), s"($x, $y)")
    // Interleaved coordinates round-trip: even bits are x, odd bits y.
    for ((x, y, z) <- got) {
      val xb = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yb = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(xb == x && yb == y)
    }
  }

  test("zorderCluster bounds every file's min/max box in BOTH columns") {
    import org.apache.spark.sql.functions.{col, input_file_name, max => fmax, min => fmin}
    val dir = Files.createTempDirectory("zordered").resolve("t").toString
    // A shuffled 100x100 grid: a single-column cluster would bound only
    // that column; z-ordering must bound both.
    val grid = scala.util.Random.shuffle(
      (for (a <- 0 until 100; b <- 0 until 100) yield (a, b)).toVector)
      .toDF("a", "b")
    MaintenanceOps.zorderCluster(grid, dir, "a", "b", bits = 7, nFiles = 16)

    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(fmin(col("a")).as("alo"), fmax(col("a")).as("ahi"),
        fmin(col("b")).as("blo"), fmax(col("b")).as("bhi"))
      .as[(String, Int, Int, Int, Int)].collect()
    assert(boxes.length == 16)
    assert(spark.read.parquet(dir).count() == 10000L)
    // The contract that matters is PRUNING POWER, not per-file worst
    // case (a z-interval that crosses a top-level quadrant boundary
    // legitimately spans a whole dimension): for a selective box
    // predicate, few file boxes may intersect. Under a random layout
    // every file spans ~the full grid and ALL 16 files intersect any box.
    val hit = boxes.count { case (_, alo, ahi, blo, bhi) =>
      alo <= 24 && blo <= 24 } // query box: a < 25 AND b < 25
    assert(hit <= 6, s"box query should prune most files, hit $hit/16: " +
      boxes.map(b => (b._2, b._3, b._4, b._5)).mkString(", "))
    // And in aggregate the boxes are tight: the mean span in EACH
    // dimension is well under the random layout's ~99.
    assert(boxes.map(b => b._3 - b._2).sum.toDouble / boxes.length <= 65.0)
    assert(boxes.map(b => b._5 - b._4).sum.toDouble / boxes.length <= 65.0)
  }

  test("ledgerDelete partitioned branch survives partition-value normalization (zero-padded leaf)") {
    // Round-16 review fix: a leaf like p=007 read back with partition
    // type inference ON becomes int 7, and the staged survivors land at
    // p=7 — a name the swap loop would not find, mis-inferring "every
    // row matched" and deleting the leaf WITH its survivors. ledgerDelete
    // now reads pass 2 with inference OFF (names round-trip verbatim)
    // and gates the delete-outright branch on the pass-1 accounting.
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("ldelete_norm")
    val dir = root.resolve("ledger").toString
    Seq(("kill", "007"), ("keep7", "007"), ("kill", "12"), ("keep12", "12"))
      .toDF("k", "p").write.partitionBy("p").mode(SaveMode.Overwrite).parquet(dir)
    val r = MaintenanceOps.ledgerDelete(spark, dir, "k",
      Seq("kill").toDF("k"), root.resolve("audit").toString)
    assert(r.deleted == 2L && r.leavesRewritten == 2, r)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "p=007")),
      "the zero-padded leaf must survive under its ORIGINAL name")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "p=7")),
      "no normalized twin directory may appear")
    val left = spark.read.parquet(dir)
    assert(left.count() == 2L && left.filter(col("k") === "kill").count() == 0L)
    assert(spark.read.parquet(s"$dir/p=007").count() == 1L,
      "the zero-padded leaf's survivor row was lost")
  }

  test("ledgerDelete recovers a crashed swap: a dot-hidden bak restores before the scan") {
    // Round-16 review fix: a crash between the swap's two renames leaves
    // the leaf ONLY at .{leaf}_erase_bak (invisible to the scan) — the
    // documented re-run must restore it, not delete the staged survivors
    // and walk away. Simulate exactly that window, then re-run.
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("ldelete_bak")
    val dir = root.resolve("ledger").toString
    Seq(("kill", 1), ("keep1", 1), ("kill", 2), ("keep2", 2))
      .toDF("k", "p").write.partitionBy("p").mode(SaveMode.Overwrite).parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaf = new org.apache.hadoop.fs.Path(dir, "p=1")
    val bak = new org.apache.hadoop.fs.Path(dir, ".p=1_erase_bak")
    assert(fs.rename(leaf, bak), "test setup: simulate the crash window")
    // Stale staging from the crashed attempt, holding a survivor copy a
    // naive re-run would destroy first thing.
    val tmp = new org.apache.hadoop.fs.Path(dir, "._graft_erase_tmp")
    fs.mkdirs(tmp)
    val r = MaintenanceOps.ledgerDelete(spark, dir, "k",
      Seq("kill").toDF("k"), root.resolve("audit").toString)
    assert(r.deleted == 2L, s"recovery must restore p=1 so BOTH leaves' hits are found: $r")
    val left = spark.read.parquet(dir)
    assert(left.count() == 2L && left.filter(col("k") === "kill").count() == 0L)
    assert(left.filter(col("k") === "keep1").count() == 1L,
      "the crashed leaf's survivor must be back")
    val debris = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.contains("_erase_"))
    assert(debris.isEmpty, debris.mkString(", "))
  }

  test("a fold after a crashed erase swap cannot lose the hidden epoch") {
    // Round-17 LEAD FIX (round-16 verdict "What's wrong #1"): the chain
    // was (a) ledgerDelete crashes between its two renames — epoch1 now
    // exists ONLY as its dot-hidden bak; (b) foldEpochs runs next, does
    // not see epoch1, folds the rest and advances the marker PAST it;
    // (c) the next maintenance op's recovery restores epoch1 — and the
    // leftover sweep deletes it as "already merged". Its rows were never
    // merged: a committed batch silently lost, in exactly the unattended
    // takedown+fold compliance loop the family is built for. The fix:
    // recoverEraseBaks runs at the ENTRY of every op that lists epochs
    // or advances the marker, so the hidden epoch is restored BEFORE the
    // fold decides what exists.
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("fold_after_crash")
    val dir = root.resolve("ledger").toString
    val path = new org.apache.hadoop.fs.Path(dir)
    Seq(("a", "base"), ("b", "epoch0"), ("c", "epoch1"))
      .toDF("k", "_graft_epoch")
      .write.partitionBy("_graft_epoch").mode(SaveMode.Overwrite).parquet(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // (a) the crash window: epoch1 hidden at its bak, invisible to listings.
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch1"),
      new org.apache.hadoop.fs.Path(dir, "._graft_epoch=epoch1_erase_bak")),
      "test setup: simulate the crashed swap")
    // (b) the unattended fold runs next, horizon past the hidden epoch.
    val r = MaintenanceOps.foldEpochs(spark, dir, upToBatchId = 9L)
    assert(r.rows == 3L,
      s"the bak-hidden epoch must be restored and folded, not skipped: $r")
    assert(MaintenanceOps.foldedThrough(fs, path) == 1L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      dir, "._graft_epoch=epoch1_erase_bak")))
    val base = spark.read.parquet(dir)
    assert(base.select(col("k")).as[String].collect().toSet == Set("a", "b", "c"),
      "epoch1's committed row must survive into base")
    // (c) a later ledgerDelete (recovery + leftover sweep at entry) finds
    // a consistent store — and erases exactly what it was asked to.
    val r2 = MaintenanceOps.ledgerDelete(spark, dir, "k",
      Seq("b").toDF("k"), root.resolve("audit").toString)
    assert(r2.deleted == 1L && r2.notFound == 0L, r2.toString)
    assert(spark.read.parquet(dir).select(col("k"))
      .as[String].collect().toSet == Set("a", "c"))
    // The staged rewrite scopes its type-inference override to a cloned
    // session (round-16 advice): the shared session's conf is untouched.
    assert(spark.conf.get(
      "spark.sql.sources.partitionColumnTypeInference.enabled") == "true")
  }

  test("compactLedger restores a bak-hidden leaf before rewriting") {
    // Same entry-sweep rule as the fold: a compaction that walks the
    // layout while a leaf is bak-hidden would rewrite a store it
    // believes whole — and the leaf stays invisible to reads forever.
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("compact_after_crash")
    val dir = root.resolve("ledger").toString
    val path = new org.apache.hadoop.fs.Path(dir)
    Seq((1, "epoch0"), (2, "epoch0"), (3, "epoch1"))
      .toDF("id", "_graft_epoch")
      .write.partitionBy("_graft_epoch").mode(SaveMode.Overwrite).parquet(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch1"),
      new org.apache.hadoop.fs.Path(dir, "._graft_epoch=epoch1_erase_bak")))
    MaintenanceOps.compactLedger(spark, dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch1")),
      "the hidden leaf must be restored before the compaction walks")
    assert(spark.read.parquet(dir).select(col("id"))
      .as[Int].collect().toSet == Set(1, 2, 3))
  }

  test("a crash between the flat swap and its pin restore leaves the pins recoverable") {
    // Round-17 (verdict #4 + advice): the flat branch now restores the
    // `_graft_*` pins BEFORE dropping the bak, and recoverEraseBaks
    // copies any pins missing from a restored leaf OUT of a bak before
    // deleting it — so the one remaining gap (staged leaf in, pins not
    // yet rewritten, crash) is recoverable instead of silently disarming
    // the width-drift refusal and the replay-horizon guard.
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("flat_pin_gap")
    val dir = root.resolve("ledger").toString
    val path = new org.apache.hadoop.fs.Path(dir)
    Seq("x", "y", "z").toDF("k").write.mode(SaveMode.Overwrite).parquet(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pin = new org.apache.hadoop.fs.Path(dir, "_graft_test_meta")
    val out = fs.create(pin, true); out.write("pin-bytes".getBytes("UTF-8")); out.close()
    val marker = new org.apache.hadoop.fs.Path(dir, "_graft_folded_through_4")
    fs.create(marker, true).close()
    // Simulate the crash state: original (WITH pins) parked at the bak,
    // staged survivors (WITHOUT pins — the tmp write never carried them)
    // already renamed into place.
    val bak = new org.apache.hadoop.fs.Path(
      path.getParent, s".${path.getName}_erase_bak")
    assert(fs.rename(path, bak))
    Seq("x", "z").toDF("k").write.mode(SaveMode.Overwrite).parquet(dir)
    MaintenanceOps.recoverEraseBaks(fs, path)
    assert(!fs.exists(bak), "bak dropped once the leaf is whole")
    assert(fs.exists(pin), "construction pin copied out of the bak")
    val in = fs.open(pin)
    val bytes = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(bytes == "pin-bytes")
    assert(fs.exists(marker), "fold marker copied out of the bak")
    assert(spark.read.parquet(dir).select(col("k"))
      .as[String].collect().toSet == Set("x", "z"),
      "the staged (post-erase) data wins; the bak only donates pins")
  }

  test("ledgerDelete refuses a partition column as the deletion key, before any audit") {
    // Round-16 verdict minor: pass 1 reads partition values TYPED
    // (inference on) while the staged rewrite reads them as verbatim
    // strings — a partition-column key would match in one pass and not
    // the other. Refused before the tombstone audit lands (an audit row
    // for a refused delete would claim an erasure that never ran).
    val root = Files.createTempDirectory("ldelete_partkey")
    val dir = root.resolve("ledger").toString
    Seq(("a", 1), ("b", 2)).toDF("k", "p")
      .write.partitionBy("p").mode(SaveMode.Overwrite).parquet(dir)
    val audit = root.resolve("audit").toString
    val e = intercept[IllegalArgumentException](MaintenanceOps.ledgerDelete(
      spark, dir, "p", Seq(1).toDF("p"), audit))
    assert(e.getMessage.contains("partition column"), e.getMessage)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(audit)),
      "no tombstone may land for a refused delete")
    assert(spark.read.parquet(dir).count() == 2L, "ledger untouched")
  }

  test("ledgerDelete refuses an audit append whose schema mismatches the trail") {
    // Round-16 advice: hashKeys toggled across runs would mix (key,
    // found) and (key_sha256, found) files in one directory — unreadable
    // as parquet afterwards. The mismatch refuses before anything lands.
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("ldelete_audit_mix")
    val dir = root.resolve("ledger").toString
    Seq(("a", 1), ("b", 1), ("c", 2)).toDF("k", "p")
      .write.partitionBy("p").mode(SaveMode.Overwrite).parquet(dir)
    val audit = root.resolve("audit").toString
    val r = MaintenanceOps.ledgerDelete(spark, dir, "k",
      Seq("a").toDF("k"), audit)
    assert(r.deleted == 1L)
    val e = intercept[IllegalArgumentException](MaintenanceOps.ledgerDelete(
      spark, dir, "k", Seq("b").toDF("k"), audit, hashKeys = true))
    assert(e.getMessage.contains("audit schema mismatch"), e.getMessage)
    // The trail is still readable and still raw-keyed; the ledger kept
    // the row whose delete refused.
    val tomb = spark.read.parquet(audit)
    assert(tomb.columns.toSeq.sorted == Seq("found", "key"))
    assert(tomb.count() == 1L)
    assert(spark.read.parquet(dir).filter(col("k") === "b").count() == 1L)
  }

  test("composite-key ledgerDelete erases only full-pair matches; audit carries both columns") {
    // Round-17 (round-16 advice): the fingerprint ledger keys identity
    // on (_graft_fp, _graft_fp2) because the ~30-bit charHash alone
    // collides at birthday scale — so the takedown must match the PAIR:
    // a row sharing only one hash with a deleted key is a different
    // document and must survive.
    import org.apache.spark.sql.functions.{col, sha2, struct, to_json}
    val root = Files.createTempDirectory("ldelete_composite")
    val dir = root.resolve("ledger").toString
    Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 20L, "c"))
      .toDF("h1", "h2", "v").write.mode(SaveMode.Overwrite).parquet(dir)
    val audit = root.resolve("audit").toString
    val keys = Seq((1L, 10L), (9L, 9L)).toDF("h1", "h2")
    val r = MaintenanceOps.ledgerDelete(
      spark, dir, Seq("h1", "h2"), keys, audit, hashKeys = false)
    assert(r.deleted == 1L && r.notFound == 1L && r.rowsAfter == 2L, r.toString)
    assert(spark.read.parquet(dir).select(col("v"))
      .as[String].collect().toSet == Set("b", "c"),
      "the half-matching row (h1 collides, h2 differs) must survive")
    // Composite tombstones: one column per key, named after the ledger's
    // own key columns.
    val tomb = spark.read.parquet(audit)
    assert(tomb.columns.toSeq == Seq("h1", "h2", "found"), tomb.columns.toSeq)
    assert(tomb.as[(Long, Long, Boolean)].collect().toSet ==
      Set((1L, 10L, true), (9L, 9L, false)))
    // hashKeys hashes the canonical JSON of the FULL key struct — an
    // auditor recomputes it from the pair they are probing.
    val audit2 = root.resolve("audit2").toString
    val r2 = MaintenanceOps.ledgerDelete(spark, dir, Seq("h1", "h2"),
      Seq((1L, 11L)).toDF("h1", "h2"), audit2, hashKeys = true)
    assert(r2.deleted == 1L)
    val want = Seq((1L, 11L)).toDF("h1", "h2")
      .select(sha2(to_json(struct(col("h1"), col("h2"))), 256))
      .as[String].head()
    assert(spark.read.parquet(audit2).as[(String, Boolean)]
      .collect().toSeq == Seq((want, true)))
    // A keys frame missing one of the key columns refuses loudly.
    val e = intercept[IllegalArgumentException](MaintenanceOps.ledgerDelete(
      spark, dir, Seq("h1", "h2"), Seq(2L).toDF("h1"), audit, hashKeys = false))
    assert(e.getMessage.contains("h2"), e.getMessage)
  }

  test("recoverEraseBaks reaches baks nested under _-prefixed partition levels") {
    // Round-16 advice: the PQ namespaces partition by (_graft_epoch,
    // cell) — a crashed pqStoreDelete swap leaves `.cell=N_erase_bak`
    // UNDER `_graft_epoch=…`, which the old sweep never entered (it
    // skipped `_`-prefixed directories wholesale). Partition dirs are
    // `col=value` whatever their prefix.
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("nested_bak")
    val dir = root.resolve("codes").toString
    val path = new org.apache.hadoop.fs.Path(dir)
    Seq((1L, "epoch1", 0), (2L, "epoch1", 1), (3L, "base", 0))
      .toDF("id", "_graft_epoch", "cell")
      .write.partitionBy("_graft_epoch", "cell")
      .mode(SaveMode.Overwrite).parquet(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaf = new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch1/cell=0")
    val bak = new org.apache.hadoop.fs.Path(
      dir, "_graft_epoch=epoch1/.cell=0_erase_bak")
    assert(fs.rename(leaf, bak))
    MaintenanceOps.recoverEraseBaks(fs, path)
    assert(fs.exists(leaf) && !fs.exists(bak),
      "the nested bak must restore despite the _-prefixed first level")
    assert(spark.read.parquet(dir).select(col("id"))
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("a sign-prefixed epoch token is MANUAL everywhere: not hidden, not deleted, not folded") {
    // Round-16 review fix: the fold protocol's four parse sites now share
    // ONE digits-only rule (foldableEpochId). Before, `epoch-1` committed
    // unguarded (the guard's regex called it manual) yet toLong-based
    // readers excluded it and leftover sweeps deleted it — a committed
    // batch silently lost.
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("manual_epoch")
    val dir = root.resolve("ledger").toString
    val path = new org.apache.hadoop.fs.Path(dir)
    Seq(("a", "base"), ("b", "epoch1"), ("c", "epoch-1"), ("d", "epoch+5"))
      .toDF("k", "_graft_epoch")
      .write.partitionBy("_graft_epoch").mode(SaveMode.Overwrite).parquet(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    MaintenanceOps.writeFoldedThrough(fs, path, 1L)
    // Hidden? Only the digits-only folded epoch.
    val visible = MaintenanceOps.excludeFoldLeftovers(
      fs, path, spark.read.parquet(dir)).select(col("k"))
      .collect().map(_.getString(0)).toSet
    assert(visible == Set("a", "c", "d"), visible)
    // Deleted? Only the digits-only folded epoch.
    MaintenanceOps.deleteFoldLeftovers(fs, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch-1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch+5")))
    // Folded? Manual tokens stay directories whatever the horizon.
    MaintenanceOps.foldEpochs(spark, dir, upToBatchId = 99L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch-1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_graft_epoch=epoch+5")))
    val after = spark.read.parquet(dir).select(col("k"))
      .collect().map(_.getString(0)).toSet
    assert(after == Set("a", "c", "d"), after)
  }
}
