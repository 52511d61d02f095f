package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** E95 export integrity: a clean export verifies; a lost file, a
  * tampered row, and an unmanifested directory each refuse loudly with
  * the damaged shard named. */
class ExportOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_export")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      catch { case _: Throwable => () }
    }))
    root
  }

  private def docs = Tables(spark, TestSpark.sfDir, "documents")

  private def export(out: String): Unit =
    ExportOps.shardedExport(docs, out, "doc_id", Seq("text"), nShards = 4, seed = 7L)

  test("a clean export round-trips through verification") {
    val out = freshDir().resolve("clean").toString
    export(out)
    ExportOps.verifyShards(spark, out, "doc_id", Seq("text"), seed = 7L)
    // Manifest file exists and covers every shard directory on disk.
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("_graft_shard=")).map(_.getName).toSet
    val manifest = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(out, "_graft_manifest.json"))
    assert(manifest.size() == shardDirs.size)
  }

  test("a lost shard file fails verification naming the shard") {
    val out = freshDir().resolve("lost").toString
    export(out)
    // Remove shard 2's parquet file(s) but keep its directory: the rows
    // vanish, the manifest still expects them.
    val dir = new java.io.File(s"$out/_graft_shard=2")
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f => assert(f.delete()))
    val e = intercept[IllegalStateException](
      ExportOps.verifyShards(spark, out, "doc_id", Seq("text"), seed = 7L))
    assert(e.getMessage.contains("shard 2"), e.getMessage)
  }

  test("a tampered row fails verification as a checksum mismatch, not a count change") {
    val out = freshDir().resolve("tampered").toString
    export(out)
    // Rewrite shard 1 with one document's text altered — same row count.
    val shardDir = s"$out/_graft_shard=1"
    val rows = spark.read.parquet(shardDir)
    val minId = rows.agg(org.apache.spark.sql.functions.min("doc_id")).head().getLong(0)
    import org.apache.spark.sql.functions._
    val tampered = rows.withColumn("text",
      when(col("doc_id") === minId, concat(col("text"), lit("x"))).otherwise(col("text")))
      .localCheckpoint() // sever lineage from the files about to be replaced
    val tmp = freshDir().resolve("rewrite").toString
    tampered.write.mode("overwrite").parquet(tmp)
    val dir = new java.io.File(shardDir)
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f => assert(f.delete()))
    new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(shardDir, f.getName)))
    val e = intercept[IllegalStateException](
      ExportOps.verifyShards(spark, out, "doc_id", Seq("text"), seed = 7L))
    assert(e.getMessage.contains("shard 1") && e.getMessage.contains("checksum"),
      e.getMessage)
  }

  test("an unmanifested directory is refused outright") {
    val out = freshDir().resolve("bare").toString
    docs.limit(10).withColumn("_graft_shard", org.apache.spark.sql.functions.lit(0))
      .write.partitionBy("_graft_shard").parquet(out)
    val e = intercept[IllegalStateException](
      ExportOps.verifyShards(spark, out, "doc_id", Seq("text"), seed = 7L))
    assert(e.getMessage.contains("no _graft_manifest.json"), e.getMessage)
  }

  test("the manifest describes the files on disk even for a non-deterministic input") {
    // A frame whose content changes on every evaluation: if the manifest
    // were computed by RE-EVALUATING the input (instead of re-reading the
    // files just written), it would describe rows that are not on disk
    // and verification would fail immediately.
    import org.apache.spark.sql.functions._
    val out = freshDir().resolve("nondet").toString
    val nondet = docs.limit(20)
      .withColumn("text", concat(lit("r"), rand()))
    ExportOps.shardedExport(nondet, out, "doc_id", Seq("text"), nShards = 4, seed = 7L)
    ExportOps.verifyShards(spark, out, "doc_id", Seq("text"), seed = 7L)
  }

  test("the portable manifest matches the xx manifest's counts but not its hashes") {
    // Same sharding semantics, different hash functions: counts per shard
    // differ (different shard assignment is allowed — the hash IS the
    // assignment), but both manifests cover the same total row count.
    val n = docs.count()
    val xx = ExportOps.shardManifest(docs, "doc_id", Seq("text"), 4, 7L)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).head().getLong(0)
    val portable = ExportOps.shardManifest(
        docs, "doc_id", Seq("text"), 4, 7L, ExportOps.portableRowHash)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).head().getLong(0)
    assert(xx == n && portable == n)
  }
}
