package graft.streaming

import graft.TestSpark
import graft.operators.ExportOps
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Top level so its Encoder needs no outer scope. */
case class ExportDoc(doc_id: Long, text: String)

/** E95's streaming side, live: micro-batches export as per-epoch
  * manifested shard trees, epoch replay is byte-idempotent, and the tree
  * verifier refuses a damaged epoch (and an empty tree). */
class StreamExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(from: Long, n: Int): Seq[ExportDoc] =
    (from until from + n).map(i => ExportDoc(i, s"streamed document $i"))

  test("per-epoch manifested export: live drive, tree verify, replay idempotence, damage refusal") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("stream_export").resolve("tree").toString
    val ckpt = Files.createTempDirectory("stream_export_ckpt").toString
    val mem = MemoryStream[ExportDoc]
    val q = StreamingOps.foreachBatchShardedExport(
        mem.toDF().writeStream.option("checkpointLocation", ckpt),
        out, "doc_id", Seq("text"), nShards = 3, seed = 11L)
      .start()
    try {
      mem.addData(docs(0, 20): _*); q.processAllAvailable()
      mem.addData(docs(20, 20): _*); q.processAllAvailable()
      mem.addData(docs(40, 20): _*); q.processAllAvailable()
    } finally q.stop()

    // Three epochs on disk, each individually verified at write time;
    // the tree verifier re-checks all of them.
    assert(ExportOps.verifyExportTree(spark, out, "doc_id", Seq("text"), 11L) == 3)

    // Crash-replay shape: re-export epoch 1's batch with the same token.
    // The overwrite lands identical files AND an identical manifest — the
    // tree still verifies, and the manifest bytes did not change.
    val epoch1 = s"$out/_graft_epoch=1"
    val manifestBefore = Files.readString(
      java.nio.file.Paths.get(epoch1, "_graft_manifest.json"))
    ExportOps.shardedExport(
      docs(20, 20).toDF(), epoch1, "doc_id", Seq("text"), nShards = 3, seed = 11L)
    assert(Files.readString(
      java.nio.file.Paths.get(epoch1, "_graft_manifest.json")) == manifestBefore)
    assert(ExportOps.verifyExportTree(spark, out, "doc_id", Seq("text"), 11L) == 3)

    // Damage one epoch: the TREE verification names it.
    val shardDir = new java.io.File(epoch1).listFiles()
      .filter(_.getName.startsWith("_graft_shard=")).head
    shardDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.delete()))
    val e = intercept[IllegalStateException](
      ExportOps.verifyExportTree(spark, out, "doc_id", Seq("text"), 11L))
    assert(e.getMessage.contains("shard"), e.getMessage)

    // An empty tree is a refusal, never a silent pass.
    val bare = Files.createTempDirectory("stream_export_bare").toString
    val e2 = intercept[IllegalStateException](
      ExportOps.verifyExportTree(spark, bare, "doc_id", Seq("text"), 11L))
    assert(e2.getMessage.contains("nothing to verify"), e2.getMessage)
  }
}
