package graft.operators

import graft.TestSpark
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Incremental corpus dedup: batch 1 seeds the ledger, batch 2 keeps only
  * genuinely new docs, a replay of batch 2 keeps nothing. */
class DedupOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ledger dedup across batches with within-batch min-id pick") {
    val ledger = Files.createTempDirectory("dedup_ledger").resolve("fp").toString

    // Batch 1: 10 unique texts + one in-batch duplicate pair (ids 100/101).
    val b1 = ((1 to 10).map(i => (i.toLong, s"text number $i")) ++
      Seq((100L, "dup text"), (101L, "dup text"))).toDF("doc_id", "text")
    val out1 = DedupOps.incrementalDedup(spark, b1, "text", "doc_id", ledger)
      .as[(Long, String)].collect().toSet
    assert(out1.map(_._1).contains(100L) && !out1.map(_._1).contains(101L),
      "in-batch duplicate must keep the smallest id")
    assert(out1.size == 11)

    // Batch 2: 5 repeats of batch 1 + 3 new docs.
    val b2 = ((1 to 5).map(i => (200L + i, s"text number $i")) ++
      (1 to 3).map(i => (300L + i, s"fresh text $i"))).toDF("doc_id", "text")
    val out2 = DedupOps.incrementalDedup(spark, b2, "text", "doc_id", ledger)
      .as[(Long, String)].collect().toSet
    assert(out2.map(_._2) == Set("fresh text 1", "fresh text 2", "fresh text 3"))

    // Replay of batch 2: everything is ledgered now.
    val out3 = DedupOps.incrementalDedup(spark, b2, "text", "doc_id", ledger)
    assert(out3.count() == 0L)
  }
}
