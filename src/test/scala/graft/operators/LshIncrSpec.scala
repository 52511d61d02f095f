package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The incremental band-ledger near-dup protocol: drop-on-collision
  * against the corpus buckets, keep-min-id within the batch, survivors'
  * buckets (only) committed, and the write-then-commit crash contract. */
class LshIncrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_lsh_incr").resolve("bands").toString

  test("batch 2 drops near-dups of the ledgered corpus, keeps fresh docs") {
    val ledger = tmp()
    val corpus = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "one two three four five six seven eight")).toDF("doc_id", "text")
    LshOps.incrementalNeardup(spark, corpus, "text", "doc_id", ledger).commitLedger()
    val batch2 = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 2
      (13L, "totally fresh words appearing nowhere else here"),
      (15L, "totally fresh words appearing nowhere else here"), // in-batch dup of 13
      (17L, "x1")) // sub-shingle short doc: no bands, survives
      .toDF("doc_id", "text")
    val pending = LshOps.incrementalNeardup(spark, batch2, "text", "doc_id", ledger)
    val survivors = pending.survivors.select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(13L, 17L))
    assert(pending.ledgerHits.as[Long].collect().toSet == Set(11L))
  }

  test("the banded signature cache is released before the pending batch returns") {
    // Same per-micro-batch leak hazard as the SRP twin (SrpIncrSpec): the
    // caller-visible frames are localCheckpoint-pinned, so the banded
    // cache must be unpersisted before incrementalNeardup returns.
    spark.catalog.clearCache()
    val ledger = tmp()
    LshOps.incrementalNeardup(spark,
      Seq((2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
      "text", "doc_id", ledger).commitLedger()
    val pending = LshOps.incrementalNeardup(spark,
      Seq((9L, "completely different prose lives right here")).toDF("doc_id", "text"),
      "text", "doc_id", ledger)
    assert(spark.sharedState.cacheManager.isEmpty,
      "incrementalNeardup leaked its banded signature cache")
    pending.commitLedger()
    assert(pending.survivors.select($"doc_id").as[Long].collect().toSet == Set(9L))
  }

  test("write-then-commit: survivors are stable across the ledger commit") {
    val ledger = tmp()
    val corpus = Seq((2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    LshOps.incrementalNeardup(spark, corpus, "text", "doc_id", ledger).commitLedger()
    val batch2 = Seq((9L, "completely different prose lives right here"))
      .toDF("doc_id", "text")
    val pending = LshOps.incrementalNeardup(spark, batch2, "text", "doc_id", ledger)
    pending.commitLedger()
    // Evaluated only AFTER the commit appended 9's buckets: the pinned
    // pre-commit ledger view must keep 9 a survivor (a lazy re-read would
    // find its own buckets and anti-join the batch away — the q77 hazard).
    assert(pending.survivors.select($"doc_id").as[Long].collect().toSet == Set(9L))
    // And the committed buckets protect the corpus: replaying the same
    // batch as a NEW ingest now drops it as a ledger hit.
    val replay = LshOps.incrementalNeardup(spark, batch2, "text", "doc_id", ledger)
    assert(replay.survivors.count() == 0L)
    assert(replay.ledgerHits.as[Long].collect().toSet == Set(9L))
  }

  test("a parameter-mismatched ingest is refused loudly (silent no-collide hazard)") {
    val ledger = tmp()
    val corpus = Seq((2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    LshOps.incrementalNeardup(spark, corpus, "text", "doc_id", ledger).commitLedger()
    val e = intercept[IllegalStateException] {
      LshOps.incrementalNeardup(
        spark, Seq((9L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
        "text", "doc_id", ledger, shingleN = 4)
    }
    assert(e.getMessage.contains("never collide"))
  }

  test("a foreign-schema ledger dir is refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_incr_bad").toString
    Seq((1L, 2L)).toDF("x", "y").write.parquet(s"$dir/bands")
    val e = intercept[IllegalStateException] {
      LshOps.incrementalNeardup(
        spark, Seq((1L, "a b c d e f")).toDF("doc_id", "text"),
        "text", "doc_id", s"$dir/bands")
    }
    assert(e.getMessage.contains("band ledger"))
  }
}
