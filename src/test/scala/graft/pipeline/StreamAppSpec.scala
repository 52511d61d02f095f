package graft.pipeline

import graft.TestSpark
import java.nio.file.{Files, Path}
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Streaming ingest E2E through the CLI (`--stream`): the reference's
  * scheduled-incremental shape, with files in a watched directory playing
  * the role of upstream deltas. Three invocations — initial drain, a
  * second drain of newly-dropped files, and a CRASH-REPLAY (the streaming
  * checkpoint's last commit marker deleted, as if the process died after
  * the sink write but before the checkpoint commit) — must leave exactly
  * one copy of every distinct document in the corpus. */
class StreamAppSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drop(src: Path, docs: (Long, String)*): Unit =
    docs.toSeq.toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(src.toString)

  private def cli(src: Path, base: Path): (Int, Seq[String]) = {
    val outs = scala.collection.mutable.ArrayBuffer.empty[String]
    val args = GraftApp.parseArgs(Seq(
      "dev", "docs", "--stream",
      "--source", s"parquet:$src",
      "--sink", s"parquet-idempotent:$base/out",
      "--ledger", s"$base/ledger",
      "--checkpoint", s"$base/ckpt"))
    val code = GraftApp.run(args, spark, out = outs.append(_), log = _ => ())
    (code, outs.toSeq)
  }

  private def corpus(base: Path): Set[(Long, String)] =
    spark.read.parquet(s"$base/out/docs")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet

  test("stream CLI: drain → new files → crash-replay is exactly-once") {
    val src = Files.createTempDirectory("sapp_src")
    val base = Files.createTempDirectory("sapp_base")

    // Run 1: initial drain. Within-batch duplicate alpha keeps min doc_id.
    drop(src, (1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    val (c1, out1) = cli(src, base)
    assert(c1 == 0)
    assert(out1.exists(_.startsWith("STREAM_EPOCHS_DOCS=")), out1.mkString(";"))
    assert(corpus(base) == Set((1L, "alpha"), (2L, "beta")))

    // Run 2: new files arrive — beta is already ledgered (cross-RUN dedup),
    // gamma is new. The checkpoint makes run 1's files invisible to run 2.
    drop(src, (4L, "beta"), (5L, "gamma"))
    val (c2, _) = cli(src, base)
    assert(c2 == 0)
    assert(corpus(base) == Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")))

    // Run 3: crash-replay. Delete the LAST commit marker — the state a
    // process killed between its foreachBatch (sink write + ledger commit)
    // and the checkpoint commit would leave behind. The restart must
    // replay that epoch ONTO ITSELF (idempotent sink partition + epoch
    // ledger partition), not append a second copy or drop the batch.
    val commits = base.resolve("ckpt").resolve("commits")
    val last = Files.list(commits).iterator.asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    Files.delete(last)
    // ChecksumFileSystem shadow: leaving the stale .crc behind would make
    // the replay's commit rename fail in a way a real HDFS crash wouldn't.
    Files.deleteIfExists(commits.resolve(s".${last.getFileName}.crc"))
    val (c3, _) = cli(src, base)
    assert(c3 == 0)
    assert(corpus(base) == Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")),
      "epoch replay must be exactly-once")

    // Run 4: nothing new — a no-op drain (zero epochs), corpus unchanged.
    val (c4, out4) = cli(src, base)
    assert(c4 == 0)
    assert(out4.contains("STREAM_EPOCHS_DOCS="), out4.mkString(";"))
    assert(corpus(base) == Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
  }

  test("stream CLI --dedup embed: drain → new vectors → crash-replay is exactly-once") {
    val dim = 32
    def unitVec(seed: Long, noiseOf: Option[(Array[Float], Double)] = None): Array[Float] = {
      val rng = new scala.util.Random(seed)
      val raw = noiseOf match {
        case None => Array.fill(dim)(rng.nextGaussian())
        case Some((base, eps)) => base.map(_.toDouble + eps * rng.nextGaussian())
      }
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val src = Files.createTempDirectory("sapp_vsrc")
    val base = Files.createTempDirectory("sapp_vbase")
    def dropVec(vecs: (Long, Array[Float])*): Unit =
      vecs.toSeq.toDF("vec_id", "embedding")
        .coalesce(1).write.mode(SaveMode.Append).parquet(src.toString)
    def cliVec(): (Int, Seq[String]) = {
      val outs = scala.collection.mutable.ArrayBuffer.empty[String]
      val args = GraftApp.parseArgs(Seq(
        "dev", "vecs", "--stream", "--dedup", "embed", "--id-col", "vec_id",
        "--source", s"parquet:$src",
        "--sink", s"parquet-idempotent:$base/out",
        "--ledger", s"$base/ledger",
        "--checkpoint", s"$base/ckpt"))
      (GraftApp.run(args, spark, out = outs.append(_), log = _ => ()), outs.toSeq)
    }
    def ids(): Set[Long] = spark.read.parquet(s"$base/out/vecs")
      .select($"vec_id").as[Long].collect().toSet

    // Run 1: v1 and an exact duplicate of it in one batch → min id wins.
    val v1 = unitVec(1L)
    dropVec((1L, v1), (2L, unitVec(2L)), (3L, v1))
    val (c1, out1) = cliVec()
    assert(c1 == 0)
    assert(out1.exists(_.startsWith("STREAM_EPOCHS_VECS=")), out1.mkString(";"))
    assert(ids() == Set(1L, 2L))

    // Run 2: an exact copy of the ledgered v1 (cross-RUN, cosine-verified
    // drop) plus a fresh vector.
    dropVec((4L, v1), (5L, unitVec(5L)))
    assert(cliVec()._1 == 0)
    assert(ids() == Set(1L, 2L, 5L))

    // Run 3: crash-replay — delete the last checkpoint commit marker; the
    // restart must replay the epoch onto itself.
    val commits = base.resolve("ckpt").resolve("commits")
    val last = Files.list(commits).iterator.asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    Files.delete(last)
    Files.deleteIfExists(commits.resolve(s".${last.getFileName}.crc"))
    assert(cliVec()._1 == 0)
    assert(ids() == Set(1L, 2L, 5L), "epoch replay must be exactly-once")
  }

  test("stream CLI --dedup semantic: drain → new vectors → crash-replay is exactly-once") {
    val dim = 8
    def axisVec(axis: Int, eps: Double = 0.0, tilt: Int = 0): Array[Float] = {
      val raw = Array.tabulate(dim)(i =>
        (if (i == axis) 1.0 else 0.0) + (if (eps != 0.0 && i == tilt) eps else 0.0))
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val src = Files.createTempDirectory("sapp_ssrc")
    val base = Files.createTempDirectory("sapp_sbase")
    def dropVec(vecs: (Long, Array[Float])*): Unit =
      vecs.toSeq.toDF("vec_id", "embedding")
        .coalesce(1).write.mode(SaveMode.Append).parquet(src.toString)
    def cliSem(): (Int, Seq[String]) = {
      val outs = scala.collection.mutable.ArrayBuffer.empty[String]
      val args = GraftApp.parseArgs(Seq(
        "dev", "vecs", "--stream", "--dedup", "semantic", "--id-col", "vec_id",
        "--k", "2",
        "--source", s"parquet:$src",
        "--sink", s"parquet-idempotent:$base/out",
        "--ledger", s"$base/ledger",
        "--checkpoint", s"$base/ckpt"))
      (GraftApp.run(args, spark, out = outs.append(_), log = _ => ()), outs.toSeq)
    }
    def ids(): Set[Long] = spark.read.parquet(s"$base/out/vecs")
      .select($"vec_id").as[Long].collect().toSet

    // Run 1 fits AND pins the k=2 model: axis-0 and axis-1 clusters, plus
    // an exact within-batch duplicate -> min id wins.
    val v1 = axisVec(0)
    dropVec((1L, v1), (2L, axisVec(1)), (3L, v1))
    val (c1, out1) = cliSem()
    assert(c1 == 0)
    assert(out1.exists(_.startsWith("STREAM_EPOCHS_VECS=")), out1.mkString(";"))
    assert(ids() == Set(1L, 2L))

    // Run 2 assigns against the PINNED model: an exact copy of ledgered v1
    // drops in its cluster; a fresh direction (tilted into cluster 0 so
    // assignment is tie-free) survives.
    dropVec((4L, v1), (5L, axisVec(2, eps = 0.1)))
    assert(cliSem()._1 == 0)
    assert(ids() == Set(1L, 2L, 5L))

    // Run 3: crash-replay — delete the last checkpoint commit marker; the
    // restart must replay the epoch onto itself.
    val commits = base.resolve("ckpt").resolve("commits")
    val last = Files.list(commits).iterator.asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toInt)
    Files.delete(last)
    Files.deleteIfExists(commits.resolve(s".${last.getFileName}.crc"))
    assert(cliSem()._1 == 0)
    assert(ids() == Set(1L, 2L, 5L), "epoch replay must be exactly-once")
  }

  test("stream CLI --pq-store: the drain encodes each epoch against the pinned store") {
    val src = Files.createTempDirectory("sapp_pqsrc")
    val base = Files.createTempDirectory("sapp_pqbase")
    def vec(i: Long): Array[Double] = Array.tabulate(8)(d => (i * 7 + d).toDouble % 5)
    val store = s"$base/pq"
    graft.operators.PqOps.writePqArtifacts(spark,
      (0L to 9L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", store,
      m = 2, kCodes = 4, iters = 1, coarseK = 2, coarseIters = 1)
    val pinned = graft.operators.PqOps.readPqArtifacts(spark, store)
    (10L to 12L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
      .coalesce(1).write.mode(SaveMode.Append).parquet(src.toString)
    val args = GraftApp.parseArgs(Seq(
      "dev", "vecs", "--stream", "--pq-store", store, "--id-col", "vec_id",
      "--source", s"parquet:$src", "--checkpoint", s"$base/ckpt"))
    val (code, outs) = {
      val o = scala.collection.mutable.ArrayBuffer.empty[String]
      (GraftApp.run(args, spark, out = o.append(_), log = _ => ()), o.toSeq)
    }
    assert(code == 0, outs.mkString("; "))
    val stored = spark.read.parquet(s"$store/codes")
      .select($"vec_id", $"sub", $"code", $"dist")
      .as[(Long, Int, Int, Double)].collect().toSet
    val expect = graft.operators.PqOps.encode(
      (0L to 12L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", pinned.model)
      .select($"vec_id", $"sub", $"code", $"dist")
      .as[(Long, Int, Int, Double)].collect().toSet
    assert(stored == expect,
      "the drained store must equal the whole corpus encoded against the pinned model")
  }

  test("stream CLI rejects a non-idempotent sink and a multi-table arg loudly") {
    val src = Files.createTempDirectory("sapp_src2")
    drop(src, (1L, "alpha"))
    val e1 = intercept[IllegalArgumentException] {
      GraftApp.run(GraftApp.parseArgs(Seq(
        "dev", "docs", "--stream",
        "--source", s"parquet:$src", "--sink", s"parquet:/tmp/x",
        "--ledger", "/tmp/l", "--checkpoint", "/tmp/c")),
        spark, out = _ => (), log = _ => ())
    }
    assert(e1.getMessage.contains("idempotent"))
    val e2 = intercept[IllegalArgumentException] {
      GraftApp.run(GraftApp.parseArgs(Seq(
        "dev", "all", "--stream",
        "--source", s"parquet:$src", "--sink", s"parquet-idempotent:/tmp/x",
        "--ledger", "/tmp/l", "--checkpoint", "/tmp/c")),
        spark, out = _ => (), log = _ => ())
    }
    assert(e2.getMessage.contains("ONE table"))
    // Conflicting stream modes refuse: --pq-store is the PQ-ingest
    // drain (no ledger, no sink) — combining it with --ledger/--sink
    // would silently discard the dedup pipeline the caller asked for.
    val e3 = intercept[IllegalArgumentException] {
      GraftApp.run(GraftApp.parseArgs(Seq(
        "dev", "docs", "--stream", "--pq-store", "/tmp/pq",
        "--source", s"parquet:$src", "--ledger", "/tmp/l",
        "--checkpoint", "/tmp/c")),
        spark, out = _ => (), log = _ => ())
    }
    assert(e3.getMessage.contains("ONE stream mode"), e3.getMessage)
  }
}
