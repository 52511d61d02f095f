package graft

import org.scalatest.funsuite.AnyFunSuite

/** The checkpoint-mode toggle (`spark.graft.reliableCheckpoint`) must be a
  * pure failure-recovery choice: both modes produce bit-identical results.
  * q90 is the gate because its tf frame is the one materialization point a
  * real corpus run depends on (VERDICT r5 §what's-wrong 3: localCheckpoint
  * is executor-local and non-resilient — a cluster needs the reliable
  * path). */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def runQ90(): Seq[String] =
    SparkEntry.queries("q90_bm25_keywords")(spark, TestSpark.sfDir)
      .collect()
      .map(_.mkString("|"))
      .sorted
      .toSeq

  test("q90 is hash-identical under localCheckpoint and reliable checkpoint") {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt-spec").toString
    spark.conf.unset("spark.graft.reliableCheckpoint")
    val local = runQ90()
    try {
      spark.conf.set("spark.graft.reliableCheckpoint", "true")
      spark.conf.set("spark.graft.checkpointDir", ckptDir)
      val reliable = runQ90()
      assert(local == reliable, "checkpoint mode changed query results")
      // The reliable path must actually have written durable checkpoint
      // state (that is its entire point — executor loss recomputes from it).
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"reliable mode wrote nothing under $ckptDir")
      assert(local.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpoint")
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }
}
