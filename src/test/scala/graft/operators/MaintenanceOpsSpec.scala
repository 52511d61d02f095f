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
}
