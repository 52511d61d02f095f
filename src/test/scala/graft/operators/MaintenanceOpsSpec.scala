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
}
