package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet directories. Long-running incremental
  * pipelines (CopyJob appends a part per run) accumulate files far smaller
  * than a scan partition; at cluster scale the file-listing and per-file
  * open costs come to dominate reads. Compaction rewrites the directory
  * into ~`targetMB`-sized files.
  *
  * The rewrite goes through a sibling temp directory, then a delete+rename
  * swap. On HDFS rename is atomic; on object stores it is not — there, the
  * standard play is compact-to-new-prefix + repoint the table location
  * (noted here because the swap step is the only part that changes).
  */
object MaintenanceOps {

  final case class CompactionReport(filesBefore: Int, filesAfter: Int, rows: Long)

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

    val before = dataFiles()
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes / (targetMB * 1024.0 * 1024.0)).toInt)

    val df = spark.read.parquet(dir)
    val rows = df.count()
    val tmp = new Path(path.getParent, s".${path.getName}_compact_tmp")
    df.repartition(nOut).write.mode(SaveMode.Overwrite).parquet(tmp.toString)

    fs.delete(path, true)
    fs.rename(tmp, path)
    CompactionReport(before.length, dataFiles().length, rows)
  }
}
