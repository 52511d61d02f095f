package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet directories. Long-running incremental
  * pipelines (CopyJob appends a part per run) accumulate files far smaller
  * than a scan partition; at cluster scale the file-listing and per-file
  * open costs come to dominate reads. Compaction rewrites the directory
  * into ~`targetMB`-sized files.
  *
  * The swap never has a moment with ZERO copies on disk: the live dir is
  * renamed to a backup, the compacted dir renamed into place, then the
  * backup deleted — a crash at any step leaves either the original (as
  * `.<name>_compact_bak`, restorable) or the new data live. Each rename's
  * boolean result is checked (Hadoop signals failure by return value, not
  * exception). On HDFS each rename is atomic; on object stores it is not —
  * there, the standard play is compact-to-new-prefix + repoint the table
  * location.
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

    // Row count rides the rewrite as an observed metric — a separate
    // count() pass would double the dominant I/O cost (same single-scan
    // rule as CopyJob).
    val obs = org.apache.spark.sql.Observation(s"compact_${path.getName}")
    val tmp = new Path(path.getParent, s".${path.getName}_compact_tmp")
    spark.read.parquet(dir)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val rows = obs.get("n").asInstanceOf[Long]

    val bak = new Path(path.getParent, s".${path.getName}_compact_bak")
    fs.delete(bak, true)
    def renameOrThrow(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"compaction swap failed: rename $from -> $to")
    renameOrThrow(path, bak)
    renameOrThrow(tmp, path)
    fs.delete(bak, true)
    CompactionReport(before.length, dataFiles().length, rows)
  }
}
