package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of the named
  * queries (or all of them) at the given sf dir. The per-plan review loop
  * — does the filter reach the scan, is the dim broadcast, did an
  * accidental cartesian appear — is how plan regressions are caught
  * before they cost anything at scale; PlanSpec pins the invariants this
  * tool surfaces.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder(s"local[${GraftSession.defaultCpus}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"[explain] $name failed: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
