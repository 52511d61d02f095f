package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One row of the table catalog.
  *
  * Mirrors the reference's `tables_list` CSV
  * (`/root/reference/tables_list:1`): columns
  * `table_name,to_be_loaded,watermark_column,watermark_type`. Empty
  * watermark fields mean "always full load"
  * (`/root/reference/tables_list:2-7`).
  */
final case class TableSpec(
    tableName: String,
    toBeLoaded: Boolean,
    watermarkColumn: Option[String],
    watermarkType: Option[WatermarkType])

sealed trait WatermarkType
object WatermarkType {
  /** Monotonic integer key (`/root/reference/app.py:105-107`). */
  case object Id extends WatermarkType
  /** Timestamp column (`/root/reference/app.py:108-112`). */
  case object Timestamp extends WatermarkType

  /** Unknown tags degrade to None → full load
    * (`/root/reference/app.py:113-117`). */
  def parse(s: String): Option[WatermarkType] = s.trim.toLowerCase match {
    case "id"        => Some(Id)
    case "timestamp" => Some(Timestamp)
    case _           => None
  }
}

/** Catalog loader — Spark-native version of `get_tables`
  * (`/root/reference/util.py:352-400`): CSV scan → `to_be_loaded == "yes"`
  * filter → optional requested-name `isin` filter, warning on requested
  * names that don't exist (the reference's anti-diff,
  * `/root/reference/util.py:385-387`).
  */
object Catalog {

  /** @param requested `None` = all (the reference's `"all"` argument,
    *                  `/root/reference/util.py:368-381`) */
  def load(
      spark: SparkSession,
      csvPath: String,
      requested: Option[Seq[String]] = None,
      warn: String => Unit = s => System.err.println(s"[catalog] $s"))
      : Seq[TableSpec] = {
    val df = spark.read
      .option("header", "true")
      .csv(csvPath)
      .select(
        col("table_name"),
        col("to_be_loaded"),
        col("watermark_column"),
        col("watermark_type"))

    // The catalog is tiny (6 rows in the reference); collect driver-side is
    // the correct scale decision, matching SURVEY §2.1 R6.
    val rows = df.collect().toSeq.map { r =>
      def str(i: Int): Option[String] =
        Option(r.getString(i)).map(_.trim).filter(_.nonEmpty)
      TableSpec(
        tableName = str(0).getOrElse(""),
        toBeLoaded = str(1).exists(_.equalsIgnoreCase("yes")),
        watermarkColumn = str(2),
        watermarkType = str(3).flatMap(WatermarkType.parse))
    }

    val loadable = rows.filter(_.toBeLoaded)
    requested match {
      case None => loadable
      case Some(names) =>
        val found = loadable.filter(t => names.contains(t.tableName))
        val missing = names.diff(found.map(_.tableName))
        if (missing.nonEmpty)
          warn(s"requested tables not in catalog or not loadable: ${missing.mkString(", ")}")
        found
    }
  }
}
