package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for shuffle-free co-located joins —
  * the core 100 TB technique for repeated fact-to-fact joins: pay the
  * shuffle ONCE at write time, then every join on the bucket keys reads
  * both sides co-located and skips its exchanges entirely. At cluster
  * scale this is how a 100 TB lineitem⋈orders join avoids moving either
  * table; on the reference's single-cursor model the equivalent (indexed
  * merge) doesn't exist at all.
  *
  * Uses the session catalog's bucketing metadata (`bucketBy` + `sortBy` +
  * `saveAsTable`): Spark records bucket spec in the catalog and the planner
  * proves co-partitioning when both sides share keys and bucket count.
  */
object BucketedOps {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table at `path`,
    * registered as `table` in the session catalog. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      nBuckets: Int,
      path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on their bucket keys. With equal
    * bucket counts the planner elides both shuffle exchanges (assert via
    * plan: no `Exchange hashpartitioning` — see BucketedOpsSpec). */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
