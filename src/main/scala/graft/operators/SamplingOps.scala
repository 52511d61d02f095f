package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling/splitting for training-data pipelines.
  *
  * The load-bearing design choice: membership decisions hash the ROW ID,
  * never draw from a partition-local RNG. Spark's `randomSplit`/`sample`
  * assign rows by where they happen to sit — re-partition the data (or run
  * on a different cluster size) and train/test membership silently changes,
  * which at best breaks reproducibility and at worst leaks test data into
  * training between runs. A hash of the id is a pure function of the row:
  * the same document lands on the same side on any cluster, any layout,
  * forever.
  */
object SamplingOps {

  private def bucket(idCol: Column, seed: Long): Column =
    pmod(xxhash64(idCol, lit(seed)), lit(100L))

  /** Deterministic train/holdout split: `trainPct`% of ids to the left
    * side. Disjoint, complete, and stable under any repartitioning. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int, seed: Long)
      : (DataFrame, DataFrame) = {
    require(trainPct > 0 && trainPct < 100, s"trainPct out of (0,100): $trainPct")
    val b = bucket(col(idCol), seed)
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** Deterministic ~`pct`% subsample by id hash (stable under layout). */
  def hashSample(df: DataFrame, idCol: String, pct: Int, seed: Long): DataFrame =
    df.filter(bucket(col(idCol), seed) < pct)

  /** Exactly `n` rows per stratum (balanced corpus sampling — e.g. equal
    * docs per language), chosen by seeded id-hash order so the pick is
    * deterministic and layout-independent. One shuffle on the stratum key.
    * A stratum with FEWER than `n` rows contributes all of them — callers
    * needing guaranteed balance should verify per-stratum counts on the
    * result (a distributed pre-count here would double the cost for every
    * caller that doesn't need it).
    */
  def stratifiedFixedN(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      seed: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    df.withColumn("_graft_rank", row_number().over(w))
      .filter(col("_graft_rank") <= n)
      .drop("_graft_rank")
  }
}
