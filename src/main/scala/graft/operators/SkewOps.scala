package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys (SURVEY §4 / the 100 TB design
  * rules). AQE's skew-join splitting covers joins; heavily skewed
  * AGGREGATION keys (one key holding a large fraction of all rows) still
  * funnel into a single reducer. `saltedAgg` runs the classic two-phase
  * shape: phase 1 aggregates on (keys, salt) — spreading a hot key over
  * `nSalts` reducers — and phase 2 combines the partials per key.
  *
  * Only decomposable aggregates are supported: sum/count/min/max combine
  * with sum/sum/min/max, and avg decomposes into (sum, count) partials that
  * recombine as sum-of-sums / sum-of-counts. The salt must be a pure
  * function of the row (via `spark_partition_id` + a per-partition counter
  * would be nondeterministic across retries; `pmod(hash(...), n)` is
  * stable), so re-computation under task retry lands partials in the same
  * salt bucket. By default the hash covers every column; on a wide fact
  * table that is per-row work proportional to row width, so callers pass
  * `saltFrom` — the key plus one or two cheap columns that VARY within a
  * hot key (a line number, an id) — and the salt hashes only those. Any
  * row-pure subset is correct; the only cost of a low-variation subset is
  * weaker spread, never a wrong result.
  */
object SkewOps {

  final case class AggSpec(input: Column, func: String, alias: String) {
    require(Set("sum", "count", "min", "max", "avg")(func), s"non-decomposable: $func")
  }

  def sumOf(c: Column, alias: String): AggSpec = AggSpec(c, "sum", alias)
  def countOf(alias: String): AggSpec = AggSpec(lit(1), "count", alias)
  def minOf(c: Column, alias: String): AggSpec = AggSpec(c, "min", alias)
  def maxOf(c: Column, alias: String): AggSpec = AggSpec(c, "max", alias)
  def avgOf(c: Column, alias: String): AggSpec = AggSpec(c, "avg", alias)

  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      nSalts: Int,
      aggs: Seq[AggSpec],
      saltFrom: Seq[Column] = Nil): DataFrame = {
    require(aggs.nonEmpty)
    val saltInputs = if (saltFrom.nonEmpty) saltFrom else df.columns.map(col).toSeq
    val salted = df.withColumn("_graft_salt",
      pmod(hash(saltInputs: _*), lit(nSalts)))
    // Phase 1: partials per (keys, salt). avg contributes TWO partial
    // columns (sum + count) so phase 2 can form the exact global mean —
    // averaging per-salt averages would weight salt buckets equally and be
    // wrong whenever bucket sizes differ.
    val partials: Seq[Column] = aggs.flatMap { a =>
      a.func match {
        case "avg" => Seq(
          sum(a.input).as(s"${a.alias}__psum"),
          count(a.input).as(s"${a.alias}__pcnt"))
        case f => Seq(applyFunc(f, a.input).as(a.alias))
      }
    }
    val phase1 = salted
      .groupBy((keys :+ col("_graft_salt")): _*)
      .agg(partials.head, partials.tail: _*)
    val combined: Seq[Column] = aggs.map { a =>
      a.func match {
        case "sum" | "count" => sum(col(a.alias)).as(a.alias)
        case "min"           => min(col(a.alias)).as(a.alias)
        case "max"           => max(col(a.alias)).as(a.alias)
        case "avg" =>
          (sum(col(s"${a.alias}__psum")) / sum(col(s"${a.alias}__pcnt"))).as(a.alias)
      }
    }
    phase1.groupBy(keys: _*).agg(combined.head, combined.tail: _*)
  }

  private def applyFunc(f: String, c: Column): Column = f match {
    case "sum"   => sum(c)
    case "count" => count(c)
    case "min"   => min(c)
    case "max"   => max(c)
  }

  /** Skew-mitigated equi JOIN: the fact side's hot keys are scattered over
    * `nSalts` shards and the dimension side is replicated `nSalts`×, so the
    * join key becomes (key, salt) and no single reducer receives a hot
    * key's entire row set. This is the manual fallback for when AQE's
    * skew-join split cannot apply (e.g. the skewed side feeds an
    * aggregation that must share the join's partitioning, or stats hide
    * the skew until runtime).
    *
    * The right side must be the smaller one (it is replicated — cost
    * `nSalts × |right|`) but too large or too mid-plan to broadcast; for a
    * genuinely tiny right side, use `broadcast()` instead, which needs no
    * salting at all. The join is pinned to the shuffle path (shuffle_hash
    * hint): letting Spark broadcast the replicated side would silently
    * discard the scatter this operator exists to provide. The left salt is
    * a pure function of the row (stable under task retry); the result is
    * identical to a plain inner join on `key`.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      nSalts: Int,
      saltFrom: Seq[Column] = Nil): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive: $nSalts")
    require(!left.columns.contains("_graft_salt") && !right.columns.contains("_graft_salt"),
      "inputs already carry a _graft_salt column — rename it before salting")
    val saltInputs = if (saltFrom.nonEmpty) saltFrom else left.columns.map(col).toSeq
    val saltedLeft = left.withColumn("_graft_salt",
      pmod(hash(saltInputs: _*), lit(nSalts)))
    val replicatedRight = right
      .withColumn("_graft_salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .hint("shuffle_hash")
    saltedLeft.join(replicatedRight, Seq(key, "_graft_salt"))
      .drop("_graft_salt")
  }
}
