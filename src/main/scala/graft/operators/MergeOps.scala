package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE semantics for immutable columnar storage (SURVEY §2.3 E78) — the
  * "apply today's extract to the dimension" operation the reference's
  * full/incremental copy model stops short of: its sinks only append or
  * replace whole tables (`/root/reference/util.py:383-417`); updating rows
  * in place needs a merge, which parquet can only express as a rewrite.
  *
  * Both operators are ONE shuffle on the key (a single keyed join), then
  * narrow projections/unions — at 100 TB the cost is the same join every
  * CDC-merge engine pays, and AQE broadcast-elides it when the update
  * batch is small. Rewriting only affected partitions is the
  * [[graft.pipeline.Connectors.IdempotentSink]] layer's job; these
  * operators produce the merged RESULT, storage-agnostically.
  */
object MergeOps {

  /** Last-write-wins upsert: every key of `updates` takes its updated row;
    * target rows with unmatched keys pass through. Insert = unmatched
    * update key. Schemas must match.
    */
  def upsert(target: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame =
    target.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)

  /** Slowly-changing-dimension type 2: history-preserving merge.
    *
    * `current` carries the validity bookkeeping (`valid_from`, `valid_to`,
    * `is_current`); `updates` carries the business columns only (same
    * schema minus the bookkeeping). A key whose `compareCols` changed gets
    * its open row closed at `effectiveDate` and a new open row; an
    * unchanged or absent key passes through untouched. Update rows for
    * unknown keys insert as new open rows.
    *
    * Change detection is null-safe (`<=>`) per compared column. The one
    * wide operation is the full-outer join on `key`; closed history rows
    * never enter it.
    */
  def scd2(
      current: DataFrame,
      updates: DataFrame,
      key: String,
      compareCols: Seq[String],
      effectiveDate: Column): DataFrame = {
    val book = Seq("valid_from", "valid_to", "is_current")
    require(book.forall(current.columns.contains),
      s"current must carry ${book.mkString("/")} bookkeeping columns")
    val attrs = updates.columns.toSeq
    require(!book.exists(attrs.contains) && attrs.contains(key),
      "updates must carry the business columns (incl. the key) and no bookkeeping")

    val hist = current.filter(!col("is_current"))
    val open = current.filter(col("is_current"))

    val c = open.select(attrs.map(a => col(a).as(s"_c_$a")) ++
      Seq(col("valid_from").as("_c_valid_from")): _*)
    val u = updates.select(attrs.map(a => col(a).as(s"_u_$a")): _*)
    val joined = c.join(u, col(s"_c_$key") <=> col(s"_u_$key"), "full_outer")
      .localCheckpoint(true) // one join feeds three branches: compute it once

    val matched = col(s"_c_$key").isNotNull && col(s"_u_$key").isNotNull
    val changed = matched &&
      !compareCols.map(a => col(s"_c_$a") <=> col(s"_u_$a")).reduce(_ && _)

    def asCurrent(prefix: String, from: Column, to: Column, cur: Column) =
      (df: DataFrame) => df.select(
        attrs.map(a => col(s"${prefix}_$a").as(a)) ++
          Seq(from.as("valid_from"), to.as("valid_to"), cur.as("is_current")): _*)

    // Unchanged or update-absent: the open row survives as-is.
    val kept = asCurrent("_c", col("_c_valid_from"),
      lit(null).cast("date"), lit(true))(
      joined.filter(col(s"_c_$key").isNotNull && !changed))
    // Changed: the open row closes at the effective date.
    val closed = asCurrent("_c", col("_c_valid_from"),
      effectiveDate, lit(false))(joined.filter(changed))
    // Changed or brand-new key: a fresh open row from the update side.
    val opened = asCurrent("_u", effectiveDate,
      lit(null).cast("date"), lit(true))(
      joined.filter(changed || col(s"_c_$key").isNull))

    hist.unionByName(kept).unionByName(closed).unionByName(opened)
  }
}
