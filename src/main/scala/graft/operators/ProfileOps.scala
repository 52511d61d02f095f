package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling (SURVEY §2.3 E83) — the data-quality report an
  * ingestion pipeline computes before trusting a new source: per column,
  * row count, null count, distinct count, min/max. The reference's catalog
  * pass trusts its `tables_list` metadata blindly; this is the "measure the
  * data itself" counterpart.
  *
  * ONE job for all columns: every metric is a single wide `agg`, then the
  * row unpivots with `stack` — the input is scanned once, partial
  * aggregates combine map-side. `exact=false` (the 100 TB default) swaps
  * `count_distinct` for the HLL sketch: multi-column exact distinct counts
  * expand the input (one replica per distinct column — Spark's Expand
  * operator), which is fine at audit scale and ruinous at corpus scale.
  */
object ProfileOps {

  /** Profile numeric columns: `(column, n, n_null, n_distinct, min, max)`
    * with min/max as doubles.
    *
    * `rsd` is the HLL relative standard deviation for `exact=false`.
    * Spark's HLL++ has no sparse-mode small-cardinality shortcut, so tiny
    * cardinalities see the full register noise — rsd 0.02 (~2.6 k registers,
    * ~5 KB per sketch) keeps low-cardinality estimates inside ±5% where the
    * 0.05 default does not, at negligible memory cost for a profiler. */
  def profileNumeric(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = true,
      rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty)
    // A profiler's whole point is untrusted new sources, so column NAMES
    // are untrusted input: nothing user-supplied is ever parsed. Input
    // columns resolve through a backtick-escaped reference, intermediate
    // aliases are POSITIONAL (_null_0, not _null_<name>), and the unpivot
    // is built from Column objects (explode of a struct array — same
    // single-scan, one-row shape as stack) instead of an expr() string a
    // quoted/backticked name would break out of.
    def c(name: String) = col(s"`${name.replace("`", "``")}`")
    val n = count(lit(1)).as("_n")
    val metrics = cols.zipWithIndex.flatMap { case (cn, i) =>
      val d = if (exact) count_distinct(c(cn)) else approx_count_distinct(c(cn), rsd)
      Seq(
        sum(c(cn).isNull.cast("long")).as(s"_null_$i"),
        d.as(s"_dist_$i"),
        min(c(cn).cast("double")).as(s"_min_$i"),
        max(c(cn).cast("double")).as(s"_max_$i"))
    }
    val wide = df.agg(n, metrics: _*)
    val unpivot = explode(array(cols.zipWithIndex.map { case (cn, i) =>
      struct(
        lit(cn).as("column"),
        col(s"_null_$i").as("n_null"),
        col(s"_dist_$i").as("n_distinct"),
        col(s"_min_$i").as("min"),
        col(s"_max_$i").as("max"))
    }: _*))
    wide.select(unpivot.as("_m"), col("_n").as("n"))
      .select(col("_m.column").as("column"), col("n"), col("_m.n_null").as("n_null"),
        col("_m.n_distinct").as("n_distinct"), col("_m.min").as("min"),
        col("_m.max").as("max"))
  }

  /** Conf knob: estimated input bytes at/above which [[exactQuantiles]]
    * uses its distributed counts+cum-rank formulation instead of the
    * builtin `percentile` aggregate. Default 64 MiB: below it even a
    * fully-distinct double column fits the builtin's single-task merge
    * comfortably (and the builtin's ONE wide aggregation is measurably
    * cheaper at fixture scale — +0.7–1 s of exchange/window latency at
    * sf0.1 for the distributed form); above it the builtin's boxed
    * buffers start to dominate (2–3× slower at gsf1's 126 MB / 4.6 M
    * distinct values, and an OOM class at 100 TB group sizes). The
    * dispatch can never move a result: both paths are bit-equal by
    * construction (spec-gated). */
  val DistributedQuantilesMinBytesKey = "spark.graft.exactQuantiles.distributedMinBytes"
  val DistributedQuantilesMinBytesDefault: Long = 64L << 20

  /** Per-group EXACT quantiles — for each `(valueCol, qs)` spec, a
    * `<valueCol>_quantiles: array<double>` column (in `qs` order),
    * bit-equal to `percentile(cast(valueCol as double), array(qs))`.
    * Nulls are ignored per column; a group appears iff it has at least
    * one non-null value in at least one requested column, and a column
    * with no values in a surviving group yields a NULL array.
    *
    * Strategy is picked by ESTIMATED INPUT SIZE (plan statistics — file
    * sizes for a parquet scan, `defaultSizeInBytes` = "huge" when
    * unknown, so derived inputs default to the scale-safe path), the
    * same deliberate size dispatch Spark applies to join strategies:
    *
    *   - below [[DistributedQuantilesMinBytesKey]]: ONE wide builtin
    *     aggregation (all specs in one pass — the minimal-latency shape
    *     at audit scale);
    *   - at/above it: per spec, a grouped (group, value) count (hash
    *     aggregate, map-side partials, spillable), a per-group
    *     cumulative-count window over the DISTINCT-VALUE frame (external
    *     sort — the one serial-per-group point, same serial point as the
    *     builtin's merge task, minus its boxed in-heap value→count
    *     OpenHashMap), then rank bracketing and interpolation as plain
    *     projections; spec pipelines meet in group-sized full-outer
    *     joins that reuse the group partitioning. Measured at gsf1
    *     (6 M rows, 4.6 M distinct doubles): 2–3× faster than the
    *     builtin and not GC-bound; at 100 TB the builtin's single
    *     per-group merge buffer is the q39/q100 OOM hazard, this shape
    *     spills.
    *
    * Bit-equality contract (spec-gated in ProfileOpsSpec): the rank and
    * interpolation replicate `Percentile.getPercentile` EXACTLY —
    * `r = q·(n−1)`; `lo = floor(r)`; `hi = ceil(r)`; result
    * `= v[lo]` when `hi == lo` else `(hi−r)·v[lo] + (r−lo)·v[hi]` — in
    * the same IEEE double operation order, so the dispatch (and
    * replacing a builtin call site) never moves an oracle hash. */
  def exactQuantiles(
      df: DataFrame,
      groupCol: String,
      specs: Seq[(String, Seq[Double])]): DataFrame = {
    require(specs.nonEmpty, "specs must be non-empty")
    require(specs.map(_._1).distinct.size == specs.size,
      s"duplicate value columns: ${specs.map(_._1)}")
    specs.foreach { case (c, qs) =>
      require(qs.nonEmpty, s"$c: qs must be non-empty")
      require(qs.forall(q => q >= 0.0 && q <= 1.0), s"$c: quantiles out of [0,1]: $qs")
    }
    val minBytes = df.sparkSession.conf
      .get(DistributedQuantilesMinBytesKey, DistributedQuantilesMinBytesDefault.toString)
      .toLong
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val anyValue = specs.map { case (c, _) => col(c).cast("double").isNotNull }
      .reduce(_ || _)
    if (estBytes < BigInt(minBytes)) {
      df.filter(anyValue)
        .groupBy(col(groupCol))
        .agg(
          percentile(col(specs.head._1).cast("double"),
            array(specs.head._2.map(lit(_)): _*)).as(s"${specs.head._1}_quantiles"),
          specs.tail.map { case (c, qs) =>
            percentile(col(c).cast("double"), array(qs.map(lit(_)): _*))
              .as(s"${c}_quantiles")
          }: _*)
    } else {
      specs.map { case (c, qs) => distributedQuantiles(df, groupCol, c, qs) }
        .reduce(_.join(_, Seq(groupCol), "full_outer"))
    }
  }

  private def distributedQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("double")
    val vc = df.filter(v.isNotNull)
      .groupBy(col(groupCol), v.as("_xq_v"))
      .agg(count(lit(1)).as("_xq_c"))
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("_xq_v"))
    val wAll = Window.partitionBy(col(groupCol))
    val bracketed = vc
      .withColumn("_xq_cum", sum(col("_xq_c")).over(wCum))
      .withColumn("_xq_n", max(col("_xq_cum")).over(wAll))
      .select(col(groupCol), col("_xq_v"), col("_xq_c"), col("_xq_cum"), col("_xq_n"),
        posexplode(array(qs.map(lit(_)): _*)).as(Seq("_xq_i", "_xq_q")))
      .withColumn("_xq_r", col("_xq_q") * (col("_xq_n") - lit(1L)).cast("double"))
      .withColumn("_xq_lo", floor(col("_xq_r")))
      .withColumn("_xq_hi", ceil(col("_xq_r")))
      // Keep only the 1–2 rows per (group, q) whose [cum−c, cum) index
      // range covers lo or hi; everything downstream is |groups|·|qs|
      // and reuses the window's group partitioning (no more exchanges).
      .filter(col("_xq_cum") > col("_xq_lo") &&
        (col("_xq_cum") - col("_xq_c")) <= col("_xq_hi"))
    bracketed
      .groupBy(col(groupCol), col("_xq_i"))
      .agg(
        min(when(col("_xq_cum") > col("_xq_lo") &&
          (col("_xq_cum") - col("_xq_c")) <= col("_xq_lo"), col("_xq_v"))).as("_xq_vlo"),
        min(when(col("_xq_cum") > col("_xq_hi") &&
          (col("_xq_cum") - col("_xq_c")) <= col("_xq_hi"), col("_xq_v"))).as("_xq_vhi"),
        // r/lo/hi are a pure function of (group, q) — identical on every
        // surviving row of the key — so first() is deterministic here.
        first(col("_xq_r")).as("_xq_rr"),
        first(col("_xq_lo")).as("_xq_flo"),
        first(col("_xq_hi")).as("_xq_fhi"))
      .select(col(groupCol), col("_xq_i"),
        when(col("_xq_fhi") === col("_xq_flo"), col("_xq_vlo"))
          .otherwise((col("_xq_fhi") - col("_xq_rr")) * col("_xq_vlo") +
            (col("_xq_rr") - col("_xq_flo")) * col("_xq_vhi")).as("_xq_val"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("_xq_i"), col("_xq_val")))),
        e => e.getField("_xq_val")).as(s"${valueCol}_quantiles"))
  }
}
