package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k via PARTIAL aggregation (SURVEY §2.3 E76) — the
  * scale-robust alternative to `row_number().over(Window.partitionBy(g)
  * .orderBy(v))`, which shuffles EVERY row to its group's reducer and sorts
  * whole groups there (a 10-TB group funnels through one task; same skew
  * class the two-phase stratified pick closed in SamplingOps).
  *
  * Here top-k is an [[Aggregator]] with a bounded buffer: associative and
  * commutative, so Spark computes it map-side (partial ObjectHashAggregate
  * before the exchange) and the shuffle carries at most k entries per
  * (group × map partition) instead of every row — at 100 TB with k=10 that
  * is a ~10⁶× reduction of shuffled bytes for large groups, the same
  * partial-vs-full distinction as sum/count pushdown. No sort ever sees a
  * whole group; each buffer insert is O(k).
  *
  * Determinism: ranked by (value desc, id asc) — the id tie-break makes the
  * result layout-independent and DuckDB-oracle-matchable (rank rule shared
  * with the q11/q13 window queries).
  */
object TopKOps {

  /** One scored row in the heap: natural struct encoding (no kryo — the
    * buffer stays an ObjectHashAggregate-friendly product type). */
  final case class ScoredId(v: Double, id: Long)

  /** Bounded buffer, sorted (v desc, id asc), size ≤ k. */
  final case class TopKBuf(items: List[ScoredId])

  /** `a` ranks strictly before `b`. */
  private def before(a: ScoredId, b: ScoredId): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  final case class TopKAgg(k: Int)
      extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: TopKBuf = TopKBuf(Nil)

    override def reduce(b: TopKBuf, x: ScoredId): TopKBuf =
      // Common case at steady state: a full buffer rejects a non-improving
      // row in O(1) (compare against the current minimum — the last item).
      if (b.items.sizeIs >= k && !before(x, b.items.last)) b
      else TopKBuf((x :: b.items).sortWith(before).take(k))

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.items ++ b.items).sortWith(before).take(k))

    override def finish(b: TopKBuf): TopKBuf = b

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** The aggregate column: top-k (value, id) pairs per group, usable inside
    * any `groupBy(...).agg(...)`. */
  def topK(k: Int)(value: Column, id: Column): Column =
    udaf(TopKAgg(k), Encoders.product[ScoredId])(
      value.cast("double"), id.cast("long"))

  /** String-keyed twin of [[ScoredId]]/[[TopKAgg]] for groups whose
    * deterministic tie-break is a STRING (e.g. tf-idf's token): ranked
    * by (value desc, id asc in UTF-8 BYTE order). Byte order, not
    * Scala's `<`: String comparison is UTF-16 code-unit order, which
    * DISAGREES with both Spark's UTF8String ordering and DuckDB's
    * binary collation for supplementary-plane characters (an emoji's
    * surrogates 0xD83D… sort below U+FFFD in UTF-16 but above in
    * UTF-8) — real corpus text contains emoji even when fixtures don't.
    * A parallel concrete type rather than a generic: Aggregator buffers
    * need product encoders, and two small case classes beat a TypeTag
    * dance. */
  final case class ScoredStr(v: Double, id: String)

  final case class TopKStrBuf(items: List[ScoredStr])

  /** UTF-8 unsigned-byte lexicographic `<` — the collation Spark's
    * UTF8String and DuckDB share. */
  private[operators] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def beforeStr(a: ScoredStr, b: ScoredStr): Boolean =
    a.v > b.v || (a.v == b.v && utf8Less(a.id, b.id))

  final case class TopKStrAgg(k: Int)
      extends Aggregator[ScoredStr, TopKStrBuf, TopKStrBuf] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: TopKStrBuf = TopKStrBuf(Nil)

    override def reduce(b: TopKStrBuf, x: ScoredStr): TopKStrBuf =
      if (b.items.sizeIs >= k && !beforeStr(x, b.items.last)) b
      else TopKStrBuf((x :: b.items).sortWith(beforeStr).take(k))

    override def merge(a: TopKStrBuf, b: TopKStrBuf): TopKStrBuf =
      TopKStrBuf((a.items ++ b.items).sortWith(beforeStr).take(k))

    override def finish(b: TopKStrBuf): TopKStrBuf = b

    override def bufferEncoder: Encoder[TopKStrBuf] = Encoders.product[TopKStrBuf]
    override def outputEncoder: Encoder[TopKStrBuf] = Encoders.product[TopKStrBuf]
  }

  /** [[topK]] with a string tie-break id. */
  def topKStr(k: Int)(value: Column, id: Column): Column =
    udaf(TopKStrAgg(k), Encoders.product[ScoredStr])(
      value.cast("double"), id.cast("string"))

  /** Whole-operator form: one row per kept (group, rank, id, value).
    * Exactly one shuffle (the group-by exchange); ranks are 1-based in
    * (value desc, id asc) order.
    */
  def groupedTopK(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(topK(k)(col(valueCol), col(idCol)).as("_tk"))
      .select(col(groupCol), posexplode(col("_tk.items")))
      .select(
        col(groupCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol),
        col("col.v").as(valueCol))
}
