package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document (line/segment) deduplication (SURVEY §2.3 E81) — the
  * C4/RefinedWeb-style boilerplate rule: a span of text that recurs across
  * the corpus (navigation chrome, license headers, templated footers) is
  * stripped from every document that contains it, while the surrounding
  * unique prose survives. Whole-doc dedup (E26/E38/E58) can't catch this:
  * the documents differ, only their furniture repeats.
  *
  * Segmentation is a fixed token stride (the fixture corpus has no
  * newlines; with real line breaks, pass the text pre-split — the
  * occurrence/strip/reassemble machinery is segmentation-agnostic).
  *
  * Scale shape: segment explode is narrow; occurrence counting shuffles
  * once on the SEGMENT (the window's partition key — per-segment groups
  * are bounded by the corpus-wide repeat count of that segment); the
  * reassembly shuffles once on the doc id, and each doc's group is bounded
  * by its own length. No corpus-sized group ever funnels through one task.
  */
object LineDedupOps {

  /** Strip every `segTokens`-token segment that occurs `maxOcc`-or-more
    * times corpus-wide; return one row per non-empty doc with the cleaned
    * text and kept/dropped counts. */
  def stripRepeatedSegments(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      segTokens: Int = 10,
      maxOcc: Int = 2): DataFrame = {
    require(segTokens >= 1 && maxOcc >= 1)
    val toks = tokens(col(textCol))
    val nSeg = ceil(size(toks).cast("double") / segTokens).cast("int")
    // sequence(0, -1) counts DOWN — guard the empty-doc case explicitly.
    val segArr = when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nSeg - 1),
        j => array_join(slice(toks, j * segTokens + 1, lit(segTokens)), " ")))
    docs
      .select(col(idCol), posexplode(segArr).as(Seq("seg_idx", "seg")))
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("seg"))))
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(
              when(col("occ") < maxOcc, struct(col("seg_idx"), col("seg"))))),
            x => x.getField("seg")),
          " ").as("clean_text"),
        sum((col("occ") < maxOcc).cast("int")).cast("int").as("n_kept"),
        sum((col("occ") >= maxOcc).cast("int")).cast("int").as("n_dropped"))
  }
}
