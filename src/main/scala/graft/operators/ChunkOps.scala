package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Overlapping token-window chunking (SURVEY §2.3 E102) — cut each
  * document into fixed-size token windows advancing by a stride, the
  * context-window preparation step every retrieval / embedding / training
  * pipeline runs between curation and encoding (a document longer than
  * the model context must become several examples, and the overlap keeps
  * boundary-straddling content inside at least one window).
  *
  * Window rule (the standard tokenizer-overflow construction): a document
  * of `n` tokens yields `1 + ceil((n - chunk) / stride)` windows (just 1
  * when `n ≤ chunk`), starting at `0, stride, 2·stride, …`; the last
  * window may run short (truncated at the document end), and no window
  * starts beyond the first one that reaches the end — a further start
  * would emit a tail window fully contained in its predecessor, a
  * duplicate by construction. Empty documents yield no windows.
  *
  * Scale shape: NARROW end to end — tokenize, per-row window count,
  * `posexplode` over the start sequence, `slice` + `array_join`. No
  * shuffle, no state, whole-stage-codegen'd; output size is input tokens
  * × (chunk/stride) by construction, the fan-out the caller chose. This
  * composes with any upstream (dedup, gates) without adding an exchange.
  */
object ChunkOps {

  /** Explode `df` into (idCol, chunk_id, start_tok, n_tok, chunk_text)
    * windows of `chunkTokens` whitespace tokens advancing by
    * `strideTokens` (overlap = chunk − stride). */
  def chunkByTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int,
      strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"strideTokens must be in 1..chunkTokens ($chunkTokens): $strideTokens " +
        "(a stride above the window would silently skip tokens between windows)")
    val toks = tokens(col(textCol))
    val n = size(toks).cast("long")
    // Integer form of 1 + ceil((n - chunk)/stride); n > chunk in this
    // branch. Spark's `/` is fractional division, so floor+cast restores
    // the integer quotient (operands are positive and far below 2^53, so
    // the double round-trip is exact).
    val nChunks = when(n <= chunkTokens, lit(1L))
      .otherwise(
        floor((n - chunkTokens + strideTokens - 1) / strideTokens).cast("long") + 1L)
    df.select(col(idCol), toks.as("_graft_toks"), nChunks.as("_graft_m"))
      .filter(col("_graft_m") > 0 && size(col("_graft_toks")) > 0)
      .select(col(idCol),
        posexplode(sequence(lit(0L), (col("_graft_m") - 1L) * strideTokens,
          lit(strideTokens.toLong))).as(Seq("chunk_id", "start_tok")),
        col("_graft_toks"))
      .select(col(idCol), col("chunk_id"),
        col("start_tok").cast("int").as("start_tok"),
        slice(col("_graft_toks"), col("start_tok").cast("int") + 1,
          lit(chunkTokens)).as("_graft_w"))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("_graft_w")).as("n_tok"),
        array_join(col("_graft_w"), " ").as("chunk_text"))
  }
}
