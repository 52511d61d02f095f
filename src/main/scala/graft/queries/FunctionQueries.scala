package graft.queries

import graft.Tables
import graft.functions.WeightedAvg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UDF/UDAF/UDTF surface (SURVEY §2.3 E33-E35).
  *
  * Note the preference order from SURVEY §7.2: everything hot stays native
  * (`functions._` / higher-order functions); a Scala UDF appears here only
  * to declare the registration surface itself, on a bounded query.
  */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E33 scalar UDF registration surface: whitespace token counter.
    // (Deliberately also computable natively — the oracle checks the UDF.)
    "q70_scalar_udf" -> ((s, dir) => {
      val tokCount = udf((text: String) =>
        if (text == null) 0 else text.split(" ").count(_.nonEmpty))
      s.udf.register("graft_tok_count", tokCount)
      t(s, dir, "documents").select(
        col("doc_id"),
        tokCount(col("text")).as("n_tokens_udf"))
    }),

    // E34 typed Aggregator UDAF: quantity-weighted average net price per
    // return flag.
    "q71_weighted_avg_udaf" -> ((s, dir) => {
      val wavg = udaf(WeightedAvg)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"))
    }),

    // E35 UDTF surface: generator via explode of a UDF-produced array
    // (each doc expands to its token-length histogram buckets).
    "q72_udtf_explode" -> ((s, dir) => {
      val lenBuckets = udf((text: String) =>
        if (text == null) Array.empty[Int]
        else text.split(" ").filter(_.nonEmpty).map(t => math.min(t.length, 9)).distinct.sorted)
      t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(lenBuckets(col("text"))).as("len_bucket"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q70_scalar_udf" ->
      """SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_tokens_udf
         FROM documents""",
    // Weighted avg = Σ(p·q)/Σ(q); ratio of sums is an arbitrary real, so
    // 4 dp rounding is boundary-safe.
    "q71_weighted_avg_udaf" ->
      """SELECT l_returnflag,
         round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
         FROM lineitem GROUP BY l_returnflag""",
    "q72_udtf_explode" ->
      """SELECT doc_id, unnest(list_sort(list_distinct(
           list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                          t -> CAST(least(length(t), 9) AS INT))))) AS len_bucket
         FROM documents WHERE doc_id < 100"""
  )
}
