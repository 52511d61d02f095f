package graft.plans

import graft.{Tables, TestSpark}
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions: after registration, every
  * custom Catalyst expression is reachable from `spark.sql` and returns
  * bit-identical results to the Column API. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  test("graft_* text functions via spark.sql match the Column API") {
    Tables(spark, TestSpark.sfDir, "documents").createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      """SELECT doc_id,
              graft_charhash(text) AS fp,
              graft_simhash(text, 2) AS sh,
              graft_minhash(text, 8, 3) AS mh,
              graft_shingles(text, 2) AS bi
         FROM docs_ext""")
      .select($"doc_id", $"fp", $"sh", concat_ws(",", $"mh".cast("array<string>")).as("mh"),
        size($"bi").as("nbi"))
      .as[(Long, Long, Long, String, Int)].collect().toMap2
    val viaApi = Tables(spark, TestSpark.sfDir, "documents")
      .select($"doc_id",
        TextFunctions.charHash($"text").as("fp"),
        TextFunctions.simhashShingle30($"text", 2).as("sh"),
        concat_ws(",", TextFunctions.minhashShingleSignature($"text", 8, 3).cast("array<string>")).as("mh"),
        size(TextFunctions.shingles($"text", 2)).as("nbi"))
      .as[(Long, Long, Long, String, Int)].collect().toMap2
    assert(viaSql == viaApi)
  }

  test("graft_*_cp codepoint-tier functions via spark.sql match the Column API") {
    Seq((1L, "déjà vu　ascii"), (2L, "😀 emoji text"), (3L, "plain"))
      .toDF("doc_id", "text").createOrReplaceTempView("docs_ext_cp")
    val viaSql = spark.sql(
      """SELECT doc_id,
              graft_charhash_cp(text) AS fp,
              size(graft_tokens_cp(text)) AS nt,
              concat_ws(',', CAST(graft_minhash_cp(text, 4, 2) AS array<string>)) AS mh,
              graft_simhash60_cp(text, 2) AS sh
         FROM docs_ext_cp""")
      .as[(Long, Long, Int, String, Long)].collect().toMap2
    val viaApi = spark.table("docs_ext_cp")
      .select($"doc_id",
        TextFunctions.charHashCp($"text").as("fp"),
        size(TextFunctions.tokensCp($"text")).as("nt"),
        concat_ws(",", TextFunctions.minhashShingleSignatureCp($"text", 4, 2)
          .cast("array<string>")).as("mh"),
        TextFunctions.simhashShingle60Cp($"text", 2).as("sh"))
      .as[(Long, Long, Int, String, Long)].collect().toMap2
    assert(viaSql == viaApi)
  }

  test("graft_* vector functions via spark.sql match the Column API") {
    Tables(spark, TestSpark.sfDir, "embeddings").createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT e1.vec_id,
              round(graft_cosine(e1.embedding, e2.embedding), 6) AS cos,
              round(graft_l2(e1.embedding, e2.embedding), 6) AS l2,
              graft_srp_bucket(e1.embedding, 8) AS bucket,
              graft_srp_band(e1.embedding, 10, 10) AS band
         FROM emb_ext e1 JOIN emb_ext e2 ON e2.vec_id = e1.vec_id + 1
         WHERE e1.vec_id < 20""")
      .as[(Long, Double, Double, Long, Long)].collect().sortBy(_._1).toSeq
    val e = Tables(spark, TestSpark.sfDir, "embeddings")
    val viaApi = e.alias("a")
      .join(e.alias("b"), expr("b.vec_id = a.vec_id + 1"))
      .filter($"a.vec_id" < 20)
      .select($"a.vec_id",
        VectorFunctions.cosine($"a.embedding", $"b.embedding").as("cos"),
        VectorFunctions.l2Distance($"a.embedding", $"b.embedding").as("l2"),
        VectorFunctions.srpBucket($"a.embedding", 8).as("bucket"),
        VectorFunctions.srpBand($"a.embedding", 10, 10).as("band"))
      .as[(Long, Double, Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaSql == viaApi)
    // The offset form really is the sliced-signature band: band 1 of a
    // 4x10 construction equals bits 10..19 of the 20-bit bucket.
    val sliced = spark.sql(
      """SELECT count(*) FROM emb_ext
         WHERE graft_srp_band(embedding, 10, 10)
               != CAST(shiftright(graft_srp_bucket(embedding, 20), 10) & 1023 AS BIGINT)""")
      .head().getLong(0)
    assert(sliced == 0L, "plane-offset band diverged from the sliced signature")
  }

  test("argument validation fails at analysis, not at runtime") {
    Tables(spark, TestSpark.sfDir, "documents").createOrReplaceTempView("docs_ext2")
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_minhash(text, 8) FROM docs_ext2").collect())
    assert(e1.getMessage.contains("3 arguments"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_simhash(text, doc_id) FROM docs_ext2").collect())
    assert(e2.getMessage.contains("INT literal"), e2.getMessage)
  }

  test("the config-driven extensions class applies without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  private implicit class MapOps[A, B, C, D, E](rows: Array[(A, B, C, D, E)]) {
    def toMap2: Map[A, (B, C, D, E)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("graft_token_counts / graft_shingle_counts via spark.sql match the Column API") {
    Tables(spark, TestSpark.sfDir, "documents").createOrReplaceTempView("docs_ext_tc")
    val viaSql = spark.sql(
      """SELECT doc_id,
              graft_token_counts(text).dl AS dl,
              size(map_keys(graft_token_counts(text).counts)) AS nuniq,
              element_at(graft_token_counts(text).counts,
                         element_at(graft_tokens_cp(text), 1)) AS c1,
              size(map_keys(graft_shingle_counts(text, 2))) AS nbi
         FROM docs_ext_tc""")
      .as[(Long, Int, Int, Option[Long], Int)].collect().sortBy(_._1).toSeq
    val viaApi = Tables(spark, TestSpark.sfDir, "documents")
      .select($"doc_id",
        TextFunctions.tokenCounts($"text").getField("dl").as("dl"),
        size(map_keys(TextFunctions.tokenCounts($"text").getField("counts"))).as("nuniq"),
        element_at(TextFunctions.tokenCounts($"text").getField("counts"),
          element_at(TextFunctions.tokensCp($"text"), 1)).as("c1"),
        size(map_keys(TextFunctions.shingleCounts($"text", 2))).as("nbi"))
      .as[(Long, Int, Int, Option[Long], Int)].collect().sortBy(_._1).toSeq
    assert(viaSql == viaApi)
  }

  test("graft_token_set_count via spark.sql matches the Column API") {
    Tables(spark, TestSpark.sfDir, "documents").createOrReplaceTempView("docs_ext_tsc")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_token_set_count(text, 'the,and,of,to,a') AS c FROM docs_ext_tsc")
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val viaApi = Tables(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", TextFunctions.langMarkerCount($"text", "en").as("c"))
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(viaSql == viaApi)
  }
}
