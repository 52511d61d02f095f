package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E139/E140 product quantization: subvector slicing round-trips, the
  * per-subspace codebooks follow the family's deterministic Lloyd
  * contract, every encoding is the true arg-min of its subspace
  * codebook, and ADC scores equal the locally-recomputed sum of squared
  * 6-dp subspace distances — the whole chain a pure function of the
  * data (the q156/q157 oracle claim). */
class PqOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 6 deterministic dim-8 vectors with two obvious subspace clusters. */
  private def vecs = Seq(
    (0L, Array(0.0, 0.0, 0.0, 0.0, 9.0, 9.0, 9.0, 9.0)),
    (1L, Array(0.1, 0.0, 0.1, 0.0, 9.1, 9.0, 9.1, 9.0)),
    (2L, Array(5.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 1.0)),
    (3L, Array(5.1, 5.0, 5.1, 5.0, 1.1, 1.0, 1.1, 1.0)),
    (4L, Array(0.2, 0.1, 0.2, 0.1, 1.2, 1.1, 1.2, 1.1)),
    (5L, Array(5.2, 5.1, 5.2, 5.1, 9.2, 9.1, 9.2, 9.1)))
    .toDF("id", "v")

  private def l2r6(a: Seq[Double], b: Seq[Double]): Double =
    BigDecimal(math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("subvectors slice contiguously and reassemble the vector") {
    val got = PqOps.subvectors(vecs, "v", "id", m = 2)
      .as[(Long, Int, Seq[Double])].collect()
    assert(got.length == 12)
    val byId = got.groupBy(_._1)
    val orig = vecs.as[(Long, Seq[Double])].collect().toMap
    byId.foreach { case (id, rows) =>
      val back = rows.sortBy(_._2).flatMap(_._3).toSeq
      assert(back == orig(id), s"id $id did not round-trip")
      assert(rows.forall(_._3.size == 4))
    }
  }

  test("encode is the true per-subspace arg-min with the 6-dp tie rule") {
    val model = PqOps.fitPq(vecs, "v", "id", m = 2, kCodes = 2, iters = 2)
    assert(model.subDim == 4)
    val books = model.codebooks
      .as[(Int, Int, Seq[Double])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(books.keySet == Set(0, 1) && books.values.forall(_.size == 2))
    val got = PqOps.encode(vecs, "v", "id", model)
      .as[(Long, Int, Int, Double)].collect()
    assert(got.length == 12)
    val subv = PqOps.subvectors(vecs, "v", "id", m = 2)
      .as[(Long, Int, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (id, sub, code, dist) =>
      val dists = books(sub).map(c => l2r6(subv((id, sub)), c))
      // Arg-min with ties to the smaller code, dist the 6-dp minimum.
      val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }
      assert(code == best._2 && dist == best._1,
        s"id=$id sub=$sub: got ($code, $dist), want $best of ${dists.toSeq}")
    }
  }

  test("adc scores are the locally-recomputed sum of squared subspace lookups") {
    val model = PqOps.fitPq(vecs, "v", "id", m = 2, kCodes = 2, iters = 1)
    val codes = PqOps.encode(vecs, "v", "id", model)
    val queries = vecs.filter(col("id") < 2)
      .select(col("id").as("qid"), col("v"))
    val got = PqOps.adcSearch(codes, "id", queries, "qid", "v", model, topN = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(got.length == 6, s"2 queries x top-3: ${got.toSeq}")
    val books = model.codebooks
      .as[(Int, Int, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val subv = PqOps.subvectors(vecs, "v", "id", m = 2)
      .as[(Long, Int, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val codeOf = codes.as[(Long, Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def adc(qid: Long, cand: Long): Double = {
      val s = (0 until 2).map { sub =>
        val d = l2r6(subv((qid, sub)), books((sub, codeOf((cand, sub)))))
        d * d
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // Every returned row matches the local ADC; ranks follow
    // (adc asc, id asc) within each query over ALL candidates.
    val all = vecs.as[(Long, Seq[Double])].collect().map(_._1)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val expect = all.map(c => (adc(qid, c), c)).sortBy(identity).take(3)
      val gotRows = rows.sortBy(_._2).map(r => (r._4, r._3)).toSeq
      assert(gotRows == expect.toSeq, s"query $qid: $gotRows vs ${expect.toSeq}")
    }
  }

  test("ivfAdc restricts candidates to the probed coarse cell, scores match local ADC") {
    val coarse = KmeansOps.fit(vecs, "v", "id", k = 2, iters = 2)
    val cellMap = coarse.assignments
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toMap
    val model = PqOps.fitPq(vecs, "v", "id", m = 2, kCodes = 2, iters = 1)
    val codes = PqOps.encode(vecs, "v", "id", model)
    val queries = vecs.filter(col("id") < 2).select(col("id").as("qid"), col("v"))
    val got = PqOps.ivfAdcSearch(codes,
        coarse.assignments.select(col("id"), col("cluster")),
        "id", queries, "qid", "v", model, coarse.centroids, topN = 6)
      .as[(Long, Int, Long, Double)].collect()
    val books = model.codebooks.as[(Int, Int, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val subv = PqOps.subvectors(vecs, "v", "id", m = 2)
      .as[(Long, Int, Seq[Double])].collect().map(r => (r._1, r._2) -> r._3).toMap
    val codeOf = codes.as[(Long, Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def adc(qid: Long, cand: Long): Double = {
      val s = (0 until 2).map { sub =>
        val d = l2r6(subv((qid, sub)), books((sub, codeOf((cand, sub)))))
        d * d
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val all = vecs.as[(Long, Seq[Double])].collect().map(_._1)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      // A corpus-drawn query probes exactly its own cell (identical
      // arg-min rule), so expected = same-cell candidates, ADC-ranked.
      val expect = all.filter(c => cellMap(c) == cellMap(qid))
        .map(c => (adc(qid, c), c)).sortBy(identity).take(6)
      assert(rows.sortBy(_._2).map(r => (r._4, r._3)).toSeq == expect.toSeq,
        s"query $qid")
      assert(rows.forall(r => cellMap(r._3) == cellMap(qid)),
        s"query $qid met a candidate outside its probed cell")
    }
  }

  test("encode against a mismatched-dim model fails loudly, never silently truncates") {
    val model = PqOps.fitPq(vecs, "v", "id", m = 2, kCodes = 2, iters = 0)
    val wrong = Seq((9L, Array.fill(10)(1.0))).toDF("id", "v")
    val e = intercept[Exception](
      PqOps.encode(wrong, "v", "id", model).collect())
    assert(e.getMessage != null && e.getMessage.contains("dim must be 8"),
      s"expected the per-row dim guard, got: ${e.getMessage}")
  }

  test("dim must split evenly across subspaces; bad params refuse loudly") {
    val ragged = Seq((0L, Array(1.0, 2.0, 3.0))).toDF("id", "v")
    intercept[IllegalArgumentException](
      PqOps.fitPq(ragged, "v", "id", m = 2, kCodes = 1, iters = 0))
    intercept[IllegalArgumentException](
      PqOps.fitPq(vecs, "v", "id", m = 2, kCodes = 0, iters = 1))
    intercept[IllegalArgumentException](
      PqOps.adcSearch(vecs, "id", vecs, "id", "v",
        PqOps.PqModel(vecs, 2, 2, 4), topN = 0))
  }
}
