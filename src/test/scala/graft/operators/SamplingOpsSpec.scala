package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class SamplingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables(spark, TestSpark.sfDir, "documents")

  test("hashSplit is disjoint, complete, roughly sized, and STABLE under repartitioning") {
    val (train, test) = SamplingOps.hashSplit(docs, "doc_id", 80, seed = 42L)
    val trainIds = train.select($"doc_id").as[Long].collect().toSet
    val testIds = test.select($"doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    assert((trainIds & testIds).isEmpty)
    assert((trainIds | testIds) == all)
    val frac = trainIds.size.toDouble / all.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")

    // The property randomSplit does NOT have: identical membership after a
    // layout change (different partitioning = different cluster shape).
    val (train2, _) = SamplingOps.hashSplit(docs.repartition(7), "doc_id", 80, 42L)
    assert(train2.select($"doc_id").as[Long].collect().toSet == trainIds)
  }

  test("hashSample is deterministic per seed and varies across seeds") {
    val a1 = SamplingOps.hashSample(docs, "doc_id", 20, 1L)
      .select($"doc_id").as[Long].collect().toSet
    val a2 = SamplingOps.hashSample(docs, "doc_id", 20, 1L)
      .select($"doc_id").as[Long].collect().toSet
    val b = SamplingOps.hashSample(docs, "doc_id", 20, 2L)
      .select($"doc_id").as[Long].collect().toSet
    assert(a1 == a2)
    assert(a1 != b)
  }

  test("stratifiedFixedN returns exactly n per stratum, deterministically") {
    val n = 5
    val sampled = SamplingOps.stratifiedFixedN(docs, "lang", "doc_id", n, seed = 7L)
    val counts = sampled.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val strata = docs.select($"lang").distinct().as[String].collect()
    assert(counts.keySet == strata.toSet)
    assert(counts.values.forall(_ == n.toLong), counts)
    val again = SamplingOps.stratifiedFixedN(docs.repartition(5), "lang", "doc_id", n, 7L)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == sampled.select($"doc_id").as[Long].collect().toSet)
  }
}
