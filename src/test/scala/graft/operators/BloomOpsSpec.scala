package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom join is exact — identical to the plain join") {
    val orders = Tables(spark, TestSpark.sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val dim = Tables(spark, TestSpark.sfDir, "customer")
      .filter($"c_acctbal" > 9000).select($"c_custkey", $"c_acctbal")
    val plain = orders.join(dim, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val bloom = BloomOps.bloomJoin(orders, "o_custkey", dim, "c_custkey", 10000L)
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    assert(bloom == plain)
  }

  test("no false negatives, and the prefilter actually reduces the fact side") {
    val orders = Tables(spark, TestSpark.sfDir, "orders")
    val dim = Tables(spark, TestSpark.sfDir, "customer")
      .filter($"c_acctbal" > 9000).select($"c_custkey")
    val kept = BloomOps.bloomSemiFilter(orders, "o_custkey", dim, "c_custkey", 10000L)
    val matching = orders.join(dim, $"o_custkey" === $"c_custkey", "left_semi")
    // Every true match survives the prefilter...
    assert(matching.join(kept.select($"o_orderkey"), Seq("o_orderkey"), "left_anti")
      .count() == 0L)
    // ...and the prefiltered fact is much closer to the matches than to the
    // full table (fpp=1% ⇒ kept ≈ matches + 1% of the rest).
    val (total, keptN, matchN) = (orders.count(), kept.count(), matching.count())
    assert(keptN < matchN + (total - matchN) / 10,
      s"prefilter too weak: kept=$keptN match=$matchN total=$total")
  }

  test("string keys: no false negatives (the cast-to-long revision dropped every row)") {
    // c_mktsegment is a genuine string key: the old probe hashed
    // cast(key as long) = NULL, built an empty filter, and silently
    // dropped ALL fact rows. The raw-typed hash must keep every match.
    val fact = Tables(spark, TestSpark.sfDir, "customer")
      .select($"c_custkey", $"c_mktsegment")
    val dim = fact.select($"c_mktsegment".as("seg")).distinct().limit(2)
    val plain = fact.join(dim, $"c_mktsegment" === $"seg", "left_semi")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val kept = BloomOps.bloomSemiFilter(fact, "c_mktsegment", dim, "seg", 100L)
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    assert(plain.nonEmpty, "fixture should produce matches")
    assert(plain.subsetOf(kept), s"false negatives: ${(plain -- kept).size} matches dropped")
  }

  test("mixed int/long key types hash on the join's common type — still exact") {
    // xxhash64(5: int) != xxhash64(5L); both sides must be coerced to the
    // join's wider type before hashing or true matches vanish.
    val fact = spark.range(0, 1000).select($"id".cast("int").as("k"), $"id".as("v"))
    val dim = spark.range(0, 1000, 7).select($"id".as("dk")) // long keys
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
      .select($"v").collect().map(_.getLong(0)).toSet
    val kept = BloomOps.bloomSemiFilter(fact, "k", dim, "dk", 200L)
      .select($"v").collect().map(_.getLong(0)).toSet
    assert(plain.nonEmpty && plain.subsetOf(kept),
      s"false negatives across types: ${(plain -- kept).size} dropped")
  }

  test("string-vs-numeric keys hash on the join's COMPARISON type — still exact") {
    // findWiderTypeForTwo(string, double) widens to STRING, but the
    // analyzed join coerces the comparison to DOUBLE (`k = cast(dk as
    // double)`): fact 5.0d matches dim '5' in the exact join but "5.0" vs
    // "5" never hash-match — the false-negative path the round-6 revision
    // had. The filter must read the type off the analyzed join.
    val fact = spark.range(0, 100).select($"id".cast("double").as("k"), $"id".as("v"))
    val dim = spark.range(0, 100, 9).select($"id".cast("string").as("dk"))
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
      .select($"v").collect().map(_.getLong(0)).toSet
    val kept = BloomOps.bloomSemiFilter(fact, "k", dim, "dk", 20L)
      .select($"v").collect().map(_.getLong(0)).toSet
    assert(plain.nonEmpty, "the exact join should match across the coercion")
    assert(plain.subsetOf(kept),
      s"false negatives across string-vs-numeric: ${(plain -- kept).size} dropped")
  }

  test("NULL keys follow SQL join semantics: never match, never pollute the filter") {
    val fact = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("z")))
      .toDF("id", "k")
    val dim = Seq(Some("a"), None, Some("c")).toDF("dk")
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
      .select($"id").collect().map(_.getLong(0)).toSet
    val kept = BloomOps.bloomSemiFilter(fact, "k", dim, "dk", 10L)
      .select($"id").collect().map(_.getLong(0)).toSet
    // Exactness on matches, and — the contract the scaladoc states — the
    // NULL fact row (id=3) must NOT survive via the null-hashes-as-seed path.
    assert(plain.subsetOf(kept))
    assert(!kept.contains(3L), "NULL fact key matched a NULL dim key")
  }

  test("incompatible key types are rejected loudly, not silently empty") {
    val fact = Seq((1L, Array[Byte](1, 2))).toDF("id", "k")
    val dim = Seq(Tuple1(java.sql.Date.valueOf("2024-01-01"))).toDF("dk")
    val e = intercept[IllegalArgumentException] {
      BloomOps.bloomSemiFilter(fact, "k", dim, "dk", 10L)
    }
    assert(e.getMessage.contains("not joinable"))
  }

  test("native probe keeps the fact scan inside whole-stage codegen") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.execution.{FilterExec, WholeStageCodegenExec}
    // The round-4 probe was a Scala UDF — the filter evaluated row-by-row
    // through the interpreter and BROKE the scan's codegen span. The native
    // BloomFilterMightContain predicate must sit inside a
    // WholeStageCodegenExec subtree (same shape Spark's own
    // InjectRuntimeFilter produces).
    val orders = Tables(spark, TestSpark.sfDir, "orders")
    val dim = Tables(spark, TestSpark.sfDir, "customer")
      .filter($"c_acctbal" > 9000).select($"c_custkey")
    val kept = BloomOps.bloomSemiFilter(orders, "o_custkey", dim, "c_custkey", 10000L)
    kept.collect() // AQE finalizes codegen spans only after execution
    val exec = kept.queryExecution.executedPlan
    val probeInCodegen = exec.collect {
      case w: WholeStageCodegenExec => w.collect {
        case f: FilterExec if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
      }
    }.flatten
    assert(probeInCodegen.nonEmpty, s"bloom probe not codegen'd:\n$exec")
  }
}
