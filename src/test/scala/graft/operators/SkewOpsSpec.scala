package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted two-phase aggregation equals direct aggregation") {
    val li = Tables(spark, TestSpark.sfDir, "lineitem")
    val direct = li.groupBy($"l_returnflag")
      .agg(
        round(sum($"l_quantity"), 2).as("sq"),
        count(lit(1)).as("n"),
        min($"l_orderkey").as("mn"),
        max($"l_orderkey").as("mx"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    val salted = SkewOps.saltedAgg(
      li, Seq($"l_returnflag"), nSalts = 8,
      Seq(
        SkewOps.sumOf($"l_quantity", "sq"),
        SkewOps.countOf("n"),
        SkewOps.minOf($"l_orderkey", "mn"),
        SkewOps.maxOf($"l_orderkey", "mx")))
      .select($"l_returnflag", round($"sq", 2).as("sq"), $"n", $"mn", $"mx")
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    assert(salted == direct)
  }

  test("salted avg equals direct avg (sum/count decomposition, not avg-of-avgs)") {
    // Unequal salt-bucket sizes are the trap: averaging per-bucket averages
    // would be wrong. The (sum, count) partial decomposition is exact.
    val li = Tables(spark, TestSpark.sfDir, "lineitem")
    val direct = li.groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity") / count(lit(1)), 6).as("a"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = SkewOps.saltedAgg(li, Seq($"l_returnflag"), nSalts = 8,
      Seq(SkewOps.avgOf($"l_quantity", "a")))
      .select($"l_returnflag", round($"a", 6).as("a"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(salted == direct)
  }

  test("saltedJoin equals a plain inner join and scatters the hot key") {
    // One hot key carrying 10k rows + a cool key: the salted join must
    // return exactly the plain join's rows.
    val fact = ((1 to 10000).map(i => ("hot", i)) ++ Seq(("cool", -1)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("cool", "C"), ("unmatched", "U")).toDF("k", "label")
    val salted = SkewOps.saltedJoin(fact, dim, "k", 16)
    val direct = fact.join(dim, Seq("k"))
    assert(salted.columns.toSeq == direct.columns.toSeq)
    assert(salted.count() == 10001L)
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // The join key is (k, salt): the hot key's rows hash to many composite
    // keys instead of one.
    val scatter = fact.withColumn("_graft_salt",
      pmod(hash(fact.columns.map(col): _*), lit(16)))
      .filter($"k" === "hot").select($"_graft_salt").distinct().count()
    assert(scatter > 1, "hot key not scattered")
    // Pinned to the shuffle path: a broadcast would silently discard the
    // scatter.
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("saltFrom subset salt gives identical results and still scatters") {
    // Salting from (key + one cheap varying column) must change nothing
    // about the RESULT — only which salt bucket a row lands in. The subset
    // is two narrow columns instead of the full row width.
    val li = Tables(spark, TestSpark.sfDir, "lineitem")
    val cheap = Seq($"l_orderkey", $"l_linenumber")
    val direct = li.groupBy($"l_returnflag")
      .agg(round(sum($"l_quantity"), 2).as("sq"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = SkewOps.saltedAgg(li, Seq($"l_returnflag"), nSalts = 8,
      Seq(SkewOps.sumOf($"l_quantity", "sq"), SkewOps.countOf("n")),
      saltFrom = cheap)
      .select($"l_returnflag", round($"sq", 2).as("sq"), $"n")
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == direct)
    // The subset still varies within a hot key, so the spread survives.
    val scatter = li.withColumn("_graft_salt", pmod(hash(cheap: _*), lit(8)))
      .filter($"l_returnflag" === "A")
      .select($"_graft_salt").distinct().count()
    assert(scatter > 1, "subset salt failed to scatter the hot key")

    val dim = li.select($"l_returnflag").distinct()
      .withColumn("label", concat(lit("f_"), $"l_returnflag"))
    val j = SkewOps.saltedJoin(li.select($"l_returnflag", $"l_orderkey", $"l_linenumber"),
      dim, "l_returnflag", 8, saltFrom = cheap)
    val jd = li.select($"l_returnflag", $"l_orderkey", $"l_linenumber").join(dim, Seq("l_returnflag"))
    assert(j.count() == jd.count())
    assert(j.exceptAll(jd).isEmpty && jd.exceptAll(j).isEmpty)
  }

  test("salted plan spreads a key over multiple pre-aggregation groups") {
    // A single hot key: every row the same group. Direct agg funnels into
    // one reducer; the salted phase-1 must produce multiple partials.
    val hot = (1 to 10000).map(i => ("hot", i.toDouble)).toDF("k", "v")
    val phase1Groups = hot
      .withColumn("_graft_salt", pmod(hash(col("k"), col("v")), lit(8)))
      .groupBy($"k", $"_graft_salt").count().count()
    assert(phase1Groups > 1, "salt failed to spread the hot key")
    val result = SkewOps.saltedAgg(hot, Seq($"k"), 8,
      Seq(SkewOps.sumOf($"v", "sv"), SkewOps.countOf("n")))
    val row = result.collect().head
    assert(row.getAs[Double]("sv") == (1 to 10000).map(_.toDouble).sum)
    assert(row.getAs[Long]("n") == 10000L)
  }
}
