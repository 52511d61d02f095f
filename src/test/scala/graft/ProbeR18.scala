package graft

import org.apache.spark.sql.functions._

/** TEMPORARY optimization-round phase probe, TEST-scoped (round 18: the
  * round-17 twin lived in src/main and the verdict evicted it — probes
  * are measurement tooling, not the engine). Same-JVM interleaved A/B
  * timings for the round's rewrites plus the jobs/stages counter.
  *
  * Usage: Test/runMain graft.ProbeR18 <sfDir> <probe> [rounds]
  *   jobs:<name>  exact declared-query name (loud failure lists
  *                candidates — the round-17 prefix match resolved q16
  *                to an arbitrary q16x)
  *   bands        bandedMinhash banding projection: fused MinhashBandsExpr
  *                vs the former filter+sig+HOF-fold composition
  *   sim          simhash banding projection: fused guard vs filter+sig
  *   pct          q39 percentile aggregation: array-form vs 3 scalar aggs
  *   srp          SRP near-dup pairs: score-before-distinct (round 17)
  *                vs vectors-through-distinct (pre-17) — the decade probe
  *                the round-17 verdict asked for (run at /tmp/gsf10)
  *   stars        star-contraction components over SRP pairs (q105 shape)
  */
object ProbeR18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "bands"
    val rounds = if (args.length > 2) args(2).toInt else 2
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    import graft.functions.TextFunctions._
    import graft.operators._
    (1 to rounds).foreach { rnd =>
      println(s"=== round $rnd ($which) ===")
      which match {
        case q if q.startsWith("jobs:") =>
          val name = q.stripPrefix("jobs:")
          val fn = SparkEntry.queries.getOrElse(name,
            throw new IllegalArgumentException(
              s"no declared query '$name'; candidates: " +
                SparkEntry.queries.keys.filter(_.startsWith(name)).toSeq.sorted
                  .mkString(", ")))
          val jobs = new java.util.concurrent.atomic.AtomicInteger
          val stages = new java.util.concurrent.atomic.AtomicInteger
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
              if (rnd == rounds) {
                val names = j.stageInfos.map(si =>
                  si.details.linesIterator
                    .find(l => l.contains("graft") && !l.contains("Probe"))
                    .getOrElse(si.name).trim.take(90)).mkString(" | ")
                println(f"  job ${j.jobId}%3d stages=${j.stageInfos.size} $names")
              }
            }
          }
          spark.sparkContext.addSparkListener(listener)
          timed(s"$name total")(noop(fn(spark, dir)))
          spark.sparkContext.removeSparkListener(listener)
          println(s"[$name] jobs=${jobs.get} stages=${stages.get}")
        case "bands" =>
          val docs = Tables.parallel(spark.read.parquet(s"$dir/documents.parquet"))
          noop(docs)
          timed("OLD filter+sig+HOF-fold")(noop(docs
            .filter(tokenCount(col("text")) >= 3)
            .select(col("doc_id"), posexplode(lshBandHashes(
              minhashShingleSignature(col("text"), 16, 3), 4, 4)).as(Seq("b", "bh")))))
          timed("NEW fused MinhashBandsExpr")(noop(docs
            .select(col("doc_id"), posexplode(
              minhashBandHashes(col("text"), 16, 3, 4, 4)).as(Seq("b", "bh")))))
          val banded = timed("bandedMinhash full (new)")(LshOps.bandedMinhash(
            docs, "text", "doc_id", 16, 3, 4, 4, 10000))
          banded.unpersist()
        case "sim" =>
          val docs = Tables.parallel(spark.read.parquet(s"$dir/documents.parquet"))
          noop(docs)
          val bb = SimhashOps.BandBits
          val nb = SimhashOps.NBands
          val mask = (1L << bb) - 1
          timed("OLD filter+sig+posexplode")(noop(docs
            .filter(tokenCount(col("text")) >= 2)
            .select(col("doc_id"), simhashShingle60(col("text"), 2).as("sh"))
            .select(col("doc_id"), col("sh"), posexplode(array(
              (0 until nb).map(b =>
                shiftright(col("sh"), b * bb).bitwiseAND(lit(mask))): _*
            )).as(Seq("b", "bv")))))
          timed("NEW fused array expr")(noop(docs
            .select(col("doc_id"), posexplode(
              simhash60Banded(col("text"), 2, nb, bb)).as(Seq("b", "_x")))
            .select(col("doc_id"), col("_x.sh").as("sh"), col("b"), col("_x.bv").as("bv"))))
        case "pct" =>
          val li = Tables.parallel(spark.read.parquet(s"$dir/lineitem.parquet"))
          noop(li)
          timed("OLD 3 scalar percentile aggs")(noop(li
            .groupBy(col("l_returnflag"))
            .agg(
              round(percentile(col("l_extendedprice"), lit(0.25)), 4),
              round(percentile(col("l_extendedprice"), lit(0.5)), 4),
              round(percentile(col("l_extendedprice"), lit(0.75)), 4),
              round(percentile(col("l_quantity"), lit(0.9)), 4))))
          timed("NEW array-form percentile")(noop(li
            .groupBy(col("l_returnflag"))
            .agg(
              percentile(col("l_extendedprice"),
                array(lit(0.25), lit(0.5), lit(0.75))).as("_p"),
              percentile(col("l_quantity"), lit(0.9)).as("_q"))
            .select(col("l_returnflag"),
              round(element_at(col("_p"), 1), 4), round(element_at(col("_p"), 2), 4),
              round(element_at(col("_p"), 3), 4), round(col("_q"), 4))))
        case "srp" =>
          import graft.functions.VectorFunctions._
          val vecs = Tables.parallel(spark.read.parquet(s"$dir/embeddings.parquet"))
          noop(vecs)
          val banded = timed("bandedSrp")(SrpOps.bandedSrp(
            vecs, "embedding", "vec_id", nBands = 4, bitsPerBand = 15,
            maxBucket = 200))
          val a = banded.bands.select(col("b"), col("bv"),
            col("vec_id").as("vid_a"), col("embedding").as("_va"))
          val b2 = banded.bands.select(col("b"), col("bv"),
            col("vec_id").as("vid_b"), col("embedding").as("_vb"))
          timed("OLD vectors-through-distinct")(noop(
            a.join(b2, Seq("b", "bv")).filter(col("vid_a") < col("vid_b"))
              .select(col("vid_a"), col("vid_b"), col("_va"), col("_vb")).distinct()
              .select(col("vid_a"), col("vid_b"),
                cosine(col("_va"), col("_vb")).as("cos"))
              .filter(col("cos") >= 0.9)))
          timed("NEW score-before-distinct")(noop(
            SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.9)))
          banded.unpersist()
        case "ccplan" =>
          // connectedComponents sym-dedup drop (round 18): print the
          // symmetrize subtree's plan with and without the defensive
          // distinct, over q103's real candidate-pair input.
          val docs = Tables.parallel(spark.read.parquet(s"$dir/documents.parquet"))
          val banded = LshOps.bandedMinhash(
            docs, "text", "doc_id", 16, 3, 4, 4, 10000)
          val pairs = LshOps.candidatePairs(banded.bands, "doc_id")
          val symOld = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
            .filter(col("src") =!= col("dst"))
          // The shipped round-18 construction: one explode over ONE
          // computation of the pair subtree, no defensive distinct.
          val symNew = pairs.select(explode(array(
            struct(col("doc_a").as("src"), col("doc_b").as("dst")),
            struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("_e"))
            .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
            .filter(col("src") =!= col("dst"))
          timed("BEFORE union symmetrize + distinct")(noop(symOld.distinct()))
          timed("AFTER explode symmetrize (no dedup)")(noop(symNew))
          if (rnd == rounds) {
            println("=== BEFORE (union symmetrize + defensive distinct) ===")
            println(symOld.distinct().queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            println("=== AFTER (explode symmetrize, no dedup) ===")
            println(symNew.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          }
          banded.unpersist()
        case "pctx" =>
          // q39 exact-percentile alternative: grouped value-counts +
          // cumulative-rank interpolation (all Tungsten/codegen) vs the
          // builtin Percentile TypedImperativeAggregate (boxed
          // value->count OpenHashMap, one merge task per group).
          // Interpolation replicates Percentile.getPercentile exactly:
          // r = q*(n-1); lo = floor(r); hi = ceil(r);
          // v = vlo + (vhi - vlo) * (r - lo), in doubles.
          import org.apache.spark.sql.expressions.Window
          val li = Tables.parallel(spark.read.parquet(s"$dir/lineitem.parquet"))
          noop(li)
          def exactQ(df: org.apache.spark.sql.DataFrame, valCol: String,
                     qs: Seq[Double]): org.apache.spark.sql.DataFrame = {
            val vc = df.filter(col(valCol).isNotNull)
              .groupBy(col("l_returnflag"), col(valCol).cast("double").as("_v"))
              .agg(count(lit(1)).as("_c"))
            val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("_v"))
            val wAll = Window.partitionBy(col("l_returnflag"))
            vc.withColumn("_cum", sum(col("_c")).over(wCum))
              .withColumn("_n", max(col("_cum")).over(wAll))
              .select(col("l_returnflag"), col("_v"), col("_c"), col("_cum"), col("_n"),
                explode(array(qs.map(lit(_)): _*)).as("_q"))
              .withColumn("_r", col("_q") * (col("_n") - lit(1)).cast("double"))
              .withColumn("_lo", floor(col("_r")))
              .withColumn("_hi", ceil(col("_r")))
              .filter(col("_cum") > col("_lo") &&
                (col("_cum") - col("_c")) <= col("_hi"))
              .groupBy(col("l_returnflag"), col("_q"))
              .agg(
                min(when(col("_cum") > col("_lo") &&
                  (col("_cum") - col("_c")) <= col("_lo"), col("_v"))).as("_vlo"),
                min(when(col("_cum") > col("_hi") &&
                  (col("_cum") - col("_c")) <= col("_hi"), col("_v"))).as("_vhi"),
                first(col("_r")).as("_rr"), first(col("_lo")).as("_flo"),
                first(col("_hi")).as("_fhi"))
              .select(col("l_returnflag"), col("_q"),
                when(col("_fhi") === col("_flo"), col("_vlo"))
                  .otherwise((col("_fhi") - col("_rr")) * col("_vlo") +
                    (col("_rr") - col("_flo")) * col("_vhi")).as("_val"))
          }
          val oldForm = li
            .groupBy(col("l_returnflag"))
            .agg(
              percentile(col("l_extendedprice"),
                array(lit(0.25), lit(0.5), lit(0.75))).as("_p"),
              percentile(col("l_quantity"), lit(0.9)).as("_q90"))
          timed("OLD builtin percentile (array-form)")(noop(oldForm))
          val price = exactQ(li, "l_extendedprice", Seq(0.25, 0.5, 0.75))
          val qty = exactQ(li, "l_quantity", Seq(0.9))
          timed("NEW counts+cum-rank interpolation")(noop(price.unionAll(qty)))
          if (rnd == rounds) {
            val o = oldForm.collect().map(r => r.getString(0) ->
              ((r.getSeq[Double](1), r.getDouble(2)))).toMap
            val np = price.collect().groupBy(_.getString(0))
            val nq = qty.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
            val ok = o.forall { case (f, (ps, q90)) =>
              val mine = np(f).sortBy(_.getDouble(1)).map(_.getDouble(2)).toSeq
              val same = mine == ps && nq(f) == q90
              if (!same) println(s"  MISMATCH $f: old=($ps, $q90) new=($mine, ${nq(f)})")
              same
            }
            println(s"  bit-equal across flags: $ok")
          }
        case "lm" =>
          // q132 body inline (no terminal checkpoint) — print the FINAL
          // AQE plan to see which join strategies actually fired.
          val docs = Tables.parallel(spark.read.parquet(s"$dir/documents.parquet"))
          noop(docs)
          val docBigrams = docs
            .select(col("doc_id"), explode(shingles(col("text"), 2)).as("bigram"))
            .persist()
          docBigrams.count()
          val bigramCounts = docBigrams.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
          val unigramCounts = docs
            .select(explode(tokenCounts(col("text")).getField("counts")))
            .groupBy(col("key")).agg(sum(col("value")).as("c1"))
            .withColumnRenamed("key", "token")
            .persist()
          unigramCounts.count()
          val vocab = unigramCounts.agg(count(lit(1)).as("v"))
          val out = docBigrams
            .join(bigramCounts, "bigram")
            .withColumn("w1", split(col("bigram"), " ").getItem(0))
            .join(unigramCounts.withColumnRenamed("token", "w1"), "w1")
            .crossJoin(broadcast(vocab))
            .groupBy(col("doc_id"))
            .agg(
              count(lit(1)).as("n_bigrams"),
              round(avg(-log((col("c2") + lit(1)).cast("double") / (col("c1") + col("v")))), 4)
                .as("nll"))
          timed("q132 score frame")(noop(out))
          if (rnd == rounds) {
            println(out.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          }
          docBigrams.unpersist()
          unigramCounts.unpersist()
        case "regime" =>
          // corpusRegime one-pass rewrite (commit "Derive the LSH corpus
          // regime in one pass"): the former count() + exploded-HLL pair
          // vs the fused posexplode_outer aggregation. Prints both
          // formatted plans on the last round for plans/r18.
          val docs = Tables.parallel(spark.read.parquet(s"$dir/documents.parquet"))
          noop(docs)
          timed("OLD count + exploded-HLL (two passes)") {
            val nDocs = docs.count()
            val vocab = math.max(2L, docs
              .select(explode(array_distinct(tokens(col("text")))).as("t"))
              .agg(approx_count_distinct(col("t"), 0.05)).head().getLong(0))
            println(s"  old regime = ($nDocs, $vocab)")
          }
          timed("NEW fused posexplode_outer (one pass)") {
            val r = LshOps.corpusRegime(docs, "text")
            println(s"  new regime = $r")
          }
          if (rnd == rounds) {
            val oldAgg = docs
              .select(explode(array_distinct(tokens(col("text")))).as("t"))
              .agg(approx_count_distinct(col("t"), 0.05))
            val newAgg = docs
              .select(posexplode_outer(array_distinct(tokens(col("text"))))
                .as(Seq("_graft_p", "_graft_t")))
              .agg(
                sum(when(col("_graft_p") === 0 || col("_graft_p").isNull, 1L)
                  .otherwise(0L)).as("n_docs"),
                approx_count_distinct(col("_graft_t"), 0.05).as("vocab"))
            println("=== BEFORE (vocab pass; plus a separate count() job) ===")
            println(oldAgg.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            println("=== AFTER (single fused pass) ===")
            println(newAgg.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          }
        case "ssplan" =>
          // One star round's plan: smallStar over a materialized edge
          // frame — new explode emission vs the former two-branch union
          // (which planned the withM join twice).
          val vecs = Tables.parallel(spark.read.parquet(s"$dir/embeddings.parquet"))
          noop(vecs)
          val banded0 = SrpOps.bandedSrp(
            vecs, "embedding", "vec_id", nBands = 5, bitsPerBand = 12,
            maxBucket = 200)
          val e0 = Tables.materialize(
            SrpOps.neardupPairs(banded0.bands, "embedding", "vec_id", 0.35)
              .select(greatest(col("vid_a"), col("vid_b")).as("u"),
                least(col("vid_a"), col("vid_b")).as("v")).distinct())
          val ls = Tables.materialize(GraphOps.largeStar(e0))
          val mins0 = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
          val withM0 = ls.join(mins0, "u")
          val oldSS = withM0.select(col("u"), col("m").as("v"))
            .union(withM0.filter(col("v") =!= col("m"))
              .select(col("v").as("u"), col("m").as("v")))
            .filter(col("u") =!= col("v")).distinct()
          timed("OLD smallStar (two-branch union)")(noop(oldSS))
          val newSS = GraphOps.smallStar(ls)
          timed("NEW smallStar (explode emission)")(noop(newSS))
          if (rnd == rounds) {
            println("=== BEFORE (two-branch union) ===")
            println(oldSS.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
            println("=== AFTER (explode emission) ===")
            println(newSS.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          }
          banded0.unpersist()
        case "stars" =>
          val vecs = Tables.parallel(spark.read.parquet(s"$dir/embeddings.parquet"))
          noop(vecs)
          val banded = SrpOps.bandedSrp(
            vecs, "embedding", "vec_id", nBands = 5, bitsPerBand = 12,
            maxBucket = 200)
          val pairs = timed("pairs mat")(Tables.materialize(
            SrpOps.neardupPairs(banded.bands, "embedding", "vec_id", 0.35)
              .select(col("vid_a"), col("vid_b"))))
          timed("connectedComponentsStars")(noop(
            GraphOps.connectedComponentsStars(pairs, "vid_a", "vid_b")))
          banded.unpersist()
      }
    }
    spark.stop()
  }
}
