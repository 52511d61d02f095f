package graft

import org.apache.spark.sql.functions._

/** TEMPORARY optimization-round phase probe (not part of the product;
  * kept through the optimization rounds, removed after). Times the
  * phases of the heavy queries in a Bench-like JVM, counts Spark
  * jobs/stages per declared query (`jobs:<name>` — with AQE each
  * exchange materializes as its own job, so this is the pass counter
  * the round optimizes against). Usage:
  * runMain graft.ProbeR17 <sfDir> <q169|q166|cc|bm|jobs:qNNN> */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "q169"
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    // Match the declared-query read path exactly: the fixtures are
    // single-row-group files, and every query family reads them through
    // Tables.parallel (q103's `t`), so an unwrapped read here would
    // serialize the per-row phases the probe is trying to attribute.
    val e = Tables.parallel(spark.read.parquet(s"$dir/embeddings.parquet"))
    e.write.format("noop").mode("overwrite").save()
    import graft.operators._
    (1 to 2).foreach { round =>
      println(s"=== round $round ($which) ===")
      which match {
        case "q169" =>
          val coarse = timed("coarse fit")(KmeansOps.fit(e, "embedding", "vec_id", k = 8, iters = 1))
          val res = timed("res mat")(Tables.materialize(
            PqOps.residuals(e, "embedding", "vec_id", coarse.centroids)))
          val model = timed("fitPq")(PqOps.fitPq(res, "residual", "vec_id", m = 4, kCodes = 8, iters = 1))
          val codes = timed("codes mat")(Tables.materialize(
            PqOps.attachCells(PqOps.encode(res, "residual", "vec_id", model),
              res.select(col("vec_id"), col("cell").as("cluster")), "vec_id")))
          val asg = res.select(col("vec_id"), col("cell").as("cluster"))
            .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
          val maxPop = timed("count")(math.ceil(e.count() / 10.0).toLong)
          timed("splitHotCells JOIN path")(KmeansOps.splitHotCellsPath(
            asg, "embedding", "vec_id", "cluster", coarse.centroids, maxPop,
            iters = 1, literal = Some(false)).assignments
            .write.format("noop").mode("overwrite").save())
          val split = timed("splitHotCells LITERAL path")(KmeansOps.splitHotCellsPath(
            asg, "embedding", "vec_id", "cluster", coarse.centroids, maxPop,
            iters = 1, literal = Some(true)))
          timed("literal assignments noop")(split.assignments
            .write.format("noop").mode("overwrite").save())
          val hotSeq = split.hotCells.toSeq.sorted.map(Integer.valueOf)
          val moved = split.assignments.withColumnRenamed("cell", "ncell")
            .join(res.filter(col("cell").isin(hotSeq: _*)).select(col("vec_id")), Seq("vec_id"))
            .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
          val res2 = PqOps.residualsAt(moved, "embedding", "vec_id", "ncell", split.centroids)
          val hot = PqOps.attachCells(PqOps.encode(res2, "residual", "vec_id", model),
            res2.select(col("vec_id"), col("cell").as("cluster")), "vec_id")
          val outc = Seq("vec_id", "cell", "sub", "code", "dist").map(col)
          timed("tail noop")(codes.filter(!col("cell").isin(hotSeq: _*)).select(outc: _*)
            .unionByName(hot.select(outc: _*)).write.format("noop").mode("overwrite").save())
        case "q166" =>
          val coarse = timed("coarse fit")(KmeansOps.fit(e, "embedding", "vec_id", k = 8, iters = 1))
          val cells = coarse.assignments.select(col("vec_id"), col("cluster"))
          val model = timed("fitPq m4")(PqOps.fitPq(e, "embedding", "vec_id", m = 4, kCodes = 8, iters = 1))
          val codes = timed("codes mat")(Tables.materialize(
            PqOps.attachCells(PqOps.encode(e, "embedding", "vec_id", model), cells, "vec_id")))
          val errs = timed("errs mat")(Tables.materialize(
            PqOps.reconstructionErrors(e, "embedding", "vec_id", model, codes)))
          val rmodel = timed("fitPq m8")(PqOps.fitPq(errs, "_graft_err", "vec_id", m = 8, kCodes = 8, iters = 1))
          val rcodes = timed("rcodes mat")(Tables.materialize(
            PqOps.attachCells(PqOps.encode(errs, "_graft_err", "vec_id", rmodel), cells, "vec_id")))
          val queries = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding"))
          val short = timed("shortlist")(PqOps.ivfAdcSearch(codes, "cell", "vec_id",
            queries, "qid", "embedding", model, coarse.centroids, topN = 20, nprobe = 2))
          timed("stage1 exec (noop)")(
            short.write.format("noop").mode("overwrite").save())
          val arts = PqOps.PqArtifacts(model, coarse.centroids, codes,
            refinement = Some(rmodel), rcodes = Some(rcodes))
          val rr = timed("refine build (shortlist collect inside)")(
            PqOps.refineFromCodes(arts, short, "vec_id", queries,
              "qid", "embedding", topN = 5, nprobe = 2))
          timed("refine exec (noop)")(
            rr.write.format("noop").mode("overwrite").save())
        case q if q.startsWith("jobs:") =>
          // Count Spark jobs + stages for one declared query's execution.
          val name = q.stripPrefix("jobs:")
          val fn = SparkEntry.queries.collectFirst {
            case (n, f) if n.startsWith(name) => (n, f) }.get
          val jobs = new java.util.concurrent.atomic.AtomicInteger
          val stages = new java.util.concurrent.atomic.AtomicInteger
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
              if (round == 2) {
                val names = j.stageInfos.map(si =>
                  si.details.linesIterator
                    .find(l => l.contains("graft") && !l.contains("Probe"))
                    .getOrElse(si.name).trim.take(90)).mkString(" | ")
                println(f"  job ${j.jobId}%3d stages=${j.stageInfos.size} $names")
              }
            }
          }
          spark.sparkContext.addSparkListener(listener)
          timed(s"${fn._1} total")(
            fn._2(spark, dir).write.format("noop").mode("overwrite").save())
          spark.sparkContext.removeSparkListener(listener)
          println(s"[${fn._1}] jobs=${jobs.get} stages=${stages.get}")
        case "split10" =>
          import graft.functions.VectorFunctions
          val coarse = timed("coarse fit")(KmeansOps.fit(e, "embedding", "vec_id", k = 8, iters = 1))
          val res = timed("res mat")(Tables.materialize(
            PqOps.residuals(e, "embedding", "vec_id", coarse.centroids)))
          val asg = res.select(col("vec_id"), col("cell").as("cluster"))
            .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
          val maxPop = math.ceil(e.count() / 10.0).toLong
          val pops = timed("pops")(asg.groupBy(col("cluster")).count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap)
          val hot = pops.collect { case (c, p) if p > maxPop => c -> p }
          val kOf = hot.map { case (c, p) => c -> math.ceil(p.toDouble / maxPop).toInt }
          println(s"  hot=${hot.size} sumK=${kOf.values.sum}")
          val hotCells = hot.keySet.toSeq.sorted
          val members = Tables.materializeLazy(
            asg.filter(col("cluster").isin(hotCells.map(Integer.valueOf): _*))
              .select(col("vec_id"),
                transform(col("embedding"), _.cast("double")).as("_graft_v"),
                col("cluster").cast("int").as("_graft_cell")))
          val maxK = kOf.values.max
          val seedRows = timed("seeds topk")(TopKOps.groupedTopK(
              members.select(col("_graft_cell"),
                (-col("vec_id")).cast("double").as("_graft_negid"), col("vec_id")),
              "_graft_cell", "_graft_negid", "vec_id", maxK)
            .select(col("_graft_cell"), (col("rank") - 1).cast("int").as("f"),
              col("vec_id").cast("long").as("sid")).collect())
          val seedIds = seedRows.map(_.getLong(2)).distinct.map(java.lang.Long.valueOf)
          val vecOf = timed("seed vecs")(members
            .filter(col("vec_id").cast("long").isin(seedIds.toIndexedSeq: _*))
            .select(col("vec_id").cast("long"), col("_graft_v")).collect()
            .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap)
          val fine = seedRows.filter(r => r.getInt(1) < kOf(r.getInt(0)))
            .map(r => (r.getInt(0), r.getInt(1)) -> vecOf(r.getLong(2))).toMap
          var next = coarse.centroids.length
          val newIdOf = hotCells.flatMap { c => (0 until kOf(c)).map { f =>
            if (f == 0) (c, f) -> c else { val id = next; next += 1; (c, f) -> id } } }.toMap
          val centsByCell = hotCells.map(c => (0 until kOf(c)).map(f => fine((c, f))).toArray).toArray
          val idsByCell = hotCells.map(c => (0 until kOf(c)).map(f => newIdOf((c, f))).toArray).toArray
          val packed = VectorFunctions.splitAssign(
            col("_graft_cell"), col("_graft_v"), hotCells.toArray, centsByCell, idsByCell)
            .bitwiseAND(lit((1L << 20) - 1)).cast("int")
          val meansDf = members
            .select(col("_graft_cell"), packed.as("_graft_nc"),
              posexplode(col("_graft_v")).as(Seq("i", "x")))
            .groupBy(col("_graft_cell"), col("_graft_nc"), col("i"))
            .agg(org.apache.spark.sql.functions.round(avg(col("x")), 6).as("m"))
          println(meansDf.queryExecution.executedPlan.toString.take(4000))
          timed("means job")(meansDf.collect())
          timed("moved noop")(members.select(col("vec_id"), packed.as("cell"))
            .write.format("noop").mode("overwrite").save())
        case "bm" =>
          import graft.functions.TextFunctions._
          val docs = Tables.parallel(spark.read.parquet(s"$dir/documents.parquet"))
          docs.write.format("noop").mode("overwrite").save()
          timed("tokens filter only")(docs
            .filter(size(tokens(col("text"))) >= 3).select(col("doc_id"))
            .write.format("noop").mode("overwrite").save())
          timed("sig only")(docs
            .select(col("doc_id"), minhashShingleSignature(col("text"), 16, 3))
            .write.format("noop").mode("overwrite").save())
          timed("filter+sig+bands (no window)")(docs
            .filter(size(tokens(col("text"))) >= 3)
            .select(col("doc_id"), posexplode(lshBandHashes(
              minhashShingleSignature(col("text"), 16, 3), 4, 4)).as(Seq("b", "bh")))
            .write.format("noop").mode("overwrite").save())
          val banded = timed("bandedMinhash full")(LshOps.bandedMinhash(
            docs, "text", "doc_id", 16, 3, 4, 4, 10000))
          banded.unpersist()
        case "cc" =>
          val docs = Tables.parallel(spark.read.parquet(s"$dir/documents.parquet"))
          docs.write.format("noop").mode("overwrite").save()
          val banded = timed("bandedMinhash")(LshOps.bandedMinhash(
            docs, "text", "doc_id", 16, 3, 4, 4, 10000))
          val pairs = timed("candidatePairs mat")(Tables.materialize(
            LshOps.candidatePairs(banded.bands, "doc_id")))
          timed("connectedComponents")(
            GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
              .write.format("noop").mode("overwrite").save())
          banded.unpersist()
      }
    }
    spark.stop()
  }
}
