package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-fixture generator: `runMain graft.GenScale <sf> <outDir>`.
  *
  * Reproduces the SHAPE of the driver's seed-42 fixtures (TESTDATA.md /
  * FIXTURES.md) at scale factors the driver does not ship — the round-5
  * mandate is to MEASURE the 100 TB design rules instead of arguing them,
  * which needs an sf1 (10× bench) run of the heavy-tail queries. Only the
  * two tables those queries read are generated:
  *
  *  - `lineitem` (6 M rows at sf1): TPC-H-ish columns with the sf0.1
  *    marginals (quantity 1–50 uniform, price 900.68–104999.91, discount
  *    0–0.10 in cents, tax 0–0.08, flags A/N/R × F/O uniform, shipdate
  *    1995-01-01 + 0–2500 d, ~4 lines/order with max 7).
  *  - `documents` (50 k rows at sf1): 10–100-word soup over the fixture's
  *    exact 31-word vocabulary, lang weights (en 41%, de/es/fr/zh ~15%),
  *    20 uniform sources — and the fixture's near-duplicate structure:
  *    ~5% of docs are a copy of an earlier doc with ~10% of words
  *    replaced (the sf0.01 fixture has 25 pairs at 3-shingle Jaccard
  *    ≥ 0.5 over 500 docs and nothing in (0.2, 0.5) — perturbed copies,
  *    not correlated randomness). Without this the LSH / SimHash / overlap
  *    queries would measure an empty-candidate corpus and understate
  *    their join cost.
  *
  * Everything is a pure `xxhash64(seed=42, tag, id…)` function of the row
  * id — no RNG state, so the data is identical under any partitioning or
  * retry (same rule as SamplingOps' layout-stable membership). Output is
  * written as `max(1, 32·sf)` parquet files: a single-file table reads as
  * ONE row group (one-core scans — the sf0.1 bench trap in
  * graft-build-recipes), and a multi-file layout is what a real corpus
  * looks like anyway.
  */
object GenScale {

  /** The driver fixture's exact 31-word vocabulary (sf0.1 distinct scan) —
    * reusing it keeps shingle cardinality, and therefore MinHash/LSH band
    * collision rates, comparable across scales. */
  private val Vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  /** Deterministic per-(tag, cols) hash, non-negative. */
  private def h(tag: String, cols: Column*): Column =
    abs(xxhash64((lit(42L) +: lit(tag) +: cols): _*))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length <= 4,
      "usage: GenScale <sf> <outDir> [tables] [powerPct]  (tables: comma list of " +
        "lineitem,documents,embeddings,events; powerPct: % of events on user 0)")
    val sf = args(0).toDouble
    val out = args(1)
    val tables =
      if (args.length >= 3) args(2).split(",").map(_.trim).toSet
      else Set("lineitem", "documents", "embeddings")
    val powerPct = if (args.length == 4) args(3).toInt else 0
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val files = math.max(1, (32 * sf).toInt)
    if (tables("lineitem"))
      genLineitem(spark, sf).repartition(files)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
    if (tables("documents"))
      genDocuments(spark, sf).repartition(math.max(1, files / 2))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    if (tables("embeddings"))
      genEmbeddings(spark, sf).repartition(math.max(1, files / 2))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    if (tables("events"))
      genEvents(spark, sf, powerPct).repartition(files)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
    println(s"[genscale] wrote ${tables.mkString("+")} at sf=$sf to $out")
    spark.stop()
  }

  /** ~6 M rows/sf: 1.5 M orders × 1–7 lines (avg 4). */
  def genLineitem(spark: SparkSession, sf: Double): DataFrame = {
    val nOrders = (1500000L * sf).toLong
    val o = col("o")
    val ln = col("l_linenumber")
    spark.range(nOrders).toDF("o")
      .select(o, explode(sequence(lit(1),
        (pmod(h("nl", o), lit(7)) + 1).cast("int"))).as("l_linenumber"))
      .select(
        o.as("l_orderkey"),
        pmod(h("pk", o, ln), lit((200000 * math.max(sf, 0.1)).toLong)).as("l_partkey"),
        pmod(h("sk", o, ln), lit((10000 * math.max(sf, 0.1)).toLong)).as("l_suppkey"),
        ln,
        (pmod(h("qty", o, ln), lit(50)) + 1).cast("double").as("l_quantity"),
        round((pmod(h("px", o, ln), lit(10409924L)) + 90068L) / 100.0, 2)
          .as("l_extendedprice"),
        (pmod(h("dc", o, ln), lit(11)) / 100.0).as("l_discount"),
        (pmod(h("tx", o, ln), lit(9)) / 100.0).as("l_tax"),
        element_at(array(lit("A"), lit("N"), lit("R")),
          (pmod(h("rf", o, ln), lit(3)) + 1).cast("int")).as("l_returnflag"),
        element_at(array(lit("F"), lit("O")),
          (pmod(h("ls", o, ln), lit(2)) + 1).cast("int")).as("l_linestatus"),
        date_add(to_date(lit("1995-01-01")),
          pmod(h("sd", o, ln), lit(2500)).cast("int"))
          .cast("timestamp").as("l_shipdate"))
  }

  /** 20 k vectors/sf matching the fixture's shape (sf0.1 ships 2 000):
    * 64-dim UNIT vectors (fixture per-element σ = 1/√64 and Σv² = 1.0),
    * uniform 10-way labels, and ~5 % seeded near-copies of an earlier
    * vector (perturbed then re-normalized, cosine ≈ 0.95–0.99) so the
    * embedding near-dup queries (q58/q105) measure a non-empty candidate
    * load at scale. Deterministic per (id, dim) — Box-Muller over two
    * xxhash-derived uniforms, no RNG state. */
  def genEmbeddings(spark: SparkSession, sf: Double): DataFrame = {
    val nVecs = (20000L * sf).toLong
    val id = col("vec_id")
    def unif(tag: String, i: Column, j: Column): Column =
      (pmod(h(tag, i, j), lit(1000000000L)) + 0.5) / 1e9
    def gauss(tag: String, i: Column, j: Column): Column =
      sqrt(lit(-2.0) * log(unif(tag + "u1", i, j))) *
        cos(lit(2.0 * math.Pi) * unif(tag + "u2", i, j))
    def normed(v: Column): Column = {
      val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
      transform(v, x => (x / n).cast("float"))
    }
    val base = spark.range(nVecs).toDF("vec_id")
      .withColumn("raw", transform(sequence(lit(1), lit(64)), j => gauss("g", id, j)))
    val isDup = pmod(h("vdup", id), lit(100)) < 5 && id >= 100
    val dups = base.filter(isDup)
      .select(id.as("dup_id"), pmod(h("vref", id), id).as("src_id"))
    val dupVecs = dups
      .join(base.select(id.as("src_id"), col("raw")), "src_id")
      .select(col("dup_id").as("vec_id"),
        transform(col("raw"), (x, j) =>
          x + lit(0.15) * gauss("p", col("dup_id"), j)).as("raw"))
    base.filter(!isDup).select(id, col("raw"))
      .unionByName(dupVecs)
      .select(id, normed(col("raw")).as("embedding"),
        pmod(h("lbl", id), lit(10)).cast("int").as("label"))
  }

  /** 1 M events/sf matching the fixture's shape (sf0.1 ships 100 k
    * rows over 1 500 users, 5 uniform event types, timestamps uniform
    * over the fixture's 30-day window from 2024-01-01, `value` in
    * cents, `props` a one-key JSON blob) — the scale fixture the
    * behavioral family (q135/q138/q139) lacked (TESTDATA events caps
    * at sf0.1; BASELINE round-10 note).
    *
    * `powerPct`: percent of ALL events routed to user 0 — the
    * power-user skew knob. The behavioral operators' scale hazard is
    * per-entity state, not shuffle shape; a probe at powerPct=10 on a
    * 10 M-row corpus hands one user a million-event sequence, exactly
    * the shape the round-11 streaming fold must absorb via spillable
    * sort instead of an aggregation-buffer array. Deterministic per
    * event id like every other generator here. */
  def genEvents(spark: SparkSession, sf: Double, powerPct: Int = 0): DataFrame = {
    require(powerPct >= 0 && powerPct < 100, s"powerPct out of [0,100): $powerPct")
    val nEvents = (1000000L * sf).toLong
    val nUsers = math.max(2L, (15000L * sf).toLong)
    val id = col("event_id")
    val types = array(Seq("view", "click", "purchase", "signup", "error").map(lit): _*)
    spark.range(nEvents).toDF("event_id")
      .select(
        id,
        to_timestamp(lit("2024-01-01 00:00:00"))
          .cast("long").plus(pmod(h("ts", id), lit(2592000L)))
          .cast("timestamp").as("ts"),
        // Regular draws cover ALL of 0..nUsers-1 (so the distinct-user
        // count matches the fixture parity at every powerPct, including
        // 0); user 0 doubles as the skew target, receiving the powerPct
        // share ON TOP of its uniform share.
        when(pmod(h("pu", id), lit(100)) < powerPct, lit(0L))
          .otherwise(pmod(h("u", id), lit(nUsers))).as("user_id"),
        element_at(types, (pmod(h("et", id), lit(5)) + 1).cast("int"))
          .as("event_type"),
        round(pmod(h("val", id), lit(20000L)) / 100.0, 2).as("value"),
        concat(lit("{\"k\": "), pmod(h("pk", id), lit(100)), lit("}")).as("props"))
  }

  /** 50 k docs/sf with the fixture's seeded near-dup rate. */
  def genDocuments(spark: SparkSession, sf: Double): DataFrame = {
    val nDocs = (50000L * sf).toLong
    val id = col("doc_id")
    val vocab = array(Vocab.map(lit): _*)
    val base = spark.range(nDocs).toDF("doc_id")
      .withColumn("words", transform(
        sequence(lit(1), (pmod(h("nw", id), lit(91)) + 10).cast("int")),
        i => element_at(vocab, (pmod(h("w", id, i), lit(31)) + 1).cast("int"))))
      .withColumn("_langp", pmod(h("lang", id), lit(100)))
      .withColumn("lang",
        when(col("_langp") < 41, "en").when(col("_langp") < 56, "de")
          .when(col("_langp") < 71, "es").when(col("_langp") < 86, "fr")
          .otherwise("zh"))
      .withColumn("source", concat(lit("src"), pmod(h("src", id), lit(20))))
    // ~5% of docs are near-copies of a uniformly-chosen EARLIER doc with
    // ~10% of word positions rewritten (3-shingle Jaccard lands ≈0.5–0.8,
    // matching the fixture's pair profile). The copy source comes via a
    // keyed join — never a driver-side lookup — so generation itself
    // scales.
    val isDup = pmod(h("dup", id), lit(100)) < 5 && id >= 100
    val dups = base.filter(isDup)
      .select(id.as("dup_id"), pmod(h("ref", id), id).as("src_id"),
        col("lang"), col("source"))
    val dupDocs = dups
      .join(base.select(id.as("src_id"), col("words")), "src_id")
      .select(col("dup_id").as("doc_id"),
        transform(col("words"), (w, i) =>
          when(pmod(h("pp", col("dup_id"), i), lit(10)) === 0,
            element_at(vocab,
              (pmod(h("pw", col("dup_id"), i), lit(31)) + 1).cast("int")))
            .otherwise(w)).as("words"),
        col("lang"), col("source"))
    base.filter(!isDup).select(id, col("words"), col("lang"), col("source"))
      .unionByName(dupDocs)
      .select(id, array_join(col("words"), " ").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }
}
