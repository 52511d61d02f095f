package graft.plans

import graft.{Tables, TestSpark}
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions must be bit-identical to the interpreted
  * HOF reference implementations they replaced (same formulas the DuckDB
  * oracle restates). */
class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables(spark, TestSpark.sfDir, "documents")
  private def embs = Tables(spark, TestSpark.sfDir, "embeddings")

  test("CharPolyHash == HOF charHash on every fixture doc") {
    val diff = docs.select(
      TextFunctions.charHash($"text").as("native"),
      TextFunctions.hof.charHash($"text").as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(diff == 0L)
  }

  test("TokenCountExpr == size(tokens) on every fixture doc and edge strings") {
    // Round 17: the sub-shingle filters and avgdl/n_tok features moved to
    // the arrayless count — bit-equal to the split+filter+size form, null
    // on null input like size() under the non-legacy conf.
    val diff = docs.select(
      TextFunctions.tokenCount($"text").as("native"),
      size(TextFunctions.tokens($"text")).as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(diff == 0L)
    val edges = Seq("", " ", "   ", "a", " a", "a ", "a  b", " a b  c ",
      "über  maß", "\ttab stays one token")
      .toDF("text")
      .select(
        TextFunctions.tokenCount($"text").as("native"),
        size(TextFunctions.tokens($"text")).as("ref"))
    val rows = edges.select($"native", $"ref").collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // Null propagates as null — and so does size(tokens(null)) UNDER THIS
    // SESSION'S CONFIG (Spark 4 runs ANSI mode by default, which disables
    // the legacy size-of-null=-1 behavior). Pinned HERE, not asserted in
    // prose (round 18, ADVICE): if a future conf change revived the
    // legacy -1, tokenCount and size() would silently diverge on null
    // docs and this gate goes red before any query does.
    val n = Seq[Option[String]](None).toDF("text")
      .select(
        TextFunctions.tokenCount($"text"),
        size(TextFunctions.tokens($"text"))).collect()
    assert(n.head.isNullAt(0), "tokenCount(null) must be null")
    assert(n.head.isNullAt(1),
      "size(tokens(null)) must be null — the legacy sizeOfNull=-1 conf is " +
        "live and tokenCount no longer matches size() on null text")
  }

  test("Simhash30Expr == HOF simhash30") {
    val diff = docs.select(
      TextFunctions.simhash30($"text").as("native"),
      TextFunctions.hof.simhash30($"text").as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(diff == 0L)
  }

  test("Simhash60Expr == HOF simhash60") {
    val diff = docs.select(
      TextFunctions.simhashShingle60($"text", 1).as("native"),
      TextFunctions.hof.simhash60($"text").as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(diff == 0L)
  }

  test("simhash60 low 30 bits == simhash30 (shared bit construction)") {
    val diff = docs.select(
      (TextFunctions.simhashShingle60($"text", 2).bitwiseAND(lit((1L << 30) - 1)))
        .as("lo"),
      TextFunctions.simhashShingle30($"text", 2).as("ref"))
      .filter($"lo" =!= $"ref").count()
    assert(diff == 0L)
  }

  test("MinhashShingleSig(n=1) == HOF unigram minhashSignature") {
    val diff = docs.select(
      TextFunctions.minhashShingleSignature($"text", 16, 1).as("native"),
      TextFunctions.hof.minhashSignature($"text", 16).as("ref"))
      .filter(to_json($"native") =!= to_json($"ref")).count()
    assert(diff == 0L)
  }

  test("MinhashShingleSig(n=3) hashes the joined shingle strings") {
    // Spot-check one doc against a direct Scala computation.
    val text = docs.orderBy($"doc_id").select($"text").as[String].head()
    val got = docs.orderBy($"doc_id")
      .select(TextFunctions.minhashShingleSignature($"text", 16, 3)).as[Seq[Long]].head()
    val toks = text.split(" ").filter(_.nonEmpty)
    val hs = toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      .map(TextHash.charHash).toSeq.distinct.toArray
    assert(got == TextHash.minhashSig(hs, 16).toSeq)
  }

  test("MinhashShingleSig empty-set contract: short doc → all-zero sig on native AND HOF") {
    // A doc with fewer than n tokens has an empty shingle-hash set. The
    // contract (shared with the DuckDB oracle's coalesce(list_min(...), 0))
    // is an all-zero signature — NOT NULL, and NOT a NULL-element array.
    val shortDocs = Seq("one two", "", "solo").toDF("text")
    val native = shortDocs
      .select(TextFunctions.minhashShingleSignature($"text", 16, 3))
      .as[Seq[Long]].collect()
    assert(native.forall(_ == Seq.fill(16)(0L)), native.toSeq)
    // HOF twin builds from unigram tokens, so only the empty string has an
    // empty hash set — that row must zero-fill identically.
    val hofEmpty = Seq("").toDF("text")
      .select(TextFunctions.hof.minhashSignature($"text", 16))
      .as[Seq[Long]].collect()
    assert(hofEmpty.head == Seq.fill(16)(0L), hofEmpty.toSeq)
  }

  test("ShinglesExpr == HOF shingles for n in 1..4 (incl. short-doc empty case)") {
    for (n <- 1 to 4) {
      val diff = docs.select(
        TextFunctions.shingles($"text", n).as("native"),
        TextFunctions.hof.shingles($"text", n).as("ref"))
        .filter(to_json($"native") =!= to_json($"ref")).count()
      assert(diff == 0L, s"n=$n")
    }
    // short doc: fewer tokens than n → empty array, not a [1,0] artifact
    val short = Seq("one two").toDF("text")
      .select(TextFunctions.shingles($"text", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("CosineSimExpr == HOF cosine on embedding pairs") {
    val a = embs.filter($"vec_id" < 30)
      .select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = embs.filter($"vec_id" < 30)
      .select($"vec_id".as("idb"), $"embedding".as("vb"))
    val diff = a.join(b, $"ida" < $"idb")
      .select(
        VectorFunctions.cosine($"va", $"vb").as("native"),
        VectorFunctions.hof.cosine($"va", $"vb").as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(diff == 0L)
  }

  test("SrpBucketExpr == HOF srpBucket") {
    val diff = embs.select(
      VectorFunctions.srpBucket($"embedding", 8).as("native"),
      VectorFunctions.hof.srpBucket($"embedding", 8, 64).as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(diff == 0L)
  }

  test("hashedLinearScore is the exact bag-of-words dot product (multiset, not set)") {
    val df = Seq(
      (1L, "spark spark spark"), // one token, three occurrences
      (2L, "spark"),
      (3L, "")).toDF("doc_id", "text")
    val scores = df.select($"doc_id",
        TextFunctions.hashedLinearScore($"text", 4096, TextFunctions.fixtureWeight)
          .as("score"))
      .as[(Long, Long)].collect().toMap
    assert(scores(1L) == 3 * scores(2L),
      "a repeated token must count once per occurrence (bag-of-words)")
    assert(scores(3L) == 0L, "an empty document scores the additive identity")
    // The fixture weight rule spans negative and positive weights — a
    // degenerate all-positive rule would make the >= 0 gate vacuous.
    val w = (0 until 4096).map(b =>
      (BigInt(b) * 2654435761L % 1000000007L % 2001L - 1000L).toLong)
    assert(w.exists(_ < 0) && w.exists(_ > 0))
  }

  test("native expressions participate in codegen (no CodegenFallback in plan)") {
    val plan = docs.select(TextFunctions.charHash($"text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || !plan.contains("Fallback"), plan)
  }

  test("TokenCountsExpr: counts == exploded-token groupBy counts, dl == token total") {
    val ref = docs
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    val native = docs
      .select($"doc_id", explode(TextFunctions.tokenCounts($"text").getField("counts")))
      .select($"doc_id", $"key".as("tok"), $"value".as("c"))
    assert(native.exceptAll(ref).count() == 0L && ref.exceptAll(native).count() == 0L)
    val dlDiff = docs.select(
      TextFunctions.tokenCounts($"text").getField("dl").as("dl"),
      size(TextFunctions.tokens($"text")).as("ref"))
      .filter($"dl" =!= $"ref").count()
    assert(dlDiff == 0L)
  }

  test("ShingleCountsExpr == exploded ShinglesExpr counts for n in 1..3; short doc → empty map") {
    for (n <- 1 to 3) {
      val ref = docs
        .select($"doc_id", explode(TextFunctions.shingles($"text", n)).as("sh"))
        .groupBy($"doc_id", $"sh").agg(count(lit(1)).as("c"))
      val native = docs
        .select($"doc_id", explode(TextFunctions.shingleCounts($"text", n)))
        .select($"doc_id", $"key".as("sh"), $"value".as("c"))
      assert(native.exceptAll(ref).count() == 0L && ref.exceptAll(native).count() == 0L, s"n=$n")
    }
    val short = Seq("one two").toDF("text")
      .select(map_keys(TextFunctions.shingleCounts($"text", 3))).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("TokenCountsExpr empty/whitespace text → empty counts, dl 0") {
    val rows = Seq("", "   ", "a a a").toDF("text")
      .select(size(map_keys(TextFunctions.tokenCounts($"text").getField("counts"))).as("k"),
        TextFunctions.tokenCounts($"text").getField("dl").as("dl"))
      .collect()
    assert(rows(0).getInt(0) == 0 && rows(0).getInt(1) == 0)
    assert(rows(1).getInt(0) == 0 && rows(1).getInt(1) == 0)
    assert(rows(2).getInt(0) == 1 && rows(2).getInt(1) == 3)
  }

  test("TokenEntropyExpr == the HOF sorted-fold entropy, bit-identical; null on no tokens") {
    // Reference: the exact expression tree q87 used before promotion —
    // two aggregate folds over array_sort(map_entries(counts)).
    val tc = array_sort(map_entries(TextFunctions.tokenCounts($"text").getField("counts")))
    val ref = docs
      .select($"doc_id", tc.as("tc"))
      .filter(size($"tc") > 0)
      .select($"doc_id", $"tc",
        aggregate($"tc", lit(0.0), (acc, x) => acc + x.getField("value").cast("double")).as("n"))
      .select($"doc_id",
        (log($"n") - aggregate($"tc", lit(0.0),
          (acc, x) => acc + x.getField("value").cast("double") *
            log(x.getField("value").cast("double"))) / $"n").as("raw"),
        size($"tc").as("n_unique"))
    val native = docs
      .select($"doc_id", TextFunctions.tokenEntropy($"text").as("_e"))
      .filter($"_e".isNotNull)
      .select($"doc_id", $"_e".getField("raw").as("raw"),
        $"_e".getField("n_unique").as("n_unique"))
    assert(native.exceptAll(ref).count() == 0L && ref.exceptAll(native).count() == 0L)
    val nulls = Seq("", "   ").toDF("text")
      .select(TextFunctions.tokenEntropy($"text").as("e")).filter($"e".isNotNull)
    assert(nulls.count() == 0L)
  }

  test("byte-native tokenizer parity on adversarial inputs (multi-space, unicode, astral)") {
    // The byte-level split (0x20) must equal the char-level TextHash.tokens
    // and the built-in split+filter on EVERY input: multibyte UTF-8 never
    // contains 0x20, so the three tokenizations cannot diverge — pinned
    // here on the cases the ASCII fixture lacks.
    val hard = Seq(
      "  double  spaces  everywhere  ",
      "tab\there stays one-token",
      "d\u00e9j\u00e0 vu caf\u00e9 na\u00efve",
      "\u4e2d\u6587 \u8a5e\u8a9e mixed ascii",
      "emoji \ud83d\ude00\ud83d\ude00 \ud83d\ude00 twice once",
      "nbsp\u00a0inside stays fused",
      " ", "", "x")
    val df = hard.toDF("text")
    val viaCounts = df.select(
      TextFunctions.tokenCounts($"text").getField("dl").as("dl"),
      map_keys(TextFunctions.tokenCounts($"text").getField("counts")).as("ks"))
    val viaSplit = df.select(
      size(TextFunctions.tokens($"text")).as("dl"),
      array_distinct(TextFunctions.tokens($"text")).as("ks"))
    val a = viaCounts.collect().map(r => (r.getInt(0), r.getSeq[String](1).sorted.toList))
    val b = viaSplit.collect().map(r => (r.getInt(0), r.getSeq[String](1).sorted.toList))
    assert(a.toSeq == b.toSeq)
    // counts themselves: the emoji line has one token twice, one once
    val em = df.filter($"text".startsWith("emoji"))
      .select(TextFunctions.tokenCounts($"text").getField("counts")).head().getMap[String, Long](0)
    assert(em("\ud83d\ude00\ud83d\ude00") == 1L && em("\ud83d\ude00") == 1L &&
      em("emoji") == 1L && em("twice") == 1L && em("once") == 1L)
  }

  test("TokenSetCountExpr == HOF langMarkerCount for every language, every fixture doc") {
    for (lang <- TextFunctions.langMarkers.map(_._1)) {
      val diff = docs.select(
        TextFunctions.langMarkerCount($"text", lang).as("native"),
        TextFunctions.hof.langMarkerCount($"text", lang).as("ref"))
        .filter($"native" =!= $"ref").count()
      assert(diff == 0L, s"lang=$lang")
    }
    // multiset semantics: repeated markers count every occurrence
    val row = Seq("the the and xx the").toDF("text")
      .select(TextFunctions.langMarkerCount($"text", "en")).head().getInt(0)
    assert(row == 4)
  }

  test("MinhashBandsExpr == filter(tokenCount>=n) + sig + HOF band fold (round 18)") {
    // The fused one-pass banding expression must emit EXACTLY the rows the
    // former three-step composition emitted: same (id, b, bh) set on the
    // fixture corpus, and zero rows for sub-shingle docs and null text.
    def oldRows(df: org.apache.spark.sql.DataFrame, k: Int, n: Int, nb: Int, rpb: Int) =
      df.filter(TextFunctions.tokenCount($"text") >= n)
        .select($"doc_id", posexplode(TextFunctions.lshBandHashes(
          TextFunctions.minhashShingleSignature($"text", k, n), nb, rpb))
          .as(Seq("b", "bh")))
    def newRows(df: org.apache.spark.sql.DataFrame, k: Int, n: Int, nb: Int, rpb: Int) =
      df.select($"doc_id", posexplode(
        TextFunctions.minhashBandHashes($"text", k, n, nb, rpb)).as(Seq("b", "bh")))
    for ((k, n, nb, rpb) <- Seq((16, 3, 4, 4), (16, 1, 4, 4), (8, 5, 2, 4))) {
      val old = oldRows(docs, k, n, nb, rpb)
      val neu = newRows(docs, k, n, nb, rpb)
      assert(old.exceptAll(neu).count() == 0L && neu.exceptAll(old).count() == 0L,
        s"(k=$k n=$n bands=$nb rows=$rpb)")
    }
    // Edge docs: empty, whitespace, below/at/above the shingle width, null.
    val edge = Seq("", "  ", "a", "a b", "a b c", "a b c d",
      null.asInstanceOf[String]).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val oldE = oldRows(edge, 16, 3, 4, 4).collect().map(_.toString).sorted
    val newE = newRows(edge, 16, 3, 4, 4).collect().map(_.toString).sorted
    assert(oldE.toSeq == newE.toSeq)
    // Sub-shingle and null docs emit NOTHING (the hazard-1 contract).
    assert(newRows(edge.filter($"text".isNull || TextFunctions.tokenCount($"text") < 3),
      16, 3, 4, 4).count() == 0L)
  }

  test("Simhash60BandedExpr == filter(tokenCount>=n) + sig + posexplode bands (round 18)") {
    // The fused one-pass expression must emit EXACTLY the (id, sh, b, bv)
    // rows the former three-step composition emitted — including the drop
    // of sub-shingle and null docs (empty array → zero posexplode rows,
    // formerly the tokenCount filter) and SimhashOps' exact band
    // extraction.
    val bandBits = graft.operators.SimhashOps.BandBits
    val nBands = graft.operators.SimhashOps.NBands
    val mask = (1L << bandBits) - 1
    def oldRows(df: org.apache.spark.sql.DataFrame, n: Int) =
      df.filter(TextFunctions.tokenCount($"text") >= n)
        .select($"doc_id", TextFunctions.simhashShingle60($"text", n).as("sh"))
        .select($"doc_id", $"sh", posexplode(array(
          (0 until nBands).map(b =>
            shiftright($"sh", b * bandBits).bitwiseAND(lit(mask))): _*
        )).as(Seq("b", "bv")))
    def newRows(df: org.apache.spark.sql.DataFrame, n: Int) =
      df.select($"doc_id", posexplode(
        TextFunctions.simhash60Banded($"text", n, nBands, bandBits))
          .as(Seq("b", "_x")))
        .select($"doc_id", $"_x.sh".as("sh"), $"b", $"_x.bv".as("bv"))
    for (n <- Seq(1, 2, 3)) {
      val old = oldRows(docs, n)
      val neu = newRows(docs, n)
      assert(old.exceptAll(neu).count() == 0L && neu.exceptAll(old).count() == 0L,
        s"n=$n")
    }
    val edge = Seq("", " ", "a", "a b", "a b c", null.asInstanceOf[String])
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val oldE = oldRows(edge, 2).collect().map(_.toString).sorted
    val newE = newRows(edge, 2).collect().map(_.toString).sorted
    assert(oldE.toSeq == newE.toSeq)
    // Sub-shingle and null docs emit NOTHING (the hazard-1 contract).
    assert(newRows(edge.filter($"text".isNull || TextFunctions.tokenCount($"text") < 2),
      2).count() == 0L)
  }

  test("fused banding expressions participate in codegen and evaluate once") {
    // The `*(n)` prefix is the WholeStageCodegen span marker in the
    // executed plan's short form; Fallback would mark an interpreted node.
    val p1 = docs.select(TextFunctions.minhashBandHashes($"text", 16, 3, 4, 4))
      .queryExecution.executedPlan.toString
    assert(p1.contains("*(") && !p1.contains("Fallback"), p1)
    // The simhash twin must appear exactly ONCE in its banding plan — the
    // guarded-scalar shape measured the §4.4 filter-pushdown double
    // evaluation this gate exists to block.
    val p2 = docs.select($"doc_id", posexplode(
      TextFunctions.simhash60Banded($"text", 2,
        graft.operators.SimhashOps.NBands, graft.operators.SimhashOps.BandBits))
        .as(Seq("b", "_x")))
      .select($"doc_id", $"_x.sh".as("sh"), $"b", $"_x.bv".as("bv"))
      .queryExecution.executedPlan.toString
    assert("simhash60bandedexpr".r.findAllIn(p2.toLowerCase).size == 1, p2)
    assert(!p2.contains("Fallback"), p2)
  }
}
