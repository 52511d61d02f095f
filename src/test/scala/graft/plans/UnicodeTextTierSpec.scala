package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins of the codepoint text tier (round 12): the UTF-16-unit tier is
  * oracle-exact for BMP text only; this tier must be oracle-exact for
  * ALL text. The cross-engine contract the q149 oracle enforces end to
  * end is pinned here at the kernel level:
  *  - hash folds iterate CODEPOINTS (DuckDB's string_split(s,'') +
  *    unicode(c) semantics) — one step per astral char, not two;
  *  - tokenization breaks on exactly the Unicode White_Space set
  *    ([[TextHash.WhitespaceCp]]), from which the DuckDB regex class is
  *    GENERATED — so a drift in the set is a compile-time-shared edit,
  *    never a silent divergence.
  */
class UnicodeTextTierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // ASCII text with space separators — the regime where both tiers MUST
  // agree exactly (the fixtures' regime).
  private val asciiText: Gen[String] = for {
    words <- Gen.listOf(Gen.chooseNum(1, 8)
      .flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar)))
    seps <- Gen.listOfN(math.max(words.size - 1, 0), Gen.chooseNum(1, 3).map(" " * _))
  } yield words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString

  test("codepoint tier == UTF-16 tier on ASCII space-separated text") {
    run("ascii-agree", Prop.forAll(asciiText) { s =>
      TextHash.charHashCp(s) == TextHash.charHash(s) &&
        TextHash.tokensCp(s).toSeq == TextHash.tokens(s).toSeq &&
        TextHash.distinctShingleHashesCp(s, 2).toSeq ==
          TextHash.distinctShingleHashes(s, 2).toSeq
    })
  }

  test("charHashCp folds codepoints: astral chars are ONE step") {
    // U+1F600 is two UTF-16 units (0xD83D 0xDE00) but one codepoint.
    val emoji = "😀"
    assert(TextHash.charHashCp(emoji) == (7L * 31 + 0x1F600) % TextHash.Mod)
    assert(TextHash.charHash(emoji) ==
      ((7L * 31 + 0xD83D) % TextHash.Mod * 31 + 0xDE00) % TextHash.Mod)
    assert(TextHash.charHashCp(emoji) != TextHash.charHash(emoji),
      "the tiers must diverge on astral input — that divergence is the fix")
    // BMP non-ASCII: unit == codepoint, tiers agree (é, 中).
    for (s <- Seq("déjà", "中文", "naïve"))
      assert(TextHash.charHashCp(s) == TextHash.charHash(s), s)
    // Independent BigInt fold over codePoints pins the arithmetic.
    run("cp-fold", Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.chooseNum(0x20, 0x7E), Gen.const(0xE9), Gen.const(0x4E2D),
      Gen.const(0x1F600), Gen.const(0x1D11E)))) { cps =>
      val s = new String(cps.toArray, 0, cps.length)
      val expect = cps.foldLeft(BigInt(7)) { (a, cp) =>
        (a * 31 + cp) % BigInt(1000000007L)
      }.toLong
      TextHash.charHashCp(s) == expect
    })
  }

  test("tokensCp breaks on every White_Space codepoint and nothing else") {
    for (cp <- TextHash.WhitespaceCp) {
      val s = "a" + new String(Character.toChars(cp)) + "b"
      assert(TextHash.tokensCp(s).toSeq == Seq("a", "b"),
        f"U+$cp%04X must be a token boundary")
      assert(TextHash.isWhitespaceCp(cp), f"U+$cp%04X")
    }
    // Non-boundaries: CJK, accents, emoji, and — deliberately — the
    // ZERO WIDTH SPACE U+200B, which Unicode excludes from White_Space.
    for (cp <- Seq(0x4E2D, 0xE9, 0x1F600, 0x200B, 0x5F, 0x2D)) {
      val s = "a" + new String(Character.toChars(cp)) + "b"
      assert(TextHash.tokensCp(s).length == 1,
        f"U+$cp%04X must NOT be a token boundary")
      assert(!TextHash.isWhitespaceCp(cp), f"U+$cp%04X")
    }
    // NBSP inside "déjà vu" splits on THIS tier only.
    val dv = "déjà vu"
    assert(TextHash.tokensCp(dv).toSeq == Seq("déjà", "vu"))
    assert(TextHash.tokens(dv).toSeq == Seq(dv))
    // Leading/trailing/run-of-mixed whitespace drops empties.
    assert(TextHash.tokensCp("　 a    b\t").toSeq == Seq("a", "b"))
    assert(TextHash.tokensCp("").isEmpty && TextHash.tokensCp("　").isEmpty)
  }

  test("cp shingle hashes == charHashCp of the space-joined cp tokens") {
    val s = "中文　text here 😀 end"
    val toks = TextHash.tokensCp(s)
    assert(toks.toSeq == Seq("中文", "text", "here", "😀", "end"))
    val expect = toks.sliding(2).map(p => TextHash.charHashCp(p.mkString(" ")))
      .toSeq.distinct
    assert(TextHash.distinctShingleHashesCp(s, 2).toSeq == expect)
    assert(TextHash.distinctShingleHashesCp("one", 2).isEmpty)
  }

  test("native cp expressions match the kernels through codegen") {
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "déjà vu　again"),
      (3L, "😀 emoji 😀 twice"),
      (4L, "")).toDF("id", "s")
    import graft.functions.TextFunctions._
    val got = docs.select($"id", $"s",
      charHashCp($"s").as("h"),
      tokensCp($"s").as("tk"),
      minhashShingleSignatureCp($"s", 4, 2).as("mh"),
      simhashShingle60Cp($"s", 2).as("sh")).collect()
    got.foreach { r =>
      val s = r.getString(1)
      assert(r.getLong(2) == TextHash.charHashCp(s))
      assert(r.getSeq[String](3) == TextHash.tokensCp(s).toSeq)
      val hs = TextHash.distinctShingleHashesCp(s, 2)
      assert(r.getSeq[Long](4) == TextHash.minhashSig(hs, 4).toSeq)
      assert(r.getLong(5) == TextHash.simhash60(hs))
    }
  }
}
