package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text/dedup hash primitives.
  *
  * Promoted from the higher-order-function compositions in
  * [[graft.functions.TextFunctions]] on BENCH evidence (SURVEY §7.2):
  * Spark's HigherOrderFunction nodes are CodegenFallback and evaluate the
  * lambda tree per element, so per-character folds over 100 TB of text run
  * ~100x slower than these tight single-pass evals. Formulas are
  * BIT-IDENTICAL to the HOF versions and to the DuckDB oracle fragments
  * (TextQueries): fold (acc*31 + char) mod 1e9+7 seed 7; MinHash
  * permutation i: ((i+1)*h + 7919*i) mod (2^31-1); SimHash majority over
  * bits 0..29. ASCII-only caveat: chars are UTF-16 units, identical to
  * code points for the fixtures' ASCII text (and to DuckDB's per-character
  * split).
  */
object TextHash {
  val Mod = 1000000007L
  val Seed = 7L
  val MinhashMod = 2147483647L
  val MinhashB = 7919L

  def charHash(s: String): Long = {
    var acc = Seed
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % Mod
      i += 1
    }
    acc
  }

  /** Whitespace tokens, empties dropped — same as split(' ') + filter. */
  def tokens(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](64)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) out += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  /** Token COUNT without materializing the array — bit-equal to
    * `tokens(s).length` (maximal runs of non-space chars; "" → 0). The
    * hot-path filters and length features only need the number, and the
    * split+filter form allocates one UTF8String per token first
    * (round 17, guide §1.2 per-task work). */
  def tokenCount(s: String): Int = {
    var i = 0
    var n = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) != ' ') {
        n += 1
        while (i < len && s.charAt(i) != ' ') i += 1
      } else i += 1
    }
    n
  }

  /** Distinct hashes of word n-gram shingles (n=1 → unigram tokens). The
    * shingle string is tokens joined by a single space, so its charHash
    * equals the oracle's hash of array_to_string(toks[i:i+n-1], ' '). */
  def distinctShingleHashes(s: String, n: Int): Array[Long] =
    distinctShingleHashesFromTokens(tokens(s), n)

  /** [[distinctShingleHashes]] from an ALREADY-TOKENIZED document — the
    * single-tokenization entry the fused banding expressions use
    * (round 18): a caller that also needs the token count (the
    * sub-shingle guard) tokenizes once instead of once per consumer. */
  def distinctShingleHashesFromTokens(toks: Array[String], n: Int): Array[Long] = {
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length >= n) {
      var i = 0
      while (i + n <= toks.length) {
        var acc = Seed
        var j = 0
        while (j < n) {
          if (j > 0) acc = (acc * 31 + ' ') % Mod
          val t = toks(i + j)
          var k = 0
          while (k < t.length) {
            acc = (acc * 31 + t.charAt(k)) % Mod
            k += 1
          }
          j += 1
        }
        set.add(acc)
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def minhashSig(hs: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var hi = 0
    while (hi < hs.length) {
      val h = hs(hi)
      var i = 0
      while (i < k) {
        val cand = ((i + 1) * h + MinhashB * i) % MinhashMod
        if (cand < sig(i)) sig(i) = cand
        i += 1
      }
      hi += 1
    }
    // Empty-set contract (docs with < n tokens): signature is ALL ZEROS on
    // every implementation — here, in the HOF twin (coalesce over the NULL
    // that array_min yields on empty), and in the oracle SQL (coalesce over
    // DuckDB's NULL list_min). Change all three together or none.
    if (hs.isEmpty) java.util.Arrays.fill(sig, 0L)
    sig
  }

  def simhash30(hs: Array[Long]): Long = {
    var result = 0L
    var j = 0
    while (j < 30) {
      var bitSum = 0L
      var i = 0
      while (i < hs.length) {
        bitSum += ((hs(i) >> j) & 1L) * 2 - 1
        i += 1
      }
      if (bitSum >= 0) result |= (1L << j)
      j += 1
    }
    result
  }

  /** LCG constants for the second 30 bits of [[simhash60]]: glibc's
    * rand() multiplier/increment mod the MinHash prime. Max intermediate is
    * (1e9+7)·1103515245 ≈ 1.1e18 < 2^63, so Long and DuckDB BIGINT agree
    * exactly. */
  val Lcg60A = 1103515245L
  val Lcg60C = 12345L

  /** 60-bit SimHash: bits 0..29 majority-vote over the shingle hash h
    * (identical to [[simhash30]]), bits 30..59 over the derived hash
    * (h·A + C) mod (2^31 − 1). A 30-bit signature is too narrow for
    * hamming-LSH banding at corpus scale — 3×10-bit bands give only 3072
    * buckets, so candidate pairs grow O(n²) once n outruns the band space
    * (measured: 58 k → 5.9 M join rows from sf0.1 → sf1). 60 bits band as
    * 4×15 (32 768 values/band), which also upgrades the pigeonhole recall
    * guarantee from hamming ≤ 2 to ≤ 3. */
  // ---- codepoint-correct tier (round 12) ----------------------------
  //
  // The UTF-16-unit functions above are bit-exact against the DuckDB
  // fragments for BMP text only: DuckDB's string_split(s, '') +
  // unicode(c) iterates CODEPOINTS, and a codepoint equals its UTF-16
  // unit everywhere except the astral planes (U+10000+, e.g. emoji,
  // rare CJK), where Java yields two surrogate units per character.
  // These variants fold codepoints, matching the oracle fragment on ALL
  // text, and tokenize on the full Unicode White_Space set instead of
  // U+0020 alone — what a real multilingual corpus needs before the
  // dedup family's hashes mean what they claim.

  /** The Unicode White_Space codepoints (PropList.txt, a stability-
    * guaranteed property): controls TAB..CR, space, NEL, NBSP, OGHAM,
    * the typographic spaces U+2000–U+200A, LS/PS, NNBSP, MMSP, and the
    * ideographic space U+3000. The DuckDB tokenizer regex is BUILT from
    * this array (TextQueries derives the character class from it), so
    * the two engines cannot drift apart. */
  val WhitespaceCp: Array[Int] = Array(
    0x0009, 0x000A, 0x000B, 0x000C, 0x000D, 0x0020, 0x0085, 0x00A0,
    0x1680, 0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006,
    0x2007, 0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F,
    0x3000)

  def isWhitespaceCp(cp: Int): Boolean =
    (cp >= 0x0009 && cp <= 0x000D) || cp == 0x0020 || cp == 0x0085 ||
      cp == 0x00A0 || cp == 0x1680 || (cp >= 0x2000 && cp <= 0x200A) ||
      cp == 0x2028 || cp == 0x2029 || cp == 0x202F || cp == 0x205F ||
      cp == 0x3000

  /** [[charHash]] over CODEPOINTS — identical to the UTF-16 fold for
    * BMP strings, and to DuckDB's unicode(c) fold for every string. */
  def charHashCp(s: String): Long = {
    var acc = Seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Tokens split on any [[WhitespaceCp]] codepoint, empties dropped. */
  def tokensCp(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](64)
    var start = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (isWhitespaceCp(cp)) {
        if (i > start) out += s.substring(start, i)
        start = i + w
      }
      i += w
    }
    if (s.length > start) out += s.substring(start, s.length)
    out.toArray
  }

  /** [[distinctShingleHashes]] on the codepoint tier: [[tokensCp]]
    * tokens, shingles joined by U+0020, [[charHashCp]] folds. */
  def distinctShingleHashesCp(s: String, n: Int): Array[Long] = {
    val toks = tokensCp(s)
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length >= n) {
      var i = 0
      while (i + n <= toks.length) {
        var acc = Seed
        var j = 0
        while (j < n) {
          if (j > 0) acc = (acc * 31 + ' ') % Mod
          val t = toks(i + j)
          var k = 0
          while (k < t.length) {
            val cp = t.codePointAt(k)
            acc = (acc * 31 + cp) % Mod
            k += Character.charCount(cp)
          }
          j += 1
        }
        set.add(acc)
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def simhash60(hs: Array[Long]): Long = {
    var result = 0L
    var j = 0
    while (j < 30) {
      var bitSum = 0L
      var bitSum2 = 0L
      var i = 0
      while (i < hs.length) {
        val h = hs(i)
        bitSum += ((h >> j) & 1L) * 2 - 1
        bitSum2 += (((Lcg60A * h + Lcg60C) % MinhashMod >> j) & 1L) * 2 - 1
        i += 1
      }
      if (bitSum >= 0) result |= (1L << j)
      if (bitSum2 >= 0) result |= (1L << (j + 30))
      j += 1
    }
    result
  }
}

/** Word n-gram shingle strings (tokens joined by one space) — native twin
  * of TextFunctions.hof-style shingles; empty array for short docs. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShinglesExpr.evalShingles(v.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShinglesExpr.evalShingles($c.toString(), $n)")
  override protected def withNewChildInternal(c: Expression): ShinglesExpr = copy(child = c)
}

object ShinglesExpr {
  /** Codegen entry point (mirrors nullSafeEval). */
  def evalShingles(s: String, n: Int): GenericArrayData = {
    val toks = TextHash.tokens(s)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        out(i) = UTF8String.fromString(toks.slice(i, i + n).mkString(" "))
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** charHash(text) — rolling polynomial hash; document fingerprint. */
case class CharPolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.charHash(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.charHash($c.toString())")
  override protected def withNewChildInternal(c: Expression): CharPolyHash = copy(child = c)
}

/** MinHash signature (length k) over distinct n-gram shingle hashes. */
case class MinhashShingleSig(child: Expression, k: Int, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val hs = TextHash.distinctShingleHashes(v.asInstanceOf[UTF8String].toString, n)
    new GenericArrayData(TextHash.minhashSig(hs, k))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.minhashSig(" +
        s"graft.plans.TextHash.distinctShingleHashes($c.toString(), $n), $k))")
  override protected def withNewChildInternal(c: Expression): MinhashShingleSig = copy(child = c)
}

/** 30-bit SimHash over distinct word n-gram shingle hashes (n=1 → unigram
  * tokens; larger n restores discriminative power on small vocabularies,
  * where nearly every doc shares the same token SET). */
case class Simhash30Expr(child: Expression, n: Int = 1) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash30(TextHash.distinctShingleHashes(v.asInstanceOf[UTF8String].toString, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHash.simhash30(" +
        s"graft.plans.TextHash.distinctShingleHashes($c.toString(), $n))")
  override protected def withNewChildInternal(c: Expression): Simhash30Expr = copy(child = c)
}

/** 60-bit SimHash over distinct word n-gram shingle hashes — the
  * hamming-LSH banding signature ([[TextHash.simhash60]] for why 30 bits
  * is not enough at corpus scale). */
case class Simhash60Expr(child: Expression, n: Int = 1) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash60(TextHash.distinctShingleHashes(v.asInstanceOf[UTF8String].toString, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHash.simhash60(" +
        s"graft.plans.TextHash.distinctShingleHashes($c.toString(), $n))")
  override protected def withNewChildInternal(c: Expression): Simhash60Expr = copy(child = c)
}

/** MinHash LSH band hashes straight from text in ONE pass (round 18,
  * guide §1.2 per-task work): tokenize once, shingle-hash, MinHash
  * signature, band fold — where the former composition paid (a) a
  * separate [[TokenCountExpr]] string pass for the sub-shingle filter,
  * (b) a second tokenization inside [[MinhashShingleSig]], and (c) an
  * interpreted CodegenFallback HOF fold (`transform`+`aggregate`) for
  * the band hashes. Returns an EMPTY array for docs with fewer than `n`
  * tokens — `posexplode` then emits no rows, which is exactly the
  * hazard-1 filter semantics (LshOps: a sub-`n`-token doc cannot be a
  * shingle near-dup of anything; letting its all-zero signature band
  * would form one mega-bucket). Bit-equal for surviving docs to
  * `lshBandHashes(minhashShingleSignature(text, k, n), nBands,
  * rowsPerBand)` — parity-gated in NativeExprSpec. */
case class MinhashBandsExpr(child: Expression, k: Int, n: Int, nBands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    MinhashBandsExpr.evalBands(
      v.asInstanceOf[UTF8String].toString, k, n, nBands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinhashBandsExpr.evalBands(" +
        s"$c.toString(), $k, $n, $nBands, $rowsPerBand)")
  override protected def withNewChildInternal(c: Expression): MinhashBandsExpr =
    copy(child = c)
}

object MinhashBandsExpr {
  /** Codegen entry point (mirrors nullSafeEval). Band fold is the
    * charHash fold over `rowsPerBand` consecutive signature values:
    * acc₀ = 7; acc = (acc·31 + v) mod 1e9+7 — max intermediate
    * ≈ (1e9+7)·31 + 2³¹ ≈ 3.3e10 « 2⁶³, exact in Long. */
  def evalBands(
      s: String, k: Int, n: Int, nBands: Int, rowsPerBand: Int): GenericArrayData = {
    val toks = TextHash.tokens(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val sig = TextHash.minhashSig(
      TextHash.distinctShingleHashesFromTokens(toks, n), k)
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var acc = TextHash.Seed
      var r = b * rowsPerBand
      val end = r + rowsPerBand
      while (r < end) {
        acc = (acc * 31 + sig(r)) % TextHash.Mod
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Banded 60-bit SimHash as `array<struct<sh, bv>>` in ONE pass
  * (round 18): element b carries the signature and its b-th band value;
  * EMPTY array when the doc has fewer than `n` tokens (the hazard-1
  * sub-shingle drop) or the text is null — a codegen'd `posexplode`
  * then emits zero rows, exactly the former `tokenCount` filter.
  *
  * Why this shape and not the two alternatives measured first:
  *  - a guarded nullable scalar + `filter(isNotNull)` hit the
  *    guide-§4.4 trap — the optimizer pushed the predicate below the
  *    projection and every surviving doc paid the signature TWICE;
  *  - a CodegenFallback Generator evaluated once but broke the
  *    whole-stage span around the Generate — measured a wash at the
  *    gsf10 decade probe (the saved tokenization cancelled against the
  *    interpreted row boundary).
  * This form keeps BOTH: one tokenization (the expression) and full
  * codegen (`posexplode` of an array is codegen-supported).
  *
  * Band extraction parity: element b's value is `(sh >> b·bandBits) &
  * (2^bandBits − 1)` — exactly the former `shiftright` legs, with the
  * posexplode index as `b`. */
case class Simhash60BandedExpr(child: Expression, n: Int, nBands: Int, bandBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sh", LongType, nullable = false),
    StructField("bv", LongType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Simhash60BandedExpr.evalBanded(
      v.asInstanceOf[UTF8String].toString, n, nBands, bandBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Simhash60BandedExpr.evalBanded(" +
        s"$c.toString(), $n, $nBands, $bandBits)")
  override protected def withNewChildInternal(c: Expression): Simhash60BandedExpr =
    copy(child = c)
}

object Simhash60BandedExpr {
  /** Codegen entry point (mirrors nullSafeEval). */
  def evalBanded(s: String, n: Int, nBands: Int, bandBits: Int): GenericArrayData = {
    val toks = TextHash.tokens(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val sh = TextHash.simhash60(TextHash.distinctShingleHashesFromTokens(toks, n))
    val mask = (1L << bandBits) - 1
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      out(b) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](sh, (sh >> (b * bandBits)) & mask))
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Codepoint-tier [[CharPolyHash]] — [[TextHash.charHashCp]]. */
case class CharPolyHashCp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.charHashCp(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.charHashCp($c.toString())")
  override protected def withNewChildInternal(c: Expression): CharPolyHashCp = copy(child = c)
}

/** Token count ([[TextHash.tokenCount]]) — bit-equal to
  * `size(tokens(text))` on non-null input and null on null (Spark 4's
  * ANSI default disables the legacy size-of-null=-1; spec-pinned),
  * without materializing the token array (round 17): the sub-shingle
  * filters and document-length features only consume the number. */
case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.tokenCount(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHash.tokenCount($c.toString())")
  override protected def withNewChildInternal(c: Expression): TokenCountExpr = copy(child = c)
}

/** Codepoint-tier token array ([[TextHash.tokensCp]]) — Unicode
  * White_Space boundaries instead of U+0020 alone. */
case class TokensCpExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TokensCpExpr.evalTokens(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokensCpExpr.evalTokens($c.toString())")
  override protected def withNewChildInternal(c: Expression): TokensCpExpr = copy(child = c)
}

object TokensCpExpr {
  /** Codegen entry point (mirrors nullSafeEval). */
  def evalTokens(s: String): GenericArrayData =
    new GenericArrayData(
      TextHash.tokensCp(s).map(UTF8String.fromString(_): Any))
}

/** Codepoint-tier MinHash signature — [[TextHash.distinctShingleHashesCp]]
  * shingle hashes through the same permutations. */
case class MinhashShingleSigCp(child: Expression, k: Int, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val hs = TextHash.distinctShingleHashesCp(v.asInstanceOf[UTF8String].toString, n)
    new GenericArrayData(TextHash.minhashSig(hs, k))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.TextHash.minhashSig(" +
        s"graft.plans.TextHash.distinctShingleHashesCp($c.toString(), $n), $k))")
  override protected def withNewChildInternal(c: Expression): MinhashShingleSigCp = copy(child = c)
}

/** Codepoint-tier 60-bit SimHash. */
case class Simhash60CpExpr(child: Expression, n: Int = 1) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash60(TextHash.distinctShingleHashesCp(v.asInstanceOf[UTF8String].toString, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHash.simhash60(" +
        s"graft.plans.TextHash.distinctShingleHashesCp($c.toString(), $n))")
  override protected def withNewChildInternal(c: Expression): Simhash60CpExpr = copy(child = c)
}

/** Per-document term frequencies in ONE pass:
  * `struct(counts: map<token, count>, dl: int)` — the token multiset a
  * document contributes to every corpus statistic (tf-idf, BM25,
  * c-TF-IDF, entropy), computed WITHOUT materializing one row per token
  * occurrence.
  *
  * Why native (round 16, BENCH evidence): the family's former shape —
  * `explode(tokens(text))` then `groupBy(id, token).count()` — pays (a)
  * one generated row PER OCCURRENCE through the codegen pipeline and (b)
  * a full exchange keyed on (id, token), even though every document's
  * occurrences are already co-located in its single input row. This
  * expression folds the count inside the row, so `explode(counts)` emits
  * one row per DISTINCT term (corpus row volume ÷ the repetition factor)
  * and the per-document tf table needs NO shuffle at all — at 100 TB the
  * term-frequency stage becomes embarrassingly parallel scan work.
  *
  * Determinism: map keys carry first-occurrence order, but every consumer
  * aggregates or joins on the key, so downstream results are
  * order-independent; counts are exact integers — bit-identical to the
  * exploded `count(*)` the DuckDB oracles restate. Tokenizer is
  * [[TextHash.tokens]] = split(' ') + drop empties, the exact semantics
  * of `TextFunctions.tokens`. `dl` is the occurrence total (= former
  * `size(tokens(text))`). */
case class TokenCountsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenCountsExpr.OutType
  override protected def nullSafeEval(v: Any): Any =
    TokenCountsExpr.evalCounts(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TokenCountsExpr.evalCounts($c)")
  override protected def withNewChildInternal(c: Expression): TokenCountsExpr = copy(child = c)
}

object TokenCountsExpr {
  val OutType: StructType = StructType(Seq(
    StructField("counts",
      MapType(StringType, LongType, valueContainsNull = false), nullable = false),
    StructField("dl", IntegerType, nullable = false)))

  /** Codegen entry point (mirrors nullSafeEval). Byte-native: token
    * slices stay UTF8String views over one shared byte array — no
    * String decode/encode anywhere on the hot path (the space byte 0x20
    * never occurs inside a UTF-8 multibyte sequence, so splitting on it
    * is exact for any input). */
  def evalCounts(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = ShingleCountsExpr.tokenSlices(u)
    ShingleCountsExpr.countsRow(toks, toks.length)
  }
}

/** Per-document word n-gram frequencies in ONE pass:
  * `map<shingle, count>` over the same shingle strings as
  * [[ShinglesExpr]] (tokens joined by one space) — the bigram/LM and PMI
  * twin of [[TokenCountsExpr]], with the same explode-volume and
  * no-shuffle rationale. Empty map for docs shorter than `n` tokens. */
case class ShingleCountsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleCountsExpr.evalCounts(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleCountsExpr.evalCounts($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleCountsExpr = copy(child = c)
}

object ShingleCountsExpr {
  private val Space = UTF8String.fromString(" ")

  /** Whitespace-token UTF8String views over the input's byte array —
    * byte-level twin of [[TextHash.tokens]] (split 0x20, drop empties). */
  private[plans] def tokenSlices(u: UTF8String): Array[UTF8String] = {
    val nBytes = u.numBytes()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](64)
    var start = 0
    var i = 0
    while (i <= nBytes) {
      if (i == nBytes || u.getByte(i) == 0x20) {
        if (i > start) out += slice(u, start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  private def slice(u: UTF8String, from: Int, until: Int): UTF8String =
    UTF8String.fromAddress(u.getBaseObject, u.getBaseOffset + from, until - from)

  /** Codegen entry point (mirrors nullSafeEval). */
  def evalCounts(u: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.MapData = {
    val toks = tokenSlices(u)
    if (toks.length < n) countsMap(Array.empty[UTF8String], 0)
    else if (n == 1) countsMap(toks, toks.length)
    else {
      val m = toks.length - n + 1
      val sh = new Array[UTF8String](m)
      var i = 0
      while (i < m) {
        sh(i) = UTF8String.concatWs(Space, toks.slice(i, i + n): _*)
        i += 1
      }
      countsMap(sh, m)
    }
  }

  /** First-occurrence-ordered exact counts of `vals[0..len)`. */
  private[plans] def countsMap(
      vals: Array[UTF8String], len: Int): org.apache.spark.sql.catalyst.util.ArrayBasedMapData = {
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](
      math.max(16, len * 2))
    var i = 0
    while (i < len) {
      val c = m.get(vals(i))
      if (c == null) m.put(vals(i), Array(1L)) else c(0) += 1L
      i += 1
    }
    val keys = new Array[Any](m.size)
    val cnts = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      // clone() copies the slice out of the (possibly row-buffer-backed)
      // input bytes: map contents must own their storage once emitted.
      keys(j) = e.getKey.clone()
      cnts(j) = e.getValue()(0)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(cnts))
  }

  /** [[TokenCountsExpr]] row: (counts, occurrence total). */
  private[plans] def countsRow(
      vals: Array[UTF8String], len: Int): org.apache.spark.sql.catalyst.InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](countsMap(vals, len), len))
}

/** Per-document Shannon token entropy in ONE pass:
  * `struct(raw: double, n_unique: int)`, null when the doc has no tokens
  * (the consumer filters, matching the explode-based row drop).
  *
  * Why native (round 16 decade probe): the HOF formulation — two
  * `aggregate` folds over `array_sort(map_entries(counts))` — is
  * CodegenFallback, so the projection runs interpreted, per-element
  * lambdas and all, and every column referencing the array re-evaluates
  * it (no subexpression elimination outside codegen): 6.4 s → 22.8 s at
  * the 10× corpus. This expression computes the identical math once per
  * row inside codegen.
  *
  * Float contract (bit-identical to the HOF tree and the DuckDB oracle):
  * entries sorted by token in BINARY order (UTF8String.compareTo — the
  * same ordering array_sort and the oracle's ORDER BY tok use), folds
  * `n = Σc` and `s = Σ c·ln c` in that order with `StrictMath.log` —
  * Spark's own Log expression folds StrictMath, and the Math.log
  * intrinsic really is 1 ulp off on this corpus (measured: 92/500 docs)
  * — raw entropy = `ln(n) − s/n` UNROUNDED; the query applies the same
  * `round(_, 6)` it always did. */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenEntropyExpr.OutType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    TokenEntropyExpr.evalEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("entropyRow")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow $res =
        graft.plans.TokenEntropyExpr.evalEntropy($c);
      if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): TokenEntropyExpr = copy(child = c)
}

object TokenEntropyExpr {
  val OutType: StructType = StructType(Seq(
    StructField("raw", DoubleType, nullable = false),
    StructField("n_unique", IntegerType, nullable = false)))

  /** Codegen entry point (mirrors nullSafeEval); null for token-less docs. */
  def evalEntropy(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = ShingleCountsExpr.tokenSlices(u)
    if (toks.length == 0) return null
    val m = new java.util.TreeMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < toks.length) {
      val c = m.get(toks(i))
      if (c == null) m.put(toks(i), Array(1L)) else c(0) += 1L
      i += 1
    }
    var n = 0.0d
    var s = 0.0d
    val it = m.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      n += c
      s += c * java.lang.StrictMath.log(c)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](java.lang.StrictMath.log(n) - s / n, m.size))
  }
}

/** Occurrence count of tokens belonging to a fixed word set — the
  * language-marker / stopword counter behind langId, stopwordRatio and
  * the quality gates (E62/E74 family).
  *
  * Why native (round 16): the HOF form `size(filter(tokens(c), isin))`
  * is a HigherOrderFunction — CodegenFallback, interpreted lambda per
  * token — and langId evaluates FOUR of them per document. This is one
  * byte-native pass: token slices over the input's bytes (no String
  * decode), membership against a prebuilt UTF8String hash set. Exact
  * integer multiset count — bit-identical to the HOF form and the
  * oracle's list_filter + len. */
case class TokenSetCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, words.size * 2))
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override protected def nullSafeEval(v: Any): Any =
    TokenSetCountExpr.countIn(v.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TokenSetCountExpr.countIn($c, $setRef)")
  }
  override protected def withNewChildInternal(c: Expression): TokenSetCountExpr =
    copy(child = c)
}

object TokenSetCountExpr {
  /** Codegen entry point (mirrors nullSafeEval). */
  def countIn(u: UTF8String, set: java.util.HashSet[UTF8String]): Int = {
    val toks = ShingleCountsExpr.tokenSlices(u)
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) n += 1
      i += 1
    }
    n
  }
}
