package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** E102 overlapping token-window chunking: the window-count rule (no
  * duplicate tail windows), the overlap contract, truncation at the
  * document end, empty-document behavior, and the narrow no-shuffle plan. */
class ChunkOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunks(text: String, chunk: Int, stride: Int) =
    ChunkOps.chunkByTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", chunk, stride)
      .orderBy($"chunk_id")
      .select($"chunk_id", $"start_tok", $"n_tok", $"chunk_text")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))

  test("short doc yields exactly one window, untruncated") {
    assert(chunks("a b c", 64, 48).toSeq == Seq((0, 0, 3, "a b c")))
  }

  test("doc exactly at the window size yields one window") {
    val text = (1 to 64).map(i => s"t$i").mkString(" ")
    val got = chunks(text, 64, 48)
    assert(got.length == 1 && got(0)._3 == 64)
  }

  test("windows overlap by chunk-stride and the last is truncated") {
    // 10 tokens, chunk 4, stride 3 → m = 1 + ceil(6/3) = 3:
    // [0,4) [3,7) [6,10) — starts 0/3/6, each overlapping 1 token.
    val text = (0 until 10).map(i => s"w$i").mkString(" ")
    assert(chunks(text, 4, 3).toSeq == Seq(
      (0, 0, 4, "w0 w1 w2 w3"),
      (1, 3, 4, "w3 w4 w5 w6"),
      (2, 6, 4, "w6 w7 w8 w9")))
  }

  test("no duplicate tail window: a start past coverage is never emitted") {
    // 5 tokens, chunk 4, stride 3 → m = 1 + ceil(1/3) = 2: [0,4) [3,5).
    // A third window at start 6 (past the doc) or a tail [3,5) fully
    // contained in a longer prior window must not appear.
    val text = "a b c d e"
    assert(chunks(text, 4, 3).toSeq == Seq(
      (0, 0, 4, "a b c d"), (1, 3, 2, "d e")))
    // 4 tokens, chunk 4, stride 3: the single window already covers the
    // doc — no second start.
    assert(chunks("a b c d", 4, 3).length == 1)
  }

  test("every token lands in at least one window; adjacent windows agree") {
    val text = (0 until 257).map(i => s"t$i").mkString(" ")
    val got = chunks(text, 64, 48)
    val covered = got.flatMap { case (_, start, n, _) => start until (start + n) }.toSet
    assert(covered == (0 until 257).toSet, "windows must cover the whole doc")
    // Overlap region of consecutive windows carries identical text.
    got.sliding(2).foreach {
      case Array((_, s1, n1, t1), (_, s2, _, t2)) =>
        val overlap = s1 + n1 - s2
        assert(overlap == 16 || s2 + 64 >= 257, s"unexpected overlap $overlap")
        assert(t1.split(" ").drop(s2 - s1).sameElements(t2.split(" ").take(overlap)))
      case _ => ()
    }
  }

  test("empty and whitespace-only docs yield no windows") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("doc_id", "text")
    val got = ChunkOps.chunkByTokens(df, "text", "doc_id", 4, 3)
      .select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }

  test("plans narrow: no shuffle, no window, whole-stage codegen") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = ChunkOps.chunkByTokens(df, "text", "doc_id", 4, 3)
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "chunking must not shuffle")
    assert(!plan.toString.contains("Window"))
  }

  test("invalid window parameters refuse loudly") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      ChunkOps.chunkByTokens(df, "text", "doc_id", 0, 1))
    intercept[IllegalArgumentException](
      ChunkOps.chunkByTokens(df, "text", "doc_id", 4, 0))
    intercept[IllegalArgumentException](
      ChunkOps.chunkByTokens(df, "text", "doc_id", 4, 5))
  }
}
