package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("chain merges transitively — the case pairwise purging gets wrong") {
    // a-b, b-c, no a-c edge: one cluster of three, labeled by its min.
    val labels = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("orientation, duplicates, and self-loops don't disturb the labeling") {
    val labels = cc(Seq((5L, 2L), (2L, 5L), (5L, 2L), (7L, 7L), (2L, 9L)))
    // 7's only edge is a self-loop: it's a singleton and singletons are
    // not emitted (callers union them back as component = id).
    assert(labels == Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("a long path converges within the diameter and labels to the global min") {
    val path = (1L until 12L).map(i => (i, i + 1))
    assert(cc(path) == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("non-convergence is loud, not a silently partial labeling") {
    val path = (1L until 12L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] { cc(path, maxIter = 2) }
    assert(e.getMessage.contains("still moving"))
  }

  test("empty edge list yields an empty labeling") {
    assert(cc(Seq.empty) == Map.empty)
  }
}
