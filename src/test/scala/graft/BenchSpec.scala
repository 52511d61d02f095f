package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's noise triage: a deliberately "polluted" median
  * (>2× the committed reference) must self-label as an outlier and
  * re-run once; clean medians and genuine regressions must not be
  * silently rewritten. */
class BenchSpec extends AnyFunSuite {

  test("a polluted median self-labels and the re-run wins") {
    var reran = 0
    val (value, outlier) = Bench.reconcile(3.5, Some(1.0), () => { reran += 1; 1.1 })
    assert(reran == 1)
    assert(value == 1.1, "the collapsed re-run is the honest headline")
    assert(outlier.contains(Bench.Outlier(ref = 1.0, median = 3.5, rerun = 1.1)))
  }

  test("a genuine regression stays at its measured time but is still flagged") {
    // Real slowdowns reproduce: the re-run is as slow as the median, the
    // reported value doesn't shrink, and the flag says "look here".
    val (value, outlier) = Bench.reconcile(3.5, Some(1.0), () => 3.4)
    assert(math.abs(value - 3.4) < 1e-9)
    assert(outlier.exists(o => o.median == 3.5 && o.rerun == 3.4))
  }

  test("clean medians and reference-less queries never re-run") {
    var reran = 0
    assert(Bench.reconcile(1.8, Some(1.0), () => { reran += 1; 0.0 }) == (1.8, None))
    assert(Bench.reconcile(99.0, None, () => { reran += 1; 0.0 }) == (99.0, None))
    assert(Bench.reconcile(0.4, Some(1.0), () => { reran += 1; 0.0 }) == (0.4, None))
    assert(reran == 0)
  }

  test("reference medians parse from the committed detail JSON, scale-matched") {
    val json =
      """{"metric":"total","value":40.1,"unit":"sec","queries":{"q01_agg":1.250,"q03_join":0.470},"sf":"/root/testdata/sf0.1"}"""
    val refs = Bench.refMedians(json, "/root/testdata/sf0.1")
    assert(refs == Map("q01_agg" -> 1.25, "q03_join" -> 0.47))
    // A detail file recorded at a DIFFERENT scale is not a baseline.
    assert(Bench.refMedians(json, "/root/testdata/sf0.01").isEmpty)
    // Garbage must degrade to "no triage", never crash the bench.
    assert(Bench.refMedians("not json at all", "/root/testdata/sf0.1").isEmpty)
  }
}
