package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering (AllPairs,
  * Bayardo/Ma/Srikant WWW 2007; PPJoin, Xiao/Wang/Lin/Yu WWW 2008 —
  * public). The exact complement of the approximate MinHash family
  * (E38/E87): same (doc_a, doc_b, jaccard) contract as the naive
  * inverted-index join (q50), but a pair becomes a candidate ONLY when
  * the two sets share an element inside their short canonical
  * PREFIXES — never one join row per shared element.
  *
  * Why it is exact: order the universe canonically (here: ascending
  * document frequency, element tie-break — rarest first). Give each
  * set x a prefix of its first `|x| − ⌈τ·|x|⌉ + 1` elements in that
  * order. If J(x, y) ≥ τ, let e be the smallest common element: every
  * common element sits at e's position or later in BOTH sets, so if e
  * were outside either prefix that set could hold at most
  * `⌈τ·|set|⌉ − 1 < τ·|set| ≤ |x ∩ y|` common elements — a
  * contradiction. Hence the prefixes intersect and the candidate join
  * finds the pair; every candidate is then verified with an EXACT
  * intersection count, so false candidates cost work, never wrong
  * answers (the DuckDB oracle is the NAIVE all-pairs join — the prefix
  * filter must reproduce it bit for bit).
  *
  * Scale shape: one corpus-sized element explode (persisted — four
  * consumers), a vocabulary-sized df aggregation, ONE per-set window
  * to rank elements by (df, e) (the window's count(*) gives |set| in
  * the same pass — no extra shuffle), the prefix self-join, and
  * candidate-bounded verification joins. Rarest-first ordering is what
  * bounds the self-join: a prefix element is by construction one of
  * the set's LOWEST-df elements, so the per-element join buckets stay
  * small exactly where the naive join explodes (a stopword bigram
  * shared by every document never enters a prefix unless a document
  * consists of almost nothing else). The knob that governs candidate
  * volume is τ itself — prefixes have length ⌈(1−τ)·|x|⌉ rounded up,
  * so τ→0 degenerates toward the naive join; this operator is the
  * HIGH-τ exact path (τ ≥ 0.5 in practice), and low-τ exploration
  * belongs to the banded approximate family (E38/E87/E90).
  *
  * Determinism: intersection/size arithmetic is integer; the only
  * float steps are the final IEEE divide and 4-dp round, and the ≥ τ
  * gate is applied to the ROUNDED value in both engines (the q50
  * rule). Sets are deduplicated at entry; empty sets produce no rows
  * (Jaccard is undefined there, and the naive oracle drops them the
  * same way).
  *
  * Cache lifecycle: the element explode is persisted (df branch,
  * prefix branch, both verification sides), the pair-sized result is
  * localCheckpoint-pinned, and the cache is released before returning
  * (the round-8 neardupCore discipline; spec-gated like RankOps).
  *
  * Reference scope: `Etl_data_pipeline` copies tables and leaves
  * analysis downstream (`README.md:1-40`); similarity joins are part
  * of the declared extension surface (SURVEY §2.3).
  */
object SetJoinOps {

  /** All pairs of rows whose element sets have Jaccard ≥ `tau`,
    * exactly. `elemsCol` is an array column (deduplicated here);
    * output is (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard
    * rounded to 4 dp. Ids must be unique — two rows sharing an id
    * would have their element sets silently merged WITH multiplicity
    * (the same contract as every id-keyed operator here).
    */
  def prefixJaccardJoin(
      items: DataFrame,
      idCol: String,
      elemsCol: String,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau out of range (0, 1]: $tau")

    // One row per (id, element), elements deduplicated — the only
    // corpus-sized amplification. Persist + eager materialize: the df
    // derivation, the prefix ranking, and both verification sides read
    // it (no exchange reuse fires across branches needing different
    // partitionings — the q130/dfFromTf measurement).
    val elems = items
      .select(col(idCol).as("id"), explode(array_distinct(col(elemsCol))).as("e"))
      .persist()
    elems.count()

    val prefix = prefixOf(elems, tau)

    // Candidate pairs: prefixes sharing any element. distinct() caps a
    // pair that shares several prefix elements at one verification.
    // Set sizes ride along from the prefix's own window pass (sz is a
    // pure function of the id, so distinct-on-(a,b,sizes) is
    // distinct-on-(a,b)) — carrying them here saves a separate size
    // aggregation plus two per-pair joins at the end.
    val cand = prefix.select(col("id").as("a"), col("e"), col("sz").as("sz_a"))
      .join(prefix.select(col("id").as("b"), col("e"), col("sz").as("sz_b")), "e")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sz_a"), col("sz_b"))
      .distinct()

    // Exact verification, candidate-bounded: re-attach a's elements,
    // keep those also in b, count — the true intersection size.
    val out = cand
      .join(elems.select(col("id").as("a"), col("e")), "a")
      .join(elems.select(col("id").as("b"), col("e")), Seq("b", "e"))
      .groupBy(col("a"), col("b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .select(
        col("a").as("doc_a"), col("b").as("doc_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= tau)
      .localCheckpoint(true)
    elems.unpersist()
    out
  }

  /** The canonical prefixes of each set in an exploded (id, e) frame:
    * rank elements rarest-first by (df, e) — the (df, e) tuple itself
    * is the canonical total order, no global dense-rank table — and
    * keep the first `|x| − ⌈τ'·|x|⌉ + 1` per set (count(*) over the
    * same window partition yields |set| in the same WindowExec pass).
    * Returns (id, e, sz) — the set size comes free from the window
    * pass and the join carries it to the final Jaccard arithmetic.
    *
    * τ' is a RELAXED threshold, for two reasons both of which only
    * LENGTHEN prefixes (more candidates, never fewer — exactness is
    * preserved because every candidate is verified):
    *  - the output gate keeps pairs whose 4-dp ROUNDED Jaccard ≥ τ,
    *    i.e. true J down to τ − 0.00005; candidate generation must
    *    cover that band, so τ' = τ − 0.00005;
    *  - `⌈τ'·sz⌉` is one IEEE multiply whose nearest-double τ' can
    *    land just ABOVE an integer k the exact rational sits on,
    *    making ceil return k+1 and the prefix one element short; the
    *    1e-9 downward epsilon (far larger than one ulp at any
    *    representable τ·sz, far smaller than the 5e-5 rounding band)
    *    pins ceil to the exact-arithmetic value or below.
    *
    * Package-visible so the spec can assert the ordering really keeps
    * ubiquitous elements OUT of prefixes — the property the join's
    * scalability rests on. */
  private[operators] def prefixOf(elems: DataFrame, tau: Double): DataFrame = {
    val tauRelaxed = tau - 0.00005
    val dfreq = elems.groupBy(col("e")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id"))
    elems
      .join(dfreq, "e") // vocab-sized side; AQE broadcasts when it fits
      .withColumn("pos", row_number().over(w.orderBy(col("df"), col("e"))))
      .withColumn("sz", count(lit(1)).over(w))
      .filter(col("pos") <=
        col("sz") - ceil(lit(tauRelaxed) * col("sz") - lit(1e-9)) + lit(1))
      .select(col("id"), col("e"), col("sz"))
  }
}
