package graft.operators

import graft.functions.TextFunctions.{shingleCounts, shingles, tokenCount, tokenCounts, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical ranking + statistical language-model scoring over a document
  * corpus (SURVEY §2.3 extension surface: text analysis / quality
  * scoring; reference scope per `Etl_data_pipeline/README.md:1-40` —
  * the reference moves tables and leaves analysis to downstream SQL;
  * here the analysis operators are first-class).
  *
  * All three operators share one scalable shape:
  *
  *   1. per-document term explode (narrow after the scan — the only
  *      row-count amplification, bounded by token count);
  *   2. corpus-statistic aggregation (term / bigram counts) — ONE
  *      shuffle whose output is VOCABULARY-sized, not corpus-sized, so
  *      at 100 TB the statistics tables are orders of magnitude smaller
  *      than the input and usually auto-broadcast back (AQE sizes the
  *      join side at runtime; no hint needed, and at trillion-token
  *      scale where the vocab outgrows the broadcast threshold the same
  *      plan degrades gracefully to a shuffle hash join keyed on the
  *      term — never a cross join);
  *   3. a score projection + (for the ranked variants) per-document
  *      window or global top-N, both partition-parallel.
  *
  * Cache lifecycle: the operators persist their shared statistics frame
  * (see dfFromTf for the measured reason) and do NOT unpersist it — the
  * returned DataFrame is lazy and still reads the cache, so releasing it
  * here would defeat the sharing. Each operator eagerly PINS its result
  * with `localCheckpoint(true)` — the output is orders of magnitude
  * smaller than the token/bigram explode the cache holds (top-k
  * keywords, top-N scores, one row per doc) — and unpersists every
  * internal cache before returning (the round-8 neardupCore
  * discipline). A long-lived session calling these in a loop therefore
  * never accumulates corpus-sized cache entries (spec-gated:
  * RankOpsSpec asserts `cacheManager.isEmpty` after each call); the
  * pinned result lives as executor-local disk/memory blocks released
  * by GC with the frame. The pin is `localCheckpoint`, which truncates
  * lineage: on a cluster, losing the executor holding a block makes
  * the returned frame unrecoverable (same accepted trade as
  * neardupCore — the alternative is keeping the corpus-sized explode
  * cache alive for re-derivation). A deployment with preemptible
  * executors that needs recoverable results writes the frame to its
  * own storage immediately, or swaps in a reliable `checkpoint` dir.
  *
  * Determinism contract: scores are ROUNDED (4 dp) and every rank/top-N
  * breaks ties on the token / doc id, so the selected rows are a pure
  * function of the data — the DuckDB oracles restate the same integer
  * counts and the same `ln`-based formulas.
  */
object RankOps {

  /** (id, dl, token, tf) — within-document term frequencies, plus `dl`
    * (document length in tokens). NO shuffle and no per-occurrence rows
    * (round 16): the native [[tokenCounts]] folds each document's counts
    * inside its row, so this is scan → project → generate — one output
    * row per distinct term, already complete. The former
    * explode+groupBy shape paid a corpus-sized exchange on (id, token)
    * for counts that were per-row-computable all along. */
  def termFrequencies(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), tokenCounts(col(textCol)).as("_tc"))
      .select(col(idCol), col("_tc").getField("dl").as("dl"),
        explode(col("_tc").getField("counts")))
      .select(col(idCol), col("dl"), col("key").as("token"), col("value").as("tf"))

  /** df DERIVED from an already-computed tf table: tf has exactly one
    * row per (doc, token), so counting rows per token IS the document
    * frequency. The caller PERSISTS tf (and materializes it eagerly)
    * before handing it over — measured round 10: neither Catalyst nor
    * AQE's stage dedup reuses the tf subtree across the score-join and
    * df branches (the consumers require different partitionings), so
    * without the persist this derivation re-pays the corpus explode
    * AND adds an exchange — strictly worse than an independent df
    * scan. With it, the corpus-sized explode runs exactly once and df
    * is one vocabulary-sized re-aggregation of the cache (the q48
    * banded-frame discipline). */
  private def dfFromTf(tf: DataFrame): DataFrame =
    tf.groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** Top-`k` keyword extraction per document by tf-idf:
    * `score = (tf / dl) * ln(N / df)`, rank within document by
    * (rounded score desc, token asc). The classic per-doc keyword
    * summary (inverted-index weighting, Spärck Jones 1972 — public). */
  def tfidfTopK(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // Persist + eager materialize: the score join and the df derivation
    // both read tf; without the cache each would re-run the corpus
    // explode (no exchange reuse fires across the branches — see
    // dfFromTf), and eager materialization keeps the two join sides
    // from racing to populate the cache.
    val tf = termFrequencies(docs, textCol, idCol).persist()
    tf.count()
    val scored = tf
      .join(dfFromTf(tf), "token")
      .crossJoin(broadcast(n))
      .withColumn("score", round(
        col("tf").cast("double") / col("dl") *
          log(col("n_docs").cast("double") / col("df")), 4))
    // Bounded-buffer grouped top-k (the E76/q112 discipline), NOT a
    // row_number window: the window shuffles EVERY scored (doc, token)
    // row to its doc's reducer and sorts whole per-doc vocabularies
    // there; the k-bounded partial aggregate ships at most k entries per
    // (doc × map partition) and never sorts a whole group.
    val out = scored
      .groupBy(col(idCol))
      .agg(TopKOps.topKStr(k)(col("score"), col("token")).as("_tk"))
      .select(col(idCol), posexplode(col("_tk.items")))
      .select(col(idCol), col("col.id").as("token"), col("col.v").as("score"),
        (col("pos") + 1).cast("int").as("rn"))
      .localCheckpoint(true)
    tf.unpersist()
    out
  }

  /** BM25 ranked retrieval (Robertson–Spärck Jones, public): global
    * top-`topN` documents for a bag of query `terms`.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    *
    * The query-term filter lands BEFORE the per-term join (an `isin`
    * prune on the exploded terms), so the join input is |terms|·N_docs
    * rows at most — at scale the df/avgdl statistics are a handful of
    * broadcast scalars and the whole query is scan → narrow score →
    * TakeOrderedAndProject (no global sort materialization). */
  def bm25(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 100): DataFrame = {
    require(terms.nonEmpty, "empty query")
    require(topN >= 1, s"topN out of range: $topN")
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(tokenCount(col(textCol))).as("avgdl"))
    // The isin prune is pushed below the tf aggregation by Catalyst
    // (grouping-key predicate), so only query-term rows survive the
    // explode's shuffle; df then derives from the pruned tf (one row
    // per (doc, term)) instead of paying a second corpus explode. The
    // pruned tf is |terms|·N_docs rows at most — persisted + eagerly
    // materialized for the same two-consumer reason as tfidfTopK.
    val tf = termFrequencies(docs, textCol, idCol)
      .filter(col("token").isin(terms.map(x => x: Any): _*))
      .persist()
    tf.count()
    val df = dfFromTf(tf)
    val idf: Column = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    // Constant arithmetic stays INSIDE the expression tree (folded by
    // Catalyst with the same IEEE semantics DuckDB folds its literals
    // with) — `lit(k1 + 1.0)` computed in Scala can differ in the last
    // ulp from the SQL literal the oracle would parse.
    val termScore: Column =
      idf * (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * col("dl") / col("avgdl")))
    val out = tf.join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(round(sum(termScore), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topN)
      .localCheckpoint(true)
    tf.unpersist()
    out
  }

  /** Conjunctive (AND-semantics) BM25: [[bm25]] restricted to documents
    * containing EVERY query term — the retrieval-audit gate a bag-of-
    * terms score can't express (a doc drowning in one term outranks a
    * doc matching all of them). The gate derives from the same pruned
    * tf table the score reads: tf has one row per (doc, present term),
    * so `count(*) = |terms|` per doc IS the conjunction — no second
    * corpus pass, one doc-keyed semi-join. Output shape matches
    * [[bm25]]; ties and rounding follow the same determinism contract. */
  def conjunctiveBm25(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 100): DataFrame = {
    val qTerms = terms.distinct
    require(qTerms.nonEmpty, "empty query")
    require(topN >= 1, s"topN out of range: $topN")
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(tokenCount(col(textCol))).as("avgdl"))
    val tf = termFrequencies(docs, textCol, idCol)
      .filter(col("token").isin(qTerms.map(x => x: Any): _*))
      .persist()
    tf.count()
    val matched = tf.groupBy(col(idCol))
      .agg(count(lit(1)).as("_nt"))
      .filter(col("_nt") === qTerms.size)
      .select(col(idCol))
    val df = dfFromTf(tf)
    val idf: Column = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val termScore: Column =
      idf * (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * col("dl") / col("avgdl")))
    val out = tf
      .join(matched, Seq(idCol), "left_semi")
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(round(sum(termScore), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topN)
      .localCheckpoint(true)
    tf.unpersist()
    out
  }

  /** BATCH BM25: a whole TABLE of queries — `(query_id, term)` rows —
    * scored against the corpus in ONE corpus pass, returning each
    * query's top-`topN` documents. The per-query [[bm25]] re-pays the
    * corpus token explode on every call; a retrieval-evaluation or
    * query-log workload of Q queries must not cost Q corpus scans.
    *
    * Plan shape (the whole point): the query table is workload-sized —
    * broadcast by contract — so (1) its distinct terms prune the
    * exploded tokens with a broadcast semi-join BEFORE the tf shuffle
    * (rows surviving the explode ∝ matched terms, independent of Q);
    * (2) df/avgdl derive from the pruned tf exactly as in [[bm25]];
    * (3) fan-out to queries is a broadcast equi-join on the term —
    * each (doc, term) row duplicates only per query CONTAINING that
    * term; (4) the per-query cut is the bounded-buffer grouped top-k
    * (E76), never a window sort over whole queries' score lists.
    * Same determinism contract as [[bm25]]: scores rounded 4 dp, rank
    * ties broken by doc id; repeated (query_id, term) pairs are
    * deduplicated (set semantics, matching the Seq-based variants).
    *
    * Output: one row per (query_id, rank, doc, score), rank 1-based. */
  def bm25Batch(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queries: DataFrame,
      queryIdCol: String = "query_id",
      termCol: String = "term",
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 100): DataFrame = {
    require(topN >= 1, s"topN out of range: $topN")
    val q = queries.select(col(queryIdCol), col(termCol).as("token"))
      .distinct().persist()
    val qTerms = q.select(col("token")).distinct()
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(tokenCount(col(textCol))).as("avgdl"))
    // Round 18: the round-16 native-counts rewrite finally reaches this
    // variant. The old shape kept a per-OCCURRENCE explode + groupBy
    // because the broadcast semi-join prune could not sink through the
    // aggregation — but [[termFrequencies]] has carried the counts
    // inside each document's row (no groupBy at all) since round 16, so
    // the prune now applies directly to the narrow generate output and
    // the tf build is scan → project → generate → broadcast semi-join:
    // ZERO exchanges where the old build paid a corpus-sized
    // (id, dl, token) aggregation shuffle. Counts and dl are identical
    // by the termFrequencies contract (exact integer counts, dl = total
    // occurrences). Broadcast: the query table is workload-sized.
    val tf = termFrequencies(docs, textCol, idCol)
      .join(broadcast(qTerms), Seq("token"), "left_semi")
      .persist()
    tf.count()
    val df = dfFromTf(tf)
    val idf: Column = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val termScore: Column =
      idf * (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * col("dl") / col("avgdl")))
    val scored = tf
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .join(broadcast(q), Seq("token"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(termScore), 4).as("score"))
    val out = TopKOps.groupedTopK(scored, queryIdCol, "score", idCol, topN)
      .localCheckpoint(true)
    tf.unpersist(); q.unpersist()
    out
  }

  /** Exact-phrase retrieval: documents containing the token sequence
    * `phrase` verbatim, with the (overlap-counted) occurrence count.
    * The phrase of length n IS an n-gram shingle, so matching is the
    * existing shingle explode + an equality filter — the filter sits
    * directly on the exploded value (narrow, codegen'd, no join), and
    * the only shuffle is the doc-keyed count. Output is the full match
    * set (phrase matches are selective by construction); rank the
    * result with [[bm25]]/[[conjunctiveBm25]] on the phrase terms when
    * a score is wanted. */
  def phraseMatch(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 tokens: $phrase")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ")),
      s"phrase tokens must be single non-empty words: $phrase")
    val p = phrase.mkString(" ")
    // Round 16: the per-document shingle-count map makes this a pure
    // projection — one map lookup per doc, no explode, no groupBy
    // shuffle. Docs without the phrase lower to null and drop.
    docs
      .select(col(idCol),
        element_at(shingleCounts(col(textCol), phrase.size), p).as("n_hits"))
      .filter(col("n_hits").isNotNull)
  }

  /** PMI collocation extraction (Church & Hanks 1990, public): the
    * corpus's most-associated adjacent word pairs.
    *
    * PMI(w1,w2) = ln(N·c(w1 w2) / (c_first(w1)·c_second(w2))) over
    * bigram INSTANCES (N = total bigrams; c_first/c_second are the
    * words' occurrence counts in first/second position), floored at
    * `minCount` instances to kill the noisy tail, global top-`topN` by
    * (rounded PMI desc, bigram asc) — a deterministic selection.
    *
    * Scale: the bigram explode is the only corpus-sized stage; all
    * three count tables are vocabulary-sized and join on the bigram /
    * its position words; the final cut is TakeOrderedAndProject. */
  def pmiCollocations(
      docs: DataFrame,
      textCol: String,
      minCount: Int = 5,
      topN: Int = 50): DataFrame = {
    require(minCount >= 1 && topN >= 1, s"bad knobs: $minCount/$topN")
    // ONE corpus-sized explode + ONE aggregation; every statistic the
    // score needs (position marginals, the instance total, the floored
    // pair counts) derives from the vocabulary-sized bigram-count table.
    // The marginals sum UNFILTERED counts — the minCount floor applies
    // only to which pairs are reported, not to the probabilities.
    // Persisted + eagerly materialized: four statistics branches read
    // it, and no cross-branch exchange reuse fires (see dfFromTf).
    // Explode, not the count map (round-16 decade probe): within-doc
    // BIGRAM repetition is too low to pay the per-doc map build —
    // q140 read 1.4× slower on the folded form at gsf10 (tokenCounts is
    // the opposite: unigram repetition is high, see termFrequencies).
    val bAll = docs.select(explode(shingles(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .persist()
    bAll.count()
    val c12 = bAll.filter(col("c") >= minCount)
      .select(col("bigram"), col("c").as("c12"), col("w1"), col("w2"))
    val firsts = bAll.groupBy(col("w1")).agg(sum(col("c")).as("cf"))
    val seconds = bAll.groupBy(col("w2")).agg(sum(col("c")).as("cs"))
    val n = bAll.agg(sum(col("c")).as("n_bigrams"))
    val out = c12.join(firsts, "w1").join(seconds, "w2")
      .crossJoin(broadcast(n))
      .select(col("bigram"), col("c12"),
        // Numerator/denominator go to double BEFORE multiplying: at
        // trillion-bigram scale N·c12 (and cf·cs) overflow a long.
        round(log(col("n_bigrams").cast("double") * col("c12") /
          (col("cf").cast("double") * col("cs"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topN)
      .localCheckpoint(true)
    bAll.unpersist()
    out
  }

  /** Bigram language-model scoring with add-one smoothing — the
    * perplexity-proxy quality signal of CCNet-style pipelines (Wenzek et
    * al. 2019, public), self-trained on the corpus it scores:
    *
    * score(d) = avg over adjacent token pairs of −ln P(w2 | w1),
    * P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V),  V = |vocabulary|.
    *
    * Gibberish and boilerplate land far from the corpus mean; the score
    * feeds a quality gate the same way a trained LM's perplexity would,
    * with zero external model. Documents with fewer than 2 tokens have
    * no bigrams and are excluded (score undefined, not zero).
    *
    * Scale: bigram/unigram count tables are vocab²-bounded but Zipf-
    * concentrated (far below corpus size); both joins key on the bigram /
    * its first token. All counts are integers, so P is exactly rational
    * and the only float step is the final `ln`. */
  /** Class-based tf-idf (c-TF-IDF, Grootendorst 2022 / BERTopic —
    * public): the top-`k` terms that CHARACTERIZE each document class
    * (source, domain, cluster), treating each class as one
    * concatenated pseudo-document:
    *
    *   score(t, c) = (ctf(t,c) / len(c)) · ln(1 + A / ctf_all(t))
    *
    * ctf(t,c) = occurrences of t in class c, len(c) = class token
    * count, ctf_all(t) = t's total occurrences, A = average class
    * length. The `1 +` keeps the idf positive, so a term present in
    * every class is damped, not zeroed — the corpus-auditing view
    * ("what is each source actually made of") the per-document tf-idf
    * (E113) cannot give.
    *
    * Scale: one corpus-sized token explode into a (class × vocab)-sized
    * count table — the ONLY corpus-sized stage; len/A/ctf_all all
    * derive from that table (persisted, four branches — the dfFromTf
    * measurement); the per-class cut is the bounded-buffer grouped
    * top-k (E76 discipline), never a window over whole class
    * vocabularies. Integer counts throughout; the single float step is
    * the final divide·ln, rounded 4 dp with (score desc, token asc)
    * tie-break — the repo's cross-engine float rule. */
  def classTfidf(
      docs: DataFrame,
      textCol: String,
      classCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    // Per-document counts fold natively (round 16): the explode emits one
    // row per DISTINCT (doc, term) carrying its count, so the class
    // aggregation's input — and the map-side combine's hash table feed —
    // shrinks by the corpus repetition factor; the class-keyed shuffle
    // itself stays (classes span documents).
    val ctf = docs
      .select(col(classCol).as("cls"),
        explode(tokenCounts(col(textCol)).getField("counts")))
      .groupBy(col("cls"), col("key"))
      .agg(sum(col("value")).as("ctf"))
      .select(col("cls"), col("key").as("token"), col("ctf"))
      .persist()
    ctf.count()
    val classLen = ctf.groupBy(col("cls")).agg(sum(col("ctf")).as("cls_len"))
    val termAll = ctf.groupBy(col("token")).agg(sum(col("ctf")).as("ctf_all"))
    // A = total tokens / number of classes: two broadcast scalars.
    val avgLen = classLen
      .agg((sum(col("cls_len")).cast("double") /
        count(lit(1))).as("avg_len"))
    val scored = ctf
      .join(termAll, "token")
      .join(classLen, "cls") // classes-sized; broadcasts
      .crossJoin(broadcast(avgLen))
      .withColumn("score", round(
        col("ctf").cast("double") / col("cls_len") *
          log(lit(1.0) + col("avg_len") / col("ctf_all")), 4))
    val out = scored
      .groupBy(col("cls"))
      .agg(TopKOps.topKStr(k)(col("score"), col("token")).as("_tk"))
      .select(col("cls"), posexplode(col("_tk.items")))
      .select(col("cls").as(classCol), col("col.id").as("token"),
        col("col.v").as("score"), (col("pos") + 1).cast("int").as("rn"))
      .localCheckpoint(true)
    ctf.unpersist()
    out
  }

  def bigramLmScore(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // Same two-consumer persist discipline as the siblings (see dfFromTf):
    // the corpus-sized bigram explode feeds BOTH the count table and the
    // scoring join, and the vocab-sized unigram table feeds both V and
    // the w1 join — without the caches each would re-run its explode.
    // Explode, not the count map (round-16 decade probe: the folded
    // count-weighted form read 1.5× SLOWER at gsf10 — within-doc bigram
    // repetition is too low to pay the per-doc map build; contrast
    // termFrequencies, where unigram repetition makes the map win).
    // The unigram table keeps the tokenCounts fold: ITS repetition is
    // the high one, and the count-weighted sum equals count(*) exactly.
    val docBigrams = docs
      .select(col(idCol), explode(shingles(col(textCol), 2)).as("bigram"))
      .persist()
    docBigrams.count()
    val bigramCounts = docBigrams.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val unigramCounts = docs
      .select(explode(tokenCounts(col(textCol)).getField("counts")))
      .groupBy(col("key")).agg(sum(col("value")).as("c1"))
      .withColumnRenamed("key", "token")
      .persist()
    unigramCounts.count()
    val vocab = unigramCounts.agg(count(lit(1)).as("v"))
    val out = docBigrams
      .join(bigramCounts, "bigram")
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(unigramCounts.withColumnRenamed("token", "w1"), "w1")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(-log((col("c2") + lit(1)).cast("double") / (col("c1") + col("v")))), 4)
          .as("nll"))
      .localCheckpoint(true)
    docBigrams.unpersist()
    unigramCounts.unpersist()
    out
  }
}
