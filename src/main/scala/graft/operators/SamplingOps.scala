package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling/splitting for training-data pipelines.
  *
  * The load-bearing design choice: membership decisions hash the ROW ID,
  * never draw from a partition-local RNG. Spark's `randomSplit`/`sample`
  * assign rows by where they happen to sit — re-partition the data (or run
  * on a different cluster size) and train/test membership silently changes,
  * which at best breaks reproducibility and at worst leaks test data into
  * training between runs. A hash of the id is a pure function of the row:
  * the same document lands on the same side on any cluster, any layout,
  * forever.
  */
object SamplingOps {

  /** Percent-bucket assignment for a row id: a pure function of (id, seed)
    * into [0, 100). */
  type BucketFn = (Column, Long) => Column

  /** Default bucket: xxhash64 — full avalanche, so adjacent ids (which
    * usually correlate with ingest time) scatter uniformly. */
  val xxhashBucket: BucketFn =
    (idCol, seed) => pmod(xxhash64(idCol, lit(seed)), lit(100L))

  /** Portable bucket: charHash of `"<id>:<seed>"` — the repo's shared
    * polynomial hash, restatable verbatim in any SQL engine (used by the
    * q78 DuckDB oracle). Weaker adjacent-id mixing than xxhash64; prefer
    * [[xxhashBucket]] unless cross-engine reproducibility is required. */
  val portableBucket: BucketFn =
    (idCol, seed) => pmod(
      graft.functions.TextFunctions.charHash(
        concat(idCol.cast("string"), lit(":" + seed.toString))),
      lit(100L))

  /** Seeded rank for the stratified pick: a pure (id, seed) function whose
    * ORDER decides which rows win. */
  type RankFn = (Column, Long) => Column

  /** Default rank: xxhash64 (full avalanche). */
  val xxhashRank: RankFn = (idCol, seed) => xxhash64(idCol, lit(seed))

  /** Portable rank: charHash of `"<id>:<seed>"` — restatable in SQL
    * engines (used by the q88 DuckDB oracle); same trade as
    * [[portableBucket]]. */
  val portableRank: RankFn = (idCol, seed) =>
    graft.functions.TextFunctions.charHash(
      concat(idCol.cast("string"), lit(":" + seed.toString)))

  /** Deterministic corpus-mixture sampling (SURVEY §2.3 E84): keep each
    * row with its SOURCE's target rate — the "2 parts web, 1 part code,
    * 0.1 part forums" weighting every pretraining mix specifies. Rates are
    * percents per source value; sources not listed keep `defaultPct`.
    * Membership is the same pure (id, seed) bucket as [[hashSplit]]:
    * layout-stable, reproducible, and — because the bucket is shared —
    * composable with the train/holdout split without correlation only if
    * seeds differ (document the seed-discipline, don't reuse).
    * Narrow filter: no shuffle, pushes to the scan. */
  def sourceMixture(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      ratesPct: Map[String, Int],
      defaultPct: Int,
      seed: Long,
      bucket: BucketFn = xxhashBucket): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100))
    val pct = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (src, p)) =>
      when(col(sourceCol) === src, lit(p)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), seed) < pct)
  }

  /** Deterministic train/holdout split: `trainPct`% of ids to the left
    * side. Disjoint, complete, and stable under any repartitioning. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      trainPct: Int,
      seed: Long,
      bucket: BucketFn = xxhashBucket): (DataFrame, DataFrame) = {
    require(trainPct > 0 && trainPct < 100, s"trainPct out of (0,100): $trainPct")
    val b = bucket(col(idCol), seed)
    (df.filter(b < trainPct), df.filter(b >= trainPct))
  }

  /** Temperature-scaled source mixture at α = 1/2 (square-root sampling
    * — the multilingual/multi-source mixing rule of mC4-style pipelines,
    * public): per-source keep-rate ∝ n_s^(α−1) normalized so the
    * SMALLEST source keeps 100 %, i.e. rate_s = max(⌊100·√(n_min/n_s)⌋, 1)
    * — dominant sources are damped toward √-proportions instead of
    * drowning the tail, and the max(…, 1) clamp keeps a source more than
    * 10^4× the smallest at 1 % instead of silently dropping it to 0. Unlike [[sourceMixture]] the rates are DERIVED
    * from the corpus, not configured.
    *
    * α is fixed at 1/2 deliberately: the rate then needs only sqrt and
    * division, both correctly-rounded IEEE ops, so the derived integer
    * rates are bit-identical on any engine — a general-α `pow` is not
    * correctly rounded and would make the keep-set engine-dependent.
    *
    * Scale shape: one vocabulary-of-sources aggregation, the rate table
    * broadcast back, then the same narrow pure-(id,seed) membership
    * filter as every sampler here. The derived `_graft_rate` column
    * rides on the output for observability. */
  def temperatureMixture(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      seed: Long,
      bucket: BucketFn = xxhashBucket): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_graft_n"))
    val nmin = counts.agg(min(col("_graft_n")).as("_graft_nmin"))
    // Rate floor of 1: integer-percent granularity means any source more
    // than 10^4 times the smallest would floor to rate 0 and be DROPPED
    // ENTIRELY — the opposite of the damped-not-drowned contract. The
    // clamp caps damping at 1% (the granularity's own limit); callers
    // needing deeper damping re-bucket at finer granularity upstream.
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col(sourceCol),
        greatest(
          floor(lit(100.0) * sqrt(col("_graft_nmin").cast("double") / col("_graft_n"))),
          lit(1L))
          .cast("long").as("_graft_rate"))
    df.join(broadcast(rates), sourceCol)
      .filter(bucket(col(idCol), seed) < col("_graft_rate"))
  }

  /** Leakage-safe group-aware split: the side is a pure function of the
    * GROUP key, so every member of a group lands on the same side.
    * The group key is whatever "must not leak across the boundary"
    * means for the corpus — a near-dup cluster id (a train/eval split
    * that separates near-duplicates leaks the training distribution
    * into the holdout and inflates eval; Lee et al. 2021's
    * deduplication argument, public), a source domain, a user id.
    * Composes with [[hashSplit]]'s seed discipline: same bucket
    * function, keyed on the group instead of the row. Narrow (the
    * caller supplies the group column, usually from a components
    * join); no shuffle of its own. */
  def groupSplit(
      df: DataFrame,
      groupCol: String,
      trainPct: Int,
      seed: Long,
      bucket: BucketFn = xxhashBucket): DataFrame = {
    require(trainPct > 0 && trainPct < 100, s"trainPct out of (0,100): $trainPct")
    df.withColumn("split",
      when(bucket(col(groupCol), seed) < trainPct, lit("train"))
        .otherwise(lit("holdout")))
  }

  /** The canonical leakage-safe split PIPELINE over LSH evidence:
    * banded signatures → candidate pairs → connected components →
    * [[groupSplit]] keyed on the component (singletons key on their own
    * id). One definition for the three call sites that previously
    * duplicated it verbatim (q134, q143, the LshRegime scale probe) —
    * the knobs (trainPct/seed/bucket) can no longer drift apart.
    * `bands` is any [[LshOps.bandedMinhash]]/`bandedMinhashAuto` band
    * frame; width policy stays the CALLER's decision (the queries pin
    * oracle widths, the probe runs auto). Output: (idCol, grp, split). */
  def componentSplit(
      docs: DataFrame,
      idCol: String,
      bands: DataFrame,
      trainPct: Int,
      seed: Long,
      bucket: BucketFn = xxhashBucket): DataFrame = {
    val pairs = LshOps.candidatePairs(bands, idCol)
    val comp = GraphOps.connectedComponents(pairs, "doc_a", "doc_b")
      .withColumnRenamed("v", idCol)
    groupSplit(
      docs.select(col(idCol))
        .join(comp, Seq(idCol), "left")
        .withColumn("grp", coalesce(col("component"), col(idCol)))
        .drop("component"),
      "grp", trainPct, seed, bucket)
  }

  /** Deterministic ~`pct`% subsample by id hash (stable under layout). */
  def hashSample(
      df: DataFrame,
      idCol: String,
      pct: Int,
      seed: Long,
      bucket: BucketFn = xxhashBucket): DataFrame =
    df.filter(bucket(col(idCol), seed) < pct)

  /** Exactly `n` rows per stratum (balanced corpus sampling — e.g. equal
    * docs per language), chosen by seeded id-hash order so the pick is
    * deterministic and layout-independent.
    *
    * Two-phase to survive hot strata: phase 1 splits every stratum into
    * `splits` deterministic salt groups and keeps each group's top-n, so a
    * 10 TB stratum is reduced by `splits` parallel tasks instead of
    * funneling through one sort; phase 2 ranks the ≤ `splits`·n survivors
    * per stratum — a bounded input no matter how large the stratum was.
    * The salt is a pure function of (id, seed), so the result is identical
    * on any layout and equals the single-phase pick (a global top-n row is
    * necessarily within its salt group's top-n).
    *
    * A stratum with FEWER than `n` rows contributes all of them — callers
    * needing guaranteed balance should verify per-stratum counts on the
    * result (a distributed pre-count here would double the cost for every
    * caller that doesn't need it).
    */
  def stratifiedFixedN(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      seed: Long,
      splits: Int = 64,
      rank: RankFn = xxhashRank): DataFrame = {
    // Bounded window (round-14 audit): phase 2 of the two-phase pick —
    // its input is localTopN's output, ≤ n × splits rows per stratum,
    // never the stratum's full population.
    val w = Window.partitionBy(col(strataCol)).orderBy(col("_graft_rk"), col(idCol))
    localTopN(df, strataCol, idCol, n, seed, splits, rank)
      .withColumn("_graft_rank", row_number().over(w))
      .filter(col("_graft_rank") <= n)
      .drop("_graft_rank", "_graft_rk", "_graft_salt")
  }

  /** Phase 1: per-(stratum, salt-group) top-n. Package-visible so the spec
    * can assert the reduction really spreads a hot stratum over many
    * groups. Keeps `_graft_rk`/`_graft_salt` for phase 2. The salt stays
    * xxhash64 regardless of `rank`: it only decides which parallel group
    * pre-filters a row (any superset works — the global (rank, id) order
    * alone fixes the final pick), so it never needs to be
    * oracle-expressible. */
  private[operators] def localTopN(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      seed: Long,
      splits: Int,
      rank: RankFn = xxhashRank): DataFrame = {
    require(splits > 0, s"splits must be positive: $splits")
    // Bounded window (round-14 audit): the salt splits a hot stratum
    // across `splits` parallel groups, so each partition sorts ~1/splits
    // of a stratum — the two-phase shape, not a one-task-per-stratum sort.
    val w = Window.partitionBy(col(strataCol), col("_graft_salt"))
      .orderBy(col("_graft_rk"), col(idCol))
    df.withColumn("_graft_rk", rank(col(idCol), seed))
      // Salt from an independent seed: a pure row function, so membership
      // is layout-stable (spark_partition_id would not be).
      .withColumn("_graft_salt", pmod(xxhash64(col(idCol), lit(seed + 1)), lit(splits.toLong)))
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") <= n)
      .drop("_graft_rn")
  }

  /** Weighted sampling WITHOUT replacement (SURVEY §2.3 E99) — pick `n`
    * rows where a row's inclusion probability is proportional to its
    * weight, by the Efraimidis–Spirakis priority scheme: each row gets a
    * deterministic uniform u ∈ (0, 1] from the portable charHash of
    * (id, seed), its priority is log(u)/w (the log form of u^(1/w) — same
    * order, no underflow for huge weights), and the n LARGEST priorities
    * win. The quality-weighted subcorpus pick every curation pipeline
    * needs ("sample 1B docs, favor high quality-score") — `sample()`
    * can't weight rows and a per-row RNG isn't reproducible across
    * layouts (the same argument as [[hashSplit]]).
    *
    * Scale: one narrow projection (hash + log, no shuffle, pushes to the
    * scan) into a `TakeOrderedAndProject` — every partition forwards at
    * most n candidate rows, never a global sort. Driver holds n rows;
    * callers wanting a big n should semi-join the returned ids instead of
    * collecting. Rows with non-positive weight are excluded (they have
    * zero sampling mass).
    *
    * Priorities are rounded at 6 dp with id tie-breaks (the repo's
    * cross-engine float rule), making the pick restatable in SQL — the
    * q117 oracle replays it verbatim in DuckDB.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int,
      seed: Long): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val u = (pmod(
      graft.functions.TextFunctions.charHash(
        concat(col(idCol).cast("string"), lit(":" + seed.toString))),
      lit(1000000L)) + lit(1L)).cast("double") / lit(1000001.0)
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("priority", round(log(u) / col(weightCol).cast("double"), 6))
      .orderBy(col("priority").desc, col(idCol))
      .limit(n)
  }

  /** Portable shuffle key: the multiplicative map `(id mod p)·A_e mod p`
    * in Z_p (p = 1e9+7, the repo's portable-hash field), with the
    * epoch's multiplier A_e = A^(epoch+1) mod p (A = Knuth's constant
    * reduced mod p) — a BIJECTION of the residue ring at every epoch.
    * Exactly restatable in any SQL engine's BIGINT arithmetic (the q127
    * oracle inlines the power chain). Two deliberate non-choices, both
    * pinned by the epochShuffle spec: [[portableRank]]'s charHash (a
    * polynomial fold of a short decimal id string never wraps the
    * modulus, so it sorts almost exactly by id — no shuffle at all) and
    * any small epoch PERTURBATION of the key (an epoch offset `+ e·B`
    * only rotates the ring, and even an epoch-shifted multiplier
    * `A + e·B` barely reorders a point set — both replay near-identical
    * permutations every epoch). The inner `mod p` keeps the product
    * within Long for any id (id·A alone overflows past id ≈ 3.4e9 — a
    * real corpus size); ids p apart share a key and fall to the id
    * tie-break. */
  val affineRank: RankFn = (idCol, epoch) => {
    require(epoch >= 0, s"epoch must be non-negative: $epoch")
    val p = 1000000007L
    val a = 2654435761L % p
    // A_e = a^(epoch+1) mod p. Successive POWERS are uncorrelated ring
    // elements; a merely epoch-SHIFTED multiplier (A + epoch·B) is the
    // third pinned-out non-choice — perturbing the multiplier slightly
    // provably barely reorders a point set (the order pattern of
    // {i·α mod 1} is rigid in α), so epochs replayed near-identical
    // permutations. a is coprime to the prime p, so a^k mod p is never 0
    // and the map stays a bijection at every epoch.
    val mult = BigInt(a).modPow(BigInt(epoch + 1L), BigInt(p)).toLong
    pmod(pmod(idCol.cast("long"), lit(p)) * lit(mult), lit(p))
  }

  /** E108: deterministic per-epoch corpus shuffle — the reproducible
    * global training ORDER a multi-epoch run needs. Training frameworks
    * shuffle data every epoch; at corpus scale that shuffle must be (a) a
    * pure function of (id, epoch) so any re-run — after a crash, on a
    * different cluster layout, from a different reader — yields the SAME
    * order (elastic training resumes mid-epoch by global position), and
    * (b) a DISTRIBUTED sort, never a single-point shuffle. `sample()` /
    * `rand()` fail (a): they are layout- and partition-order-dependent.
    *
    * The key is [[affineRank]] (SQL-restatable — the q127 oracle replays
    * it), with the id as tie-break so the order is TOTAL even on a key
    * collision. `orderBy` plans a range-partitioned global sort (one
    * sampling pass picks partition bounds, then each partition sorts
    * locally) — the 1000-executor shape; writers then emit part files in
    * partition order and the concatenation IS the epoch's order.
    * Different epochs derive independent permutations from the same
    * corpus with zero extra state.
    */
  def epochShuffle(
      df: DataFrame,
      idCol: String,
      epoch: Long,
      rank: RankFn = affineRank): DataFrame =
    df.withColumn("shuffle_key", rank(col(idCol), epoch))
      .orderBy(col("shuffle_key"), col(idCol))
}
