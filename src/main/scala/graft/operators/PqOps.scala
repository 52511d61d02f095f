package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — public; SURVEY §2.3 extension surface
  * E139/E140/E142 — reference scope per `Etl_data_pipeline/README.md:1-40`:
  * the reference moves tables and leaves analysis downstream, so the
  * vector-search tier is declared extension) — the standard 100 TB-scale
  * vector-compression play the IVF family (E52/E67) composes with: split
  * every vector into `m` contiguous subvectors, fit an independent
  * k-means codebook per subspace, and store each vector as `m` small
  * codes (dim 64 × float → 4 bytes at m=4/k=256: a 64× compression), with
  * search by ASYMMETRIC DISTANCE COMPUTATION (ADC) — the query stays
  * exact, each candidate's distance is the sum of m table lookups.
  *
  * Scale shape, stage by stage:
  *   - '''fit''' is the E133 fine-fit discipline with the subspace index
  *     as the cell: ONE explode of the corpus into (id, sub, subvec) rows
  *     (m× rows but the same total bytes), then every Lloyd round is one
  *     sub-equi-join against the (m × kCodes)-row codebook frame + the
  *     packed-code map-side arg-min + one (sub, code, dim) aggregation —
  *     all m codebooks fit SIMULTANEOUSLY, never m driver loops re-scanning
  *     the corpus.
  *   - '''encode''' is the same arg-min join, once: (id, sub, code, dist)
  *     rows, the columnar layout downstream ADC reads directly (assembling
  *     an array per id would be one more shuffle for no consumer).
  *   - '''ADC search''' never touches a raw corpus vector: the per-query
  *     lookup table is (queries × m × kCodes) rows — workload-sized,
  *     broadcast — joined to the codes on (sub, code), summed per
  *     (query, id), cut by the bounded-buffer grouped top-k (E76). A
  *     whole query TABLE costs one pass over the codes, the q152 batch
  *     discipline.
  *
  * Determinism (the q115/q148 oracle contract, lockstep rule — change
  * both or neither): codebook seeds are the subvectors of the `kCodes`
  * smallest ids (per sub, the same ids), distances round at 6 dp with
  * ties to the smaller code, centroid means round at 6 dp, empty codes
  * keep their previous centroid, and ADC scores round at 6 dp with
  * (score asc, id asc) ranking — every number is a pure function of the
  * data, so DuckDB hash-matches the whole chain (q156/q157).
  */
object PqOps {

  /** Fitted model: one row per (sub, code) — `m × kCodes` rows, kept as a
    * DataFrame (join state, not driver state — at m=8, k=2^20 the
    * codebook outgrows the driver exactly like E133's fine model). */
  final case class PqModel(codebooks: DataFrame, m: Int, kCodes: Int, subDim: Int)

  /** (id, _graft_sub, _graft_v): the corpus exploded into contiguous
    * subvectors — the ONLY row-count amplification in the family (m×,
    * same total bytes). `dim` must split evenly: a ragged last subspace
    * would silently skew its codebook's distance scale. `expectDim`
    * (set by [[encode]]/[[adcSearch]] from the fitted model) makes a
    * mismatched vector a LOUD per-row error instead of silently wrong
    * codes — the check is woven into the data column itself, costs no
    * extra pass, and cannot be pruned. */
  def subvectors(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int,
      expectDim: Option[Int] = None): DataFrame = {
    require(m >= 1, s"m must be positive: $m")
    val w = transform(col(vecCol), _.cast("double"))
    val guarded = expectDim.fold(w)(d =>
      when(size(col(vecCol)) === d, w).otherwise(raise_error(concat(
        lit(s"pq: vector dim must be $d (the fitted model's m × subDim), got "),
        size(col(vecCol)).cast("string")))))
    df.select(col(idCol), guarded.as("_graft_w"))
      .select(col(idCol),
        // Integer subspace width (dim divisible by m — enforced by fitPq;
        // a `/` here would be double division and slice() garbage).
        (size(col("_graft_w")).cast("int") / lit(m)).cast("int").as("_graft_sd"),
        col("_graft_w"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(m - 1)), s =>
          slice(col("_graft_w"), s * col("_graft_sd") + 1, col("_graft_sd"))))
          .as(Seq("_graft_sub", "_graft_v")))
  }

  /** Fit all `m` codebooks simultaneously: `iters` Lloyd rounds over the
    * subvector frame with the codebook as distributed join state. */
  def fitPq(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int,
      kCodes: Int,
      iters: Int): PqModel = {
    require(kCodes > 0, s"kCodes must be positive: $kCodes")
    require(kCodes < (1 << KmeansOps.ClusterBits),
      s"arg-min packs the code into ${KmeansOps.ClusterBits} bits; kCodes=$kCodes exceeds it")
    require(iters >= 0, s"iters must be non-negative: $iters")
    val dims = df.select(size(col(vecCol)).as("d")).distinct().collect().map(_.getInt(0))
    require(dims.length == 1 && dims.head % m == 0,
      s"vector dim must be uniform and divisible by m=$m, got ${dims.mkString(",")}")
    val subDim = dims.head / m
    val subs = Tables.materialize(subvectors(df, vecCol, idCol, m))
    // Seeds: per sub, the subvectors of the kCodes smallest ids — the
    // flat fit's smallest-id rule applied per subspace.
    val wSub = Window.partitionBy(col("_graft_sub")).orderBy(col(idCol))
    var books = Tables.materialize(subs
      .withColumn("_graft_rn", row_number().over(wSub))
      .filter(col("_graft_rn") <= kCodes)
      .select(col("_graft_sub"),
        (col("_graft_rn") - 1).cast("int").as("_graft_code"),
        col("_graft_v").as("_graft_c")))
    for (_ <- 1 to iters) {
      val am = argmin(subs, books, idCol)
      val upd = am.join(subs, Seq(idCol, "_graft_sub"))
        .select(col("_graft_sub"), col("_graft_code"),
          posexplode(col("_graft_v")).as(Seq("i", "x")))
        .groupBy(col("_graft_sub"), col("_graft_code"), col("i"))
        .agg(round(avg(col("x")), 6).as("mn"))
        .groupBy(col("_graft_sub"), col("_graft_code"))
        .agg(transform(array_sort(collect_list(struct(col("i"), col("mn")))),
          st => st.getField("mn")).as("_graft_cu"))
      books = Tables.materialize(
        books.join(upd, Seq("_graft_sub", "_graft_code"), "left")
          .select(col("_graft_sub"), col("_graft_code"),
            coalesce(col("_graft_cu"), col("_graft_c")).as("_graft_c")))
    }
    PqModel(books, m, kCodes, subDim)
  }

  /** Arg-min of 6-dp L2 over each subvector's OWN subspace codebook —
    * the E133 packed-long discipline (a struct-valued min would degrade
    * to SortAggregate). Returns (idCol, _graft_sub, _graft_code,
    * _graft_dist). */
  private def argmin(subs: DataFrame, books: DataFrame, idCol: String): DataFrame = {
    val bits = KmeansOps.ClusterBits
    val code = round(
      graft.functions.VectorFunctions.l2Distance(col("_graft_v"), col("_graft_c")) * 1e6)
      .cast("long") * lit(1L << bits) + col("_graft_code")
    subs.join(books, Seq("_graft_sub"))
      .select(col(idCol), col("_graft_sub"), code.as("_graft_pk"))
      .groupBy(col(idCol), col("_graft_sub"))
      .agg(min(col("_graft_pk")).as("_graft_pk"))
      .select(col(idCol), col("_graft_sub"),
        col("_graft_pk").bitwiseAND(lit((1L << bits) - 1))
          .cast("int").as("_graft_code"),
        (shiftright(col("_graft_pk"), bits).cast("double") / 1e6)
          .as("_graft_dist"))
  }

  /** Encode the corpus against a fitted model: one row per (id, sub) —
    * (idCol, sub, code, dist), dist the 6-dp subspace quantization
    * error. Columnar on purpose: ADC joins on (sub, code) directly. */
  def encode(df: DataFrame, vecCol: String, idCol: String, model: PqModel): DataFrame =
    argmin(subvectors(df, vecCol, idCol, model.m,
        expectDim = Some(model.m * model.subDim)), model.codebooks, idCol)
      .select(col(idCol), col("_graft_sub").as("sub"),
        col("_graft_code").as("code"), col("_graft_dist").as("dist"))

  /** ADC batch search: top-`topN` candidates per query by the asymmetric
    * distance Σ_sub 6-dp-L2²(query subvector, candidate's codeword).
    * `queries` is (qidCol, vecCol) — workload-sized by contract; `codes`
    * is [[encode]]'s output over the corpus. The lookup table is
    * queries × m × kCodes rows, broadcast onto the codes; the cut is the
    * bounded-buffer grouped top-k, never a per-query window sort. Scores
    * are the SQUARED distance (sums of per-subspace squares — the
    * standard ADC objective), rounded 6 dp, ties to the smaller id. */
  def adcSearch(
      codes: DataFrame,
      idCol: String,
      queries: DataFrame,
      qidCol: String,
      vecCol: String,
      model: PqModel,
      topN: Int): DataFrame = {
    require(topN >= 1, s"topN out of range: $topN")
    val qsubs = subvectors(queries, vecCol, qidCol, model.m,
        expectDim = Some(model.m * model.subDim))
      .withColumnRenamed("_graft_sub", "sub")
    // Per (query, sub, code): the partial SQUARED distance, each leg's
    // L2 rounded at 6 dp first (the family's determinism grain).
    val l2 = graft.functions.VectorFunctions.l2Distance(col("_graft_v"), col("_graft_c"))
    val lut = qsubs.join(
        model.codebooks.withColumnRenamed("_graft_sub", "sub"), Seq("sub"))
      .select(col(qidCol), col("sub"), col("_graft_code").as("code"),
        (round(l2, 6) * round(l2, 6)).as("_graft_part"))
    val scored = codes
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(col("_graft_part")), 6).as("adc"))
      // Grouped top-k ranks DESCENDING; ADC wants the smallest distance
      // first, so rank on the negated score and restore it after.
      .withColumn("_graft_neg", -col("adc"))
    TopKOps.groupedTopK(scored, qidCol, "_graft_neg", idCol, topN)
      .withColumn("adc", round(-col("_graft_neg"), 6))
      .drop("_graft_neg")
  }

  /** IVFADC (Jégou 2011's full system): the coarse quantizer restricts
    * which codes a query even meets, ADC ranks within the probed cell —
    * at 100 TB a flat [[adcSearch]] still sums m lookups for EVERY
    * candidate (one full pass over the codes), while the cell join makes
    * the scan ∝ the probed cells' population (~n/k1 per query).
    *
    * Inputs are the STORED artifacts, not raw vectors: `codes` from
    * [[encode]], `cells` = the coarse assignment (idCol, cluster) from
    * the same `coarse` centroids (the `--pq-encode`-style build step),
    * `coarse` the driver-sized coarse model. Queries probe their nearest
    * coarse cell by the family's 6-dp arg-min (ties to the smaller
    * index — identical to the corpus assignment rule, so a query drawn
    * from the corpus meets exactly its own cell). One probed cell
    * (nprobe = 1) is the deliberately simple recall/cost point; more
    * probes = union more cells before the same ADC, the q81 knob.
    *
    * Same determinism contract and output shape as [[adcSearch]]:
    * (qid, rank, id, adc), squared distance, 6 dp, (adc asc, id asc). */
  def ivfAdcSearch(
      codes: DataFrame,
      cells: DataFrame,
      idCol: String,
      queries: DataFrame,
      qidCol: String,
      vecCol: String,
      model: PqModel,
      coarse: Array[Array[Double]],
      topN: Int): DataFrame = {
    require(topN >= 1, s"topN out of range: $topN")
    val qcell = KmeansOps.assign(queries, vecCol, qidCol, coarse)
      .select(col(qidCol), col("cluster").as("_graft_qcell"))
    val qsubs = subvectors(queries, vecCol, qidCol, model.m,
        expectDim = Some(model.m * model.subDim))
      .withColumnRenamed("_graft_sub", "sub")
    val l2 = graft.functions.VectorFunctions.l2Distance(col("_graft_v"), col("_graft_c"))
    val lut = qsubs.join(
        model.codebooks.withColumnRenamed("_graft_sub", "sub"), Seq("sub"))
      .select(col(qidCol), col("sub"), col("_graft_code").as("code"),
        (round(l2, 6) * round(l2, 6)).as("_graft_part"))
    // The IVF restriction: a code row meets only the queries probing its
    // cell — the (workload-sized) qcell frame broadcasts onto the
    // cell-keyed codes, so the per-query candidate set is the probed
    // cell's population, never the corpus.
    val scored = codes
      .join(cells.select(col(idCol), col("cluster").as("_graft_cell")), idCol)
      .join(broadcast(qcell), col("_graft_cell") === col("_graft_qcell"))
      .join(broadcast(lut), Seq(qidCol, "sub", "code"))
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(col("_graft_part")), 6).as("adc"))
      .withColumn("_graft_neg", -col("adc"))
    TopKOps.groupedTopK(scored, qidCol, "_graft_neg", idCol, topN)
      .withColumn("adc", round(-col("_graft_neg"), 6))
      .drop("_graft_neg")
  }
}
