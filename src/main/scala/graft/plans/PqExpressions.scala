package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native generators for the PQ literal path (round 17, guide §2.4).
  *
  * The first literal-path cut composed the per-subspace arg-min from
  * built-ins: `explode(array(struct(..., least(round(l2(slice(v), lit(c)))
  * · 2^20 + code, ...))))` — m × kCodes unrolled legs. MEASURED WORSE on
  * the refinement level (m=8 × k=8): the unrolled legs blew
  * whole-stage-codegen past janino's 64 KB method limit
  * (`InternalCompilerException: Code grows beyond 64 KB`), so every
  * affected stage paid a failed multi-second compile and then ran
  * interpreted — q166 5.2 → 9.0 s, q167 3.6 → 5.3 s in interleaved A/B.
  * The round-16 rule applies: when the expression shape is a LOOP, write
  * the loop natively instead of unrolling it through Catalyst. These
  * generators hold the codebooks as plain driver arrays (shipped once in
  * the task closure — no typedLit forest, plans stay small) and run the
  * k-way arg-min as a tight compiled loop per row.
  *
  * Determinism parity (the q156 oracle contract, lockstep with
  * [[graft.operators.PqOps]]'s join path — change both or neither):
  *   - the subspace distance is `round(VecOps.l2, 6)` — the SAME
  *     `BigDecimal(HALF_UP)` rounding Spark's `round` applies inside
  *     `VectorFunctions.l2Distance` (spec-pinned bit-equal);
  *   - the packed arg-min is `round(r6 · 1e6)·2^ClusterBits + code`,
  *     minimized as a long — `least`/`min(packed)` restated;
  *   - `dist` decodes as `(packed >> bits).toDouble / 1e6`, the join
  *     path's `shiftright(...).cast("double") / 1e6` exactly.
  */
object PqExprOps {

  /** Spark `round(x, scale)` for doubles, restated: BigDecimal.valueOf
    * (shortest-decimal repr) + HALF_UP — NOT Math.round, whose binary
    * floor(x+0.5) disagrees with decimal HALF_UP on representation
    * boundaries. Parity is spec-pinned against Spark's own round. */
  def roundAt(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** L2 over the `sub`-th slice against a codeword — index-shifted
    * [[VecOps.l2]] (same ascending accumulation order, so bit-identical
    * to l2 over the materialized slice). */
  def sliceL2(v: Array[Double], off: Int, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(c.length, v.length - off)
    while (i < n) { val d = v(off + i) - c(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }
}

/** Shared shape of the PQ literal-path generators: one input vector
  * column, the codebooks as a driver array, a per-row dim guard carrying
  * the join path's exact refusal message. */
sealed trait PqGenerator extends Generator with CodegenFallback {
  def child: Expression
  def books: Array[Array[Array[Double]]]
  override def children: Seq[Expression] = Seq(child)
  protected def child_elemFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def dim: Int = books.map(_.head.length).sum
  protected def guarded(input: InternalRow): Array[Double] = {
    val raw = child.eval(input)
    val n = if (raw == null) -1 else raw.asInstanceOf[ArrayData].numElements()
    if (n != dim)
      throw new RuntimeException(
        s"pq: vector dim must be $dim (m × subDim of the fit/model), got " +
          (if (raw == null) "NULL" else n.toString))
    VecOps.toDoubles(raw.asInstanceOf[ArrayData], child_elemFloat)
  }
  // The codebooks are reference data, not tree structure: keep them out
  // of toString so plans stay readable and stable.
  override def toString: String = s"$prettyName($child)"
}

/** Per-row PQ encode: emits one (sub, code, dist) row per subspace — the
  * literal-path [[graft.operators.PqOps.encode]] body. With `withSubvec`
  * the row also carries the subvector (the fit's Lloyd-update input). */
case class PqEncodeGen(
    child: Expression,
    books: Array[Array[Array[Double]]],
    withSubvec: Boolean) extends PqGenerator {
  override def prettyName: String = "pq_encode_gen"
  override def elementSchema: StructType = {
    val base = Seq(
      StructField("sub", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("dist", DoubleType, nullable = false))
    StructType(if (withSubvec)
      base :+ StructField("sv", ArrayType(DoubleType, containsNull = false), nullable = false)
    else base)
  }
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = guarded(input)
    val bits = graft.operators.KmeansOps.ClusterBits
    val m = books.length
    val out = new Array[InternalRow](m)
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val subDim = book.head.length
      var best = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val r6 = PqExprOps.roundAt(PqExprOps.sliceL2(v, off, book(c)), 6)
        val packed = PqExprOps.roundAt(r6 * 1e6, 0).toLong * (1L << bits) + c
        if (packed < best) best = packed
        c += 1
      }
      val code = (best & ((1L << bits) - 1)).toInt
      val dist = (best >> bits).toDouble / 1e6
      out(s) =
        if (withSubvec) {
          val sv = java.util.Arrays.copyOfRange(v, off, off + subDim)
          InternalRow(s, code, dist, new GenericArrayData(sv))
        } else InternalRow(s, code, dist)
      off += subDim
      s += 1
    }
    out
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): PqEncodeGen =
    copy(child = cs.head)
}

/** Per-row hot-cell split arg-min (round 17): the packed
  * `round(l2·1e6)·2^ClusterBits + childId` long over the row's OWN
  * cell's child centroids — [[graft.operators.KmeansOps.splitHotCells]]'
  * literal-path assignment as ONE compiled loop. The first cut unrolled
  * it through when/least/typedLit legs: at the gsf10 decade probe
  * (200 k vectors, dim 64) the stage fell out of whole-stage codegen
  * (the janino failure class this file's header documents) and the
  * means job ran interpreted — measured 38–97 s vs the JOIN path's
  * ~10 s. The loop form measured faster than the join path at every
  * scale probed. Driver arrays ride the task closure (no typedLit
  * forest; plans stay small).
  *
  * `cells` must be sorted ascending (binary search); `cents(j)(f)` /
  * `ids(j)(f)` are hot cell `cells(j)`'s child-f centroid and new cell
  * id. A member row carrying a non-hot cell throws loudly (members are
  * filtered to the hot set upstream — reaching here means the caller's
  * frames diverged). Distance parity: `roundAt(VecOps.l2, 6)` is
  * exactly `VectorFunctions.l2Distance`; the packed min ties to the
  * smaller child BECAUSE child ids are monotone in f within a cell. */
case class SplitAssignExpr(
    cellChild: Expression,
    vecChild: Expression,
    cells: Array[Int],
    cents: Array[Array[Array[Double]]],
    ids: Array[Array[Int]]) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(cellChild, vecChild)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  private def elemFloat: Boolean =
    vecChild.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def eval(input: InternalRow): Any = {
    // Loud designed refusals on null children (nullable=false output): a
    // null cell or vector row in the members frame would otherwise die
    // as an opaque NPE/ClassCastException deep in the loop.
    val cellRaw = cellChild.eval(input)
    if (cellRaw == null)
      throw new RuntimeException(
        "splitHotCells: member row carries a NULL cell — the members " +
          "frame must be fully assigned before the split")
    val cell = cellRaw.asInstanceOf[Number].intValue
    val j = java.util.Arrays.binarySearch(cells, cell)
    if (j < 0)
      throw new RuntimeException(
        s"splitHotCells: member row carries cell $cell, which is not a hot " +
          "cell — the member and population frames diverged")
    val vecRaw = vecChild.eval(input)
    if (vecRaw == null)
      throw new RuntimeException(
        s"splitHotCells: member row in cell $cell carries a NULL vector — " +
          "corpus vectors must be non-null by the embeddings contract")
    val v = VecOps.toDoubles(vecRaw.asInstanceOf[ArrayData], elemFloat)
    val bits = graft.operators.KmeansOps.ClusterBits
    val cs = cents(j)
    val is = ids(j)
    var best = Long.MaxValue
    var f = 0
    while (f < cs.length) {
      val r6 = PqExprOps.roundAt(VecOps.l2(v, cs(f)), 6)
      val packed = PqExprOps.roundAt(r6 * 1e6, 0).toLong * (1L << bits) + is(f)
      if (packed < best) best = packed
      f += 1
    }
    best
  }
  // Reference data stays out of toString (the PqGenerator rule).
  override def toString: String = s"split_assign($cellChild, $vecChild)"
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SplitAssignExpr =
    copy(cellChild = cs(0), vecChild = cs(1))
}

/** Per-row ADC lookup-table entries: one (sub, code, part) row per
  * codebook entry, `part = round(l2, 6)²` — the literal-path
  * [[graft.operators.PqOps]] `adcLut` body (m × kCodes rows per query,
  * workload-sized by contract). */
case class PqLutGen(
    child: Expression,
    books: Array[Array[Array[Double]]]) extends PqGenerator {
  override def prettyName: String = "pq_lut_gen"
  override def elementSchema: StructType = StructType(Seq(
    StructField("sub", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("part", DoubleType, nullable = false)))
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = guarded(input)
    val m = books.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      var c = 0
      while (c < book.length) {
        val r6 = PqExprOps.roundAt(PqExprOps.sliceL2(v, off, book(c)), 6)
        out += InternalRow(s, c, r6 * r6)
        c += 1
      }
      off += book.head.length
      s += 1
    }
    out
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): PqLutGen =
    copy(child = cs.head)
}
