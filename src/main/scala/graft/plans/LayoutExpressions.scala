package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/Z-order bit interleaving — the multi-dimensional clustering key
  * behind Delta/Iceberg-style OPTIMIZE ZORDER (public technique: Morton
  * 1966; the z-value's property is that points close in ALL dimensions
  * are close on the 1-D curve, so range-partitioning files by z-value
  * gives every file a bounded min/max box in EVERY interleaved column —
  * which is exactly what parquet row-group / file skipping prunes on).
  *
  * A native expression rather than a HOF `aggregate(sequence(...))` fold:
  * the interleave sits in the clustering write path of every maintenance
  * job, and HigherOrderFunction nodes are CodegenFallback (the 100x
  * lesson of [[TextHash]]). Single tight loop, whole-stage codegen'd.
  */
object BitInterleave {
  /** Low `bits` bits of x on even positions, y on odd: z < 2^(2·bits).
    * Codegen entry point (mirrors nullSafeEval). */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Round-robin interleave of k inputs: bit i of `xs(j)` lands at
    * position `i·k + j`, so z < 2^(bits·k) and the 2-ary case is
    * bit-identical to [[interleave]]. Codegen entry point. */
  def interleaveN(xs: Array[Long], bits: Int): Long = {
    val k = xs.length
    var z = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < k) {
        z |= ((xs(j) >> i) & 1L) << (i * k + j)
        j += 1
      }
      i += 1
    }
    z
  }
}

/** z-value of two long columns (callers cast/mod into the `bits` budget;
  * only the low `bits` bits of each input participate). Long inputs are
  * ENFORCED at analysis time (checkInputDataTypes): without the
  * contract, an int child would pass analysis and then diverge by
  * evaluation mode — codegen widens int→long silently while the
  * interpreted path's `asInstanceOf[Long]` throws ClassCastException
  * mid-job. */
case class BitInterleaveExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits out of [1,31]: $bits")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bit_interleave expects (bigint, bigint), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    BitInterleave.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.BitInterleave.interleave($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BitInterleaveExpr = copy(left = l, right = r)
}

/** N-ary [[BitInterleaveExpr]]: z-value of 2–6 long columns, `bits` low
  * bits each, round-robin layout (bit i of child j → position i·k + j) —
  * real layout tuning clusters 3–4 keys, not 2. The bit budget must fit
  * one long (`bits·k ≤ 63`, enforced at construction). Null if ANY child
  * is null (a row with an unknown key has no place on the curve); same
  * analysis-time LongType enforcement as the binary form, for the same
  * codegen/interpreted-divergence reason. */
case class BitInterleaveNExpr(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.size >= 2 && children.size <= 6,
    s"bit_interleave_n takes 2..6 columns, got ${children.size}")
  require(bits >= 1 && bits * children.size <= 63,
    s"bit budget out of range: $bits bits x ${children.size} cols must be in [1,63]")
  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"bit_interleave_n expects bigint columns, got ${c.dataType.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var j = 0
    while (j < children.size) {
      val v = children(j).eval(input)
      if (v == null) return null
      xs(j) = v.asInstanceOf[Long]
      j += 1
    }
    BitInterleave.interleaveN(xs, bits)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.freshName("zin")
    val childGens = children.map(_.genCode(ctx))
    val fills = childGens.zipWithIndex.map { case (g, j) =>
      s"""${g.code}
         |if (${g.isNull}) { ${ev.isNull} = true; } else { $arr[$j] = ${g.value}; }
         |""".stripMargin
    }
    // No per-child short-circuit: the fill loop is branch-cheap and keeps
    // the generated method flat (k <= 6 by construction).
    val code =
      code"""boolean ${ev.isNull} = false;
            |long[] $arr = new long[${children.size}];
            |${fills.mkString("\n")}
            |long ${ev.value} = ${ev.isNull} ? 0L :
            |  graft.plans.BitInterleave.interleaveN($arr, $bits);
            |""".stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitInterleaveNExpr =
    copy(children = newChildren)
}
