package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/Z-order bit interleaving — the multi-dimensional clustering key
  * behind Delta/Iceberg-style OPTIMIZE ZORDER (public technique: Morton
  * 1966; the z-value's property is that points close in BOTH dimensions
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
