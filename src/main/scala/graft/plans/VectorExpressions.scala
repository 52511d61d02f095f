package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector similarity (promoted from the
  * zip_with/aggregate HOF compositions in
  * [[graft.functions.VectorFunctions]] on BENCH evidence — SURVEY §7.2).
  *
  * Accumulation is a strict left-to-right IEEE-double fold, identical to
  * the HOF versions and to the DuckDB oracle's list_sum(list_transform),
  * so results stay bit-compatible before the 6-dp rounding applied by the
  * Column wrappers.
  */
object VecOps {
  def toDoubles(a: ArrayData, elemFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    out
  }

  def dot(x: Array[Double], y: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  def cosine(x: Array[Double], y: Array[Double]): Double =
    dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))

  def l2(x: Array[Double], y: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { val d = x(i) - y(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }

  /** Sign-random-projection bucket; hyperplane grid
    * w(j,i) = ((j*64+i)*2654435761) mod 97 - 48 (same as the oracle).
    * `planeOffset` selects planes planeOffset..planeOffset+nBits-1, so a
    * BANDED construction can give every band its own ≤60-bit word from one
    * unbounded plane family (bit r of the offset-o bucket = plane o+r,
    * identical numbering to slicing one long signature — which is why the
    * offset form is oracle-compatible with the shifted form). */
  def srpBucket(v: Array[Double], nBits: Int, planeOffset: Int): Long = {
    var bucket = 0L
    var j = 0
    while (j < nBits) {
      var proj = 0.0
      var i = 0
      while (i < v.length) {
        val w = (((planeOffset + j) * 64L + i) * 2654435761L) % 97L - 48L
        proj += w.toDouble * v(i)
        i += 1
      }
      if (proj >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  def srpBucket(v: Array[Double], nBits: Int): Long = srpBucket(v, nBits, 0)
}

sealed trait VecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def elemFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def vecs(a: Any, b: Any): (Array[Double], Array[Double]) = (
    VecOps.toDoubles(a.asInstanceOf[ArrayData], elemFloat(left)),
    VecOps.toDoubles(b.asInstanceOf[ArrayData], elemFloat(right)))
}

case class CosineSimExpr(left: Expression, right: Expression) extends VecBinary {
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = vecs(a, b); VecOps.cosine(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VecOps.cosine(" +
        s"graft.plans.VecOps.toDoubles($a, ${elemFloat(left)}), " +
        s"graft.plans.VecOps.toDoubles($b, ${elemFloat(right)}))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DotProductExpr(left: Expression, right: Expression) extends VecBinary {
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = vecs(a, b); VecOps.dot(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VecOps.dot(" +
        s"graft.plans.VecOps.toDoubles($a, ${elemFloat(left)}), " +
        s"graft.plans.VecOps.toDoubles($b, ${elemFloat(right)}))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class L2DistExpr(left: Expression, right: Expression) extends VecBinary {
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = vecs(a, b); VecOps.l2(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VecOps.l2(" +
        s"graft.plans.VecOps.toDoubles($a, ${elemFloat(left)}), " +
        s"graft.plans.VecOps.toDoubles($b, ${elemFloat(right)}))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class SrpBucketExpr(child: Expression, nBits: Int, planeOffset: Int = 0)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  private def elemFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override protected def nullSafeEval(v: Any): Any =
    VecOps.srpBucket(
      VecOps.toDoubles(v.asInstanceOf[ArrayData], elemFloat), nBits, planeOffset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VecOps.srpBucket(" +
        s"graft.plans.VecOps.toDoubles($c, $elemFloat), $nBits, $planeOffset)")
  override protected def withNewChildInternal(c: Expression): SrpBucketExpr = copy(child = c)
}
