package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve distance of grid point (x, y) on a
  * 2^bits × 2^bits grid (standard xy→d convention; see the public
  * Hilbert-curve conversion algorithm). The reference computes this on
  * the driver for every URL (write.py:66-90, `HilbertCurve(14, 2)`);
  * here it is a codegen'd Catalyst expression so spatial ordering runs
  * distributed (e.g. as a repartitionByRange key).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.xy2d(bits, x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.HilbertIndex.xy2d($bits, $x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Hilbert curve xy→d on a 2^bits grid; standard rotate-and-flip
    * formulation. Coordinates are clamped to the grid.
    */
  def xy2d(bits: Int, x0: Int, y0: Int): Long = {
    val n = 1 << bits
    var x = math.max(0, math.min(n - 1, x0))
    var y = math.max(0, math.min(n - 1, y0))
    var d = 0L
    var s = n >>> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate quadrant
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>>= 1
    }
    d
  }

  /** Inverse (d→xy), used by tests to check bijectivity. */
  def d2xy(bits: Int, d: Long): (Int, Int) = {
    val n = 1 << bits
    var rx = 0; var ry = 0
    var x = 0; var y = 0
    var t = d
    var s = 1
    while (s < n) {
      rx = (1 & (t / 2)).toInt
      ry = (1 & (t ^ rx)).toInt
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }
}

/** Morton (Z-order) interleave of (x, y) on a 2^bits grid — cheaper
  * than Hilbert, slightly worse locality; offered as the alternative
  * spatial clustering key.
  */
case class MortonIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_index"

  override def nullSafeEval(x: Any, y: Any): Any =
    MortonIndex.interleave(bits, x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.MortonIndex.interleave($bits, $x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonIndex {
  def interleave(bits: Int, x0: Int, y0: Int): Long = {
    val n = 1 << bits
    val x = math.max(0, math.min(n - 1, x0))
    val y = math.max(0, math.min(n - 1, y0))
    var d = 0L
    var i = 0
    while (i < bits) {
      d |= ((x >>> i) & 1L) << (2 * i)
      d |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    d
  }
}
