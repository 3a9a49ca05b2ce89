package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dense-vector kernels over ArrayType(DoubleType).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) run
  * interpreted — per-element closure dispatch — which made pairwise
  * cosine the bench bottleneck (93 s for 2M pairs at sf0.1). These
  * expressions compile to a tight primitive loop via a static call
  * inside whole-stage codegen.
  *
  * Summation is index-ordered (single sequential pass), matching the
  * oracle engine's list_cosine_similarity evaluation order.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.CosineSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** Plain dot product — the LSH hyperplane-sign kernel (norms are
  * irrelevant to the sign, so cosine would waste two passes' work).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.DotProduct.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** Squared Euclidean distance — the IVF cell-assignment kernel. */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    SquaredDistance.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SquaredDistance.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** Distinct intersection cardinality of two string arrays (hash-set
  * probe) — the Jaccard verification kernel, and the target of the
  * `size(array_intersect(a, b))` optimizer rewrite
  * (graft.plans.RewriteSetOps). |A∪B| is derived as |A|+|B|−|A∩B| by
  * callers, so the union array is never materialized. Null elements
  * are ignored (the rewrite only fires on containsNull=false inputs).
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectSize.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.IntersectSize.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectSize {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[Any](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var cnt = 0
    i = 0
    while (i < large.numElements()) {
      // remove-on-match counts each distinct element once, keeping
      // exact size(array_intersect(...)) semantics on duplicate inputs
      if (!large.isNullAt(i) && set.remove(large.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }
}

/** Per-vector SQ8 scale: max|x| / 127, clamped to 1e-30 (the zero-
  * vector guard shared with [[graft.ops.Similarity.sq8Codes]] and the
  * D3/D8 oracles — all-zero input quantizes to all-zero codes, never
  * NaN). One sequential pass, codegen'd: the interpreted
  * `aggregate(...)` HOF costs per-element closure dispatch on the
  * corpus-sized quantization scan of the SQ8-routed kNN graph.
  */
case class Sq8Scale(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_scale"

  override def nullSafeEval(v: Any): Any =
    Sq8Scale.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.Sq8Scale.compute($v)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Sq8Scale {
  def compute(v: ArrayData): Double = {
    var m = 0.0
    var i = 0
    val n = v.numElements()
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > m) m = a
      i += 1
    }
    math.max(m / 127.0, 1e-30)
  }
}

/** SQ8 encode to a BYTE-packed code vector: floor(x/scale + 0.5) per
  * component, emitted as BinaryType — dim BYTES per vector instead of
  * the 8·dim of the double array or the 4·dim of an int-array code
  * column. The 8× payload cut is what the SQ8-routed kNN graph
  * shuffles/broadcasts through its candidate-scoring stage. Codes are
  * exactly [[graft.ops.Similarity.sq8Codes]]' ints (they fit a signed
  * byte by construction: |x|/scale ≤ 127 and floor(·+0.5) keeps
  * magnitude ≤ 127).
  */
case class Sq8Pack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "sq8_pack"

  override def nullSafeEval(v: Any, s: Any): Any =
    Sq8Pack.compute(v.asInstanceOf[ArrayData], s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.expressions.Sq8Pack.compute($v, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Sq8Pack {
  def compute(v: ArrayData, scale: Double): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getDouble(i) / scale + 0.5).toByte
      i += 1
    }
    out
  }
}

/** Integer dot product of two byte-packed SQ8 code vectors — the
  * stage-1 scoring kernel of the SQ8-routed kNN graph. Exact integer
  * arithmetic (sum of int products fits a Long at any realistic dim),
  * one sequential pass over two byte arrays already in CPU cache.
  */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType
  override def prettyName: String = "sq8_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Dot.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.Sq8Dot.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Sq8Dot {
  def compute(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += a(i).toLong * b(i).toLong
      i += 1
    }
    s
  }
}
