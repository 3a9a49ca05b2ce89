package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First element of a string array with the given prefix and suffix,
  * else null — the reference's link-selection semantics (cmr_api.py:
  * 74-103: first href startswith(protocol) ∧ endswith("stac.json")).
  *
  * A codegen'd single pass. The equivalent
  * `element_at(filter(links, λ), 1)` runs the lambda interpreted AND
  * re-evaluates the (expensive) array-producing child in both the
  * null-filter predicate and the projection — 20× slower on the bench.
  */
case class FirstLink(child: Expression, prefix: String, suffix: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "first_link"

  @transient private lazy val prefixU = UTF8String.fromString(prefix)
  @transient private lazy val suffixU = UTF8String.fromString(suffix)

  override def nullSafeEval(arr: Any): Any =
    FirstLink.compute(arr.asInstanceOf[ArrayData], prefixU, suffixU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("prefix", prefixU)
    val sRef = ctx.addReferenceObj("suffix", suffixU)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.expressions.FirstLink.compute($a, $pRef, $sRef);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FirstLink {
  def compute(arr: ArrayData, prefix: UTF8String,
              suffix: UTF8String): UTF8String = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.startsWith(prefix) && s.endsWith(suffix)) return s
      }
      i += 1
    }
    null
  }
}

/** Porter stem of a lowercase word ([[graft.text.PorterStemmer]],
  * the published 1980 step tables) as a native codegen'd expression —
  * the verdict-r11 stretch: the registry's last scalar ScalaUDF. The
  * stemmer itself is the same pure function; what the Expression
  * buys is staying inside whole-stage codegen (no ScalaUDF
  * encoder/serializer hop, null handling generated) on the
  * vocabulary-sized frames it runs over.
  */
/** Σ_b floor(c_b·ln(c_b)·10⁹ + 0.5) over the byte histogram of a
  * binary payload — the exact-integer building block of byte-level
  * Shannon entropy (the E15 discipline applied INSIDE the expression:
  * per-byte-value contributions floor to integer 1e-9 units before
  * the sum, so the result is a Long independent of any float
  * accumulation order and the oracle's per-char integer sum matches
  * bit-exact). One codegen'd pass over the payload; the 256-counter
  * histogram lives on the stack, so the expression streams payloads
  * of any size in whole-stage codegen.
  */
case class ByteLogUnits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "byte_log_units"

  override def nullSafeEval(b: Any): Any =
    ByteLogUnits.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.expressions.ByteLogUnits.compute($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteLogUnits {
  def compute(bytes: Array[Byte]): Long = {
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0xff) += 1
      i += 1
    }
    var units = 0L
    var v = 0
    while (v < 256) {
      val c = counts(v)
      if (c > 1) // c == 1 contributes ln(1) = 0 exactly
        units += math.floor(c.toDouble * math.log(c.toDouble)
          * 1000000000.0 + 0.5).toLong
      v += 1
    }
    units
  }
}

case class PorterStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "porter_stem"

  override def nullSafeEval(w: Any): Any =
    PorterStem.compute(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      w => s"graft.expressions.PorterStem.compute($w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PorterStem {
  def compute(w: UTF8String): UTF8String =
    UTF8String.fromString(graft.text.PorterStemmer.stem(w.toString))
}

/** One BPE merge pass: rewrite a symbol array by fusing every
  * adjacent (a, b) pair left-to-right — E20's training-step rewrite
  * as a codegen'd expression (was a Scala UDF; the frames are
  * vocabulary-sized, so this is codegen hygiene — no interpreted-UDF
  * boundary in the whole-stage pipeline — rather than wall-time).
  * Byte-equivalent to the driver-side [[graft.ops.BpeMerge.merge]]
  * used by the spec replays.
  */
case class BpeMergeStep(first: Expression, second: Expression,
                        third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def prettyName: String = "bpe_merge_step"

  override def nullSafeEval(s: Any, a: Any, b: Any): Any =
    BpeMergeStep.compute(s.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, a, b) =>
      s"${ev.value} = graft.expressions.BpeMergeStep.compute($s, $a, $b);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMergeStep {
  def compute(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur.equals(a) && syms.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Per-word BPE token count after replaying a trained merge list in
  * training order — E21's vocabulary encoder as a codegen'd
  * expression (was a Scala UDF). The merge list is a driver-side
  * constant embedded via `addReferenceObj`, so the expression stays
  * inside whole-stage codegen with zero per-row closure dispatch.
  */
case class BpeEncodedLength(child: Expression,
                            merges: Array[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_encoded_length"

  override def nullSafeEval(w: Any): Any =
    graft.ops.BpeMerge.encodedLength(w.asInstanceOf[UTF8String].toString,
      merges)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, "scala.Tuple2[]")
    defineCodeGen(ctx, ev, w =>
      s"graft.ops.BpeMerge.encodedLength($w.toString(), $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
