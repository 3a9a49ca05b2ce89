package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared 64-bit hashing primitives (FNV-1a over bytes + splitmix64
  * finalizer — both public-domain constructions).
  */
object Hash64 {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L
  final val Golden = 0x9E3779B97F4A7C15L

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + Golden
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def hashUtf8(s: UTF8String): Long = fnv1a64(s.getBytes)
}

/** Scalar 64-bit string hash: splitmix64(fnv1a64(utf8 bytes) ^ key).
  * The per-row primitive behind the count-min sketch rows (one
  * expression per sketch row, key = seed + row·golden) — same hash
  * family as [[MinHashSignature]], codegen'd, re-derivable in DuckDB
  * HUGEINT SQL for exact oracles.
  */
case class Hash64Expr(child: Expression, key: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hash64"

  override def nullSafeEval(s: Any): Any =
    Hash64Expr.compute(s.asInstanceOf[UTF8String], key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Hash64Expr.compute($a, ${key}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash64Expr {
  def compute(s: UTF8String, key: Long): Long =
    Hash64.splitmix64(Hash64.hashUtf8(s) ^ key)
}

/** MinHash signature of an array of string shingles: for each of
  * `numHashes` hash functions h_i, the minimum of h_i(shingle) over
  * the array. One pass per row — no shingle explode, no shuffle.
  * h_i(s) = splitmix64(fnv1a64(s) ^ (seed + i·golden)).
  *
  * Scale stance: at 100 TB the signature is computed scan-side inside
  * whole-stage codegen; only the (doc, band-bucket) pairs ever hit a
  * shuffle (see graft.ops.Dedup.minhashLsh).
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"

  override def nullSafeEval(arr: Any): Any =
    MinHashSignature.compute(arr.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.MinHashSignature.compute($a, $numHashes, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def compute(arr: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = Hash64.hashUtf8(arr.getUTF8String(i))
        var j = 0
        while (j < numHashes) {
          val v = Hash64.splitmix64(base ^ (seed + j * Hash64.Golden))
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** 64-bit SimHash over an array of string tokens: per-bit vote of
  * token hashes (+1 if bit set, −1 otherwise), sign of the vote is the
  * output bit. Near-duplicate docs land within small hamming distance.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(arr: Any): Any =
    SimHash64.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Hash64.splitmix64(Hash64.hashUtf8(arr.getUTF8String(i)))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
