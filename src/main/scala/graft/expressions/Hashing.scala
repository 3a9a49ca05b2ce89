package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
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

/** Distinct 3-token shingles of a token array — the scan-side input of
  * every graft.ops.Dedup operator. Bit-identical to the SQL chain
  * `array_distinct(transform(sequence(1, greatest(n-2, 1)),
  * i => concat_ws(' ', slice(toks, i, 3))))` that the DuckDB oracles
  * replay: first-occurrence order, null tokens skipped by concat_ws,
  * and the n<3 guard emitting one short shingle. The SQL chain runs as
  * interpreted higher-order functions allocating a slice array per
  * window; this is one codegen'd pass with a LinkedHashSet dedup.
  */
case class Shingle3Distinct(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def nullSafeEval(arr: Any): Any =
    Shingle3Distinct.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.Shingle3Distinct.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingle3Distinct {
  private val Sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val count = math.max(n - 2, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      val hi = math.min(i + 3, n)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) {
        // concat_ws skips nulls; UTF8String.concatWs does the same
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}

/** All (or first-occurrence-distinct) n-token word grams joined with
  * a single space — bit-identical, for inputs with size(toks) ≥ n, to
  * the interpreted chain `transform(sequence(1, size(toks)-(n-1)),
  * i => concat_ws(' ', slice(toks, i, n)))` (wrapped in
  * `array_distinct` when `distinct`): concat_ws skips null tokens,
  * distinct keeps first-occurrence order. Returns an EMPTY array when
  * size < n — every caller guards with `filter(size(toks) >= n)`; the
  * SQL chain's descending-`sequence` artifact below n is deliberately
  * not replicated (same stance as [[GramMd5]]). The chain runs as
  * interpreted higher-order functions allocating a slice array per
  * window; this is one codegen'd pass reusing each token's bytes
  * across the n windows it participates in.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1)

  // analysis-time type check instead of a runtime ClassCastException
  // on a wrong-typed child (r14 ADVICE)
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (distinct) "shingles_n" else "word_ngrams"

  override def nullSafeEval(arr: Any): Any =
    WordNGrams.compute(arr.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WordNGrams.compute($a, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  private val Sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val sz = arr.numElements()
    val count = sz - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      // concat_ws skips nulls; UTF8String.concatWs does the same
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      i = 0
      while (i < count) {
        val parts = new Array[UTF8String](n)
        System.arraycopy(toks, i, parts, 0, n)
        seen.add(UTF8String.concatWs(Sep, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray)
    } else {
      val out = new Array[Any](count)
      i = 0
      while (i < count) {
        val parts = new Array[UTF8String](n)
        System.arraycopy(toks, i, parts, 0, n)
        out(i) = UTF8String.concatWs(Sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** All length-3 character substrings of a string — bit-identical, for
  * length(text) ≥ 3, to the interpreted chain
  * `transform(sequence(1, length(text)-2), i => substring(text, i,
  * 3))`. Empty below 3 characters (the caller filters
  * `length(text) >= 3`; the descending-`sequence` artifact below 3 is
  * not replicated). Why it exists: character-indexed
  * `substring(text, i, 3)` re-seeks UTF-8 character boundaries from
  * byte 0 on every call, so the chain is O(chars²) per document —
  * this is one linear pass that records each character's byte offset
  * once and slices the shared byte array per window.
  */
case class CharTrigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // analysis-time type check instead of a runtime ClassCastException
  // on a wrong-typed child (r14 ADVICE)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override def nullSafeEval(s: Any): Any =
    CharTrigrams.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.CharTrigrams.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigrams {
  /** NOTE (r14 ADVICE): the emitted UTF8Strings are fromBytes VIEWS
    * over the array `getBytes` returns. When the input string spans
    * its whole buffer, `getBytes` returns the backing array itself,
    * so the outputs alias the input's storage. Safe under Spark's
    * copy-on-unsafe-projection behavior (every consumer copies the
    * array into an UnsafeArrayData before the row leaves the
    * operator); if this expression is ever reused somewhere that
    * recycles input buffers, copy the byte range per trigram instead.
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // character start offsets, computed once (the same
    // numBytesForFirstByte stepping Spark's numChars/substring use)
    val starts = new Array[Int](s.numChars() + 1)
    var off = 0
    var c = 0
    while (off < nb) {
      starts(c) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      c += 1
    }
    starts(c) = nb
    val count = c - 2
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(i + 3)
      out(i) = UTF8String.fromBytes(bytes, from, until - from)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Salted-md5 MinHash signature — the PORTABLE-SQL hash family of the
  * LSH-tuning / estimator-error reports (graft.ops.Dedup C20/C21).
  * Element j = min over shingles s of the unsigned integer value of
  * the first 6 digest bytes of md5("j:" + s) — bit-identical to the
  * SQL chain `conv(substring(md5(concat_ws(':', j, s)), 1, 12), 16,
  * 10)` that the DuckDB oracles replay verbatim, including concat_ws's
  * null-skipping (a null shingle hashes the bare salt digits) and
  * array_min's empty→null.
  *
  * Why it exists: the equivalent SQL chain runs as interpreted
  * higher-order functions (transform × array_min × hex-string conv),
  * materializing a 32-char hex string and a decimal string per
  * (shingle, hash). This computes the same values in one scan-side
  * pass over the shingle array with no intermediate strings — the
  * oracle SQL is unchanged, only the engine side gets cheaper.
  */
case class SaltedMd5MinHash(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "salted_md5_minhash"

  override def nullSafeEval(arr: Any): Any =
    SaltedMd5MinHash.compute(arr.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SaltedMd5MinHash.compute($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SaltedMd5MinHash {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0)  // array_min over an empty transform is null per hash
      return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val md = digests.get()
    // per-hash salt prefix "j:" as utf8 bytes, computed once per call
    val salts = Array.tabulate(numHashes)(j => (j.toString + ":").getBytes("UTF-8"))
    var i = 0
    while (i < n) {
      val sb: Array[Byte] =
        if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      var j = 0
      while (j < numHashes) {
        md.reset()
        if (sb == null) {
          // concat_ws skips null args: md5 of the bare digits, no colon
          val s = salts(j)
          md.update(s, 0, s.length - 1)
        } else {
          md.update(salts(j))
          md.update(sb)
        }
        val d = md.digest()
        val v = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
          ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
          ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Sliding n-token-gram MD5 digests of a token array — the scan-side
  * input of the exact-substring span dedup (graft.ops.Dedup C13).
  * Element i = the 16-byte md5 digest of tokens[i..i+n-1] joined with
  * a single space, null tokens skipped exactly like concat_ws. Gram
  * EQUALITY is all the consumer uses, so this replaces the
  * `transform(sequence..., i => md5(concat_ws(' ', slice(toks, i+1,
  * n)).cast('binary')))` chain with the raw digest instead of its
  * 32-char hex rendering: the interpreted per-window slice/concat
  * allocations disappear into one codegen'd pass, and the gram
  * shuffle key drops from 32-byte strings to 16-byte binaries. MD5's
  * 128 bits (not a 64-bit hash) is deliberate: at 10¹² grams a 64-bit
  * key expects thousands of birthday collisions — silent false
  * duplicate spans — while 128 bits stays collision-free.
  * Empty result when the array has fewer than n tokens (the caller's
  * size(toks) >= n guard makes this unreachable there).
  */
case class GramMd5(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "gram_md5"

  override def nullSafeEval(arr: Any): Any =
    GramMd5.compute(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.GramMd5.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramMd5 {
  private val Space = " ".getBytes("UTF-8")
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    val count = sz - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    // token bytes materialized once, reused across the n windows
    // each token participates in
    val toks = new Array[Array[Byte]](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    val out = new Array[Any](count)
    i = 0
    while (i < count) {
      md.reset()
      var first = true
      var j = i
      while (j < i + n) {
        val tb = toks(j)
        if (tb != null) { // concat_ws skips null elements entirely
          if (!first) md.update(Space)
          md.update(tb)
          first = false
        }
        j += 1
      }
      out(i) = md.digest()
      i += 1
    }
    new GenericArrayData(out)
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
