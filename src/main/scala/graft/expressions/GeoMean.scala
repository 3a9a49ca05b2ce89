package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (`Aggregator[IN, BUF, OUT]`): geometric mean
  * over pre-quantized integer log-units.  The input is
  * `floor(ln(x) * 1e12 + 0.5)` as a Long (computed in-plan so the
  * oracle shares the identical per-row IEEE chain); the buffer is an
  * EXACT two-Long carry accumulator (hi·10¹⁵ + lo) plus the count, so
  * the sum is the same integer no matter how partitions combine — a
  * plain double log-sum buffer accumulates in partition order and can
  * cross the output floor on a 1-ulp seam (the round-10 anova
  * lesson).  Capacity: |ln x|·10¹² < 10¹⁵ per row, hi overflows only
  * past ~9·10³³ total units ≈ 10²¹ rows — beyond any corpus.  The
  * exact integer total converts to double ONCE (correctly rounded,
  * matching DuckDB's `sum(u::HUGEINT)::DOUBLE`), then
  * exp(total / 10¹² / n).
  */
object GeoMean extends Aggregator[Long, (Long, Long, Long), Double] {
  private val Carry = 1000000000000000L // 10^15

  @inline private def norm(hi: Long, lo: Long): (Long, Long) = {
    val c = lo / Carry
    (hi + c, lo - c * Carry)
  }

  override def zero: (Long, Long, Long) = (0L, 0L, 0L)
  override def reduce(b: (Long, Long, Long), u: Long): (Long, Long, Long) = {
    val (hi, lo) = norm(b._1, b._2 + u)
    (hi, lo, b._3 + 1)
  }
  override def merge(a: (Long, Long, Long),
                     b: (Long, Long, Long)): (Long, Long, Long) = {
    val (hi, lo) = norm(a._1 + b._1, a._2 + b._2)
    (hi, lo, a._3 + b._3)
  }
  override def finish(r: (Long, Long, Long)): Double =
    if (r._3 == 0) Double.NaN
    else {
      val total = (BigInt(r._1) * Carry + BigInt(r._2)).toDouble
      math.exp(total / 1000000000000.0 / r._3)
    }
  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
