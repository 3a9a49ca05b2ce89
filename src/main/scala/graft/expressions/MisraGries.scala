package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS'12): at most
  * k−1 (token, weight) counters. The structural guarantee — the one
  * the E45/G27 operators lean on — is that ANY item with true
  * frequency > N/k is present in the summary after any sequence of
  * reduces and merges, because each decrement step removes k
  * occurrences from the accounting and can happen at most N/k times.
  * Retained WEIGHTS are order-dependent (they undercount by ≤ N/k),
  * so operators must treat the summary as a CANDIDATE set and re-count
  * exactly; the laws spec checks the retention guarantee under
  * permutation, not weight equality.
  *
  * The buffer rides a Seq of (token, weight) pairs — ExpressionEncoder
  * serializes it without Kryo, and k is small (32) so the O(k) scans
  * per row are cheap.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Seq[(String, Long)], Seq[String]] {

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(b: Seq[(String, Long)], x: String)
      : Seq[(String, Long)] = {
    val i = b.indexWhere(_._1 == x)
    if (i >= 0) b.updated(i, (x, b(i)._2 + 1L))
    else if (b.length < k - 1) b :+ (x, 1L)
    else b.map { case (t, c) => (t, c - 1L) }.filter(_._2 > 0L)
  }

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)])
      : Seq[(String, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    (a ++ b).foreach { case (t, c) => m(t) = m.getOrElse(t, 0L) + c }
    if (m.size <= k - 1) m.toSeq
    else {
      // subtract the k-th largest combined weight from everything —
      // the mergeable-summaries rule that preserves the N/k guarantee
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      m.toSeq.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0L)
    }
  }

  override def finish(r: Seq[(String, Long)]): Seq[String] =
    r.map(_._1).sorted

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
