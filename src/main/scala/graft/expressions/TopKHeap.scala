package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate: keeps the k largest (value, id) pairs
  * (value desc, id asc tiebreak) in an associatively-mergeable buffer.
  *
  * The scale point vs the window-function formulation
  * (`row_number() over (partition by g order by v desc) <= k`): a
  * window must shuffle and SORT every row of every group; this
  * Aggregator partial-combines map-side like any built-in aggregate,
  * so only ≤ k pairs per (group × map partition) reach the shuffle —
  * on a 100 TB fact table that is the difference between shuffling N
  * rows and shuffling groups×k. Semantics are identical and exact
  * (no float summation anywhere), which is what lets the window
  * formulation serve as the DuckDB oracle.
  *
  * The buffer is a sorted Seq capped at k — insertion is O(k), fine
  * for the small k this pattern targets (leaderboards, per-key top
  * examples).
  */
case class TopKPairs(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  // fast path: b is sorted (trim invariant), so when the buffer is
  // full and x sorts at-or-after the kth element, the result is b
  // unchanged — no allocation, no sort. With bounded k almost every
  // input row takes this branch (the x1000 kNN-graph rehearsal feeds
  // 3.4B candidate rows into 500k k=5 buffers; the full-sort-per-row
  // form was the measured hot frame).
  override def reduce(b: Seq[(Double, Long)],
                      x: (Double, Long)): Seq[(Double, Long)] =
    if (b.length >= k && {
      val (lv, lid) = b.last; x._1 < lv || (x._1 == lv && x._2 >= lid)
    }) b
    else trim(b :+ x)
  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(a ++ b)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}
