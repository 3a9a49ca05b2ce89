package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch buffer: the k
  * smallest DISTINCT hash values seen. Unlike [[TopKPairs]] the
  * buffer is a SET bottom-k — `distinct` before every trim — because
  * the KMV estimator needs the k-th smallest unique hash; a repeated
  * value must not occupy two slots.
  *
  * Merge is associative, commutative, AND idempotent (union of sets,
  * re-trimmed), which is what makes the same buffer serve batch
  * partial aggregation, streaming state (re-fed on restart without
  * drift), and cross-shard sketch unions. Laws are property-checked
  * in AggregatorLawsSpec.
  */
case class KmvSketch(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Seq.empty
  // Saturated-buffer fast path: the buffer invariant (sorted,
  // distinct, ≤k — every constructor path runs trim) means x ≥ last
  // can never enter a full buffer (equal ⇒ duplicate, greater ⇒ not
  // bottom-k), so the per-row distinct+sort only runs for candidate
  // inserts — O(1) amortized on the streaming hot path.
  override def reduce(b: Seq[Long], x: Long): Seq[Long] =
    if (b.length == k && x >= b.last) b else trim(b :+ x)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    trim(a ++ b)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}
