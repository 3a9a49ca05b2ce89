package graft

import org.apache.spark.sql.functions._

/** Verdict-r10 task 6: the approx_percentile (Greenwald–Khanna, the
  * B35-sketch family) fallback behind `approx = true` on the two
  * grouped exact-percentile operators whose memory is bounded by the
  * LARGEST GROUP (E36 doc_length_profile, H19
  * quality_score_normalize). The exact path stays the oracle-gated
  * default; these specs pin the fallback's accuracy bound so the
  * flag is a measured trade, not a hope:
  *
  *  - GK guarantees rank error ≤ n/accuracy. At sf0.001 n_per_group ≪
  *    accuracy = 10000, so the sketch must return an ACTUAL element
  *    whose rank error is < 1 — i.e. an element adjacent to the exact
  *    interpolated percentile.
  *  - H19's ventile labels move by at most one step under a boundary
  *    rank error < 1.
  */
class PercentileFallbackSpec extends SparkSpecBase {
  import spark.implicits._

  test("E36 approx profile: per-lang percentiles within adjacent-rank" +
    " bound of exact") {
    val exact = ops.TextAnalysis.docLengthProfile(spark, sf)
      .select($"lang", $"n_docs", $"p10", $"p50", $"p90").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val approx = ops.TextAnalysis
      .docLengthProfile(spark, sf, approx = true).collect()
    assert(approx.nonEmpty)
    // the group's raw sorted lengths, for rank checks
    val lens = Tables.load(spark, sf, "documents")
      .select($"lang", size(split($"text", " ")).cast("long").as("n"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (l, a) => l -> a.map(_._2).sorted }
    for (r <- approx) {
      val lang = r.getString(0)
      val (nDocs, _, _, _) = exact(lang)
      val sorted = lens(lang)
      assert(nDocs == sorted.length)
      for ((q, v) <- Seq(0.1 -> r.getDouble(2), 0.5 -> r.getDouble(3),
        0.9 -> r.getDouble(4))) {
        // GK with n ≪ accuracy returns an element whose rank is
        // within 1 of q·(n−1) (the exact path interpolates between
        // ranks ⌊q(n−1)⌋ and ⌈q(n−1)⌉)
        val pos = q * (sorted.length - 1)
        val lo = sorted(math.max(math.floor(pos).toInt - 1, 0))
        val hi = sorted(
          math.min(math.ceil(pos).toInt + 1, sorted.length - 1))
        assert(v >= lo && v <= hi,
          s"$lang q=$q approx=$v outside rank band [$lo,$hi]")
      }
    }
  }

  test("H19 approx ventiles: every doc within one ventile of exact," +
    " keep-share stable") {
    val exactRows = ops.Curation.qualityNormalize(spark, sf)
      .select($"doc_id", $"ventile", $"keep")
      .as[(Long, Long, Boolean)].collect()
    val exact = exactRows.map(r => r._1 -> r._2).toMap
    val approx = ops.Curation.qualityNormalize(spark, sf, approx = true)
      .select($"doc_id", $"ventile", $"keep")
      .as[(Long, Long, Boolean)].collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    // the hard GK guarantee: a boundary's rank error < 1 at n ≪
    // accuracy, so no doc can cross MORE than one ventile. Off-by-one
    // flips are expected at tiny group sizes (the exact path
    // interpolates BETWEEN elements, the sketch returns an element,
    // so every at-boundary doc shifts by exactly one); they vanish as
    // n grows because element gaps shrink relative to the ventile
    // width.
    val deltas = approx.map { case (id, v, _) => math.abs(v - exact(id)) }
    assert(deltas.max <= 1,
      s"a ventile moved by ${deltas.max} > 1 under the sketch")
    val same = deltas.count(_ == 0).toDouble / deltas.length
    assert(same >= 0.5, s"only ${same * 100}%% ventiles identical")
    // the downstream contract: the top-half KEEP cut stays stable
    val keepE = exactRows.count(_._3).toDouble / exactRows.length
    val keepA = approx.count(_._3).toDouble / approx.length
    assert(math.abs(keepA - keepE) <= 0.1,
      s"keep share moved $keepE -> $keepA under the sketch")
  }
}
