package graft

/** Executable plan audits for the round-8 operators: every scale claim
  * made in an operator's scaladoc ("broadcasts", "one shuffle",
  * "partial-aggregable", "no nested loop") asserted against the
  * actually-executed physical plan — the `.explain` discipline as
  * regression tests.
  */
class PlanAuditSpec extends SparkSpecBase {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("stac_nearest_join: query side broadcasts, no nested loop") {
    val plan = executedPlan("stac_nearest_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_windowed_funnel: one data shuffle feeds all three windows") {
    val plan = executedPlan("events_windowed_funnel")
    // three Window operators, and only two exchanges in the final
    // plan: the user_id hash partitioning + the presentation sort
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
    assert("(?s)Window".r.findAllIn(finalPlan).size >= 3, finalPlan)
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(finalPlan).toSeq
    assert(exchanges.count(_.contains("hashpartitioning")) <= 1,
      s"expected a single hash exchange:\n$finalPlan")
  }

  test("text_pmi: unigram joins broadcast, totals broadcast") {
    val plan = executedPlan("text_pmi")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"pair-vocab joins must not sort-merge:\n$plan")
  }

  test("sample_consistent: heap aggregation is two-phase (partial + final)") {
    val plan = executedPlan("sample_consistent")
    // typed k-bounded heap runs as ObjectHashAggregate partial+final
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("stac_best_scene: argmin is an aggregate, not a window sort") {
    val plan = executedPlan("stac_best_scene")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    // struct-min plans as SortAggregate — still two-phase partial/final
    assert("(Sort|Hash)Aggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("text_knn_sparse: df side broadcasts, top-k heap is two-phase") {
    val plan = executedPlan("text_knn_sparse")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_first_touch: purchase-touch join carries a (user_id, day) equi-key") {
    val plan = executedPlan("events_first_touch")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the join must be an equi-join whose key list includes the day
    // bucket — a pure-residual user_id join (unbounded per-user
    // fan-out) would show user_id as the only key
    val equiJoinKeys =
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\S* \[([^\]]*)\]""".r
    val joins = equiJoinKeys.findAllMatchIn(plan).map(_.group(2)).toSeq
    assert(joins.nonEmpty, s"no equi-join found:\n$plan")
    assert(joins.exists(k => k.contains("day#") && k.contains("user_id#")),
      s"join keys lack the day bucket: $joins\n$plan")
  }

  test("dedup_threshold_sweep: full-corpus sweep stays candidate-bounded") {
    // round 9 lifted the doc_id slice: the sweep must still reach the
    // corpus ONLY through the prefix equi-join — no all-pairs shape.
    // The one sanctioned nested loop is the 3-row threshold fan-out
    // (broadcast cross join of the VERIFIED pair set, not the corpus).
    val whole = executedPlan("dedup_threshold_sweep")
    val cut = whole.indexOf("== Initial Plan ==")
    val plan = if (cut >= 0) whole.substring(0, cut) else whole
    assert(!plan.contains("CartesianProduct"), plan)
    // the verified pair set feeds TWO rollup branches, so the 3-row
    // fan-out appears twice in the final plan — and never more
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 2, s"unexpected nested loops ($bnlj):\n$plan")
    // the prefix candidate join is an equi-join on the shingle key
    val equiJoinKeys =
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\S* \[([^\]]*)\]""".r
    val joins = equiJoinKeys.findAllMatchIn(plan).map(_.group(2)).toSeq
    assert(joins.exists(k => k.contains("ga#") || k.contains("g#")),
      s"prefix equi-join missing: $joins")
  }

  test("events_ab_ttest: one corpus scan, moment frame self-join broadcasts") {
    val plan = executedPlan("events_ab_ttest")
    assert(!plan.contains("CartesianProduct"), plan)
    // the 5-row moment frames meet via broadcast
    assert(plan.contains("Broadcast"), plan)
  }

  // NOTE on AQE plan strings: the Final Plan section elides subtrees
  // that live inside already-materialized query stages, so a join can
  // be ABSENT from the final section while very much executed. Structural
  // assertions (join presence, join keys, exchange census) therefore
  // run against the Initial Plan section (always the full tree; join
  // KEYS never change between sections) — only AQE-rewrite assertions
  // (e.g. "did it end up broadcast") belong on the final section.
  private def initialSection(whole: String): String = {
    val cut = whole.indexOf("== Initial Plan ==")
    if (cut >= 0) whole.substring(cut) else whole
  }

  test("events_asof_nearest: both directions off one sort, no join at all") {
    val plan = initialSection(executedPlan("events_asof_nearest"))
    // the whole operator is union + window frames — an inequality
    // join (the naive formulation) would appear as a Join node
    val joinPat = ("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|" +
      "BroadcastNestedLoopJoin|CartesianProduct)").r
    assert(!joinPat.findAllIn(plan).hasNext, s"joins found:\n$plan")
    // exactly one data shuffle: the __key hash partitioning (plus the
    // presentation range sort)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx === 1, s"expected one hash exchange ($hashEx):\n$plan")
  }

  test("dedup_boilerplate: corpus-keyed join on (source, whash), no hint") {
    val plan = initialSection(executedPlan("dedup_boilerplate"))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the common-window frame is corpus-derived: the join must carry
    // the (source, whash) equi-key (AQE may still pick broadcast at
    // test scale — the operator just must not HINT it)
    val equiJoinKeys =
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\S* \[([^\]]*)\]""".r
    val joins = equiJoinKeys.findAllMatchIn(plan).map(_.group(2)).toSeq
    assert(joins.exists(k => k.contains("whash#") && k.contains("source#")),
      s"(source, whash) equi-join missing: $joins")
  }

  test("dedup_lsh_tuning: no cartesian, banded frame never self-joins") {
    val plan = initialSection(executedPlan("dedup_lsh_tuning"))
    assert(!plan.contains("CartesianProduct"), plan)
    // per-config bucket histograms are count partial-aggregations —
    // a config must never materialize candidate PAIRS (no self-join
    // of the banded frame with itself on band_sig)
    val equiJoinKeys =
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\S* \[([^\]]*)\]""".r
    val joins = equiJoinKeys.findAllMatchIn(plan).map(_.group(2)).toSeq
    assert(!joins.exists(_.contains("band_sig#")),
      s"banded frame must aggregate, not self-join: $joins")
  }

  test("source_quality_cap: heap aggregation is two-phase (partial + final)") {
    val plan = executedPlan("source_quality_cap")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dedup_kmv_overlap: bottom-k sketch partial-combines map-side") {
    val plan = executedPlan("dedup_kmv_overlap")
    // the TopKPairs heap runs as ObjectHashAggregate partial+final,
    // so ≤ k rows per (source × partition) reach the exchange — the
    // claim that beats the oracle's per-source full sort
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("orders_survival_km: risk sets come from ONE corpus aggregation") {
    val plan = executedPlan("orders_survival_km")
    // corpus-scale work is the per-customer agg; everything after
    // (histogram, suffix window, fold) runs on the days-sized frame.
    // No join may touch the orders scan twice except the max-date
    // broadcast — so: no SortMergeJoin anywhere.
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_mannwhitney / doc_length_ks: corpus aggregates BEFORE the pair grid") {
    for (name <- Seq("events_mannwhitney", "doc_length_ks")) {
      val plan = initialSection(executedPlan(name))
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
      // the pair expansion is an INEQUALITY join against the tiny
      // key frame — it must run as BNLJ with that frame BROADCAST
      // (corpus side streamed), never as a shuffled product; two
      // expansions (left + right contribution) are expected
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
      assert(bnlj <= 2, s"$name: unexpected BNLJ count $bnlj:\n$plan")
      // the corpus collapses to (key, value) counts BEFORE the pair
      // grid: the deepest operator chain under the expansion joins
      // must contain the count HashAggregate, i.e. some aggregate
      // prints deeper (later) than the deepest join in the tree text
      val lastAgg = plan.lastIndexOf("Aggregate")
      val lastJoin = plan.lastIndexOf("Join")
      assert(lastAgg >= 0 && lastJoin >= 0, s"$name:\n$plan")
      assert(lastAgg > lastJoin,
        s"$name: no aggregate below the joins:\n$plan")
    }
  }

  test("text_heavy_tokens: MG summary partial-combines, candidates broadcast") {
    val plan = executedPlan("text_heavy_tokens")
    // pass 1's Misra-Gries Aggregator must run two-phase (map-side
    // partial summaries - the whole point of a mergeable sketch), and
    // pass 2's exact re-count must reach the corpus via a BROADCAST
    // of the sources x (k-1) candidate frame, never a sort-merge
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("revenue_ccf: lag pairing broadcasts the calendar-bounded frame") {
    val plan = executedPlan("revenue_ccf")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("orders_winsorized_mean: clamped mean is one two-phase pass, no sort") {
    // the bucketed-offset rank selection runs in the operator's
    // internal bounded-artifact job; the RETURNED plan is the final
    // clamped-mean pass - it must be a partial+final aggregate with
    // no range exchange (a global sort would mean percentile-by-sort)
    val plan = executedPlan("orders_winsorized_mean")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort found:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("events_anova: one corpus pass, moment frame folds without windows") {
    val plan = executedPlan("events_anova")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("registry-wide: no CartesianProduct in any batch query plan") {
    // mechanical sweep over EVERY non-streaming registry entry: build
    // the DataFrame (streaming entries execute on construction, so
    // they are audited by their own specs instead) and assert the
    // physical plan never falls back to an unbroadcast cartesian —
    // the one join shape with no scale story. BNLJ with a broadcast
    // build side is allowed (bounded-frame inequality joins).
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
    val offenders = names.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian joins in: ${offenders.mkString(", ")}")
  }

  test("media_cdc_dedup: chunk windows are per-document only") {
    val plan = executedPlan("media_cdc_dedup")
    // every Window must partition by doc_id — a global (unpartitioned)
    // window over the exploded positions would serialize the corpus
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windows.nonEmpty, plan)
    assert(windows.forall(_.contains("doc_id#")),
      s"window not doc-partitioned: $windows")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("order_value_hill: top-k is a TakeOrdered heap, no global sort") {
    val plan = executedPlan("order_value_hill")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }

  test("user_value_theil: one two-phase corpus pass, no windows") {
    val plan = executedPlan("user_value_theil")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("embedding_label_centroids: dim sums partial-combine, no windows") {
    val plan = executedPlan("embedding_label_centroids")
    // (label, dim) and per-label rollups each run partial+final
    assert("(Object)?HashAggregate".r.findAllIn(plan).size >= 4, plan)
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("events_kruskal_wallis: corpus collapses to the value grid " +
    "before any window") {
    val plan = executedPlan("events_kruskal_wallis")
    // the (cents, type) and cents collapses each run partial+final;
    // the rank window then rides the domain-bounded frame
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("shuffle_locality_audit: adjacency window is bucket-partitioned") {
    val plan = executedPlan("shuffle_locality_audit")
    val windows = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    // the corpus-sized lag window must carry the H7 hash bucket; the
    // only unpartitioned window is the 16-row bucket-ends frame
    assert(windows.exists(_.contains("bkt#")),
      s"no bucket-partitioned window: $windows\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("text_js_divergence: source pairing is a token equi-join") {
    val plan = executedPlan("text_js_divergence")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val equiJoinKeys =
      """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\S* \[([^\]]*)\]""".r
    val joins = equiJoinKeys.findAllMatchIn(plan).map(_.group(2)).toSeq
    assert(joins.exists(_.contains("token#")),
      s"self-join lacks the token key: $joins\n$plan")
  }

  test("multimodal_payload_entropy: scan-side projection, " +
    "no data shuffle beyond the presentation sort") {
    val plan = executedPlan("multimodal_payload_entropy")
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
    assert(!finalPlan.contains("HashAggregate"),
      s"no aggregate expected:\n$finalPlan")
    assert("Exchange".r.findAllIn(finalPlan).size <= 1,
      s"expected only the presentation range exchange:\n$finalPlan")
    // the expression runs inside whole-stage codegen, not interpreted
    assert("\\*\\(\\d+\\) Project \\[[^\\n]*byte_log_units".r
      .findFirstIn(finalPlan).isDefined,
      s"byte_log_units not in a codegen stage:\n$finalPlan")
  }
}
