package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-corpus curation operators beyond cleaning/dedup: split
  * assignment, sequence packing, benchmark-contamination checks, and
  * domain-mixing weights — the bookkeeping a 100 TB data pipeline does
  * after filtering and before tokenization.
  */
object Curation {

  /** Deterministic train/val/test assignment from a content-stable
    * hash (md5 of the doc id): bucket = last hex digit (0–15),
    * train = 0–11, val = 12–13, test = 14–15 (75/12.5/12.5).
    *
    * Scale shape: a pure scan-side projection — no shuffle, no RNG
    * state, reproducible under retries/re-partitioning, and any
    * engine (here: DuckDB) derives the identical split, which is the
    * property that matters for held-out hygiene.
    */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("bucket",
        conv(substring(md5($"doc_id".cast("string").cast("binary")), 32, 1),
          16, 10).cast("long"))
      .withColumn("split",
        when($"bucket" < 12, "train")
          .when($"bucket" < 14, "val")
          .otherwise("test"))
      .select($"doc_id", $"bucket", $"split")
      .orderBy($"doc_id")
  }

  /** H27 — duplicate-consistent (group-aware) dataset split: H2
    * splits by doc_id hash, so two docs with IDENTICAL text can land
    * in train AND test — the eval set then "tests" memorized training
    * rows, the elementary leakage H12 only audits after the fact.
    * Here the split key is the hash of the CONTENT group (md5 of the
    * text), so every member of an exact-dup group lands in the same
    * split BY CONSTRUCTION; group_id (min doc_id of the group) and
    * the member count ride along so downstream can keep one member
    * per group in eval splits.
    *
    * Scale shape: one groupBy(text-hash) partial agg for (group_id,
    * size) + one same-key join back — both on the content-hash
    * partitioning, no window, no skew (group sizes are dedup-bounded).
    * Deterministic and retry-safe like every H-block hash decision.
    */
  def groupedSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("th", md5($"text".cast("binary")))
    val groups = docs.groupBy($"th")
      .agg(min($"doc_id").as("group_id"),
        count(lit(1)).as("n_group_members"))
    docs.join(groups, "th")
      .withColumn("bucket",
        conv(substring(md5(concat(lit("gsplit:"), $"th")
          .cast("binary")), 32, 1), 16, 10).cast("long"))
      .withColumn("split",
        when($"bucket" < 12, "train")
          .when($"bucket" < 14, "val")
          .otherwise("test"))
      .select($"doc_id", $"group_id", $"n_group_members", $"bucket",
        $"split")
      .orderBy($"doc_id")
  }

  /** Sequence packing: concatenate documents (per language, in doc_id
    * order) into fixed token-budget packs; a doc starts a new pack
    * when the running total crosses the budget. One window per
    * partition key — a single shuffle on `lang`; the cumulative sum is
    * streaming within each sorted partition.
    */
  def packSequences(spark: SparkSession, dir: String,
                    budget: Int = 512): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "documents")
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
      .withColumn("cum", sum($"n_tokens").over(w))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div $budget"))
      .select($"doc_id", $"lang", $"n_tokens", $"pack_id")
      .orderBy($"doc_id")
  }

  /** Benchmark-contamination check: corpus documents sharing any
    * 8-token shingle with a held-out benchmark set (here: doc_id <
    * 50). The benchmark's distinct shingles are BROADCAST — at 100 TB
    * the corpus streams through a map-side hash probe; only matched
    * (doc, gram) rows reach the count shuffle.
    */
  def contaminationCheck(spark: SparkSession, dir: String,
                         benchBelow: Long = 50L, n: Int = 8): DataFrame = {
    import spark.implicits._
    val grams = Tables.load(spark, dir, "documents")
      .withColumn("t", split($"text", " "))
      .filter(size($"t") >= n)
      // codegen'd one-pass distinct n-grams, bit-identical to the
      // array_distinct(transform(sequence…slice…)) chain for
      // size >= n (SqlFunctionsSpec)
      .select($"doc_id",
        explode(graft.functions.shingles_n($"t", n)).as("gram"))
    val bench = grams.filter($"doc_id" < benchBelow)
      .select($"gram").distinct()
    grams.filter($"doc_id" >= benchBelow)
      .join(broadcast(bench), "gram")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared")) // per-doc grams already distinct
      .orderBy($"doc_id")
  }

  /** Domain-mixing weights: per-language resampling factor that would
    * rebalance the corpus to uniform language shares
    * (weight = total / (n_langs · count)). The stats frame is tiny —
    * everything after the first groupBy is a broadcast-scale plan.
    */
  def langMixWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Window.partitionBy()
    Tables.load(spark, dir, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("mix_weight", floor(
        sum($"n_docs").over(all).cast("double") /
          (count(lit(1)).over(all) * $"n_docs") * 1000000.0 + 0.5)
        / 1000000.0)
      .select($"lang", $"n_docs", $"mix_weight")
      .orderBy($"lang")
  }

  /** H10 — temperature-smoothed language sampling (the multilingual
    * mixing recipe of mT5/XLM-R): p_l ∝ n_l^α with α < 1 flattens the
    * language distribution — low-resource languages are upsampled,
    * high-resource ones downsampled, α interpolating between
    * proportional (α=1) and uniform (α=0). Emits each language's
    * sampling probability and effective up/down-sampling factor
    * (p_l·N/n_l) — the knobs a data loader consumes. The per-lang
    * counts frame is vocabulary-sized, so the global window is over a
    * handful of rows; the corpus contributes one partial-agg count.
    */
  def langTemperatureMix(spark: SparkSession, dir: String,
                         alpha: Double = 0.3): DataFrame = {
    import spark.implicits._
    val counts = Tables.load(spark, dir, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", pow($"n_docs", alpha))
    // z = Σ w folds the languages-sized frame in SORTED lang order —
    // engine-deterministic (a float window SUM accumulates in
    // partition order and can flip the 6dp floor on a 1-ulp seam);
    // the oracle replays the identical ordered fold
    val z = counts.agg(
      aggregate(sort_array(collect_list(struct($"lang", $"w"))),
        lit(0.0), (a, x) => a + x.getField("w")).as("z"),
      sum($"n_docs").as("n"))
    counts.crossJoin(broadcast(z))
      .withColumn("p_sample",
        floor($"w" / $"z" * 1000000.0 + 0.5) / 1000000.0)
      .withColumn("up_factor",
        floor($"w" / $"z" * $"n" / $"n_docs" * 1000000.0 + 0.5)
          / 1000000.0)
      .select($"lang", $"n_docs", $"p_sample", $"up_factor")
      .orderBy($"lang")
  }

  /** H13 — epoch/repetition planner: turn H10's temperature weights
    * into per-language EPOCH counts under a fixed token budget — the
    * repetition schedule a multi-epoch training run actually consumes
    * (how many times each language's corpus is traversed). Budget =
    * the corpus's own token total (scale-free), redistributed by
    * p_l ∝ n_l^α; epochs_l = min(budget·p_l / n_l, cap) so upsampling
    * of low-resource languages is bounded (the "repeat small data at
    * most `cap`×" rule), and the tokens the cap frees are reported so
    * a caller can re-allocate them. Effective token counts floor to
    * integers on both engines.
    *
    * Scale shape: the corpus contributes ONE map-side-combined
    * (lang, token-count) aggregate; everything after runs on the
    * languages-sized frame (global window over a handful of rows).
    */
  /** H14 — dedup-adjusted temperature mix (C12 × H10): the α-schedule
    * recomputed on the per-language KEPT counts after C10's cluster-
    * keeper dedup — the weights a run should actually sample with
    * (pre-dedup counts overweight the very languages dedup shrinks
    * most). Inherits C10/C12's corpus-linear cluster pass; the mix
    * math runs on the languages-sized frame.
    */
  def dedupTemperatureMix(spark: SparkSession, dir: String,
                          alpha: Double = 0.3): DataFrame = {
    import spark.implicits._
    val kept = Dedup.dedupLangRetention(spark, dir)
      .select($"lang", $"n_kept")
      .withColumn("w", pow($"n_kept", alpha))
    // sorted-lang fold for z (see langTemperatureMix)
    val z = kept.agg(
      aggregate(sort_array(collect_list(struct($"lang", $"w"))),
        lit(0.0), (a, x) => a + x.getField("w")).as("z"),
      sum($"n_kept").as("n"))
    kept.crossJoin(broadcast(z))
      .withColumn("p_sample",
        floor($"w" / $"z" * 1000000.0 + 0.5) / 1000000.0)
      .withColumn("up_factor",
        floor($"w" / $"z" * $"n" / $"n_kept" * 1000000.0 + 0.5)
          / 1000000.0)
      .select($"lang", $"n_kept", $"p_sample", $"up_factor")
      .orderBy($"lang")
  }

  def langEpochPlan(spark: SparkSession, dir: String,
                    alpha: Double = 0.3, cap: Double = 4.0): DataFrame = {
    import spark.implicits._
    val counts = Tables.load(spark, dir, "documents")
      .select($"lang",
        size(filter(split($"text", " "), t => t =!= "")).cast("long")
          .as("n_tok"))
      .groupBy($"lang").agg(sum($"n_tok").as("n_tokens"))
      .withColumn("w", pow($"n_tokens", alpha))
    // sorted-lang fold for z (see langTemperatureMix)
    val zf = counts.agg(
      aggregate(sort_array(collect_list(struct($"lang", $"w"))),
        lit(0.0), (a, x) => a + x.getField("w")).as("z"),
      sum($"n_tokens").as("tot"))
    counts.crossJoin(broadcast(zf))
      .withColumn("budget", $"tot".cast("double"))
      .withColumn("desired", $"w" / $"z" * $"budget")
      .withColumn("epochs_raw", $"desired" / $"n_tokens")
      .withColumn("epochs", least($"epochs_raw", lit(cap)))
      .select($"lang", $"n_tokens",
        (floor($"epochs" * 1000000.0 + 0.5).cast("double") / 1000000.0)
          .as("epochs"),
        floor($"epochs" * $"n_tokens").cast("long").as("eff_tokens"),
        floor(($"epochs_raw" - $"epochs") * $"n_tokens").cast("long")
          .as("freed_tokens"))
      .orderBy($"lang")
  }

  /** H16 — deterministic weighted sampling without replacement
    * (priority-sampling shape of Efraimidis–Spirakis): each doc gets
    * an integer priority h/w where h is a 48-bit content-stable hash
    * (first 12 hex digits of md5) and w its weight (here n_chars —
    * longer docs are proportionally likelier to be kept); the sample
    * is the n smallest priorities. All-integer arithmetic (hash,
    * integer division) so any engine re-derives the identical sample —
    * no float keys, no RNG state, stable under retries.
    *
    * Scale shape: a scan-side projection feeding a distributed top-n
    * (TakeOrdered — per-partition heaps, one n-row merge on the
    * driver); nothing is globally sorted.
    */
  def weightedSample(spark: SparkSession, dir: String,
                     n: Int = 200): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("h",
        conv(substring(md5(concat(lit("wsample:"), $"doc_id".cast("string"))
          .cast("binary")), 1, 12), 16, 10).cast("long"))
      .withColumn("priority", expr("h div greatest(n_chars, 1L)"))
      .select($"doc_id", $"n_chars", $"priority")
      .orderBy($"priority", $"doc_id")
      .limit(n)
      .orderBy($"doc_id")
  }

  /** H18 — consistent per-group bottom-k sample: each (lang, source)
    * stratum keeps the k docs with the smallest keyed-md5 priority —
    * the "consistent sampling" primitive (fixed hash, not RNG) that
    * gives every pipeline run, resume, and downstream consumer the
    * SAME audit sample of every stratum, and composes under corpus
    * growth (a doc's membership never flips unless k fills up with
    * smaller hashes).
    *
    * Scale shape: the selection runs through the B37 k-bounded heap
    * aggregator, so partial aggregation trims to ≤k rows per group
    * map-side and only groups×k rows reach the one shuffle — the
    * row_number() window the oracle uses would sort every stratum in
    * full. Priorities are 48-bit md5 prefixes (exact in a Double, so
    * the heap's (-h, doc_id) order equals the oracle's (h, doc_id)).
    */
  def consistentSample(spark: SparkSession, dir: String,
                       k: Int = 20): DataFrame = {
    import spark.implicits._
    val topk = udaf(graft.expressions.TopKPairs(k))
    Tables.load(spark, dir, "documents")
      .withColumn("h",
        conv(substring(md5(concat(lit("csample:"), $"doc_id".cast("string"))
          .cast("binary")), 1, 12), 16, 10).cast("long"))
      .groupBy($"lang", $"source")
      .agg(topk((-$"h").cast("double"), $"doc_id").as("top"))
      .select($"lang", $"source", posexplode($"top").as(Seq("idx", "p")))
      .select($"lang", $"source", ($"idx" + 1).cast("long").as("rnk"),
        $"p._2".as("doc_id"), (-$"p._1").cast("long").as("h"))
      .orderBy($"lang", $"source", $"rnk")
  }

  /** H23 — cross-split n-gram coverage: the fraction of the TEST
    * split's distinct 8-grams already present in TRAIN, per language —
    * the generalization-gap floor (a high-coverage test split mostly
    * measures memorization, not generalization; the aggregate
    * complement of H4's per-item contamination check). One gram
    * explode with scan-side split tags, per-split distinct frames, a
    * gram-keyed left join of the test frame against train, and a
    * langs-sized rollup — gram-linear, the C7/E22 machinery pointed at
    * split hygiene.
    */
  def splitNgramOverlap(spark: SparkSession, dir: String,
                        n: Int = 8): DataFrame = {
    import spark.implicits._
    val grams = Tables.load(spark, dir, "documents")
      .withColumn("bucket",
        conv(substring(md5($"doc_id".cast("string").cast("binary")), 32, 1),
          16, 10).cast("long"))
      .withColumn("split",
        when($"bucket" < 12, "train").when($"bucket" < 14, "val")
          .otherwise("test"))
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= n)
      .select($"lang", $"split",
        explode(graft.functions.word_ngrams($"toks", n)).as("g"))
      .distinct()
    val train = grams.filter($"split" === "train")
      .select($"lang", $"g").distinct()
      .withColumn("seen", lit(1L))
    grams.filter($"split" === "test")
      .select($"lang", $"g")
      .join(train, Seq("lang", "g"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_test_grams"),
        sum(coalesce($"seen", lit(0L))).as("n_covered"))
      .select($"lang", $"n_test_grams", $"n_covered",
        (floor($"n_covered".cast("double") / $"n_test_grams"
          * 1000000.0 + 0.5) / 1000000.0).as("coverage"))
      .orderBy($"lang")
  }

  /** H22 — packing-efficiency report: per-(lang, pack) token fill of
    * H3's budget-packed sequences rolled to a per-lang summary (packs,
    * mean fill, underfilled-pack share) — the utilization number that
    * says whether the packing budget wastes training FLOPs (every
    * sub-budget pack pads to context length). Same one-shuffle window
    * as H3, then two partial-aggregable rollups over the packs frame;
    * integer token counts → exact shares, 4-dp rounded.
    */
  def packEfficiency(spark: SparkSession, dir: String,
                     budget: Int = 512): DataFrame = {
    import spark.implicits._
    val packs = packSequences(spark, dir, budget)
      .groupBy($"lang", $"pack_id")
      .agg(sum($"n_tokens").as("tok"))
    packs.groupBy($"lang")
      .agg(count(lit(1)).as("n_packs"),
        sum($"tok").as("n_tokens"),
        (floor(avg($"tok".cast("double") / budget) * 10000.0 + 0.5)
          / 10000.0).as("mean_fill"),
        (floor(sum(when($"tok" < budget, 1L).otherwise(0L))
          .cast("double") / count(lit(1)) * 10000.0 + 0.5) / 10000.0)
          .as("underfill_share"))
      .orderBy($"lang")
  }

  /** H19 — cross-source quality-score normalization: each document's
    * E2 quality score mapped to its ventile WITHIN its source, so a
    * single global cut ("keep the top half") keeps the same fraction
    * of every source — an absolute threshold over a heterogeneous
    * corpus silently over-selects whichever source scores easy, which
    * skews the mix exactly like skipping H5's reweighting.
    *
    * Scale shape: per-source ventile boundaries come from ONE grouped
    * exact-percentile aggregate (sources × 19 doubles — broadcast back;
    * B35's sketch is the documented constant-memory stand-in at
    * corpus scale); scoring is a scan-side array-filter fold against
    * the 4-dp-rounded boundary list (the B50 strict-`>` cut), so no
    * per-source window ever sorts the corpus.
    */
  def qualityNormalize(spark: SparkSession, dir: String,
                       approx: Boolean = false,
                       accuracy: Int = 10000): DataFrame = {
    import spark.implicits._
    val scored = TextAnalysis.quality(spark, dir)
      .select($"doc_id", $"quality")
      .join(Tables.load(spark, dir, "documents")
        .select($"doc_id", $"source"), "doc_id")
    val qs = (1 to 19).map(_ / 20.0)
    // approx=true: the B35-sketch (Greenwald–Khanna) fallback for a
    // largest-source group that exceeds the exact Percentile buffer —
    // O(accuracy) state per source, boundary rank error ≤ n/accuracy,
    // so a doc's ventile moves by AT MOST one (PercentileFallbackSpec
    // pins this). Exact stays the oracle-gated default.
    val pctExpr =
      if (approx)
        s"approx_percentile(quality, array(${qs.mkString(",")}), $accuracy)"
      else s"percentile(quality, array(${qs.mkString(",")}))"
    val bounds = scored.groupBy($"source")
      .agg(expr(pctExpr).as("bs"))
      .withColumn("bs", transform($"bs",
        b => floor(b * 10000.0 + 0.5).cast("double") / 10000.0))
    scored.join(broadcast(bounds), "source")
      .withColumn("ventile",
        (size(filter($"bs", b => $"quality" > b)) + 1).cast("long"))
      .select($"doc_id", $"source", $"quality", $"ventile",
        ($"ventile" > 10).as("keep"))
      .orderBy($"doc_id")
  }

  /** H21 — split-balance audit: per-(split, lang) shares vs the
    * overall language mix, with the absolute deviation — the "is my
    * split stratified or biased?" check next to H2 (the split itself)
    * and H12 (leakage). A deterministic hash split is unbiased only
    * in expectation; per-language deviation is what tells you whether
    * an 18%-of-corpus language ended up 25% of val. Two
    * partial-aggregable rollups (corpus-linear) and a broadcast-scale
    * join of the ≤ splits×langs frames; exact integers into one
    * division, 6-dp rounded.
    */
  def splitBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("bucket",
        conv(substring(md5($"doc_id".cast("string").cast("binary")), 32, 1),
          16, 10).cast("long"))
      .withColumn("split",
        when($"bucket" < 12, "train")
          .when($"bucket" < 14, "val")
          .otherwise("test"))
    val perSplit = docs.groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n"))
    val splitTot = perSplit.groupBy($"split").agg(sum($"n").as("ns"))
    val overall = docs.groupBy($"lang").agg(count(lit(1)).as("no"))
      .crossJoin(broadcast(
        docs.agg(count(lit(1)).cast("double").as("ntot"))))
      .select($"lang",
        (floor($"no" / $"ntot" * 1000000.0 + 0.5) / 1000000.0)
          .as("overall_share"))
    perSplit.join(broadcast(splitTot), "split")
      .join(broadcast(overall), "lang")
      .select($"split", $"lang", $"n",
        (floor($"n".cast("double") / $"ns" * 1000000.0 + 0.5)
          / 1000000.0).as("share"),
        $"overall_share")
      .withColumn("abs_dev",
        (floor(abs($"share" - $"overall_share") * 1000000.0 + 0.5)
          / 1000000.0))
      .orderBy($"split", $"lang")
  }

  /** H20 — corpus manifest: an order-independent content fingerprint
    * per source (doc count, commutative sum of keyed 48-bit md5
    * prefixes over doc_id+text, min/max doc_id) — two pipeline runs
    * (or a resume, or a migration) produced THE SAME corpus iff their
    * manifests match, without ever sorting or diffing the corpora.
    * Commutativity is the point: the sum is partition-order-invariant,
    * so it partial-aggregates map-side and reduces to one row per
    * source regardless of layout. (At large corpus sizes the sum
    * wraps mod 2^64 by Long two's-complement wraparound — still a
    * valid fingerprint; the oracle reduces its HUGEINT sum mod 2^64
    * into two's complement explicitly, because a bare BIGINT cast
    * would raise out-of-range instead of wrapping.)
    */
  def corpusManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("h",
        conv(substring(md5(concat($"doc_id".cast("string"), lit(":"),
          $"text").cast("binary")), 1, 12), 16, 10).cast("long"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"h").as("content_sum"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
      .orderBy($"source")
  }

  /** H17 — corpus datasheet ("dataset card" stats): the per-source
    * summary a data release ships — doc/lang counts, char and token
    * totals, corpus share, and the exact-duplicate rate (1 −
    * distinct(md5(text))/n). One pass over the corpus with map-side
    * partial aggregation; the per-source frame is tiny, so the share
    * window is broadcast-scale.
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Window.partitionBy()
    Tables.load(spark, dir, "documents")
      .select($"source", $"lang", $"n_chars",
        size(filter(split($"text", " "), t => t =!= "")).cast("long")
          .as("n_tok"),
        md5($"text".cast("binary")).as("th"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"lang").as("n_langs"),
        sum($"n_chars").as("total_chars"),
        sum($"n_tok").as("total_tokens"),
        countDistinct($"th").as("n_uniq"))
      .withColumn("pct_docs",
        floor($"n_docs".cast("double") / sum($"n_docs").over(all)
          * 1000000.0 + 0.5) / 1000000.0)
      .withColumn("dup_rate",
        floor((lit(1.0) - $"n_uniq".cast("double") / $"n_docs")
          * 1000000.0 + 0.5) / 1000000.0)
      .select($"source", $"n_docs", $"n_langs", $"total_chars",
        $"total_tokens", $"pct_docs", $"dup_rate")
      .orderBy($"source")
  }

  /** H6 — deterministic stratified sampling: downsample every language
    * to (approximately) the rarest language's share by keeping a doc
    * iff its content-stable hash bucket falls under the language's
    * rate. Same reproducibility stance as [[datasetSplit]] — no RNG
    * state, stable under retries, any engine re-derives the keep set.
    * The per-lang stats frame is tiny and broadcast; the corpus is one
    * scan-side filter.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val rates = docs.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("rate",
        min($"n_docs").over(Window.partitionBy()).cast("double") / $"n_docs")
      .select($"lang", $"rate")
    docs.join(broadcast(rates), "lang")
      .withColumn("bucket",
        conv(substring(md5($"doc_id".cast("string").cast("binary")), 1, 2),
          16, 10).cast("long"))
      .filter($"bucket".cast("double") / 256.0 < $"rate")
      .select($"doc_id", $"lang", $"bucket")
      .orderBy($"doc_id")
  }

  /** H7 — deterministic global shuffle rank (training-order
    * randomization): order by a content-stable hash key. The global
    * rank is computed WITHOUT a single-partition sort: the first hex
    * digit of the key splits the key space into 16 ordered ranges,
    * ranks are per-range row_numbers plus broadcast range offsets —
    * concatenated ranges ARE the global hash order. At 100 TB the
    * ranges are just more numerous (a longer prefix); nothing is ever
    * globally sorted on one node.
    */
  def globalShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.load(spark, dir, "documents")
      .select($"doc_id")
      .withColumn("sk",
        md5(concat(lit("shuffle:"), $"doc_id".cast("string")).cast("binary")))
      .withColumn("bkt", conv(substring($"sk", 1, 1), 16, 10).cast("int"))
    // 16-row offsets frame: docs below each key range (hex-char string
    // order == hex value order, so range concatenation is global order)
    val offsets = keyed.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum($"cnt").over(Window.orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bkt", $"offset")
    val w = Window.partitionBy($"bkt").orderBy($"sk", $"doc_id")
    keyed.join(broadcast(offsets), "bkt")
      .withColumn("rank", (row_number().over(w) + $"offset").cast("long"))
      .select($"doc_id", $"sk", $"rank")
      .orderBy($"rank")
  }

  /** H8 — token-budget corpus selection: keep the highest-priority
    * documents (here: lexical diversity = distinct-token ratio,
    * doc_id tiebreak) until the running token total reaches a fraction
    * of the corpus — greedy data selection under a training budget.
    * The global priority-ordered cumulative sum is computed WITHOUT a
    * single-partition window (the H7 trick, extended from ranks to
    * prefix sums): priority buckets split the key space, per-bucket
    * running sums get bucket-offsets from a broadcast 17-row frame,
    * and offset + local sum IS the global prefix sum. The budget
    * itself is a one-row broadcast, never a driver round-trip.
    */
  def budgetSelect(spark: SparkSession, dir: String,
                   frac: Double = 0.10): DataFrame = {
    import spark.implicits._
    val s = Tables.load(spark, dir, "documents")
      .withColumn("tk", split($"text", " "))
      .select($"doc_id", size($"tk").cast("long").as("n_tok"),
        (floor(size(array_distinct($"tk")).cast("double") / size($"tk")
          * 1000000.0 + 0.5).cast("double") / 1000000.0).as("uniq_ratio"))
      .withColumn("bkt", floor($"uniq_ratio" * 16).cast("int"))
    val offsets = s.groupBy($"bkt").agg(sum($"n_tok").as("btok"))
      .withColumn("offset",
        coalesce(sum($"btok").over(Window.orderBy($"bkt".desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bkt", $"offset")
    val budget = s.agg((sum($"n_tok") * frac).as("budget"))
    val w = Window.partitionBy($"bkt")
      .orderBy($"uniq_ratio".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.join(broadcast(offsets), "bkt")
      .withColumn("cum", (sum($"n_tok").over(w) + $"offset").cast("long"))
      .crossJoin(broadcast(budget))
      .filter($"cum" <= $"budget")
      .select($"doc_id", $"n_tok", $"uniq_ratio", $"cum")
      .orderBy($"doc_id")
  }

  /** H9 — difficulty-curriculum ordering: train-order documents
    * easy→hard by corpus-LM surprisal (E18's quality signal), with
    * the global rank AND the running token total computed without a
    * single-partition window — H7's bucketed-offset trick extended to
    * carry both a row offset and a token-sum offset per bucket.
    * Integer surprisal buckets split the score space (surprisal is
    * ln-vocabulary bounded, so the bucket count stays small at any
    * corpus size); per-bucket row_number/running-sum plus broadcast
    * offsets ARE the global curriculum. Output: where each document
    * sits in the curriculum and how many tokens precede it — the
    * schedule a data loader consumes.
    */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = TextAnalysis.unigramLogprob(spark, dir)
      .withColumn("bkt", floor($"avg_surprisal").cast("int"))
    val offsets = s.groupBy($"bkt")
      .agg(count(lit(1)).as("bcnt"), sum($"n_tok").as("btok"))
      .withColumn("rank_off",
        coalesce(sum($"bcnt").over(Window.orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tok_off",
        coalesce(sum($"btok").over(Window.orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bkt", $"rank_off", $"tok_off")
    val wr = Window.partitionBy($"bkt").orderBy($"avg_surprisal", $"doc_id")
    val ws = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.join(broadcast(offsets), "bkt")
      .withColumn("curriculum_rank",
        (row_number().over(wr) + $"rank_off").cast("long"))
      .withColumn("cum_tok", (sum($"n_tok").over(ws) + $"tok_off").cast("long"))
      .select($"doc_id", $"n_tok", $"avg_surprisal", $"curriculum_rank",
        $"cum_tok")
      .orderBy($"curriculum_rank")
  }

  /** H11 — hashed-n-gram importance weights (the DSIR recipe shape:
    * "Data Selection for Language Models via Importance Resampling",
    * Xie et al. 2023): bigram features hash into `buckets` buckets;
    * the target distribution is the `targetLang` sub-corpus, the raw
    * distribution is the whole corpus; each document scores the mean
    * log-ratio ln(p_target/p_raw) of its bigram buckets (Laplace
    * +1-smoothed). Positive weight ⇒ the document looks more like the
    * target domain than the corpus average — the resampling key for
    * domain-matched data selection.
    *
    * Scale shape: one scan-side bigram explode feeds BOTH bucket
    * aggregates (each a ≤`buckets`-row result with map-side partial
    * agg); the per-bucket log-ratio table is broadcast back, so the
    * scoring pass is scan-side too. Nothing corpus-sized ever sits on
    * the driver; total shuffle traffic is two bucket-count exchanges.
    */
  /** Hashed-bigram explode over a documents frame (batch or stream):
    * (doc_id, lang, bucket) — the feature stream both the trainer and
    * the scorer consume.
    */
  private[graft] def bigramBuckets(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", $"lang", split($"text", " ").as("t"))
      .filter(size($"t") >= 2)
      // same bigram list as the old transform(sequence(0, size-2),
      // i -> concat_ws(' ', slice(t, i+1, 2))) chain, one codegen pass
      .select($"doc_id", $"lang",
        explode(graft.functions.word_ngrams($"t", 2)).as("bg"))
      .withColumn("b",
        conv(substring(md5($"bg".cast("binary")), 1, 2), 16, 10)
          .cast("long"))
  }

  /** The trained artifact: per-bucket Laplace-smoothed log importance
    * ratio ln(p_target/p_raw) — ≤`buckets` rows, broadcastable
    * anywhere (including onto a stream).
    */
  private[graft] def bucketLogRatio(bg: DataFrame, targetLang: String,
                                    buckets: Int): DataFrame = {
    import bg.sparkSession.implicits._
    val raw = bg.groupBy($"b").agg(count(lit(1)).as("cr"))
    val tgt = bg.filter($"lang" === targetLang)
      .groupBy($"b").agg(count(lit(1)).as("ct"))
    raw
      .join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(raw.agg(sum($"cr").as("tr"))))
      .crossJoin(broadcast(tgt.agg(coalesce(sum($"ct"), lit(0L)).as("tt"))))
      // the log-ratio floors ONCE here (buckets-sized frame) to
      // integer 1e-9 units, so every per-doc mean downstream is an
      // exact integer sum / count — a float avg() accumulates in
      // partition order (round-10 anova seam)
      .select($"b", floor(log(
        (($"ct" + 1).cast("double") / ($"tt" + buckets)) /
          (($"cr" + 1).cast("double") / ($"tr" + buckets)))
        * 1000000000.0 + 0.5).cast("long").as("lru"))
  }

  def importanceWeights(spark: SparkSession, dir: String,
                        targetLang: String = "en",
                        buckets: Int = 256): DataFrame = {
    import spark.implicits._
    val bg = bigramBuckets(Tables.load(spark, dir, "documents"))
    val ratio = bucketLogRatio(bg, targetLang, buckets)
    bg.join(broadcast(ratio), "b")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"lru".cast("decimal(38,0)")).as("slru"))
      .select($"doc_id", $"n_bigrams",
        (floor($"slru".cast("double") / 1000000000.0 / $"n_bigrams"
          * 1000000.0 + 0.5).cast("double") / 1000000.0).as("weight"))
      .orderBy($"doc_id")
  }

  /** H12 — split-leakage audit: near-duplicate pairs (C2's verified
    * MinHash-LSH, jaccard ≥ threshold) whose members land in DIFFERENT
    * H2 splits — eval answers sitting in train as near-copies, the
    * leak an exact-match contamination check (H4) misses. Emits both
    * doc ids, both splits, and the jaccard so triage can sort by
    * severity.
    *
    * Scale shape: inherits C2's band-bucket join (the only
    * corpus-scale shuffle); the split columns are scan-side md5
    * projections joined doc_id-keyed onto the (tiny) verified pair
    * set.
    */
  def splitLeakage(spark: SparkSession, dir: String,
                   threshold: Double = 0.8): DataFrame = {
    import spark.implicits._
    val splits = datasetSplit(spark, dir).select($"doc_id", $"split")
    Dedup.minhashLsh(spark, dir, threshold)
      .join(splits.select($"doc_id".as("doc_a"), $"split".as("split_a")),
        "doc_a")
      .join(splits.select($"doc_id".as("doc_b"), $"split".as("split_b")),
        "doc_b")
      .filter($"split_a" =!= $"split_b")
      .select($"doc_a", $"split_a", $"doc_b", $"split_b", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** H26 — training-export shard plan: the corpus in H7's
    * deterministic shuffled order, cut into fixed-size shards, each
    * with an H20-style order-independent content fingerprint — the
    * manifest a tokenizer/training job consumes (shard boundaries
    * must be a pure function of the corpus so a re-run, a resume, or
    * a second consumer derives the identical files). [[writePackedShards]]
    * materializes this plan as one parquet file per shard.
    *
    * Scale shape: the global shuffled rank comes from H7's bucketed
    * offsets (per-bucket row_number + a broadcast 16-row offset
    * frame — no single-partition window); the shard rollup is a
    * shards-sized partial aggregation; the fingerprint sum wraps in
    * Long exactly like H20 (the oracle wraps identically).
    */
  def exportShardPlan(spark: SparkSession, dir: String,
                      docsPerShard: Int = 100): DataFrame = {
    import spark.implicits._
    globalShuffle(spark, dir)
      .withColumn("shard_id", expr(s"(rank - 1) DIV $docsPerShard"))
      .withColumn("h",
        conv(substring(md5(concat(lit("m:"), $"doc_id".cast("string"))
          .cast("binary")), 1, 12), 16, 10).cast("long"))
      .groupBy($"shard_id")
      .agg(count(lit(1)).as("n_docs"),
        min($"rank").as("first_rank"), max($"rank").as("last_rank"),
        sum($"h").as("fingerprint"))
      .orderBy($"shard_id")
  }

  /** The H26 sink: writes the corpus as `shard_id=N/` parquet
    * directories, ONE file per shard (the repartition key is the
    * shard id, so a shard's rows sit in exactly one task), rows
    * carrying their shuffled rank so a reader can restore the order
    * within a shard. Returns the plan it wrote (for the caller to
    * persist as the manifest). At scale `docsPerShard` is the file-
    * size lever, shard count the parallelism bound — the same
    * knob-split as the A11 GeoParquet monthly sink.
    */
  def writePackedShards(spark: SparkSession, dir: String, outPath: String,
                        docsPerShard: Int = 100): DataFrame = {
    import spark.implicits._
    val assigned = globalShuffle(spark, dir)
      .withColumn("shard_id", expr(s"(rank - 1) DIV $docsPerShard"))
      .select($"doc_id", $"rank", $"shard_id")
      .join(Tables.load(spark, dir, "documents"), "doc_id")
    assigned
      .repartition($"shard_id")
      .write.mode("overwrite")
      .partitionBy("shard_id")
      .parquet(outPath)
    exportShardPlan(spark, dir, docsPerShard)
  }

  /** H24 — per-source document cap by quality: each source keeps its
    * k best documents by the E2 quality score (ties by doc_id), the
    * per-domain cap that web-corpus recipes apply so one gigantic
    * domain cannot dominate the mix (C4 and its descendants cap or
    * downsample by registrable domain for exactly this reason —
    * Raffel et al. 2020 §2.2, Penedo et al. 2023 §3.1). Emits the
    * kept rows with their in-source rank plus the source's total doc
    * count, so retention per source is readable off the result.
    *
    * Scale shape: the quality score is a scan-side projection; the
    * selection runs through the B37 k-bounded heap aggregator, so
    * partial aggregation trims map-side and only sources×k rows reach
    * the shuffle (the oracle's per-source row_number would sort every
    * domain in full — unusable when one domain holds 10⁹ docs). The
    * totals frame and the final join are source-keyed (groups-sized,
    * NOT corpus-sized); no broadcast hint — AQE may pick one at small
    * group counts, a real corpus with 10⁷ domains shuffles both sides
    * on the shared key. Ranking uses the 4dp-ROUNDED score on both
    * engines, so the order (and the cap boundary) is engine-exact.
    */
  def sourceQualityCap(spark: SparkSession, dir: String,
                       k: Int = 15): DataFrame = {
    import spark.implicits._
    val topk = udaf(graft.expressions.TopKPairs(k))
    val scored = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source")
      .join(TextAnalysis.quality(spark, dir).select($"doc_id", $"quality"),
        "doc_id")
    val totals = scored.groupBy($"source")
      .agg(count(lit(1)).as("n_source_docs"))
    scored.groupBy($"source")
      .agg(topk($"quality", $"doc_id").as("top"))
      .select($"source", posexplode($"top").as(Seq("idx", "p")))
      .select($"source", ($"idx" + 1).cast("long").as("rnk"),
        $"p._2".as("doc_id"), $"p._1".as("quality"))
      .join(totals, "source")
      .orderBy($"source", $"rnk")
  }

  private val splitCaseSql =
    """CASE WHEN strpos('0123456789abcdef',
      |      substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 12
      |    THEN 'train'
      |  WHEN strpos('0123456789abcdef',
      |      substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 14
      |    THEN 'val'
      |  ELSE 'test' END""".stripMargin

  /** H29 — quality-curriculum epoch schedule: later epochs restrict
    * to higher-quality deciles (epoch 1 trains on everything, epoch 4
    * only on the top strata — the quality-annealing curriculum next
    * to H9's language temperature and H12's epoch allocation). Decile
    * boundaries come from ONE exact-percentile aggregate over E2's
    * 4dp quality score (B45's strict-`>` cut discipline); the corpus
    * then collapses to a 10-row (decile → docs/tokens) frame BEFORE
    * the epoch fan-out, so the 4× epoch cross joins 10 rows, never
    * data. Output: per (epoch, decile) docs, tokens, and the token
    * share inside the epoch — the numbers a data-loader config
    * actually encodes.
    */
  def qualityCurriculum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = graft.ops.TextAnalysis
      .withQualityScore(Tables.load(spark, dir, "documents"))
      .select($"doc_id", $"quality", size($"toks").cast("long").as("tk"))
    val qs = (1 to 9).map(_ / 10.0)
    val bRow = scored
      .agg(expr(s"percentile(quality, array(${qs.mkString(",")}))")
        .as("bs")).collect()(0)
    if (bRow.isNullAt(0))  // empty corpus: no deciles, no schedule
      return Seq.empty[(Long, Long, Long, Long, Double)]
        .toDF("epoch", "decile", "n_docs", "n_tokens", "token_share")
    val bounds = bRow.getSeq[Double](0)
      .map(b => math.floor(b * 10000.0 + 0.5) / 10000.0)
    val decile = bounds.foldLeft(lit(1L)) { (acc, b) =>
      acc + when($"quality" > b, 1L).otherwise(0L)
    }
    val perDecile = scored.groupBy(decile.as("decile"))
      .agg(count(lit(1)).as("n_docs"), sum($"tk").as("n_tokens"))
    val epochs = Seq((1L, 1L), (2L, 3L), (3L, 5L), (4L, 8L))
      .toDF("epoch", "min_decile")
    val plan = perDecile.crossJoin(broadcast(epochs))
      .filter($"decile" >= $"min_decile")
    val totals = plan.groupBy($"epoch")
      .agg(sum($"n_tokens").as("epoch_tokens"))
    plan.join(broadcast(totals), "epoch")
      .select($"epoch", $"decile", $"n_docs", $"n_tokens",
        (floor($"n_tokens".cast("double") / $"epoch_tokens"
          * 1000000.0 + 0.5) / 1000000.0).as("token_share"))
      .orderBy($"epoch", $"decile")
  }

  /** H30 — two-sample KS test between the TRAIN and TEST splits on
    * the E2 quality distribution: did H2's hash split shift the
    * quality LAW between what the model trains on and what it is
    * judged on? (H21 checks the language mix — a split can balance
    * languages and still put the long clean documents in train; this
    * catches that.) E43's exact machinery pointed at the split axis:
    * the sup gap is attained at an observed 4dp quality value, ECDFs
    * are prefix sums over the distinct-quality step frame (4dp ⇒
    * value-bounded, never corpus-sized), every input to the sup is a
    * deterministic per-row division, and `max` is order-exact.
    */
  def splitQualityKs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = TextAnalysis.quality(spark, dir)
      .select($"doc_id", $"quality")
      .withColumn("bucket",
        conv(substring(md5($"doc_id".cast("string").cast("binary")), 32, 1),
          16, 10).cast("long"))
      .withColumn("split",
        when($"bucket" < 12, "train")
          .when($"bucket" < 14, "val")
          .otherwise("test"))
      .filter($"split".isin("train", "test"))
    val steps = scored.groupBy($"quality".as("x"))
      .agg(sum(when($"split" === "train", 1L).otherwise(0L)).as("ia"),
        sum(when($"split" === "test", 1L).otherwise(0L)).as("ib"))
    val ns = scored.agg(
      sum(when($"split" === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when($"split" === "test", 1L).otherwise(0L)).as("n_test"))
    val w = Window.orderBy($"x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    steps
      .withColumn("ca", sum($"ia").over(w))
      .withColumn("cb", sum($"ib").over(w))
      .crossJoin(broadcast(ns))
      .filter($"n_train" > 0 && $"n_test" > 0)
      .withColumn("gap", abs($"ca".cast("double") / $"n_train" -
        $"cb".cast("double") / $"n_test"))
      .groupBy($"n_train", $"n_test")
      .agg(max($"gap").as("d"))
      .withColumn("crit_05", lit(1.358) *
        sqrt(($"n_train" + $"n_test").cast("double")
          / ($"n_train" * $"n_test")))
      .select($"n_train", $"n_test",
        (floor($"d" * 1000000.0 + 0.5) / 1000000.0).as("ks_stat"),
        (floor($"crit_05" * 1000000.0 + 0.5) / 1000000.0).as("crit_05"),
        ($"d" > $"crit_05").as("reject_05"))
  }

  /** H31 — filter selection-bias audit: per language, what did E28's
    * Gopher gate actually REMOVE? Kept-vs-dropped doc counts, mean
    * lengths, and the standardized mean difference
    * (μ_k − μ_d)/√((σ²_k + σ²_d)/2) — a |SMD| ≳ 0.8 says the filter
    * is doing LENGTH selection in that language, not quality
    * selection, which skews the surviving mix exactly like skipping
    * H5's reweighting (the classic "the filter silently deleted the
    * long-form German" failure). Moments are exact integers from one
    * conditional rollup (keep∈{0,1} gates the sums; Σlen² rides
    * DECIMAL(38,0) ≙ HUGEINT); the SMD is one shared double chain;
    * one-sided languages get defined nulls.
    *
    * Scale shape: E28's corpus-linear explode→rollup produces the
    * flags; ONE more doc-keyed join + langs-sized conditional
    * aggregate. Nothing new shuffles beyond the flag join.
    */
  def selectionBiasAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flags = TextAnalysis.gopherRules(spark, dir)
      .select($"doc_id", $"keep")
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    val g = docs.join(flags, "doc_id")
      .groupBy($"lang").agg(
        sum($"keep").as("n_keep"),
        sum(lit(1L) - $"keep").as("n_drop"),
        sum(($"keep" * $"n_chars").cast("decimal(38,0)")).as("slk"),
        sum(((lit(1L) - $"keep") * $"n_chars").cast("decimal(38,0)"))
          .as("sld"),
        sum(($"keep" * $"n_chars").cast("decimal(38,0)") * $"n_chars")
          .as("sl2k"),
        sum(((lit(1L) - $"keep") * $"n_chars").cast("decimal(38,0)")
          * $"n_chars").as("sl2d"))
    // greatest(n, 1) keeps the division defined under ANSI when a
    // language is ALL-kept or ALL-dropped (hostile fixture) — the
    // affected side's sums are 0 so the value is 0, and the when()
    // guards below exclude it from the output anyway
    val muk = $"slk".cast("double") / greatest($"n_keep", lit(1L))
    val mud = $"sld".cast("double") / greatest($"n_drop", lit(1L))
    val vk = $"sl2k".cast("double") / greatest($"n_keep", lit(1L)) -
      muk * muk
    val vd = $"sl2d".cast("double") / greatest($"n_drop", lit(1L)) -
      mud * mud
    g.select($"lang", $"n_keep", $"n_drop",
        when($"n_keep" > 0,
          floor(muk * 100.0 + 0.5) / 100.0).as("mean_len_keep"),
        when($"n_drop" > 0,
          floor(mud * 100.0 + 0.5) / 100.0).as("mean_len_drop"),
        when($"n_keep" > 0 && $"n_drop" > 0 && vk + vd > 0.0,
          floor((muk - mud) / sqrt((vk + vd) / 2.0) * 10000.0 + 0.5)
            / 10000.0).as("smd"))
      .orderBy($"lang")
  }

  /** H32 — integer waterfilling budget allocator: given each source's
    * available token supply and a total training budget B (here
    * ⌊total/2⌋ — derived from the data, so the fill level is
    * non-trivial at every SF), find the unique level λ with
    * Σᵢ min(availᵢ, λ) ≤ B maximal: small sources contribute
    * everything they have (saturated), large sources are capped at
    * the common level — the allocation a mixing pipeline computes
    * BEFORE sampling so no source is over-asked. The classic
    * waterfill solve (sort by supply, prefix sums, first segment
    * where the remaining budget fits) runs entirely on the
    * sources-sized frame; λ is one exact integer floor-division
    * (budget−prefix) div (segments remaining), so every column is
    * integer-exact cross-engine, including the undistributed
    * remainder (budget − Σ alloc = (budget−prefix) mod segments).
    *
    * Scale shape: ONE corpus pass (per-source token sums, scan-side
    * projection + partial agg); the sort, windows, and the
    * first-feasible argmin all run on the |sources|-row frame.
    */
  def budgetWaterfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val avail = Tables.load(spark, dir, "documents")
      .select($"source",
        size(filter(split($"text", " "), t => t =!= "")).cast("long")
          .as("n_tok"))
      .groupBy($"source").agg(sum($"n_tok").as("available"))
    val tot = avail.agg(sum($"available").as("total"),
      count(lit(1)).as("k"))
    val wAsc = Window.orderBy($"available", $"source")
    // sources-sized frame: the global windows are |sources|-bounded
    val ranked = avail.crossJoin(broadcast(tot))
      .withColumn("budget", expr("total DIV 2"))
      .withColumn("i", row_number().over(wAsc).cast("long"))
      .withColumn("pprev", coalesce(sum($"available").over(
        wAsc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // first feasible segment: the level lives where the remaining
    // budget fits under this source's supply ceiling
    val seg = ranked
      .filter($"pprev" + $"available" * ($"k" - $"i" + 1L) >= $"budget")
      .agg(min(struct($"i", $"pprev")).as("s"))
      .select($"s.i".as("li"), $"s.pprev".as("lp"))
    ranked.crossJoin(broadcast(seg))
      .withColumn("level", expr("(budget - lp) DIV (k - li + 1)"))
      .select($"source", $"available", $"level",
        least($"available", $"level").as("alloc"),
        ($"available" <= $"level").as("saturated"),
        expr("(budget - lp) % (k - li + 1)").as("unallocated"))
      .orderBy($"source")
  }

  /** H33 — quality-threshold retention sweep: the report a quality-
    * gate rollout runs FIRST (C15's threshold sweep for the E2 score
    * instead of near-dup Jaccard): per candidate cutoff — docs and
    * tokens kept, corpus shares, surviving languages, and the WORST
    * per-language doc retention (a cutoff that looks mild globally
    * can silently wipe a low-resource language — H31's bias audit
    * pointwise; this is the curve you pick the threshold FROM).
    *
    * Scale shape: the corpus collapses ONCE to the (4dp-quality ×
    * lang) grid (quality-domain-bounded, never corpus-sized); the
    * 7-threshold fan-out crosses the GRID, and per-language zeros are
    * restored from the langs-sized total frame so wiped-out languages
    * report share 0 instead of vanishing. All counts exact integers;
    * one division per share, 6dp.
    */
  def qualityThresholdSweep(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    val thresholds = Seq(0.66, 0.70, 0.72, 0.74, 0.76, 0.78, 0.80)
    val scored = graft.ops.TextAnalysis
      .withQualityScore(Tables.load(spark, dir, "documents"))
      .select($"lang", $"quality",
        size($"toks").cast("long").as("tk"))
    val grid = scored.groupBy($"quality", $"lang")
      .agg(count(lit(1)).as("nd"), sum($"tk").as("nt"))
    val langTot = grid.groupBy($"lang").agg(sum($"nd").as("ld"))
    val tot = grid.agg(sum($"nd").as("td"), sum($"nt").as("tt"))
    val th = thresholds.toDF("threshold")
    val keptLang = grid.crossJoin(broadcast(th))
      .filter($"quality" >= $"threshold")
      .groupBy($"threshold", $"lang")
      .agg(sum($"nd").as("kd"), sum($"nt").as("kt"))
    val perLang = langTot.crossJoin(broadcast(th))
      .join(keptLang, Seq("threshold", "lang"), "left")
      .na.fill(0L, Seq("kd", "kt"))
      .select($"threshold", $"lang", $"kd", $"kt",
        (floor($"kd".cast("double") / $"ld" * 1000000.0 + 0.5)
          / 1000000.0).as("lshare"))
    perLang.groupBy($"threshold")
      .agg(sum($"kd").as("n_docs_kept"), sum($"kt").as("n_tokens_kept"),
        sum(when($"kd" > 0, 1L).otherwise(0L)).as("n_langs_surviving"),
        min($"lshare").as("min_lang_doc_share"))
      .crossJoin(broadcast(tot))
      .select($"threshold", $"n_docs_kept", $"n_tokens_kept",
        (floor($"n_docs_kept".cast("double") / $"td" * 1000000.0 + 0.5)
          / 1000000.0).as("doc_share"),
        (floor($"n_tokens_kept".cast("double") / $"tt" * 1000000.0
          + 0.5) / 1000000.0).as("token_share"),
        $"n_langs_surviving", $"min_lang_doc_share")
      .orderBy($"threshold")
  }

  /** H34 — deterministic k-fold cross-validation plan: every doc
    * assigned a content-stable fold (48-bit md5 prefix mod k — the
    * H2 discipline widened past one hex digit so the mod-k bias is
    * 2⁻⁴⁸-negligible, no RNG state, replay-safe), reported as the
    * (fold × lang) balance audit: docs, tokens, within-fold language
    * share vs the overall mix, absolute deviation (H21's split audit
    * generalized to k symmetric folds — the check that every fold is
    * a fair miniature BEFORE anyone trains k models on it).
    *
    * Scale shape: fold assignment is a scan-side projection (no
    * shuffle); everything after is a (k × langs)-bounded rollup; the
    * lang-keyed joins broadcast label-domain frames (bounded, unlike
    * Heaps-law vocabularies).
    */
  def kfoldPlan(spark: SparkSession, dir: String, k: Int = 5)
      : DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("fold",
        conv(substring(md5($"doc_id".cast("string").cast("binary")),
          1, 12), 16, 10).cast("long") % k)
      .withColumn("tk", size(split($"text", " ")).cast("long"))
    val perFold = docs.groupBy($"fold", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"tk").as("n_tokens"))
    val foldTot = perFold.groupBy($"fold").agg(sum($"n_docs").as("nf"))
    val overall = docs.groupBy($"lang").agg(count(lit(1)).as("no"))
      .crossJoin(broadcast(
        docs.agg(count(lit(1)).cast("double").as("ntot"))))
      .select($"lang",
        (floor($"no" / $"ntot" * 1000000.0 + 0.5) / 1000000.0)
          .as("overall_share"))
    perFold.join(broadcast(foldTot), "fold")
      .join(broadcast(overall), "lang")
      .select($"fold", $"lang", $"n_docs", $"n_tokens",
        (floor($"n_docs".cast("double") / $"nf" * 1000000.0 + 0.5)
          / 1000000.0).as("share"),
        $"overall_share")
      .withColumn("abs_dev",
        (floor(abs($"share" - $"overall_share") * 1000000.0 + 0.5)
          / 1000000.0))
      .orderBy($"fold", $"lang")
  }

  /** H35 — training-order locality audit: did H7's deterministic
    * shuffle actually MIX the corpus? Per source: of the adjacent
    * (rank i−1, rank i) pairs whose right member is this source, how
    * often is the left member the SAME source, vs the exact
    * expectation under independence ((n_s−1)/(N−1)) — a locality
    * ratio ≫ 1 means source runs survived into training order (batch
    * gradients correlate; the failure mode shuffling exists to
    * prevent), ratio ≈ 1 certifies the mix. WITHOUT a global sort:
    * within-bucket adjacency is a lag window PER H7 hash bucket, and
    * the 16 bucket-boundary pairs come from per-bucket min/max
    * structs on the buckets-sized frame (hex-prefix bucket order
    * concatenates to the global (sk, doc_id) order, so
    * bucket-local + boundary pairs ARE the global adjacency set —
    * the oracle ranks globally and matches bit-exact).
    */
  def shuffleLocalityAudit(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    val keyed = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source")
      .withColumn("sk",
        md5(concat(lit("shuffle:"), $"doc_id".cast("string"))
          .cast("binary")))
      .withColumn("bkt", conv(substring($"sk", 1, 1), 16, 10)
        .cast("int"))
    val w = Window.partitionBy($"bkt").orderBy($"sk", $"doc_id")
    val within = keyed
      .withColumn("prev_src", lag($"source", 1).over(w))
      .filter($"prev_src".isNotNull)
      .select($"source", $"prev_src")
    // (sk, doc_id) is unique, so the trailing source field never
    // decides the struct min/max
    val ends = keyed.groupBy($"bkt")
      .agg(min(struct($"sk", $"doc_id", $"source")).as("f"),
        max(struct($"sk", $"doc_id", $"source")).as("l"))
    val wb = Window.orderBy($"bkt")
    val boundary = ends
      .withColumn("prev_last", lag($"l", 1).over(wb))
      .filter($"prev_last".isNotNull)
      .select($"f.source".as("source"),
        $"prev_last.source".as("prev_src"))
    val adjacent = within.unionAll(boundary)
    val adjStats = adjacent.groupBy($"source")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"source" === $"prev_src", 1L).otherwise(0L))
          .as("n_same"))
    val totals = keyed.groupBy($"source").agg(count(lit(1)).as("ns"))
      .crossJoin(broadcast(keyed.agg(count(lit(1)).as("n"))))
    totals.join(adjStats, Seq("source"), "left")
      .na.fill(0L, Seq("n_pairs", "n_same"))
      .select($"source", $"ns".as("n_docs"), $"n_pairs", $"n_same",
        when($"n_pairs" > 0,
          floor($"n_same".cast("double") / $"n_pairs" * 1000000.0
            + 0.5) / 1000000.0).as("same_share"),
        when($"n" > 1,
          floor(($"ns" - 1).cast("double") / ($"n" - 1) * 1000000.0
            + 0.5) / 1000000.0).as("expected_share"))
      .withColumn("locality_ratio",
        when($"n_pairs" > 0 && $"expected_share" > 0.0,
          floor($"same_share" / $"expected_share" * 10000.0 + 0.5)
            / 10000.0))
      .orderBy($"source")
  }

  /** H36 — curation funnel waterfall: the stage-by-stage retention
    * table every dataset paper publishes (C4/RefinedWeb style) —
    * raw → exact dedup (C1 keepers) → near-dup removal (C6 cluster
    * keepers) → quality gate (E2 ≥ 0.75), each stage reporting docs,
    * tokens, the step retention vs the previous stage, and the
    * cumulative retention vs raw. E7's composite pipeline EXECUTES
    * these stages; this is the accounting view that says where the
    * corpus actually went — the first table a curation review reads
    * and the one that catches a mis-tuned gate eating 60% of a crawl.
    *
    * Scale shape: per-doc stage flags come from C1's hash partial
    * agg, C6's (gated, duplicates-sized) drop set broadcast, and the
    * scan-side quality score; the waterfall itself is ONE conditional
    * aggregate over the flagged corpus + a 4-row stack of the result
    * — no stage re-scans the corpus.
    */
  def curationFunnel(spark: SparkSession, dir: String,
                     qualityMin: Double = 0.75): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("tk", size(split($"text", " ")).cast("long"))
    val exactKeep = docs
      .groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id").withColumn("exact_keep", lit(true))
    val nearDrop = Dedup.clusters(spark, dir)
      .filter($"doc_id" =!= $"cluster_id")
      .select($"doc_id").withColumn("near_drop", lit(true))
    val q = graft.ops.TextAnalysis.quality(spark, dir)
      .select($"doc_id", $"quality")
    val flagged = docs.select($"doc_id", $"tk")
      .join(exactKeep, Seq("doc_id"), "left")
      .join(broadcast(nearDrop), Seq("doc_id"), "left")
      .join(q, Seq("doc_id"), "left")
      .na.fill(false, Seq("exact_keep", "near_drop"))
      .withColumn("s1", $"exact_keep")
      .withColumn("s2", $"s1" && !$"near_drop")
      .withColumn("s3", $"s2" && $"quality".isNotNull &&
        $"quality" >= qualityMin)
    val m = flagged.agg(
      count(lit(1)).as("d0"), sum($"tk").as("t0"),
      sum(when($"s1", 1L).otherwise(0L)).as("d1"),
      sum(when($"s1", $"tk").otherwise(0L)).as("t1"),
      sum(when($"s2", 1L).otherwise(0L)).as("d2"),
      sum(when($"s2", $"tk").otherwise(0L)).as("t2"),
      sum(when($"s3", 1L).otherwise(0L)).as("d3"),
      sum(when($"s3", $"tk").otherwise(0L)).as("t3"))
    m.select(expr(
        """stack(4,
          |  0L, 'raw',          d0, t0, CAST(NULL AS BIGINT),
          |  1L, 'exact_dedup',  d1, t1, d0,
          |  2L, 'near_dup',     d2, t2, d1,
          |  3L, 'quality_gate', d3, t3, d2)
          |AS (stage, stage_name, n_docs, n_tokens, prev_docs)"""
          .stripMargin), $"d0")
      .select($"stage", $"stage_name", $"n_docs", $"n_tokens",
        when($"prev_docs" > 0,
          floor($"n_docs".cast("double") / $"prev_docs" * 1000000.0
            + 0.5) / 1000000.0).as("step_share"),
        when($"d0" > 0,
          floor($"n_docs".cast("double") / $"d0" * 1000000.0 + 0.5)
            / 1000000.0).as("retained_share"))
      .orderBy($"stage")
  }

  val oracles: Map[String, String] = Map(
    "curation_funnel" -> (Dedup.shingleCte
      .replace("WITH toks", "WITH RECURSIVE toks")
      .stripSuffix("\n") + Dedup.candCte(8000) + ",\n" +
      """pairs AS (
        |  SELECT c.da AS doc_a, c.db AS doc_b
        |  FROM cand c JOIN sh a ON a.doc_id = c.da
        |  JOIN sh b ON b.doc_id = c.db
        |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
        |      / len(list_distinct(a.s || b.s)) >= 0.8),
        |edges AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(doc_id, lab) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM edges
        |  UNION
        |  SELECT e.doc_a, r.lab FROM reach r
        |  JOIN edges e ON e.doc_b = r.doc_id),
        |comp AS (
        |  SELECT doc_id, min(lab) AS cluster_id
        |  FROM reach GROUP BY doc_id),
        |ndrop AS (SELECT doc_id FROM comp WHERE doc_id <> cluster_id),
        |ek AS (
        |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |qual AS (
        |  SELECT doc_id,
        |    floor(((least(length(text)::DOUBLE / 500.0, 1.0))
        |      + (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
        |        / length(text)::DOUBLE)
        |      + (1.0 - len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in','is','on','for','with')))::DOUBLE
        |        / len(string_split(text, ' '))::DOUBLE)
        |      + len(list_distinct(string_split(text, ' ')))::DOUBLE
        |        / len(string_split(text, ' '))::DOUBLE)
        |      / 4.0 * 10000.0 + 0.5) / 10000.0 AS quality
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |fl AS (
        |  SELECT d.doc_id, len(string_split(d.text, ' '))::BIGINT AS tk,
        |    ek.doc_id IS NOT NULL AS s1,
        |    ek.doc_id IS NOT NULL AND nd.doc_id IS NULL AS s2,
        |    ek.doc_id IS NOT NULL AND nd.doc_id IS NULL
        |      AND q.quality IS NOT NULL AND q.quality >= 0.75 AS s3
        |  FROM documents d
        |  LEFT JOIN ek ON ek.doc_id = d.doc_id
        |  LEFT JOIN ndrop nd ON nd.doc_id = d.doc_id
        |  LEFT JOIN qual q ON q.doc_id = d.doc_id),
        |m AS (
        |  SELECT count(*)::BIGINT AS d0, sum(tk)::BIGINT AS t0,
        |    sum(CASE WHEN s1 THEN 1 ELSE 0 END)::BIGINT AS d1,
        |    sum(CASE WHEN s1 THEN tk ELSE 0 END)::BIGINT AS t1,
        |    sum(CASE WHEN s2 THEN 1 ELSE 0 END)::BIGINT AS d2,
        |    sum(CASE WHEN s2 THEN tk ELSE 0 END)::BIGINT AS t2,
        |    sum(CASE WHEN s3 THEN 1 ELSE 0 END)::BIGINT AS d3,
        |    sum(CASE WHEN s3 THEN tk ELSE 0 END)::BIGINT AS t3
        |  FROM fl),
        |st AS (
        |  SELECT 0::BIGINT AS stage, 'raw' AS stage_name,
        |    d0 AS n_docs, t0 AS n_tokens,
        |    CAST(NULL AS BIGINT) AS prev_docs, d0 FROM m
        |  UNION ALL SELECT 1, 'exact_dedup', d1, t1, d0, d0 FROM m
        |  UNION ALL SELECT 2, 'near_dup', d2, t2, d1, d0 FROM m
        |  UNION ALL SELECT 3, 'quality_gate', d3, t3, d2, d0 FROM m)
        |SELECT stage, stage_name, n_docs, n_tokens,
        |  CASE WHEN prev_docs > 0 THEN
        |    floor(n_docs::DOUBLE / prev_docs * 1000000.0 + 0.5)
        |      / 1000000.0 END AS step_share,
        |  CASE WHEN d0 > 0 THEN
        |    floor(n_docs::DOUBLE / d0 * 1000000.0 + 0.5)
        |      / 1000000.0 END AS retained_share
        |FROM st ORDER BY stage""".stripMargin),
    "shuffle_locality_audit" ->
      """WITH k AS (
        |  SELECT doc_id, source,
        |    md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents),
        |ordered AS (
        |  SELECT source,
        |    lag(source) OVER (ORDER BY sk, doc_id) AS prev_src
        |  FROM k),
        |adj AS (
        |  SELECT source, count(*)::BIGINT AS n_pairs,
        |    sum(CASE WHEN source = prev_src THEN 1 ELSE 0 END)::BIGINT
        |      AS n_same
        |  FROM ordered WHERE prev_src IS NOT NULL GROUP BY source),
        |tot AS (
        |  SELECT source, count(*)::BIGINT AS ns FROM k GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n FROM k),
        |j AS (
        |  SELECT t.source, t.ns AS n_docs,
        |    coalesce(a.n_pairs, 0)::BIGINT AS n_pairs,
        |    coalesce(a.n_same, 0)::BIGINT AS n_same,
        |    CASE WHEN coalesce(a.n_pairs, 0) > 0 THEN
        |      floor(coalesce(a.n_same, 0)::DOUBLE
        |        / coalesce(a.n_pairs, 0) * 1000000.0 + 0.5)
        |        / 1000000.0 END AS same_share,
        |    CASE WHEN nn.n > 1 THEN
        |      floor((t.ns - 1)::DOUBLE / (nn.n - 1) * 1000000.0 + 0.5)
        |        / 1000000.0 END AS expected_share
        |  FROM tot t LEFT JOIN adj a ON a.source = t.source, nn)
        |SELECT source, n_docs, n_pairs, n_same, same_share,
        |  expected_share,
        |  CASE WHEN n_pairs > 0 AND expected_share > 0.0 THEN
        |    floor(same_share / expected_share * 10000.0 + 0.5)
        |      / 10000.0 END AS locality_ratio
        |FROM j ORDER BY source""".stripMargin,
    "quality_threshold_sweep" ->
      """WITH t AS (
        |  SELECT lang, string_split(text, ' ') AS toks, text
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |m AS (
        |  SELECT lang, len(toks)::BIGINT AS tk,
        |    floor(((least(length(text)::DOUBLE / 500.0, 1.0))
        |      + (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
        |        / length(text)::DOUBLE)
        |      + (1.0 - len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on','for','with')))::DOUBLE
        |        / len(toks)::DOUBLE)
        |      + len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
        |      / 4.0 * 10000.0 + 0.5) / 10000.0 AS quality
        |  FROM t),
        |grid AS (
        |  SELECT quality, lang, count(*)::BIGINT AS nd,
        |    sum(tk)::BIGINT AS nt
        |  FROM m GROUP BY 1, 2),
        |lt AS (SELECT lang, sum(nd)::BIGINT AS ld FROM grid GROUP BY 1),
        |tot AS (
        |  SELECT sum(nd)::BIGINT AS td, sum(nt)::BIGINT AS tt
        |  FROM grid),
        |th AS (SELECT unnest([0.66, 0.70, 0.72, 0.74, 0.76, 0.78,
        |  0.80])::DOUBLE AS threshold),
        |kl AS (
        |  SELECT threshold, lang, sum(nd)::BIGINT AS kd,
        |    sum(nt)::BIGINT AS kt
        |  FROM grid, th WHERE quality >= threshold GROUP BY 1, 2),
        |pl AS (
        |  SELECT th.threshold, lt.lang,
        |    coalesce(kl.kd, 0)::BIGINT AS kd,
        |    coalesce(kl.kt, 0)::BIGINT AS kt,
        |    floor(coalesce(kl.kd, 0)::DOUBLE / lt.ld
        |      * 1000000.0 + 0.5) / 1000000.0 AS lshare
        |  FROM lt CROSS JOIN th
        |  LEFT JOIN kl ON kl.threshold = th.threshold
        |    AND kl.lang = lt.lang)
        |SELECT threshold, sum(kd)::BIGINT AS n_docs_kept,
        |  sum(kt)::BIGINT AS n_tokens_kept,
        |  floor(sum(kd)::DOUBLE / any_value(td) * 1000000.0 + 0.5)
        |    / 1000000.0 AS doc_share,
        |  floor(sum(kt)::DOUBLE / any_value(tt) * 1000000.0 + 0.5)
        |    / 1000000.0 AS token_share,
        |  sum(CASE WHEN kd > 0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_langs_surviving,
        |  min(lshare) AS min_lang_doc_share
        |FROM pl, tot GROUP BY threshold ORDER BY threshold""".stripMargin,
    "kfold_plan" ->
      """WITH d AS (
        |  SELECT lang,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))
        |      ::BIGINT % 5 AS fold,
        |    len(string_split(text, ' '))::BIGINT AS tk
        |  FROM documents),
        |pf AS (
        |  SELECT fold, lang, count(*)::BIGINT AS n_docs,
        |    sum(tk)::BIGINT AS n_tokens
        |  FROM d GROUP BY 1, 2),
        |ft AS (SELECT fold, sum(n_docs)::BIGINT AS nf FROM pf GROUP BY 1),
        |ov AS (
        |  SELECT lang,
        |    floor(count(*)::DOUBLE /
        |      (SELECT count(*)::DOUBLE FROM d) * 1000000.0 + 0.5)
        |      / 1000000.0 AS overall_share
        |  FROM d GROUP BY lang)
        |SELECT pf.fold, pf.lang, pf.n_docs, pf.n_tokens,
        |  floor(pf.n_docs::DOUBLE / ft.nf * 1000000.0 + 0.5)
        |    / 1000000.0 AS share,
        |  ov.overall_share,
        |  floor(abs(floor(pf.n_docs::DOUBLE / ft.nf * 1000000.0 + 0.5)
        |    / 1000000.0 - ov.overall_share) * 1000000.0 + 0.5)
        |    / 1000000.0 AS abs_dev
        |FROM pf JOIN ft USING (fold) JOIN ov USING (lang)
        |ORDER BY fold, lang""".stripMargin,
    "budget_waterfill" ->
      """WITH a AS (
        |  SELECT source,
        |    sum(len(list_filter(string_split(text, ' '), t -> t <> '')))
        |      ::BIGINT AS available
        |  FROM documents GROUP BY source),
        |t AS (SELECT sum(available)::BIGINT AS total, count(*) AS k
        |      FROM a),
        |r AS (
        |  SELECT a.source, a.available, t.k, t.total // 2 AS budget,
        |    row_number() OVER (ORDER BY a.available, a.source) AS i,
        |    coalesce(sum(a.available) OVER (
        |      ORDER BY a.available, a.source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0)::BIGINT AS pprev
        |  FROM a, t),
        |f AS (
        |  SELECT i AS li, pprev AS lp FROM r
        |  WHERE pprev + available * (k - i + 1) >= budget
        |  ORDER BY i LIMIT 1)
        |SELECT r.source, r.available,
        |  (r.budget - f.lp) // (r.k - f.li + 1) AS level,
        |  least(r.available,
        |    (r.budget - f.lp) // (r.k - f.li + 1)) AS alloc,
        |  r.available <= (r.budget - f.lp) // (r.k - f.li + 1)
        |    AS saturated,
        |  (r.budget - f.lp) % (r.k - f.li + 1) AS unallocated
        |FROM r, f ORDER BY r.source""".stripMargin,
    "selection_bias_audit" ->
      ("""WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT doc_id, w, count(*) AS c FROM w WHERE w <> ''
        |  GROUP BY doc_id, w),
        |stats AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |    CAST(sum(length(w) * c) AS BIGINT) AS sum_len,
        |    count(*) AS n_distinct, max(c) AS top_c,
        |    count(*) FILTER (w IN ('""" +
        TextAnalysis.Stopwords.mkString("', '") +
      """')) AS n_stop_types
        |  FROM wc GROUP BY doc_id),
        |r AS (
        |  SELECT doc_id, n_words, n_stop_types,
        |    floor(sum_len::DOUBLE / n_words * 10000.0 + 0.5) / 10000.0
        |      AS mean_word_len,
        |    floor(top_c::DOUBLE / n_words * 1000000.0 + 0.5) / 1000000.0
        |      AS top_word_frac
        |  FROM stats),
        |k AS (
        |  SELECT doc_id,
        |    CASE WHEN n_words BETWEEN 50 AND 100000
        |      AND mean_word_len BETWEEN 3.0 AND 10.0
        |      AND n_stop_types >= 2 AND top_word_frac <= 0.1
        |      THEN 1 ELSE 0 END::BIGINT AS keep
        |  FROM r),
        |g AS (
        |  SELECT d.lang,
        |    CAST(sum(k.keep) AS BIGINT) AS n_keep,
        |    CAST(sum(1 - k.keep) AS BIGINT) AS n_drop,
        |    sum((k.keep * d.n_chars)::HUGEINT) AS slk,
        |    sum(((1 - k.keep) * d.n_chars)::HUGEINT) AS sld,
        |    sum((k.keep * d.n_chars)::HUGEINT * d.n_chars) AS sl2k,
        |    sum(((1 - k.keep) * d.n_chars)::HUGEINT * d.n_chars)
        |      AS sl2d
        |  FROM documents d JOIN k USING (doc_id)
        |  GROUP BY d.lang),
        |m AS (
        |  SELECT lang, n_keep, n_drop,
        |    slk::DOUBLE / n_keep AS muk, sld::DOUBLE / n_drop AS mud,
        |    sl2k::DOUBLE / n_keep
        |      - (slk::DOUBLE / n_keep) * (slk::DOUBLE / n_keep) AS vk,
        |    sl2d::DOUBLE / n_drop
        |      - (sld::DOUBLE / n_drop) * (sld::DOUBLE / n_drop) AS vd
        |  FROM g)
        |SELECT lang, n_keep, n_drop,
        |  CASE WHEN n_keep > 0 THEN
        |    floor(muk * 100.0 + 0.5) / 100.0 END AS mean_len_keep,
        |  CASE WHEN n_drop > 0 THEN
        |    floor(mud * 100.0 + 0.5) / 100.0 END AS mean_len_drop,
        |  CASE WHEN n_keep > 0 AND n_drop > 0 AND vk + vd > 0.0 THEN
        |    floor((muk - mud) / sqrt((vk + vd) / 2.0) * 10000.0 + 0.5)
        |      / 10000.0 END AS smd
        |FROM m ORDER BY lang""").stripMargin,
    "split_quality_ks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks, text
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |m AS (
        |  SELECT doc_id,
        |    least(length(text)::DOUBLE / 500.0, 1.0) AS len_score,
        |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
        |      / length(text)::DOUBLE AS punct_ratio,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on','for','with')))::DOUBLE
        |      / len(toks)::DOUBLE AS stop_ratio,
        |    len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE AS uniq_ratio
        |  FROM t),
        |q AS (
        |  SELECT doc_id,
        |    floor((len_score + (1.0 - punct_ratio) + (1.0 - stop_ratio)
        |      + uniq_ratio) / 4.0 * 10000.0 + 0.5) / 10000.0 AS quality
        |  FROM m),
        |s AS (
        |  SELECT quality,
        |    CASE WHEN strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 12
        |      THEN 'train'
        |    WHEN strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 14
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM q),
        |f AS (SELECT * FROM s WHERE split IN ('train', 'test')),
        |steps AS (
        |  SELECT quality AS x,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ia,
        |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ib
        |  FROM f GROUP BY quality),
        |ns AS (
        |  SELECT CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_train,
        |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_test
        |  FROM f),
        |cdf AS (
        |  SELECT CAST(sum(ia) OVER (ORDER BY x
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
        |    CAST(sum(ib) OVER (ORDER BY x
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
        |  FROM steps),
        |g AS (
        |  SELECT ns.n_train, ns.n_test,
        |    max(abs(ca::DOUBLE / ns.n_train - cb::DOUBLE / ns.n_test))
        |      AS d
        |  FROM cdf, ns
        |  WHERE ns.n_train > 0 AND ns.n_test > 0
        |  GROUP BY ns.n_train, ns.n_test),
        |c AS (
        |  SELECT *, 1.358 * sqrt((n_train + n_test)::DOUBLE
        |    / (n_train * n_test)) AS crit FROM g)
        |SELECT n_train, n_test,
        |  floor(d * 1000000.0 + 0.5) / 1000000.0 AS ks_stat,
        |  floor(crit * 1000000.0 + 0.5) / 1000000.0 AS crit_05,
        |  d > crit AS reject_05
        |FROM c""".stripMargin,
    "quality_curriculum" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks, text
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |m AS (
        |  SELECT doc_id, len(toks)::BIGINT AS tk,
        |    floor(((least(length(text)::DOUBLE / 500.0, 1.0))
        |      + (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
        |        / length(text)::DOUBLE)
        |      + (1.0 - len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on','for','with')))::DOUBLE
        |        / len(toks)::DOUBLE)
        |      + len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
        |      / 4.0 * 10000.0 + 0.5) / 10000.0 AS quality
        |  FROM t),
        |b AS (
        |  SELECT list_transform(
        |    quantile_cont(quality, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |    x -> floor(x * 10000.0 + 0.5) / 10000.0) AS bs
        |  FROM m),
        |d AS (
        |  SELECT 1 + len(list_filter(b.bs, x -> m.quality > x))::BIGINT
        |      AS decile,
        |    m.tk
        |  FROM m, b),
        |pd AS (
        |  SELECT decile, count(*)::BIGINT AS n_docs,
        |    sum(tk)::BIGINT AS n_tokens
        |  FROM d GROUP BY decile),
        |ep AS (SELECT * FROM (VALUES (1, 1), (2, 3), (3, 5), (4, 8))
        |  AS v(epoch, min_decile)),
        |plan AS (
        |  SELECT ep.epoch::BIGINT AS epoch, pd.decile, pd.n_docs,
        |    pd.n_tokens
        |  FROM pd CROSS JOIN ep WHERE pd.decile >= ep.min_decile),
        |tot AS (
        |  SELECT epoch, sum(n_tokens)::BIGINT AS epoch_tokens
        |  FROM plan GROUP BY epoch)
        |SELECT plan.epoch, plan.decile, plan.n_docs, plan.n_tokens,
        |  floor(plan.n_tokens::DOUBLE / tot.epoch_tokens
        |    * 1000000.0 + 0.5) / 1000000.0 AS token_share
        |FROM plan JOIN tot USING (epoch)
        |ORDER BY epoch, decile""".stripMargin,
    "export_shard_plan" ->
      // fingerprint wraps mod 2^64 into two's complement like H20
      """WITH k AS (
        |  SELECT doc_id,
        |    md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY sk, doc_id) AS BIGINT)
        |      AS rank
        |  FROM k),
        |s AS (
        |  SELECT doc_id, rank, (rank - 1) // 100 AS shard_id,
        |    ('0x' || substring(md5('m:' || CAST(doc_id AS VARCHAR)),
        |      1, 12))::BIGINT AS h
        |  FROM r),
        |g AS (
        |  SELECT shard_id, count(*)::BIGINT AS n_docs,
        |    min(rank) AS first_rank, max(rank) AS last_rank,
        |    sum(h) % 18446744073709551616 AS m
        |  FROM s GROUP BY shard_id)
        |SELECT shard_id, n_docs, first_rank, last_rank,
        |  CAST(CASE WHEN m >= 9223372036854775808
        |    THEN m - 18446744073709551616 ELSE m END AS BIGINT)
        |    AS fingerprint
        |FROM g ORDER BY shard_id""".stripMargin,
    "source_quality_cap" ->
      """WITH t AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |m AS (
        |  SELECT doc_id, source,
        |    least(length(text)::DOUBLE / 500.0, 1.0) AS len_score,
        |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
        |      / length(text)::DOUBLE AS punct_ratio,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on','for','with')))::DOUBLE
        |      / len(toks)::DOUBLE AS stop_ratio,
        |    len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE AS uniq_ratio
        |  FROM t),
        |q AS (
        |  SELECT doc_id, source,
        |    floor((len_score + (1.0 - punct_ratio) + (1.0 - stop_ratio)
        |      + uniq_ratio) / 4.0 * 10000.0 + 0.5) / 10000.0 AS quality
        |  FROM m),
        |tot AS (SELECT source, count(*) AS n_source_docs FROM q
        |        GROUP BY source),
        |r AS (
        |  SELECT source, doc_id, quality,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rnk
        |  FROM q)
        |SELECT r.source, r.rnk, r.doc_id, r.quality, tot.n_source_docs
        |FROM r JOIN tot USING (source)
        |WHERE r.rnk <= 15
        |ORDER BY r.source, r.rnk""".stripMargin,
    "split_balance" ->
      """WITH d AS (
        |  SELECT lang,
        |    CASE WHEN strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 12
        |      THEN 'train'
        |    WHEN strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 14
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents),
        |ps AS (SELECT split, lang, count(*) AS n FROM d GROUP BY 1, 2),
        |st AS (SELECT split, CAST(sum(n) AS BIGINT) AS ns FROM ps
        |       GROUP BY split),
        |ov AS (
        |  SELECT lang,
        |    floor(count(*) / (SELECT count(*)::DOUBLE FROM d)
        |      * 1000000.0 + 0.5) / 1000000.0 AS overall_share
        |  FROM d GROUP BY lang),
        |j AS (
        |  SELECT ps.split, ps.lang, ps.n,
        |    floor(ps.n::DOUBLE / st.ns * 1000000.0 + 0.5) / 1000000.0
        |      AS share,
        |    ov.overall_share
        |  FROM ps JOIN st ON st.split = ps.split
        |  JOIN ov ON ov.lang = ps.lang)
        |SELECT split, lang, n, share, overall_share,
        |  floor(abs(share - overall_share) * 1000000.0 + 0.5)
        |    / 1000000.0 AS abs_dev
        |FROM j ORDER BY split, lang""".stripMargin,
    "corpus_manifest" ->
      // sum(h) accumulates in HUGEINT; Spark's Long sum wraps mod 2^64
      // (two's complement), so the oracle reduces the HUGEINT sum the
      // same way EXPLICITLY — a bare CAST(... AS BIGINT) would raise
      // out-of-range (not wrap) once the sum of 48-bit hashes passes
      // 2^63, i.e. at ~3×10^4 docs per source
      """WITH h AS (
        |  SELECT source, doc_id,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || text),
        |      1, 12))::BIGINT AS h
        |  FROM documents),
        |s AS (
        |  SELECT source, count(*) AS n_docs,
        |    sum(h) % 18446744073709551616 AS m,
        |    min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |  FROM h GROUP BY source)
        |SELECT source, n_docs,
        |  CAST(CASE WHEN m >= 9223372036854775808
        |    THEN m - 18446744073709551616 ELSE m END AS BIGINT)
        |    AS content_sum,
        |  min_doc, max_doc
        |FROM s ORDER BY source""".stripMargin,
    "quality_score_normalize" -> {
      val qlist = (1 to 19).map(_ / 20.0).mkString(", ")
      s"""WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |m AS (
        |  SELECT doc_id,
        |    least(length(text)::DOUBLE / 500.0, 1.0) AS len_score,
        |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE
        |      / length(text)::DOUBLE AS punct_ratio,
        |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','on','for','with')))::DOUBLE
        |      / len(toks)::DOUBLE AS stop_ratio,
        |    len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE AS uniq_ratio
        |  FROM t),
        |q AS (
        |  SELECT doc_id,
        |    floor((len_score + (1.0 - punct_ratio) + (1.0 - stop_ratio)
        |      + uniq_ratio) / 4.0 * 10000.0 + 0.5) / 10000.0 AS quality
        |  FROM m),
        |s AS (
        |  SELECT q.doc_id, d.source, q.quality
        |  FROM q JOIN documents d USING (doc_id)),
        |b AS (
        |  SELECT source,
        |    list_transform(quantile_cont(quality, [$qlist]),
        |      x -> floor(x * 10000.0 + 0.5) / 10000.0) AS bs
        |  FROM s GROUP BY source)
        |SELECT s.doc_id, s.source, s.quality,
        |  (len(list_filter(b.bs, x -> s.quality > x)) + 1)::BIGINT
        |    AS ventile,
        |  (len(list_filter(b.bs, x -> s.quality > x)) + 1) > 10 AS keep
        |FROM s JOIN b USING (source)
        |ORDER BY doc_id""".stripMargin
    },
    "sample_consistent" ->
      """WITH h AS (
        |  SELECT lang, source, doc_id,
        |    ('0x' || substring(md5('csample:' || CAST(doc_id AS VARCHAR)),
        |      1, 12))::BIGINT AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, source, doc_id, h,
        |    row_number() OVER (PARTITION BY lang, source
        |      ORDER BY h, doc_id) AS rnk
        |  FROM h)
        |SELECT lang, source, rnk, doc_id, h FROM r WHERE rnk <= 20
        |ORDER BY lang, source, rnk""".stripMargin,
    "sample_weighted" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substring(md5('wsample:' || CAST(doc_id AS VARCHAR)),
        |      1, 12))::BIGINT // greatest(n_chars, 1) AS priority
        |  FROM documents)
        |SELECT doc_id, n_chars, priority FROM h
        |ORDER BY priority, doc_id LIMIT 200""".stripMargin,
    "dataset_card" ->
      """WITH d AS (
        |  SELECT source, lang, n_chars,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS BIGINT) AS n_tok,
        |    md5(text) AS th
        |  FROM documents),
        |s AS (
        |  SELECT source, count(*) AS n_docs,
        |    count(DISTINCT lang) AS n_langs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |    count(DISTINCT th) AS n_uniq
        |  FROM d GROUP BY source)
        |SELECT source, n_docs, n_langs, total_chars, total_tokens,
        |  floor(n_docs::DOUBLE / (sum(n_docs) OVER ()) * 1000000.0 + 0.5)
        |    / 1000000.0 AS pct_docs,
        |  floor((1.0 - n_uniq::DOUBLE / n_docs) * 1000000.0 + 0.5)
        |    / 1000000.0 AS dup_rate
        |FROM s ORDER BY source""".stripMargin,
    "split_leakage" -> (Dedup.shingleCte.stripSuffix("\n") +
      Dedup.candCte(8000) +
      s""",
        |sp AS (SELECT doc_id, $splitCaseSql AS split FROM documents),
        |pairs AS (
        |  SELECT c.da AS doc_a, c.db AS doc_b,
        |    floor(len(list_intersect(a.s, b.s))::DOUBLE
        |      / len(list_distinct(a.s || b.s)) * 10000.0 + 0.5)
        |      / 10000.0 AS jaccard
        |  FROM cand c JOIN sh a ON a.doc_id = c.da
        |  JOIN sh b ON b.doc_id = c.db
        |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
        |      / len(list_distinct(a.s || b.s)) >= 0.8)
        |SELECT p.doc_a, sa.split AS split_a, p.doc_b, sb.split AS split_b,
        |  p.jaccard
        |FROM pairs p
        |JOIN sp sa ON sa.doc_id = p.doc_a
        |JOIN sp sb ON sb.doc_id = p.doc_b
        |WHERE sa.split <> sb.split
        |ORDER BY doc_a, doc_b""".stripMargin),
    "importance_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |b AS (
        |  SELECT doc_id, lang,
        |    ((strpos('0123456789abcdef',
        |        substring(md5(array_to_string(t[i:i+1], ' ')), 1, 1)) - 1)
        |      * 16
        |      + strpos('0123456789abcdef',
        |        substring(md5(array_to_string(t[i:i+1], ' ')), 2, 1)) - 1
        |      )::BIGINT AS bk
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) u),
        |raw AS (SELECT bk, count(*) AS cr FROM b GROUP BY bk),
        |tgt AS (
        |  SELECT bk, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY bk),
        |trc AS (SELECT sum(cr) AS tr FROM raw),
        |ttc AS (SELECT coalesce(sum(ct), 0) AS tt FROM tgt),
        |ratio AS (
        |  SELECT raw.bk,
        |    CAST(floor(ln(((coalesce(ct, 0) + 1)::DOUBLE / (tt + 256))
        |      / ((cr + 1)::DOUBLE / (tr + 256))) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS lru
        |  FROM raw LEFT JOIN tgt ON tgt.bk = raw.bk, trc, ttc)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  floor(sum(lru)::DOUBLE / 1000000000.0 / count(*)
        |    * 1000000.0 + 0.5) / 1000000.0 AS weight
        |FROM b JOIN ratio ON ratio.bk = b.bk
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "curriculum_order" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |t AS (SELECT * FROM tok WHERE token <> ''),
        |tf AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tf),
        |lp AS (
        |  SELECT token, CAST(floor(ln(cnt::DOUBLE / total::DOUBLE)
        |    * 1000000000.0 + 0.5) AS BIGINT) AS lpu
        |  FROM tf CROSS JOIN tot),
        |s AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |    floor(-(sum(lpu)::DOUBLE / 1000000000.0 / count(*))
        |      * 1000000.0 + 0.5) / 1000000.0 AS avg_surprisal
        |  FROM t JOIN lp USING (token) GROUP BY doc_id)
        |SELECT doc_id, n_tok, avg_surprisal,
        |  row_number() OVER (ORDER BY avg_surprisal, doc_id) AS curriculum_rank,
        |  CAST(sum(n_tok) OVER (ORDER BY avg_surprisal, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        |FROM s ORDER BY curriculum_rank""".stripMargin,
    "corpus_budget_select" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |s AS (
        |  SELECT doc_id, len(tk)::BIGINT AS n_tok,
        |    floor(len(list_distinct(tk))::DOUBLE / len(tk)
        |      * 1000000.0 + 0.5) / 1000000.0 AS uniq_ratio
        |  FROM t),
        |o AS (
        |  SELECT *, CAST(sum(n_tok) OVER (
        |    ORDER BY uniq_ratio DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM s)
        |SELECT doc_id, n_tok, uniq_ratio, cum FROM o
        |WHERE cum <= (SELECT 0.10 * sum(n_tok) FROM s)
        |ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |r AS (
        |  SELECT lang,
        |    (min(n_docs) OVER ())::DOUBLE / n_docs AS rate FROM c),
        |b AS (
        |  SELECT doc_id, lang,
        |    ((strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |      + strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)::BIGINT
        |      AS bucket
        |  FROM documents)
        |SELECT b.doc_id, b.lang, b.bucket
        |FROM b JOIN r USING (lang)
        |WHERE b.bucket::DOUBLE / 256.0 < r.rate
        |ORDER BY doc_id""".stripMargin,
    "global_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents)
        |SELECT doc_id, sk,
        |  row_number() OVER (ORDER BY sk, doc_id) AS rank
        |FROM k ORDER BY rank""".stripMargin,
    "dataset_split_grouped" ->
      """WITH d AS (
        |  SELECT doc_id, md5(text) AS th FROM documents),
        |g AS (
        |  SELECT th, min(doc_id) AS group_id,
        |    count(*)::BIGINT AS n_group_members
        |  FROM d GROUP BY th),
        |j AS (
        |  SELECT d.doc_id, g.group_id, g.n_group_members,
        |    CAST(strpos('0123456789abcdef',
        |      substring(md5('gsplit:' || d.th), 32, 1)) - 1 AS BIGINT)
        |      AS bucket
        |  FROM d JOIN g ON g.th = d.th)
        |SELECT doc_id, group_id, n_group_members, bucket,
        |  CASE WHEN bucket < 12 THEN 'train'
        |    WHEN bucket < 14 THEN 'val' ELSE 'test' END AS split
        |FROM j ORDER BY doc_id""".stripMargin,
    "dataset_split" ->
      """SELECT doc_id,
        |  strpos('0123456789abcdef',
        |    substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 AS bucket,
        |  CASE WHEN strpos('0123456789abcdef',
        |      substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 12
        |    THEN 'train'
        |  WHEN strpos('0123456789abcdef',
        |      substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 14
        |    THEN 'val'
        |  ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "split_ngram_overlap" ->
      """WITH d AS (
        |  SELECT lang, string_split(text, ' ') AS toks,
        |    CASE WHEN strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 12
        |      THEN 'train'
        |    WHEN strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 14
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |g AS (
        |  SELECT DISTINCT lang, split,
        |    unnest([array_to_string(toks[i:i+7], ' ')
        |      for i in range(1, len(toks) - 6)]) AS g
        |  FROM d),
        |tr AS (
        |  SELECT DISTINCT lang, g FROM g WHERE split = 'train'),
        |te AS (SELECT lang, g FROM g WHERE split = 'test')
        |SELECT te.lang, count(*) AS n_test_grams,
        |  CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  floor(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0
        |    END)::DOUBLE / count(*) * 1000000.0 + 0.5) / 1000000.0
        |    AS coverage
        |FROM te LEFT JOIN tr ON tr.lang = te.lang AND tr.g = te.g
        |GROUP BY te.lang ORDER BY te.lang""".stripMargin,
    "pack_efficiency" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (
        |    PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t),
        |pk AS (
        |  SELECT lang, CAST((cum - n_tokens) // 512 AS BIGINT)
        |    AS pack_id, CAST(sum(n_tokens) AS BIGINT) AS tok
        |  FROM c GROUP BY 1, 2)
        |SELECT lang, count(*) AS n_packs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  floor(avg(tok::DOUBLE / 512) * 10000.0 + 0.5) / 10000.0
        |    AS mean_fill,
        |  floor(sum(CASE WHEN tok < 512 THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*) * 10000.0 + 0.5) / 10000.0 AS underfill_share
        |FROM pk GROUP BY lang ORDER BY lang""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (
        |    PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "contamination_check" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, list_distinct([array_to_string(t[i:i+7], ' ')
        |    for i in range(1, len(t) - 6)]) AS grams
        |  FROM toks WHERE len(t) >= 8),
        |bench AS (
        |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 50),
        |corpus AS (
        |  SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 50)
        |SELECT c.doc_id, count(*) AS n_shared
        |FROM corpus c JOIN bench b USING (gram)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "lang_mix_weights" ->
      """SELECT lang, count(*) AS n_docs,
        |  floor((SELECT count(*) FROM documents)::DOUBLE /
        |    ((SELECT count(DISTINCT lang) FROM documents) * count(*))
        |    * 1000000.0 + 0.5) / 1000000.0 AS mix_weight
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "lang_epoch_plan" ->
      """WITH c AS (
        |  SELECT lang,
        |    sum(len(list_filter(string_split(text, ' '), t -> t <> '')))
        |      ::BIGINT AS n_tokens
        |  FROM documents GROUP BY lang),
        |t AS (
        |  SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |      coalesce(list(pow(n_tokens, 0.3) ORDER BY lang), [])),
        |      (a, x) -> a + x) AS z,
        |    sum(n_tokens)::DOUBLE AS b FROM c),
        |p AS (
        |  SELECT lang, n_tokens,
        |    pow(n_tokens, 0.3) / z * b / n_tokens AS raw,
        |    least(pow(n_tokens, 0.3) / z * b / n_tokens, 4.0) AS e
        |  FROM c, t)
        |SELECT lang, n_tokens,
        |  floor(e * 1000000.0 + 0.5) / 1000000.0 AS epochs,
        |  floor(e * n_tokens)::BIGINT AS eff_tokens,
        |  floor((raw - e) * n_tokens)::BIGINT AS freed_tokens
        |FROM p ORDER BY lang""".stripMargin,
    "dedup_temperature_mix" -> {
      s"""WITH k AS (
         |  SELECT lang, n_kept
         |  FROM (${Dedup.oracles("dedup_lang_retention")}) t),
         |z AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
         |    coalesce(list(pow(n_kept, 0.3) ORDER BY lang), [])),
         |    (a, x) -> a + x) AS z, sum(n_kept) AS n FROM k)
         |SELECT lang, n_kept,
         |  floor(pow(n_kept, 0.3) / z * 1000000.0 + 0.5) / 1000000.0
         |    AS p_sample,
         |  floor(pow(n_kept, 0.3) / z * n / n_kept * 1000000.0 + 0.5)
         |    / 1000000.0 AS up_factor
         |FROM k, z ORDER BY lang""".stripMargin
    },
    "lang_temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |t AS (
        |  SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |      coalesce(list(pow(n_docs, 0.3) ORDER BY lang), [])),
        |      (a, x) -> a + x) AS z, sum(n_docs) AS n FROM c)
        |SELECT lang, n_docs,
        |  floor(pow(n_docs, 0.3) / z * 1000000.0 + 0.5) / 1000000.0
        |    AS p_sample,
        |  floor(pow(n_docs, 0.3) / z * n / n_docs * 1000000.0 + 0.5)
        |    / 1000000.0 AS up_factor
        |FROM c, t ORDER BY lang""".stripMargin)
}
