package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over `documents`. Everything is codegen'd
  * `functions._` arithmetic — no UDFs — so the whole stage fuses into
  * one pass over the scan at any scale.
  */
object TextAnalysis {

  private[graft] val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is",
    "on", "for", "with")

  /** Per-language discriminator word lists for the heuristic
    * language-ID (argmax of profile hits; ties break in declared
    * order). Kept tiny — the operator shape (profile score + argmax)
    * is what scales, not the list.
    */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(t === _).reduce(_ || _)))

  /** Engine-portable 4-dp rounding: floor(x·10⁴ + 0.5)/10⁴ — the same
    * IEEE ops on both engines, unlike round() whose half-way handling
    * differs between Spark (BigDecimal HALF_UP on the decimal string)
    * and DuckDB (double arithmetic).
    */
  private def roundP(c: Column): Column =
    floor(c * 10000.0 + 0.5).cast("double") / 10000.0

  /** E1 — token + char counting. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        length($"text").cast("long").as("n_chars_actual"))
      .orderBy($"doc_id")
  }

  /** Appends E2's component columns (len_score/punct_ratio/stop_ratio/
    * uniq_ratio, unrounded) + the rounded `quality` blend to any frame
    * with a `text` column. Pure scan-side projections — shared by the
    * batch operator, H24's cap, and the G23 streaming cap (streaming-
    * safe by construction: no shuffle, no window).
    */
  private[graft] def withQualityScore(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.withColumn("toks", split($"text", " "))
      .filter(size($"toks") > 0)
      .withColumn("len_score",
        least(length($"text").cast("double") / 500.0, lit(1.0)))
      .withColumn("punct_ratio",
        length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("double") /
          length($"text").cast("double"))
      .withColumn("stop_ratio",
        countIn($"toks", Stopwords).cast("double") /
          size($"toks").cast("double"))
      .withColumn("uniq_ratio",
        size(array_distinct($"toks")).cast("double") /
          size($"toks").cast("double"))
      .withColumn("quality", roundP(
        ($"len_score" + (lit(1.0) - $"punct_ratio") +
          (lit(1.0) - $"stop_ratio") + $"uniq_ratio") / 4.0))
  }

  /** E2 — quality score: length saturation, punctuation ratio,
    * stopword ratio, token uniqueness — equal-weighted blend.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withQualityScore(Tables.load(spark, dir, "documents"))
      .select($"doc_id", roundP($"len_score").as("len_score"),
        roundP($"punct_ratio").as("punct_ratio"),
        roundP($"stop_ratio").as("stop_ratio"),
        roundP($"uniq_ratio").as("uniq_ratio"), $"quality")
      .orderBy($"doc_id")
  }

  /** E28 — Gopher/C4-style rule-based quality filter: the hard
    * keep/drop gate (vs E2's soft score) used by production pretraining
    * pipelines (Rae et al. 2021 §A1.1; Raffel et al. 2020 §2.2). Per
    * document: word count bounds, mean word length band, minimum
    * distinct-stopword presence, and top-word coverage (the n=1 form
    * of Gopher's top-n-gram fraction; high coverage = templated/
    * repetitive text). `keep` is the conjunction.
    *
    * All stats are integer counts or a SINGLE integer/integer division
    * rounded with the floor trick, so both engines produce identical
    * doubles and the thresholds compare identically. Scale shape: one
    * explode → (doc_id, word) partial-agg count → doc rollup; both
    * shuffles corpus-linear, no corpus-sized state.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wc = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
    val frac6 = (num: Column, den: Column) =>
      floor(num.cast("double") / den.cast("double") * 1000000.0 + 0.5)
        .cast("double") / 1000000.0
    wc.groupBy($"doc_id")
      .agg(sum($"c").as("n_words"),
        sum(length($"w") * $"c").as("sum_len"),
        count(lit(1)).as("n_distinct"),
        max($"c").as("top_c"),
        sum(when($"w".isin(Stopwords: _*), 1L).otherwise(0L))
          .as("n_stop_types"))
      .withColumn("mean_word_len",
        floor($"sum_len".cast("double") / $"n_words" * 10000.0 + 0.5)
          .cast("double") / 10000.0)
      .withColumn("top_word_frac", frac6($"top_c", $"n_words"))
      .withColumn("dup_word_frac",
        frac6($"n_words" - $"n_distinct", $"n_words"))
      .withColumn("keep",
        when($"n_words" >= 50 && $"n_words" <= 100000 &&
          $"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0 &&
          $"n_stop_types" >= 2 && $"top_word_frac" <= 0.1, 1L)
          .otherwise(0L))
      .select($"doc_id", $"n_words", $"mean_word_len", $"n_stop_types",
        $"top_word_frac", $"dup_word_frac", $"keep")
      .orderBy($"doc_id")
  }

  /** Per-row form of [[gopherRules]] (identical output values): every
    * stat folds over the token array inside one projection — no
    * explode, no aggregation — so it runs STATELESS on a document
    * stream (G14) where the explode→groupBy form would need chained
    * streaming aggregations. top_c is O(distinct·n) per document —
    * bounded by document length, independent of corpus size.
    */
  def gopherRulesOn(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val stopLit = typedLit(Stopwords)
    val frac6 = (num: Column, den: Column) =>
      floor(num.cast("double") / den.cast("double") * 1000000.0 + 0.5)
        .cast("double") / 1000000.0
    df.withColumn("toks", filter(split($"text", " "), _ =!= ""))
      .filter(size($"toks") > 0)
      .withColumn("n_words", size($"toks").cast("long"))
      .withColumn("dtoks", array_distinct($"toks"))
      .withColumn("sum_len",
        aggregate($"toks", lit(0L), (s, w) => s + length(w)))
      .withColumn("top_c", array_max(transform($"dtoks",
        w => size(filter($"toks", t => t === w)).cast("long"))))
      .withColumn("n_stop_types",
        size(array_intersect($"dtoks", stopLit)).cast("long"))
      .withColumn("mean_word_len",
        floor($"sum_len".cast("double") / $"n_words" * 10000.0 + 0.5)
          .cast("double") / 10000.0)
      .withColumn("top_word_frac", frac6($"top_c", $"n_words"))
      .withColumn("dup_word_frac",
        frac6($"n_words" - size($"dtoks"), $"n_words"))
      .withColumn("keep",
        when($"n_words" >= 50 && $"n_words" <= 100000 &&
          $"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0 &&
          $"n_stop_types" >= 2 && $"top_word_frac" <= 0.1, 1L)
          .otherwise(0L))
      .select($"doc_id", $"n_words", $"mean_word_len", $"n_stop_types",
        $"top_word_frac", $"dup_word_frac", $"keep")
  }

  /** E3 — heuristic language ID: per-language profile hit counts,
    * deterministic argmax (first language in declared order wins ties).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withScores = LangProfiles.foldLeft(
      Tables.load(spark, dir, "documents")
        .withColumn("toks", split($"text", " "))) {
      case (df, (lang, words)) =>
        df.withColumn(s"s_$lang", countIn($"toks", words).cast("long"))
    }
    val scores = LangProfiles.map { case (l, _) => col(s"s_$l") }
    val pred = LangProfiles.init.zipWithIndex.foldRight(
      lit(LangProfiles.last._1)) { case (((lang, _), i), elseCol) =>
      when(scores(i) >= scores.drop(i + 1).reduce(greatest(_, _)), lang)
        .otherwise(elseCol)
    }
    withScores
      .withColumn("pred_lang", pred)
      .withColumn("matches_label", $"pred_lang" === $"lang")
      .select(($"doc_id" +: LangProfiles.map { case (l, _) => col(s"s_$l") }) :+
        $"pred_lang" :+ $"matches_label": _*)
      .orderBy($"doc_id")
  }

  /** E38 — sparse TF-IDF kNN via inverted-index join: top-k most
    * similar documents per query doc under l2-normalized tf-idf cosine
    * — the text-side similarity search that needs no embedding model
    * (the retrieval half of BM25, D1's dense twin). The join is
    * TERM-keyed (the inverted index as a relational join): only
    * documents SHARING a term with the query ever meet it. On a real
    * Zipf-distributed vocabulary the production lever is `dfCutFrac`
    * (prune head terms with df > frac·N — the classic stopword/impact
    * cut bounding posting-list fan-out); it defaults OFF here because
    * the synthetic vocab is uniform (every term's df ≈ 0.8·N, so any
    * cut empties the index rather than trimming a head).
    *
    * Scale shape: tf/df/norms are corpus-linear partial-agg passes
    * (df joins back BROADCAST, vocab-sized); the score join shuffles
    * on term with posting lists bounded by the df cut; per-query top-k
    * goes through the B37 k-bounded heap — queries×k rows past the
    * final shuffle, no window sort.
    */
  def sparseKnn(spark: SparkSession, dir: String, k: Int = 5,
                nQueries: Int = 5, dfCutFrac: Double = 1.0): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.count().toDouble
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      .filter($"df".cast("double") <= lit(dfCutFrac) * lit(n))
    // df is VOCABULARY-sized — it grows with the corpus (Heaps' law),
    // so the broadcast decision belongs to AQE's runtime stats, not a
    // hint: forced broadcast of a Heaps frame is an OOM at 100 TB,
    // while AQE still broadcasts it whenever it is actually small
    // (r12 sweep: same plan at every test SF)
    val w = tf.join(df, "term")
      .select($"doc_id", $"term",
        ($"tf" * log(lit(n) / $"df")).as("w"))
    // the norm folds the per-doc term frame in SORTED term order —
    // engine-deterministic (a float SUM accumulates in partition
    // order; round-10 anova seam); the frame is doc-vocabulary-sized,
    // so the collect is bounded by a single document's distinct terms
    val norm = w.groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"term",
        ($"w" * $"w").as("ww")))).as("tw"))
      .select($"doc_id", sqrt(aggregate($"tw", lit(0.0),
        (a, x) => a + x.getField("ww"))).as("nrm"))
    // zero-norm docs (every term in every doc ⇒ idf 0 — the n=1
    // degenerate) carry no TF-IDF signal; drop them on BOTH sides
    // rather than divide by zero
    // (r15: caching this frame was tried and REVERTED — the cache
    // materialization of the doc-term weight rows cost more than the
    // two consumers' recompute at committed SFs: 1.9 → 2.6 s.)
    val wn = w.join(norm, "doc_id").filter($"nrm" > 0.0)
      .select($"doc_id", $"term", ($"w" / $"nrm").as("wn"))
    val q = wn.filter($"doc_id" < nQueries)
      .select($"doc_id".as("query_id"), $"term", $"wn".as("qw"))
    // cosine folds the shared-term frame in sorted term order too
    val scores = wn.join(q, "term")
      .filter($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id")
      .agg(sort_array(collect_list(struct($"term",
        ($"wn" * $"qw").as("p")))).as("tp"))
      .select($"query_id", $"doc_id", aggregate($"tp", lit(0.0),
        (a, x) => a + x.getField("p")).as("cos"))
    val topk = udaf(graft.expressions.TopKPairs(k))
    scores.groupBy($"query_id")
      .agg(topk($"cos", $"doc_id").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("idx", "p")))
      .select($"query_id", ($"idx" + 1).cast("long").as("rnk"),
        $"p._2".as("doc_id"),
        (floor($"p._1" * 1000000.0 + 0.5) / 1000000.0).as("cosine"))
      .orderBy($"query_id", $"rnk")
  }

  /** E41 — RAKE keyphrase extraction (Rose et al. 2010), relationally:
    * candidate phrases are maximal stopword-free token runs (segmented
    * with the B6 sessionize trick — a running count of stopword
    * "boundaries" over token positions), word scores are deg/freq over
    * the phrase corpus (deg = Σ phrase length over a word's
    * occurrences), and a phrase scores the sum of its words' scores —
    * the classic unsupervised keyphrase extractor, as joins and
    * aggregates.
    *
    * Scale shape: segmentation is one posexplode + a doc-partitioned
    * running sum (doc-length-bounded windows); word stats are a
    * vocab-sized partial agg joined back BROADCAST; the per-phrase
    * score folds over a SORTED score list so the float sum order is
    * engine-identical; the top-20 cut is TakeOrdered on the 6-dp
    * score. Nothing pairwise, everything token-linear.
    */
  def rakeKeyphrases(spark: SparkSession, dir: String,
                     topK: Int = 20): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", posexplode(split($"text", " "))
        .as(Seq("pos", "tok")))
      // isin, not an OR chain of equalities: same predicate, one In
      // the optimizer can evaluate as a set probe
      .withColumn("is_stop",
        ($"tok" === "" || $"tok".isin(Stopwords: _*)).cast("long"))
    val w = W.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(W.unboundedPreceding, 0)
    val phrases = toks
      .withColumn("run", sum($"is_stop").over(w))
      .filter($"is_stop" === 0)
      .groupBy($"doc_id", $"run")
      .agg(sort_array(collect_list(struct($"pos", $"tok"))).as("pt"))
      .select($"doc_id", $"run",
        transform($"pt", p => p.getField("tok")).as("ws"))
      .withColumn("plen", size($"ws").cast("long"))
      .withColumn("phrase", concat_ws(" ", $"ws"))
    val wordStats = phrases
      .select(explode($"ws").as("wd"), $"plen")
      .groupBy($"wd")
      .agg(count(lit(1)).as("freq"), sum($"plen").as("deg"))
      .select($"wd", ($"deg".cast("double") / $"freq").as("wscore"))
    val scored = phrases
      .select($"doc_id", $"run", $"phrase", explode($"ws").as("wd"))
      .join(wordStats, "wd")
      .groupBy($"doc_id", $"run", $"phrase")
      .agg(sort_array(collect_list($"wscore")).as("ss"))
      .select($"phrase",
        aggregate($"ss", lit(0.0), (acc, x) => acc + x).as("score"))
    scored.groupBy($"phrase")
      .agg(count(lit(1)).as("n_occurrences"), max($"score").as("score"))
      .select($"phrase", $"n_occurrences",
        (floor($"score" * 1000000.0 + 0.5) / 1000000.0).as("score"))
      .orderBy($"score".desc, $"phrase")
      .limit(topK)
  }

  /** E40 — source-vocabulary overlap matrix: pairwise Jaccard of the
    * DISTINCT token vocabularies of every source pair — the source-
    * redundancy audit of a corpus acquisition plan (two sources with
    * near-identical vocabularies probably crawl the same universe;
    * merging them buys tokens, not coverage — the corpus-level cousin
    * of C4's per-document Jaccard).
    *
    * Scale shape: one tokenize pass partial-aggregated to the
    * (source, token) DISTINCT frame (vocab-bounded by Heaps' law);
    * intersections come from the token-keyed self-join of that frame
    * (each token contributes its source-pair combinations — bounded by
    * sources², never corpus-sized); per-source vocab sizes broadcast
    * back. Exact integers into one division, 6-dp rounded.
    */
  def sourceVocabOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = Tables.load(spark, dir, "documents")
      .select($"source", explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "")
      .distinct()
    val sizes = st.groupBy($"source").agg(count(lit(1)).as("v"))
    val inter = st.select($"source".as("src_a"), $"t")
      .join(st.select($"source".as("src_b"), $"t"), "t")
      .filter($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("common"))
    inter
      .join(broadcast(sizes.select($"source".as("src_a"), $"v".as("va"))),
        "src_a")
      .join(broadcast(sizes.select($"source".as("src_b"), $"v".as("vb"))),
        "src_b")
      .select($"src_a", $"src_b", $"va", $"vb", $"common",
        (floor($"common".cast("double") / ($"va" + $"vb" - $"common")
          * 1000000.0 + 0.5) / 1000000.0).as("jaccard"))
      .orderBy($"src_a", $"src_b")
  }

  /** E39 — self-trained char-trigram language classifier, evaluated
    * on a held-out split: per-language top-20 character trigrams are
    * LEARNED from the H2 train split (md5 bucket < 12), test docs are
    * scored by profile-hit count (argmax, smallest lang on ties), and
    * the output is the test-split confusion matrix — the full
    * train-on-A/evaluate-on-B loop of a corpus-native classifier,
    * entirely in-engine (contrast E3's fixed word lists).
    *
    * Scale shape: profile training is one trigram explode over the
    * train split partial-aggregated to (langs × vocab) and cut to
    * langs×20 rows — broadcast; scoring joins each test doc's DISTINCT
    * trigrams against that broadcast profile and rolls up per (doc,
    * lang) then argmax per doc — all corpus-linear, no pairwise
    * anything. Integer counts end-to-end → exact oracle.
    */
  def langidTrigram(spark: SparkSession, dir: String,
                    profileK: Int = 20): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("bucket",
        conv(substring(md5($"doc_id".cast("string").cast("binary")), 32, 1),
          16, 10).cast("long"))
    val tri = docs
      .filter(length($"text") >= 3)
      // codegen'd linear trigram pass — the SQL chain's per-window
      // substring(text, i, 3) re-seeks character boundaries from byte
      // 0, O(chars²) per document (SqlFunctionsSpec pins bit-equality
      // to the chain; the oracle SQL is unchanged)
      .select($"doc_id", $"lang", $"bucket",
        explode(graft.functions.char_trigrams($"text")).as("g"))
    val profile = tri.filter($"bucket" < 12)
      .groupBy($"lang", $"g").agg(count(lit(1)).as("c"))
    val w = W.partitionBy($"lang").orderBy($"c".desc, $"g")
    val top = profile.withColumn("r", row_number().over(w))
      .filter($"r" <= profileK)
      .select($"lang".as("plang"), $"g")
    val hits = tri.filter($"bucket" >= 12)
      .select($"doc_id", $"lang", $"g").distinct()
      .join(broadcast(top), "g")
      .groupBy($"doc_id", $"lang", $"plang")
      .agg(count(lit(1)).as("hits"))
    val dw = W.partitionBy($"doc_id").orderBy($"hits".desc, $"plang")
    hits.withColumn("r", row_number().over(dw))
      .filter($"r" === 1)
      .groupBy($"lang", $"plang".as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"pred_lang")
  }

  /** E35 — language-ID confusion matrix: the E3 classifier evaluated
    * against the labeled corpus as (true lang × predicted lang) cells
    * with per-true-language recall shares — the model-eval rollup any
    * classifier deployed over a corpus needs, computed without leaving
    * the engine. The doc_id-keyed truth join is corpus-linear; the
    * confusion frame is ≤ langs² rows so the share window is
    * broadcast-scale.
    */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val pred = langId(spark, dir).select($"doc_id", $"pred_lang")
    val truth = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang")
    val w = W.partitionBy($"lang")
    pred.join(truth, "doc_id")
      .groupBy($"lang", $"pred_lang").agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum($"n").over(w))
      .select($"lang", $"pred_lang", $"n",
        roundP($"n".cast("double") / $"row_total").as("recall_share"))
      .orderBy($"lang", $"pred_lang")
  }

  /** E43 — two-sample Kolmogorov–Smirnov test between every source
    * pair on the document-length distribution: the EXACT nonparametric
    * "do these two feeds draw from the same length law?" complement of
    * B68's binned PSI — KS needs no bin choice, because the statistic
    * is the sup-gap between the two empirical CDFs and that sup is
    * attained at an observed length. Emits D, the α=0.05 critical
    * value c(α)·√((n₁+n₂)/(n₁n₂)) and the reject flag per pair — the
    * mixture designer's screen for "can I pool these sources' length
    * priors?".
    *
    * Scale shape: ONE corpus pass to (source, length) counts; both
    * ECDFs are prefix sums over the sources²×lengths grid (bounded by
    * distinct lengths, NOT docs — the window frame is post-aggregate
    * small); the pairwise sup is a plain max aggregate. CDF values
    * are exact-integer ratios, so the sup compare is engine-identical.
    */
  def lengthKs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables.load(spark, dir, "documents")
      .groupBy($"source", $"n_chars".as("x"))
      .agg(count(lit(1)).as("c"))
    val ns = cnt.groupBy($"source").agg(sum($"c").as("n"))
    // pair grid: each (source, x, c) row contributes to every pair the
    // source belongs to; the per-pair union-of-steps frame comes from
    // the union of the two sides' contribution rows
    val srcs = ns.select($"source".as("s2"), $"n".as("n2"))
    val left = cnt.join(broadcast(srcs), $"source" < $"s2")
      .select($"source".as("src_a"), $"s2".as("src_b"), $"x",
        $"c".as("ia"), lit(0L).as("ib"))
    val right = cnt.join(broadcast(srcs), $"s2" < $"source")
      .select($"s2".as("src_a"), $"source".as("src_b"), $"x",
        lit(0L).as("ia"), $"c".as("ib"))
    val steps = left.unionAll(right)
      .groupBy($"src_a", $"src_b", $"x")
      .agg(sum($"ia").as("ia"), sum($"ib").as("ib"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src_a", $"src_b").orderBy($"x")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val na = ns.select($"source".as("src_a"), $"n".as("n_a"))
    val nb = ns.select($"source".as("src_b"), $"n".as("n_b"))
    steps
      .withColumn("ca", sum($"ia").over(w))
      .withColumn("cb", sum($"ib").over(w))
      .join(broadcast(na), "src_a")
      .join(broadcast(nb), "src_b")
      .withColumn("gap", abs($"ca".cast("double") / $"n_a" -
        $"cb".cast("double") / $"n_b"))
      .groupBy($"src_a", $"src_b", $"n_a", $"n_b")
      .agg(max($"gap").as("d"))
      .withColumn("crit_05", lit(1.358) *
        sqrt(($"n_a" + $"n_b").cast("double") / ($"n_a" * $"n_b")))
      .select($"src_a", $"src_b", $"n_a", $"n_b",
        (floor($"d" * 1000000.0 + 0.5) / 1000000.0).as("ks_stat"),
        (floor($"crit_05" * 1000000.0 + 0.5) / 1000000.0).as("crit_05"),
        ($"d" > $"crit_05").as("reject_05"))
      .orderBy($"src_a", $"src_b")
  }

  /** E44 — Porter-stemming vocabulary report: how much does the
    * classic suffix-stripper shrink each language's vocabulary?
    * Stemming folds inflection families (relate/relational/relating →
    * one stem), which shrinks TF-IDF/BM25 vocabularies (E8/E30) and
    * tightens vocab-overlap estimates (E40) — this reports the
    * per-language fold ratio and length shift so the indexing layer
    * can decide whether stemming pays for this corpus.
    *
    * Scale shape: the E21 BPE discipline — the stemmer (the codegen'd
    * [[graft.expressions.PorterStem]] expression over
    * [[graft.text.PorterStemmer]]) runs once per DISTINCT
    * (lang, word), so the cost is vocabulary-sized, never
    * corpus-sized, and stays inside whole-stage codegen (r12: was the
    * registry's last scalar ScalaUDF); everything downstream is a
    * langs-sized partial agg on integer sums. Rows-only by
    * declaration (no SQL engine ships Porter); the spec pins the
    * published algorithm's canonical vectors.
    */
  def stemReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables.load(spark, dir, "documents")
      .select($"lang", explode(split(lower($"text"), " ")).as("w"))
      .filter($"w".rlike("^[a-z]+$"))
      .distinct()
      .withColumn("stem", graft.functions.porter_stem($"w"))
    words
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_words"),
        countDistinct($"stem").as("n_stems"),
        sum(length($"w")).as("wlen"),
        sum(length($"stem")).as("slen"))
      .select($"lang", $"n_words", $"n_stems",
        (floor((lit(1.0) - $"n_stems".cast("double") / $"n_words")
          * 10000.0 + 0.5) / 10000.0).as("vocab_reduction"),
        (floor($"wlen".cast("double") / $"n_words" * 10000.0 + 0.5)
          / 10000.0).as("avg_word_len"),
        (floor($"slen".cast("double") / $"n_words" * 10000.0 + 0.5)
          / 10000.0).as("avg_stem_len"))
      .orderBy($"lang")
  }

  /** E36 — per-language document-length profile: exact p10/p50/p90
    * token-count percentiles + mean per language, the length-prior
    * every chunking/packing/truncation decision reads off first. One
    * tokenize projection feeding a per-lang exact percentile (grouped,
    * not global — partitions bounded by the largest language, and the
    * B35 sketch is the documented constant-memory fallback at corpus
    * scale). Token counts are integers, so quantile interpolation
    * matches cross-engine at 4 dp.
    */
  def docLengthProfile(spark: SparkSession, dir: String,
                       approx: Boolean = false,
                       accuracy: Int = 10000): DataFrame = {
    import spark.implicits._
    // approx=true is the B35-sketch fallback for corpora whose largest
    // language exceeds one executor's percentile buffer: Spark's
    // approx_percentile (Greenwald–Khanna) holds O(accuracy) state per
    // group with rank error ≤ n/accuracy, vs the exact Percentile's
    // O(distinct-values) buffer. The exact path stays the oracle-gated
    // default; PercentileFallbackSpec pins the rank-error bound.
    def p(q: Double) =
      floor((if (approx) expr(s"approx_percentile(n_tok, $q, $accuracy)")
             else expr(s"percentile(n_tok, $q)")) * 10000.0 + 0.5)
        .cast("double") / 10000.0
    Tables.load(spark, dir, "documents")
      .select($"lang", size(split($"text", " ")).cast("long").as("n_tok"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), p(0.1).as("p10"), p(0.5).as("p50"),
        p(0.9).as("p90"),
        roundP(avg($"n_tok")).as("mean_tok"))
      .orderBy($"lang")
  }

  /** E4 — document fingerprint: polynomial rolling hash over
    * characters, mod 1e9+7 (order-sensitive, unlike the shingle ops).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("fp", aggregate(
        split($"text", ""),
        lit(0L),
        (h, c) => (h * 31 + ascii(c)) % 1000000007L))
      .select($"doc_id", $"fp".as("fingerprint"))
      .orderBy($"doc_id")
  }

  /** E5 — corpus n-gram profile: top-10 token bigrams per language
    * (partial-agg count, then a per-group window rank).
    */
  def ngramFreq(spark: SparkSession, dir: String, topK: Int = 10): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val grams = Tables.load(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 2)
      // codegen'd one-pass bigrams, bit-identical to the interpreted
      // transform(sequence…slice…) chain for size >= 2 (SqlFunctionsSpec)
      .select($"lang",
        explode(graft.functions.word_ngrams($"toks", 2)).as("gram"))
      .groupBy($"lang", $"gram")
      .agg(count(lit(1)).as("cnt"))
    val w = W.partitionBy($"lang").orderBy($"cnt".desc, $"gram")
    grams.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= topK)
      .select($"lang", $"rnk", $"gram", $"cnt")
      .orderBy($"lang", $"rnk")
  }

  /** E34 — distributed logistic-regression training for a surface-
    * feature quality/language classifier (predict lang=="en" from
    * token-count, word-length, and stopword-ratio features): full-batch
    * gradient descent where EVERY iteration is one partial-aggregable
    * corpus pass producing a 4-double gradient — the classic
    * "aggregate-the-gradient" distributed-ML shape (map-side combine,
    * one 4-value reduce to the driver, weights re-broadcast as
    * literals in the next iteration's expression). Feature prep is
    * computed once and localCheckpoint'd, so the 15 iterations never
    * re-derive lineage; model state is O(features), independent of
    * corpus size — this is exactly how a 100 TB corpus trains a tiny
    * quality gate without leaving the engine.
    *
    * Output: trained weights, training accuracy, and log-loss
    * (4-dp rounded). No SQL oracle — iterative aggregate-in-loop is
    * not expressible in DuckDB's recursive CTEs — so correctness is
    * the ScalaTest ≡-serial-replay spec (same float ops, same
    * iteration count, on the collected feature matrix).
    */
  private[graft] def qualityLrFeatures(spark: SparkSession,
                                       dir: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        ($"lang" === "en").cast("double").as("y"),
        lit(1.0).as("x0"),
        log(lit(1.0) + size(toks).cast("double")).as("x1"),
        ($"n_chars".cast("double") / size(toks).cast("double")).as("x2"),
        (size(filter(toks, t => Stopwords.map(t === _).reduce(_ || _)))
          .cast("double") / size(toks).cast("double")).as("x3"))
  }

  def qualityLr(spark: SparkSession, dir: String,
                iters: Int = 15, lr: Double = 1.0): DataFrame = {
    import spark.implicits._
    val raw = qualityLrFeatures(spark, dir).localCheckpoint()
    // z-score the non-intercept features (one moment pass) — GD on
    // unscaled features oscillates (step bound ~ 2/max eigenvalue of
    // the feature Gram; standardization makes lr=1.0 safely inside it)
    val st = raw.agg(
      avg($"x1").as("m1"), avg($"x1" * $"x1").as("q1"),
      avg($"x2").as("m2"), avg($"x2" * $"x2").as("q2"),
      avg($"x3").as("m3"), avg($"x3" * $"x3").as("q3")).collect()(0)
    if (st.isNullAt(0))  // empty corpus: nothing to fit
      return Seq.empty[(String, Double)].toDF("metric", "value")
    def sd(m: Double, q: Double): Double =
      math.sqrt(math.max(q - m * m, 1e-12))
    val feats = raw.select($"doc_id", $"y", $"x0",
      (($"x1" - st.getDouble(0)) / sd(st.getDouble(0), st.getDouble(1)))
        .as("x1"),
      (($"x2" - st.getDouble(2)) / sd(st.getDouble(2), st.getDouble(3)))
        .as("x2"),
      (($"x3" - st.getDouble(4)) / sd(st.getDouble(4), st.getDouble(5)))
        .as("x3"))
      .localCheckpoint()
    val n = feats.count().toDouble
    val w = Array.fill(4)(0.0)
    def margin: Column =
      lit(w(0)) * $"x0" + lit(w(1)) * $"x1" +
        lit(w(2)) * $"x2" + lit(w(3)) * $"x3"
    def prob: Column = lit(1.0) / (lit(1.0) + exp(-margin))
    for (_ <- 1 to iters) {
      val err = prob - $"y"
      val g = feats.agg(
        sum(err * $"x0").as("g0"), sum(err * $"x1").as("g1"),
        sum(err * $"x2").as("g2"), sum(err * $"x3").as("g3"))
        .collect()(0)
      var j = 0
      while (j < 4) { w(j) -= lr / n * g.getDouble(j); j += 1 }
    }
    val m = feats.agg(
      avg((when(prob >= 0.5, 1.0).otherwise(0.0) === $"y")
        .cast("double")).as("acc"),
      avg(-($"y" * log(prob) +
        (lit(1.0) - $"y") * log(lit(1.0) - prob))).as("ll"))
      .collect()(0)
    val rows = w.zipWithIndex.map { case (wt, j) => (s"w$j", wt) } ++
      Seq(("n_docs", n), ("accuracy", m.getDouble(0)),
        ("log_loss", m.getDouble(1)))
    rows.toSeq.toDF("metric", "value")
      .select($"metric", roundP($"value").as("value"))
      .orderBy($"metric")
  }

  /** E33 — PMI collocation mining: ranks adjacent token pairs by
    * pointwise mutual information ln(P(ab) / (P(a)·P(b))) with a
    * min-support cut — the classic collocation/multi-word-expression
    * extractor (Church & Hanks 1990) a tokenizer-vocab or phrase-merge
    * pass runs before BPE training.
    *
    * Scale shape: one token explode feeding TWO partial-agg counts
    * (unigrams, vocab-sized by Heaps' law; bigrams, pair-vocab-sized);
    * the corpus never materializes pairs beyond adjacent positions.
    * The unigram side joins back BROADCAST (vocab ≪ corpus) and the
    * totals are a one-row broadcast cross join, so the only shuffles
    * are the two count aggregations — both map-side combined. The
    * final top-k is a TakeOrderedAndProject over the pair-vocab frame.
    * All probabilities are ratios of exact integer counts evaluated in
    * the same IEEE order both engines, ln'd once, 4-dp floor-rounded.
    */
  def pmiCollocations(spark: SparkSession, dir: String,
                      minCount: Int = 5, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 2)
    val uni = toks.select(explode($"toks").as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
    val big = toks.select(
        explode(graft.functions.word_ngrams($"toks", 2)).as("gram"))
      .groupBy($"gram").agg(count(lit(1)).as("cab"))
    val tot = uni.agg(sum($"c").cast("double").as("n_uni"))
      .crossJoin(big.agg(sum($"cab").cast("double").as("n_big")))
    big.filter($"cab" >= minCount)
      .withColumn("a", split($"gram", " ", -1).getItem(0))
      .withColumn("b", split($"gram", " ", -1).getItem(1))
      .join(uni.select($"t".as("a"), $"c".as("ca")), "a")
      .join(uni.select($"t".as("b"), $"c".as("cb")), "b")
      .crossJoin(broadcast(tot))
      .select($"gram", $"cab".as("support"),
        roundP(log(($"cab".cast("double") / $"n_big") /
          (($"ca".cast("double") / $"n_uni") *
            ($"cb".cast("double") / $"n_uni")))).as("pmi"))
      .orderBy($"pmi".desc, $"gram")
      .limit(topK)
  }

  /** E22 — cross-corpus n-gram novelty: the fraction of a document's
    * DISTINCT 8-grams that no other document contains — low novelty
    * flags boilerplate/templated/near-memorized text that per-doc
    * quality scores miss, and is the document-level form of the
    * train-set-overlap signal behind H4's contamination check.
    *
    * Scale shape: one gram explode (per-doc deduped so the df rollup
    * is doc frequency), one gram-keyed partial-agg count, one join
    * back on gram, one doc-keyed rollup — all corpus-linear; no
    * pairwise anything (the gram table plays the role C7's window
    * hashes play for exact sub-document dedup).
    */
  def novelty(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    import spark.implicits._
    // spread: the 8-gram kernel is the one text kernel heavy enough
    // to beat the spread shuffle (A/B 1.27 -> 1.02 s; langid/rake/
    // readability measured flat-to-worse and stay unspread)
    val grams = Tables.spread(Tables.load(spark, dir, "documents"))
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= n)
      // codegen'd one-pass distinct n-grams, bit-identical to the
      // array_distinct(transform(sequence…slice…)) chain for
      // size >= n (SqlFunctionsSpec)
      .select($"doc_id",
        explode(graft.functions.shingles_n($"toks", n)).as("gram"))
    val df = grams.groupBy($"gram").agg(count(lit(1)).as("df"))
    grams.join(df, "gram")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"df" > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("novelty",
        floor((lit(1.0) - $"n_shared".cast("double") / $"n_grams")
          * 1000000.0 + 0.5) / 1000000.0)
      .select($"doc_id", $"n_grams", $"n_shared", $"novelty")
      .orderBy($"doc_id")
  }

  /** E6 — text normalization: lowercase, strip non-alphanumerics,
    * collapse whitespace. Emits a fingerprint + length (not the full
    * cleaned body) so the artifact stays narrow.
    */
  def clean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("cleaned",
        trim(regexp_replace(
          regexp_replace(lower($"text"), "[^a-z0-9 ]", ""),
          " +", " ")))
      .select($"doc_id", length($"cleaned").cast("long").as("clean_len"),
        md5($"cleaned").as("clean_hash"))
      .orderBy($"doc_id")
  }

  /** E8 — TF-IDF top-3 terms per document: term explode → per-doc tf,
    * per-term df, broadcast df join, rank on the (portably rounded)
    * score. The one-explode-two-aggregates shape that scales linearly.
    */
  def tfidf(spark: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.count().toDouble
    val terms = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = W.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term")
    terms.join(df, "term")
      .withColumn("tfidf",
        floor($"tf" * log(lit(n) / $"df") * 1000000.0 + 0.5)
          .cast("double") / 1000000.0)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= topK)
      .select($"doc_id", $"rnk", $"term", $"tf", $"df", $"tfidf")
      .orderBy($"doc_id", $"rnk")
  }

  /** E9 — regex tokenization (the BPE-pre-tokenizer shape): letter
    * runs / digit runs / punctuation runs as separate tokens. The
    * alternatives have disjoint first characters, so alternation-order
    * semantics (Java regex vs RE2) can't change the result — the
    * property that makes the count oracle-portable.
    */
  def regexTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val full = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]+"
    Tables.load(spark, dir, "documents")
      .withColumn("toks", regexp_extract_all($"text", lit(full), lit(0)))
      .select($"doc_id",
        size($"toks").cast("long").as("n_tok"),
        size(array_distinct($"toks")).cast("long").as("n_uniq"),
        size(regexp_extract_all($"text", lit("[A-Za-z]+"), lit(0)))
          .cast("long").as("n_alpha"),
        size(regexp_extract_all($"text", lit("[0-9]+"), lit(0)))
          .cast("long").as("n_num"))
      .withColumn("n_punct", $"n_tok" - $"n_alpha" - $"n_num")
      .orderBy($"doc_id")
  }

  private def tokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
  }

  /** E10 — vocabulary build: top-V corpus tokens by frequency
    * (deterministic tiebreak: token asc). The orderBy+limit plans as
    * TakeOrderedAndProject — per-partition top-V heaps merged on the
    * driver, never a single-partition global sort of the full vocab —
    * so only the final V×1 rank window is serial.
    */
  def vocabulary(spark: SparkSession, dir: String,
                 topV: Int = 500): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val top = tokens(spark, dir)
      .groupBy($"token").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token").limit(topV)
    top.withColumn("rank",
        row_number().over(W.orderBy($"freq".desc, $"token")).cast("long"))
      .orderBy($"rank")
  }

  /** E11 — out-of-vocabulary rate per document against the top-V
    * vocabulary: token stream LEFT-joins the BROADCAST vocab (tiny by
    * construction), so the corpus never shuffles on token.
    */
  def oovRate(spark: SparkSession, dir: String,
              topV: Int = 10): DataFrame = {
    import spark.implicits._
    val vocab = vocabulary(spark, dir, topV)
      .select($"token", lit(1).as("in_v"))
    tokens(spark, dir)
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when($"in_v".isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        roundP($"n_oov".cast("double") / $"n_tok"))
      .orderBy($"doc_id")
  }

  /** E12 — context-window chunking: each document's token stream cut
    * into fixed-size overlapping windows (size 64, stride 48) — the
    * row-multiplying step before tokenization in a training pipeline.
    * Pure per-row explode (no shuffle); emits a per-chunk hash so the
    * artifact stays narrow at any corpus size.
    */
  def chunkDocuments(spark: SparkSession, dir: String,
                     chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    import spark.implicits._
    val stride = chunkSize - overlap
    Tables.load(spark, dir, "documents")
      .withColumn("t", split($"text", " "))
      .withColumn("n", size($"t").cast("long"))
      .withColumn("n_chunks",
        when($"n" <= chunkSize, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(n - $chunkSize + ${stride - 1}) div $stride")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), $"n_chunks" - 1)))
      .withColumn("start", $"chunk_idx" * stride)
      .select($"doc_id", $"chunk_idx",
        least($"n" - $"start", lit(chunkSize.toLong)).as("chunk_tokens"),
        md5(concat_ws(" ",
          slice($"t", ($"start" + 1).cast("int"), lit(chunkSize)))
          .cast("binary")).as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** E13 — token-count histogram: fixed-width bins (top bin open) with
    * per-bin count and range. One partial-aggregated groupBy over a
    * scan-side projection — the constant-output corpus profile.
    */
  def tokenHistogram(spark: SparkSession, dir: String,
                     binWidth: Int = 32, maxBins: Int = 10): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("n", size(split($"text", " ")).cast("long"))
      .withColumn("bin", least(expr(s"n div $binWidth"), lit(maxBins - 1L)))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"), min($"n").as("min_tokens"),
        max($"n").as("max_tokens"))
      .orderBy($"bin")
  }

  /** E14 — repetition profile (the Gopher-style repetition quality
    * gate): per-document duplicate-token fraction, most-frequent
    * unigram/bigram shares, and longest same-token run. Token stream
    * partial-aggregates per (doc, gram); the run-length pass is a
    * per-doc window — every shuffle is keyed by doc_id, so the op
    * scales with corpus size, never vocabulary size. The flag uses
    * integer arithmetic (5·top > n) so both engines decide identically.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") > 0)
    val tok = docs.select($"doc_id", posexplode($"toks").as(Seq("pos", "token")))
    val uni = tok.groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
    val stats = uni.groupBy($"doc_id").agg(
      sum($"c").as("n_tok"), max($"c").as("top_tok"),
      count(lit(1)).as("n_uniq"))
    val bigTop = docs.filter(size($"toks") >= 2)
      .select($"doc_id",
        explode(graft.functions.word_ngrams($"toks", 2)).as("gram"))
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("top_big"))
    val w = W.partitionBy($"doc_id").orderBy($"pos")
    val maxRun = tok
      .withColumn("chg",
        when(lag($"token", 1).over(w) === $"token", 0L).otherwise(1L))
      .withColumn("seg", sum($"chg").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy($"doc_id", $"seg").agg(count(lit(1)).as("run"))
      .groupBy($"doc_id").agg(max($"run").as("max_run"))
    stats.join(bigTop, Seq("doc_id"), "left").join(maxRun, Seq("doc_id"))
      .select($"doc_id", $"n_tok", $"n_uniq",
        roundP(lit(1.0) - $"n_uniq".cast("double") / $"n_tok")
          .as("dup_frac"),
        roundP($"top_tok".cast("double") / $"n_tok").as("top_tok_frac"),
        when($"n_tok" < 2, 0.0)
          .otherwise(roundP(coalesce($"top_big", lit(0L)).cast("double") /
            ($"n_tok" - 1))).as("top_bigram_frac"),
        $"max_run",
        ($"top_tok" * 5 > $"n_tok").as("repetitive"))
      .orderBy($"doc_id")
  }

  /** E15 — character-entropy quality proxy: Shannon entropy (bits) of
    * the per-document character distribution — the cheap gibberish /
    * encoding-junk detector (natural text sits ~3.5–4.5 bits). One
    * explode + two doc-keyed partial aggregations.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(split($"text", "")).as("ch"))
      .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
    // per-char contributions c·ln(c) floored to integer 1e-9 units and
    // summed exactly (DECIMAL(38,0) ≙ oracle HUGEINT) — the E47 KL
    // discipline: a float SUM over the per-doc char frame accumulates
    // in partition order and can flip the 6dp output floor on a
    // 1-ulp seam; the unit floor costs ≤ distinct_chars·1e-9 absolute,
    // orders of magnitude under the 1e-6 output quantum
    counts.groupBy($"doc_id").agg(
        sum($"c").as("n_chars_e"), count(lit(1)).as("n_distinct_chars"),
        sum(floor($"c".cast("double") * log($"c".cast("double"))
          * 1000000000.0 + 0.5).cast("long").cast("decimal(38,0)"))
          .as("slcu"))
      .select($"doc_id", $"n_chars_e", $"n_distinct_chars",
        (floor((log($"n_chars_e".cast("double"))
          - $"slcu".cast("double") / 1000000000.0 / $"n_chars_e")
          / log(lit(2.0)) * 1000000.0 + 0.5).cast("double")
          / 1000000.0).as("entropy_bits"))
      .orderBy($"doc_id")
  }

  /** E17 — BPE training's first merge iteration: corpus-weighted
    * adjacent-character-pair counts. The classic formulation counts
    * pairs per DISTINCT word weighted by word frequency — so the
    * explode runs over the (tiny) vocabulary, not the corpus, and the
    * corpus-sized work is just the word-frequency groupBy. Top pairs
    * via TakeOrderedAndProject (per-partition heaps, no global sort).
    */
  def bpePairStats(spark: SparkSession, dir: String,
                   topK: Int = 20): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val tf = tokens(spark, dir)
      .filter(length($"token") >= 2)
      .groupBy($"token").agg(count(lit(1)).as("f"))
    val top = tf
      .select($"f", explode(transform(
        sequence(lit(1), length($"token") - 1),
        i => concat($"token".substr(i, lit(1)),
          $"token".substr(i + 1, lit(1))))).as("pair"))
      .groupBy($"pair").agg(sum($"f").as("cnt"))
      .orderBy($"cnt".desc, $"pair").limit(topK)
    top.withColumn("rank",
        row_number().over(W.orderBy($"cnt".desc, $"pair")).cast("long"))
      .select($"rank", $"pair", $"cnt")
      .orderBy($"rank")
  }

  /** E18 — corpus-LM surprisal (the ccnet/perplexity-style quality
    * score, with the corpus's own unigram model standing in for the
    * external LM): per-document mean −ln p(token) under the corpus
    * unigram distribution. Rare-token-heavy (gibberish) documents
    * score high, stopword-heavy boilerplate scores low. Two
    * vocabulary-sized aggregates + a BROADCAST term-frequency join —
    * like E8/E11 the corpus token stream never shuffles on token, and
    * the global total is a one-row broadcast, not a driver round-trip.
    */
  /** E24 — Zipf-law fit: least-squares slope of ln(freq) vs ln(rank)
    * over the top-N vocabulary — the classic corpus-health diagnostic
    * (natural language sits near slope −1; templated/synthetic text
    * drifts off). The regression runs on closed-form sums, so DuckDB
    * re-derives it exactly.
    *
    * Scale shape: the vocabulary aggregate is map-side combined; the
    * top-N cut is a TakeOrderedAndProject (per-partition partial
    * top-N, one driver merge — never a global sort), and the rank
    * window spans only those N rows.
    */
  def zipfFit(spark: SparkSession, dir: String, topN: Int = 500): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val tf = tokens(spark, dir)
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
    val top = tf.orderBy($"cnt".desc, $"token").limit(topN)
    // ln(r)/ln(cnt) floor to integer 1e-9 units so the four
    // regression sums are exact integer sums (DECIMAL(38,0) ≙ oracle
    // HUGEINT — partition-order independent, the round-10 anova
    // seam); the unit floor biases each point ≤ 1e-9, orders below
    // the 1e-6 output quantum. Decimal-cast BEFORE the product: the
    // Long×Long unit product wraps past ~3e9 units.
    val pts = top
      .withColumn("r", row_number().over(Window.orderBy($"cnt".desc, $"token")))
      .select(
        floor(log($"r".cast("double")) * 1000000000.0 + 0.5)
          .cast("long").as("xu"),
        floor(log($"cnt".cast("double")) * 1000000000.0 + 0.5)
          .cast("long").as("yu"))
    pts
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"xu".cast("decimal(38,0)")).as("sxu"),
        sum($"yu".cast("decimal(38,0)")).as("syu"),
        sum($"xu".cast("decimal(38,0)") * $"yu").as("sxyu"),
        sum($"xu".cast("decimal(38,0)") * $"xu").as("sxxu"))
      .select($"n",
        ($"sxu".cast("double") / 1.0e9).as("sx"),
        ($"syu".cast("double") / 1.0e9).as("sy"),
        ($"sxyu".cast("double") / 1.0e18).as("sxy"),
        ($"sxxu".cast("double") / 1.0e18).as("sxx"))
      .withColumn("slope_raw",
        ($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx"))
      .select($"n".cast("long").as("n_points"),
        (floor($"slope_raw" * 1000000.0 + 0.5) / 1000000.0).as("slope"),
        (floor(($"sy" - $"slope_raw" * $"sx") / $"n" * 1000000.0 + 0.5)
          / 1000000.0).as("intercept"))
  }

  /** E31 — Heaps-law fit: least-squares slope of ln(distinct tokens)
    * vs ln(total tokens) across documents — the vocabulary-growth
    * exponent (natural text ≈ 0.4–0.7; templated/duplicated corpora
    * drift low because longer samples stop contributing new types,
    * synthetic token soups drift toward 1). The corpus-health
    * companion to E24's Zipf slope: Zipf reads the frequency profile,
    * Heaps reads the growth profile, and the two exponents are
    * theoretically linked (β ≈ 1/α) — a corpus where they disagree
    * badly was probably assembled from mismatched sources.
    *
    * Scale shape: per-doc (total, distinct) counts are one scan-side
    * aggregate (doc_id-keyed, partial-agg); the regression sums are
    * ONE map-side-combined global aggregate of five doubles —
    * constant-size state at any corpus size, same shape as E24.
    * Closed form end to end → full oracle at 6dp floor parity.
    */
  def heapsFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // same integer-unit regression sums as zipfFit (1e-9 units,
    // DECIMAL(38,0) ≙ HUGEINT): exact at any corpus size AND
    // partition-order independent — this frame is corpus-sized, so an
    // ordered fold would NOT scale but integer sums map-side combine
    val pts = Tables.load(spark, dir, "documents")
      .withColumn("toks", filter(split($"text", " "), t => t =!= ""))
      .filter(size($"toks") >= 1)
      .select(
        floor(log(size($"toks").cast("double")) * 1000000000.0 + 0.5)
          .cast("long").as("xu"),
        floor(log(size(array_distinct($"toks")).cast("double"))
          * 1000000000.0 + 0.5).cast("long").as("yu"))
    pts
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"xu".cast("decimal(38,0)")).as("sxu"),
        sum($"yu".cast("decimal(38,0)")).as("syu"),
        sum($"xu".cast("decimal(38,0)") * $"yu").as("sxyu"),
        sum($"xu".cast("decimal(38,0)") * $"xu").as("sxxu"))
      .select($"n",
        ($"sxu".cast("double") / 1.0e9).as("sx"),
        ($"syu".cast("double") / 1.0e9).as("sy"),
        ($"sxyu".cast("double") / 1.0e18).as("sxy"),
        ($"sxxu".cast("double") / 1.0e18).as("sxx"))
      .withColumn("slope_raw",
        ($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx"))
      .select($"n".cast("long").as("n_docs"),
        (floor($"slope_raw" * 1000000.0 + 0.5) / 1000000.0).as("beta"),
        (floor(($"sy" - $"slope_raw" * $"sx") / $"n" * 1000000.0 + 0.5)
          / 1000000.0).as("intercept"))
  }

  /** E23 — interpolated BIGRAM surprisal (Jelinek–Mercer smoothing,
    * λ·p(w₂|w₁) + (1−λ)·p(w₂)): the next-token-predictability upgrade
    * over E18's unigram surprisal — repeated formulaic text scores low,
    * genuinely novel word sequences score high, which is the perplexity
    * signal quality filters actually use. Probabilities are exact
    * count ratios (corpus-derived, no training), so DuckDB re-derives
    * them and the 6dp floor-rounded mean matches.
    *
    * Scale shape: unigram/bigram-start/bigram-pair counts are three
    * map-side-combined aggregates (vocab / vocab²-bounded results);
    * the scoring join is bigram-keyed (AQE broadcasts it when the
    * vocabulary is small); per-doc means partial-aggregate. The corpus
    * is never collected.
    */
  def bigramSurprisal(spark: SparkSession, dir: String,
                      lambda: Double = 0.7): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        filter(split($"text", " "), t => t =!= "").as("t"))
      .filter(size($"t") >= 2)
    val uni = docs.select(explode($"t").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("cw"))
    val uniTotal = uni.agg(sum($"cw").as("tw"))
    val bgr = docs.select($"doc_id", explode(transform(
        sequence(lit(0), size($"t") - 2),
        i => struct(element_at($"t", i + 1).as("w1"),
          element_at($"t", i + 2).as("w2")))).as("b"))
      .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
    val first = bgr.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val pair = bgr.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val probs = pair
      .join(first, "w1")
      .join(uni.withColumnRenamed("w", "w2"), "w2")
      .crossJoin(broadcast(uniTotal))
      // per-pair log-prob floors ONCE (bigram-type-sized frame) to
      // integer 1e-9 units; the per-doc mean is an exact integer sum
      // / count — a float avg() accumulates in partition order
      // (round-10 anova seam)
      .select($"w1", $"w2",
        floor(log(lit(lambda) * ($"c12".cast("double") / $"c1") +
          (lit(1.0) - lit(lambda)) * ($"cw".cast("double") / $"tw"))
          * 1000000000.0 + 0.5).cast("long").as("lpu"))
    bgr.join(probs, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"lpu".cast("decimal(38,0)")).as("slpu"))
      .select($"doc_id", $"n_bigrams",
        (floor(-($"slpu".cast("double") / 1000000000.0 / $"n_bigrams")
          * 1000000.0 + 0.5).cast("double") / 1000000.0)
          .as("avg_surprisal"))
      .orderBy($"doc_id")
  }

  /** E25 — interpolated Kneser–Ney bigram surprisal (absolute
    * discount D, continuation-probability backoff): the standard LM
    * smoothing — where E23's Jelinek–Mercer backs off to raw unigram
    * frequency, KN backs off to how many CONTEXTS a word completes
    * (N1+(•w)/|bigram types|), which is what separates frequent-but-
    * bound words from genuinely productive ones. Exact count ratios
    * (no iterative training) → full oracle.
    *
    * Scale shape: same as E23 — map-side-combined count aggregates
    * (vocab/vocab²-bounded), probability table joined back on the
    * bigram key; the corpus stream tokenizes once per stage, never
    * shuffles whole docs.
    */
  def knBigram(spark: SparkSession, dir: String,
               discount: Double = 0.75): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        filter(split($"text", " "), t => t =!= "").as("t"))
      .filter(size($"t") >= 2)
    val bgr = docs.select($"doc_id", explode(transform(
        sequence(lit(0), size($"t") - 2),
        i => struct(element_at($"t", i + 1).as("w1"),
          element_at($"t", i + 2).as("w2")))).as("b"))
      .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
    // c(w1 •) and N1+(w1 •): total and distinct continuations of w1
    val first = bgr.groupBy($"w1")
      .agg(count(lit(1)).as("c1"), countDistinct($"w2").as("n1f"))
    val types = bgr.select($"w1", $"w2").distinct()
    // N1+(• w2): distinct contexts w2 completes; bt = |bigram types|
    val contexts = types.groupBy($"w2").agg(count(lit(1)).as("n1p"))
    val btypes = types.agg(count(lit(1)).as("bt"))
    val pair = bgr.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val probs = pair
      .join(first, "w1")
      .join(contexts, "w2")
      .crossJoin(broadcast(btypes))
      // integer 1e-9-unit log-probs (see bigramSurprisal): the
      // per-doc mean becomes an exact integer sum / count
      .select($"w1", $"w2",
        floor(log(greatest($"c12".cast("double") - discount, lit(0.0))
          / $"c1" + lit(discount) / $"c1" * $"n1f" *
            ($"n1p".cast("double") / $"bt"))
          * 1000000000.0 + 0.5).cast("long").as("lpu"))
    bgr.join(probs, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"lpu".cast("decimal(38,0)")).as("slpu"))
      .select($"doc_id", $"n_bigrams",
        (floor(-($"slpu".cast("double") / 1000000000.0 / $"n_bigrams")
          * 1000000.0 + 0.5).cast("double") / 1000000.0)
          .as("avg_kn_surprisal"))
      .orderBy($"doc_id")
  }

  /** E26 — moving-average type-token ratio (MATTR, window w): the
    * standard lexical-diversity metric that, unlike plain TTR, does
    * not shrink with document length. Computed WITHOUT materializing
    * windows: a token at position p is distinct in window start s iff
    * its previous occurrence sits before s, so its contribution is a
    * closed-form count of valid starts — one lag over (doc, token)
    * occurrence lists replaces the O(n·w) slide. Docs shorter than w
    * fall back to plain TTR.
    *
    * Scale shape: one (doc_id, token)-keyed window pass + one doc
    * rollup, both corpus-linear; integer arithmetic end-to-end until
    * the final division, so both engines agree bit-for-bit.
    */
  def mattr(spark: SparkSession, dir: String, w: Int = 25): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        filter(split($"text", " "), t => t =!= "").as("t"))
      .filter(size($"t") >= 1)
    val pos = docs
      .select($"doc_id", size($"t").as("n"),
        posexplode($"t").as(Seq("p0", "token")))
      .withColumn("p", $"p0" + 1)
    val byTok = W.partitionBy($"doc_id", $"token").orderBy($"p")
    val contrib = pos
      .withColumn("prev", coalesce(lag($"p", 1).over(byTok), lit(0)))
      .withColumn("lo",
        greatest($"prev" + 1, $"p" - lit(w - 1), lit(1)))
      .withColumn("hi", least($"p", $"n" - lit(w - 1)))
      .withColumn("c", greatest($"hi" - $"lo" + 1, lit(0)))
    contrib.groupBy($"doc_id")
      .agg(max($"n").as("n_tok"), countDistinct($"token").as("n_uniq"),
        sum($"c").as("sc"))
      .withColumn("mattr",
        floor(when($"n_tok" >= w,
            $"sc".cast("double") / (($"n_tok" - lit(w - 1)) * lit(w)))
          .otherwise($"n_uniq".cast("double") / $"n_tok")
          * 1000000.0 + 0.5).cast("double") / 1000000.0)
      .select($"doc_id", $"n_tok".cast("long").as("n_tok"),
        $"n_uniq", $"mattr")
      .orderBy($"doc_id")
  }

  /** E27 — token burstiness (index of dispersion): for the top-N
    * corpus tokens, the variance-to-mean ratio of the per-document
    * count — content words cluster (dispersion ≫ 1), function words
    * spread evenly (≈ uniform). The zero-count documents enter the
    * moments in closed form (mean = Σc/D, E[x²] = Σc²/D), so the
    * doc×token grid is never densified.
    *
    * Scale shape: two map-side-combined aggregates — (token, doc)
    * then token — a TakeOrderedAndProject top-N cut, and a one-row
    * broadcast for the corpus doc count.
    */
  def burstiness(spark: SparkSession, dir: String,
                 topN: Int = 50): DataFrame = {
    import spark.implicits._
    val nDocs = Tables.load(spark, dir, "documents")
      .agg(count(lit(1)).as("nd"))
    val perDoc = tokens(spark, dir)
      .groupBy($"token", $"doc_id").agg(count(lit(1)).as("c"))
    // decimal-cast before the c·c product (Long wrap at scale; ≙ the
    // oracle's HUGEINT product)
    val stats = perDoc.groupBy($"token")
      .agg(sum($"c").as("cnt"),
        sum($"c".cast("decimal(38,0)") * $"c").as("ss"),
        count(lit(1)).as("df"))
    stats.orderBy($"cnt".desc, $"token").limit(topN)
      .crossJoin(broadcast(nDocs))
      .withColumn("mean", $"cnt".cast("double") / $"nd")
      .withColumn("disp",
        ($"ss".cast("double") / $"nd" - $"mean" * $"mean") / $"mean")
      .select($"token", $"cnt", $"df",
        (floor($"mean" * 1000000.0 + 0.5).cast("double") / 1000000.0)
          .as("mean_per_doc"),
        (floor($"disp" * 1000000.0 + 0.5).cast("double") / 1000000.0)
          .as("dispersion"))
      .orderBy($"cnt".desc, $"token")
  }

  /** E28 — Flesch reading ease with a deterministic vowel-run syllable
    * estimate (greatest(#[aeiouy]+ runs, 1) per token): the classic
    * grade-level readability signal quality filters stack next to the
    * statistical ones (E2/E18/E23) — formulaic short-sentence text
    * scores high, dense long-clause text scores low. Sentences are
    * non-blank `[.!?]+` segments (min 1); every count is a closed-form
    * expression on both engines, so the 4-dp floor-rounded score is a
    * full oracle.
    *
    * Scale shape: pure scan-side projection — no shuffle, no UDF; the
    * per-token lambdas are Catalyst higher-order functions over the
    * already-split array.
    */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("toks", filter(split(lower($"text"), " "), t => t =!= ""))
      .filter(size($"toks") > 0)
      .withColumn("n_words", size($"toks").cast("double"))
      .withColumn("n_sents",
        greatest(size(filter(split($"text", "[.!?]+"),
          s => trim(s) =!= "")), lit(1)).cast("double"))
      .withColumn("n_syll",
        aggregate($"toks", lit(0L), (acc, t) =>
          acc + greatest(regexp_count(t, lit("[aeiouy]+")), lit(1))
            .cast("long")).cast("double"))
      .select($"doc_id",
        $"n_words".cast("long").as("n_words"),
        $"n_sents".cast("long").as("n_sentences"),
        $"n_syll".cast("long").as("n_syllables"),
        roundP(lit(206.835) - lit(1.015) * ($"n_words" / $"n_sents")
          - lit(84.6) * ($"n_syll" / $"n_words")).as("flesch"))
      .orderBy($"doc_id")
  }

  def unigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = tokens(spark, dir)
    val tf = tok.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val total = tf.agg(sum($"cnt").as("total"))
    // per-token log-probs floor ONCE (vocab-sized frame) to integer
    // 1e-9 units; the per-doc mean is then an exact integer sum /
    // count — a float avg() accumulates in partition order and can
    // flip the 6dp floor on a 1-ulp seam (round-10 anova lesson)
    val logp = tf.crossJoin(broadcast(total))
      .select($"token",
        floor(log($"cnt".cast("double") / $"total".cast("double"))
          * 1000000000.0 + 0.5).cast("long").as("lpu"))
    tok.join(logp, "token")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum($"lpu".cast("decimal(38,0)")).as("slpu"))
      .select($"doc_id", $"n_tok",
        (floor(-($"slpu".cast("double") / 1000000000.0 / $"n_tok")
          * 1000000.0 + 0.5).cast("double") / 1000000.0)
          .as("avg_surprisal"))
      .orderBy($"doc_id")
  }

  /** CMS parameters (E19): d hash rows × w counters, w a power of two
    * so `pmod(signed hash, w)` equals the unsigned value mod w in both
    * engines (w divides 2^64).
    */
  val CmsDepth = 4
  val CmsWidth = 256
  val CmsSeed = 0x5EEDC0DEL

  /** E19 — count-min-sketch heavy hitters: the constant-memory
    * frequency sketch (d×w counter grid, estimate = min over rows of
    * the hashed counter) that replaces a full vocabulary aggregate
    * when only heavy hitters matter at 100 TB. Counters partial-
    * aggregate into d·w = 1024 cells and BROADCAST; here the exact
    * top-k rides along so the output exposes estimate vs truth (the
    * sketch may only overestimate — spec-asserted). Hash rows reuse
    * the minhash family (fnv1a → xor row key → splitmix64), so the
    * DuckDB oracle re-derives the grid bit-exactly in HUGEINT SQL.
    */
  /** The d bucket indices of a token, one per sketch row — shared by
    * the batch sketch (E19) and its streaming twin (G8).
    */
  private[graft] def cmsBuckets(c: Column): Column = {
    import graft.functions.hash64
    val keys = (0 until CmsDepth).map(r =>
      CmsSeed + r * graft.expressions.Hash64.Golden)
    array(keys.map(k => pmod(hash64(c, k), lit(CmsWidth.toLong))): _*)
  }

  def cmsHeavyHitters(spark: SparkSession, dir: String,
                      topK: Int = 10): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    def buckets(c: Column) = cmsBuckets(c)
    val tf = tokens(spark, dir)
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
    val counters = tf
      .select($"cnt", posexplode(buckets($"token")).as(Seq("r", "bucket")))
      .groupBy($"r", $"bucket").agg(sum($"cnt").as("c"))
    val top = tf.orderBy($"cnt".desc, $"token").limit(topK)
    top.select($"token", $"cnt",
        posexplode(buckets($"token")).as(Seq("r", "bucket")))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy($"token", $"cnt").agg(min($"c").as("est_cnt"))
      .withColumn("rank",
        row_number().over(W.orderBy($"cnt".desc, $"token")).cast("long"))
      .select($"rank", $"token", $"cnt".as("exact_cnt"), $"est_cnt")
      .orderBy($"rank")
  }

  /** E45 — Misra–Gries heavy hitters with exact verification: per
    * source, every token with frequency > N_src/k (k = 32). E19's CMS
    * answers point queries against a top list that still needs the
    * full-vocabulary aggregate to FIND; this finds the heavy set
    * itself with constant memory. Pass 1 folds each source's token
    * stream into a ≤(k−1)-counter [[graft.expressions.MisraGries]]
    * summary (a mergeable Aggregator, so it partial-aggregates
    * map-side like any sketch). The summary is only a CANDIDATE set —
    * retained weights undercount by ≤ N/k and are partition-order-
    * dependent — so pass 2 re-counts the candidates exactly
    * (broadcast semi-join, sources × ≤(k−1) tokens) and keeps
    * n·k > N. Because the summary provably retains every true heavy
    * hitter, candidates ⊇ truth and the exact filter makes the output
    * EXACTLY the true heavy-hitter set — order-independent and
    * hash-matchable against a plain GROUP BY/HAVING oracle. At
    * 100 TB: two corpus-linear passes with k-bounded per-group state,
    * where the naive approach shuffles the full vocabulary.
    */
  def heavyTokens(spark: SparkSession, dir: String,
                  k: Int = 32): DataFrame = {
    import spark.implicits._
    val tk = Tables.load(spark, dir, "documents")
      .select($"source", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    val mg = udaf(graft.expressions.MisraGries(k))
    val cand = tk.groupBy($"source").agg(mg($"token").as("cands"))
      .select($"source", explode($"cands").as("token"))
    val totals = tk.groupBy($"source").agg(count(lit(1)).as("n_tokens"))
    tk.join(broadcast(cand), Seq("source", "token"))
      .groupBy($"source", $"token").agg(count(lit(1)).as("n"))
      .join(broadcast(totals), "source")
      .filter($"n" * k > $"n_tokens")
      .select($"source", $"token", $"n", $"n_tokens",
        (floor($"n".cast("double") / $"n_tokens" * 1000000.0 + 0.5)
          / 1000000.0).as("share"))
      .orderBy($"source", $"token")
  }

  /** E47 — per-source unigram KL divergence vs the REST of the corpus:
    * the token-distribution shift measure completing the divergence
    * kit (E43 KS compares length laws, B68 PSI compares value bins —
    * this compares WHAT IS SAID; a source that KL-spikes against the
    * rest is templated, off-domain, or contaminated, and mixture
    * weights built on it mislead). Add-half smoothing over the UNION
    * vocabulary keeps every term defined; per-term contributions
    * p·ln(p/q) are floored to integer 1e-12 units and summed as LONGS
    * — the associative-sum discipline that makes a vocab-sized float
    * reduction partition-order-exact and DuckDB-replayable.
    *
    * Scale shape: one (source, token) count pass; the grid is the
    * vocab×sources cross join (vocabulary-bounded, zero-filled cells
    * included — absent terms still contribute mass); rollup is a
    * sources-sized partial agg. Nothing pairwise in sources, nothing
    * corpus-sized after the first pass.
    */
  def klDivergence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables.load(spark, dir, "documents")
      .select($"source", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
    val vocab = cnt.groupBy($"token").agg(sum($"c").as("c_all"))
    val srcs = cnt.groupBy($"source").agg(sum($"c").as("n_s"))
    val tot = srcs.agg(sum($"n_s").as("n_tot"),
      count(lit(1)).as("n_sources"))
    val vSize = vocab.count().toDouble
    val grid = vocab.crossJoin(broadcast(srcs))
      .join(cnt, Seq("source", "token"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
    val p = ($"c" + lit(0.5)) / ($"n_s" + lit(0.5) * vSize)
    val q = ($"c_all" - $"c" + lit(0.5)) /
      ($"n_tot" - $"n_s" + lit(0.5) * vSize)
    grid
      .select($"source", $"n_s",
        floor(p * log(p / q) * 1e12 + 0.5).cast("long").as("contrib12"))
      .groupBy($"source")
      .agg(max($"n_s").as("n_tokens"),
        (floor(sum($"contrib12").cast("double") / 1e6 + 0.5) / 1e6)
          .as("kl_vs_rest"))
      .orderBy($"source")
  }

  /** Tokens containing U+0001/U+0002 are excluded from the BPE
    * universe on BOTH engines: the DuckDB replay encodes symbol
    * boundaries with those two code points, so a token carrying one
    * would silently mis-parse there while the engine's array
    * representation handled it — a hash seam. A symmetric filter (one
    * predicate here, one LIKE pair in the replay's btok/bvoc) turns
    * the replay's silent assumption into a shared contract; no
    * natural-text corpus contains the C0 controls it excludes.
    */
  private def bpeMarkerToken(c: Column): Column =
    c.contains("\u0001") || c.contains("\u0002")

  /** E20 — BPE merge training loop (the iterative extension of E17's
    * single pair count): k greedy merge steps over the corpus-weighted
    * vocabulary. Each step counts adjacent symbol pairs across the
    * (tiny) distinct-word table weighted by word frequency, picks the
    * argmax via TakeOrderedAndProject, and rewrites the symbol arrays
    * with a left-to-right merge pass. The corpus-sized work is the ONE
    * word-frequency aggregate up front; every iteration after that is
    * vocabulary-sized, with `localCheckpoint` truncating the grown
    * lineage per step (the same cure as the connected-components
    * loop). Driver involvement per step is a single 1-row argmax —
    * the standard structure of a distributed training loop.
    */
  def bpeMerges(spark: SparkSession, dir: String,
                steps: Int = 6): DataFrame = {
    import spark.implicits._
    var words = tokens(spark, dir)
      .filter(length($"token") >= 2 && !bpeMarkerToken($"token"))
      .groupBy($"token").agg(count(lit(1)).as("f"))
      .select($"f", split($"token", "").as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to steps) {
      val best = words.filter(size($"syms") >= 2)
        .select($"f", explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"f").as("cnt"))
        .orderBy($"cnt".desc, $"a", $"b").limit(1)
        .collect()
      if (best.nonEmpty) {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((step.toLong, a, b, cnt))
        words = words
          .withColumn("syms",
            graft.functions.bpe_merge_step($"syms", lit(a), lit(b)))
          .localCheckpoint()
      }
    }
    merges.result()
      .toDF("step", "left_sym", "right_sym", "pair_count")
      .orderBy($"step")
  }

  /** E21 — BPE ENCODE: apply the E20-trained merge sequence
    * corpus-wide and report per-document BPE token counts next to
    * whitespace counts — the number that actually prices a document
    * into a token budget (H8) once a real tokenizer exists. Encoding
    * runs ONCE PER DISTINCT WORD (the E17/E20 vocabulary trick: the
    * corpus token stream never re-tokenizes), and the encoded
    * vocabulary broadcast-joins back to the doc stream, whose only
    * shuffle stays doc_id-keyed. Per-word merge application is the
    * codegen'd [[graft.expressions.BpeEncodedLength]] expression over
    * the vocabulary (r13; was a Scala UDF — the trained merge list
    * embeds as a codegen reference object, so the encode stays inside
    * whole-stage codegen).
    * Merge order replays training order; rows-only + ≡-reference
    * spec, like E20 (the merge list is data-derived, so no SQL
    * oracle can re-state it declaratively).
    */
  def bpeEncode(spark: SparkSession, dir: String,
                steps: Int = 6): DataFrame = {
    import spark.implicits._
    val merges = bpeMerges(spark, dir, steps).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val vocab = tokens(spark, dir).select($"token").distinct()
      .filter(!bpeMarkerToken($"token"))
      .select($"token",
        graft.functions.bpe_encoded_length($"token", merges).as("n_bpe"))
    tokens(spark, dir)
      .join(vocab, "token")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_ws_tokens"),
        sum($"n_bpe").cast("long").as("n_bpe_tokens"))
      .withColumn("compression",
        floor($"n_bpe_tokens" * 1000000.0 / $"n_ws_tokens" + 0.5) / 1000000.0)
      .orderBy($"doc_id")
  }

  /** E42 — tokenizer fertility report: per language, BPE tokens per
    * whitespace word (fertility) and characters per BPE token — THE
    * multilingual tokenizer-equity numbers (a language with 2× the
    * fertility pays 2× the sequence length for the same text, i.e.
    * half the effective context and twice the compute; the metric
    * motivating α-temperature mixing, H10). Rolls up E21's per-doc
    * encoding, so the driver check is rows-only like E21 (the merge
    * table is iterative) — the spec ties totals to E21 exactly.
    *
    * Scale shape: inherits E21's once-per-distinct-word encoding (the
    * vocab-sized UDF is the only non-relational step); the rollup is
    * a langs-sized partial aggregation over the per-doc frame.
    */
  def tokenizerFertility(spark: SparkSession, dir: String,
                         steps: Int = 6): DataFrame = {
    import spark.implicits._
    val meta = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", length($"text").cast("long").as("nc"))
    bpeEncode(spark, dir, steps)
      .join(meta, "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_ws_tokens").as("n_words"),
        sum($"n_bpe_tokens").as("n_bpe_tokens"),
        sum($"nc").as("n_chars"))
      .select($"lang", $"n_docs", $"n_words", $"n_bpe_tokens",
        (floor($"n_bpe_tokens" * 1000000.0 / $"n_words" + 0.5) / 1000000.0)
          .as("fertility"),
        (floor($"n_chars" * 1000000.0 / $"n_bpe_tokens" + 0.5) / 1000000.0)
          .as("chars_per_token"))
      .orderBy($"lang")
  }

  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpPat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val PhonePat = "\\+[0-9][0-9\\-]{5,14}[0-9]"

  /** E16 — PII scrub: regex redaction of emails / IPv4s / phone
    * numbers (applied in that order — the IP pass must run before the
    * phone pass or dotted quads match the phone shape). The synthetic
    * corpus carries no natural PII, so the op deterministically
    * injects one of each (derived from doc_id) before scrubbing —
    * the same injection happens in the oracle, and the md5 of the
    * scrubbed body proves byte-exact redaction. Pure per-row codegen'd
    * string work: no shuffle at any scale.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("aug", concat($"text",
        lit(" contact user"), $"doc_id".cast("string"),
        lit("@example.com or call +1-555-"),
        lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
        lit(" from 10."), ($"doc_id" % 256).cast("string"), lit(".0.1")))
      .withColumn("n_emails",
        size(regexp_extract_all($"aug", lit(EmailPat), lit(0))).cast("long"))
      .withColumn("r1", regexp_replace($"aug", EmailPat, "<EMAIL>"))
      .withColumn("n_ips",
        size(regexp_extract_all($"r1", lit(IpPat), lit(0))).cast("long"))
      .withColumn("r2", regexp_replace($"r1", IpPat, "<IP>"))
      .withColumn("n_phones",
        size(regexp_extract_all($"r2", lit(PhonePat), lit(0))).cast("long"))
      .withColumn("r3", regexp_replace($"r2", PhonePat, "<PHONE>"))
      .select($"doc_id", $"n_emails", $"n_ips", $"n_phones",
        length($"r3").cast("long").as("scrubbed_len"),
        md5($"r3").as("scrubbed_hash"))
      .orderBy($"doc_id")
  }

  /** E30 — BM25 retrieval scoring (Okapi, k1=1.2 b=0.75) of the corpus
    * against a fixed query-term set — the relevance-filtering shape a
    * targeted-crawl pipeline runs ("keep pages that look like X").
    * idf = ln(1 + (N−df+0.5)/(df+0.5)); per-term scores sum per doc;
    * top-n by 6-dp-rounded score (doc_id tiebreak) so ranking is
    * engine-portable.
    *
    * Scale shape: term stats for the |Q|-sized query vocabulary are a
    * broadcast; the corpus contributes one tokenize+filter scan and a
    * doc_id-keyed partial-agg sum; the final cut is a distributed
    * top-n (TakeOrdered), never a global sort.
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25QueryTerms: Seq[String] = Seq("hash", "join", "vector", "spark")

  /** E30's offline artifacts — corpus size, average doc length, and the
    * per-query-term idf frame — shared with the G17 streaming twin
    * (the "train offline, score online" split).
    */
  private[graft] def bm25Artifacts(spark: SparkSession, dir: String)
      : (Double, Double, DataFrame) = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val nAvg = docs
      .agg(count(lit(1)).cast("double").as("n"),
        avg(size(filter(split($"text", " "), t => t =!= ""))).as("avgdl"))
      .collect()(0)
    val n = nAvg.getDouble(0)
    // empty corpus: avg is null; 1.0 keeps the idf/score expressions
    // well-defined — every downstream row joins against the empty
    // token frame anyway
    val avgdl = if (nAvg.isNullAt(1)) 1.0 else nAvg.getDouble(1)
    val df = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term".isin(Bm25QueryTerms: _*))
      .select($"doc_id", $"term").distinct()
      .groupBy($"term").agg(count(lit(1)).cast("double").as("df"))
      .withColumn("idf", log(lit(1.0) + (lit(n) - $"df" + 0.5) / ($"df" + 0.5)))
      .select($"term", $"idf")
    (n, avgdl, df)
  }

  def bm25(spark: SparkSession, dir: String, topN: Int = 50): DataFrame = {
    import spark.implicits._
    val k1 = Bm25K1
    val b = Bm25B
    val (_, avgdl, df) = bm25Artifacts(spark, dir)
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(filter(split($"text", " "), t => t =!= "")).cast("double")
          .as("dl"),
        explode(split($"text", " ")).as("term"))
      .filter($"term".isin(Bm25QueryTerms: _*))
    val tf = toks.groupBy($"doc_id", $"dl", $"term")
      .agg(count(lit(1)).cast("double").as("tf"))
    // the per-doc score folds over the (≤ |query| terms) frame in
    // SORTED term order — engine-deterministic; a plain float SUM
    // accumulates in partition order and can flip the 6dp floor on a
    // 1-ulp seam (the oracle replays the identical ordered fold)
    tf.join(broadcast(df), "term")
      .withColumn("s",
        $"idf" * $"tf" * (k1 + 1.0) /
          ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / avgdl)))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"term", $"s"))).as("ts"),
        count(lit(1)).as("n_terms"))
      .select($"doc_id",
        (floor(aggregate($"ts", lit(0.0),
          (a, x) => a + x.getField("s")) * 1000000.0 + 0.5)
          .cast("double") / 1000000.0).as("bm25"),
        $"n_terms")
      .orderBy($"bm25".desc, $"doc_id")
      .limit(topN)
      .orderBy($"doc_id")
  }

  /** E32 — vocabulary coverage curve: how many distinct terms (in
    * frequency rank order) cover 50/75/90/99% of all token
    * occurrences — the Zipf-tail summary that sizes a tokenizer
    * vocabulary. The global frequency rank and running coverage are
    * computed WITHOUT a single-partition sort via H7's bucketed-offset
    * trick: decimal-digit-count buckets split the count space into
    * ordered ranges (integer-exact on any engine, unlike
    * floor(log2(c))), per-bucket row_number/running-sum plus broadcast
    * offsets are the global order. At a 100M-term vocabulary the
    * per-bucket windows stay distributed; only the ~10-row offset
    * frame is global.
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "")
      .groupBy($"t").agg(count(lit(1)).as("c"))
      .withColumn("bkt", length($"c".cast("string")))
    val off = W.orderBy($"bkt".desc)
      .rowsBetween(W.unboundedPreceding, -1)
    val offsets = vocab.groupBy($"bkt")
      .agg(count(lit(1)).as("bcnt"), sum($"c").as("btok"))
      .withColumn("rank_off", coalesce(sum($"bcnt").over(off), lit(0L)))
      .withColumn("cum_off", coalesce(sum($"btok").over(off), lit(0L)))
      .select($"bkt", $"rank_off", $"cum_off")
    val w = W.partitionBy($"bkt").orderBy($"c".desc, $"t")
    val ranked = vocab.join(broadcast(offsets), "bkt")
      .withColumn("rank", row_number().over(w).cast("long") + $"rank_off")
      .withColumn("cum",
        sum($"c").over(w.rowsBetween(W.unboundedPreceding, 0)) + $"cum_off")
    val total = broadcast(ranked.agg(max($"cum").as("total")))
    val th = broadcast(
      Seq(0.5, 0.75, 0.9, 0.99).toDF("threshold"))
    ranked.crossJoin(total).crossJoin(th)
      .filter($"cum" >= $"threshold" * $"total")
      .groupBy($"threshold")
      .agg(min($"rank").as("n_terms"),
        min_by($"cum", $"rank").as("covered_tokens"),
        max($"total").as("total_tokens"))
      .orderBy($"threshold")
  }

  /** E48 — hapax-legomena vocabulary profile per source: vocabulary
    * size, hapax (count-1) and dis (count-2) type counts, the hapax
    * share of the vocabulary, and the type–token ratio. The Zipf
    * TAIL health check next to E24's slope (which reads the head): a
    * natural corpus keeps a fat hapax share (~40–60%); templated or
    * aggressively-deduplicated text collapses it, OCR junk and
    * tokenizer damage inflate it — either way the vocabulary a BPE
    * trainer sees is distorted before any model runs. Everything is
    * exact integer counts from ONE (source, token) partial agg; two
    * divisions at the sources-sized rollup, 6dp.
    */
  def hapaxProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables.load(spark, dir, "documents")
      .select($"source", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"source", $"token")
      .agg(count(lit(1)).as("n"))
    cnt.groupBy($"source")
      .agg(sum($"n").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when($"n" === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when($"n" === 2, 1L).otherwise(0L)).as("dis"))
      .select($"source", $"n_tokens", $"vocab", $"hapax", $"dis",
        (floor($"hapax".cast("double") / $"vocab" * 1000000.0 + 0.5)
          / 1000000.0).as("hapax_share"),
        (floor($"vocab".cast("double") / $"n_tokens" * 1000000.0 + 0.5)
          / 1000000.0).as("type_token_ratio"))
      .orderBy($"source")
  }

  /** E49 — character-class mix per source: shares of lowercase
    * letters / digits / spaces / other, plus an encoding-junk flag
    * (other-share > 5%) — the first-five-minutes encoding triage on a
    * new source (mojibake, control bytes, and markup all land in
    * `other` long before any tokenizer runs; E15's entropy says
    * "something is off", this says WHAT). Class counts are exact
    * integer lengths of regexp-stripped text (one scan-side
    * projection, no explode), rolled up per source; shares are one
    * division each at the sources-sized frame, 6dp.
    */
  def charClassProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.load(spark, dir, "documents")
      .select($"source", length($"text").cast("long").as("total"),
        length(regexp_replace($"text", "[^a-z]", "")).cast("long")
          .as("letters"),
        length(regexp_replace($"text", "[^0-9]", "")).cast("long")
          .as("digits"),
        length(regexp_replace($"text", "[^ ]", "")).cast("long")
          .as("spaces"))
    per.groupBy($"source")
      .agg(sum($"total").as("n_chars"), sum($"letters").as("letters"),
        sum($"digits").as("digits"), sum($"spaces").as("spaces"))
      .withColumn("other",
        $"n_chars" - $"letters" - $"digits" - $"spaces")
      .select($"source", $"n_chars", $"letters", $"digits", $"spaces",
        $"other",
        (floor($"letters".cast("double") / $"n_chars" * 1000000.0
          + 0.5) / 1000000.0).as("letter_share"),
        (floor($"other".cast("double") / $"n_chars" * 1000000.0 + 0.5)
          / 1000000.0).as("other_share"),
        ($"other".cast("double") * 20.0 > $"n_chars".cast("double"))
          .as("junk_flag"))
      .filter($"n_chars" > 0)
      .orderBy($"source")
  }

  /** E50 — windowed (skip-gram) PMI collocations: token pairs scored
    * by PMI over a forward context window of w tokens — the word2vec/
    * SGNS co-occurrence statistic (E33's adjacent-bigram PMI finds
    * fixed phrases; the window finds ASSOCIATES that need not touch —
    * "query … optimizer", "train … checkpoint"). One posexplode +
    * slice turns each token into ≤w forward pairs (corpus×w rows,
    * linear — never a per-doc self-join); pair and unigram counts are
    * exact partial-agg integers; PMI is one shared double chain, 4dp.
    * The unigram joins are vocabulary-keyed and deliberately carry NO
    * broadcast hint (Heaps' law: vocabulary grows with the corpus —
    * AQE decides from runtime stats).
    */
  def windowPmi(spark: SparkSession, dir: String, window: Int = 4,
                minCount: Int = 5, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 2)
    val pairs = toks
      .select($"toks", posexplode($"toks"))
      .select($"col".as("a"),
        explode(slice($"toks", $"pos" + 2, lit(window))).as("b"))
    val cp = pairs.groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
    val uni = toks.select(explode($"toks").as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum($"c").cast("double").as("n_uni"))
      .crossJoin(cp.agg(sum($"cab").cast("double").as("n_pair")))
    cp.filter($"cab" >= minCount)
      .join(uni.select($"t".as("a"), $"c".as("ca")), "a")
      .join(uni.select($"t".as("b"), $"c".as("cb")), "b")
      .crossJoin(broadcast(tot))
      .select(concat_ws(" ", $"a", $"b").as("pair"),
        $"cab".as("support"),
        roundP(log(($"cab".cast("double") / $"n_pair") /
          (($"ca".cast("double") / $"n_uni") *
            ($"cb".cast("double") / $"n_uni")))).as("pmi"))
      .orderBy($"pmi".desc, $"pair")
      .limit(topK)
  }

  /** E51 — bigram conditional entropy H(w₂|w₁) per source: how
    * predictable is the next token given the current one — THE
    * redundancy-rate number that separates templated/boilerplate
    * sources (low H: the next token is nearly determined) from
    * genuinely diverse prose, one level up from E15's character
    * entropy and the corpus-health complement of E23's per-doc
    * surprisal. H(w₂|w₁) = H(bigrams) − H(first tokens) =
    * (Σc_a·ln c_a − Σc_ab·ln c_ab)/N, so both corpus-scale ln-sums
    * ride the E47 integer-unit discipline (floored 1e-9 units in
    * DECIMAL(38,0) ≙ HUGEINT — order-exact, map-side combinable);
    * the bits conversion is one shared double chain at the
    * sources-sized rollup, 6dp.
    */
  def bigramEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.load(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 2)
      .select($"source", explode(transform(
        sequence(lit(1), size($"toks") - 1),
        i => struct(element_at($"toks", i).as("a"),
          element_at($"toks", i + 1).as("b")))).as("g"))
      .groupBy($"source", $"g.a".as("a"), $"g.b".as("b"))
      .agg(count(lit(1)).as("cab"))
    def lnUnits(c: Column): Column =
      floor(c.cast("double") * log(c.cast("double"))
        * 1000000000.0 + 0.5).cast("long").cast("decimal(38,0)")
    val perA = big.groupBy($"source", $"a")
      .agg(sum($"cab").as("ca"))
      .groupBy($"source")
      .agg(sum(lnUnits($"ca")).as("slca"))
    val perAB = big.groupBy($"source")
      .agg(sum($"cab").as("n_bigrams"), count(lit(1)).as("vocab_bigrams"),
        sum(lnUnits($"cab")).as("slcab"))
    perAB.join(perA, "source")
      .select($"source", $"n_bigrams", $"vocab_bigrams",
        (floor((log($"n_bigrams".cast("double"))
          - $"slcab".cast("double") / 1000000000.0 / $"n_bigrams")
          / log(lit(2.0)) * 1000000.0 + 0.5).cast("double")
          / 1000000.0).as("h_bigram_bits"),
        (floor(($"slca".cast("double") - $"slcab".cast("double"))
          / 1000000000.0 / $"n_bigrams"
          / log(lit(2.0)) * 1000000.0 + 0.5).cast("double")
          / 1000000.0).as("h_cond_bits"))
      .orderBy($"source")
  }

  /** E52 — pairwise Jensen–Shannon divergence between source unigram
    * distributions: the SYMMETRIC, always-finite corpus-similarity
    * matrix next to E47's source-vs-rest KL (KL is directional and
    * needs smoothing to stay finite; JS is the metric√-able number a
    * mixture owner reads as "how different are these two feeds
    * really?"). No smoothing needed: the disjoint-support mass
    * contributes exactly ln2·((1−P∩) + (1−Q∩)), so the WHOLE
    * computation runs on the intersection join — per ordered source
    * pair, per-token contributions p·ln(2p/(p+q)) + q·ln(2q/(p+q))
    * floor to integer 1e-12 units (E47 discipline: exact
    * DECIMAL(38,0) sums, order-free) and the two intersection masses
    * are exact Longs; one shared double chain assembles JS, 6dp.
    *
    * Scale shape: one (source, token) partial agg, one vocab-keyed
    * self-join (corpus-SUBLINEAR output: Σ_t C(sources_with_t, 2) ≤
    * vocab·pairs², never corpus rows; NO broadcast hint — Heaps'
    * law), one pairs²-sized rollup.
    */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables.load(spark, dir, "documents")
      .select($"source", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"source", $"token").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val srcs = cnt.groupBy($"source").agg(sum($"c").as("n"))
    val a = cnt.select($"source".as("source_a"), $"token",
      $"c".as("ca"))
    val b = cnt.select($"source".as("source_b"), $"token",
      $"c".as("cb"))
    val joined = a.join(b, "token").filter($"source_a" < $"source_b")
      .join(broadcast(srcs.select($"source".as("source_a"),
        $"n".as("na"))), "source_a")
      .join(broadcast(srcs.select($"source".as("source_b"),
        $"n".as("nb"))), "source_b")
    val p = $"ca".cast("double") / $"na"
    val q = $"cb".cast("double") / $"nb"
    val contrib = p * log(lit(2.0) * p / (p + q)) +
      q * log(lit(2.0) * q / (p + q))
    joined
      .select($"source_a", $"source_b", $"na", $"nb", $"ca", $"cb",
        floor(contrib * 1e12 + 0.5).cast("long")
          .cast("decimal(38,0)").as("u"))
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_common_tokens"),
        max($"na").as("na"), max($"nb").as("nb"),
        sum($"ca").as("sp"), sum($"cb").as("sq"), sum($"u").as("su"))
      .select($"source_a", $"source_b", $"n_common_tokens",
        (floor(($"su".cast("double") / 1e12 +
          log(lit(2.0)) * ((lit(1.0) - $"sp".cast("double") / $"na") +
            (lit(1.0) - $"sq".cast("double") / $"nb"))) / 2.0
          * 1000000.0 + 0.5) / 1000000.0).as("js_divergence"))
      .orderBy($"source_a", $"source_b")
  }

  /** BPE training replay (r13; E20/E21/E42 were rows-only): symbol
    * lists become marker-wrapped strings — ⟨sym⟩⟨sym⟩… with ⟨ = chr(1)
    * and ⟩ = chr(2), characters the corpus cannot contain — because
    * the engine's left-to-right single-pass merge
    * ([[graft.ops.BpeMerge.merge]]) is EXACTLY non-overlapping string
    * `replace` of ⟨a⟩⟨b⟩ with ⟨ab⟩ on that representation (the scan
    * resumes after the substituted text, so [a,a,a,a] → [aa,aa] and
    * the suffix of a longer symbol can never false-match — the
    * wrapper characters anchor whole symbols). Each of the `steps`
    * training rounds is one weighted adjacent-pair count (exact
    * integers), one (cnt DESC, a, b) argmax, and one `replace`
    * rewrite; everything downstream (encode, per-doc counts,
    * fertility) is integer arithmetic plus single floored divisions
    * of exact integers. Emits CTEs `bs1..bsN` (step winners) and
    * `ebpe` (token, n_bpe). An EXHAUSTED step (no adjacent pairs
    * left — the engine's `if (best.nonEmpty)` skip) must not
    * collapse the replay: `bx$t` substitutes a sentinel winner
    * (⟩,⟨ — markers can never appear inside a symbol, so its replace
    * pattern cannot match) whenever `bs$t` is empty, keeping every
    * downstream cross join a no-op instead of empty; `bs$t` itself
    * stays empty so bpe_merge_seq emits exactly the engine's rows.
    * Marker safety is a shared contract, not an assumption: both
    * engines exclude tokens containing U+0001/U+0002
    * ([[bpeMarkerToken]] ↔ the btok/bvoc NOT-LIKE pair).
    */
  private def bpeReplayCtes(steps: Int = 6): String = {
    val L = "chr(1)"
    val R = "chr(2)"
    def step(t: Int): String = {
      val prev = s"bw${t - 1}"
      s"""bl$t AS (
         |  SELECT f, string_split(s[2:length(s) - 1], $R || $L) AS l
         |  FROM $prev),
         |pc$t AS MATERIALIZED (
         |  SELECT p.pr.a AS a, p.pr.b AS b, sum(p.f)::BIGINT AS cnt
         |  FROM (
         |    SELECT f, unnest(list_transform(range(1, length(l)),
         |      j -> {'a': l[j], 'b': l[j + 1]})) AS pr
         |    FROM bl$t) p
         |  GROUP BY 1, 2),
         |bs$t AS MATERIALIZED (
         |  SELECT a, b, cnt FROM pc$t ORDER BY cnt DESC, a, b LIMIT 1),
         |bx$t AS MATERIALIZED (
         |  SELECT a, b FROM bs$t
         |  UNION ALL
         |  SELECT $R AS a, $L AS b
         |  WHERE NOT EXISTS (SELECT 1 FROM bs$t)),
         |bw$t AS MATERIALIZED (
         |  SELECT w.f, replace(w.s,
         |    $L || bs.a || $R || $L || bs.b || $R,
         |    $L || bs.a || bs.b || $R) AS s
         |  FROM $prev w, bx$t bs),""".stripMargin
    }
    s"""btok AS MATERIALIZED (
       |  SELECT t AS token, count(*)::BIGINT AS f FROM (
       |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE length(t) >= 2
       |    AND t NOT LIKE '%' || $L || '%'
       |    AND t NOT LIKE '%' || $R || '%' GROUP BY t),
       |bw0 AS MATERIALIZED (
       |  SELECT f, $L || array_to_string(string_split(token, ''),
       |    $R || $L) || $R AS s
       |  FROM btok),
       |${(1 to steps).map(step).mkString("\n")}
       |bvoc AS MATERIALIZED (
       |  SELECT DISTINCT t AS token FROM (
       |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''
       |    AND t NOT LIKE '%' || $L || '%'
       |    AND t NOT LIKE '%' || $R || '%'),
       |ebpe AS MATERIALIZED (
       |  SELECT token,
       |    (length(es) - length(replace(es, $L, '')))::BIGINT AS n_bpe
       |  FROM (
       |    SELECT token, ${(1 to steps).foldLeft(
             s"$L || array_to_string(string_split(token, ''), $R || $L) " +
               s"|| $R") { (acc, t) =>
             s"replace($acc,\n      $L || b$t.a || $R || $L || b$t.b || " +
               s"$R, $L || b$t.a || b$t.b || $R)"
           }} AS es
       |    FROM bvoc${(1 to steps).map(t => s", bx$t b$t").mkString})),
       |edoc AS MATERIALIZED (
       |  SELECT d.doc_id, count(*)::BIGINT AS n_ws_tokens,
       |    sum(e.n_bpe)::BIGINT AS n_bpe_tokens
       |  FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |    FROM documents) d
       |  JOIN ebpe e USING (token)
       |  WHERE d.token <> ''
       |  GROUP BY d.doc_id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "bpe_merge_seq" -> (s"WITH ${bpeReplayCtes(6)}\n" +
      (1 to 6).map(t =>
        s"SELECT $t::BIGINT AS step, a AS left_sym, b AS right_sym, " +
          s"cnt AS pair_count FROM bs$t").mkString("\nUNION ALL\n") +
      "\nORDER BY step"),
    "bpe_encode" -> (s"WITH ${bpeReplayCtes(6)}\n" +
      """SELECT doc_id, n_ws_tokens, n_bpe_tokens,
        |  floor(n_bpe_tokens * 1000000.0 / n_ws_tokens + 0.5)
        |    / 1000000.0 AS compression
        |FROM edoc ORDER BY doc_id""".stripMargin),
    "tokenizer_fertility" -> (s"WITH ${bpeReplayCtes(6)},\n" +
      """meta AS (
        |  SELECT doc_id, lang, length(text)::BIGINT AS nc
        |  FROM documents),
        |fr AS (
        |  SELECT m.lang, count(*)::BIGINT AS n_docs,
        |    sum(e.n_ws_tokens)::BIGINT AS n_words,
        |    sum(e.n_bpe_tokens)::BIGINT AS n_bpe_tokens,
        |    sum(m.nc)::BIGINT AS n_chars
        |  FROM edoc e JOIN meta m USING (doc_id)
        |  GROUP BY m.lang)
        |SELECT lang, n_docs, n_words, n_bpe_tokens,
        |  floor(n_bpe_tokens * 1000000.0 / n_words + 0.5)
        |    / 1000000.0 AS fertility,
        |  floor(n_chars * 1000000.0 / n_bpe_tokens + 0.5)
        |    / 1000000.0 AS chars_per_token
        |FROM fr ORDER BY lang""".stripMargin),
    "text_js_divergence" ->
      """WITH cnt AS (
        |  SELECT source, t AS token, count(*)::BIGINT AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE t <> '' GROUP BY 1, 2),
        |srcs AS (
        |  SELECT source, sum(c)::BIGINT AS n FROM cnt GROUP BY 1),
        |j AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    na.n AS na, nb.n AS nb, a.c AS ca, b.c AS cb,
        |    CAST(floor((a.c::DOUBLE / na.n *
        |        ln(2.0 * (a.c::DOUBLE / na.n) /
        |          (a.c::DOUBLE / na.n + b.c::DOUBLE / nb.n))
        |      + b.c::DOUBLE / nb.n *
        |        ln(2.0 * (b.c::DOUBLE / nb.n) /
        |          (a.c::DOUBLE / na.n + b.c::DOUBLE / nb.n)))
        |      * 1e12 + 0.5) AS HUGEINT) AS u
        |  FROM cnt a JOIN cnt b ON b.token = a.token
        |    AND a.source < b.source
        |  JOIN srcs na ON na.source = a.source
        |  JOIN srcs nb ON nb.source = b.source)
        |SELECT source_a, source_b,
        |  count(*)::BIGINT AS n_common_tokens,
        |  floor((sum(u)::DOUBLE / 1e12 +
        |    ln(2.0) * ((1.0 - sum(ca)::DOUBLE / any_value(na)) +
        |      (1.0 - sum(cb)::DOUBLE / any_value(nb)))) / 2.0
        |    * 1000000.0 + 0.5) / 1000000.0 AS js_divergence
        |FROM j GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "text_window_pmi" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |p AS (
        |  SELECT toks, unnest(range(1, len(toks))) AS i FROM t),
        |pairs AS (
        |  SELECT toks[i] AS a, unnest(toks[i + 1 : i + 4]) AS b
        |  FROM p),
        |cp AS (
        |  SELECT a, b, count(*)::BIGINT AS cab
        |  FROM pairs GROUP BY 1, 2),
        |uni AS (
        |  SELECT w, count(*)::BIGINT AS c FROM (
        |    SELECT unnest(toks) AS w FROM t) GROUP BY w),
        |tot AS (
        |  SELECT (SELECT sum(c)::DOUBLE FROM uni) AS n_uni,
        |         (SELECT sum(cab)::DOUBLE FROM cp) AS n_pair)
        |SELECT cp.a || ' ' || cp.b AS pair, cp.cab AS support,
        |  floor(ln((cp.cab::DOUBLE / tot.n_pair) /
        |    ((ua.c::DOUBLE / tot.n_uni) * (ub.c::DOUBLE / tot.n_uni)))
        |    * 10000.0 + 0.5) / 10000.0 AS pmi
        |FROM cp
        |JOIN uni ua ON ua.w = cp.a
        |JOIN uni ub ON ub.w = cp.b, tot
        |WHERE cp.cab >= 5
        |ORDER BY pmi DESC, pair LIMIT 50""".stripMargin,
    "text_bigram_entropy" ->
      """WITH t AS (
        |  SELECT source, string_split(text, ' ') AS toks
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT source, a, b, count(*)::BIGINT AS cab FROM (
        |    SELECT source, toks[i] AS a, toks[i + 1] AS b
        |    FROM (SELECT source, toks,
        |      unnest(range(1, len(toks))) AS i FROM t))
        |  GROUP BY 1, 2, 3),
        |pa AS (
        |  SELECT source,
        |    sum(CAST(floor(ca::DOUBLE * ln(ca::DOUBLE)
        |      * 1000000000.0 + 0.5) AS HUGEINT)) AS slca
        |  FROM (SELECT source, a, sum(cab)::BIGINT AS ca
        |        FROM bg GROUP BY 1, 2)
        |  GROUP BY source),
        |pab AS (
        |  SELECT source, sum(cab)::BIGINT AS n_bigrams,
        |    count(*)::BIGINT AS vocab_bigrams,
        |    sum(CAST(floor(cab::DOUBLE * ln(cab::DOUBLE)
        |      * 1000000000.0 + 0.5) AS HUGEINT)) AS slcab
        |  FROM bg GROUP BY source)
        |SELECT pab.source, n_bigrams, vocab_bigrams,
        |  floor((ln(n_bigrams::DOUBLE)
        |    - slcab::DOUBLE / 1000000000.0 / n_bigrams)
        |    / ln(2.0) * 1000000.0 + 0.5) / 1000000.0 AS h_bigram_bits,
        |  floor((slca::DOUBLE - slcab::DOUBLE)
        |    / 1000000000.0 / n_bigrams
        |    / ln(2.0) * 1000000.0 + 0.5) / 1000000.0 AS h_cond_bits
        |FROM pab JOIN pa ON pa.source = pab.source
        |ORDER BY pab.source""".stripMargin,
    "text_char_class_profile" ->
      """WITH per AS (
        |  SELECT source, length(text)::BIGINT AS total,
        |    length(regexp_replace(text, '[^a-z]', '', 'g'))::BIGINT
        |      AS letters,
        |    length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT
        |      AS digits,
        |    length(regexp_replace(text, '[^ ]', '', 'g'))::BIGINT
        |      AS spaces
        |  FROM documents),
        |g AS (
        |  SELECT source, CAST(sum(total) AS BIGINT) AS n_chars,
        |    CAST(sum(letters) AS BIGINT) AS letters,
        |    CAST(sum(digits) AS BIGINT) AS digits,
        |    CAST(sum(spaces) AS BIGINT) AS spaces
        |  FROM per GROUP BY source)
        |SELECT source, n_chars, letters, digits, spaces,
        |  n_chars - letters - digits - spaces AS other,
        |  floor(letters::DOUBLE / n_chars * 1000000.0 + 0.5)
        |    / 1000000.0 AS letter_share,
        |  floor((n_chars - letters - digits - spaces)::DOUBLE
        |    / n_chars * 1000000.0 + 0.5) / 1000000.0 AS other_share,
        |  (n_chars - letters - digits - spaces)::DOUBLE * 20.0
        |    > n_chars::DOUBLE AS junk_flag
        |FROM g WHERE n_chars > 0 ORDER BY source""".stripMargin,
    "text_hapax_profile" ->
      """WITH cnt AS (
        |  SELECT source, token, count(*) AS n FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token
        |    FROM documents) u
        |  WHERE token <> '' GROUP BY source, token)
        |SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
        |  count(*)::BIGINT AS vocab,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hapax,
        |  CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dis,
        |  floor(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*) * 1000000.0 + 0.5) / 1000000.0 AS hapax_share,
        |  floor(count(*)::DOUBLE / sum(n) * 1000000.0 + 0.5)
        |    / 1000000.0 AS type_token_ratio
        |FROM cnt GROUP BY source ORDER BY source""".stripMargin,
    "text_kl_divergence" ->
      """WITH tk AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cnt AS (
        |  SELECT source, token, count(*)::BIGINT AS c
        |  FROM tk WHERE token <> '' GROUP BY 1, 2),
        |vocab AS (
        |  SELECT token, sum(c)::BIGINT AS c_all FROM cnt GROUP BY token),
        |srcs AS (
        |  SELECT source, sum(c)::BIGINT AS n_s FROM cnt GROUP BY source),
        |tot AS (
        |  SELECT sum(n_s)::BIGINT AS n_tot FROM srcs),
        |vs AS (SELECT count(*)::DOUBLE AS v FROM vocab),
        |base AS (
        |  SELECT v.token, v.c_all, s.source, s.n_s
        |  FROM vocab v CROSS JOIN srcs s),
        |grid AS (
        |  SELECT base.source, base.n_s, base.c_all,
        |    coalesce(cnt.c, 0)::BIGINT AS c
        |  FROM base LEFT JOIN cnt
        |    ON cnt.source = base.source AND cnt.token = base.token),
        |contrib AS (
        |  SELECT source, n_s,
        |    CAST(floor(
        |      ((c + 0.5) / (n_s + 0.5 * v))
        |      * ln(((c + 0.5) / (n_s + 0.5 * v))
        |          / ((c_all - c + 0.5) / (n_tot - n_s + 0.5 * v)))
        |      * 1e12 + 0.5) AS BIGINT) AS contrib12
        |  FROM grid, tot, vs)
        |SELECT source, max(n_s) AS n_tokens,
        |  floor(sum(contrib12)::DOUBLE / 1e6 + 0.5) / 1e6 AS kl_vs_rest
        |FROM contrib GROUP BY source ORDER BY source""".stripMargin,
    "text_heavy_tokens" ->
      """WITH tk AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |t2 AS (SELECT source, token FROM tk WHERE token <> ''),
        |tot AS (SELECT source, count(*)::BIGINT AS n_tokens
        |        FROM t2 GROUP BY source)
        |SELECT t2.source AS source, token, count(*)::BIGINT AS n,
        |  max(tot.n_tokens) AS n_tokens,
        |  floor(count(*)::DOUBLE / max(tot.n_tokens) * 1000000.0 + 0.5)
        |    / 1000000.0 AS share
        |FROM t2 JOIN tot ON tot.source = t2.source
        |GROUP BY t2.source, token
        |HAVING count(*) * 32 > max(tot.n_tokens)
        |ORDER BY 1, 2""".stripMargin,
    "doc_length_ks" ->
      """WITH cnt AS (
        |  SELECT source, n_chars AS x, count(*)::BIGINT AS c
        |  FROM documents GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt
        |       GROUP BY 1),
        |st AS (
        |  SELECT a.source AS src_a, b.s2 AS src_b, a.x,
        |    a.c AS ia, 0::BIGINT AS ib
        |  FROM cnt a JOIN (SELECT source AS s2 FROM ns) b
        |    ON a.source < b.s2
        |  UNION ALL
        |  SELECT b.s2, a.source, a.x, 0::BIGINT, a.c
        |  FROM cnt a JOIN (SELECT source AS s2 FROM ns) b
        |    ON b.s2 < a.source),
        |g AS (
        |  SELECT src_a, src_b, x, CAST(sum(ia) AS BIGINT) AS ia,
        |    CAST(sum(ib) AS BIGINT) AS ib
        |  FROM st GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT src_a, src_b, x,
        |    CAST(sum(ia) OVER w AS BIGINT) AS ca,
        |    CAST(sum(ib) OVER w AS BIGINT) AS cb
        |  FROM g WINDOW w AS (PARTITION BY src_a, src_b ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d AS (
        |  SELECT cum.src_a, cum.src_b, na.n AS n_a, nb.n AS n_b,
        |    max(abs(ca::DOUBLE / na.n - cb::DOUBLE / nb.n)) AS d
        |  FROM cum JOIN ns na ON na.source = cum.src_a
        |  JOIN ns nb ON nb.source = cum.src_b
        |  GROUP BY 1, 2, 3, 4)
        |SELECT src_a, src_b, n_a, n_b,
        |  floor(d * 1000000.0 + 0.5) / 1000000.0 AS ks_stat,
        |  floor(1.358 * sqrt((n_a + n_b)::DOUBLE / (n_a * n_b))
        |    * 1000000.0 + 0.5) / 1000000.0 AS crit_05,
        |  d > 1.358 * sqrt((n_a + n_b)::DOUBLE / (n_a * n_b))
        |    AS reject_05
        |FROM d ORDER BY src_a, src_b""".stripMargin,
    "text_pmi" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |uni AS (
        |  SELECT w, count(*) AS c FROM (
        |    SELECT unnest(toks) AS w FROM t) GROUP BY w),
        |big AS (
        |  SELECT gram, count(*) AS cab FROM (
        |    SELECT unnest([array_to_string(toks[i:i+1], ' ')
        |      for i in range(1, len(toks))]) AS gram FROM t)
        |  GROUP BY gram),
        |tot AS (
        |  SELECT (SELECT sum(c)::DOUBLE FROM uni) AS n_uni,
        |         (SELECT sum(cab)::DOUBLE FROM big) AS n_big),
        |f AS (
        |  SELECT gram, cab,
        |    string_split(gram, ' ')[1] AS a,
        |    string_split(gram, ' ')[2] AS b
        |  FROM big WHERE cab >= 5)
        |SELECT f.gram, f.cab AS support,
        |  floor(ln((f.cab::DOUBLE / tot.n_big) /
        |    ((ua.c::DOUBLE / tot.n_uni) * (ub.c::DOUBLE / tot.n_uni)))
        |    * 10000.0 + 0.5) / 10000.0 AS pmi
        |FROM f
        |JOIN uni ua ON ua.w = f.a
        |JOIN uni ub ON ub.w = f.b, tot
        |ORDER BY pmi DESC, gram LIMIT 50""".stripMargin,
    "vocab_coverage" ->
      """WITH v AS (
        |  SELECT t, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' GROUP BY t),
        |r AS (
        |  SELECT t, c,
        |    row_number() OVER (ORDER BY c DESC, t) AS rank,
        |    CAST(sum(c) OVER (ORDER BY c DESC, t ROWS UNBOUNDED
        |      PRECEDING) AS BIGINT) AS cum
        |  FROM v),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM v),
        |th AS (SELECT unnest([0.5, 0.75, 0.9, 0.99])::DOUBLE AS threshold)
        |SELECT th.threshold,
        |  CAST(min(r.rank) AS BIGINT) AS n_terms,
        |  arg_min(r.cum, r.rank) AS covered_tokens,
        |  max(tot.total) AS total_tokens
        |FROM th JOIN r ON r.cum >= th.threshold * (SELECT total FROM tot),
        |  tot
        |GROUP BY th.threshold ORDER BY th.threshold""".stripMargin,
    "text_bm25" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS DOUBLE) AS dl,
        |    string_split(text, ' ') AS toks
        |  FROM documents),
        |g AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM docs),
        |t AS (
        |  SELECT doc_id, dl, unnest(toks) AS term FROM docs),
        |tf AS (
        |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM t
        |  WHERE term IN ('hash', 'join', 'vector', 'spark')
        |  GROUP BY doc_id, dl, term),
        |idf AS (
        |  SELECT term,
        |    ln(1.0 + (g.n - count(*)::DOUBLE + 0.5)
        |      / (count(*)::DOUBLE + 0.5)) AS idf
        |  FROM tf, g GROUP BY term, g.n),
        |s AS (
        |  SELECT tf.doc_id,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      coalesce(list(idf.idf * tf.tf * 2.2
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / g.avgdl))
        |        ORDER BY term), [])), (a, x) -> a + x) AS s,
        |    count(*) AS n_terms
        |  FROM tf JOIN idf USING (term), g
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, floor(s * 1000000.0 + 0.5) / 1000000.0 AS bm25,
        |  n_terms
        |FROM s ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin,
    "text_gopher_rules" ->
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
        |    count(*) FILTER (w IN ('""" + Stopwords.mkString("', '") +
        """')) AS n_stop_types
        |  FROM wc GROUP BY doc_id),
        |r AS (
        |  SELECT doc_id, n_words, n_stop_types,
        |    floor(sum_len::DOUBLE / n_words * 10000.0 + 0.5) / 10000.0
        |      AS mean_word_len,
        |    floor(top_c::DOUBLE / n_words * 1000000.0 + 0.5) / 1000000.0
        |      AS top_word_frac,
        |    floor((n_words - n_distinct)::DOUBLE / n_words * 1000000.0
        |      + 0.5) / 1000000.0 AS dup_word_frac
        |  FROM stats)
        |SELECT doc_id, n_words, mean_word_len, n_stop_types,
        |  top_word_frac, dup_word_frac,
        |  CASE WHEN n_words BETWEEN 50 AND 100000
        |    AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND n_stop_types >= 2 AND top_word_frac <= 0.1
        |    THEN 1 ELSE 0 END::BIGINT AS keep
        |FROM r ORDER BY doc_id""").stripMargin,
    "text_readability" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '')
        |      AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    len(toks)::DOUBLE AS n_words,
        |    greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
        |      s -> trim(s) <> '')), 1)::DOUBLE AS n_sents,
        |    list_sum(list_transform(toks, t ->
        |      greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1)))
        |      ::DOUBLE AS n_syll
        |  FROM d WHERE len(toks) > 0)
        |SELECT doc_id,
        |  n_words::BIGINT AS n_words,
        |  n_sents::BIGINT AS n_sentences,
        |  n_syll::BIGINT AS n_syllables,
        |  floor((206.835 - 1.015 * (n_words / n_sents)
        |    - 84.6 * (n_syll / n_words)) * 10000.0 + 0.5) / 10000.0
        |    AS flesch
        |FROM base ORDER BY doc_id""".stripMargin,
    "text_heaps_fit" ->
      """WITH pts AS (
        |  SELECT CAST(floor(ln(len(t)::DOUBLE) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS xu,
        |    CAST(floor(ln(len(list_distinct(t))::DOUBLE)
        |      * 1000000000.0 + 0.5) AS BIGINT) AS yu
        |  FROM (
        |    SELECT list_filter(string_split(text, ' '), t -> t <> '') AS t
        |    FROM documents) u
        |  WHERE len(t) >= 1),
        |s AS (
        |  SELECT count(*)::DOUBLE AS n,
        |    sum(xu)::DOUBLE / 1.0e9 AS sx,
        |    sum(yu)::DOUBLE / 1.0e9 AS sy,
        |    sum(xu::HUGEINT * yu)::DOUBLE / 1.0e18 AS sxy,
        |    sum(xu::HUGEINT * xu)::DOUBLE / 1.0e18 AS sxx
        |  FROM pts),
        |f AS (
        |  SELECT n, sx, sy,
        |    (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope_raw
        |  FROM s)
        |SELECT n::BIGINT AS n_docs,
        |  floor(slope_raw * 1000000.0 + 0.5) / 1000000.0 AS beta,
        |  floor((sy - slope_raw*sx) / n * 1000000.0 + 0.5) / 1000000.0
        |    AS intercept
        |FROM f""".stripMargin,
    "text_zipf_fit" ->
      """WITH tf AS (
        |  SELECT token, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token
        |    FROM documents) u
        |  WHERE token <> '' GROUP BY token),
        |top AS (SELECT token, cnt FROM tf ORDER BY cnt DESC, token
        |  LIMIT 500),
        |rk AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS r
        |  FROM top),
        |pts AS (
        |  SELECT CAST(floor(ln(r::DOUBLE) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS xu,
        |    CAST(floor(ln(cnt::DOUBLE) * 1000000000.0 + 0.5)
        |      AS BIGINT) AS yu
        |  FROM rk),
        |s AS (
        |  SELECT count(*)::DOUBLE AS n,
        |    sum(xu)::DOUBLE / 1.0e9 AS sx,
        |    sum(yu)::DOUBLE / 1.0e9 AS sy,
        |    sum(xu::HUGEINT * yu)::DOUBLE / 1.0e18 AS sxy,
        |    sum(xu::HUGEINT * xu)::DOUBLE / 1.0e18 AS sxx
        |  FROM pts),
        |f AS (
        |  SELECT n, sx, sy,
        |    (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope_raw
        |  FROM s)
        |SELECT n::BIGINT AS n_points,
        |  floor(slope_raw * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |  floor((sy - slope_raw*sx) / n * 1000000.0 + 0.5) / 1000000.0
        |    AS intercept
        |FROM f""".stripMargin,
    "text_kn_bigram" ->
      """WITH d2 AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |    x -> x <> '') AS t
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 2),
        |bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM d2, LATERAL (SELECT unnest(range(1, len(t))) AS i) u),
        |fst AS (
        |  SELECT w1, count(*) AS c1, count(DISTINCT w2) AS n1f
        |  FROM bg GROUP BY w1),
        |ty AS (SELECT DISTINCT w1, w2 FROM bg),
        |ctx AS (SELECT w2, count(*) AS n1p FROM ty GROUP BY w2),
        |btc AS (SELECT count(*) AS bt FROM ty),
        |probs AS (
        |  SELECT p.w1, p.w2,
        |    CAST(floor(ln(greatest(p.c12::DOUBLE - 0.75, 0.0) / f.c1
        |      + 0.75 / f.c1 * f.n1f * (x.n1p::DOUBLE / b.bt))
        |      * 1000000000.0 + 0.5) AS BIGINT) AS lpu
        |  FROM (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2) p
        |  JOIN fst f USING (w1) JOIN ctx x ON x.w2 = p.w2, btc b)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  floor(-(sum(lpu)::DOUBLE / 1000000000.0 / count(*))
        |    * 1000000.0 + 0.5) / 1000000.0 AS avg_kn_surprisal
        |FROM bg JOIN probs USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_mattr" ->
      """WITH d2 AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |    x -> x <> '') AS t
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 1),
        |pos AS (
        |  SELECT doc_id, len(t) AS n, t[p] AS token, p
        |  FROM d2, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS p) u),
        |lagd AS (
        |  SELECT doc_id, n, token, p,
        |    coalesce(lag(p) OVER (PARTITION BY doc_id, token ORDER BY p),
        |      0) AS prev
        |  FROM pos),
        |c AS (
        |  SELECT doc_id, n, token,
        |    greatest(least(p, n - 24) - greatest(prev + 1, p - 24, 1) + 1,
        |      0) AS c
        |  FROM lagd),
        |g AS (
        |  SELECT doc_id, max(n) AS n_tok, count(DISTINCT token) AS n_uniq,
        |    sum(c) AS sc
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tok::BIGINT AS n_tok, n_uniq,
        |  floor((CASE WHEN n_tok >= 25
        |      THEN sc::DOUBLE / ((n_tok - 24) * 25)
        |      ELSE n_uniq::DOUBLE / n_tok END) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mattr
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_burstiness" ->
      """WITH pd AS (
        |  SELECT token, doc_id, count(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents) u
        |  WHERE token <> '' GROUP BY token, doc_id),
        |st AS (
        |  SELECT token, CAST(sum(c) AS BIGINT) AS cnt,
        |    sum(c::HUGEINT * c) AS ss, count(*) AS df
        |  FROM pd GROUP BY token),
        |top AS (SELECT * FROM st ORDER BY cnt DESC, token LIMIT 50),
        |ndc AS (SELECT count(*) AS ndocs FROM documents),
        |m AS (
        |  SELECT token, cnt, df, ss, ndocs, cnt::DOUBLE / ndocs AS mean
        |  FROM top, ndc)
        |SELECT token, cnt, df,
        |  floor(mean * 1000000.0 + 0.5) / 1000000.0 AS mean_per_doc,
        |  floor((ss::DOUBLE / ndocs - mean * mean) / mean
        |    * 1000000.0 + 0.5) / 1000000.0 AS dispersion
        |FROM m ORDER BY cnt DESC, token""".stripMargin,
    "text_bigram_surprisal" ->
      """WITH d2 AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |    x -> x <> '') AS t
        |  FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 2),
        |bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM d2, LATERAL (SELECT unnest(range(1, len(t))) AS i) u),
        |uni AS (
        |  SELECT w, count(*) AS cw
        |  FROM (SELECT unnest(t) AS w FROM d2) GROUP BY w),
        |tw AS (SELECT sum(cw) AS tw FROM uni),
        |fst AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
        |pr AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        |probs AS (
        |  SELECT p.w1, p.w2,
        |    CAST(floor(ln(0.7 * (p.c12::DOUBLE / f.c1)
        |      + (1 - 0.7) * (u.cw::DOUBLE / t.tw))
        |      * 1000000000.0 + 0.5) AS BIGINT) AS lpu
        |  FROM pr p JOIN fst f USING (w1) JOIN uni u ON u.w = p.w2, tw t)
        |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |  floor(-(sum(lpu)::DOUBLE / 1000000000.0 / count(*))
        |    * 1000000.0 + 0.5) / 1000000.0 AS avg_surprisal
        |FROM bg JOIN probs USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |t AS (SELECT * FROM tok WHERE token <> ''),
        |tf AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tf),
        |lp AS (
        |  SELECT token, CAST(floor(ln(cnt::DOUBLE / total::DOUBLE)
        |    * 1000000000.0 + 0.5) AS BIGINT) AS lpu
        |  FROM tf CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tok,
        |  floor(-(sum(lpu)::DOUBLE / 1000000000.0 / count(*))
        |    * 1000000.0 + 0.5) / 1000000.0 AS avg_surprisal
        |FROM t JOIN lp USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "bpe_pair_stats" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |tf AS (
        |  SELECT t, count(*) AS f FROM tok
        |  WHERE t <> '' AND len(t) >= 2 GROUP BY t),
        |p AS (
        |  SELECT f, unnest([t[i:i+1] for i in range(1, len(t))]) AS pair
        |  FROM tf),
        |agg AS (
        |  SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM p GROUP BY pair)
        |SELECT row_number() OVER (ORDER BY cnt DESC, pair) AS rank,
        |  pair, cnt
        |FROM agg ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) > 0),
        |tok AS (
        |  SELECT doc_id, unnest(toks) AS token,
        |    unnest(range(1, len(toks) + 1)) AS pos FROM t),
        |uni AS (
        |  SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |stats AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |    CAST(max(c) AS BIGINT) AS top_tok,
        |    count(*)::BIGINT AS n_uniq
        |  FROM uni GROUP BY 1),
        |big AS (
        |  SELECT doc_id, unnest([array_to_string(toks[i:i+1], ' ')
        |    for i in range(1, len(toks))]) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |bigm AS (
        |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_big FROM (
        |    SELECT doc_id, gram, count(*) AS c FROM big GROUP BY 1, 2)
        |  GROUP BY 1),
        |seg AS (
        |  SELECT doc_id, pos, CAST(sum(chg) OVER (
        |    PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
        |  FROM (SELECT doc_id, pos,
        |    CASE WHEN lag(token) OVER (PARTITION BY doc_id ORDER BY pos)
        |      = token THEN 0 ELSE 1 END AS chg FROM tok)),
        |mr AS (
        |  SELECT doc_id, CAST(max(run) AS BIGINT) AS max_run FROM (
        |    SELECT doc_id, seg, count(*) AS run FROM seg GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT s.doc_id, s.n_tok, s.n_uniq,
        |  floor((1.0 - s.n_uniq::DOUBLE / s.n_tok) * 10000.0 + 0.5)
        |    / 10000.0 AS dup_frac,
        |  floor(s.top_tok::DOUBLE / s.n_tok * 10000.0 + 0.5)
        |    / 10000.0 AS top_tok_frac,
        |  CASE WHEN s.n_tok < 2 THEN 0.0
        |    ELSE floor(coalesce(b.top_big, 0)::DOUBLE / (s.n_tok - 1)
        |      * 10000.0 + 0.5) / 10000.0 END AS top_bigram_frac,
        |  mr.max_run, s.top_tok * 5 > s.n_tok AS repetitive
        |FROM stats s LEFT JOIN bigm b ON s.doc_id = b.doc_id
        |JOIN mr ON s.doc_id = mr.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "text_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |cc AS (
        |  SELECT doc_id, ch, count(*) AS c FROM c GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars_e,
        |    count(*)::BIGINT AS n_distinct_chars,
        |    sum(CAST(floor(c::DOUBLE * ln(c::DOUBLE)
        |      * 1000000000.0 + 0.5) AS HUGEINT)) AS slcu
        |  FROM cc GROUP BY 1)
        |SELECT doc_id, n_chars_e, n_distinct_chars,
        |  floor((ln(n_chars_e::DOUBLE)
        |    - slcu::DOUBLE / 1000000000.0 / n_chars_e) / ln(2.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS entropy_bits
        |FROM agg ORDER BY doc_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' contact user' || doc_id
        |    || '@example.com or call +1-555-'
        |    || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |    || ' from 10.' || (doc_id % 256) || '.0.1' AS a
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, a,
        |    len(regexp_extract_all(a,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
        |      AS n_emails,
        |    regexp_replace(a,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g') AS r1
        |  FROM aug),
        |r2 AS (
        |  SELECT doc_id, n_emails,
        |    len(regexp_extract_all(r1,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))::BIGINT
        |      AS n_ips,
        |    regexp_replace(r1,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
        |      '<IP>', 'g') AS r2
        |  FROM r),
        |r3 AS (
        |  SELECT doc_id, n_emails, n_ips,
        |    len(regexp_extract_all(r2,
        |      '\+[0-9][0-9\-]{5,14}[0-9]'))::BIGINT AS n_phones,
        |    regexp_replace(r2, '\+[0-9][0-9\-]{5,14}[0-9]',
        |      '<PHONE>', 'g') AS r3
        |  FROM r2)
        |SELECT doc_id, n_emails, n_ips, n_phones,
        |  length(r3)::BIGINT AS scrubbed_len, md5(r3) AS scrubbed_hash
        |FROM r3 ORDER BY doc_id""".stripMargin,
    "doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' '))::BIGINT AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tk, n,
        |    unnest(range(0, CASE WHEN n <= 64 THEN 1
        |      ELSE 1 + (n - 64 + 47) // 48 END)) AS chunk_idx
        |  FROM t)
        |SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
        |  least(n - chunk_idx * 48, 64)::BIGINT AS chunk_tokens,
        |  md5(array_to_string(
        |    tk[(chunk_idx * 48 + 1)::INT : (chunk_idx * 48 + 64)::INT],
        |    ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "token_histogram" ->
      """WITH t AS (
        |  SELECT len(string_split(text, ' '))::BIGINT AS n FROM documents)
        |SELECT least(n // 32, 9) AS bin, count(*) AS n_docs,
        |  min(n) AS min_tokens, max(n) AS max_tokens
        |FROM t GROUP BY 1 ORDER BY bin""".stripMargin,
    "text_regex_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+'))::BIGINT AS n_tok,
        |  len(list_distinct(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+')))::BIGINT AS n_uniq,
        |  len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS n_alpha,
        |  len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_num,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]+'))::BIGINT
        |    - len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT
        |    - len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_punct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "vocab_top" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |f AS (
        |  SELECT token, count(*) AS freq FROM t WHERE token <> ''
        |  GROUP BY token)
        |SELECT token, freq,
        |  row_number() OVER (ORDER BY freq DESC, token) AS rank
        |FROM f ORDER BY freq DESC, token LIMIT 500""".stripMargin,
    "oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |t AS (SELECT doc_id, token FROM tok WHERE token <> ''),
        |vocab AS (
        |  SELECT token FROM t GROUP BY token
        |  ORDER BY count(*) DESC, token LIMIT 10)
        |SELECT t.doc_id, count(*) AS n_tok,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_oov,
        |  floor(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*) * 10000.0 + 0.5) / 10000.0 AS oov_rate
        |FROM t LEFT JOIN vocab v ON t.token = v.token
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms
        |  GROUP BY doc_id, term),
        |df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    floor(tf.tf * ln(n.n / df.df) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rnk
        |  FROM scored)
        |SELECT doc_id, rnk, term, tf, df, tfidf FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "text_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |g0 AS (
        |  SELECT doc_id, unnest([array_to_string(toks[i:i+7], ' ')
        |    for i in range(1, len(toks) - 6)]) AS gram
        |  FROM t),
        |g AS (SELECT DISTINCT doc_id, gram FROM g0),
        |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
        |p AS (
        |  SELECT g.doc_id, count(*) AS n_grams,
        |    sum(CASE WHEN df.df > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared
        |  FROM g JOIN df USING (gram) GROUP BY g.doc_id)
        |SELECT doc_id, n_grams, n_shared,
        |  floor((1.0 - n_shared::DOUBLE / n_grams) * 1000000.0 + 0.5)
        |    / 1000000.0 AS novelty
        |FROM p ORDER BY doc_id""".stripMargin,
    "text_ngram_freq" ->
      """WITH t AS (
        |  SELECT lang, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (
        |  SELECT lang, unnest([array_to_string(toks[i:i+1], ' ')
        |    for i in range(1, len(toks))]) AS gram
        |  FROM t),
        |c AS (
        |  SELECT lang, gram, count(*) AS cnt FROM g GROUP BY lang, gram),
        |r AS (
        |  SELECT lang, gram, cnt, row_number() OVER (
        |    PARTITION BY lang ORDER BY cnt DESC, gram) AS rnk
        |  FROM c)
        |SELECT lang, rnk, gram, cnt FROM r WHERE rnk <= 10
        |ORDER BY lang, rnk""".stripMargin,
    "text_clean" ->
      """WITH c AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS cleaned
        |  FROM documents)
        |SELECT doc_id, length(cleaned)::BIGINT AS clean_len,
        |  md5(cleaned) AS clean_hash
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens,
        |  length(text)::BIGINT AS n_chars_actual
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (
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
        |  FROM t)
        |SELECT doc_id,
        |  floor(len_score * 10000.0 + 0.5) / 10000.0 AS len_score,
        |  floor(punct_ratio * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
        |  floor(stop_ratio * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
        |  floor(uniq_ratio * 10000.0 + 0.5) / 10000.0 AS uniq_ratio,
        |  floor((len_score + (1.0 - punct_ratio) + (1.0 - stop_ratio)
        |    + uniq_ratio) / 4.0 * 10000.0 + 0.5) / 10000.0 AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_knn_sparse" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |    FROM documents)
        |  GROUP BY doc_id, term),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |dfq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term),
        |dff AS (
        |  SELECT term, df FROM dfq, nn WHERE df::DOUBLE <= 1.0 * nn.n),
        |w AS (
        |  SELECT tf.doc_id, tf.term, tf.tf * ln(nn.n / dff.df) AS w
        |  FROM tf JOIN dff USING (term), nn),
        |nrm AS (
        |  SELECT doc_id, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |    coalesce(list(w * w ORDER BY term), [])),
        |    (a, b) -> a + b)) AS nrm FROM w GROUP BY doc_id),
        |wn AS (
        |  SELECT w.doc_id, w.term, w.w / nrm.nrm AS wn
        |  FROM w JOIN nrm USING (doc_id) WHERE nrm.nrm > 0.0),
        |q AS (
        |  SELECT doc_id AS query_id, term, wn AS qw FROM wn
        |  WHERE doc_id < 5),
        |s AS (
        |  SELECT q.query_id, wn.doc_id,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      coalesce(list(wn.wn * q.qw ORDER BY term), [])),
        |      (a, b) -> a + b) AS cos
        |  FROM wn JOIN q USING (term)
        |  WHERE wn.doc_id <> q.query_id
        |  GROUP BY q.query_id, wn.doc_id),
        |r AS (
        |  SELECT query_id, doc_id, cos, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rnk
        |  FROM s)
        |SELECT query_id, rnk, doc_id,
        |  floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,
    "doc_length_profile" ->
      """WITH d AS (
        |  SELECT lang, len(string_split(text, ' '))::BIGINT AS n_tok
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  floor(quantile_cont(n_tok, 0.1) * 10000.0 + 0.5) / 10000.0 AS p10,
        |  floor(quantile_cont(n_tok, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor(quantile_cont(n_tok, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90,
        |  floor(avg(n_tok) * 10000.0 + 0.5) / 10000.0 AS mean_tok
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "text_rake_keyphrases" ->
      """WITH t0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tk AS (
        |  SELECT doc_id, u.pos AS pos, u.tok AS tok,
        |    CASE WHEN u.tok = '' OR u.tok IN
        |      ('the','a','of','and','to','in','is','on','for','with')
        |      THEN 1 ELSE 0 END AS is_stop
        |  FROM (SELECT doc_id,
        |    unnest([{'pos': i, 'tok': toks[i]}
        |      for i in range(1, len(toks) + 1)]) AS u
        |    FROM t0)),
        |tk2 AS (
        |  SELECT *, CAST(sum(is_stop) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM tk),
        |phr AS (
        |  SELECT doc_id, run,
        |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |    count(*) AS plen,
        |    list(tok ORDER BY pos) AS ws
        |  FROM tk2 WHERE is_stop = 0 GROUP BY doc_id, run),
        |wstat AS (
        |  SELECT wd, count(*) AS freq, CAST(sum(plen) AS BIGINT) AS deg
        |  FROM (SELECT unnest(ws) AS wd, plen FROM phr) GROUP BY wd),
        |wsc AS (SELECT wd, deg::DOUBLE / freq AS wscore FROM wstat),
        |psc AS (
        |  SELECT p.doc_id, p.run, p.phrase,
        |    list_reduce(list_prepend(0.0, list_sort(list(w.wscore))),
        |      (a, b) -> a + b) AS score
        |  FROM (SELECT doc_id, run, phrase, unnest(ws) AS wd FROM phr) p
        |  JOIN wsc w ON w.wd = p.wd
        |  GROUP BY p.doc_id, p.run, p.phrase),
        |pagg AS (
        |  SELECT phrase, count(*) AS n_occurrences, max(score) AS score
        |  FROM psc GROUP BY phrase)
        |SELECT phrase, n_occurrences,
        |  floor(score * 1000000.0 + 0.5) / 1000000.0 AS score
        |FROM pagg ORDER BY score DESC, phrase LIMIT 20""".stripMargin,
    "source_vocab_overlap" ->
      """WITH st AS (
        |  SELECT DISTINCT source, t FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE t <> ''),
        |sizes AS (
        |  SELECT source, count(*) AS v FROM st GROUP BY source),
        |inter AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    count(*) AS common
        |  FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT i.src_a, i.src_b, sa.v AS va, sb.v AS vb, i.common,
        |  floor(i.common::DOUBLE / (sa.v + sb.v - i.common)
        |    * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM inter i
        |JOIN sizes sa ON sa.source = i.src_a
        |JOIN sizes sb ON sb.source = i.src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "langid_trigram" ->
      """WITH d AS (
        |  SELECT doc_id, text, lang,
        |    strpos('0123456789abcdef',
        |      substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1
        |      AS bucket
        |  FROM documents WHERE length(text) >= 3),
        |tri AS (
        |  SELECT doc_id, lang, bucket,
        |    unnest([substring(text, i, 3)
        |      for i in range(1, length(text) - 1)]) AS g
        |  FROM d),
        |prof AS (
        |  SELECT lang, g, count(*) AS c FROM tri WHERE bucket < 12
        |  GROUP BY lang, g),
        |topg AS (
        |  SELECT lang AS plang, g FROM (
        |    SELECT lang, g, row_number() OVER (PARTITION BY lang
        |      ORDER BY c DESC, g) AS r
        |    FROM prof) WHERE r <= 20),
        |h AS (
        |  SELECT t.doc_id, t.lang, topg.plang, count(*) AS hits
        |  FROM (SELECT DISTINCT doc_id, lang, g FROM tri
        |        WHERE bucket >= 12) t
        |  JOIN topg ON topg.g = t.g
        |  GROUP BY t.doc_id, t.lang, topg.plang),
        |pred AS (
        |  SELECT doc_id, lang, plang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY hits DESC, plang) AS r
        |    FROM h) WHERE r = 1)
        |SELECT lang, plang AS pred_lang, count(*) AS n
        |FROM pred GROUP BY lang, plang
        |ORDER BY lang, pred_lang""".stripMargin,
    "langid_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x IN ('der','die','und','nicht','das')))::BIGINT AS s_de,
        |    len(list_filter(toks, x -> x IN ('the','and','of','is','with')))::BIGINT AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','que','los','una')))::BIGINT AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','les','des','est','une')))::BIGINT AS s_fr,
        |    len(list_filter(toks, x -> x IN ('de5','shi4','bu4','le5','zai4')))::BIGINT AS s_zh
        |  FROM t),
        |p AS (
        |  SELECT lang, CASE
        |    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang
        |  FROM s),
        |g AS (
        |  SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
        |w AS (
        |  SELECT *, sum(n) OVER (PARTITION BY lang) AS row_total FROM g)
        |SELECT lang, pred_lang, n,
        |  floor(n::DOUBLE / row_total * 10000.0 + 0.5) / 10000.0
        |    AS recall_share
        |FROM w ORDER BY lang, pred_lang""".stripMargin,
    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x IN ('der','die','und','nicht','das')))::BIGINT AS s_de,
        |    len(list_filter(toks, x -> x IN ('the','and','of','is','with')))::BIGINT AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','que','los','una')))::BIGINT AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','les','des','est','une')))::BIGINT AS s_fr,
        |    len(list_filter(toks, x -> x IN ('de5','shi4','bu4','le5','zai4')))::BIGINT AS s_zh
        |  FROM t)
        |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
        |  CASE
        |    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang,
        |  (CASE
        |    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END) = lang AS matches_label
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT,
        |    [unicode(c)::BIGINT for c in string_split(text, '')]),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin) ++ cmsOracle

  /** DuckDB re-derivation of the count-min sketch (E19): the four
    * per-row bucket hashes (fnv1a64 ^ row-key → splitmix64 mod 256)
    * rebuilt with [[OracleU64]]-style HUGEINT mod-2^64 arithmetic; the
    * row keys are compile-time Long constants inlined as unsigned
    * literals so both engines hash identically.
    */
  /** CTE prefix re-deriving the CMS bucket grid (token → per-row
    * bucket) in HUGEINT SQL; shared by E19's and G8's oracles.
    */
  private[graft] def cmsBkCte: String = {
    import OracleU64._
    val mask = (BigInt(1) << 64) - 1
    val keyCase = (0 until CmsDepth).map { r =>
      val k = (BigInt(CmsSeed) + BigInt(r) *
        (BigInt(graft.expressions.Hash64.Golden) & mask)) & mask
      s"WHEN $r THEN $k::HUGEINT"
    }.mkString("CASE r ", " ", " END")
    val fnvStep = "(((h // 256) * 256 + " +
      "xor((h % 256)::BIGINT, c::BIGINT)::HUGEINT) * " +
      s"1099511628211::HUGEINT) % $Two64"
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS t FROM documents),
       |tf AS (
       |  SELECT t AS token, count(*) AS cnt FROM tok
       |  WHERE t <> '' GROUP BY t),
       |f0 AS (
       |  SELECT token, cnt, list_reduce(
       |    list_prepend(14695981039346656037::HUGEINT,
       |      [unicode(c)::HUGEINT for c in string_split(token, '')]),
       |    (h, c) -> $fnvStep) AS f
       |  FROM tf),
       |rr AS (
       |  SELECT token, cnt, f, unnest(range(0, $CmsDepth)) AS r FROM f0),
       |rk AS (
       |  SELECT token, cnt, r, ${xor64("f", s"($keyCase)")} AS x
       |  FROM rr),
       |s1 AS (SELECT token, cnt, r, ${mixStep1("x")} AS x FROM rk),
       |s2 AS (SELECT token, cnt, r, ${mixStep2("x")} AS x FROM s1),
       |s3 AS (SELECT token, cnt, r, ${mixStep3("x")} AS x FROM s2),
       |bk AS (
       |  SELECT token, cnt, r,
       |    (${mixStep4("x")}::HUGEINT % $CmsWidth)::BIGINT AS bucket
       |  FROM s3),
       |counters AS (
       |  SELECT r, bucket, CAST(sum(cnt) AS BIGINT) AS c
       |  FROM bk GROUP BY r, bucket)
       |""".stripMargin
  }

  private def cmsOracle: Map[String, String] = Map(
    "cms_heavy_hitters" -> (cmsBkCte +
      """, top AS (
        |  SELECT token, cnt FROM tf
        |  ORDER BY cnt DESC, token LIMIT 10)
        |SELECT row_number() OVER (ORDER BY t.cnt DESC, t.token) AS rank,
        |  t.token, t.cnt AS exact_cnt, min(co.c) AS est_cnt
        |FROM top t
        |JOIN bk USING (token)
        |JOIN counters co USING (r, bucket)
        |GROUP BY t.token, t.cnt
        |ORDER BY rank""".stripMargin))
}

/** Left-to-right greedy BPE pair merge (E20): replace each adjacent
  * (a, b) occurrence in the symbol sequence with the fused symbol,
  * scanning once so overlapping occurrences resolve leftmost-first —
  * the classic BPE tokenizer-training semantics.
  */
object BpeMerge {
  /** Token count of `word` after replaying the merge sequence in
    * training order (each merge one left-to-right pass, exactly like
    * the training rewrite).
    */
  def encodedLength(word: String, merges: Array[(String, String)]): Int = {
    var syms: Seq[String] = word.split("").toSeq
    var i = 0
    while (i < merges.length) {
      syms = merge(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms.length
  }

  def merge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }
}
