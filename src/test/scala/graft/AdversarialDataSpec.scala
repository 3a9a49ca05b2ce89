package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round-9 verdict stretch item #7: the synthetic corpus is benign —
  * no negative or zero amounts, no zero-variance groups, no
  * single-row groups, no timestamp ties, no punctuation-only or
  * whitespace-only documents. This fixture is deliberately hostile on
  * exactly those axes and drives the statistical + text tier through
  * it, asserting (a) no operator throws and (b) no DERIVED NaN or
  * Infinity appears in any output column (null is the defined
  * degenerate answer; NaN inputs are excluded by design because
  * NaN-propagation through sums is defined engine-consistent
  * behavior, while NaN/Inf conjured from clean inputs is always a
  * division-by-zero/empty-group seam).
  *
  * Hostile axes per table:
  *  - orders: one dominant customer + one lone order, negative /
  *    zero / identical totals, one huge outlier, a 2-day calendar
  *    with a zero-variance day (degenerate daily series for
  *    ACF/Theil-Sen/changepoint/Holt paths).
  *  - events: one dominant user, exact timestamp ties (zero
  *    inter-arrival gaps, Mann-Whitney rank ties), negative and
  *    all-zero values, a single-event user, empty/`{}` props.
  *  - lineitem: zero quantity, discount = 1 (revenue factor 0),
  *    zero extendedprice, single flag/status group.
  *  - documents: punctuation-only text (cleans to empty),
  *    whitespace-only, single-word, identical triplicates, unicode,
  *    a single lang/source (single-group shares).
  */
class AdversarialDataSpec extends SparkSpecBase {

  private lazy val hostileDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hostile").toString
    // small dims carried over unchanged so joins still resolve
    Seq("region", "nation", "customer", "supplier", "part", "embeddings")
      .foreach { t =>
        spark.read.parquet(s"$sf/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val ordersRows = Seq(
      Row(1L, 7L, "F", -500.25, ts("1995-03-01 00:00:00"), "1-URGENT"),
      Row(2L, 7L, "F", 0.0, ts("1995-03-01 00:00:00"), "1-URGENT"),
      Row(3L, 7L, "F", 100.0, ts("1995-03-01 00:00:00"), "1-URGENT"),
      Row(4L, 7L, "F", 100.0, ts("1995-03-01 00:00:00"), "1-URGENT"),
      Row(5L, 7L, "F", 100.0, ts("1995-03-01 00:00:00"), "1-URGENT"),
      Row(6L, 7L, "F", 100.0, ts("1995-03-01 00:00:00"), "1-URGENT"),
      Row(7L, 7L, "F", 100.0, ts("1995-03-02 00:00:00"), "1-URGENT"),
      Row(8L, 7L, "F", 100.0, ts("1995-03-02 00:00:00"), "1-URGENT"),
      Row(9L, 7L, "F", 1.0e7, ts("1995-03-02 00:00:00"), "1-URGENT"),
      Row(10L, 9L, "F", -0.01, ts("1995-03-02 00:00:00"), "1-URGENT"))
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(ordersRows, 2), ordersSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val t0 = ts("2024-01-01 00:00:00")
    val eventsRows = Seq(
      Row(1L, t0, 1L, "view", 0.0, "{}"),
      Row(2L, t0, 1L, "view", 0.0, ""),
      Row(3L, t0, 1L, "view", 0.0, "{}"),
      Row(4L, t0, 1L, "view", 0.0, "{}"),
      Row(5L, t0, 1L, "click", -5.5, "{}"),
      Row(6L, ts("2024-01-01 00:00:01"), 1L, "click", -5.5, "{}"),
      Row(7L, ts("2024-01-01 02:00:00"), 1L, "view", 3.25, "{}"),
      Row(8L, ts("2024-01-02 00:00:00"), 1L, "view", 3.25, "{}"),
      Row(9L, ts("2024-01-02 00:00:00"), 2L, "click", 3.25, "{}"),
      Row(10L, ts("2024-01-03 00:00:00"), 1L, "view", 0.0, "{}"))
    val eventsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(eventsRows, 2), eventsSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val liRows = Seq(
      Row(1L, 1L, 1L, 1, 0.0, 0.0, 0.0, 0.0, "N", "O",
        ts("1995-03-05 00:00:00")),
      Row(1L, 2L, 1L, 2, 10.0, 1000.0, 1.0, 0.0, "N", "O",
        ts("1995-03-05 00:00:00")),
      Row(2L, 1L, 2L, 1, 10.0, 1000.0, 1.0, 0.08, "N", "O",
        ts("1995-03-06 00:00:00")),
      Row(3L, 3L, 2L, 1, 10.0, 1000.0, 0.05, 0.08, "N", "O",
        ts("1995-03-06 00:00:00")),
      Row(4L, 3L, 2L, 1, 10.0, 1000.0, 0.05, 0.08, "N", "O",
        ts("1995-03-06 00:00:00")))
    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(liRows, 2), liSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val docRows = Seq(
      Row(1L, "!!! ??? ... ---", "en", "web", 15L),
      Row(2L, "   ", "en", "web", 3L),
      Row(3L, "word", "en", "web", 4L),
      Row(4L, "the same text repeated here", "en", "web", 27L),
      Row(5L, "the same text repeated here", "en", "web", 27L),
      Row(6L, "the same text repeated here", "en", "web", 27L),
      Row(7L, "héllo wörld ünïcode text", "en",
        "web", 23L),
      Row(8L, "a b", "en", "web", 3L))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docRows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Statistical + text-quality tier: every query here computes a
    * ratio, variance, rank, or regression that the hostile axes can
    * push through a division-by-zero or empty-group seam.
    */
  private val tier = Seq(
    "events_ab_ttest", "events_mannwhitney", "revenue_theil_sen",
    "revenue_changepoint", "orders_survival_km", "revenue_acf",
    "revenue_bootstrap_ci", "orders_holt_forecast", "orders_holt_winters",
    "orders_seasonal_decompose", "orders_rolling_median",
    "customer_decile_migration", "events_gini", "events_psi_drift",
    "events_behavior_entropy", "events_skew_report", "orders_interarrival",
    "events_retention_fit", "lineitem_ridge", "geomean_order_value",
    "monthly_revenue", "events_sessionize", "events_value_percentiles",
    "text_quality", "text_langid", "doc_length_profile",
    "text_mattr", "text_burstiness", "dedup_exact", "source_quality_cap",
    // round-10 additions: every one computes a ratio/variance/rank the
    // hostile axes can push through a zero denominator
    "segment_trend", "events_chi2_independence", "revenue_benford",
    "orders_winsorized_mean", "stratified_sample_plan", "events_anova",
    "revenue_ccf", "text_simpson", "text_heavy_tokens",
    // round-11 additions: rank correlation (zero rank variance),
    // inequality/tail indices (ln of non-positive totals, all-tied
    // tails), KS (an empty split side), and per-source profiles
    // (zero-length / whitespace-only corpora)
    "daily_spearman", "user_value_theil", "order_value_hill",
    "split_quality_ks", "text_hapax_profile", "text_char_class_profile",
    "dedup_bytes_saved", "revenue_mann_kendall", "revenue_runs_test",
    "selection_bias_audit",
    // round-12: integer divisions over data-derived budgets (empty /
    // single-source / zero-token corpora exercise the k−li+1 and
    // total DIV 2 seams)
    "budget_waterfill",
    // round-12 (cont.): rank/moment tests — zero rank variance
    // (all-tied values), zero central variance (JB), a 2-day
    // calendar (Kendall pair frame, DW lag), zero within-group
    // deviation (Brown–Forsythe)
    "events_kruskal_wallis", "orders_jarque_bera", "daily_kendall",
    "revenue_durbin_watson", "events_brown_forsythe",
    // proportion test (all-/zero-converter buckets), JS divergence
    // (single-source corpus → empty pair frame), payload entropy
    // (single-char and punctuation-only payloads)
    "events_ab_proportion", "text_js_divergence",
    "multimodal_payload_entropy",
    // funnel shares (zero-doc stages), saturation ratio (identical
    // triplicate docs drive max-df buckets)
    "curation_funnel", "dedup_shingle_saturation")

  private def badNumbers(rows: Array[Row]): Seq[String] =
    rows.iterator.flatMap { r =>
      (0 until r.length).flatMap { i =>
        r.get(i) match {
          case d: java.lang.Double
            if d.isNaN || d.isInfinite => Some(s"col$i=$d")
          case f: java.lang.Float
            if f.isNaN || f.isInfinite => Some(s"col$i=$f")
          case _ => None
        }
      }
    }.toSeq

  test("statistical tier survives hostile data without derived NaN/Inf") {
    val registered = tier.filter(SparkEntry.queries.contains)
    assert(registered.size == tier.size,
      s"unknown tier keys: ${tier.diff(registered)}")
    val failures = registered.flatMap { name =>
      try {
        val bad = badNumbers(
          SparkEntry.queries(name)(spark, hostileDir).collect())
        if (bad.isEmpty) None else Some(name -> s"NaN/Inf: ${bad.take(5)}")
      } catch {
        case e: Throwable =>
          var c: Throwable = e
          while (c.getCause != null && c.getCause != c) c = c.getCause
          Some(name -> s"${c.getClass.getSimpleName}: ${
            Option(c.getMessage).getOrElse("").take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} hostile-data failures:\n" +
        failures.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
  }
}
