package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream batch operators. `events.ts` is nanosecond-precision
  * parquet (read as BIGINT nanos — see GraftSession); conversions to
  * Spark timestamps are explicit µs truncations.
  */
object Events {

  /** floor(x·100 + 0.5)/100 — engine-identical half-up rounding (Spark
    * and DuckDB round() split on .x5 halfway doubles; see Analytics).
    */
  private def r2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0
  private def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0
  private def r6(c: Column): Column =
    floor(c * 1000000.0 + 0.5) / 1000000.0

  /** Exact integer cents of the 2dp `value` column (floor(x·100+0.5)
    * — the +0.5 absorbs the 2dp double's representation error) and
    * the order-exact DECIMAL(38,0) sum (≙ the oracle's HUGEINT): a
    * float SUM accumulates in partition order and can cross the 2dp
    * output floor on a 1-ulp seam (the round-10 anova failure mode).
    */
  private def u2(c: Column): Column = floor(c * 100.0 + 0.5).cast("long")
  private def usum(c: Column): Column = sum(c.cast("decimal(38,0)"))
  private def sum2(c: Column): Column =
    r2(usum(u2(c)).cast("double") / 100.0)

  /** Gap-based sessionization (gap > 30 min starts a new session):
    * one shuffle on user_id, two stacked window functions, then the
    * session rollup — the classic single-pass distributed plan.
    */
  def sessionize(spark: SparkSession, dir: String,
                 gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // µs truncation before any comparison: DuckDB (the oracle engine)
    // reads TIMESTAMP(NANOS) parquet at µs precision.
    Tables.load(spark, dir, "events")
      .withColumn("ts", expr("ts DIV 1000"))
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("is_new",
        when($"prev_ts".isNull || $"ts" - $"prev_ts" > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min($"ts").as("start_us"),
        max($"ts").as("end_us"),
        sum2($"value").as("total_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** B58 — session path mining: the top-20 most common 3-step
    * event-type paths WITHIN a session (B6's 30-min gap sessions) —
    * the "what do users actually do" sequence rollup behind funnel
    * design; B54 tests one hypothesized path, this one discovers them.
    *
    * Scale shape: the session assignment + both leads share ONE
    * user-keyed window partitioning (one shuffle of the events table);
    * path counting is a partial-aggregable groupBy on the ≤ types³
    * path vocabulary, and the top-20 cut is a TakeOrdered. Nothing
    * session-sized ever sorts globally.
    */
  def sessionPaths(spark: SparkSession, dir: String,
                   gapMinutes: Int = 30, topK: Int = 20): DataFrame = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val bySession = Window.partitionBy($"user_id", $"session_id")
      .orderBy($"ts", $"event_id")
    Tables.load(spark, dir, "events")
      .withColumn("ts", expr("ts DIV 1000"))
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("is_new",
        when($"prev_ts".isNull || $"ts" - $"prev_ts" > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum($"is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t2", lead($"event_type", 1).over(bySession))
      .withColumn("t3", lead($"event_type", 2).over(bySession))
      .filter($"t3".isNotNull)
      .select(concat_ws(">", $"event_type", $"t2", $"t3").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(topK)
  }

  /** Tumbling-window aggregation via Spark's native `window()` on the
    * µs-converted timestamp; emitted bucket is the window start.
    */
  def windowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("tsm", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window($"tsm", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum2($"value").as("total_value"))
      .select($"w.start".cast("timestamp_ntz").as("hour_start"),
        $"event_type", $"n", $"total_value")
      .orderBy($"hour_start", $"event_type")
  }

  /** B8 — explicit two-phase salted aggregation: pre-aggregate on
    * (key, salt) to spread a hot key across partitions, then final
    * merge on key. Equal to the direct groupBy (the oracle) — the
    * point is the shuffle shape: a skewed key's rows split across
    * `salts` reducers in phase 1 instead of hammering one.
    */
  def saltedAgg(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("salt", ($"event_id" % salts).cast("int"))
      .groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("pn"), usum(u2($"value")).as("pv"))
      .groupBy($"event_type")
      .agg(sum($"pn").as("n"),
        r2(sum($"pv").cast("double") / 100.0).as("total_value"))
      .orderBy($"event_type")
  }

  /** B9 — semi-structured JSON extraction from the props column:
    * typed field pull + aggregation (the scan-side JSON path).
    */
  def propsExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** HLL sketch distinct-count per type (approx_count_distinct is
    * Spark's HyperLogLog++): the constant-memory distinct at 100 TB.
    * Approximation ≠ oracle-parity, so the driver check is rows-only;
    * EventsSpec bounds the error against the exact count.
    */
  def approxUsers(spark: SparkSession, dir: String,
                  rsd: Double = 0.02): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", rsd).as("approx_users"),
        countDistinct($"user_id").as("exact_users"))
      .orderBy($"event_type")
  }

  /** B36 — re-aggregable distinct sketches: per-day HLL sketches of
    * user_id merged into a per-type total via `hll_union_agg` — the
    * pre-aggregated-cube pattern that makes 100 TB distinct counts
    * incremental (each new day contributes one fixed-size sketch; the
    * merge never revisits history, unlike B13's one-shot
    * approx_count_distinct which must re-scan). The direct sketch and
    * exact count ride along to expose the merge fidelity; estimates
    * are engine-specific → rows-only driver check + spec bound.
    */
  def hllMergeUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
      .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
    val daily = e.groupBy($"event_type", $"day")
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val merged = daily.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("merged_users"),
        count(lit(1)).as("n_days"))
    val direct = e.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("direct_users"),
        countDistinct($"user_id").as("exact_users"))
    merged.join(direct, "event_type")
      .select($"event_type", $"n_days", $"merged_users", $"direct_users",
        $"exact_users")
      .orderBy($"event_type")
  }

  /** B49 — rolling active users: DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio per day — the engagement triple on
    * every product dashboard. A sliding-window COUNT DISTINCT does
    * not decompose (distinct is not mergeable across overlapping
    * windows), and the naive per-day self-join over a 7-day range
    * re-scans history per day. Instead: CONTRIBUTION EXPLODE — the
    * corpus first collapses to distinct (user, day) (corpus-linear,
    * partial-agg), each active day then contributes its user to the
    * 7 window days it can serve (a ×7 explode of the users×days
    * frame, calendar-bounded — never corpus-scale), and a second
    * distinct + count per window day yields the EXACT rolling
    * distinct with no range join. Stickiness floor-rounds at 6dp on
    * both engines.
    */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val active = Tables.load(spark, dir, "events")
      .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
      .select($"user_id", $"day").distinct()
    val dau = active.groupBy($"day").agg(count(lit(1)).as("dau"))
    val wau = active
      .select($"user_id", explode(sequence(lit(0), lit(6))).as("o"), $"day")
      .select($"user_id", date_add($"day", $"o").as("day"))
      .distinct()
      .groupBy($"day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select($"day", $"dau", $"wau",
        (floor($"dau".cast("double") / $"wau" * 1000000.0 + 0.5)
          / 1000000.0).as("stickiness"))
      .orderBy($"day")
  }

  /** B14 — daily cohort retention: users grouped by first-seen day,
    * fraction still active N days later (the canonical growth query:
    * two self-referential aggregates meeting on the user key). The
    * cohort frame is USER-keyed — corpus-sized, so no broadcast hint:
    * both sides arrive user_id-partitioned from the same scan and the
    * join co-locates; AQE may still broadcast at small SF.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
    val cohorts = events.groupBy($"user_id")
      .agg(min($"day").as("cohort_day"))
    val activity = events.select($"user_id", $"day").distinct()
    activity
      .join(cohorts, "user_id")
      .withColumn("day_offset", datediff($"day", $"cohort_day").cast("long"))
      .filter($"day_offset".isin(0L, 1L, 7L))
      .groupBy($"cohort_day", $"day_offset")
      .agg(countDistinct($"user_id").as("active_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  /** B65b (B68) — PSI value-drift monitor: Population Stability Index
    * of `value` between the first and second halves of the stream —
    * THE standard drift gate before trusting a model/threshold trained
    * on the earlier window (PSI < 0.1 stable, > 0.25 retrain). Decile
    * boundaries come from the REFERENCE half only (one single-reduce
    * exact percentile, 4-dp strict-`>` cuts — the B45/B50 pattern);
    * both halves bucket scan-side, shares are exact integer ratios,
    * and the PSI terms (p2−p1)·ln(p2/p1) evaluate in identical IEEE
    * order both engines, 6-dp rounded. Output: per-bucket shares +
    * term, with the total PSI on every row.
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select($"value", expr("ts DIV 1000").as("us"))
    val midRow = ev.agg(expr("(min(us) + max(us)) div 2").as("m"))
      .collect()(0)
    if (midRow.isNullAt(0))  // empty events: no halves, no drift
      return Seq.empty[(Long, Double, Double, Double, Double)]
        .toDF("bucket", "p_ref", "p_cur", "term", "psi")
    val mid = midRow.getLong(0)
    val ref = ev.filter($"us" < mid)
    val cur = ev.filter($"us" >= mid)
    val qs = (1 to 9).map(_ / 10.0)
    val bRow = ref
      .agg(expr(s"percentile(value, array(${qs.mkString(",")}))").as("b"))
      .collect()(0)
    if (bRow.isNullAt(0))  // degenerate split (all events share one
      // timestamp): reference half is empty, PSI undefined
      return Seq.empty[(Long, Double, Double, Double, Double)]
        .toDF("bucket", "p_ref", "p_cur", "term", "psi")
    val bounds = bRow.getSeq[Double](0)
      .map(b => math.floor(b * 10000.0 + 0.5) / 10000.0)
    def bucket(c: Column): Column =
      bounds.foldLeft(lit(1L)) { (acc, b) =>
        acc + when(c > b, 1L).otherwise(0L)
      }
    def shares(d: DataFrame, nm: String): DataFrame = {
      val tot = d.count().toDouble
      d.groupBy(bucket($"value").as("bucket"))
        .agg((count(lit(1)) / tot).as(nm))
    }
    val j = shares(ref, "p_ref").join(shares(cur, "p_cur"), "bucket")
      .withColumn("term",
        ($"p_cur" - $"p_ref") * log($"p_cur" / $"p_ref"))
    val psi = j.agg(
      (floor(sum($"term") * 1000000.0 + 0.5) / 1000000.0).as("psi"))
    j.crossJoin(broadcast(psi))
      .select($"bucket",
        (floor($"p_ref" * 1000000.0 + 0.5) / 1000000.0).as("p_ref"),
        (floor($"p_cur" * 1000000.0 + 0.5) / 1000000.0).as("p_cur"),
        (floor($"term" * 1000000.0 + 0.5) / 1000000.0).as("term"),
        $"psi")
      .orderBy($"bucket")
  }

  /** B64 — behavioral-entropy profile: Shannon entropy of each user's
    * event-type distribution, rolled up to an entropy histogram
    * (0.25-bit bins) — low-entropy users are single-action bots/
    * scrapers, the behavioral analogue of E13's character-entropy
    * gibberish filter. Per-user type counts partial-aggregate; the
    * entropy fold is a scan-side expression over each user's ≤ types
    * rows (grouped collect of a SORTED 5-element list so the float
    * fold order is deterministic on both engines, no window); the
    * histogram is a second tiny rollup. Counts are exact integers into
    * ln; bins are quarter-bit integer floors → engine-portable.
    */
  def behaviorEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.load(spark, dir, "events")
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
      .groupBy($"user_id")
      .agg(sum($"c").as("n"), sort_array(collect_list($"c")).as("cs"))
      .select($"user_id",
        aggregate($"cs", lit(0.0), (acc, c) =>
          acc - c.cast("double") / $"n" *
            log(c.cast("double") / $"n")) .as("h_nats"))
      .select($"user_id",
        ($"h_nats" / log(lit(2.0))).as("h_bits"))
    per.select(floor($"h_bits" * 4.0).cast("long").as("qbin"))
      .groupBy($"qbin").agg(count(lit(1)).as("n_users"))
      .select(($"qbin".cast("double") / 4.0).as("entropy_bin"),
        $"n_users")
      .orderBy($"entropy_bin")
  }

  /** B62 — join-key skew report: the pre-flight diagnostic before any
    * user_id-keyed join/agg — per-key frequency profile summarized as
    * total keys/rows, mean rows per key, the max key's share, the
    * skew factor (max/mean — the number that decides between a plain
    * shuffle join, B22's salting, or B25's AQE split), and the top-5
    * heaviest keys. One partial-aggregable key count; every summary
    * statistic reduces from the keys-sized frame (second aggregate +
    * a keys-frame TakeOrdered) — the corpus is scanned once.
    */
  def skewReport(spark: SparkSession, dir: String,
                 topK: Int = 5): DataFrame = {
    import spark.implicits._
    val per = Tables.load(spark, dir, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("c"))
    val summary = per.agg(count(lit(1)).as("n_keys"),
      sum($"c").as("n_rows"), max($"c").as("max_rows"))
      .select(lit(0L).as("rank"), lit(null).cast("long").as("user_id"),
        $"n_keys", $"n_rows", $"max_rows",
        r4($"n_rows".cast("double") / $"n_keys").as("mean_rows"),
        r4($"max_rows".cast("double") * $"n_keys" / $"n_rows")
          .as("skew_factor"))
    val top = per.orderBy($"c".desc, $"user_id").limit(topK)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"c".desc, $"user_id")).cast("long").as("rank"),
        $"user_id", lit(null).cast("long").as("n_keys"),
        $"c".as("n_rows"), lit(null).cast("long").as("max_rows"),
        lit(null).cast("double").as("mean_rows"),
        lit(null).cast("double").as("skew_factor"))
    summary.unionByName(top).orderBy($"rank")
  }

  /** B61 — exponential retention-decay fit: pooled day-offset
    * retention rates (right-censoring-corrected — a user only counts
    * in offset d's denominator if their cohort is old enough to have
    * reached d) fitted by closed-form OLS on (d, ln r) — slope ⇒
    * churn half-life, the one-number retention summary next to B14's
    * raw counts and B44's matrix.
    *
    * Scale shape: cohort sizes and activity offsets are corpus-linear
    * partial aggregates; the fit runs over the ≤14-point offset frame
    * (a broadcast cross join of one aggregate row), so the regression
    * costs nothing at any corpus size. All sums are exact integers
    * until the single ln/ratio step; identical IEEE order both
    * engines, 6-dp floor-rounded.
    */
  def retentionFit(spark: SparkSession, dir: String,
                   maxOffset: Int = 14): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
    val cohorts = events.groupBy($"user_id")
      .agg(min($"day").as("cohort_day"))
    val maxDay = events.agg(max($"day").as("max_day"))
    val sizes = cohorts.groupBy($"cohort_day").agg(count(lit(1)).as("sz"))
    val denom = sizes
      .withColumn("off", explode(sequence(lit(1), lit(maxOffset))))
      .withColumn("day_offset", $"off".cast("long"))
      .crossJoin(broadcast(maxDay))
      .filter(expr("date_add(cohort_day, cast(day_offset as int))") <=
        $"max_day")
      .groupBy($"day_offset").agg(sum($"sz").as("n_eligible"))
    // cohorts is user-keyed (corpus-sized): no broadcast hint — the
    // join co-locates on the user_id partitioning both sides share
    val active = events.select($"user_id", $"day").distinct()
      .join(cohorts, "user_id")
      .withColumn("day_offset", datediff($"day", $"cohort_day").cast("long"))
      .filter($"day_offset" >= 1 && $"day_offset" <= maxOffset)
      .groupBy($"day_offset").agg(countDistinct($"user_id").as("n_active"))
    // lr = ln(rate) floors to integer 1e-9 units so the regression
    // sums are exact Long sums (partition-order independent — the
    // round-10 anova seam); sx/sxx are integer-valued doubles, exact
    // in any order. The unit floor biases each point ≤ 1e-9, orders
    // below the 1e-6 output quantum.
    val pts = denom.join(active, Seq("day_offset"))
      .withColumn("rate", $"n_active".cast("double") / $"n_eligible")
      .withColumn("d", $"day_offset".cast("double"))
      .withColumn("lru",
        floor(log($"rate") * 1000000000.0 + 0.5).cast("long"))
    val f = pts.agg(count(lit(1)).cast("double").as("np"),
      sum($"d").as("sx"), sum($"lru").as("syu"),
      sum($"day_offset" * $"lru").as("sxyu"),
      sum($"d" * $"d").as("sxx"))
      .select($"np", $"sx",
        ($"syu".cast("double") / 1000000000.0).as("sy"),
        ($"sxyu".cast("double") / 1000000000.0).as("sxy"), $"sxx")
      .select($"np", $"sx", $"sy",
        (($"np" * $"sxy" - $"sx" * $"sy") /
          ($"np" * $"sxx" - $"sx" * $"sx")).as("slope"))
      .select($"np", $"slope",
        (($"sy" - $"slope" * $"sx") / $"np").as("intercept"))
    pts.crossJoin(broadcast(f))
      .select($"day_offset", $"n_eligible", $"n_active",
        r6($"rate").as("rate"),
        r6(exp($"intercept" + $"slope" * $"d")).as("fit_rate"),
        r6(log(lit(2.0)) / -$"slope").as("half_life_days"))
      .orderBy($"day_offset")
  }

  /** B44 — weekly cohort retention MATRIX: B14's growth query
    * completed into the full (cohort week × week offset) grid with
    * retention RATES — the heat-map product analytics actually ships.
    * Weeks are integer epoch-µs divisions (no calendar alignment
    * needed for a retention grid; both engines floor the same
    * non-negative integers).
    *
    * Scale shape: first-seen week and distinct (user, week) activity
    * are both user_id-keyed corpus-linear aggregates; their join is
    * co-partitioned on user_id (NO users-sized broadcast — B14's
    * broadcast is fine for day-windows, a 100 TB cohort dim is not).
    * The matrix itself is weeks²-bounded; cohort sizes broadcast back
    * onto it.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wkUs = 7L * 86400L * 1000000L
    val wk = Tables.load(spark, dir, "events")
      .select($"user_id", expr(s"(ts DIV 1000) DIV $wkUs").as("w"))
    val cohorts = wk.groupBy($"user_id").agg(min($"w").as("cw"))
    val active = wk.distinct()
    val matrix = active.join(cohorts, "user_id")
      .groupBy($"cw", ($"w" - $"cw").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cohorts.groupBy($"cw").agg(count(lit(1)).as("cohort_size"))
    matrix.join(broadcast(sizes), "cw")
      .select($"cw".as("cohort_week"), $"week_offset", $"n_users",
        (floor($"n_users".cast("double") / $"cohort_size" * 1000000.0 + 0.5)
          .cast("double") / 1000000.0).as("retention"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** B15 — pivot/crosstab: event counts per type as columns keyed by
    * user cohort decile (`groupBy().pivot()` with an explicit value
    * list keeps the schema static — the scale-safe pivot form).
    */
  def typePivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("user_bucket", ($"user_id" % 10).cast("int"))
      .groupBy($"user_bucket")
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_bucket")
  }

  /** B20 — exact percentiles (median/p90/p99 of value per type):
    * linear-interpolation percentile, the tail-latency staple.
    * Computed via [[RankSelect.groupedQuantiles]]: below its gate this
    * is the one-pass Percentile aggregate as before; above it, the
    * equal-frequency bucketed rank selection — the Percentile
    * aggregate buffers every value of a group in one in-memory map,
    * which cannot survive groups that are terabytes of doubles, while
    * the rank-selection path's state is buckets × groups counters.
    * Both paths produce bit-identical values (RankSelectSpec).
    */
  def valuePercentiles(spark: SparkSession, dir: String,
                       gateRows: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
    if (ev.count() <= gateRows) {
      // small data: the one-pass Percentile aggregate as always
      // (the count gate itself is a parquet metadata read)
      def p(q: Double) =
        floor(expr(s"percentile(value, $q)") * 10000.0 + 0.5)
          .cast("double") / 10000.0
      return ev.groupBy($"event_type")
        .agg(p(0.5).as("p50"), p(0.9).as("p90"), p(0.99).as("p99"),
          count(lit(1)).as("n"))
        .orderBy($"event_type")
    }
    val sel = RankSelect.groupedQuantiles(ev, $"event_type", $"value",
      Seq(0.5, 0.9, 0.99), smallGate = 0L)
    def r4(v: Double): Double = math.floor(v * 10000.0 + 0.5) / 10000.0
    val pv = sel.toSeq
      .map { case (g, (_, vs)) => (g, r4(vs(0)), r4(vs(1)), r4(vs(2))) }
      .toDF("event_type", "p50", "p90", "p99")
    ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .join(broadcast(pv), Seq("event_type"), "left")
      .select($"event_type", $"p50", $"p90", $"p99", $"n")
      .orderBy($"event_type")
  }

  /** B35 — sketch-based approximate percentiles: `approx_percentile`
    * (Greenwald-Khanna/KLL-style mergeable quantile summary) next to
    * the exact values — the constant-memory companion to B20 the same
    * way B13 (HLL) is to exact distinct. At 100 TB the exact
    * percentile must materialize each group's values; the sketch
    * partial-aggregates in fixed space per partition and merges.
    * Approximation is engine-specific → rows-only driver check; the
    * rank-error bound vs the exact values is spec-asserted.
    */
  def approxPercentiles(spark: SparkSession, dir: String,
                        accuracy: Int = 10000): DataFrame = {
    import spark.implicits._
    def ap(q: Double) =
      expr(s"approx_percentile(value, $q, $accuracy)")
    def p(q: Double) =
      floor(expr(s"percentile(value, $q)") * 10000.0 + 0.5)
        .cast("double") / 10000.0
    Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(ap(0.5).as("p50_approx"), ap(0.9).as("p90_approx"),
        ap(0.99).as("p99_approx"), p(0.5).as("p50_exact"),
        p(0.9).as("p90_exact"), p(0.99).as("p99_exact"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** B21 — CUBE: all grouping-set combinations of (type, user bucket)
    * in one pass.
    */
  def typeBucketCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("user_bucket", ($"user_id" % 4).cast("long"))
      .cube($"event_type", $"user_bucket")
      .agg(count(lit(1)).as("n"), sum2($"value").as("total_value"))
      .orderBy($"event_type".asc_nulls_first, $"user_bucket".asc_nulls_first)
  }

  /** Latest-snapshot compaction (CDC shape): one row per key holding
    * the most recent event's payload. Implemented as `max(struct(ts,
    * id, payload…))` — an ASSOCIATIVE argmax that partial-aggregates
    * map-side, so the shuffle carries one row per (partition, key).
    * The window-function formulation (row_number DESC = 1) would
    * shuffle every raw row and sort; this shape is the one that
    * compacts a 100 TB changelog. (ts, event_id) is unique, so the
    * trailing struct fields never decide the ordering.
    */
  /** B42 — SCD type-2 interval build: collapse each user's ordered
    * event-type changelog into validity intervals [valid_from_us,
    * valid_to_us) — consecutive same-type events merge into one run,
    * the open (current) run has a NULL valid_to. This is the
    * dimension-history build every warehouse pipeline runs over its
    * changelogs.
    *
    * Scale shape: ONE shuffle on user_id feeds both stacked windows
    * and the run rollup (same partitioning reused across stages); the
    * second window runs over runs, not raw rows. (ts, event_id) is a
    * unique ordering, so run boundaries are deterministic.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val runs = Tables.load(spark, dir, "events")
      .select($"user_id", expr("ts DIV 1000").as("us"), $"event_id",
        $"event_type")
      .withColumn("chg",
        when(lag($"event_type", 1).over(byUser).isNull ||
          lag($"event_type", 1).over(byUser) =!= $"event_type", 1L)
          .otherwise(0L))
      .withColumn("run_id",
        sum($"chg").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"run_id")
      .agg(first($"event_type").as("state"),
        min($"us").as("valid_from_us"), count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy($"user_id").orderBy($"run_id")
    runs
      .withColumn("valid_to_us", lead($"valid_from_us", 1).over(byRun))
      .select($"user_id", $"run_id", $"state", $"valid_from_us",
        $"valid_to_us",
        when($"valid_to_us".isNull, 1).otherwise(0).as("is_current"),
        $"n_events")
      .orderBy($"user_id", $"run_id")
  }

  /** B43 — first-order Markov transition matrix over per-user event
    * sequences: P(next_type | prev_type) from adjacent pairs in
    * (ts, event_id) order — the behavioral-model building block next
    * to B11's fixed funnel. Pair extraction is one user_id-keyed
    * window pass; the matrix aggregate is map-side combined down to
    * ≤ types² rows, and the row-normalizing window spans only those.
    */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val pairs = Tables.load(spark, dir, "events")
      .select($"user_id", expr("ts DIV 1000").as("us"), $"event_id",
        $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy($"prev_type")
    pairs
      .withColumn("p",
        floor($"n".cast("double") / sum($"n").over(byPrev) * 1000000.0
          + 0.5) / 1000000.0)
      .select($"prev_type", $"next_type", $"n", $"p")
      .orderBy($"prev_type", $"next_type")
  }

  /** B41 — calendar gap fill (time-series densification): per-type
    * daily counts re-gridded onto the full min..max day calendar with
    * zero backfill — the densify step every downstream window/trend
    * computation assumes (a missing day must read as 0, not as an
    * absent row). The corpus collapses to the types×days aggregate
    * FIRST; the calendar grid is a cross join of two tiny frames
    * (bounded by type count × calendar span at any corpus size), so
    * the fill join never touches corpus-sized data.
    */
  def dailyGapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byDay = Tables.load(spark, dir, "events")
      .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
    val days = byDay.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
    val types = byDay.select($"event_type").distinct()
    types.crossJoin(days)
      .join(byDay, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("n"))
      .select($"event_type", $"day", $"n")
      .orderBy($"event_type", $"day")
  }

  /** B40 — robust outlier detection via the modified z-score
    * (Iglewicz–Hoaglin): per event type, median + MAD (median absolute
    * deviation) of `value`, flag |0.6745·(v−med)/MAD| > cutoff. Means/
    * stddevs break under the heavy tails event values actually have;
    * the MAD estimator doesn't. The z is floor-rounded to 4dp BEFORE
    * the cutoff compare so both engines threshold identical doubles
    * (same guard the percentile ops use).
    *
    * Scale shape: two grouped exact-percentile passes (types-sized
    * results, broadcast back) + one scan-side flag projection — the
    * corpus shuffles only into the percentile aggregates below the
    * gate; above it both medians come from [[RankSelect]], whose
    * per-task state is bucket counters instead of the group's values.
    */
  def madOutliers(spark: SparkSession, dir: String,
                  cutoff: Double = 3.5,
                  gateRows: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
    // same gate-and-convert as B20: the exact Percentile aggregate
    // below the gate, RankSelect bucketed rank selection above it —
    // bit-identical medians either way (RankSelectSpec), so the gate
    // can never move a flagged outlier
    val (med, mad) =
      if (events.count() <= gateRows) {
        val m = events.groupBy($"event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val d = events.join(broadcast(m), "event_type")
          .groupBy($"event_type")
          .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        (m, d)
      } else {
        val mSel = RankSelect.groupedQuantiles(events, $"event_type",
          $"value", Seq(0.5), smallGate = 0L)
        val m = mSel.toSeq.map { case (g, (_, vs)) => (g, vs(0)) }
          .toDF("event_type", "med")
        val dev = events.join(broadcast(m), "event_type")
          .select($"event_type", abs($"value" - $"med").as("ad"))
        val dSel = RankSelect.groupedQuantiles(dev, $"event_type",
          $"ad", Seq(0.5), smallGate = 0L)
        val d = dSel.toSeq.map { case (g, (_, vs)) => (g, vs(0)) }
          .toDF("event_type", "mad")
        (m, d)
      }
    events
      .join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .filter($"mad" > 0)
      .withColumn("rz",
        floor(lit(0.6745) * ($"value" - $"med") / $"mad" * 10000.0 + 0.5)
          .cast("double") / 10000.0)
      .filter(abs($"rz") > cutoff)
      .select($"event_id", $"event_type",
        (floor($"value" * 10000.0 + 0.5).cast("double") / 10000.0)
          .as("value"),
        $"rz")
      .orderBy($"event_id")
  }

  /** B46 — last-touch marketing attribution: every purchase is
    * credited to the user's most recent prior touch event (click or
    * view) within a lookback window; purchases with no in-window touch
    * credit to 'direct'. The per-channel report (purchase count +
    * attributed revenue) is the standard conversion-attribution shape.
    *
    * Scale shape: NO inequality join (the naive purchase×touch range
    * join is quadratic per user) — one user_id-keyed shuffle, one
    * window pass: `last(touch_struct, ignoreNulls)` over rows strictly
    * before the current row in (ts, event_id) order carries the latest
    * touch to each purchase, then a channels-sized rollup.
    */
  def attribution(spark: SparkSession, dir: String,
                  lookbackDays: Int = 7): DataFrame = {
    import spark.implicits._
    val lookbackUs = lookbackDays * 86400L * 1000000L
    val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(spark, dir, "events")
      .filter($"event_type".isin("click", "view", "purchase"))
      .select($"user_id", expr("ts DIV 1000").as("us"), $"event_id",
        $"event_type", $"value")
      .withColumn("touch", last(
        when($"event_type".isin("click", "view"),
          struct($"us".as("tus"), $"event_type".as("channel"))),
        ignoreNulls = true).over(byUser))
      .filter($"event_type" === "purchase")
      .withColumn("channel",
        when($"touch".isNotNull && $"us" - $"touch.tus" <= lookbackUs,
          $"touch.channel").otherwise(lit("direct")))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum2($"value").as("attributed_revenue"))
      .orderBy($"channel")
  }

  /** B70 — FIRST-touch attribution (the acquisition-credit complement
    * of B46's last-touch): each purchase credits the EARLIEST
    * click/view within the 7-day lookback, else 'direct'. Unlike
    * last-touch, "first within a bounded window" has no clean
    * running-state window form (a range frame over a tie-able order
    * column is nondeterministic), so the shape is a range join with
    * the A25 argmin trick: ONE partial-aggregable
    * min(struct(tus, tid, channel)) per purchase picks the earliest
    * touch deterministically (event-id tiebreak), no window over the
    * join result.
    *
    * Scale shape (the B49 day-bucket trick): a raw user-keyed
    * inequality join fans out purchases×touches per user — one
    * hyperactive key (a bot with 10^4 purchases and 10^6 touches in
    * the window) funnels 10^10 intermediate rows through a single
    * reducer. Instead touches are keyed by (user_id, day) and each
    * purchase is exploded to its ≤ lookbackDays+1 covering day
    * buckets, so the join is a plain equi-join on (user_id, day) with
    * the time-range predicate left as a residual: fan-out per joined
    * row is bounded by that user's touches IN ONE DAY, and the hot
    * key spreads across (days) reducers. The argmin still combines
    * map-side, so duplicate day-bucket matches never materialize past
    * the partial aggregate. PlanAuditSpec pins the equi-key form.
    */
  def firstTouchAttribution(spark: SparkSession, dir: String,
                            lookbackDays: Int = 7): DataFrame = {
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    val lookbackUs = lookbackDays * dayUs
    val ev = Tables.load(spark, dir, "events")
      .filter($"event_type".isin("click", "view", "purchase"))
      .select($"user_id", expr("ts DIV 1000").as("us"), $"event_id",
        $"event_type", $"value")
    val touches = ev.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"us".as("tus"), $"event_id".as("tid"),
        $"event_type".as("tchannel"))
      .withColumn("day", expr(s"tus DIV ${dayUs}L"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"us", $"value")
      .withColumn("day", explode(sequence(
        expr(s"(us - ${lookbackUs}L) DIV ${dayUs}L"),
        expr(s"us DIV ${dayUs}L"))))
    purchases.as("p")
      .join(touches.as("t"),
        $"p.user_id" === $"t.user_id" && $"p.day" === $"t.day" &&
          $"tus" < $"p.us" && $"p.us" - $"tus" <= lookbackUs, "left")
      .groupBy($"p.event_id", $"p.value")
      // gate the struct on a matched row: an exploded purchase mixes
      // matched and unmatched day buckets, and an ungated
      // struct(null,null,null) would sort below every real touch
      .agg(min(when($"tus".isNotNull,
        struct($"tus", $"tid", $"tchannel"))).as("ft"))
      .select($"p.value",
        when($"ft.tus".isNotNull, $"ft.tchannel")
          .otherwise(lit("direct")).as("channel"))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"),
        sum2($"value").as("attributed_revenue"))
      .orderBy($"channel")
  }

  def latestState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(max(struct(expr("ts DIV 1000").as("us"), $"event_id",
        $"event_type",
        (floor($"value" * 100.0 + 0.5).cast("double") / 100.0).as("v")))
        .as("last"))
      .select($"user_id", $"last.us".as("last_us"),
        $"last.event_id".as("last_event_id"),
        $"last.event_type".as("last_type"),
        $"last.v".as("last_value"))
      .orderBy($"user_id")
  }

  /** B22 — salted big-big skew join: ~60% of the fact lands on one
    * synthesized hot key, so a plain shuffle join would funnel those
    * rows through a single reducer. The fact side carries a
    * deterministic salt (event_id % salts); the dim side is replicated
    * ×salts, and the join runs on (key, salt) — the hot key spreads
    * across `salts` reducers. `shuffle_hash` hint keeps the exchange
    * in the plan (an auto-broadcast would hide the shape this op
    * demonstrates; at 100 TB the dim side is assumed over the
    * broadcast threshold, and AQE skew-join is the complementary
    * runtime fallback). Equal to the unsalted join (the oracle).
    */
  def skewJoin(spark: SparkSession, dir: String, salts: Int = 16): DataFrame = {
    import spark.implicits._
    val fact = Tables.load(spark, dir, "events")
      .withColumn("skew_key",
        when($"event_type".isin("view", "click", "error"), 0L)
          .otherwise($"user_id" % 50))
      .withColumn("salt", ($"event_id" % salts).cast("int"))
    val dim = spark.range(0, 50).select($"id".as("skew_key"),
      (($"id" * 7 + 3) % 11).as("weight"))
    val dimSalted = dim.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    fact.join(dimSalted.hint("shuffle_hash"), Seq("skew_key", "salt"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        r2(usum(u2($"value") * $"weight").cast("double") / 100.0)
          .as("weighted_value"))
      .orderBy($"event_type")
  }

  /** B23 — FULL OUTER join of two per-(user, day) aggregates: signup
    * vs purchase activity including one-sided user-days (~40% each
    * side here). The join key carries both columns, so the two
    * aggregates arrive identically partitioned and the outer join
    * reuses the shuffle; nulls become explicit zeros.
    */
  def dailyActivityJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byDay = Tables.load(spark, dir, "events")
      .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
    def side(t: String, out: String) =
      byDay.filter($"event_type" === t)
        .groupBy($"user_id", $"day").agg(count(lit(1)).as(out))
    side("signup", "n_signups")
      .join(side("purchase", "n_purchases"), Seq("user_id", "day"), "full_outer")
      .select($"user_id", $"day",
        coalesce($"n_signups", lit(0L)).as("n_signups"),
        coalesce($"n_purchases", lit(0L)).as("n_purchases"))
      .orderBy($"user_id", $"day")
  }

  /** B52 — trailing-window anomaly detection: each (event_type, day)
    * daily total z-scored against the previous ≤28 observed days
    * (mean/std from windowed sum/sumsq — the same formulation on any
    * engine), flagging |z| spikes. The monitoring query a pipeline
    * runs over its own ingest volumes.
    *
    * Scale shape: the corpus contributes one map-side-combined daily
    * aggregate; the window runs over the (type × day)-sized frame —
    * thousands of rows at 100 TB — partitioned by type, so no global
    * sort and no skew.
    */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    anomalyFinalize(
      Tables.load(spark, dir, "events")
        .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
        .groupBy($"event_type", $"day")
        .agg(usum(u2($"value")).cast("long").as("vc")))
  }

  /** B52's z-score finalizer over an already-built (event_type, day, v)
    * daily-total frame — shared with the G16 streaming twin, whose
    * state maintains the daily totals incrementally and hands the
    * compact (type × day) frame here.
    */
  private[graft] def anomalyFinalize(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    // daily carries integer-cents totals (`vc`): the ≤28-row window
    // moments are then EXACT (Long / DECIMAL sums), so the z-score
    // derives from the identical integers in both engines no matter
    // how either engine evaluates the frame
    val win = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-28, -1)
    val s1d = $"s1".cast("double") / 100.0
    daily
      .withColumn("n_prior", count($"vc").over(win))
      .withColumn("s1", sum($"vc").over(win))
      .withColumn("s2", sum(($"vc".cast("decimal(38,0)") * $"vc"))
        .over(win))
      .filter($"n_prior" >= 7)
      .withColumn("v", $"vc".cast("double") / 100.0)
      .withColumn("z_score",
        floor(($"v" - s1d / $"n_prior") /
          sqrt(greatest(($"s2".cast("double") / 10000.0
            - s1d * s1d / $"n_prior")
            / ($"n_prior" - 1), lit(1e-12))) * 10000.0 + 0.5)
          .cast("double") / 10000.0)
      .select($"event_type", $"day",
        r2($"v").as("daily_value"), $"n_prior", $"z_score",
        ($"z_score" >= 3.0).cast("int").as("is_spike"))
      .orderBy($"event_type", $"day")
  }

  /** B53 — Pareto value concentration (the "whale curve"): the share
    * of total event value carried by the top 1/10/20/50% of users —
    * the revenue-concentration report behind every "top X% of users
    * drive Y%" statement. Per-user totals round to integer CENTS
    * before ranking, so cumulative sums and shares are integer-exact
    * on any engine; the global value-desc rank is computed with E32's
    * digit-count-bucket trick (ordered ranges + broadcast offsets),
    * never a single-partition sort.
    */
  /** B55 — Welch's unequal-variance t-test between every pair of
    * event types on `value` — the A/B significance readout (t statistic
    * + Welch–Satterthwaite df) every experiment dashboard computes.
    * Group moments come from ONE partial-aggregable pass (n, Σv, Σv²);
    * the pairing is a self-join of the TYPES-sized moment frame (5
    * rows — broadcast-trivial at any corpus size), so the corpus is
    * scanned exactly once and nothing row-sized ever shuffles. Means,
    * t, and df are derived with the same IEEE expression order both
    * engines and 4-dp floor-rounded.
    */
  def abTTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.load(spark, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        usum(u2($"value")).as("s1c"),
        usum(u2($"value") * u2($"value")).as("s2c"))
      .select($"event_type", $"n",
        ($"s1c".cast("double") / 100.0 / $"n").as("m"),
        (($"s2c".cast("double") / 10000.0 -
          ($"s1c".cast("double") / 100.0) *
          ($"s1c".cast("double") / 100.0) / $"n") / ($"n" - 1)).as("v"))
    val a = m.select($"event_type".as("type_a"), $"n".as("na"),
      $"m".as("ma"), $"v".as("va"))
    val b = m.select($"event_type".as("type_b"), $"n".as("nb"),
      $"m".as("mb"), $"v".as("vb"))
    val sea = $"va" / $"na"
    val seb = $"vb" / $"nb"
    val se2 = sea + seb
    a.join(b, $"type_a" < $"type_b")
      .select($"type_a", $"type_b",
        $"na".cast("long").as("n_a"), $"nb".cast("long").as("n_b"),
        r4($"ma").as("mean_a"), r4($"mb").as("mean_b"),
        r4(($"ma" - $"mb") / sqrt(se2)).as("t_stat"),
        r4(se2 * se2 /
          (sea * sea / ($"na" - 1) + seb * seb / ($"nb" - 1)))
          .as("df_welch"))
      .orderBy($"type_a", $"type_b")
  }

  /** B75 — Mann–Whitney U (Wilcoxon rank-sum) test between every
    * event-type pair on `value`: the NONPARAMETRIC complement of
    * B55's Welch t — rank-based, so a heavy tail or outlier burst
    * that invalidates the t-test's mean/variance machinery leaves U
    * untouched. Tie-corrected normal approximation with the exact
    * tie term.
    *
    * Scale shape: E43's pair-grid discipline on events — ONE corpus
    * pass to (type, cent-value) counts, then every rank quantity
    * derives from prefix sums over the types²×values grid
    * (post-aggregate small; the oracle's formulation ranks every raw
    * row instead). Rank sums are kept in INTEGER HALF-UNITS
    * (2·R₁ = Σ cₐ·(2·below + t + 1)), so the aggregation is
    * order-free Long arithmetic and the z derives from exact
    * integers with one division chain both engines execute
    * identically.
    */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables.load(spark, dir, "events")
      .select($"event_type",
        floor($"value" * 100.0 + 0.5).cast("long").as("x"))
      .groupBy($"event_type", $"x")
      .agg(count(lit(1)).as("c"))
    val ns = cnt.groupBy($"event_type").agg(sum($"c").as("n"))
    val types = ns.select($"event_type".as("t2"))
    val left = cnt.join(broadcast(types), $"event_type" < $"t2")
      .select($"event_type".as("type_a"), $"t2".as("type_b"), $"x",
        $"c".as("ia"), lit(0L).as("ib"))
    val right = cnt.join(broadcast(types), $"t2" < $"event_type")
      .select($"t2".as("type_a"), $"event_type".as("type_b"), $"x",
        lit(0L).as("ia"), $"c".as("ib"))
    val steps = left.unionAll(right)
      .groupBy($"type_a", $"type_b", $"x")
      .agg(sum($"ia").as("ca"), sum($"ib").as("cb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"type_a", $"type_b").orderBy($"x")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val na = ns.select($"event_type".as("type_a"), $"n".as("n_a"))
    val nb = ns.select($"event_type".as("type_b"), $"n".as("n_b"))
    val agg = steps
      .withColumn("cuma", sum($"ca").over(w))
      .withColumn("cumb", sum($"cb").over(w))
      .withColumn("below", ($"cuma" - $"ca") + ($"cumb" - $"cb"))
      .withColumn("t", $"ca" + $"cb")
      .groupBy($"type_a", $"type_b")
      .agg(sum($"ca" * (lit(2L) * $"below" + $"t" + 1L)).as("r2"),
        sum($"t" * $"t" * $"t" - $"t").as("tsum"))
      .join(broadcast(na), "type_a")
      .join(broadcast(nb), "type_b")
    val nn = $"n_a" + $"n_b"
    val varU = ($"n_a" * $"n_b").cast("double") / 12.0 *
      ((nn + 1L).cast("double") -
        $"tsum".cast("double") / (nn.cast("double") * (nn - 1L).cast("double")))
    val u = ($"r2" - $"n_a" * ($"n_a" + 1L)).cast("double") / 2.0
    val z = (u - ($"n_a" * $"n_b").cast("double") / 2.0) / sqrt(varU)
    agg.select($"type_a", $"type_b", $"n_a", $"n_b",
        u.as("u_stat"),
        (floor(z * 1000000.0 + 0.5) / 1000000.0).as("z_stat"),
        (abs(z) > 1.96).as("reject_05"))
      .orderBy($"type_a", $"type_b")
  }

  /** B56 — weekly seasonality profile: per (ISO weekday, event_type)
    * volume, share of the type's total, and a seasonality index vs the
    * uniform-weekday expectation (index > 1 = that weekday
    * over-indexes) — the load-shaping/staffing view every event stream
    * gets. One partial-aggregable groupBy to a ≤ 7×types frame; the
    * per-type total is a window over that tiny frame, not the corpus.
    */
  def dowProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
    Tables.load(spark, dir, "events")
      .select((weekday(timestamp_micros(expr("ts DIV 1000"))) + 1)
        .cast("long").as("isodow"), $"event_type")
      .groupBy($"isodow", $"event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("type_total", sum($"n").over(w))
      .select($"isodow", $"event_type", $"n",
        r4($"n".cast("double") / $"type_total").as("share"),
        r4($"n".cast("double") * 7.0 / $"type_total").as("idx"))
      .orderBy($"isodow", $"event_type")
  }

  def userValueConcentration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(usum(u2($"value")).cast("long").as("v_cents"))
      // sign-aware digit-count bucket (see giniIndex): bucket-desc
      // order equals value-desc order for negative totals too
      .withColumn("bkt", when($"v_cents" >= 0,
        length($"v_cents".cast("string")))
        .otherwise(-length($"v_cents".cast("string"))))
    val off = Window.orderBy($"bkt".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = per.groupBy($"bkt")
      .agg(count(lit(1)).as("bn"), sum($"v_cents").as("bv"))
      .withColumn("rank_off", coalesce(sum($"bn").over(off), lit(0L)))
      .withColumn("cum_off", coalesce(sum($"bv").over(off), lit(0L)))
      .select($"bkt", $"rank_off", $"cum_off")
    val w = Window.partitionBy($"bkt").orderBy($"v_cents".desc, $"user_id")
    val ranked = per.join(broadcast(offsets), "bkt")
      .withColumn("rank", row_number().over(w).cast("long") + $"rank_off")
      .withColumn("cum",
        sum($"v_cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
          + $"cum_off")
    val totals = broadcast(ranked.agg(max($"rank").as("n_users"),
      max($"cum").as("total_cents")))
    val th = broadcast(Seq(0.01, 0.1, 0.2, 0.5).toDF("user_frac"))
    ranked.crossJoin(totals).crossJoin(th)
      .filter($"rank" <= ceil($"user_frac" * $"n_users"))
      .groupBy($"user_frac")
      .agg(max(ceil($"user_frac" * $"n_users")).cast("long").as("n_top"),
        max($"cum").as("top_cents"),
        (floor(max($"cum").cast("double") / max($"total_cents")
          * 1000000.0 + 0.5) / 1000000.0).as("value_share"))
      .orderBy($"user_frac")
  }

  /** B69 — Gini coefficient of per-user value (the single-number
    * inequality summary next to B53's Pareto curve): computed from
    * the rank formula G = 2((n+1)T − Σ rank·v)/(nT) − (n+1)/n over
    * integer cents, so everything is EXACT integer arithmetic until
    * one final division. Global ranks come from the H7 bucketed-
    * offset machinery (sign-aware digit-count buckets + broadcast
    * offsets) — no single-partition window over users; the oracle's
    * naive row_number formulation proves the bucketed ranks equal a
    * global sort's. The bucket key is ±length(string): for v ≥ 0 more
    * digits = bigger, for v < 0 the negated length puts shorter
    * (closer-to-zero) strings first — so bucket-desc order equals
    * value-desc order even when a user's total is negative
    * (refunds/adjustments), exercised in EventsSpec.
    */
  def giniIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.load(spark, dir, "events")
      .groupBy($"user_id")
      .agg(usum(u2($"value")).cast("long").as("v_cents"))
    giniOfPerUser(per)
  }

  private[graft] def giniOfPerUser(perUser: DataFrame): DataFrame = {
    import perUser.sparkSession.implicits._
    val per = perUser
      .withColumn("bkt", when($"v_cents" >= 0,
        length($"v_cents".cast("string")))
        .otherwise(-length($"v_cents".cast("string"))))
    val off = Window.orderBy($"bkt".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = per.groupBy($"bkt")
      .agg(count(lit(1)).as("bn"))
      .withColumn("rank_off", coalesce(sum($"bn").over(off), lit(0L)))
      .select($"bkt", $"rank_off")
    val w = Window.partitionBy($"bkt").orderBy($"v_cents".desc, $"user_id")
    val ranked = per.join(broadcast(offsets), "bkt")
      .withColumn("rank", row_number().over(w).cast("long") + $"rank_off")
    // decimal-cast BEFORE the rank·value product (and in the n·t
    // terms): Long×Long wraps once rank×cents passes ~9e18 — real at
    // the 100 TB user counts; the oracle multiplies in HUGEINT
    ranked.agg(count(lit(1)).as("n"), sum($"v_cents").as("t"),
      sum($"rank".cast("decimal(38,0)") * $"v_cents").as("srv"))
      .select($"n",
        (floor(((lit(2.0) * (($"n" + 1).cast("decimal(38,0)") * $"t"
          - $"srv")) / ($"n".cast("decimal(38,0)") * $"t")
          - ($"n" + 1).cast("double") / $"n") * 1000000.0 + 0.5)
          / 1000000.0).as("gini"))
  }

  val oracles: Map[String, String] = Map(
    "events_mannwhitney" ->
      """WITH cnt AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
        |    count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |ns AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
        |       FROM cnt GROUP BY 1),
        |st AS (
        |  SELECT a.event_type AS type_a, b.t2 AS type_b, a.x,
        |    a.c AS ia, 0::BIGINT AS ib
        |  FROM cnt a JOIN (SELECT event_type AS t2 FROM ns) b
        |    ON a.event_type < b.t2
        |  UNION ALL
        |  SELECT b.t2, a.event_type, a.x, 0::BIGINT, a.c
        |  FROM cnt a JOIN (SELECT event_type AS t2 FROM ns) b
        |    ON b.t2 < a.event_type),
        |g AS (SELECT type_a, type_b, x,
        |    CAST(sum(ia) AS BIGINT) AS ca,
        |    CAST(sum(ib) AS BIGINT) AS cb
        |  FROM st GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT type_a, type_b, x, ca, cb,
        |    CAST(sum(ca) OVER w AS BIGINT) AS cuma,
        |    CAST(sum(cb) OVER w AS BIGINT) AS cumb
        |  FROM g WINDOW w AS (PARTITION BY type_a, type_b ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |ag AS (
        |  SELECT type_a, type_b,
        |    CAST(sum(ca * (2 * ((cuma - ca) + (cumb - cb))
        |      + (ca + cb) + 1)) AS BIGINT) AS r2,
        |    CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
        |      AS BIGINT) AS tsum
        |  FROM cum GROUP BY 1, 2),
        |j AS (
        |  SELECT ag.type_a, ag.type_b, ag.r2, ag.tsum,
        |    na.n AS n_a, nb.n AS n_b,
        |    (ag.r2 - na.n * (na.n + 1))::DOUBLE / 2.0 AS u,
        |    sqrt((na.n * nb.n)::DOUBLE / 12.0
        |      * ((na.n + nb.n + 1)::DOUBLE - ag.tsum::DOUBLE
        |        / ((na.n + nb.n)::DOUBLE * (na.n + nb.n - 1)::DOUBLE)))
        |      AS sd
        |  FROM ag JOIN ns na ON na.event_type = ag.type_a
        |  JOIN ns nb ON nb.event_type = ag.type_b)
        |SELECT type_a, type_b, n_a, n_b, u AS u_stat,
        |  floor((u - (n_a * n_b)::DOUBLE / 2.0) / sd
        |    * 1000000.0 + 0.5) / 1000000.0 AS z_stat,
        |  abs((u - (n_a * n_b)::DOUBLE / 2.0) / sd) > 1.96 AS reject_05
        |FROM j ORDER BY type_a, type_b""".stripMargin,
    "events_gini" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT))
        |      AS BIGINT) AS v
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT v, row_number() OVER (ORDER BY v DESC, user_id)
        |    AS rank
        |  FROM per),
        |a AS (
        |  SELECT count(*)::BIGINT AS n, CAST(sum(v) AS BIGINT) AS t,
        |    sum(rank::HUGEINT * v) AS srv
        |  FROM r)
        |SELECT n, floor(((2.0 * ((n + 1)::HUGEINT * t - srv))
        |  / (n::HUGEINT * t)
        |  - (n + 1)::DOUBLE / n) * 1000000.0 + 0.5) / 1000000.0
        |  AS gini
        |FROM a""".stripMargin,
    "events_psi_drift" -> {
      val qlist = (1 to 9).map(_ / 10.0).mkString(", ")
      s"""WITH e AS (
        |  SELECT value, epoch_us(ts) AS us FROM events),
        |mm AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
        |refh AS (SELECT value FROM e, mm WHERE us < mid),
        |curh AS (SELECT value FROM e, mm WHERE us >= mid),
        |bs AS (
        |  SELECT list_transform(quantile_cont(value, [$qlist]),
        |    x -> floor(x * 10000.0 + 0.5) / 10000.0) AS b
        |  FROM refh),
        |rb AS (
        |  SELECT (1 + len(list_filter(bs.b, x -> r.value > x)))::BIGINT
        |    AS bucket
        |  FROM refh r, bs),
        |cb AS (
        |  SELECT (1 + len(list_filter(bs.b, x -> c.value > x)))::BIGINT
        |    AS bucket
        |  FROM curh c, bs),
        |rs AS (
        |  SELECT bucket,
        |    count(*)::DOUBLE / (SELECT count(*) FROM refh) AS p_ref
        |  FROM rb GROUP BY bucket),
        |cs AS (
        |  SELECT bucket,
        |    count(*)::DOUBLE / (SELECT count(*) FROM curh) AS p_cur
        |  FROM cb GROUP BY bucket),
        |j AS (
        |  SELECT rs.bucket, rs.p_ref, cs.p_cur,
        |    (cs.p_cur - rs.p_ref) * ln(cs.p_cur / rs.p_ref) AS term
        |  FROM rs JOIN cs ON cs.bucket = rs.bucket),
        |tot AS (
        |  SELECT floor(sum(term) * 1000000.0 + 0.5) / 1000000.0 AS psi
        |  FROM j)
        |SELECT j.bucket,
        |  floor(j.p_ref * 1000000.0 + 0.5) / 1000000.0 AS p_ref,
        |  floor(j.p_cur * 1000000.0 + 0.5) / 1000000.0 AS p_cur,
        |  floor(j.term * 1000000.0 + 0.5) / 1000000.0 AS term,
        |  tot.psi
        |FROM j, tot ORDER BY j.bucket""".stripMargin
    },
    "events_behavior_entropy" ->
      """WITH pc AS (
        |  SELECT user_id, event_type, count(*) AS c FROM events
        |  GROUP BY 1, 2),
        |pu AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |    list_sort(list(c)) AS cs
        |  FROM pc GROUP BY user_id),
        |eh AS (
        |  SELECT user_id,
        |    list_reduce(list_prepend(0.0,
        |      list_transform(cs, x -> x::DOUBLE)),
        |      (acc, c) -> acc - c / n * ln(c / n)) / ln(2.0) AS h_bits
        |  FROM pu),
        |b AS (SELECT floor(h_bits * 4.0)::BIGINT AS qbin FROM eh)
        |SELECT qbin::DOUBLE / 4.0 AS entropy_bin, count(*) AS n_users
        |FROM b GROUP BY qbin ORDER BY entropy_bin""".stripMargin,
    "events_skew_report" ->
      """WITH per AS (
        |  SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |s AS (
        |  SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |    max(c) AS max_rows
        |  FROM per),
        |srow AS (
        |  SELECT 0::BIGINT AS rank, NULL::BIGINT AS user_id, n_keys,
        |    n_rows, max_rows,
        |    floor(n_rows::DOUBLE / n_keys * 10000.0 + 0.5) / 10000.0
        |      AS mean_rows,
        |    floor(max_rows::DOUBLE * n_keys / n_rows * 10000.0 + 0.5)
        |      / 10000.0 AS skew_factor
        |  FROM s),
        |t AS (
        |  SELECT row_number() OVER (ORDER BY c DESC, user_id) AS rank,
        |    user_id, NULL::BIGINT AS n_keys, c AS n_rows,
        |    NULL::BIGINT AS max_rows, NULL::DOUBLE AS mean_rows,
        |    NULL::DOUBLE AS skew_factor
        |  FROM per ORDER BY c DESC, user_id LIMIT 5)
        |SELECT * FROM srow UNION ALL SELECT * FROM t
        |ORDER BY rank""".stripMargin,
    "events_retention_fit" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohorts AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
        |mx AS (SELECT max(day) AS max_day FROM e),
        |sizes AS (
        |  SELECT cohort_day, count(*) AS sz FROM cohorts
        |  GROUP BY cohort_day),
        |denom AS (
        |  SELECT o::BIGINT AS day_offset,
        |    CAST(sum(sz) AS BIGINT) AS n_eligible
        |  FROM sizes, (SELECT unnest(range(1, 15)) AS o) u, mx
        |  WHERE cohort_day + o::INT <= mx.max_day
        |  GROUP BY o),
        |act AS (
        |  SELECT (a.day - c.cohort_day)::BIGINT AS day_offset,
        |    count(DISTINCT a.user_id) AS n_active
        |  FROM (SELECT DISTINCT user_id, day FROM e) a
        |  JOIN cohorts c USING (user_id)
        |  WHERE (a.day - c.cohort_day) BETWEEN 1 AND 14
        |  GROUP BY 1),
        |pts AS (
        |  SELECT d.day_offset, d.n_eligible, a.n_active,
        |    a.n_active::DOUBLE / d.n_eligible AS rate,
        |    d.day_offset::DOUBLE AS dd,
        |    CAST(floor(ln(a.n_active::DOUBLE / d.n_eligible)
        |      * 1000000000.0 + 0.5) AS BIGINT) AS lru
        |  FROM denom d JOIN act a USING (day_offset)),
        |f AS (
        |  SELECT count(*)::DOUBLE AS np, sum(dd) AS sx,
        |    CAST(sum(lru) AS BIGINT)::DOUBLE / 1000000000.0 AS sy,
        |    CAST(sum(day_offset * lru) AS BIGINT)::DOUBLE
        |      / 1000000000.0 AS sxy,
        |    sum(dd * dd) AS sxx
        |  FROM pts),
        |g AS (
        |  SELECT np, sx, sy,
        |    (np * sxy - sx * sy) / (np * sxx - sx * sx) AS slope
        |  FROM f),
        |h AS (
        |  SELECT np, slope, (sy - slope * sx) / np AS intercept FROM g)
        |SELECT p.day_offset, p.n_eligible, p.n_active,
        |  floor(p.rate * 1000000.0 + 0.5) / 1000000.0 AS rate,
        |  floor(exp(h.intercept + h.slope * p.dd) * 1000000.0 + 0.5)
        |    / 1000000.0 AS fit_rate,
        |  floor(ln(2.0) / -h.slope * 1000000.0 + 0.5) / 1000000.0
        |    AS half_life_days
        |FROM pts p, h ORDER BY p.day_offset""".stripMargin,
    "events_session_paths" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR ts_us - prev_us > 1800000000::BIGINT THEN 1 ELSE 0 END
        |      AS is_new
        |  FROM lagged),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked),
        |paths AS (
        |  SELECT event_type || '>' ||
        |    lead(event_type, 1) OVER w || '>' ||
        |    lead(event_type, 2) OVER w AS path,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM sess
        |  WINDOW w AS (PARTITION BY user_id, session_id
        |    ORDER BY ts_us, event_id))
        |SELECT path, count(*) AS n FROM paths
        |WHERE t3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "events_dow_profile" ->
      """WITH g AS (
        |  SELECT isodow(ts)::BIGINT AS isodow, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT *, sum(n) OVER (PARTITION BY event_type) AS type_total
        |  FROM g)
        |SELECT isodow, event_type, n,
        |  floor(n::DOUBLE / type_total * 10000.0 + 0.5) / 10000.0
        |    AS share,
        |  floor(n::DOUBLE * 7.0 / type_total * 10000.0 + 0.5) / 10000.0
        |    AS idx
        |FROM t ORDER BY isodow, event_type""".stripMargin,
    "events_ab_ttest" ->
      """WITH g AS (
        |  SELECT event_type, count(*)::DOUBLE AS n,
        |    sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)) AS s1c,
        |    sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |      * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS s2c
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n, s1c::DOUBLE / 100.0 / n AS m,
        |    (s2c::DOUBLE / 10000.0 - (s1c::DOUBLE / 100.0)
        |      * (s1c::DOUBLE / 100.0) / n) / (n - 1) AS v
        |  FROM g)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  a.n::BIGINT AS n_a, b.n::BIGINT AS n_b,
        |  floor(a.m * 10000.0 + 0.5) / 10000.0 AS mean_a,
        |  floor(b.m * 10000.0 + 0.5) / 10000.0 AS mean_b,
        |  floor((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n)
        |    * 10000.0 + 0.5) / 10000.0 AS t_stat,
        |  floor((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n) /
        |    ((a.v / a.n) * (a.v / a.n) / (a.n - 1) +
        |     (b.v / b.n) * (b.v / b.n) / (b.n - 1))
        |    * 10000.0 + 0.5) / 10000.0 AS df_welch
        |FROM m a JOIN m b ON a.event_type < b.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "user_value_concentration" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT))
        |      AS BIGINT) AS v_cents
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT user_id, v_cents,
        |    row_number() OVER (ORDER BY v_cents DESC, user_id) AS rank,
        |    CAST(sum(v_cents) OVER (ORDER BY v_cents DESC, user_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM per),
        |tot AS (SELECT count(*) AS n_users,
        |  CAST(sum(v_cents) AS BIGINT) AS total_cents FROM per),
        |th AS (SELECT unnest([0.01, 0.1, 0.2, 0.5])::DOUBLE AS user_frac)
        |SELECT th.user_frac,
        |  CAST(max(ceil(th.user_frac * tot.n_users)) AS BIGINT) AS n_top,
        |  max(r.cum) AS top_cents,
        |  floor(max(r.cum)::DOUBLE / max(tot.total_cents) * 1000000.0
        |    + 0.5) / 1000000.0 AS value_share
        |FROM th, tot JOIN r ON r.rank <= ceil(th.user_frac * tot.n_users)
        |GROUP BY th.user_frac ORDER BY th.user_frac""".stripMargin,
    "events_anomaly" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT))
        |      AS BIGINT) AS vc
        |  FROM events GROUP BY event_type, day),
        |w AS (
        |  SELECT event_type, day, vc,
        |    count(vc) OVER win AS n_prior,
        |    sum(vc) OVER win AS s1,
        |    sum(vc::HUGEINT * vc) OVER win AS s2
        |  FROM d
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, day, vc::DOUBLE / 100.0 AS v,
        |    floor(vc::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0
        |      AS daily_value, n_prior,
        |    floor((vc::DOUBLE / 100.0 - s1::DOUBLE / 100.0 / n_prior)
        |      / sqrt(greatest((s2::DOUBLE / 10000.0
        |        - (s1::DOUBLE / 100.0) * (s1::DOUBLE / 100.0) / n_prior)
        |        / (n_prior - 1),
        |        1e-12)) * 10000.0 + 0.5) / 10000.0 AS z_score
        |  FROM w WHERE n_prior >= 7)
        |SELECT event_type, day, daily_value, n_prior, z_score,
        |  (z_score >= 3.0)::INT AS is_spike
        |FROM z ORDER BY event_type, day""".stripMargin,
    "events_active_users" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM a GROUP BY day),
        |w AS (
        |  SELECT DISTINCT user_id, day + o::INT AS day
        |  FROM a, (SELECT unnest(range(0, 7)) AS o) u),
        |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY day)
        |SELECT d.day, d.dau, w2.wau,
        |  floor(d.dau::DOUBLE / w2.wau * 1000000.0 + 0.5)
        |    / 1000000.0 AS stickiness
        |FROM dau d JOIN wau w2 USING (day) ORDER BY day""".stripMargin,
    "events_cohort_retention" ->
      """WITH wk AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS w FROM events),
        |coh AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, w FROM wk),
        |mat AS (
        |  SELECT cw, a.w - cw AS week_offset, count(*) AS n_users
        |  FROM act a JOIN coh USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cw, count(*) AS cohort_size FROM coh GROUP BY cw)
        |SELECT cw AS cohort_week, week_offset, n_users,
        |  floor(n_users::DOUBLE / cohort_size * 1000000.0 + 0.5)
        |    / 1000000.0 AS retention
        |FROM mat JOIN sz USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "events_daily_full_join" ->
      """WITH s AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_signups
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT coalesce(s.user_id, p.user_id) AS user_id,
        |  coalesce(s.day, p.day) AS day,
        |  coalesce(s.n_signups, 0) AS n_signups,
        |  coalesce(p.n_purchases, 0) AS n_purchases
        |FROM s FULL OUTER JOIN p
        |  ON s.user_id = p.user_id AND s.day = p.day
        |ORDER BY 1, 2""".stripMargin,
    "events_skew_join" ->
      """WITH f AS (
        |  SELECT event_type, value,
        |    CASE WHEN event_type IN ('view', 'click', 'error') THEN 0
        |      ELSE user_id % 50 END AS skew_key
        |  FROM events),
        |d AS (
        |  SELECT range AS skew_key, (range * 7 + 3) % 11 AS weight
        |  FROM range(0, 50))
        |SELECT event_type, count(*) AS n,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT) * weight
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS weighted_value
        |FROM f JOIN d USING (skew_key)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_latest_state" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS last_us,
        |    event_id AS last_event_id, event_type AS last_type,
        |    floor(value * 100.0 + 0.5) / 100.0 AS last_value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, last_us, last_event_id, last_type, last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "events_scd2" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type
        |      THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id)),
        |r AS (
        |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS run_id
        |  FROM e),
        |g AS (
        |  SELECT user_id, run_id, min(event_type) AS state,
        |    min(us) AS valid_from_us, count(*) AS n_events
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, run_id, state, valid_from_us,
        |  lead(valid_from_us) OVER w2 AS valid_to_us,
        |  CASE WHEN lead(valid_from_us) OVER w2 IS NULL
        |    THEN 1 ELSE 0 END AS is_current,
        |  n_events
        |FROM g
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)
        |ORDER BY user_id, run_id""".stripMargin,
    "events_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |m AS (
        |  SELECT prev_type, next_type, count(*) AS n
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  floor(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type)
        |    * 1000000.0 + 0.5) / 1000000.0 AS p
        |FROM m ORDER BY prev_type, next_type""".stripMargin,
    "events_first_touch" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
        |    value
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |t AS (
        |  SELECT user_id, us AS tus, event_id AS tid,
        |    event_type AS tchannel
        |  FROM e WHERE event_type IN ('click', 'view')),
        |p AS (
        |  SELECT user_id, event_id, us, value FROM e
        |  WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.event_id AS pid, p.value, t.tus, t.tchannel,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY t.tus, t.tid) AS rn
        |  FROM p LEFT JOIN t ON t.user_id = p.user_id
        |    AND t.tus < p.us
        |    AND p.us - t.tus <= 604800000000::BIGINT),
        |f AS (
        |  SELECT pid, value,
        |    CASE WHEN tus IS NOT NULL THEN tchannel
        |      ELSE 'direct' END AS channel
        |  FROM j WHERE rn = 1)
        |SELECT channel, count(*) AS n_purchases,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0
        |    AS attributed_revenue
        |FROM f GROUP BY channel ORDER BY channel""".stripMargin,
    "events_attribution" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type, value
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |t AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |      THEN us END IGNORE NULLS) OVER w AS tus,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |      THEN event_type END IGNORE NULLS) OVER w AS tchannel
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (
        |  SELECT CASE WHEN tus IS NOT NULL
        |      AND us - tus <= 604800000000::BIGINT
        |    THEN tchannel ELSE 'direct' END AS channel, value
        |  FROM t WHERE event_type = 'purchase')
        |SELECT channel, count(*) AS n_purchases,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS attributed_revenue
        |FROM p GROUP BY channel ORDER BY channel""".stripMargin,
    "events_gap_fill" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('day', ts)::DATE AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |days AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
        |    AS day
        |  FROM b),
        |t AS (SELECT DISTINCT event_type FROM e)
        |SELECT t.event_type, days.day, coalesce(e.cnt, 0)::BIGINT AS n
        |FROM t CROSS JOIN days
        |LEFT JOIN e ON e.event_type = t.event_type AND e.day = days.day
        |ORDER BY t.event_type, days.day""".stripMargin,
    "events_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type,
        |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m USING (event_type)
        |  GROUP BY e.event_type),
        |z AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |    floor(0.6745 * (e.value - m.med) / d.mad * 10000.0 + 0.5)
        |      / 10000.0 AS rz
        |  FROM events e
        |  JOIN med m USING (event_type)
        |  JOIN mad d USING (event_type)
        |  WHERE d.mad > 0)
        |SELECT event_id, event_type,
        |  floor(value * 10000.0 + 0.5) / 10000.0 AS value, rz
        |FROM z WHERE abs(rz) > 3.5
        |ORDER BY event_id""".stripMargin,
    "events_value_percentiles" ->
      """SELECT event_type,
        |  floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor(quantile_cont(value, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90,
        |  floor(quantile_cont(value, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_type_cube" ->
      """SELECT event_type, (user_id % 4)::BIGINT AS user_bucket,
        |  count(*) AS n,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_value
        |FROM events
        |GROUP BY CUBE (event_type, (user_id % 4)::BIGINT)
        |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin,
    "events_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohorts AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
        |activity AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT c.cohort_day, (a.day - c.cohort_day)::BIGINT AS day_offset,
        |  count(DISTINCT a.user_id) AS active_users
        |FROM activity a JOIN cohorts c ON a.user_id = c.user_id
        |WHERE (a.day - c.cohort_day) IN (0, 1, 7)
        |GROUP BY c.cohort_day, (a.day - c.cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "events_type_pivot" ->
      """SELECT CAST(user_id % 10 AS INT) AS user_bucket,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,
    "events_props_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR ts_us - prev_us > 1800000000::BIGINT THEN 1 ELSE 0 END AS is_new
        |  FROM lagged),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "events_window_agg" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start, event_type,
        |  count(*) AS n,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin)
}
