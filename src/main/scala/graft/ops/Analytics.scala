package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core analytic query shapes over the TPC-H-ish tables — the engine
  * proof that graft's session defaults (AQE, broadcast thresholds,
  * shuffle sizing) produce the plans we want: partial aggregation
  * before shuffles, broadcast star joins, single-shuffle windows.
  */
object Analytics {

  /** Engine-identical half-up rounding: floor(x·10ⁿ + 0.5)/10ⁿ. Spark
    * and DuckDB `round()` split on .x5 halfway doubles (testdata is
    * regenerated every round, so any sum can land on one); every
    * fractional aggregate output uses this on BOTH sides instead.
    */
  private def r2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0
  private def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** Exact integer 10⁻²-units (cents for prices, hundredths for
    * discount/tax rates) of a 2dp value stored as double: floor(x·100
    * + 0.5) — the +0.5 absorbs the binary representation error of the
    * 2dp decimal.  Every monetary SUM in this file aggregates these
    * integers (Long per row, DECIMAL(38,0) across rows ≙ the oracle's
    * HUGEINT), because a float SUM accumulates in partition order and
    * a 1-ulp seam can cross the 2dp output floor on regenerated data
    * — the round-10 `events_anova` failure mode.  The exact integer
    * total converts to double ONCE (correctly rounded, identical to
    * DuckDB's `::DOUBLE`) and then divides by the unit scale in the
    * same order as the oracle text.
    */
  private def u2(c: Column): Column = floor(c * 100.0 + 0.5).cast("long")

  /** Quantity → Long via explicit nearest quantization floor(x+0.5),
    * textually mirrored in the oracles as
    * `CAST(floor(l_quantity + 0.5) AS BIGINT)`. A bare Spark
    * `cast("long")` truncates toward zero while DuckDB's `::BIGINT`
    * rounds to nearest — identical on the integral generators but a
    * silent divergence on non-integral hostile quantities.
    */
  private def qlong(c: Column): Column = floor(c + 0.5).cast("long")

  /** Order-exact sum of per-row Long unit products (DECIMAL(38,0) ≙
    * HUGEINT; cast BEFORE any cross-row accumulation).
    */
  private def usum(c: Column): Column = sum(c.cast("decimal(38,0)"))

  /** Exact unit-sum back to dollars: one correctly-rounded double
    * conversion, then one division — formula text shared with the
    * oracle's `sum(...)::DOUBLE / scale`.
    */
  private def dollars(c: Column, scale: Double): Column =
    c.cast("double") / scale

  /** Exact floor-division of a Long cents sum into dollars — matches
    * DuckDB `//` (which floors) where Spark `DIV` truncates toward
    * zero; the two diverge on negative totals, which are part of the
    * hostile-data surface. pmod's non-negative remainder makes the
    * adjusted numerator exactly divisible, so the chain stays
    * integer-exact at any magnitude (no double enters).
    */
  private def floorDivCents(sumExpr: String): Column =
    expr(s"($sumExpr - pmod($sumExpr, 100)) DIV 100")

  /** Exact 10⁻⁴-dollar units of extendedprice·(1−discount): 2dp cents
    * × 2dp rate-complement hundredths — per-row Long product < 10⁹.
    */
  private def rev4(ext: Column, disc: Column): Column =
    u2(ext) * (lit(100L) - u2(disc))

  /** Order-exact TPC-H revenue aggregate, 2dp output: ≙ the oracle's
    * `floor(sum(pc·(100−dh))::DOUBLE / 10000.0 * 100.0 + 0.5)/100`.
    */
  private def revenue2(ext: Column, disc: Column): Column =
    r2(dollars(usum(rev4(ext, disc)), 10000.0))

  /** TPC-H Q1 shape: scan-heavy partial agg. Only the 7 referenced
    * columns are read (column pruning) and the shipdate predicate is
    * pushed to the parquet scan.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // integer units: qty is integral, prices are cents, rates are
    // hundredths; disc price in 10⁻⁴ units, charge in 10⁻⁶ units —
    // all per-row products fit a Long, all sums are order-exact
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .select($"l_returnflag", $"l_linestatus",
        qlong($"l_quantity").as("qty"),
        u2($"l_extendedprice").as("pc"),
        u2($"l_discount").as("dh"), u2($"l_tax").as("th"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r2(sum($"qty").cast("double")).as("sum_qty"),
        r2(dollars(usum($"pc"), 100.0)).as("sum_base_price"),
        r2(dollars(usum($"pc" * (lit(100L) - $"dh")), 10000.0))
          .as("sum_disc_price"),
        r2(dollars(usum($"pc" * (lit(100L) - $"dh") *
          (lit(100L) + $"th")), 1000000.0)).as("sum_charge"),
        r4(sum($"qty").cast("double") / count(lit(1))).as("avg_qty"),
        r4(dollars(usum($"pc"), 100.0) / count(lit(1))).as("avg_price"),
        r4(dollars(usum($"dh"), 100.0) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3 shape: fact-fact join + group + top-k. Revenue is
    * rounded before the sort so the ordering is stable across engines;
    * o_orderkey breaks ties deterministically.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("1998-03-15 00:00:00").cast("timestamp")
    val customer = Tables.load(spark, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING")
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" < cutoff)
    val lineitem = Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" > cutoff)
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(customer, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(revenue2($"l_extendedprice", $"l_discount").as("revenue"))
      .select($"o_orderkey", $"revenue", $"o_orderdate", $"o_orderpriority")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 shape: star join. Dimensions (region, nation, supplier)
    * are broadcast explicitly — at 100 TB the fact-side shuffle is on
    * the join keys only, dims never move.
    */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.load(spark, dir, "region").filter($"r_name" === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val supplier = Tables.load(spark, dir, "supplier")
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    lineitem
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(supplier),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(revenue2($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"n_name")
  }

  /** Rank-per-group top-k via window function: one shuffle on the
    * partition key, broadcast dim join after.
    */
  def topkCustomersPerNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nation = Tables.load(spark, dir, "nation")
    val rev = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"), $"c_custkey" === $"o_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_nationkey")
      .agg(r2(dollars(usum(u2($"o_totalprice")), 100.0)).as("total_spent"))
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"total_spent".desc, $"c_custkey")
    rev.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey", $"c_name", $"total_spent", $"rnk")
      .orderBy($"n_name", $"rnk")
  }

  /** Month-bucketed trend over orders. */
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .groupBy(trunc($"o_orderdate", "month").as("month"))
      .agg(
        r2(dollars(usum(u2($"o_totalprice")), 100.0)).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"month")
  }

  /** Cumulative (running) monthly revenue — unbounded-preceding window
    * over the month rollup; the frame stays tiny because it runs on
    * the aggregate, not the fact table.
    */
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.load(spark, dir, "orders")
      .groupBy(trunc($"o_orderdate", "month").as("month"))
      .agg(usum(u2($"o_totalprice")).as("revc"))
    val w = Window.orderBy($"month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("cum_revenue", r2(dollars(sum($"revc").over(w), 100.0)))
      .select($"month", r2(dollars($"revc", 100.0)).as("revenue"),
        $"cum_revenue")
      .orderBy($"month")
  }

  /** Funnel analysis over the event stream: per user, first signup and
    * first purchase after it → conversion flag + lag. The min-filter
    * formulation keeps it one shuffle on user_id.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .withColumn("ts", expr("ts DIV 1000")) // µs, oracle parity
    val signups = events.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_us"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"))
    // the >= condition must live IN the left join: a post-join filter
    // would drop users whose purchases all precede signup, instead of
    // keeping them as converted=false
    signups.as("s")
      .join(purchases.as("p"),
        $"s.user_id" === $"p.user_id" && $"purchase_ts" >= $"signup_us",
        "left")
      .groupBy($"s.user_id".as("user_id"), $"signup_us")
      .agg(min($"purchase_ts").as("first_purchase_us"))
      .withColumn("converted", $"first_purchase_us".isNotNull)
      .withColumn("lag_us", $"first_purchase_us" - $"signup_us")
      .orderBy($"user_id")
  }

  /** B54 — ordered multi-step funnel with a completion deadline:
    * signup → first view strictly after it → first purchase strictly
    * after that, chain complete iff the purchase lands within 7 days
    * of the signup. The strict ordering (each step's earliest
    * occurrence AFTER the previous step) is what distinguishes a real
    * funnel from three independent mins — an early purchase must not
    * satisfy step 3.
    *
    * Scale shape: three chained whole-partition conditional mins over
    * the SAME user_id partitioning — Catalyst plans ONE exchange (plus
    * one per-partition key sort) feeding all three Window operators
    * back-to-back, and the per-user rollup that follows reuses the
    * partitioning (partial+final HashAggregate with no new exchange),
    * so the entire funnel is one shuffle of the events table. No
    * joins, no per-step passes: the step-(i) column feeds
    * step-(i+1)'s filter inside the same stage. (Verified with
    * graft.Explain: the only other exchange is the presentation sort.)
    */
  def windowedFunnel(spark: SparkSession, dir: String,
                     windowDays: Int = 7): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
    val horizonUs = windowDays * 86400000000L
    Tables.load(spark, dir, "events")
      .select($"user_id", $"event_type", expr("ts DIV 1000").as("us"))
      .withColumn("t1",
        min(when($"event_type" === "signup", $"us")).over(w))
      .withColumn("t2",
        min(when($"event_type" === "view" && $"us" > $"t1", $"us")).over(w))
      .withColumn("t3",
        min(when($"event_type" === "purchase" && $"us" > $"t2", $"us")).over(w))
      .groupBy($"user_id")
      .agg(max($"t1").as("signup_us"), max($"t2").as("view_us"),
        max($"t3").as("purchase_us"))
      .filter($"signup_us".isNotNull)
      .withColumn("completed",
        $"purchase_us".isNotNull &&
          $"purchase_us" - $"signup_us" <= horizonUs)
      .orderBy($"user_id")
  }

  /** B57 — Holt linear-trend forecast of daily order revenue
    * (α=0.5, β=0.25, 7-day horizon): the one-line operational forecast
    * every revenue dashboard carries. Exponential smoothing is
    * inherently sequential, so the scalable decomposition is: (1) a
    * partial-aggregable corpus pass to the CALENDAR-BOUNDED daily
    * series (the only data-sized work), each daily sum 2-dp-rounded so
    * the fold input is bit-identical on any engine/partitioning; (2)
    * the smoothing recursion as an in-plan `aggregate()` fold over the
    * sorted day array — O(days), one task, no driver loop, no UDF.
    * Dyadic smoothing constants keep every fold step exact-identical
    * to the oracle's recursive CTE.
    */
  def holtForecast(spark: SparkSession, dir: String,
                   horizon: Int = 7): DataFrame = {
    import spark.implicits._
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(r2(dollars(usum(u2($"o_totalprice")), 100.0)).as("rev"))
    val folded = daily
      .agg(sort_array(collect_list(struct($"day", $"rev"))).as("s"))
      .select(aggregate($"s",
        struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(false).as("init")),
        (st, x) => {
          val y = x.getField("rev")
          val newl = lit(0.5) * y +
            lit(0.5) * (st.getField("l") + st.getField("b"))
          when(!st.getField("init"),
            struct(y.as("l"), lit(0.0).as("b"), lit(true).as("init")))
            .otherwise(struct(newl.as("l"),
              (lit(0.25) * (newl - st.getField("l")) +
                lit(0.75) * st.getField("b")).as("b"),
              lit(true).as("init")))
        }).as("st"))
    folded
      .select(explode(sequence(lit(1), lit(horizon))).as("h"), $"st")
      .select($"h".cast("long").as("h"),
        r4($"st.l" + $"h" * $"st.b").as("forecast"))
      .orderBy($"h")
  }

  /** B77 — Holt–Winters additive triple smoothing (α=1/2, β=1/4,
    * γ=1/4, weekly season, 14-day horizon): the standard production
    * forecaster completing the tier — B57 smooths level+trend but a
    * weekly-seasonal series (B56/B65 prove this one is) systematically
    * over/under-shoots by weekday; HW carries the 7 seasonal offsets
    * as state. Classic init (level = week-1 mean, trend = week-over-
    * week mean shift / 7, seasonals = week-1 deviations), then the
    * recursion over days 8..n.
    *
    * Scale shape: B57's exactly — ONE partial-agg corpus pass to the
    * calendar-bounded daily series (2-dp-pinned inputs), then the
    * recursion as an in-plan `aggregate()` fold whose state is
    * (level, trend, 7-slot rolling seasonal buffer) — O(days), one
    * task, no driver loop. Dyadic smoothing constants keep every
    * fold step bit-identical to the oracle's recursive CTE.
    */
  def holtWinters(spark: SparkSession, dir: String,
                  horizon: Int = 14): DataFrame = {
    import spark.implicits._
    // Daily series via per-row integer cents summed as Long (exact,
    // partition-order-independent), THEN one double division — the
    // same engine-exact input discipline as revenueAcf/theilSen. A
    // float sum rounded afterwards can cross a rounding boundary
    // under a different partitioning at scale.
    val daily = Tables.load(spark, dir, "orders")
      .withColumn("cents",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long"))
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg((sum($"cents").cast("double") / 100.0).as("rev"))
    val folded = daily
      .agg(sort_array(collect_list(struct($"day", $"rev"))).as("s"))
      .select(transform($"s", x => x.getField("rev")).as("ys"))
      .withColumn("l0",
        aggregate(slice($"ys", 1, 7), lit(0.0), (a, y) => a + y) / 7.0)
      .withColumn("b0",
        (aggregate(slice($"ys", 8, 7), lit(0.0), (a, y) => a + y) / 7.0
          - $"l0") / 7.0)
      .withColumn("s0", transform(slice($"ys", 1, 7), y => y - $"l0"))
      // greatest(...,0): a sub-two-season calendar (possible on a
      // degenerate shard) must fold over nothing, not crash slice
      .select(size($"ys").as("nd"), aggregate(
        slice($"ys", lit(8), greatest(size($"ys") - 7, lit(0))),
        struct($"l0".as("l"), $"b0".as("b"), $"s0".as("ss")),
        (st, y) => {
          val sOld = element_at(st.getField("ss"), 1)
          val newl = lit(0.5) * (y - sOld) +
            lit(0.5) * (st.getField("l") + st.getField("b"))
          val newb = lit(0.25) * (newl - st.getField("l")) +
            lit(0.75) * st.getField("b")
          val news = lit(0.25) * (y - newl) + lit(0.75) * sOld
          struct(newl.as("l"), newb.as("b"),
            concat(slice(st.getField("ss"), 2, 6), array(news)).as("ss"))
        }).as("st"))
    folded
      // below two full seasons the initialization is undefined —
      // forecast nothing (defined-degenerate), matching the oracle's
      // implicit ≥14-day assumption at every gate SF
      .select(explode(when($"nd" >= 14, sequence(lit(1), lit(horizon)))
        .otherwise(expr("array()"))).as("h"), $"st")
      .select($"h".cast("long").as("h"),
        (floor(($"st.l" + $"h" * $"st.b" +
          element_at($"st.ss", (($"h" - 1) % 7 + 1).cast("int")))
          * 10000.0 + 0.5) / 10000.0).as("forecast"))
      .orderBy($"h")
  }

  /** Supplier share of each part's line revenue — fact self-aggregate
    * + window ratio, the classic market-share shape (Q8-like).
    */
  def supplierPartShare(spark: SparkSession, dir: String,
                        topK: Int = 100): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(usum(u2($"l_extendedprice")).as("rev"))
    val w = Window.partitionBy($"l_partkey")
    val wRank = Window.orderBy($"part_total".desc, $"l_partkey", $"l_suppkey")
    li.withColumn("part_total", sum($"rev").over(w))
      .withColumn("share",
        floor($"rev".cast("double") / $"part_total".cast("double")
          * 10000.0 + 0.5).cast("double") / 10000.0)
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter($"rnk" <= topK)
      .select($"l_partkey", $"l_suppkey",
        r2(dollars($"rev", 100.0)).as("revenue"),
        r2(dollars($"part_total", 100.0)).as("part_total"),
        $"share", $"rnk")
      .orderBy($"rnk")
  }

  /** Semi-join (EXISTS): orders having at least one deep-discount
    * line — `left_semi` never duplicates or widens the left side.
    */
  def discountedOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val deep = Tables.load(spark, dir, "lineitem")
      .filter($"l_discount" > 0.05)
      .select($"l_orderkey")
    Tables.load(spark, dir, "orders")
      .join(deep, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** Anti-join (NOT EXISTS): customers who never ordered. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders").select($"o_custkey")
    Tables.load(spark, dir, "customer")
      .join(orders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_nationkey")
      .orderBy($"c_custkey")
  }

  /** B27 — correlated scalar-subquery shape (TPC-H Q2's core): each
    * customer's most expensive order(s). The correlated
    * `= (SELECT max(..) WHERE same key)` decorrelates to ONE window
    * max over the key partition — one shuffle, no self-join, no
    * re-scan of orders.
    */
  def customerMaxOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
    Tables.load(spark, dir, "orders")
      .withColumn("max_price", max($"o_totalprice").over(w))
      .filter($"o_totalprice" === $"max_price")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** B28 — set operators over key sets: nations partitioned into
    * customer∩supplier / customer-only / supplier-only via
    * INTERSECT / EXCEPT (distinct semantics). Each set op plans as an
    * aggregate-style hash op on the (tiny, pre-distinct) key sets.
    */
  def nationSetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.load(spark, dir, "customer")
      .select($"c_nationkey".as("nationkey")).distinct()
    val s = Tables.load(spark, dir, "supplier")
      .select($"s_nationkey".as("nationkey")).distinct()
    c.intersect(s).withColumn("side", lit("both"))
      .unionByName(c.except(s).withColumn("side", lit("customer_only")))
      .unionByName(s.except(c).withColumn("side", lit("supplier_only")))
      .select($"side", $"nationkey")
      .orderBy($"side", $"nationkey")
  }

  /** ROLLUP subtotals: revenue by (year, month) with month subtotals
    * and a grand total — one pass, no union of aggregates.
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .withColumn("yr", year($"o_orderdate").cast("long"))
      .withColumn("mo", month($"o_orderdate").cast("long"))
      .rollup($"yr", $"mo")
      .agg(r2(dollars(usum(u2($"o_totalprice")), 100.0)).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"yr".asc_nulls_first, $"mo".asc_nulls_first)
  }

  /** Custom typed Aggregator (UDAF): geometric-mean order value per
    * priority.  The per-row ln quantizes to integer 10⁻¹² units
    * in-plan (the identical IEEE chain the oracle runs), and the
    * Aggregator's two-Long carry buffer sums them EXACTLY, so the
    * aggregate partial-combines map-side and is partition-order
    * independent — a raw double log-sum can cross the 4dp output
    * floor on a 1-ulp ordering seam.  Non-positive values (hostile
    * corpora only; ln undefined) contribute 0 units = factor 1.
    */
  def geomeanOrderValue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val geomean = udaf(graft.expressions.GeoMean)
    val units = when($"o_totalprice" > 0.0,
      floor(log($"o_totalprice") * 1000000000000.0 + 0.5).cast("long"))
      .otherwise(0L)
    Tables.load(spark, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg((floor(geomean(units) * 10000.0 + 0.5)
        .cast("double") / 10000.0).as("geomean_value"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** B45 — equi-depth decile profile of order values WITHOUT a global
    * sort: `ntile(10)` is the textbook spelling but plans as a
    * single-partition window (every row through one task — dead at
    * scale). Instead: one exact-percentile aggregate yields the 9
    * boundaries (tiny driver artifact, same pattern as the ANN
    * codebooks), then bucketing is a scan-side projection and the
    * profile a 10-group rollup — fully distributed, two corpus passes.
    * Boundaries are 4dp floor-rounded on BOTH engines before the
    * compare so bucket edges are identical doubles.
    */
  def orderValueDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
    val qs = (1 to 9).map(_ / 10.0)
    val bRow = orders
      .agg(expr(s"percentile(o_totalprice, array(${qs.mkString(",")}))")
        .as("bs"))
      .collect()(0)
    // empty orders: percentile is null — no boundaries, and the final
    // groupBy over zero rows is already the right (empty) answer
    val bounds =
      if (bRow.isNullAt(0)) Seq.empty[Double]
      else bRow.getSeq[Double](0)
        .map(b => math.floor(b * 10000.0 + 0.5) / 10000.0)
    val decile = bounds.foldLeft(lit(1L)) { (acc, b) =>
      acc + when($"o_totalprice" > b, 1L).otherwise(0L)
    }
    orders
      .withColumn("decile", decile)
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_orders"),
        r2(dollars(usum(u2($"o_totalprice")), 100.0)).as("sum_value"),
        r2(min($"o_totalprice")).as("min_value"),
        r2(max($"o_totalprice")).as("max_value"))
      .orderBy($"decile")
  }

  /** B29 — TPC-H Q4 shape: EXISTS with a correlated date-arithmetic
    * predicate (lines shipped >60 days after the order date). Planned
    * as a `left_semi` join carrying the non-equi condition — the left
    * side never widens or duplicates, and the priority rollup
    * partial-aggregates before its shuffle.
    */
  def q4LateOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val late = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_shipdate")
    Tables.load(spark, dir, "orders")
      .join(late,
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy($"o_orderpriority")
  }

  /** B30 — TPC-H Q7 shape (volume shipping between two nations): the
    * two nation dims are pre-filtered to the pair and BROADCAST, so
    * the selective predicate reaches the supplier/customer joins
    * before the fact-fact shuffle; the OR of directions is a post-join
    * pair filter on already-tiny rows.
    */
  def q7NationTrade(spark: SparkSession, dir: String,
                    nationA: String = "NATION_3",
                    nationB: String = "NATION_8"): DataFrame = {
    import spark.implicits._
    val pair = Seq(nationA, nationB)
    val n1 = Tables.load(spark, dir, "nation")
      .filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))
    val n2 = Tables.load(spark, dir, "nation")
      .filter($"n_name".isin(pair: _*))
      .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))
    val supplier = Tables.load(spark, dir, "supplier")
      .join(broadcast(n1), $"s_nationkey" === $"s_nk")
    val customer = Tables.load(spark, dir, "customer")
      .join(broadcast(n2), $"c_nationkey" === $"c_nk")
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(supplier), $"l_suppkey" === $"s_suppkey")
      .join(Tables.load(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(customer, $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(revenue2($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** B31 — TPC-H Q11 shape: scalar aggregate subquery as a threshold.
    * The per-part value aggregate is computed once; the global
    * threshold (1.5× the average part value — scale-free, unlike a
    * fixed fraction) is a one-row frame broadcast into a nested-loop
    * join, never a driver round-trip.
    */
  def q11PartValueShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pv = Tables.load(spark, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(usum(u2($"l_extendedprice") * qlong($"l_quantity"))
        .as("v"))
    val thresh = pv.agg(
      (sum($"v").cast("double") / count(lit(1)) * 1.5).as("thresh"))
    pv.crossJoin(broadcast(thresh))
      .filter($"v".cast("double") > $"thresh")
      .select($"l_partkey", r2(dollars($"v", 100.0)).as("value"))
      .orderBy($"value".desc, $"l_partkey")
  }

  /** B32 — TPC-H Q16 shape: NOT IN subquery (excluded suppliers) as a
    * broadcast `left_anti` join + count DISTINCT per group. The
    * distinct runs as a two-phase partial aggregate on (brand, supp).
    */
  def q16BrandSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bad = Tables.load(spark, dir, "supplier")
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    val part = Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_brand")
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(bad), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand")
  }

  /** B33 — TPC-H Q18 shape (large-volume orders): HAVING on a fact
    * aggregate, then join back to orders/customer. The quantity
    * rollup shuffles once on l_orderkey; the surviving key set is tiny
    * and AQE turns the join back into a broadcast at runtime.
    */
  def q18LargeOrders(spark: SparkSession, dir: String,
                     minQty: Double = 300.0): DataFrame = {
    import spark.implicits._
    val big = Tables.load(spark, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum(qlong($"l_quantity")).as("qty"))
      .filter($"qty" > minQty)
    Tables.load(spark, dir, "orders")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables.load(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
        $"o_totalprice", r2($"qty").as("total_qty"))
      .orderBy($"total_qty".desc, $"o_orderkey")
  }

  /** B34 — TPC-H Q22 shape: global-average scalar subquery + anti-join
    * (above-average balances with no recent orders). The one-row
    * average broadcasts; the recent-orders key set anti-joins before
    * the nation rollup.
    */
  def q22IdleBalance(spark: SparkSession, dir: String,
                     since: String = "2001-01-01 00:00:00"): DataFrame = {
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val avgBal = customer.agg(
      (dollars(usum(u2($"c_acctbal")), 100.0) / count(lit(1)))
        .as("avg_bal"))
    val recent = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit(since).cast("timestamp"))
      .select($"o_custkey")
    customer.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        r2(dollars(usum(u2($"c_acctbal")), 100.0)).as("total_bal"))
      .orderBy($"c_nationkey")
  }

  /** B39 — trailing 7-day revenue (the RANGE-frame window shape, vs
    * B9's unbounded-preceding cumsum): the corpus first collapses to
    * a per-day aggregate — day count is calendar-bounded at ANY
    * corpus size, so the subsequent global range-frame window runs
    * over a frame that never grows with data volume; gaps in the
    * calendar shrink the frame (range semantics, not rows).
    */
  def revenue7DayAvg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(usum(u2($"o_totalprice")).as("revc"))
      .withColumn("dnum",
        datediff($"day", lit("1995-01-01").cast("date")).cast("long"))
    val w = Window.orderBy($"dnum").rangeBetween(-6, 0)
    // integer cents through the range frame: the windowed SUM is
    // exact, so the avg derives from one double division — a windowed
    // float AVG would accumulate in the engine's frame-evaluation
    // order (Spark running-state vs DuckDB segment tree)
    daily
      .withColumn("avg_7day",
        floor(sum($"revc").over(w).cast("double") / 100.0
          / count(lit(1)).over(w) * 100.0 + 0.5) / 100.0)
      .withColumn("n_days_window", count(lit(1)).over(w))
      .select($"day", r2(dollars($"revc", 100.0)).as("revenue"),
        $"avg_7day", $"n_days_window")
      .orderBy($"day")
  }

  /** B59 — exact trailing 7-day rolling MEDIAN of daily revenue via
    * contribution explode: each day's (2-dp-pinned) total contributes
    * to the 7 target days [day, day+6], and the median aggregates per
    * target day — medians don't decompose into running state the way
    * B10's sums do, and an ordered range window (the B-block avg's
    * form) is a GLOBAL single-partition sort at scale; the explode
    * form is 7× the calendar-bounded daily frame, partial-aggregable,
    * and needs no window at all (the same trick as G10's rolling WAU).
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(r2(dollars(usum(u2($"o_totalprice")), 100.0)).as("rev"))
    val contrib = daily
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(expr("date_add(day, off)").as("tday"), $"rev")
    val med = contrib.groupBy($"tday")
      .agg((floor(expr("percentile(rev, 0.5)") * 100.0 + 0.5) / 100.0)
        .as("median_7day"),
        count(lit(1)).as("n_days_window"))
    daily.join(med, $"day" === $"tday")
      .select($"day", $"rev".as("revenue"), $"median_7day",
        $"n_days_window")
      .orderBy($"day")
  }

  /** B63 — customer spend-quintile migration: each customer's
    * total-spend quintile in the FIRST half of the timeline vs the
    * SECOND (quintile 0 = inactive that half), rolled up to the 6×6
    * migration matrix — the customer-mobility view (who's rising,
    * churning, newly acquired) that RFM snapshots (B50) can't show.
    *
    * Scale shape: two per-customer partial aggregates (one scan each
    * side of the midpoint — in production one scan with a pivot);
    * quintile boundaries are ONE single-reduce exact-percentile
    * aggregate per half (4-dp-rounded strict-`>` cuts, the B50
    * pattern — no ntile window over customers); the matrix is a
    * FULL OUTER customer join + a ≤36-row rollup.
    */
  def decileMigration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_totalprice",
        unix_micros($"o_orderdate".cast("timestamp")).as("us"))
    val mmRow = orders.agg(min($"us").as("lo"), max($"us").as("hi"))
      .select(expr("(lo + hi) div 2").as("mid")).collect()(0)
    if (mmRow.isNullAt(0))  // empty orders: no halves, no migration
      return Seq.empty[(Long, Long, Long)].toDF("q1", "q2", "n_customers")
    val mm = mmRow.getLong(0)
    def perCust(half: DataFrame): DataFrame =
      half.groupBy($"o_custkey")
        .agg(dollars(usum(u2($"o_totalprice")), 100.0).as("v"))
    val p1 = perCust(orders.filter($"us" < mm))
    val p2 = perCust(orders.filter($"us" >= mm))
    val qs = (1 to 4).map(_ / 5.0)
    def bounds(per: DataFrame): Seq[Double] = {
      val r = per
        .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("b"))
        .collect()(0)
      // a one-sided calendar (all orders share the min timestamp)
      // leaves one half empty — no boundaries, everyone scores 1
      if (r.isNullAt(0)) Seq.empty[Double]
      else r.getSeq[Double](0)
        .map(b => math.floor(b * 10000.0 + 0.5) / 10000.0)
    }
    def score(c: Column, bs: Seq[Double]): Column =
      bs.foldLeft(lit(1L)) { (acc, b) =>
        acc + when(c > b, 1L).otherwise(0L)
      }
    val b1 = bounds(p1)
    val b2 = bounds(p2)
    p1.select($"o_custkey", score($"v", b1).as("q1"))
      .join(p2.select($"o_custkey", score($"v", b2).as("q2")),
        Seq("o_custkey"), "full_outer")
      .na.fill(0L, Seq("q1", "q2"))
      .groupBy($"q1", $"q2").agg(count(lit(1)).as("n_customers"))
      .orderBy($"q1", $"q2")
  }

  /** B67 — cohort LTV curve: cumulative revenue per acquisition-month
    * cohort by months-since-first-order — the lifetime-value ramp that
    * payback-period decisions read (B14/B44 count retained USERS; this
    * accumulates their VALUE). Cohorts from a per-customer min-date
    * partial agg; the (cohort × age) grid is calendar-bounded, so the
    * running sum's window partitions are ≤ months wide; per-cell sums
    * are 2-dp-pinned BEFORE the cumulation so the running totals are
    * engine-exact.
    */
  /** B71 — autocorrelation function of daily revenue at lags 1–14:
    * the seasonality detector that tells a forecaster (B57/B65) which
    * lag structure the series actually has (a weekly cycle shows as a
    * lag-7/14 peak). Sample ACF with the global mean:
    * r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)².
    *
    * Exactness shape: daily totals are exact integer DOLLARS (per-row
    * cents → Long sum → DIV 100, so no float ever crosses a partition
    * boundary), and every ACF term expands into integer sums
    * (Σx_tx_{t+k}, head/tail sums per lag — all < 2⁶³ in dollars)
    * from which both engines derive the identical double. The series
    * frame is DAYS-sized (calendar-bounded, independent of corpus
    * scale), so the rank window and the 14-way lag self-join are
    * post-aggregate small; the only corpus-scale work is the one
    * partial-agg daily rollup.
    */
  def revenueAcf(spark: SparkSession, dir: String,
                 maxLag: Int = 14): DataFrame = {
    import spark.implicits._
    val daily = Tables.load(spark, dir, "orders")
      .withColumn("cents",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long"))
      .groupBy($"o_orderdate")
      .agg(floorDivCents("sum(cents)").as("x"))
      .withColumn("r", row_number().over(Window.orderBy($"o_orderdate"))
        .cast("long"))
      .select($"r", $"x")
    // decimal-cast BEFORE the x·x / x·y products: a Long×Long daily-
    // dollar product wraps past ~3e9/day (plausible at 100 TB); the
    // oracle multiplies in HUGEINT
    val stats = daily.agg(sum($"x").as("sx"),
      sum($"x".cast("decimal(38,0)") * $"x").as("sx2"),
      count(lit(1)).as("n"))
    val lags = daily.select($"r", $"x")
      .crossJoin(broadcast(spark.range(1, maxLag + 1).toDF("lag_k")))
      .withColumn("r2", $"r" + $"lag_k")
    val pairs = lags.join(daily.select($"r".as("rr"), $"x".as("y")),
        $"r2" === $"rr")
      .groupBy($"lag_k")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"x".cast("decimal(38,0)") * $"y").as("sxy"),
        sum($"x").as("sh"), sum($"y").as("st"))
    pairs.crossJoin(broadcast(stats))
      .select($"lag_k", $"n_pairs",
        (floor(
          (($"sxy" - ($"sx".cast("double") / $"n") * ($"sh" + $"st") +
            $"n_pairs" * ($"sx".cast("double") / $"n") *
            ($"sx".cast("double") / $"n")) /
            ($"sx2" - $"n" * ($"sx".cast("double") / $"n") *
              ($"sx".cast("double") / $"n"))) * 1000000.0 + 0.5)
          / 1000000.0).as("acf"))
      .orderBy($"lag_k")
  }

  /** B73 — CUSUM changepoint detection on daily revenue: the
    * level-shift monitor (did the series' mean move, and when?) that
    * complements B52's pointwise z-score — a slow drift never trips a
    * per-day outlier test but accumulates in the CUSUM. Per day:
    * C_t = Σ_{i≤t}(x_i − x̄) and its standardized magnitude; the
    * argmax |C_t| is the classic single-changepoint estimate, flagged
    * on its row. σ is the global daily std (same exact-integer moment
    * machinery as B71/D22: Σx, Σx² Long-exact, every double derived
    * identically on both engines).
    *
    * Scale shape: corpus work is ONE partial-agg daily rollup; the
    * prefix sum runs over the calendar-bounded days frame (B10/B43
    * stance), and the flag is an argmax AGGREGATE (max over a
    * (|C|, -rank) struct) joined back — days-sized, no second sort.
    */
  def revenueChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.load(spark, dir, "orders")
      .withColumn("cents",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long"))
      .groupBy($"o_orderdate")
      .agg(floorDivCents("sum(cents)").as("x"))
    // decimal-cast BEFORE the x·x product (Long wrap at scale; ≙
    // the oracle's HUGEINT product)
    val stats = daily.agg(sum($"x").as("sx"),
      sum($"x".cast("decimal(38,0)") * $"x").as("sx2"),
      count(lit(1)).as("n"))
    val w = Window.orderBy($"o_orderdate")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = daily
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("px", sum($"x").over(w))
      .crossJoin(broadcast(stats))
      .withColumn("mean", $"sx".cast("double") / $"n")
      .withColumn("c", $"px" - $"t" * $"mean")
      .withColumn("sigma", sqrt(($"sx2" - $"n" * $"mean" * $"mean") / $"n"))
      .withColumn("c_std", $"c" / ($"sigma" * sqrt($"n")))
    val peak = cusum.agg(max(struct(abs($"c"), $"o_orderdate")).as("p"))
      .select($"p".getField("o_orderdate").as("peak_date"))
    cusum.crossJoin(broadcast(peak))
      .select($"o_orderdate", $"x",
        (floor($"c" * 10000.0 + 0.5) / 10000.0).as("cusum"),
        (floor($"c_std" * 1000000.0 + 0.5) / 1000000.0).as("cusum_std"),
        ($"o_orderdate" === $"peak_date").as("is_changepoint"))
      .orderBy($"o_orderdate")
  }

  /** B74 — Kaplan–Meier survival curve for time-to-second-order: the
    * repurchase-timing view with CORRECT right-censoring (one-order
    * customers are not "never repurchased", they are observed-so-far —
    * dropping them biases the curve down, the classic churn-analysis
    * mistake). Duration = days from first to second order; customers
    * with a single order are censored at the catalog's last order
    * date. S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) with nᵢ the at-risk count
    * (everyone whose duration ≥ tᵢ — censored rows hold the risk set,
    * which is the whole point).
    *
    * Scale shape: corpus work is ONE per-customer aggregation (the
    * sorted per-customer day list is bounded by that customer's order
    * count); durations collapse to a ≤days-sized histogram; the risk
    * set is a suffix sum over that frame; and the sequential product
    * runs as an in-plan array fold (B57 stance) — every factor is an
    * IEEE division/multiply both engines execute in the same order,
    * so the oracle's recursive CTE is bit-identical, no transcendental
    * functions anywhere.
    */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_custkey", to_date($"o_orderdate").as("day"))
    val per = orders.groupBy($"o_custkey")
      .agg(sort_array(collect_list($"day")).as("ds"))
      .select(
        element_at($"ds", 1).as("d1"),
        when(size($"ds") >= 2, element_at($"ds", 2)).as("d2"))
    val maxDay = orders.agg(max($"day").as("maxd"))
    val hist = per.crossJoin(broadcast(maxDay))
      .withColumn("ev", $"d2".isNotNull)
      .withColumn("dur",
        when($"ev", datediff($"d2", $"d1"))
          .otherwise(datediff($"maxd", $"d1")).cast("long"))
      .groupBy($"dur")
      .agg(count(lit(1)).as("n_at"),
        sum(when($"ev", 1L).otherwise(0L)).as("d_at"))
    val wSuffix = Window.orderBy($"dur")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val km = hist.withColumn("n_risk", sum($"n_at").over(wSuffix))
    val outT = "array<struct<dur:bigint,n_risk:bigint,d_at:bigint,s:double>>"
    km.agg(sort_array(collect_list(
        struct($"dur", $"n_risk", $"d_at"))).as("rows"))
      .select(aggregate($"rows",
        struct(lit(1.0).as("p"), array().cast(outT).as("out")),
        (st, x) => {
          val p2 = st.getField("p") *
            (lit(1.0) - x.getField("d_at").cast("double") /
              x.getField("n_risk").cast("double"))
          struct(p2.as("p"),
            concat(st.getField("out"), array(struct(
              x.getField("dur").as("dur"),
              x.getField("n_risk").as("n_risk"),
              x.getField("d_at").as("d_at"),
              p2.as("s")))).as("out"))
        }).as("st"))
      .select(explode($"st.out").as("r"))
      .select($"r.dur".as("duration_days"), $"r.n_risk",
        $"r.d_at".as("n_events"),
        (floor($"r.s" * 1000000.0 + 0.5) / 1000000.0).as("survival"))
      .orderBy($"duration_days")
  }

  /** B76 — Theil–Sen robust trend estimate of daily revenue: the
    * median of all pairwise slopes (x_j−x_i)/(t_j−t_i), i<j — the
    * robust complement to B72's least squares (one corrupted day
    * moves an OLS slope arbitrarily; Theil–Sen tolerates ~29%
    * contamination), with the median intercept and a per-decile
    * slope profile so a trend BREAK (B73's changepoint) shows up as
    * decile disagreement.
    *
    * Scale shape: the corpus collapses to the calendar-bounded daily
    * frame FIRST (one partial-agg pass); the O(days²) pair set —
    * quadratic only in DAYS, ~3M pairs for a decade — is a self-join
    * of that small frame, never of the corpus. Slopes are exact
    * integer ratios (Long dollars / Long days) evaluated identically
    * by both engines; the median interpolates between two such
    * doubles at 6 dp.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // checkpoint the calendar-bounded daily frame (≤ days rows): the
    // pair join consumes it on BOTH sides and the intercept pass a
    // third time — without it each consumer re-runs the corpus scan
    // + agg (measured 3 × ~2 s of the query's 8.7 s at sf0.1)
    val daily = Tables.load(spark, dir, "orders")
      .withColumn("cents",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long"))
      .groupBy($"o_orderdate")
      .agg(floorDivCents("sum(cents)").as("x"))
      .select(datediff(to_date($"o_orderdate"), lit("1992-01-01"))
        .cast("long").as("t"), $"x")
      .localCheckpoint()
    // repartition the STREAM side BEFORE the theta-join: the tiny
    // daily frame reads as one partition, and the nested-loop join
    // inherits the stream side's layout — without this the
    // days²-pair production AND every downstream pass over the
    // checkpoint are pinned to one core (the same near-serial-
    // parallelism trap as the kNN-graph checkpoint). Spreading the
    // ≤days-row side first costs a trivial shuffle and makes the
    // join output land already parallel.
    // (r15: a bytes-derived partition count was tried here and
    // REVERTED — the nested-loop theta-join below is O(days²)
    // predicate evaluations concentrated in these partitions, so
    // sizing them by output bytes serialized the pair production:
    // 2.8 s → 7.5 s measured. Core-count partitions are right for a
    // compute-bound, bytes-tiny stage.)
    val parts = spark.sessionState.conf.numShufflePartitions
    val a = daily.select($"t".as("ta"), $"x".as("xa")).repartition(parts)
    val b = daily.select($"t".as("tb"), $"x".as("xb"))
    // materialize the pair frame ONCE (days²-bounded): median,
    // boundaries, and profile would otherwise each recompute the join
    val slopes = a.join(broadcast(b), $"ta" < $"tb")
      .select((($"xb" - $"xa").cast("double") /
        ($"tb" - $"ta").cast("double")).as("s"))
      .localCheckpoint()
    // decile slopes by [[RankSelect]] equal-frequency bucketed rank
    // selection — not the exact Percentile aggregate, which buffers
    // every distinct value in one boxed map (measured ~17 s on 2.9M
    // pairs). Approximation only ever places bucket boundaries; the
    // fetched order statistics are exact, and the interpolation is
    // the Percentile aggregate's two-sided (hi−pos)·v_lo +
    // (pos−lo)·v_hi, written identically in the oracle's SQL, so
    // parity is by construction.
    val sel = RankSelect.groupedQuantiles(slopes, lit("_"), $"s",
      (1 to 9).map(_ / 10.0))
    if (sel.isEmpty)  // <2 distinct days: no slopes, no fit
      return Seq.empty[(Long, Double, Double, Double, Long)]
        .toDF("slope_decile", "decile_mean_slope", "slope_median",
          "intercept_median", "n_pairs")
    val (nPairs, bsVals) = sel("_")
    val med = spark.range(1)
      .select(typedLit(bsVals).as("bs"), lit(nPairs).as("n_pairs"),
        (floor(lit(bsVals(4)) * 1000000.0 + 0.5) / 1000000.0)
          .as("slope_median"))
    val bounds = med.select($"bs")
    // decile profile WITHOUT a global window: the 9 interpolated
    // boundaries broadcast back, bucket by strict compare —
    // engine-identical on the exact-ratio slopes
    val prof = slopes.crossJoin(broadcast(bounds))
      .withColumn("dec",
        expr("size(filter(bs, b -> s > b))").cast("long"))
      // per-decile mean via 6dp-integer slopes: Long sums are
      // associative, so partitioning cannot move the mean
      .withColumn("s6", floor($"s" * 1000000.0 + 0.5).cast("long"))
      .groupBy($"dec")
      .agg((floor(sum($"s6").cast("double") / count(lit(1)) + 0.5)
        / 1000000.0).as("decile_mean_slope"))
    prof.crossJoin(broadcast(med))
      .crossJoin(broadcast(daily.crossJoin(broadcast(med))
        .agg((floor(expr(
          "percentile(x - slope_median * t, 0.5)") * 100.0 + 0.5)
          / 100.0).as("intercept_median"))))
      .select($"dec".as("slope_decile"), $"decile_mean_slope",
        $"slope_median", $"intercept_median", $"n_pairs")
      .orderBy($"slope_decile")
  }

  /** Poisson(1) cumulative probabilities P(X ≤ k), k = 0..7, scaled
    * to 48-bit hash units — shared by the B78 operator and its oracle
    * so both sides draw the IDENTICAL integer thresholds.
    */
  private[ops] val poissonCum48: Seq[Long] = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508)
    .map(c => math.floor(c * 281474976710656.0).toLong)

  /** B78 — Poisson-bootstrap 95% CI for the mean order value: the
    * DISTRIBUTED bootstrap. Classical resampling draws n rows with
    * replacement — a shuffle per resample and a nonstarter at corpus
    * scale; the Poisson bootstrap gives each row an independent
    * Poisson(1) weight per resample, so ALL 32 resamples ride ONE
    * corpus pass as a partial-aggregable weighted sum (the standard
    * large-scale approximation — resample sizes concentrate at
    * n ± √n). Weights are deterministic md5 draws against fixed
    * integer thresholds (retry-safe, engine-identical); the CI
    * interpolates ranks 2.5%/97.5% of the 32 resample means with the
    * same formula text as the oracle.
    *
    * Scale shape: one explode×32 projection (map-side, no state),
    * one groupBy(b) partial agg — 32 groups regardless of corpus
    * size; everything after is a 32-row frame.
    */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBoot = 32
    val tsLit = typedLit(poissonCum48)
    val rows = Tables.load(spark, dir, "orders")
      .select($"o_orderkey",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("c"))
    val boot = rows
      .select($"o_orderkey", $"c",
        explode(sequence(lit(0), lit(nBoot - 1))).as("b"))
      .withColumn("u",
        conv(substring(md5(concat(lit("boot:"), $"b".cast("string"),
          lit(":"), $"o_orderkey".cast("string")).cast("binary")),
          1, 12), 16, 10).cast("long"))
      .withColumn("w", size(filter(tsLit, t => $"u" >= t)).cast("long"))
      .groupBy($"b")
      // decimal-cast before the weight·cents product (Long wrap at
      // scale; ≙ the oracle's HUGEINT product)
      .agg(sum($"w".cast("decimal(38,0)") * $"c").as("swc"),
        sum($"w").as("sw"))
      .withColumn("mean_b", $"swc".cast("double") / $"sw")
    val overall = rows.agg(
      (sum($"c").cast("double") / count(lit(1)) / 100.0)
        .as("mean_overall"),
      count(lit(1)).as("n_orders"))
    // 2.5%/97.5% of the 32 sorted resample means: positions
    // 0.025·31 = 0.775 and 0.975·31 = 30.225 (theil-sen formula)
    val ci = boot
      .agg(sort_array(collect_list($"mean_b")).as("ms"))
      .select(
        ((element_at($"ms", 1) + lit(0.775) *
          (element_at($"ms", 2) - element_at($"ms", 1))) / 100.0)
          .as("ci_lo"),
        ((element_at($"ms", 31) + lit(0.225) *
          (element_at($"ms", 32) - element_at($"ms", 31))) / 100.0)
          .as("ci_hi"))
    boot
      .crossJoin(broadcast(overall))
      .crossJoin(broadcast(ci))
      .select($"b".cast("long").as("boot_id"), $"sw".as("n_eff"),
        (floor($"mean_b" / 100.0 * 10000.0 + 0.5) / 10000.0)
          .as("mean_boot"),
        (floor($"mean_overall" * 10000.0 + 0.5) / 10000.0)
          .as("mean_overall"),
        (floor($"ci_lo" * 10000.0 + 0.5) / 10000.0).as("ci_lo"),
        (floor($"ci_hi" * 10000.0 + 0.5) / 10000.0).as("ci_hi"),
        $"n_orders")
      .orderBy($"boot_id")
  }

  /** B72 — closed-form ridge regression by NORMAL EQUATIONS: predict
    * the line-item price from (quantity, discount, tax) with one
    * corpus pass that partial-aggregates XᵀX and Xᵀy (d² + d sums, d
    * = 4 with intercept), then an O(d³) driver solve of
    * (XᵀX + λI)β = Xᵀy. The third in-engine ML shape next to E34
    * (gradient-as-aggregate) and D16 (matvec-as-aggregate): when d is
    * small, regression over 100 TB is ONE aggregation — no iterations
    * at all.
    *
    * The synthetic corpus carries NO natural cross-column linear
    * signal (columns are generated independently — measured R² ≈ 0.001
    * on every natural pairing), so the regression target is the NET
    * REVENUE formula y = price·(1−disc)·(1+tax) over features
    * (price, price·disc_c, price·tax_c) — a known ground truth
    * (β ≈ (1, −0.01, +0.01, 0), the missing cross term is O(10⁻⁴)),
    * which upgrades the spec from "some fit" to COEFFICIENT RECOVERY.
    *
    * Determinism shape: features enter as exact integers (dollars /
    * dollar·hundredths) and every moment is summed as DECIMAL(38,0)
    * — exact and associative, so the driver solve sees bit-identical
    * inputs on every run and cluster layout. Long accumulation would
    * wrap: second-order terms reach ~1.1e12, so a Long sum crosses
    * 2^63 near sf≈1.5 worst-case; decimal headroom is 1e38 (≈1e24 at
    * 100 TB). The solve itself is [[RidgeFormula]] — a shared-text
    * Cramer expansion both engines evaluate on the identical moment
    * doubles — so the query carries a FULL hash oracle (the moments
    * pin the data plane; the formula pins the solve). RMSE comes from
    * the same moment vector (RSS = syy − 2βᵀXᵀy + βᵀXᵀXβ): one data
    * pass total, down from two.
    */
  def lineitemRidge(spark: SparkSession, dir: String,
                    lambda: Double = 1.0): DataFrame = {
    import spark.implicits._
    val rows = Tables.load(spark, dir, "lineitem")
      .withColumn("e", floor($"l_extendedprice" + 0.5).cast("long"))
      .withColumn("dc", floor($"l_discount" * 100.0 + 0.5).cast("long"))
      .withColumn("tc", floor($"l_tax" * 100.0 + 0.5).cast("long"))
      .select($"e".as("x1"), ($"e" * $"dc").as("x2"),
        ($"e" * $"tc").as("x3"),
        floor($"l_extendedprice" * (lit(1.0) - $"l_discount") *
          (lit(1.0) + $"l_tax") + 0.5).cast("long").as("y"))
    def dsum(c: Column): Column = sum(c.cast("decimal(38,0)"))
    require(lambda == 1.0,
      "RidgeFormula pins λ=1 into the shared oracle text")
    val m = rows.agg(
      count(lit(1)).as("n"),
      dsum($"x1").as("s1"), dsum($"x2").as("s2"), dsum($"x3").as("s3"),
      dsum($"y").as("sy"),
      dsum($"x1" * $"x1").as("s11"), dsum($"x1" * $"x2").as("s12"),
      dsum($"x1" * $"x3").as("s13"), dsum($"x2" * $"x2").as("s22"),
      dsum($"x2" * $"x3").as("s23"), dsum($"x3" * $"x3").as("s33"),
      dsum($"x1" * $"y").as("s1y"), dsum($"x2" * $"y").as("s2y"),
      dsum($"x3" * $"y").as("s3y"), dsum($"y" * $"y").as("syy")).head()
    def g(name: String): Double = m.get(m.fieldIndex(name)) match {
      case null                       => 0.0  // empty-input sums
      case l: java.lang.Long          => l.toDouble
      case d: java.math.BigDecimal    => d.doubleValue
      case d: scala.math.BigDecimal   => d.toDouble
    }
    val n = g("n")
    if (n == 0.0)  // empty lineitem: nothing to fit
      return Seq.empty[(String, Double)].toDF("term", "value")
    val sol = RidgeFormula.solve(
      RidgeFormula.momentNames.map(nm => nm -> g(nm)).toMap)
    Seq(("coef_price", sol("beta0")), ("coef_price_disc", sol("beta1")),
      ("coef_price_tax", sol("beta2")), ("intercept", sol("beta3")),
      ("train_rmse", sol("rmse")), ("n_rows", n))
      .toDF("term", "value")
      .withColumn("value", floor($"value" * 1000000.0 + 0.5) / 1000000.0)
      .orderBy($"term")
  }

  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_totalprice",
        trunc($"o_orderdate", "month").as("om"))
    val cohorts = orders.groupBy($"o_custkey")
      .agg(min($"om").as("cm"))
    // cohorts is CUSTOMER-keyed (corpus-sized) — no broadcast hint;
    // both sides arrive o_custkey-partitioned from the same scan, so
    // the join co-locates, and AQE may still broadcast at small SF
    val grid = orders.join(cohorts, "o_custkey")
      .withColumn("age",
        (months_between($"om", $"cm")).cast("long"))
      .groupBy($"cm".as("cohort_month"), $"age")
      .agg(usum(u2($"o_totalprice")).as("revc"),
        countDistinct($"o_custkey").as("n_active"))
    val w = Window.partitionBy($"cohort_month").orderBy($"age")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid
      .withColumn("cum_rev",
        floor(sum($"revc").over(w).cast("double") / 100.0
          * 100.0 + 0.5) / 100.0)
      .select($"cohort_month", $"age", $"n_active",
        r2(dollars($"revc", 100.0)).as("rev"), $"cum_rev")
      .orderBy($"cohort_month", $"age")
  }

  /** B66 — purchase-cadence profile: per-customer order inter-arrival
    * gaps (lag over each customer's order dates) rolled up to a
    * week-binned histogram plus exact p50/p90 — the replenishment-
    * cycle view behind reorder nudges and churn-risk windows (a
    * customer 3× past their own median gap is drifting). The lag
    * window partitions per customer (order-count-bounded); gaps are
    * integer days, so the histogram and percentiles are exact
    * cross-engine; both rollups partial-aggregate.
    */
  def interarrivalProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"day", $"o_orderkey")
    val gaps = Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey", to_date($"o_orderdate").as("day"))
      .withColumn("prev", lag($"day", 1).over(w))
      .filter($"prev".isNotNull)
      .select(datediff($"day", $"prev").cast("long").as("gap_days"))
    val hist = gaps
      .groupBy(expr("gap_days div 7").as("week_bin"))
      .agg(count(lit(1)).as("n_gaps"))
    val pct = gaps.agg(
      (floor(expr("percentile(gap_days, 0.5)") * 10000.0 + 0.5) / 10000.0)
        .as("p50"),
      (floor(expr("percentile(gap_days, 0.9)") * 10000.0 + 0.5) / 10000.0)
        .as("p90"))
    hist.crossJoin(broadcast(pct))
      .select($"week_bin", $"n_gaps", $"p50", $"p90")
      .orderBy($"week_bin")
  }

  /** B65 — classical seasonal decomposition of monthly revenue
    * (trend = textbook 2×12 centered moving average, seasonal = mean
    * monthly deviation from trend, residual = the rest) — the
    * decomposition behind "is December really up, or is that just
    * seasonality?". The global window runs over the CALENDAR-BOUNDED
    * monthly frame (the B10/B43 stance: ~tens of rows at any corpus
    * size — the corpus-sized work is the one partial-aggregable
    * monthly rollup), with 2-dp-pinned inputs so every downstream
    * float op is engine-identical.
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.load(spark, dir, "orders")
      .groupBy(trunc($"o_orderdate", "month").as("month"))
      .agg(usum(u2($"o_totalprice")).as("revc"))
      .withColumn("rev", r2(dollars($"revc", 100.0)))
    val w = Window.orderBy($"month")
    val wr = w.rowsBetween(-5, 5)
    // s11 sums integer cents (exact at any frame evaluation order);
    // the seasonal deviation quantizes to 10⁻⁴ units before its
    // mean, so the tiny per-month groups also sum order-free
    val t = m
      .withColumn("rm6", lag($"rev", 6).over(w))
      .withColumn("lm6", lead($"rev", 6).over(w))
      .withColumn("s11", sum($"revc").over(wr).cast("double") / 100.0)
      .withColumn("n11", count(lit(1)).over(wr))
      .filter($"rm6".isNotNull && $"lm6".isNotNull && $"n11" === 11)
      .select($"month", $"rev",
        r4((lit(0.5) * $"rm6" + $"s11" + lit(0.5) * $"lm6") / 12.0)
          .as("trend"))
    val s = t.groupBy(month($"month").cast("long").as("moy"))
      .agg(r4(sum(floor(($"rev" - $"trend") * 10000.0 + 0.5)
          .cast("long")).cast("double") / 10000.0 / count(lit(1)))
        .as("seasonal"))
    t.join(broadcast(s), month($"month").cast("long") === $"moy")
      .select($"month", $"rev", $"trend", $"seasonal",
        r4($"rev" - $"trend" - $"seasonal").as("residual"))
      .orderBy($"month")
  }

  // --- B38: the remaining TPC-H query shapes (22/22 coverage) ------
  // The testdata schema is TPC-H-ish but slimmed: no partsupp table
  // and no commitdate/receiptdate/shipmode columns. Queries that
  // reference those (Q2/Q9/Q12/Q20/Q21) are re-expressed over the
  // available columns with the SAME plan shape as the original —
  // supply offers derived from lineitem unit prices, lateness from
  // shipdate vs orderdate — exactly as Q11 was re-based in round 1.

  /** B38a — TPC-H Q2 shape (min-cost supplier per part): the
    * correlated-min subquery becomes a per-part aggregate joined back
    * on (part, cost) equality; cost is min(unit price) over identical
    * row sets in both engines, so the double equality is exact. Dims
    * (region⋈nation⋈supplier, filtered part) broadcast; the only
    * corpus-scale shuffle is the (part, supp) offer rollup.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String,
                        region: String = "EUROPE",
                        size: Int = 15): DataFrame = {
    import spark.implicits._
    val nations = Tables.load(spark, dir, "nation")
      .join(broadcast(Tables.load(spark, dir, "region")
        .filter($"r_name" === region)), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(nations), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
    val parts = Tables.load(spark, dir, "part")
      .filter($"p_size" === size).select($"p_partkey", $"p_name")
    // broadcast joins BELOW the aggregate: the region filter keeps
    // ~1/5 of suppliers and the size filter ~1/50 of parts, so joining
    // first shrinks the (partkey, suppkey) shuffle ~250× — the filters
    // are on group keys, so pre-filtering is semantics-preserving
    val offers = Tables.load(spark, dir, "lineitem")
      .join(broadcast(supp.select($"s_suppkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey", $"p_partkey", $"p_name")
      .agg(min($"l_extendedprice" / $"l_quantity").as("cost"))
    val best = offers.groupBy($"l_partkey".as("bp"))
      .agg(min($"cost").as("best_cost"))
    offers
      .join(broadcast(best), $"l_partkey" === $"bp" && $"cost" === $"best_cost")
      .groupBy($"p_partkey", $"p_name", $"best_cost")
      .agg(min($"l_suppkey").as("s_suppkey"))
      .join(broadcast(supp.select($"s_suppkey", $"s_name", $"n_name")),
        Seq("s_suppkey"))
      .select($"p_partkey", $"p_name", $"s_suppkey", $"s_name", $"n_name",
        (floor($"best_cost" * 10000.0 + 0.5) / 10000.0).as("cost"))
      .orderBy($"p_partkey")
  }

  /** B38b — TPC-H Q6 shape (forecast revenue change): pure
    * scan-filter-aggregate, zero joins — every predicate reaches the
    * parquet scan as a pushed filter and only 4 columns are read.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String,
                        year: Int = 1997): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit(f"$year-01-01").cast("timestamp") &&
        $"l_shipdate" < lit(f"${year + 1}-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
        $"l_quantity" < 24)
      .agg(r2(dollars(usum(u2($"l_extendedprice") * u2($"l_discount")),
        10000.0)).as("revenue"))
  }

  /** B38c — TPC-H Q8 shape (national market share): star join with
    * BOTH nation legs broadcast (customer side filtered to the
    * region, supplier side carrying the nation name), then a
    * conditional-sum ratio per order year. One fact-fact shuffle
    * (lineitem⋈orders), dims never move.
    */
  def q8MarketShare(spark: SparkSession, dir: String,
                    region: String = "AMERICA",
                    nation: String = "NATION_3"): DataFrame = {
    import spark.implicits._
    val custNations = Tables.load(spark, dir, "nation")
      .join(broadcast(Tables.load(spark, dir, "region")
        .filter($"r_name" === region)), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("c_nk"))
    val customer = Tables.load(spark, dir, "customer")
      .join(broadcast(custNations), $"c_nationkey" === $"c_nk")
      .select($"c_custkey")
    val suppNation = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"s_nk")
      .select($"s_suppkey", $"supp_nation")
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(Tables.load(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .withColumn("rev", rev4($"l_extendedprice", $"l_discount"))
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg((floor(
        usum(when($"supp_nation" === nation, $"rev").otherwise(0L))
          .cast("double") /
          usum($"rev").cast("double") * 10000.0 + 0.5) / 10000.0)
        .as("mkt_share"))
      .orderBy($"o_year")
  }

  /** B38d — TPC-H Q9 shape (product-type profit): the partsupp supply
    * cost is re-based on 60% of p_retailprice (the only cost signal in
    * the slimmed schema); same plan — part/supplier/nation broadcast
    * into the lineitem⋈orders shuffle, profit aggregated by supplier
    * nation × order year.
    */
  def q9ProductProfit(spark: SparkSession, dir: String,
                      namePart: String = "red"): DataFrame = {
    import spark.implicits._
    val parts = Tables.load(spark, dir, "part")
      .filter($"p_name".contains(namePart))
      .select($"p_partkey", $"p_retailprice")
    val suppNation = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
        .select($"n_nationkey".as("s_nk"), $"n_name".as("nation"))),
        $"s_nationkey" === $"s_nk")
      .select($"s_suppkey", $"nation")
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(Tables.load(spark, dir, "orders").select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .withColumn("profit",
        rev4($"l_extendedprice", $"l_discount") -
          lit(60L) * u2($"p_retailprice") * qlong($"l_quantity"))
      .groupBy($"nation", year($"o_orderdate").cast("long").as("o_year"))
      .agg(r2(dollars(usum($"profit"), 10000.0)).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** B38e — TPC-H Q10 shape (returned-item top customers): one
    * fact-fact shuffle, customer/nation broadcast, revenue rounded
    * BEFORE the sort with c_custkey tiebreak so the top-20 cut is
    * deterministic across engines.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String,
                       since: String = "1997-01-01",
                       until: String = "1997-04-01"): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_orderdate" >= lit(since).cast("timestamp") &&
        $"o_orderdate" < lit(until).cast("timestamp"))
      .select($"o_orderkey", $"o_custkey")
    val custNation = Tables.load(spark, dir, "customer")
      .join(broadcast(Tables.load(spark, dir, "nation")
        .select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
    Tables.load(spark, dir, "lineitem")
      .filter($"l_returnflag" === "R")
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custNation), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(revenue2($"l_extendedprice", $"l_discount").as("revenue"))
      .select($"c_custkey", $"c_name", $"revenue",
        (floor($"c_acctbal" * 100.0 + 0.5) / 100.0).as("c_acctbal"), $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** B38f — TPC-H Q12 shape (shipping buckets × priority class): the
    * shipmode column doesn't exist, so the group key is re-based on
    * lateness buckets (shipdate vs orderdate); the high/low-priority
    * CASE-sums are the original's. Single fact-fact shuffle.
    */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val high = Seq("1-URGENT", "2-HIGH")
    Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_shipdate")
      .join(Tables.load(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .withColumn("ship_bucket",
        when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 120 DAYS"), "very_late")
          .when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "late")
          .otherwise("ontime"))
      .groupBy($"ship_bucket")
      .agg(
        sum(when($"o_orderpriority".isin(high: _*), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when($"o_orderpriority".isin(high: _*), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy($"ship_bucket")
  }

  /** B38g — TPC-H Q13 shape (customer order-count distribution):
    * LEFT OUTER join with an extra join-side predicate (so zero-order
    * customers survive with count 0), then a second aggregate over the
    * first's output — the double-aggregation shape.
    */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .filter($"o_orderpriority" =!= "5-LOW")
      .select($"o_orderkey", $"o_custkey")
    Tables.load(spark, dir, "customer")
      .select($"c_custkey")
      .join(orders, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** B38h — TPC-H Q14 shape (promo revenue share): conditional-sum
    * ratio over one month, part dim broadcast; one scan, no shuffle
    * beyond the final single-group aggregate.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String,
                      since: String = "1997-09-01",
                      until: String = "1997-10-01"): DataFrame = {
    import spark.implicits._
    val parts = Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_type")
    Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit(since).cast("timestamp") &&
        $"l_shipdate" < lit(until).cast("timestamp"))
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .withColumn("rev", rev4($"l_extendedprice", $"l_discount"))
      .agg((floor(
        lit(100.0) * usum(when($"p_type" === "PROMO", $"rev").otherwise(0L))
          .cast("double") /
          usum($"rev").cast("double") * 10000.0 + 0.5) / 10000.0)
        .as("promo_revenue"))
  }

  /** B38i — TPC-H Q15 shape (top supplier): the revenue "view" is a
    * per-supplier aggregate; the scalar max subquery broadcasts as a
    * one-row frame. Revenue is rounded before the max/equality so the
    * tie set is identical in both engines.
    */
  def q15TopSupplier(spark: SparkSession, dir: String,
                     since: String = "1997-01-01",
                     until: String = "1997-04-01"): DataFrame = {
    import spark.implicits._
    val revenue = Tables.load(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit(since).cast("timestamp") &&
        $"l_shipdate" < lit(until).cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(revenue2($"l_extendedprice", $"l_discount").as("total_revenue"))
    val top = revenue.agg(max($"total_revenue").as("max_rev"))
    revenue.crossJoin(broadcast(top))
      .filter($"total_revenue" === $"max_rev")
      .join(broadcast(Tables.load(spark, dir, "supplier")
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  /** B38j — TPC-H Q17 shape (small-quantity revenue): the correlated
    * per-part average subquery becomes a per-part aggregate joined
    * back onto the fact; quantities are integer-valued doubles, so
    * sums (hence the 0.2×avg threshold) are exact and order-free in
    * both engines.
    */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String,
                         brand: String = "Brand#23"): DataFrame = {
    import spark.implicits._
    val lineitem = Tables.load(spark, dir, "lineitem")
    val thresholds = lineitem.groupBy($"l_partkey".as("tp"))
      .agg((sum(qlong($"l_quantity")).cast("double")
        / count(lit(1)) * 0.2).as("qty_thresh"))
    val brandParts = Tables.load(spark, dir, "part")
      .filter($"p_brand" === brand).select($"p_partkey")
    lineitem
      .join(broadcast(brandParts), $"l_partkey" === $"p_partkey")
      .join(broadcast(thresholds), $"l_partkey" === $"tp")
      .filter($"l_quantity" < $"qty_thresh")
      .agg((floor(usum(u2($"l_extendedprice")).cast("double") / 100.0
        / 7.0 * 100.0 + 0.5) / 100.0).as("avg_yearly"))
  }

  /** B38k — TPC-H Q19 shape (bracketed disjunctive predicates): the
    * OR-of-ANDs over part attributes and quantities stays one
    * broadcast join + one filter — Catalyst folds the brackets into a
    * single codegen'd predicate, no union-of-scans.
    */
  def q19BracketedRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.load(spark, dir, "part")
      .select($"p_partkey", $"p_brand", $"p_size")
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
          $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) &&
            $"l_quantity".between(20, 30)))
      .agg(revenue2($"l_extendedprice", $"l_discount").as("revenue"))
  }

  /** B38l — TPC-H Q20 shape (excess-stock suppliers): partsupp
    * availqty is re-based on shipped quantity — a supplier "dominates"
    * a part when it shipped >12% of that part's total (≈4× the mean
    * share at the synth supplier fan-out). Quantity sums
    * are exact (integer-valued doubles), so the threshold compare is
    * engine-stable. Two part-keyed rollups, then a tiny distinct
    * supplier set joined to the dims.
    */
  def q20DominantSuppliers(spark: SparkSession, dir: String,
                           namePrefix: String = "red"): DataFrame = {
    import spark.implicits._
    val parts = Tables.load(spark, dir, "part")
      .filter($"p_name".startsWith(namePrefix)).select($"p_partkey")
    val shipped = Tables.load(spark, dir, "lineitem")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum(qlong($"l_quantity")).as("supp_qty"))
    val totals = shipped.groupBy($"l_partkey".as("tp"))
      .agg(sum($"supp_qty").as("part_qty"))
    val dominant = shipped
      .join(broadcast(totals), $"l_partkey" === $"tp")
      .filter($"supp_qty" > $"part_qty" * 0.12)
      .select($"l_suppkey").distinct()
    Tables.load(spark, dir, "supplier")
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(Tables.load(spark, dir, "nation")
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
      .orderBy($"s_suppkey")
  }

  /** B38m — TPC-H Q21 shape (suppliers who kept orders waiting): the
    * EXISTS (another supplier) + NOT EXISTS (another LATE supplier)
    * pair becomes one per-order aggregate — distinct supplier count
    * and distinct late-supplier count — joined back to the per-(order,
    * supplier) lateness flags; credit goes to the sole late supplier
    * on multi-supplier 'F' orders. Lateness is shipdate-based (no
    * commit/receipt dates in the slimmed schema).
    */
  def q21WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fOrders = Tables.load(spark, dir, "orders")
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate")
    val flags = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(fOrders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(when($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        1).otherwise(0)).as("late"))
    val perOrder = flags.groupBy($"l_orderkey".as("ok"))
      .agg(count(lit(1)).as("n_supp"),
        sum($"late").as("n_late_supp"))
    flags
      .join(perOrder, $"l_orderkey" === $"ok")
      .filter($"late" === 1 && $"n_late_supp" === 1 && $"n_supp" >= 2)
      .join(broadcast(Tables.load(spark, dir, "supplier")
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
  }

  /** B37 — partial-aggregable top-k per group: the window formulation
    * (B4) must shuffle and sort EVERY row of every group; this typed
    * [[graft.expressions.TopKPairs]] Aggregator keeps a k-bounded
    * buffer that merges associatively, so only ≤k pairs per
    * (group × map partition) reach the shuffle — groups×k rows moved
    * instead of N. Exact same semantics (value desc, id tiebreak, no
    * float summation), which is why the window query IS the oracle.
    */
  def topkOrdersHeap(spark: SparkSession, dir: String,
                     k: Int = 3): DataFrame = {
    import spark.implicits._
    val topk = udaf(graft.expressions.TopKPairs(k))
    Tables.load(spark, dir, "orders")
      .groupBy($"o_custkey")
      .agg(topk($"o_totalprice", $"o_orderkey").as("top"))
      .select($"o_custkey", posexplode($"top").as(Seq("idx", "p")))
      .select($"o_custkey", ($"idx" + 1).cast("long").as("rnk"),
        $"p._2".as("o_orderkey"), $"p._1".as("o_totalprice"))
      .orderBy($"o_custkey", $"rnk")
  }

  /** B51 — market-basket pair mining: co-ordered part pairs with
    * support and lift (support·N / (f_a·f_b)) — the co-occurrence
    * analysis recommender/affinity pipelines run. Pairs explode
    * per-order (bounded: ≤C(7,2) per order since orders carry ≤7
    * lines), so the self-join is co-partitioned on l_orderkey and the
    * output stays order-linear; part frequencies join AFTER the top-n
    * cut, so the lift lookup touches n rows.
    */
  def basketPairs(spark: SparkSession, dir: String,
                  topN: Int = 20): DataFrame = {
    import spark.implicits._
    val items = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val nOrders = items.select($"l_orderkey").distinct().count().toDouble
    val freq = items.groupBy($"l_partkey")
      .agg(count(lit(1)).as("f"))
    val top = items.select($"l_orderkey", $"l_partkey".as("part_a"))
      .join(items.select($"l_orderkey", $"l_partkey".as("part_b")),
        "l_orderkey")
      .filter($"part_a" < $"part_b")
      .groupBy($"part_a", $"part_b")
      .agg(count(lit(1)).as("support"))
      .orderBy($"support".desc, $"part_a", $"part_b")
      .limit(topN)
    top
      .join(freq.select($"l_partkey".as("part_a"), $"f".as("fa")), "part_a")
      .join(freq.select($"l_partkey".as("part_b"), $"f".as("fb")), "part_b")
      .select($"part_a", $"part_b", $"support",
        r4($"support" * nOrders / ($"fa" * $"fb")).as("lift"))
      .orderBy($"support".desc, $"part_a", $"part_b")
  }

  /** B50 — RFM customer segmentation: per-customer recency (days since
    * last order), frequency (order count), monetary (lifetime spend),
    * each scored 1–4 by corpus quartile, rolled up to segment counts.
    * Quartile boundaries are exact percentiles of the per-customer
    * frame, 4-dp-rounded with strict `>` cuts so any engine derives
    * the identical bucketing (the B45 deciles pattern).
    *
    * Scale shape: orders partial-aggregate to the customer-sized frame
    * before anything else; the boundary collect is 9 doubles off a
    * single-reduce aggregate, and scoring is a scan-side projection —
    * no per-row window, no global sort.
    */
  def customerRfm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_custkey", to_date($"o_orderdate").as("od"), $"o_totalprice")
    val maxDRow = orders.agg(max($"od")).collect()(0)
    if (maxDRow.isNullAt(0))  // empty orders: no RFM frame
      return Seq.empty[(Long, Long, Long, Long, Double, Double, Double)]
        .toDF("r_score", "f_score", "m_score", "n_customers",
          "avg_recency", "avg_frequency", "sum_value")
    val maxD = maxDRow.getDate(0)
    val per = orders.groupBy($"o_custkey")
      .agg(datediff(lit(maxD), max($"od")).cast("long").as("r_days"),
        count(lit(1)).as("f_orders"),
        usum(u2($"o_totalprice")).as("m_cents"))
      .withColumn("m_value", dollars($"m_cents", 100.0))
    val qs = (1 to 3).map(_ / 4.0)
    val row = per.agg(
      expr(s"percentile(r_days, array(${qs.mkString(",")}))").as("rq"),
      expr(s"percentile(f_orders, array(${qs.mkString(",")}))").as("fq"),
      expr(s"percentile(m_value, array(${qs.mkString(",")}))").as("mq"))
      .collect()(0)
    def bounds(i: Int): Seq[Double] = row.getSeq[Double](i)
      .map(b => math.floor(b * 10000.0 + 0.5) / 10000.0)
    def score(c: Column, bs: Seq[Double]): Column =
      bs.foldLeft(lit(1L)) { (acc, b) =>
        acc + when(c > b, 1L).otherwise(0L)
      }
    per
      .withColumn("r_score", lit(5L) - score($"r_days".cast("double"), bounds(0)))
      .withColumn("f_score", score($"f_orders".cast("double"), bounds(1)))
      .withColumn("m_score", score($"m_value", bounds(2)))
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_customers"),
        r2(sum($"r_days").cast("double") / count(lit(1)))
          .as("avg_recency"),
        r4(sum($"f_orders").cast("double") / count(lit(1)))
          .as("avg_frequency"),
        r2(dollars(sum($"m_cents"), 100.0)).as("sum_value"))
      .orderBy($"r_score", $"f_score", $"m_score")
  }

  val oracles: Map[String, String] = Map(
    // B72: the data plane (quantization + exact HUGEINT moments) in
    // SQL, the solve as RidgeFormula's shared-text Cramer expansion —
    // both engines run the identical IEEE chain on identical moments
    "lineitem_ridge" ->
      ("""WITH r AS (
        |  SELECT CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS e,
        |    CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS dc,
        |    CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS tc,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |x AS (SELECT e AS x1, e * dc AS x2, e * tc AS x3, y FROM r),
        |m AS (SELECT count(*) AS n,
        |  sum(x1::HUGEINT) AS s1, sum(x2::HUGEINT) AS s2,
        |  sum(x3::HUGEINT) AS s3, sum(y::HUGEINT) AS sy,
        |  sum((x1 * x1)::HUGEINT) AS s11, sum((x1 * x2)::HUGEINT) AS s12,
        |  sum((x1 * x3)::HUGEINT) AS s13, sum((x2 * x2)::HUGEINT) AS s22,
        |  sum((x2 * x3)::HUGEINT) AS s23, sum((x3 * x3)::HUGEINT) AS s33,
        |  sum((x1 * y)::HUGEINT) AS s1y, sum((x2 * y)::HUGEINT) AS s2y,
        |  sum((x3 * y)::HUGEINT) AS s3y, sum((y * y)::HUGEINT) AS syy
        |  FROM x),
        |""".stripMargin + RidgeFormula.oracleTail +
      """rfv AS (SELECT * FROM rf WHERE n > 0.0)
        |SELECT term, value FROM (
        |  SELECT 'coef_price' AS term,
        |    floor(beta0 * 1000000.0 + 0.5) / 1000000.0 AS value FROM rfv
        |  UNION ALL SELECT 'coef_price_disc',
        |    floor(beta1 * 1000000.0 + 0.5) / 1000000.0 FROM rfv
        |  UNION ALL SELECT 'coef_price_tax',
        |    floor(beta2 * 1000000.0 + 0.5) / 1000000.0 FROM rfv
        |  UNION ALL SELECT 'intercept',
        |    floor(beta3 * 1000000.0 + 0.5) / 1000000.0 FROM rfv
        |  UNION ALL SELECT 'train_rmse',
        |    floor(rmse * 1000000.0 + 0.5) / 1000000.0 FROM rfv
        |  UNION ALL SELECT 'n_rows',
        |    floor(n * 1000000.0 + 0.5) / 1000000.0 FROM rfv)
        |ORDER BY term""".stripMargin),
    "revenue_bootstrap_ci" -> {
      val ts = poissonCum48.mkString(", ")
      s"""WITH r AS (
         |  SELECT o_orderkey,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
         |  FROM orders),
         |e AS (
         |  SELECT o_orderkey, c, unnest(range(0, 32)) AS b FROM r),
         |uu AS (
         |  SELECT b, c, ('0x' || substring(md5('boot:' || b || ':' ||
         |    CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT AS u
         |  FROM e),
         |w AS (
         |  SELECT b, c, len(list_filter([$ts],
         |    t -> u >= t))::BIGINT AS w
         |  FROM uu),
         |g AS (
         |  SELECT b, sum(w::HUGEINT * c) AS swc,
         |    CAST(sum(w) AS BIGINT) AS sw
         |  FROM w GROUP BY b),
         |m AS (SELECT b, swc, sw, swc::DOUBLE / sw AS mean_b FROM g),
         |ov AS (
         |  SELECT sum(c)::DOUBLE / count(*) / 100.0 AS mean_overall,
         |    count(*)::BIGINT AS n_orders
         |  FROM r),
         |ci AS (
         |  SELECT (ms[1] + 0.775 * (ms[2] - ms[1])) / 100.0 AS ci_lo,
         |    (ms[31] + 0.225 * (ms[32] - ms[31])) / 100.0 AS ci_hi
         |  FROM (SELECT list(mean_b ORDER BY mean_b) AS ms FROM m))
         |SELECT b AS boot_id, sw AS n_eff,
         |  floor(mean_b / 100.0 * 10000.0 + 0.5) / 10000.0
         |    AS mean_boot,
         |  floor(mean_overall * 10000.0 + 0.5) / 10000.0
         |    AS mean_overall,
         |  floor(ci_lo * 10000.0 + 0.5) / 10000.0 AS ci_lo,
         |  floor(ci_hi * 10000.0 + 0.5) / 10000.0 AS ci_hi, n_orders
         |FROM m, ov, ci ORDER BY boot_id""".stripMargin
    },
    "revenue_theil_sen" ->
      """WITH d AS (
        |  SELECT o_orderdate,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      // 100 AS BIGINT) AS x
        |  FROM orders GROUP BY o_orderdate),
        |dd AS (
        |  SELECT CAST(o_orderdate::DATE - DATE '1992-01-01' AS BIGINT)
        |    AS t, x
        |  FROM d),
        |sl AS (
        |  SELECT (b.x - a.x)::DOUBLE / (b.t - a.t)::DOUBLE AS s
        |  FROM dd a JOIN dd b ON a.t < b.t),
        |med0 AS (SELECT count(*)::BIGINT AS n FROM sl),
        |rs AS (SELECT s, row_number() OVER (ORDER BY s) AS r FROM sl),
        |tp AS (SELECT k, (k::DOUBLE / 10.0) * (n - 1)::DOUBLE AS pos,
        |    CAST(floor((k::DOUBLE / 10.0) * (n - 1)::DOUBLE) AS BIGINT)
        |      AS lo,
        |    CAST(ceil((k::DOUBLE / 10.0) * (n - 1)::DOUBLE) AS BIGINT)
        |      AS hi
        |  FROM (SELECT unnest(range(1, 10)) AS k), med0),
        |qlo AS (SELECT tp.k, tp.pos, tp.lo, tp.hi, rs.s AS vlo
        |  FROM tp JOIN rs ON rs.r = tp.lo + 1),
        |qhi AS (SELECT tp.k, rs.s AS vhi FROM tp JOIN rs
        |  ON rs.r = tp.hi + 1),
        |bv AS (SELECT qlo.k,
        |    CASE WHEN qlo.hi = qlo.lo THEN qlo.vlo
        |      WHEN qhi.vhi = qlo.vlo THEN qlo.vlo
        |      ELSE (qlo.hi - qlo.pos) * qlo.vlo
        |        + (qlo.pos - qlo.lo) * qhi.vhi END AS v
        |  FROM qlo JOIN qhi ON qhi.k = qlo.k),
        |med AS (
        |  SELECT list(v ORDER BY k) AS bs,
        |    (SELECT n FROM med0) AS n_pairs,
        |    floor((list(v ORDER BY k))[5] * 1000000.0 + 0.5)
        |      / 1000000.0 AS slope_median
        |  FROM bv),
        |ic AS (
        |  SELECT floor(quantile_cont(x - slope_median * t, 0.5)
        |    * 100.0 + 0.5) / 100.0 AS intercept_median
        |  FROM dd, med),
        |prof AS (
        |  SELECT len(list_filter(bs, b -> s > b))::BIGINT
        |      AS slope_decile,
        |    floor(sum(CAST(floor(s * 1000000.0 + 0.5) AS BIGINT))
        |      ::DOUBLE / count(*) + 0.5) / 1000000.0
        |      AS decile_mean_slope
        |  FROM sl, med GROUP BY 1)
        |SELECT slope_decile, decile_mean_slope, slope_median,
        |  intercept_median, n_pairs
        |FROM prof, med, ic ORDER BY slope_decile""".stripMargin,
    "orders_survival_km" ->
      """WITH RECURSIVE r AS (
        |  SELECT o_custkey, o_orderdate::DATE AS day,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate::DATE) AS rn
        |  FROM orders),
        |per AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN rn = 1 THEN day END) AS d1,
        |    max(CASE WHEN rn = 2 THEN day END) AS d2
        |  FROM r GROUP BY o_custkey),
        |mx AS (SELECT max(o_orderdate::DATE) AS maxd FROM orders),
        |s AS (
        |  SELECT CASE WHEN d2 IS NOT NULL THEN d2 - d1
        |    ELSE maxd - d1 END::BIGINT AS dur,
        |    (d2 IS NOT NULL)::INT AS ev
        |  FROM per, mx),
        |h AS (
        |  SELECT dur, count(*)::BIGINT AS n_at,
        |    CAST(sum(ev) AS BIGINT) AS d_at
        |  FROM s GROUP BY dur),
        |hw AS (
        |  SELECT dur, n_at, d_at,
        |    CAST(sum(n_at) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
        |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk,
        |    row_number() OVER (ORDER BY dur) AS i
        |  FROM h),
        |rec(i, p) AS (
        |  SELECT i, 1.0 * (1 - d_at::DOUBLE / n_risk::DOUBLE)
        |  FROM hw WHERE i = 1
        |  UNION ALL
        |  SELECT hw.i, rec.p * (1 - hw.d_at::DOUBLE / hw.n_risk::DOUBLE)
        |  FROM rec JOIN hw ON hw.i = rec.i + 1)
        |SELECT hw.dur AS duration_days, hw.n_risk, hw.d_at AS n_events,
        |  floor(rec.p * 1000000.0 + 0.5) / 1000000.0 AS survival
        |FROM hw JOIN rec USING (i) ORDER BY duration_days""".stripMargin,
    "revenue_changepoint" ->
      """WITH d AS (
        |  SELECT o_orderdate,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      // 100 AS BIGINT) AS x
        |  FROM orders GROUP BY o_orderdate),
        |stt AS (
        |  SELECT CAST(sum(x) AS BIGINT) AS sx,
        |    sum(x::HUGEINT * x) AS sx2, count(*)::BIGINT AS n
        |  FROM d),
        |c AS (
        |  SELECT o_orderdate, x,
        |    CAST(count(*) OVER (ORDER BY o_orderdate) AS BIGINT) AS t,
        |    CAST(sum(x) OVER (ORDER BY o_orderdate) AS BIGINT) AS px
        |  FROM d),
        |e AS (
        |  SELECT c.o_orderdate, c.x,
        |    c.px - c.t * (stt.sx::DOUBLE / stt.n) AS cv,
        |    sqrt((stt.sx2 - stt.n * (stt.sx::DOUBLE / stt.n)
        |      * (stt.sx::DOUBLE / stt.n)) / stt.n) AS sigma,
        |    stt.n AS n
        |  FROM c, stt),
        |p AS (
        |  SELECT o_orderdate AS peak_date FROM e
        |  ORDER BY abs(cv) DESC, o_orderdate DESC LIMIT 1)
        |SELECT e.o_orderdate, e.x,
        |  floor(cv * 10000.0 + 0.5) / 10000.0 AS cusum,
        |  floor(cv / (sigma * sqrt(n)) * 1000000.0 + 0.5) / 1000000.0
        |    AS cusum_std,
        |  e.o_orderdate = p.peak_date AS is_changepoint
        |FROM e, p ORDER BY e.o_orderdate""".stripMargin,
    "revenue_acf" ->
      """WITH d AS (
        |  SELECT o_orderdate,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      // 100 AS BIGINT) AS x
        |  FROM orders GROUP BY o_orderdate),
        |r AS (
        |  SELECT x,
        |    CAST(row_number() OVER (ORDER BY o_orderdate) AS BIGINT) AS r
        |  FROM d),
        |stt AS (
        |  SELECT CAST(sum(x) AS BIGINT) AS sx,
        |    sum(x::HUGEINT * x) AS sx2, count(*)::BIGINT AS n
        |  FROM r),
        |l AS (SELECT unnest(range(1, 15)) AS lag_k),
        |p AS (
        |  SELECT l.lag_k, count(*)::BIGINT AS n_pairs,
        |    sum(a.x::HUGEINT * b.x) AS sxy,
        |    CAST(sum(a.x) AS BIGINT) AS sh,
        |    CAST(sum(b.x) AS BIGINT) AS st
        |  FROM r a, l JOIN r b ON b.r = a.r + l.lag_k
        |  GROUP BY l.lag_k)
        |SELECT p.lag_k, p.n_pairs,
        |  floor(((sxy - (sx::DOUBLE / n) * (sh + st)
        |      + n_pairs * (sx::DOUBLE / n) * (sx::DOUBLE / n))
        |    / (sx2 - n * (sx::DOUBLE / n) * (sx::DOUBLE / n)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS acf
        |FROM p, stt ORDER BY p.lag_k""".stripMargin,
    "basket_pairs" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey)::DOUBLE AS n_orders
        |  FROM items),
        |freq AS (
        |  SELECT l_partkey, count(*) AS f FROM items GROUP BY l_partkey),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    count(*) AS support
        |  FROM items a JOIN items b USING (l_orderkey)
        |  WHERE a.l_partkey < b.l_partkey
        |  GROUP BY a.l_partkey, b.l_partkey
        |  ORDER BY support DESC, part_a, part_b LIMIT 20)
        |SELECT part_a, part_b, support,
        |  floor(support * n.n_orders / (fa.f * fb.f) * 10000.0 + 0.5)
        |    / 10000.0 AS lift
        |FROM pairs
        |JOIN freq fa ON fa.l_partkey = part_a
        |JOIN freq fb ON fb.l_partkey = part_b, n
        |ORDER BY support DESC, part_a, part_b""".stripMargin,
    "customer_rfm" -> {
      val rb = (1 to 3).map(i =>
        s"floor(quantile_cont(r_days, 0.${i * 25}) * 10000.0 + 0.5)" +
          s" / 10000.0 AS r$i").mkString(", ")
      val fb = (1 to 3).map(i =>
        s"floor(quantile_cont(f_orders, 0.${i * 25}) * 10000.0 + 0.5)" +
          s" / 10000.0 AS f$i").mkString(", ")
      val mb = (1 to 3).map(i =>
        s"floor(quantile_cont(m_value, 0.${i * 25}) * 10000.0 + 0.5)" +
          s" / 10000.0 AS m$i").mkString(", ")
      val rs = (1 to 3).map(i => s"(r_days > q.r$i)::INT").mkString(" + ")
      val fs = (1 to 3).map(i => s"(f_orders > q.f$i)::INT").mkString(" + ")
      val ms = (1 to 3).map(i => s"(m_value > q.m$i)::INT").mkString(" + ")
      s"""WITH mx AS (SELECT max(o_orderdate::DATE) AS maxd FROM orders),
         |per AS (
         |  SELECT o_custkey,
         |    CAST(mx.maxd - max(o_orderdate::DATE) AS BIGINT) AS r_days,
         |    count(*) AS f_orders,
         |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT))
         |      AS m_cents,
         |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)
         |      )::DOUBLE / 100.0 AS m_value
         |  FROM orders, mx GROUP BY o_custkey, mx.maxd),
         |q AS (SELECT $rb, $fb, $mb FROM per),
         |s AS (
         |  SELECT CAST(5 - (1 + $rs) AS BIGINT) AS r_score,
         |    CAST(1 + $fs AS BIGINT) AS f_score,
         |    CAST(1 + $ms AS BIGINT) AS m_score,
         |    r_days, f_orders, m_cents, m_value
         |  FROM per CROSS JOIN q)
         |SELECT r_score, f_score, m_score, count(*) AS n_customers,
         |  floor(sum(r_days)::DOUBLE / count(*) * 100.0 + 0.5) / 100.0
         |    AS avg_recency,
         |  floor(sum(f_orders)::DOUBLE / count(*) * 10000.0 + 0.5)
         |    / 10000.0 AS avg_frequency,
         |  floor(sum(m_cents)::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0
         |    AS sum_value
         |FROM s GROUP BY r_score, f_score, m_score
         |ORDER BY r_score, f_score, m_score""".stripMargin
    },
    "topk_orders_heap" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "order_value_deciles" -> {
      val bs = (1 to 9).map(i =>
        s"floor(quantile_cont(o_totalprice, 0.${i}) * 10000.0 + 0.5)" +
          s" / 10000.0 AS b$i").mkString(",\n    ")
      val cmp = (1 to 9).map(i =>
        s"(o_totalprice > b.b$i)::INT").mkString(" + ")
      s"""WITH b AS (
         |  SELECT
         |    $bs
         |  FROM orders),
         |d AS (
         |  SELECT o_totalprice, 1 + $cmp AS decile
         |  FROM orders CROSS JOIN b)
         |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_orders,
         |  floor(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)
         |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS sum_value,
         |  floor(min(o_totalprice) * 100.0 + 0.5) / 100.0 AS min_value,
         |  floor(max(o_totalprice) * 100.0 + 0.5) / 100.0 AS max_value
         |FROM d GROUP BY decile ORDER BY decile""".stripMargin
    },
    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "revenue_7day_avg" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT))
        |      AS revc
        |  FROM orders GROUP BY 1),
        |n AS (
        |  SELECT *, date_diff('day', DATE '1995-01-01', day)::BIGINT AS dnum
        |  FROM d)
        |SELECT day,
        |  floor(revc::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS revenue,
        |  floor((sum(revc) OVER (ORDER BY dnum
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))::DOUBLE / 100.0
        |    / (count(*) OVER (ORDER BY dnum
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) * 100.0 + 0.5)
        |    / 100.0 AS avg_7day,
        |  count(*) OVER (ORDER BY dnum
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_days_window
        |FROM n ORDER BY day""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH supp AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |offer AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |off2 AS (
        |  SELECT o.l_partkey, o.l_suppkey, o.cost, p.p_partkey, p.p_name
        |  FROM offer o
        |  JOIN part p ON o.l_partkey = p.p_partkey AND p.p_size = 15
        |  JOIN supp s ON o.l_suppkey = s.s_suppkey),
        |best AS (
        |  SELECT l_partkey, min(cost) AS best_cost FROM off2 GROUP BY 1),
        |pick AS (
        |  SELECT o.p_partkey, o.p_name, b.best_cost, min(o.l_suppkey) AS s_suppkey
        |  FROM off2 o JOIN best b ON o.l_partkey = b.l_partkey AND o.cost = b.best_cost
        |  GROUP BY 1, 2, 3)
        |SELECT p.p_partkey, p.p_name, p.s_suppkey, s.s_name, s.n_name,
        |  floor(p.best_cost * 10000.0 + 0.5) / 10000.0 AS cost
        |FROM pick p JOIN supp s ON p.s_suppkey = s.s_suppkey
        |ORDER BY p.p_partkey""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT floor(sum(
        |      CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))::DOUBLE
        |    / 10000.0 * 100.0 + 0.5)
        |    / 100.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """SELECT year(o_orderdate)::BIGINT AS o_year,
        |  floor(sum(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |      ELSE 0 END)::DOUBLE
        |    / sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |      )::DOUBLE * 10000.0 + 0.5)
        |    / 10000.0 AS mkt_share
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
        |  floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |    * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |    - 60 * CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
        |    * CAST(floor(l_quantity + 0.5) AS BIGINT))::DOUBLE / 10000.0 * 100.0 + 0.5)
        |    / 100.0 AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))::DOUBLE
        |    / 10000.0 * 100.0 + 0.5)
        |    / 100.0 AS revenue,
        |  floor(c_acctbal * 100.0 + 0.5) / 100.0 AS c_acctbal, n_name
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q12_late_priority" ->
      """SELECT CASE
        |    WHEN l_shipdate > o_orderdate + INTERVAL 120 DAY THEN 'very_late'
        |    WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 'late'
        |    ELSE 'ontime' END AS ship_bucket,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY ship_bucket""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT floor(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |      ELSE 0 END)::DOUBLE
        |    / sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
        |      )::DOUBLE * 10000.0 + 0.5)
        |    / 10000.0 AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q15_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))::DOUBLE
        |    / 10000.0 * 100.0 + 0.5)
        |      / 100.0 AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM r)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH thr AS (
        |  SELECT l_partkey,
        |    sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::DOUBLE / count(*) * 0.2
        |      AS qty_thresh
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT floor(sum(
        |    CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 / 7.0 * 100.0 + 0.5)
        |  / 100.0 AS avg_yearly
        |FROM lineitem l
        |JOIN part ON l.l_partkey = p_partkey
        |JOIN thr ON l.l_partkey = thr.l_partkey
        |WHERE p_brand = 'Brand#23' AND l.l_quantity < qty_thresh""".stripMargin,
    "q19_bracketed_revenue" ->
      """SELECT floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))::DOUBLE
        |    / 10000.0 * 100.0 + 0.5)
        |  / 100.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_dominant_suppliers" ->
      """WITH pq AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS supp_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |  GROUP BY 1, 2),
        |tot AS (SELECT l_partkey, sum(supp_qty) AS part_qty FROM pq GROUP BY 1),
        |dom AS (
        |  SELECT DISTINCT pq.l_suppkey
        |  FROM pq JOIN tot ON pq.l_partkey = tot.l_partkey
        |  WHERE supp_qty > part_qty * 0.12)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN dom ON s_suppkey = dom.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH flags AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |      THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |per_order AS (
        |  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late_supp
        |  FROM flags GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM flags f
        |JOIN per_order p ON f.l_orderkey = p.l_orderkey
        |JOIN supplier ON f.l_suppkey = s_suppkey
        |WHERE f.late = 1 AND p.n_late_supp = 1 AND p.n_supp >= 2
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,
    "q7_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate)::BIGINT AS l_year,
        |  floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))::DOUBLE
        |    / 10000.0 * 100.0 + 0.5)
        |    / 100.0 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q11_part_value_share" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS v
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey,
        |  floor(v::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS value FROM pv
        |WHERE v::DOUBLE > (SELECT sum(v)::DOUBLE / count(*) * 1.5 FROM pv)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q16_brand_suppliers" ->
      """SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 300.0)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  floor(qty * 100.0 + 0.5) / 100.0 AS total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    "q22_idle_balance" ->
      """SELECT c_nationkey, count(*) AS n_cust,
        |  floor(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT
        |    sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS HUGEINT))::DOUBLE
        |    / 100.0 / count(*) FROM customer)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "customer_max_order" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (
        |  SELECT max(o_totalprice) FROM orders i
        |  WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "nation_set_ops" ->
      """WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |SELECT 'both' AS side, nationkey FROM (
        |  SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        |UNION ALL
        |SELECT 'customer_only', nationkey FROM (
        |  SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        |UNION ALL
        |SELECT 'supplier_only', nationkey FROM (
        |  SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
        |ORDER BY side, nationkey""".stripMargin,
    "geomean_order_value" ->
      """SELECT o_orderpriority,
        |  floor(exp(sum(CASE WHEN o_totalprice > 0
        |      THEN CAST(floor(ln(o_totalprice)
        |        * 1000000000000.0 + 0.5) AS HUGEINT)
        |      ELSE 0 END)::DOUBLE
        |    / 1000000000000.0 / count(*)) * 10000.0 + 0.5)
        |    / 10000.0 AS geomean_value,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "discounted_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "customers_without_orders" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "revenue_rollup" ->
      """SELECT year(o_orderdate)::BIGINT AS yr,
        |  month(o_orderdate)::BIGINT AS mo,
        |  floor(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate)::BIGINT, month(o_orderdate)::BIGINT)
        |ORDER BY yr ASC NULLS FIRST, mo ASC NULLS FIRST""".stripMargin,
    "running_revenue" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)) AS revc
        |  FROM orders GROUP BY 1)
        |SELECT month,
        |  floor(revc::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS revenue,
        |  floor((sum(revc) OVER (ORDER BY month
        |    ROWS UNBOUNDED PRECEDING))::DOUBLE / 100.0 * 100.0 + 0.5)
        |    / 100.0 AS cum_revenue
        |FROM m ORDER BY month""".stripMargin,
    "orders_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey, o_totalprice,
        |    date_trunc('month', o_orderdate)::DATE AS om
        |  FROM orders),
        |ch AS (SELECT o_custkey, min(om) AS cm FROM o
        |       GROUP BY o_custkey),
        |g AS (
        |  SELECT ch.cm AS cohort_month,
        |    datediff('month', ch.cm, o.om)::BIGINT AS age,
        |    sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS HUGEINT))
        |      AS revc,
        |    count(DISTINCT o.o_custkey) AS n_active
        |  FROM o JOIN ch ON ch.o_custkey = o.o_custkey
        |  GROUP BY 1, 2)
        |SELECT cohort_month, age, n_active,
        |  floor(revc::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS rev,
        |  floor((sum(revc) OVER (PARTITION BY cohort_month ORDER BY age
        |    ROWS UNBOUNDED PRECEDING))::DOUBLE / 100.0 * 100.0 + 0.5)
        |    / 100.0 AS cum_rev
        |FROM g ORDER BY cohort_month, age""".stripMargin,
    "orders_interarrival" ->
      """WITH g0 AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate::DATE AS day,
        |    lag(o_orderdate::DATE) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate::DATE, o_orderkey) AS prev
        |  FROM orders),
        |g AS (
        |  SELECT (day - prev)::BIGINT AS gap_days FROM g0
        |  WHERE prev IS NOT NULL),
        |hist AS (
        |  SELECT gap_days // 7 AS week_bin, count(*) AS n_gaps
        |  FROM g GROUP BY 1),
        |p AS (
        |  SELECT
        |    floor(quantile_cont(gap_days, 0.5) * 10000.0 + 0.5)
        |      / 10000.0 AS p50,
        |    floor(quantile_cont(gap_days, 0.9) * 10000.0 + 0.5)
        |      / 10000.0 AS p90
        |  FROM g)
        |SELECT week_bin, n_gaps, p.p50, p.p90 FROM hist, p
        |ORDER BY week_bin""".stripMargin,
    "orders_seasonal_decompose" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate)::DATE AS month,
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT))
        |      AS revc
        |  FROM orders GROUP BY 1),
        |m2 AS (
        |  SELECT month, revc,
        |    floor(revc::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS rev
        |  FROM m),
        |o AS (
        |  SELECT month, rev,
        |    lag(rev, 6) OVER (ORDER BY month) AS rm6,
        |    lead(rev, 6) OVER (ORDER BY month) AS lm6,
        |    (sum(revc) OVER (ORDER BY month
        |      ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING))::DOUBLE / 100.0
        |      AS s11,
        |    count(*) OVER (ORDER BY month
        |      ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS n11
        |  FROM m2),
        |t AS (
        |  SELECT month, rev,
        |    floor((0.5 * rm6 + s11 + 0.5 * lm6) / 12.0
        |      * 10000.0 + 0.5) / 10000.0 AS trend
        |  FROM o
        |  WHERE rm6 IS NOT NULL AND lm6 IS NOT NULL AND n11 = 11),
        |sx AS (
        |  SELECT month(month)::BIGINT AS moy,
        |    floor(sum(CAST(floor((rev - trend) * 10000.0 + 0.5)
        |        AS BIGINT))::DOUBLE / 10000.0 / count(*)
        |      * 10000.0 + 0.5) / 10000.0 AS seasonal
        |  FROM t GROUP BY 1)
        |SELECT t.month, t.rev, t.trend, sx.seasonal,
        |  floor((t.rev - t.trend - sx.seasonal) * 10000.0 + 0.5)
        |    / 10000.0 AS residual
        |FROM t JOIN sx ON month(t.month)::BIGINT = sx.moy
        |ORDER BY t.month""".stripMargin,
    "customer_decile_migration" ->
      """WITH o AS (
        |  SELECT o_custkey, o_totalprice, epoch_us(o_orderdate) AS us
        |  FROM orders),
        |mm AS (SELECT (min(us) + max(us)) // 2 AS mid FROM o),
        |p1 AS (
        |  SELECT o_custkey,
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)
        |      )::DOUBLE / 100.0 AS v FROM o, mm
        |  WHERE us < mid GROUP BY o_custkey),
        |p2 AS (
        |  SELECT o_custkey,
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)
        |      )::DOUBLE / 100.0 AS v FROM o, mm
        |  WHERE us >= mid GROUP BY o_custkey),
        |b1 AS (
        |  SELECT list_transform(quantile_cont(v, [0.2, 0.4, 0.6, 0.8]),
        |    x -> floor(x * 10000.0 + 0.5) / 10000.0) AS bs
        |  FROM p1),
        |b2 AS (
        |  SELECT list_transform(quantile_cont(v, [0.2, 0.4, 0.6, 0.8]),
        |    x -> floor(x * 10000.0 + 0.5) / 10000.0) AS bs
        |  FROM p2),
        |s1 AS (
        |  SELECT o_custkey,
        |    (1 + len(list_filter(b1.bs, b -> p1.v > b)))::BIGINT AS q1
        |  FROM p1, b1),
        |s2 AS (
        |  SELECT o_custkey,
        |    (1 + len(list_filter(b2.bs, b -> p2.v > b)))::BIGINT AS q2
        |  FROM p2, b2),
        |j AS (
        |  SELECT coalesce(s1.q1, 0) AS q1, coalesce(s2.q2, 0) AS q2
        |  FROM s1 FULL OUTER JOIN s2 ON s1.o_custkey = s2.o_custkey)
        |SELECT q1, q2, count(*) AS n_customers FROM j
        |GROUP BY q1, q2 ORDER BY q1, q2""".stripMargin,
    "orders_rolling_median" ->
      """WITH daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    floor(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)
        |      )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS rev
        |  FROM orders GROUP BY 1),
        |contrib AS (
        |  SELECT day + o::INT AS tday, rev
        |  FROM daily, (SELECT unnest(range(0, 7)) AS o) u),
        |med AS (
        |  SELECT tday,
        |    floor(quantile_cont(rev, 0.5) * 100.0 + 0.5) / 100.0
        |      AS median_7day,
        |    count(*) AS n_days_window
        |  FROM contrib GROUP BY tday)
        |SELECT d.day, d.rev AS revenue, m.median_7day, m.n_days_window
        |FROM daily d JOIN med m ON m.tday = d.day
        |ORDER BY d.day""".stripMargin,
    "orders_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      / 100.0 AS rev
        |  FROM orders GROUP BY 1),
        |a AS (SELECT list(rev ORDER BY day) AS ys FROM daily),
        |init AS (
        |  SELECT ys, len(ys) AS n,
        |    list_reduce(list_prepend(0.0::DOUBLE, ys[1:7]),
        |      (x, y) -> x + y) / 7.0 AS l0
        |  FROM a),
        |init2 AS (
        |  SELECT ys, n, l0,
        |    (list_reduce(list_prepend(0.0::DOUBLE, ys[8:14]),
        |      (x, y) -> x + y) / 7.0 - l0) / 7.0 AS b0,
        |    [y - l0 for y in ys[1:7]] AS s0
        |  FROM init),
        |rec(i, l, b, ss) AS (
        |  SELECT 7, l0, b0, s0 FROM init2
        |  UNION ALL
        |  SELECT rec.i + 1,
        |    0.5 * (i2.ys[rec.i + 1] - rec.ss[1])
        |      + 0.5 * (rec.l + rec.b),
        |    0.25 * (0.5 * (i2.ys[rec.i + 1] - rec.ss[1])
        |      + 0.5 * (rec.l + rec.b) - rec.l) + 0.75 * rec.b,
        |    list_append(rec.ss[2:7],
        |      0.25 * (i2.ys[rec.i + 1]
        |        - (0.5 * (i2.ys[rec.i + 1] - rec.ss[1])
        |          + 0.5 * (rec.l + rec.b)))
        |      + 0.75 * rec.ss[1])
        |  FROM rec, init2 i2 WHERE rec.i < i2.n),
        |fin AS (SELECT l, b, ss FROM rec ORDER BY i DESC LIMIT 1),
        |hs AS (SELECT unnest(range(1, 15)) AS h)
        |SELECT h::BIGINT AS h,
        |  floor((l + h * b + ss[((h - 1) % 7)::INT + 1])
        |    * 10000.0 + 0.5) / 10000.0 AS forecast
        |FROM fin, hs ORDER BY h""".stripMargin,
    "orders_holt_forecast" ->
      """WITH RECURSIVE daily AS (
        |  SELECT o_orderdate::DATE AS day,
        |    floor(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT)
        |      )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS rev
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT day, rev, row_number() OVER (ORDER BY day) AS i
        |  FROM daily),
        |rec(i, l, b) AS (
        |  SELECT 1::BIGINT, rev::DOUBLE, 0.0::DOUBLE FROM s WHERE i = 1
        |  UNION ALL
        |  SELECT s.i, 0.5 * s.rev + 0.5 * (rec.l + rec.b),
        |    0.25 * (0.5 * s.rev + 0.5 * (rec.l + rec.b) - rec.l)
        |      + 0.75 * rec.b
        |  FROM rec JOIN s ON s.i = rec.i + 1),
        |fin AS (SELECT l, b FROM rec ORDER BY i DESC LIMIT 1),
        |hs AS (SELECT unnest(range(1, 8)) AS h)
        |SELECT h::BIGINT AS h,
        |  floor((l + h * b) * 10000.0 + 0.5) / 10000.0 AS forecast
        |FROM fin, hs ORDER BY h""".stripMargin,
    "events_windowed_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |w1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'signup' THEN us END)
        |    OVER (PARTITION BY user_id) AS t1
        |  FROM ev),
        |w2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND us > t1
        |    THEN us END) OVER (PARTITION BY user_id) AS t2
        |  FROM w1),
        |w3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2
        |    THEN us END) OVER (PARTITION BY user_id) AS t3
        |  FROM w2),
        |per AS (
        |  SELECT user_id, max(t1) AS signup_us, max(t2) AS view_us,
        |    max(t3) AS purchase_us
        |  FROM w3 GROUP BY user_id)
        |SELECT user_id, signup_us, view_us, purchase_us,
        |  purchase_us IS NOT NULL AND
        |    purchase_us - signup_us <= 604800000000 AS completed
        |FROM per WHERE signup_us IS NOT NULL
        |ORDER BY user_id""".stripMargin,
    "events_funnel" ->
      """WITH s AS (
        |  SELECT user_id, min(epoch_us(ts)) AS signup_us FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS purchase_ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT s.user_id, s.signup_us,
        |  min(p.purchase_ts) AS first_purchase_us,
        |  min(p.purchase_ts) IS NOT NULL AS converted,
        |  min(p.purchase_ts) - s.signup_us AS lag_us
        |FROM s LEFT JOIN p
        |  ON s.user_id = p.user_id AND p.purchase_ts >= s.signup_us
        |GROUP BY s.user_id, s.signup_us
        |ORDER BY s.user_id""".stripMargin,
    "supplier_part_share" ->
      """WITH agg AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT))
        |      AS rev
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |t AS (
        |  SELECT *, sum(rev) OVER (PARTITION BY l_partkey) AS part_total
        |  FROM agg),
        |r AS (
        |  SELECT l_partkey, l_suppkey,
        |    floor(rev::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS revenue,
        |    floor(part_total::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0
        |      AS part_total,
        |    floor(rev::DOUBLE / part_total::DOUBLE * 10000.0 + 0.5)
        |      / 10000.0 AS share,
        |    row_number() OVER (ORDER BY part_total DESC, l_partkey, l_suppkey) AS rnk
        |  FROM t)
        |SELECT l_partkey, l_suppkey, revenue, part_total, share, rnk
        |FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin,
    "q1_pricing_summary" ->
      """WITH u AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS pc,
        |    CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS dh,
        |    CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS th
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
        |SELECT l_returnflag, l_linestatus,
        | floor(sum(qty)::DOUBLE * 100.0 + 0.5) / 100.0 AS sum_qty,
        | floor(sum(pc::HUGEINT)::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0
        |   AS sum_base_price,
        | floor(sum(pc::HUGEINT * (100 - dh))::DOUBLE / 10000.0
        |   * 100.0 + 0.5) / 100.0 AS sum_disc_price,
        | floor(sum(pc::HUGEINT * (100 - dh) * (100 + th))::DOUBLE
        |   / 1000000.0 * 100.0 + 0.5) / 100.0 AS sum_charge,
        | floor(sum(qty)::DOUBLE / count(*) * 10000.0 + 0.5) / 10000.0
        |   AS avg_qty,
        | floor(sum(pc::HUGEINT)::DOUBLE / 100.0 / count(*)
        |   * 10000.0 + 0.5) / 10000.0 AS avg_price,
        | floor(sum(dh::HUGEINT)::DOUBLE / 100.0 / count(*)
        |   * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        | count(*) AS count_order
        |FROM u
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o_orderkey,
        | floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))::DOUBLE
        |    / 10000.0 * 100.0 + 0.5) / 100.0
        |   AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        | floor(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))::DOUBLE
        |    / 10000.0 * 100.0 + 0.5) / 100.0
        |   AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "topk_customers_per_nation" ->
      """WITH rev AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    floor(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT))::DOUBLE
        |      / 100.0 * 100.0 + 0.5) / 100.0 AS total_spent
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey, c_name, c_nationkey)
        |SELECT n_name, c_custkey, c_name, total_spent, rnk
        |FROM (
        |  SELECT rev.*, row_number() OVER (
        |    PARTITION BY c_nationkey
        |    ORDER BY total_spent DESC, c_custkey) AS rnk
        |  FROM rev) t
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE rnk <= 3
        |ORDER BY n_name, rnk""".stripMargin,
    "monthly_revenue" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        | floor(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS HUGEINT))::DOUBLE
        |   / 100.0 * 100.0 + 0.5) / 100.0 AS revenue,
        | count(*) AS n_orders
        |FROM orders
        |GROUP BY 1
        |ORDER BY month""".stripMargin)
}
