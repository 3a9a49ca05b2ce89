package graft

import graft.ops.Analytics

class AnalyticsSpec extends SparkSpecBase {

  test("q1 pricing summary: 3x2 flag/status groups, positive sums") {
    val rows = Analytics.q1PricingSummary(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.forall(_.getDouble(2) > 0)) // sum_qty
    val flags = rows.map(_.getString(0)).distinct.sorted
    assert(flags === Array("A", "N", "R"))
  }

  test("q3 returns top-10 ordered by revenue desc") {
    val rows = Analytics.q3ShippingPriority(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
  }

  test("q5 region revenue: nations of ASIA only") {
    val rows = Analytics.q5RegionRevenue(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getDouble(1) > 0))
  }

  test("topk per nation: at most 3 per nation, ranks 1..3") {
    val rows = Analytics.topkCustomersPerNation(spark, sf).collect()
    val byNation = rows.groupBy(_.getString(0))
    assert(byNation.values.forall(_.length <= 3))
    assert(rows.forall(r => r.getLong(4) >= 1 && r.getLong(4) <= 3))
  }

  test("heap top-k equals the window formulation, partial-aggregates map-side") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    val df = Analytics.topkOrdersHeap(spark, sf)
    val got = df.collect().toSeq
    val w = W.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val expected = graft.Tables.load(spark, sf, "orders")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .select($"o_custkey", $"rnk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rnk").collect().toSeq
    assert(got === expected)
    // the whole point: a two-phase (partial + final) object aggregate,
    // not a whole-table sort under a window
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("RunningWindowFunction"))
  }

  test("monthly revenue covers the orderdate span contiguously-ish") {
    val rows = Analytics.monthlyRevenue(spark, sf).collect()
    assert(rows.length > 12)
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("B38 TPC-H plans: q6 pushes every predicate; no cartesian/BNLJ anywhere") {
    // q6 is the pure scan-agg: all three predicates must reach the
    // parquet scan, and only the 4 referenced columns are read
    val q6 = Analytics.q6ForecastRevenue(spark, sf)
    q6.collect()
    val p6 = q6.queryExecution.executedPlan.toString
    assert(p6.contains("PushedFilters:") &&
      p6.contains("GreaterThanOrEqual(l_shipda"), s"q6 shipdate not pushed:\n$p6")
    assert(p6.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate"), s"q6 reads extra columns:\n$p6")
    // the join-heavy shapes must never degrade to per-row join strategies
    for (name <- Seq("q2_min_cost_supplier", "q8_market_share",
      "q13_order_distribution", "q15_top_supplier", "q17_small_qty_revenue",
      "q20_dominant_suppliers", "q21_waiting_suppliers")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian:\n$plan")
      // the only BNLJ allowed is a broadcast one-row scalar frame
      // (q15's max subquery); anything joining two multi-row sides is a bug
      if (!Set("q15_top_supplier").contains(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name has a BNLJ:\n$plan")
    }
  }

  test("every queries key with an oracle is present") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("order value deciles: full partition, approximately equi-depth, ordered edges") {
    import spark.implicits._
    val d = graft.ops.Analytics.orderValueDeciles(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(d.map(_._1).toSeq === (1L to 10L))
    val total = graft.Tables.load(spark, sf, "orders").count()
    assert(d.map(_._2).sum === total)
    val ideal = total / 10.0
    d.foreach { case (i, n, _, mn, mx) =>
      assert(n >= ideal * 0.5 && n <= ideal * 1.5, s"decile $i depth $n")
      assert(mn <= mx)
    }
    // decile ranges don't overlap: each max <= next min
    d.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._4, s"deciles ${a._1}/${b._1} overlap")
    }
  }

  test("basket pairs equal an in-memory co-occurrence recompute") {
    import spark.implicits._
    val items = graft.Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .distinct
    val nOrders = items.map(_._1).distinct.length.toDouble
    val freq = items.groupBy(_._2).view.mapValues(_.length).toMap
    val support = items.groupBy(_._1).values.flatMap { lines =>
      val ps = lines.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = support.toSeq
      .sortBy { case ((a, b), s) => (-s, a, b) }.take(20).toMap
    val got = Analytics.basketPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("lift")))
    assert(got.length === math.min(20, support.size))
    got.foreach { case (a, b, s, lift) =>
      assert(s === expect((a, b)), s"pair ($a,$b)")
      val l = s * nOrders / (freq(a) * freq(b)).toDouble
      assert(math.abs(lift - math.floor(l * 1e4 + 0.5) / 1e4) < 1e-9)
    }
  }

  test("rfm segments: scores in 1..4, customers conserved, axes discriminate") {
    import spark.implicits._
    val seg = Analytics.customerRfm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("n_customers"), r.getAs[Double]("avg_recency")))
    assert(seg.nonEmpty)
    seg.foreach { case (r, f, m, n, _) =>
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4)
      assert(n > 0)
    }
    val nCustomers = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey").distinct().count()
    assert(seg.map(_._4).sum === nCustomers)
    // every quartile level of each axis is populated
    assert(seg.map(_._1).distinct.length === 4)
    assert(seg.map(_._3).distinct.length === 4)
    // recency score is anti-monotone in actual recency: r=4 segments
    // (most recent quartile) average fewer days-since than r=1 ones
    val byR = seg.groupBy(_._1).view.mapValues { g =>
      g.map(x => x._5 * x._4).sum / g.map(_._4).sum
    }.toMap
    assert(byR(4L) < byR(1L))
  }

  test("CUSUM changepoint: telescopes to zero, one flagged peak") {
    import spark.implicits._
    val rows = graft.ops.Analytics.revenueChangepoint(spark, sf)
      .select($"x", $"cusum", $"is_changepoint")
      .as[(Long, Double, Boolean)].collect()
    // exactly one argmax-flagged day
    assert(rows.count(_._3) === 1)
    // CUSUM telescopes: the final value is Σx − n·x̄ = 0 (to rounding)
    assert(math.abs(rows.last._2) < 0.51, rows.last.toString)
    // the flagged day carries the max |CUSUM|
    val maxAbs = rows.map(r => math.abs(r._2)).max
    assert(math.abs(math.abs(rows.find(_._3).get._2) - maxAbs) < 1e-9)
    // recurrence: C_t − C_{t−1} = x_t − x̄ (to the 4dp rounding)
    val xbar = rows.map(_._1).sum.toDouble / rows.length
    rows.sliding(2).take(50).foreach { case Array(a, b) =>
      assert(math.abs((b._2 - a._2) - (b._1 - xbar)) < 1e-3)
    }
  }

  test("Kaplan-Meier: monotone curve, risk-set accounting, ≡ serial") {
    import spark.implicits._
    val rows = graft.ops.Analytics.kaplanMeier(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    // survival is in [0, 1] (exactly 0 only if the last at-risk row
    // is an event) and non-increasing in duration
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    assert(rows.init.forall(_._4 > 0.0))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4 + 1e-12, s"$a -> $b")
    }
    // risk set at the first (smallest) duration = all customers
    val nCustomers = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey").distinct.count()
    assert(rows.head._2 === nCustomers)
    // serial replay of the product from the emitted (d_at, n_risk)
    var p = 1.0
    rows.foreach { case (_, nRisk, dAt, s) =>
      p *= 1.0 - dAt.toDouble / nRisk.toDouble
      assert(math.abs(s - math.floor(p * 1e6 + 0.5) / 1e6) < 1e-12)
    }
  }

  test("Holt-Winters ≡ serial triple-smoothing replay") {
    import spark.implicits._
    val got = graft.ops.Analytics.holtWinters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === 14)
    val ys = Tables.load(spark, sf, "orders")
      .groupBy(org.apache.spark.sql.functions.to_date($"o_orderdate").as("d"))
      .agg(org.apache.spark.sql.functions.expr(
        "floor(sum(o_totalprice) * 100.0D + 0.5D) / 100.0D").as("rev"))
      .orderBy($"d").select($"rev").as[Double].collect()
    var l = ys.take(7).sum / 7.0
    var b = (ys.slice(7, 14).sum / 7.0 - l) / 7.0
    var ss = ys.take(7).map(_ - l).toVector
    ys.drop(7).foreach { y =>
      val sOld = ss.head
      val nl = 0.5 * (y - sOld) + 0.5 * (l + b)
      val nb = 0.25 * (nl - l) + 0.75 * b
      val ns = 0.25 * (y - nl) + 0.75 * sOld
      l = nl; b = nb; ss = ss.tail :+ ns
    }
    (1 to 14).foreach { h =>
      val f = l + h * b + ss((h - 1) % 7)
      assert(got(h.toLong) === math.floor(f * 1e4 + 0.5) / 1e4, s"h=$h")
    }
    // weekly structure survives: same-weekday forecasts differ by
    // exactly 7 trend steps
    (1 to 7).foreach { h =>
      assert(math.abs((got(h + 7L) - got(h.toLong)) - 7 * b) < 2e-4)
    }
  }

  test("Poisson bootstrap: CI brackets the mean, resamples concentrate") {
    import spark.implicits._
    val rows = graft.ops.Analytics.bootstrapCi(spark, sf).collect()
    assert(rows.length === 32)
    val n = rows.head.getAs[Long]("n_orders")
    val mean = rows.head.getAs[Double]("mean_overall")
    val (lo, hi) = (rows.head.getAs[Double]("ci_lo"),
      rows.head.getAs[Double]("ci_hi"))
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] misses mean $mean")
    // Poisson(1) resample sizes concentrate at n ± sqrt(n)
    rows.foreach { r =>
      val eff = r.getAs[Long]("n_eff")
      assert(math.abs(eff - n) < 5 * math.sqrt(n.toDouble) + 10,
        s"resample size $eff far from $n")
    }
    // the bootstrap spread should track sigma/sqrt(n) (within 3x)
    val means = rows.map(_.getAs[Double]("mean_boot"))
    val mb = means.sum / means.length
    val sdBoot = math.sqrt(
      means.map(m => (m - mb) * (m - mb)).sum / (means.length - 1))
    val vals = Tables.load(spark, sf, "orders")
      .select($"o_totalprice").as[Double].collect()
    val mv = vals.sum / vals.length
    val se = math.sqrt(
      vals.map(v => (v - mv) * (v - mv)).sum / (vals.length - 1)) /
      math.sqrt(vals.length.toDouble)
    assert(sdBoot > se / 3 && sdBoot < se * 3,
      s"bootstrap se $sdBoot vs analytic $se")
  }

  test("Theil-Sen: full pair count, ordered deciles, bracketed median") {
    import spark.implicits._
    val rows = graft.ops.Analytics.theilSen(spark, sf).collect()
      .sortBy(_.getAs[Long]("slope_decile"))
    assert(rows.map(_.getAs[Long]("slope_decile")).toSeq === (0L to 9L))
    val nDays = Tables.load(spark, sf, "orders")
      .select($"o_orderdate").distinct.count()
    assert(rows.head.getAs[Long]("n_pairs") === nDays * (nDays - 1) / 2)
    // decile mean slopes are non-decreasing by construction
    val means = rows.map(_.getAs[Double]("decile_mean_slope"))
    means.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    // the median sits between the 5th and 6th decile means
    val med = rows.head.getAs[Double]("slope_median")
    assert(med >= means(4) - 1e-6 && med <= means(5) + 1e-6,
      s"median $med outside [${means(4)}, ${means(5)}]")
  }

  test("ridge regression ≡ serial normal equations, recovers the formula") {
    import spark.implicits._
    val got = graft.ops.Analytics.lineitemRidge(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // serial replay: exact integer moments + the same λ=1 solve
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select($"l_extendedprice", $"l_discount", $"l_tax")
      .as[(Double, Double, Double)].collect()
      .map { case (e, dd, tt) =>
        val el = math.floor(e + 0.5).toLong
        val dc = math.floor(dd * 100.0 + 0.5).toLong
        val tc = math.floor(tt * 100.0 + 0.5).toLong
        (el, el * dc, el * tc,
          math.floor(e * (1.0 - dd) * (1.0 + tt) + 0.5).toLong)
      }
    val n = li.length.toDouble
    def s(f: ((Long, Long, Long, Long)) => Long): Double =
      li.map(f).sum.toDouble
    val a = Array(
      Array(s(r => r._1 * r._1) + 1.0, s(r => r._1 * r._2),
        s(r => r._1 * r._3), s(_._1)),
      Array(s(r => r._1 * r._2), s(r => r._2 * r._2) + 1.0,
        s(r => r._2 * r._3), s(_._2)),
      Array(s(r => r._1 * r._3), s(r => r._2 * r._3),
        s(r => r._3 * r._3) + 1.0, s(_._3)),
      Array(s(_._1), s(_._2), s(_._3), n + 1.0))
    val b = Array(s(r => r._1 * r._4), s(r => r._2 * r._4),
      s(r => r._3 * r._4), s(_._4))
    // serial Gaussian elimination with partial pivoting
    val d = 4
    for (col <- 0 until d) {
      val p = (col until d).maxBy(r => math.abs(a(r)(col)))
      val (ta, tb) = (a(col), b(col)); a(col) = a(p); a(p) = ta
      b(col) = b(p); b(p) = tb
      for (r <- col + 1 until d) {
        val f = a(r)(col) / a(col)(col)
        for (c <- col until d) a(r)(c) -= f * a(col)(c)
        b(r) -= f * b(col)
      }
    }
    val beta = new Array[Double](d)
    for (r <- d - 1 to 0 by -1) {
      var acc = b(r)
      for (c <- r + 1 until d) acc -= a(r)(c) * beta(c)
      beta(r) = acc / a(r)(r)
    }
    assert(math.abs(got("coef_price") - beta(0)) < 1e-4)
    assert(math.abs(got("coef_price_disc") - beta(1)) < 1e-4)
    assert(math.abs(got("coef_price_tax") - beta(2)) < 1e-4)
    assert(math.abs(got("intercept") - beta(3)) < 1e-2)
    assert(got("n_rows") === li.length.toDouble)
    // coefficient recovery: the generator's ground truth is
    // y = e − 0.01·(e·dc) + 0.01·(e·tc) + O(10⁻⁴) cross term
    assert(math.abs(got("coef_price") - 1.0) < 0.02, got.toString)
    assert(math.abs(got("coef_price_disc") + 0.01) < 0.002, got.toString)
    assert(math.abs(got("coef_price_tax") - 0.01) < 0.002, got.toString)
    // and the fit is near-exact: R² > 0.999 against the mean model
    val ybar = li.map(_._4).sum.toDouble / n
    val ssTot = li.map(r => (r._4 - ybar) * (r._4 - ybar)).sum
    val ssRes = li.map { r =>
      val pred = beta(0) * r._1 + beta(1) * r._2 + beta(2) * r._3 + beta(3)
      (r._4 - pred) * (r._4 - pred)
    }.sum
    assert(1.0 - ssRes / ssTot > 0.999, s"R² = ${1.0 - ssRes / ssTot}")
    assert(math.abs(got("train_rmse") - math.sqrt(ssRes / n)) <
      math.max(1e-2, 1e-4 * math.sqrt(ssRes / n)))
  }
}
