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

  test("every queries key with an oracle is present") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
