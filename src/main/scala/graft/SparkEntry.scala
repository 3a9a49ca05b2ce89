package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, Events}

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")
  }

  /** Ensure session conf/functions regardless of who built the session. */
  private def wrap(f: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame =
    (s, dir) => { GraftSession.prepare(s); f(s, dir) }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> wrap(Analytics.q1PricingSummary),
    "q3_shipping_priority" -> wrap(Analytics.q3ShippingPriority),
    "q5_region_revenue" -> wrap(Analytics.q5RegionRevenue),
    "topk_customers_per_nation" -> wrap(Analytics.topkCustomersPerNation),
    "monthly_revenue" -> wrap(Analytics.monthlyRevenue),
    "events_sessionize" -> wrap(Events.sessionize(_, _)),
    "events_window_agg" -> wrap(Events.windowAgg)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Analytics.oracles ++ Events.oracles
}
