package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Analytics

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, dir) => Analytics.q1PricingSummary(s, dir)),
    "q3_shipping_priority" -> ((s, dir) => Analytics.q3ShippingPriority(s, dir)),
    "q5_region_revenue" -> ((s, dir) => Analytics.q5RegionRevenue(s, dir)),
    "topk_customers_per_nation" -> ((s, dir) => Analytics.topkCustomersPerNation(s, dir)),
    "monthly_revenue" -> ((s, dir) => Analytics.monthlyRevenue(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Analytics.oracles
}
