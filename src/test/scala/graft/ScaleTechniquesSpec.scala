package graft

import org.apache.spark.sql.functions._

import graft.stac.{StacOps, StacSynth}

/** Evidence specs for the §4 scale techniques that don't surface as
  * driver queries: bucketed co-located joins and malformed-input
  * resilience.
  */
class ScaleTechniquesSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed tables join without a shuffle (co-located join)") {
    // default warehouse (./spark-warehouse, gitignored);
    // disable auto-broadcast so the join strategy depends on bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf, "orders")
        .write.format("parquet").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
      Tables.load(spark, sf, "lineitem")
        .write.format("parquet").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(round(sum($"l_extendedprice"), 2).as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // no Exchange (shuffle) between the join and its scans — the
      // only allowed Exchange is the post-join groupBy on a new key
      val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === 5)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("malformed STAC item JSON degrades to nulls, not failures") {
    import org.apache.spark.sql.types._
    val itemSchema = StructType(Seq(
      StructField("id", StringType),
      StructField("collection", StringType)))
    val df = Seq(
      """{"id": "ok1", "collection": "C"}""",
      """{"id": "ok2", "collection"::: busted""",
      """not json at all""").toDF("item_json")
      .withColumn("item", from_json($"item_json", itemSchema))
      .select($"item.id".as("id"))
    val ids = df.collect().map(r => Option(r.getString(0)))
    assert(ids === Array(Some("ok1"), None, None))
    // and the real parse query tolerates the full catalog
    assert(StacOps.parseItems(spark, sf).filter($"item_id".isNull).count() === 0)
  }

  test("catalog scan prunes columns for narrow operators") {
    val plan = StacOps.mgrsExtract(spark, sf)
      .queryExecution.executedPlan.toString
    // only the columns feeding the tile regex should be read
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderdate:timestamp"),
      s"expected narrow ReadSchema in:\n${plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")}")
  }
}
