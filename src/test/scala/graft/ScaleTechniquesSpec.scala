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

  test("bloom-filter pre-join prunes the probe side with zero false negatives") {
    import org.apache.spark.sql.Row
    // the runtime-filter shape for 100 TB fact-fact joins: build a
    // bloom over the (selective) build-side keys, push might_contain
    // into the probe scan, then finish with the exact join on the
    // survivors. The bloom pass is superset-correct: it may pass
    // false positives (bounded by fpp) but never drops a true match.
    val hot = Tables.load(spark, sf, "orders")
      .filter($"o_totalprice" > 400000.0).select($"o_orderkey")
    val nHot = hot.count()
    assert(nHot > 0)
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // bloom_filter_agg / might_contain are Catalyst-internal on Spark 4
    // (registered only for the engine's own runtime filters) — reach
    // them through the bridge
    val bloomRow: Row = hot
      .agg(GraftBridge.column(new BloomFilterAggregate(
        GraftBridge.expression($"o_orderkey"),
        Literal(10000L), Literal(100000L)).toAggregateExpression())
        .as("bf"))
      .head()
    val bf = bloomRow.getAs[Array[Byte]]("bf")
    val lineitem = Tables.load(spark, sf, "lineitem")
    val bloomed = lineitem
      .filter(GraftBridge.column(BloomFilterMightContain(
        Literal(bf, org.apache.spark.sql.types.BinaryType),
        GraftBridge.expression($"l_orderkey"))))
      .select($"l_orderkey")
    val exact = lineitem.join(hot, $"l_orderkey" === $"o_orderkey",
      "left_semi").select($"l_orderkey")
    val bloomedCnt = bloomed.count()
    val exactCnt = exact.count()
    // no false negatives: everything the exact semi-join keeps survives
    assert(exact.except(bloomed).count() === 0L)
    // and the pass-through is a real reduction, near the exact rate
    val total = lineitem.count()
    assert(bloomedCnt >= exactCnt && bloomedCnt < total / 2,
      s"bloom passed $bloomedCnt of $total (exact $exactCnt)")
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
