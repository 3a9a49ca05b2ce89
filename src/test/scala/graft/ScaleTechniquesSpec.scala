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

  test("cell-partitioned ANN corpus: probed-cell scan prunes partitions, results exact") {
    import java.nio.file.Files
    // the D2a/D6 100 TB claim made concrete: the corpus laid out
    // partitioned BY IVF CELL means a query probing nprobe cells reads
    // only those directories — spatial-partition pruning for ANN
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
    val centroids = graft.ops.Similarity.lloydTrain(
      graft.ops.Similarity.sampleTrainingSet(vecs, 2048), 8, 1)
    val assigned = graft.ops.Similarity.assignCells(vecs, centroids)
    val dir = Files.createTempDirectory("graft-cells").toString
    assigned.write.mode("overwrite").partitionBy("cell").parquet(dir)
    val reread = spark.read.parquet(dir)
    val probed = reread.filter($"cell".isin(2, 5))
    probed.collect()
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell predicate must prune partitions, not filter rows:\n$plan")
    // pruned read returns exactly the rows the unpartitioned filter does
    val expected = assigned.filter($"cell".isin(2, 5))
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(probed.select($"vec_id").collect().map(_.getLong(0)).toSet
      === expected)
    assert(expected.nonEmpty)
  }

  test("grid-bucketed spatial join executes as a hash equi-join, never a nested loop") {
    // the naive point-in-box theta join can only plan as
    // BroadcastNestedLoopJoin (per-row predicate evaluation over the
    // cross space); the 10°-cell bucketing turns it into a broadcast
    // HASH join on (cx, cy) with containment as a residual filter
    val df = StacOps.gridJoin(spark, sf)
    val qe = df.queryExecution
    qe.toRdd.count() // materialize so AQE finalizes the plan
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "grid join degraded to a nested loop")
    // and the wrapped-bbox filter matches a manual two-box split
    val wrapped = StacOps.bboxFilterWrapped(spark, sf).collect()
    val left = StacOps.bboxFilter(spark, sf, (150.0, -20.0, 180.0, 60.0))
      .collect()
    val right = StacOps.bboxFilter(spark, sf, (-180.0, -20.0, -140.0, 60.0))
      .collect()
    assert(wrapped.map(_.getLong(0)).toSet ===
      (left.map(_.getLong(0)) ++ right.map(_.getLong(0))).toSet)
    assert(wrapped.nonEmpty)
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

  test("AQE splits a skewed shuffle partition at runtime") {
    // complementary to the declarative salt in events_skew_join: with
    // skew-join enabled and thresholds scaled to the test data, the
    // engine itself splits the hot partition after seeing runtime
    // shuffle stats — the no-code-change skew path
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val left = spark.range(0, 200000).select(
        when($"id" < 180000, 0L).otherwise($"id" % 1999 + 1).as("key"),
        $"id".as("v"))
      val right = spark.range(0, 2000).select($"id".as("key"),
        ($"id" * 3).as("w"))
      val joined = left.join(right, "key")
      // drive THIS queryExecution to completion — count()/head() spawn
      // their own plans and AQE finalizes only what actually ran
      val qe = joined.queryExecution
      assert(qe.toRdd.count() === 200000L) // every left row matches once
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.toLowerCase.contains("skew"),
        s"expected a skew-split join/shuffle-read in:\n$finalPlan")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("dynamic partition pruning reads only the dim-selected partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // a fact partitioned by a date-derived column + a filtered dim:
    // the fact scan must receive a runtime (dynamicpruning) predicate
    // and touch only the matching partition directories
    Tables.load(spark, sf, "orders")
      .withColumn("omonth", date_format($"o_orderdate", "yyyy-MM"))
      .write.partitionBy("omonth").mode("overwrite").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    val months = fact.select($"omonth").distinct().collect().map(_.getString(0))
    // the dim must be a scan with a surviving LIKELY-SELECTIVE filter
    // on a NON-join column: a LocalRelation constant-folds away, a
    // bare boolean fails isLikelySelective, and a literal filter on
    // the join key itself propagates STATICALLY (no runtime pruning
    // needed) — only the dim-attribute filter exercises DPP proper
    months.sorted.zipWithIndex.map { case (m, i) => (m, i.toLong) }
      .toSeq.toDF("omonth", "idx")
      .write.mode("overwrite").parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")
    val joined = fact.join(dim.filter($"idx" === 0L), "omonth")
      .agg(count(lit(1)).as("n"))
    val n = joined.head().getLong(0)
    val expected = fact.filter($"omonth" === months.min).count()
    assert(n === expected && n > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the fact scan in:\n$plan")
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

  test("D31 lsh anisotropy report: bounded stats, deterministic, PC dominates every axis") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(x as double)) as v")
    val n = vecs.count()
    val got = graft.ops.Similarity.lshCenteredReport(spark, sf).collect()
    assert(got.map(_.getString(0)).sorted ===
      Array("centered", "pc_removed", "raw"))
    got.foreach { r =>
      val (buckets, maxOcc, pairs) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(buckets >= 1 && buckets <= n)
      assert(maxOcc >= 1 && maxOcc <= n)
      // pairs at least the hot bucket's, at most the all-pairs bound
      assert(pairs >= maxOcc * (maxOcc - 1) / 2)
      assert(pairs <= n * (n - 1) / 2)
    }
    // determinism: a second run is row-identical
    val again = graft.ops.Similarity.lshCenteredReport(spark, sf).collect()
    assert(got.map(_.toString).toSeq === again.map(_.toString).toSeq)
    // the trained direction is unit-norm and its Rayleigh quotient on
    // the centered sample dominates every coordinate axis (the
    // property that makes pc_removed a top-component removal and not
    // an arbitrary rotation)
    val sample = graft.ops.Similarity.sampleTrainingSet(vecs, 2048)
    val dim = 64
    val mean = Array.tabulate(dim)(j => sample.map(_(j)).sum / sample.length)
    val u = graft.ops.Similarity.powerIterTrain(sample, mean, 5)
    assert(math.abs(u.map(x => x * x).sum - 1.0) < 1e-9)
    def rq(d: Array[Double]): Double = sample.map { x =>
      var s = 0.0
      var j = 0
      while (j < dim) { s += (x(j) - mean(j)) * d(j); j += 1 }
      s * s
    }.sum
    val axisBest = (0 until dim).map { j =>
      rq(Array.tabulate(dim)(i => if (i == j) 1.0 else 0.0))
    }.max
    assert(rq(u) >= axisBest,
      s"power-iteration direction (rq ${rq(u)}) must dominate the " +
        s"best coordinate axis (rq $axisBest)")
  }

  test("kNN-graph vector broadcast gate is byte-based and falls " +
    "back to the shuffle path past the ceiling") {
    import graft.ops.Similarity
    // gate math: rows alone must not admit an over-limit broadcast.
    // 2^21 rows of 512-dim vectors ≈ 8.7 GB — the r13 row gate
    // admitted this; the byte gate must not.
    assert(Similarity.vecBroadcastBytes(1L << 21, 512) >
      Similarity.VecBroadcastCeiling)
    // the committed x1000 rehearsal shape (500k × 64 dims ≈ 280 MB)
    // stays on the broadcast path
    assert(Similarity.vecBroadcastBytes(500000L, 64) <=
      Similarity.VecBroadcastCeiling)
    // and the ceiling itself sits safely under Spark's hard 8 GB cap
    assert(Similarity.VecBroadcastCeiling < (8L << 30))

    // end-to-end: same tiny frame, gate forced closed vs open. With
    // auto-broadcast off, every BroadcastExchange in the executed
    // plan comes from the operator's own hints.
    val vecs = graft.ops.Similarity.loadVecs(spark,
      "/root/testdata/sf0.001")
    val was = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def nBroadcasts(df: org.apache.spark.sql.DataFrame): Int = {
        df.count() // finalize AQE
        df.queryExecution.executedPlan.toString
          .sliding("BroadcastExchange".length)
          .count(_ == "BroadcastExchange")
      }
      val shuffled = Similarity.knnGraphOn(vecs, 3, 8,
        maxBroadcastBytes = 0L)
      val hinted = Similarity.knnGraphOn(vecs, 3, 8)
      // the 16-byte id table broadcasts under its OWN (higher) gate
      // on both paths — skew protection outlives the vector gate;
      // only the two vector lookups may differ.
      val nShuffled = nBroadcasts(shuffled)
      val nHinted = nBroadcasts(hinted)
      assert(nShuffled <= 1,
        s"gate closed: vector lookups must take the shuffle path " +
          s"(saw $nShuffled BroadcastExchanges)")
      assert(nHinted >= nShuffled + 2,
        s"gate open: both vector lookups broadcast " +
          s"(closed=$nShuffled, open=$nHinted)")
      // both paths produce the identical graph (hashes unchanged)
      assert(shuffled.collect().map(_.toString).toSeq ===
        hinted.collect().map(_.toString).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", was)
    }
  }

  test("SQ8-routed kNN graph: exact when the rescore margin covers " +
    "all candidates, high-recall at the production margin") {
    import graft.ops.Similarity
    val vecs = Similarity.loadVecs(spark, "/root/testdata/sf0.001")
    val exact = Similarity.knnGraphOn(vecs, 5, 12).collect()
      .map(_.toString).toSeq
    // margin covering every LSH candidate per source → stage 2
    // re-ranks the full candidate set → bit-identical to the exact
    // path (proves the routing rewires only the scoring, never the
    // candidate set or the final heap rule)
    val covered = Similarity.knnGraphOn(vecs, 5, 12,
      forceSq8 = true, rescoreFactor = 10000).collect()
      .map(_.toString).toSeq
    assert(covered === exact)
    // production margin (k·4 shortlist): recall@k of the edge set
    // must be high — int8 quantization misranks only near-ties
    val routed = Similarity.knnGraphOn(vecs, 5, 12,
      forceSq8 = true).collect()
    val exactEdges = exact.size
    val routedSet = routed.map(_.toString).toSet
    val hit = exact.count(routedSet.contains)
    assert(routed.length === exactEdges,
      "SQ8 route must emit the same per-source edge counts")
    assert(hit.toDouble / exactEdges >= 0.97,
      s"SQ8 route recall too low: $hit/$exactEdges")
    // the route trigger IS the byte gate: every oracle-pinned corpus
    // broadcasts (so takes the exact path), and the largest committed
    // shape sits well under the ceiling
    assert(Similarity.vecBroadcastBytes(50000L, 64) <=
      Similarity.VecBroadcastCeiling)
  }
}
