package graft

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Events}

class EventsSpec extends SparkSpecBase {
  import spark.implicits._

  test("HLL approx distinct within rsd bounds of exact") {
    val rows = Events.approxUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("funnel keeps users whose purchases all precede signup (edge case absent from corpus)") {
    // synthesize: user A converts, user B purchased only BEFORE signup,
    // user C never purchased
    val events = Seq(
      (1L, 1000L, 100L, "signup", 1.0, "{}"),
      (2L, 2000L, 100L, "purchase", 5.0, "{}"),
      (3L, 1000L, 200L, "purchase", 5.0, "{}"), // before B's signup
      (4L, 5000L, 200L, "signup", 1.0, "{}"),
      (5L, 1000L, 300L, "signup", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    // write with LongType ts (matches the nanosAsLong read layout)
    events.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.eventsFunnel(spark, tmp).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out.keySet === Set(100L, 200L, 300L),
      "every signup user must appear, converted or not")
    assert(out(100L).isDefined, "user 100 converted")
    assert(out(200L).isEmpty, "user 200 purchased only before signup")
    assert(out(300L).isEmpty, "user 300 never purchased")
  }

  test("salted skew join equals the plain join and keeps the shuffle in the plan") {
    import spark.implicits._
    val salted = Events.skewJoin(spark, sf)
    // the hint must survive planning: no broadcast exchange anywhere
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "dim side must not auto-broadcast — the salted shuffle is the op")
    assert(plan.contains("ShuffledHashJoin"), "expected a shuffled hash join")
    val direct = Tables.load(spark, sf, "events")
      .withColumn("skew_key",
        when($"event_type".isin("view", "click", "error"), 0L)
          .otherwise($"user_id" % 50))
      .join(spark.range(0, 50).select($"id".as("skew_key"),
        (($"id" * 7 + 3) % 11).as("weight")), "skew_key")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum($"value" * $"weight"), 2).as("weighted_value"))
      .orderBy($"event_type")
    assert(salted.collect().toSeq === direct.collect().toSeq)
  }

  test("merged daily HLL sketches track the exact distinct count") {
    val rows = Events.hllMergeUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (merged, direct, exact) =
        (r.getLong(2).toDouble, r.getLong(3).toDouble, r.getLong(4).toDouble)
      // merge-of-parts must agree with the one-shot sketch, and both
      // with truth, within standard HLL error at lgK=12 (~1.6% rsd)
      assert(math.abs(merged - direct) <= 0.02 * exact)
      assert(math.abs(merged - exact) <= 0.05 * exact)
    }
  }
}
