package graft

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def rj(points: Seq[(String, Long)],
                 intervals: Seq[(String, Long, Long, String)],
                 width: Long) = {
    val p = points.toDF("k", "pt")
    val i = intervals.toDF("k", "s", "e", "tag")
    RangeJoin.joinRange(p, "pt", i, "s", "e", Seq("k"), width)
      .select($"k", $"pt", $"tag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
  }

  test("half-open [start, end) containment, any bucket alignment") {
    val got = rj(
      points = Seq(("a", 5L), ("a", 10L), ("a", 19L), ("a", 20L)),
      intervals = Seq(("a", 10L, 20L, "i1")),
      width = 8L) // interval spans buckets 1..2, points in 0/1/2/2
    assert(got === Set(("a", 10L, "i1"), ("a", 19L, "i1")))
  }

  test("overlapping intervals each match; keys isolate") {
    val got = rj(
      points = Seq(("a", 15L), ("b", 15L)),
      intervals = Seq(
        ("a", 0L, 100L, "wide"), ("a", 10L, 20L, "narrow"),
        ("b", 50L, 60L, "elsewhere")),
      width = 10L)
    assert(got === Set(("a", 15L, "wide"), ("a", 15L, "narrow")))
  }

  test("no duplicate pairs when an interval spans many buckets") {
    val got = RangeJoin.joinRange(
      Seq(("a", 7L)).toDF("k", "pt"), "pt",
      Seq(("a", 0L, 1000L, "big")).toDF("k", "s", "e", "tag"),
      "s", "e", Seq("k"), 3L)
    assert(got.count() === 1L)
  }

  test("busy-windows query is a pure equi-join plan (no nested loop)") {
    val plan = RangeJoin.busyWindows(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
