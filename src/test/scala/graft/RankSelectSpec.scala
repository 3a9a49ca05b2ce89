package graft

import org.apache.spark.sql.functions._
import graft.ops.RankSelect

/** The RankSelect contract: the sketch-bucketed rank-selection path
  * is bit-identical to the exact Percentile aggregate it replaces —
  * on the real corpus and on the degenerate shapes (ties, singleton
  * groups, extreme fractions) where bucket logic could slip.
  */
class RankSelectSpec extends SparkSpecBase {

  private val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)

  private def both(df: org.apache.spark.sql.DataFrame,
                   g: org.apache.spark.sql.Column,
                   v: org.apache.spark.sql.Column,
                   fracs: Seq[Double] = qs) = {
    val exact = RankSelect.groupedQuantiles(df, g, v, fracs,
      smallGate = Long.MaxValue)
    val ranked = RankSelect.groupedQuantiles(df, g, v, fracs,
      smallGate = 0L)
    (exact, ranked)
  }

  private def assertSame(exact: Map[String, (Long, Seq[Double])],
                         ranked: Map[String, (Long, Seq[Double])]): Unit = {
    assert(exact.keySet === ranked.keySet)
    exact.foreach { case (g, (n, vs)) =>
      val (rn, rvs) = ranked(g)
      assert(n === rn, s"count mismatch for group $g")
      vs.zip(rvs).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a === b, s"group $g q=${qs(i)}: exact $a vs ranked $b")
      }
    }
  }

  test("grouped: rank path ≡ Percentile aggregate on events by type") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val (exact, ranked) = both(ev, $"event_type", $"value")
    assert(exact.nonEmpty)
    assertSame(exact, ranked)
  }

  test("ungrouped: rank path ≡ Percentile aggregate on order totals") {
    import spark.implicits._
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val (exact, ranked) = both(o, lit("_"), $"o_totalprice")
    assertSame(exact, ranked)
  }

  test("degenerate shapes: ties, singleton group, two values") {
    import spark.implicits._
    val df = Seq(
      ("tied", 7.0), ("tied", 7.0), ("tied", 7.0), ("tied", 7.0),
      ("single", 3.5),
      ("pair", 1.0), ("pair", 2.0),
      ("skew", 0.0), ("skew", 0.0), ("skew", 0.0), ("skew", 1e9)
    ).toDF("g", "v")
    val (exact, ranked) = both(df, $"g", $"v")
    assertSame(exact, ranked)
    assert(exact("tied")._2.forall(_ === 7.0))
    assert(exact("single")._2.forall(_ === 3.5))
  }

  test("valuePercentiles: rank branch ≡ Percentile branch row-for-row") {
    val small = graft.ops.Events.valuePercentiles(spark, sf).collect()
    val ranked = graft.ops.Events.valuePercentiles(spark, sf, gateRows = 0L)
      .collect()
    assert(small.map(_.toString).toSeq === ranked.map(_.toString).toSeq)
  }

  test("madOutliers: rank branch ≡ Percentile branch row-for-row") {
    val small = graft.ops.Events.madOutliers(spark, sf).collect()
    val ranked = graft.ops.Events.madOutliers(spark, sf, gateRows = 0L)
      .collect()
    assert(small.map(_.toString).toSeq === ranked.map(_.toString).toSeq)
    assert(small.nonEmpty)
  }

  test("nulls are ignored like Percentile; all-null group absent") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)
    ).toDF("g", "v")
    val (exact, ranked) = both(df, $"g", $"v", Seq(0.5))
    assertSame(exact, ranked)
    assert(exact("a") === ((2L, Seq(2.0))))
    assert(!exact.contains("b"))
    assert(RankSelect.groupedQuantiles(
      df.filter($"g" === "zzz"), $"g", $"v", Seq(0.5)).isEmpty)
  }
}
