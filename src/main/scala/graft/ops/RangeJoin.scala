package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (interval) join: match left points to right intervals with
  * `start <= pt < end` (plus optional equi-keys).
  *
  * Spark's planner turns a raw non-equi `pt >= start AND pt < end`
  * predicate into a broadcast-nested-loop (or cartesian) join — O(n·m)
  * comparisons and, for fact-fact sizes, no broadcastable side at all.
  * This operator buckets the range dimension instead: each interval is
  * exploded to the fixed-width buckets it covers, each point computes
  * its single bucket, and the join becomes a plain shuffled EQUI-join
  * on (keys…, bucket) with the exact range predicate as a residual
  * filter. A point lives in exactly one bucket, so no post-join dedup
  * is needed; interval replication is ceil(len/width)+1 rows. With
  * width ≈ the typical interval length, the shuffle volume is O(n + m)
  * and AQE handles per-bucket skew — the shape that survives two
  * 100 TB inputs.
  */
object RangeJoin {

  /** Generic bucketed interval join. `pt`, `start`, `end` are
    * non-negative long columns (e.g. epoch-µs); `keys` are extra
    * equi-join columns present under the same name on both sides.
    * Interval semantics: [start, end). Right-side key columns are
    * returned under their original names only once (the left copy);
    * interval payload columns pass through unchanged.
    */
  def joinRange(points: DataFrame, pt: String,
                intervals: DataFrame, start: String, end: String,
                keys: Seq[String], bucketWidth: Long): DataFrame = {
    // Rename right-side join columns: avoids duplicate output names
    // AND the ambiguous-self-join trap when intervals derive from the
    // same source as points (common: stats-over-self windows).
    val renamedKeys = keys.map(k => k -> s"__r_$k")
    val exploded = renamedKeys.foldLeft(intervals) {
        case (df, (k, r)) => df.withColumnRenamed(k, r)
      }
      .withColumn("__rbucket", explode(sequence(
        expr(s"`$start` DIV $bucketWidth"),
        expr(s"(`$end` - 1) DIV $bucketWidth"))))
    val bucketed = points.withColumn("__bucket",
      expr(s"`$pt` DIV $bucketWidth"))
    val cond = renamedKeys
      .map { case (k, r) => col(k) === col(r) }
      .foldLeft(col("__bucket") === col("__rbucket"))(_ && _) &&
      col(pt) >= col(start) && col(pt) < col(end)
    bucketed.join(exploded, cond)
      .drop("__bucket" +: "__rbucket" +: renamedKeys.map(_._2): _*)
  }

  /** Query wrapper: "busy hours" per event type — hourly buckets with
    * ≥ threshold events, widened by a 5-minute margin on each side so
    * the intervals are NOT bucket-aligned and adjacent ones overlap —
    * then every event of that type range-joined back in and counted
    * per interval. The margin is what makes this a genuine interval
    * join instead of a disguised groupBy.
    */
  def busyWindows(spark: SparkSession, dir: String,
                  minEvents: Long = 3L): DataFrame = {
    import spark.implicits._
    val marginUs = 5L * 60 * 1000000
    val hourUs = 3600L * 1000000
    val e = Tables.load(spark, dir, "events")
      .select($"event_type", expr("ts DIV 1000").as("us"))
    val busy = e
      .withColumn("hour_us", expr(s"(us DIV ${hourUs}) * ${hourUs}"))
      .groupBy($"event_type", $"hour_us")
      .agg(count(lit(1)).as("n_hour"))
      .filter($"n_hour" >= minEvents)
      .select($"event_type", ($"hour_us" - marginUs).as("start_us"),
        ($"hour_us" + hourUs + marginUs).as("end_us"))
    joinRange(e, "us", busy, "start_us", "end_us",
        Seq("event_type"), hourUs)
      .groupBy($"event_type", $"start_us", $"end_us")
      .agg(count(lit(1)).as("n_in_range"))
      .orderBy($"event_type", $"start_us")
  }

  val oracles: Map[String, String] = Map(
    "events_range_join" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us FROM events),
        |busy AS (
        |  SELECT event_type,
        |    (us // 3600000000) * 3600000000 - 300000000 AS start_us,
        |    (us // 3600000000) * 3600000000 + 3900000000 AS end_us
        |  FROM e GROUP BY 1, (us // 3600000000)
        |  HAVING count(*) >= 3)
        |SELECT b.event_type, b.start_us, b.end_us,
        |  count(*) AS n_in_range
        |FROM e JOIN busy b
        |  ON e.event_type = b.event_type
        |  AND e.us >= b.start_us AND e.us < b.end_us
        |GROUP BY 1, 2, 3 ORDER BY b.event_type, b.start_us""".stripMargin)
}
