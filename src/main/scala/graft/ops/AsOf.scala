package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (temporal) join: for each left row, the most recent right row
  * with the same key and right timestamp ≤ left timestamp.
  *
  * Spark has no native ASOF JOIN (DuckDB and pandas do). The naive
  * formulation — `l JOIN r ON key AND r.ts <= l.ts` + row_number — is
  * a non-equi join that degrades to a nested loop and an O(n·m) pair
  * blow-up per key. This operator instead UNIONs both sides with a
  * side tag, sorts once within each key ((ts, side): right rows first
  * on ties, giving the ≤ bound), and carries the right payload forward
  * with `last(_, ignoreNulls = true)` over rows-unbounded-preceding.
  * Exactly ONE shuffle on the key, a local sort per partition, no
  * intermediate pair explosion; key skew is AQE's to split. This is
  * the shape that survives 100 TB of events on both sides.
  */
object AsOf {

  /** Left as-of join. `payload` columns are taken from the matched
    * right row (they must be non-null there: each payload column is
    * carried independently, and a null would fall through to an older
    * row). Left rows with no prior right row get null payloads.
    * Ties among right rows at one (key, ts) resolve to the greatest
    * payload tuple (deterministic).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val rTagged = right.select(
      col(key).as("__key") +: col(rightTs).as("__ts") +:
        lit(0).as("__side") +: payload.map(col) ++:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val lTagged = left.select(
      col(key).as("__key") +: col(leftTs).as("__ts") +:
        lit(1).as("__side") +: payload.map(p =>
          lit(null).cast(right.schema(p).dataType).as(p)) ++:
        lCols.map(c => col(c).as(s"__l_$c")): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts") +: col("__side") +: payload.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(rTagged.unionByName(lTagged)) {
      (df, p) => df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__l_$c").as(c)) ++ payload.map(col): _*)
  }

  /** Query wrapper: each purchase event matched to the same user's
    * latest view event at-or-before it (attribution shape). Oracle is
    * DuckDB's native ASOF LEFT JOIN.
    */
  def viewPurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
      .withColumn("us", expr("ts DIV 1000")) // ns → µs (oracle precision)
    val views = e.filter($"event_type" === "view")
      .select($"user_id", $"us".as("v_us"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"us".as("p_us"))
    joinAsOf(purchases, views, "user_id", "p_us", "v_us", Seq("v_us"))
      .withColumn("gap_us", $"p_us" - $"v_us")
      .select($"purchase_id", $"user_id", $"p_us", $"v_us", $"gap_us")
      .orderBy($"purchase_id")
  }

  val oracles: Map[String, String] = Map(
    "events_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id, us FROM e
        |      WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.us AS p_us, v.us AS v_us,
        |  p.us - v.us AS gap_us
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.us <= p.us
        |ORDER BY purchase_id""".stripMargin)
}
