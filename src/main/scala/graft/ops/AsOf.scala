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

  /** Nearest-direction as-of join with tolerance (pandas
    * `merge_asof(direction='nearest', tolerance=…)` semantics, which
    * neither Spark nor DuckDB has natively): for each left row, the
    * right row with the same key whose timestamp is CLOSEST in either
    * direction, provided |gap| ≤ `tolerance`; equidistant candidates
    * resolve backward (the at-or-before row), like pandas.
    *
    * Same engine as [[joinAsOf]] — union both sides with a side tag,
    * ONE shuffle on the key, one local sort on (ts, side) — but BOTH
    * directions read off the same sorted run: the backward candidate
    * via `last(_, ignoreNulls)` over unbounded-preceding→current and
    * the forward candidate via `first(_, ignoreNulls)` over
    * current→unbounded-following. (A right row tied with the left ts
    * sorts before it, so the forward frame misses exact ties — which
    * is harmless: the backward frame catches them at gap 0, and gap 0
    * wins the nearest decision regardless.) No inequality join, no
    * per-key pair blow-up; key skew is AQE's to split.
    *
    * Returns the left columns + `<rightTs>` (the matched right
    * timestamp, null when nothing lies within tolerance) +
    * `asof_direction` ('backward' / 'forward' / null).
    */
  def joinAsOfNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      tolerance: Long): DataFrame = {
    val lCols = left.columns.toSeq
    val rTagged = right.select(
      col(key).as("__key"), col(rightTs).cast("long").as("__ts"),
      lit(0).as("__side"))
      .select(col("__key") +: col("__ts") +: col("__side") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType)
          .as(s"__l_$c")): _*)
    val lTagged = left.select(
      col(key).as("__key") +: col(leftTs).cast("long").as("__ts") +:
        lit(1).as("__side") +: lCols.map(c => col(c).as(s"__l_$c")): _*)
    val base = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
    val rts = when(col("__side") === 0, col("__ts"))
    val combined = rTagged.unionByName(lTagged)
      .withColumn("__b", last(rts, ignoreNulls = true).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__f", first(rts, ignoreNulls = true).over(
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__side") === 1)
      .withColumn("__bb",
        when(col("__ts") - col("__b") <= tolerance, col("__b")))
      .withColumn("__ff",
        when(col("__f") - col("__ts") <= tolerance, col("__f")))
      .withColumn(rightTs,
        when(col("__bb").isNotNull &&
          (col("__ff").isNull ||
            col("__ts") - col("__bb") <= col("__ff") - col("__ts")),
          col("__bb")).otherwise(col("__ff")))
      .withColumn("asof_direction",
        when(col(rightTs).isNull, lit(null).cast("string"))
          .when(col(rightTs) === col("__bb") &&
            (col("__ff").isNull ||
              col("__ts") - col("__bb") <= col("__ff") - col("__ts")),
            lit("backward"))
          .otherwise(lit("forward")))
    combined.select(lCols.map(c => col(s"__l_$c").as(c)) :+
      col(rightTs) :+ col("asof_direction"): _*)
  }

  /** Query wrapper for [[joinAsOfNearest]]: each purchase matched to
    * the same user's nearest view event within ±2 hours — the
    * "closest context" join (sensor alignment, nearest-snapshot
    * enrichment) that backward-only as-of gets wrong when the relevant
    * reading lands just after the probe. Oracle re-derives both
    * directional candidates per purchase and replays the identical
    * nearest/tolerance/tie decision in SQL.
    */
  def nearestViewPurchase(spark: SparkSession, dir: String,
                          toleranceUs: Long = 7200000000L): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
      .withColumn("us", expr("ts DIV 1000"))
    val views = e.filter($"event_type" === "view")
      .select($"user_id", $"us".as("v_us"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"us".as("p_us"))
    joinAsOfNearest(purchases, views, "user_id", "p_us", "v_us",
      toleranceUs)
      .withColumn("gap_us", $"p_us" - $"v_us")
      .select($"purchase_id", $"user_id", $"p_us", $"v_us", $"gap_us",
        $"asof_direction")
      .orderBy($"purchase_id")
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
    "events_asof_nearest" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id, us FROM e
        |      WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT p.purchase_id, p.user_id, p.us,
        |    (SELECT max(v.us) FROM v
        |     WHERE v.user_id = p.user_id AND v.us <= p.us) AS b_us,
        |    (SELECT min(v.us) FROM v
        |     WHERE v.user_id = p.user_id AND v.us >= p.us) AS f_us
        |  FROM p),
        |t AS (
        |  SELECT purchase_id, user_id, us,
        |    CASE WHEN us - b_us <= 7200000000 THEN b_us END AS bb,
        |    CASE WHEN f_us - us <= 7200000000 THEN f_us END AS ff
        |  FROM c),
        |n AS (
        |  SELECT purchase_id, user_id, us,
        |    CASE WHEN bb IS NOT NULL
        |        AND (ff IS NULL OR us - bb <= ff - us) THEN bb
        |      ELSE ff END AS v_us,
        |    CASE WHEN bb IS NULL AND ff IS NULL THEN NULL
        |      WHEN bb IS NOT NULL
        |        AND (ff IS NULL OR us - bb <= ff - us) THEN 'backward'
        |      ELSE 'forward' END AS asof_direction
        |  FROM t)
        |SELECT purchase_id, user_id, us AS p_us, v_us,
        |  us - v_us AS gap_us, asof_direction
        |FROM n ORDER BY purchase_id""".stripMargin,
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
