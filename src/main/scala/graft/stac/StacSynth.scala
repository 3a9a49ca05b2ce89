package graft.stac

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic pseudo-STAC catalog derived from the `orders` table —
  * the test fixture for the STAC operators. Every column is built with
  * engine-portable arithmetic/string ops so the DuckDB oracle (the
  * `sqlCte` below) produces byte-identical rows.
  *
  * Shape mirrors a CMR granule feed (reference: cmr_api.py): granule
  * id, collection, MGRS-style tile in the URL, acquisition timestamp,
  * lon/lat, a links array whose STAC JSON href must be extracted, an
  * assets JSON object, and a deterministic "fetch failed" flag
  * (reference: fetch.py separates failures).
  */
object StacSynth {

  val ColLetters = "ABCDEFGHJKLMNPQRSTUVWXYZ" // 24, I/O excluded
  val RowLetters = "ABCDEFGHJKLMNPQRSTUV" // 20
  val BandLetters = "CDEFGHJKLMNPQRSTUVWX" // 20

  /** Origin dates for the synthetic collections (mirrors the
    * reference's COLLECTION_ORIGIN_DATES, constants.py:11-14, mapped
    * into the test data's 1995+ time range).
    */
  val OriginDates: Map[String, String] = Map(
    "HLSL30_2.0" -> "1995-01-15",
    "HLSS30_2.0" -> "1995-01-10")

  /** Query regions for the grid-bucketed spatial join (A18): twelve
    * 50°×40° half-open boxes [w,e)×[s,n) on a 6×2 layout. Integer-
    * valued doubles so the DuckDB VALUES literal is bit-identical.
    */
  val regions: Seq[(Long, Double, Double, Double, Double)] =
    (0 until 12).map { i =>
      val w = -180.0 + (i % 6) * 55.0
      val s = -75.0 + (i / 6) * 80.0
      (i.toLong, w, s, w + 50.0, s + 40.0)
    }

  /** The same regions as a DuckDB VALUES CTE body. */
  val regionsSqlValues: String = regions.map { case (id, w, s, e, n) =>
    s"(CAST($id AS BIGINT), $w, $s, $e, $n)"
  }.mkString(",\n    ")

  /** `spread = true` repartitions the single-row-group orders scan
    * before the ~1 KB/row string synthesis below (Tables.spread doc)
    * — opt-IN per consumer: only queries that materialize the full
    * synthesis for every row win (linkExtract: 2.4 → 0.5 s); the
    * r15 full-bench A/B showed a blanket spread REGRESSING every
    * other stac query (+0.1-0.5 s each — their filters/aggregates
    * touch a slice of the synthesis, and the added exchange + wider
    * task fan cost more than the parallel synthesis saved).
    */
  def catalog(spark: SparkSession, dir: String,
              spread: Boolean = false): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    catalogFrom(if (spread) Tables.spread(orders) else orders)
  }

  /** The catalog transform over any orders-shaped frame — including a
    * `readStream` source (every column is a deterministic scalar
    * expression, so the same plan runs batch or streaming; see
    * `StacStreams`).
    */
  def catalogFrom(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .select($"o_orderkey".as("granule_id"), $"o_orderdate")
      .withColumn("collection",
        when($"granule_id" % 2 === 0, "HLSL30_2.0").otherwise("HLSS30_2.0"))
      .withColumn("sensor",
        when($"granule_id" % 2 === 0, "L30").otherwise("S30"))
      .withColumn("tile",
        concat(
          lpad((($"granule_id" % 60) + 1).cast("string"), 2, "0"),
          lit(BandLetters).substr(
            (($"granule_id" % 20) + 1).cast("int"), lit(1)),
          lit(ColLetters).substr(
            ((expr("granule_id DIV 60") % 24) + 1).cast("int"), lit(1)),
          lit(RowLetters).substr(
            ((expr("granule_id DIV 1440") % 20) + 1).cast("int"), lit(1))))
      .withColumn("ts",
        $"o_orderdate" + expr("make_interval(0,0,0,0,0,0, granule_id % 86400)"))
      .withColumn("dt_str", date_format($"ts", "yyyyDDD'T'HHmmss"))
      .withColumn("lon",
        ($"granule_id" % 3600).cast("double") / 10.0 - 180.0 + 0.05)
      .withColumn("lat",
        (($"granule_id" * 7) % 1800).cast("double") / 10.0 - 90.0 + 0.05)
      // item properties a real HLS consumer filters on (eo:cloud_cover,
      // sun geometry) — deterministic integers so the DuckDB CTE builds
      // the identical JSON string
      .withColumn("cloud_cover", ($"granule_id" * 13) % 101)
      .withColumn("sun_azimuth", ($"granule_id" * 29) % 360)
      .withColumn("sun_elevation", ($"granule_id" * 17) % 81)
      .withColumn("base",
        concat(lit("HLS."), $"sensor", lit(".T"), $"tile", lit("."),
          $"dt_str", lit(".v2.0")))
      .withColumn("url_stac",
        concat(lit("https://data.example.com/lp-prod-public/"),
          $"collection", lit("/"), $"base", lit("/"), $"base",
          lit("_stac.json")))
      .withColumn("url_stac_s3",
        concat(lit("s3://lp-prod-public/"), $"collection", lit("/"),
          $"base", lit("/"), $"base", lit("_stac.json")))
      .withColumn("links", array(
        concat(lit("https://data.example.com/meta/"), $"base", lit(".cmr.xml")),
        $"url_stac",
        $"url_stac_s3",
        concat(lit("https://data.example.com/thumb/"), $"base", lit(".jpg"))))
      .withColumn("assets_json",
        concat(lit("{\"B04\": {\"href\": \""), $"base",
          lit(".B04.tif\", \"type\": \"image/tiff; application=geotiff\", \"title\": \"B04\"}, \"B05\": {\"href\": \""), $"base",
          lit(".B05.tif\", \"type\": \"image/tiff; application=geotiff\", \"title\": \"B05\"}, \"Fmask\": {\"href\": \""), $"base",
          lit(".Fmask.tif\", \"type\": \"image/tiff; application=geotiff\", \"title\": \"Fmask\"}}")))
      .withColumn("item_json",
        concat(lit("{\"id\": \""), $"base",
          lit("\", \"collection\": \""), $"collection",
          lit("\", \"properties\": {\"datetime\": \""),
          date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
          lit("\", \"eo:cloud_cover\": "), $"cloud_cover".cast("string"),
          lit(", \"view:sun_azimuth\": "), $"sun_azimuth".cast("string"),
          lit(", \"view:sun_elevation\": "), $"sun_elevation".cast("string"),
          lit("}, \"grid\": {\"lon10\": "),
          ($"granule_id" % 3600).cast("string"),
          lit(", \"lat10\": "),
          (($"granule_id" * 7) % 1800).cast("string"),
          lit("}, \"assets\": "), $"assets_json", lit("}")))
      .withColumn("fetch_failed", $"granule_id" % 97 === 0)
      .drop("o_orderdate")
  }

  /** The same catalog as a DuckDB CTE — prefix for oracle SQL. */
  val sqlCte: String =
    s"""WITH stac_catalog AS (
       |  SELECT
       |    o_orderkey AS granule_id,
       |    CASE WHEN o_orderkey % 2 = 0 THEN 'HLSL30_2.0' ELSE 'HLSS30_2.0' END AS collection,
       |    CASE WHEN o_orderkey % 2 = 0 THEN 'L30' ELSE 'S30' END AS sensor,
       |    lpad(CAST((o_orderkey % 60) + 1 AS VARCHAR), 2, '0')
       |      || substr('$BandLetters', CAST((o_orderkey % 20) + 1 AS INT), 1)
       |      || substr('$ColLetters', CAST(((o_orderkey // 60) % 24) + 1 AS INT), 1)
       |      || substr('$RowLetters', CAST(((o_orderkey // 1440) % 20) + 1 AS INT), 1) AS tile,
       |    o_orderdate + to_seconds(o_orderkey % 86400) AS ts,
       |    strftime(o_orderdate + to_seconds(o_orderkey % 86400), '%Y%jT%H%M%S') AS dt_str,
       |    CAST(o_orderkey % 3600 AS DOUBLE) / 10.0 - 180.0 + 0.05 AS lon,
       |    CAST((o_orderkey * 7) % 1800 AS DOUBLE) / 10.0 - 90.0 + 0.05 AS lat,
       |    (o_orderkey * 13) % 101 AS cloud_cover,
       |    (o_orderkey * 29) % 360 AS sun_azimuth,
       |    (o_orderkey * 17) % 81 AS sun_elevation,
       |    o_orderkey % 97 = 0 AS fetch_failed
       |  FROM orders),
       |stac_built AS (
       |  SELECT *,
       |    'HLS.' || sensor || '.T' || tile || '.' || dt_str || '.v2.0' AS base
       |  FROM stac_catalog),
       |stac AS (
       |  SELECT *,
       |    'https://data.example.com/lp-prod-public/' || collection || '/' || base || '/' || base || '_stac.json' AS url_stac,
       |    's3://lp-prod-public/' || collection || '/' || base || '/' || base || '_stac.json' AS url_stac_s3,
       |    ['https://data.example.com/meta/' || base || '.cmr.xml',
       |     'https://data.example.com/lp-prod-public/' || collection || '/' || base || '/' || base || '_stac.json',
       |     's3://lp-prod-public/' || collection || '/' || base || '/' || base || '_stac.json',
       |     'https://data.example.com/thumb/' || base || '.jpg'] AS links,
       |    '{"B04": {"href": "' || base || '.B04.tif", "type": "image/tiff; application=geotiff", "title": "B04"}, "B05": {"href": "' || base || '.B05.tif", "type": "image/tiff; application=geotiff", "title": "B05"}, "Fmask": {"href": "' || base || '.Fmask.tif", "type": "image/tiff; application=geotiff", "title": "Fmask"}}' AS assets_json,
       |    '{"id": "' || base || '", "collection": "' || collection
       |      || '", "properties": {"datetime": "' || strftime(o_orderdate + to_seconds(o_orderkey % 86400), '%Y-%m-%dT%H:%M:%SZ')
       |      || '", "eo:cloud_cover": ' || CAST(cloud_cover AS VARCHAR)
       |      || ', "view:sun_azimuth": ' || CAST(sun_azimuth AS VARCHAR)
       |      || ', "view:sun_elevation": ' || CAST(sun_elevation AS VARCHAR)
       |      || '}, "grid": {"lon10": ' || CAST(o_orderkey % 3600 AS VARCHAR)
       |      || ', "lat10": ' || CAST((o_orderkey * 7) % 1800 AS VARCHAR)
       |      || '}, "assets": ' || assets_json || '}' AS item_json
       |  FROM stac_built JOIN orders ON granule_id = o_orderkey)
       |""".stripMargin
}
