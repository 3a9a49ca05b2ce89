package graft.stac

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{hilbert_index, morton_index}
import graft.geo.Mgrs

/** The reference's catalog→parquet semantics as Spark operators.
  * Every operator is a declarative DataFrame transform — predicates
  * and projections reach the parquet scan, aggregations partial-agg
  * before their shuffle, and the spatial sort is a range
  * repartitioning rather than the reference's driver-side list sort.
  */
object StacOps {

  import StacSynth.catalog

  /** A1 — parse STAC item JSON into typed rows (reference consumes
    * the fetched item dicts in write.py:213-219). `from_json` with an
    * explicit schema: malformed documents become nulls, not failures.
    */
  def parseItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val itemSchema = StructType(Seq(
      StructField("id", StringType),
      StructField("collection", StringType),
      StructField("properties",
        StructType(Seq(
          StructField("datetime", StringType),
          StructField("eo:cloud_cover", LongType),
          StructField("view:sun_azimuth", LongType),
          StructField("view:sun_elevation", LongType)))),
      StructField("grid", StructType(Seq(
        StructField("lon10", LongType), StructField("lat10", LongType))))))
    val props = col("item").getField("properties")
    catalog(spark, dir)
      .withColumn("item", from_json($"item_json", itemSchema))
      .select(
        $"granule_id",
        $"item.id".as("item_id"),
        $"item.collection".as("item_collection"),
        props.getField("datetime").as("item_datetime"),
        props.getField("eo:cloud_cover").as("cloud_cover"),
        props.getField("view:sun_azimuth").as("sun_azimuth"),
        props.getField("view:sun_elevation").as("sun_elevation"),
        $"item.grid.lon10".as("lon10"),
        $"item.grid.lat10".as("lat10"))
      .orderBy($"granule_id")
  }

  /** A2 — first link that is https ∧ endswith stac.json (reference:
    * cmr_api.py:74-103 `extract_stac_json_links`).
    */
  def linkExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    catalog(spark, dir, spread = true)
      // once(): the isNotNull filter below would otherwise be pushed
      // beneath this Project, re-evaluating the whole link synthesis
      // + first_link per row in the (serial) scan stage — measured 2×
      // the query's cost at r15 (guide §4.4)
      .withColumn("stac_link",
        graft.functions.once(
          graft.functions.first_link($"links", "https", "stac.json")))
      .filter($"stac_link".isNotNull)
      .select($"granule_id", $"stac_link")
      .orderBy($"granule_id")
  }

  /** A3 — bounding-box filter (reference: cmr_api.py:36 bbox pushdown
    * + validation.py). The predicate is plain comparisons, so at scale
    * it pushes into the parquet scan of a materialized catalog.
    */
  def bboxFilter(spark: SparkSession, dir: String,
                 bbox: (Double, Double, Double, Double) = (-150.0, -50.0, -100.0, 50.0))
      : DataFrame = {
    import spark.implicits._
    val (w, s, e, n) = bbox
    Validation.validateBbox(w, s, e, n)
    catalog(spark, dir)
      .filter($"lon" >= w && $"lon" <= e && $"lat" >= s && $"lat" <= n)
      .select($"granule_id", $"lon", $"lat")
      .orderBy($"granule_id")
  }

  /** A19 — antimeridian-crossing bounding box: when west > east the
    * box wraps the 180° meridian and the longitude predicate becomes a
    * disjunction (lon ≥ w OR lon ≤ e). The reference's validator
    * rejects such boxes (validation.py `min_lon < max_lon`), so its
    * users must split them manually — the engine handles the wrap
    * directly, still as plain scan-pushable comparisons. A box around
    * the Bering Strait / date line is the canonical case.
    */
  def bboxFilterWrapped(spark: SparkSession, dir: String,
                        bbox: (Double, Double, Double, Double) =
                          (150.0, -20.0, -140.0, 60.0)): DataFrame = {
    import spark.implicits._
    val (w, s, e, n) = bbox
    require(w >= -180 && w <= 180 && e >= -180 && e <= 180,
      s"lon bounds must be within [-180, 180], got ($w, $e)")
    require(s >= -90 && s <= 90 && n >= -90 && n <= 90 && s < n,
      s"invalid lat bounds ($s, $n)")
    val lonPred =
      if (w <= e) $"lon" >= w && $"lon" <= e
      else $"lon" >= w || $"lon" <= e // wraps the antimeridian
    catalog(spark, dir)
      .filter(lonPred && $"lat" >= s && $"lat" <= n)
      .select($"granule_id", $"lon", $"lat")
      .orderBy($"granule_id")
  }

  /** A4 — temporal day-range filter, closed interval
    * [day 00:00:00, day+1 − 1s] (reference: links.py:104-106).
    */
  def temporalFilter(spark: SparkSession, dir: String,
                     from: String = "1996-03-01 00:00:00",
                     to: String = "1996-03-31 23:59:59"): DataFrame = {
    import spark.implicits._
    catalog(spark, dir)
      .filter($"ts" >= lit(from).cast("timestamp") &&
        $"ts" <= lit(to).cast("timestamp"))
      .select($"granule_id", $"ts")
      .orderBy($"granule_id")
  }

  /** A5 — daily link cache: per (collection, day) the sorted links
    * (reference: links.py:61-117 writes one JSON array per day).
    * Emitted as count + joined CSV so the artifact is one row per
    * cache file.
    */
  def dailyLinks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    catalog(spark, dir)
      .groupBy($"collection", to_date($"ts").as("day"))
      .agg(
        count(lit(1)).as("n_links"),
        array_join(sort_array(collect_list($"url_stac")), ",").as("links_csv"))
      .orderBy($"collection", $"day")
  }

  /** A6 — monthly rollup with require-complete-links semantics:
    * present-day count vs expected days, honoring each collection's
    * origin date for its partial first month (reference:
    * write.py:158-189).
    */
  def monthlyRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val originL = StacSynth.OriginDates("HLSL30_2.0")
    val originS = StacSynth.OriginDates("HLSS30_2.0")
    catalog(spark, dir)
      .withColumn("day", to_date($"ts"))
      .withColumn("month_start", trunc($"day", "month"))
      .groupBy($"collection", $"month_start")
      .agg(
        countDistinct($"day").as("n_days_present"),
        count(lit(1)).as("n_links"))
      .withColumn("origin",
        when($"collection" === "HLSL30_2.0", lit(originL).cast("date"))
          .otherwise(lit(originS).cast("date")))
      .withColumn("first_day",
        when(trunc($"origin", "month") === $"month_start",
          dayofmonth($"origin")).otherwise(lit(1)))
      .withColumn("expected_days",
        (dayofmonth(last_day($"month_start")) - $"first_day" + 1).cast("long"))
      .withColumn("complete", $"n_days_present" === $"expected_days")
      .select($"collection", $"month_start", $"n_days_present",
        $"expected_days", $"complete", $"n_links")
      .orderBy($"collection", $"month_start")
  }

  /** A7 — MGRS tile extraction from the STAC URL (reference:
    * write.py:40-56, regex `\.T([0-9]{2}[A-Z]{3})\.`).
    */
  def mgrsExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    catalog(spark, dir)
      .withColumn("mgrs_tile",
        regexp_extract($"url_stac", "\\.T([0-9]{2}[A-Z]{3})\\.", 1))
      .select($"granule_id", $"mgrs_tile")
      .orderBy($"granule_id")
  }

  /** A8 — MGRS tile → 100 km-square center lat/lon (reference:
    * write.py:66-78 via the `mgrs` package). Real HLS tiles; pure
    * Scala geodesy, exercised distributed via a UDF-free mapPartitions?
    * No — a deterministic driver-side literal table keeps the query
    * plan trivial; the math itself is covered by MgrsSpec.
    */
  def mgrsToLatLon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Real-world anchor points → their MGRS 100 km tiles (fromLatLon
    // guarantees geometric validity; MgrsSpec asserts the roundtrip).
    val anchors = Seq(
      (65.0, 177.0), (-77.8, 166.7), (48.2, 16.4), (38.9, -77.0),
      (-33.9, 151.2), (21.3, -157.9), (51.5, -0.1), (-22.9, -43.2),
      (31.2, 121.5), (60.2, 24.9))
    val tiles = anchors.map { case (lat, lon) => Mgrs.fromLatLon(lat, lon) }
    val rows = tiles.map { t =>
      val ll = Mgrs.toLatLon(t)
      (t, math.rint(ll.lat * 10000) / 10000, math.rint(ll.lon * 10000) / 10000)
    }
    rows.toDF("tile", "lat", "lon").orderBy($"tile")
  }

  /** A9 — Hilbert index of each granule's grid cell; the sort key the
    * reference computes per-URL on the driver (write.py:79-90), here a
    * codegen'd expression over the whole catalog.
    */
  def hilbertIndexQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    catalog(spark, dir)
      .withColumn("gx",
        floor(($"lon" + 180.0) / 360.0 * 16384).cast("int"))
      .withColumn("gy",
        floor(($"lat" + 90.0) / 180.0 * 16384).cast("int"))
      .withColumn("hilbert", hilbert_index($"gx", $"gy", 14))
      .withColumn("morton", morton_index($"gx", $"gy", 14))
      .select($"granule_id", $"gx", $"gy", $"hilbert", $"morton")
      .orderBy($"granule_id")
  }

  /** A31 — revisit-cadence report: per-collection distribution of the
    * day gaps between successive acquisitions of the same UTM zone
    * (A26's grouping — per-tile acquisitions are unique in this
    * catalog) — the
    * acquisition-QA number an HLS-like mission tracks against its
    * nominal revisit (a fattening gap histogram means lost scenes;
    * A26 finds individual outages, this is the fleet-wide cadence
    * view). The lag window partitions per (collection, tile) —
    * acquisition-count-bounded; integer-day gaps make the histogram
    * and exact median engine-portable; both rollups partial-aggregate.
    */
  def revisitCadence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy($"collection", $"zone")
      .orderBy($"day", $"granule_id")
    val gaps = catalog(spark, dir)
      .select($"collection", substring($"tile", 1, 2).as("zone"),
        $"granule_id", to_date($"ts").as("day"))
      .distinct()
      .withColumn("prev", lag($"day", 1).over(w))
      .filter($"prev".isNotNull)
      .select($"collection",
        datediff($"day", $"prev").cast("long").as("gap_days"))
    val hist = gaps.groupBy($"collection", $"gap_days")
      .agg(count(lit(1)).as("n"))
    val med = gaps.groupBy($"collection")
      .agg((floor(expr("percentile(gap_days, 0.5)") * 10000.0 + 0.5)
        / 10000.0).as("median_gap"))
    hist.join(broadcast(med), "collection")
      .select($"collection", $"gap_days", $"n", $"median_gap")
      .orderBy($"collection", $"gap_days")
  }

  /** A30 — best-scene selection for monthly mosaic compositing: per
    * (tile, month), the granule with the LOWEST cloud cover (latest
    * acquisition, then smallest id on ties) — the scene-selection
    * query every EO compositing pipeline runs before building a
    * mosaic. The argmin is ONE partial-aggregable
    * `min(struct(cloud_cover, -epoch, granule_id))` per group —
    * superseded candidates discard map-side (the A25 upsert shape),
    * no window sorts the catalog.
    */
  def bestScene(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    catalog(spark, dir)
      .select($"tile", trunc($"ts", "month").as("month"),
        $"granule_id", $"cloud_cover",
        unix_micros($"ts".cast("timestamp")).as("ts_us"))
      .groupBy($"tile", $"month")
      .agg(count(lit(1)).as("n_scenes"),
        min(struct($"cloud_cover", (-$"ts_us").as("neg_ts"),
          $"granule_id")).as("m"))
      .select($"tile", $"month", $"n_scenes",
        $"m.granule_id".as("best_granule"),
        $"m.cloud_cover".as("best_cloud"),
        (-$"m.neg_ts").as("best_ts_us"))
      .orderBy($"tile", $"month")
  }

  /** A29 — spatial-locality report, Hilbert vs Morton: bucket the
    * catalog into 100 equal index ranges under each curve and measure
    * each bucket's grid-cell bounding-box area — the quantified
    * justification for A10/A11/A23 (range-partitioning the write on
    * the Hilbert key ⇒ tight per-file bboxes ⇒ footer pruning works;
    * Morton's quadrant jumps inflate bucket bboxes). Bucketing is a
    * scan-side integer div on the codegen'd index expressions — no
    * global sort, no window: the report is two partial-aggregable
    * rollups (per-bucket extent, then per-scheme summary).
    */
  def spatialLocalityReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val span = (1L << 28) / 100
    val idx = catalog(spark, dir)
      .withColumn("gx", floor(($"lon" + 180.0) / 360.0 * 16384).cast("int"))
      .withColumn("gy", floor(($"lat" + 90.0) / 180.0 * 16384).cast("int"))
      .withColumn("hilbert", hilbert_index($"gx", $"gy", 14))
      .withColumn("morton", morton_index($"gx", $"gy", 14))
    val stacked = idx.select(lit("hilbert").as("scheme"),
        expr(s"hilbert div $span").as("bucket"), $"gx", $"gy")
      .unionByName(idx.select(lit("morton").as("scheme"),
        expr(s"morton div $span").as("bucket"), $"gx", $"gy"))
    stacked.groupBy($"scheme", $"bucket")
      .agg(count(lit(1)).as("n"),
        ((max($"gx") - min($"gx") + 1).cast("long") *
          (max($"gy") - min($"gy") + 1).cast("long")).as("area"))
      .groupBy($"scheme")
      .agg(count(lit(1)).as("n_buckets"), sum($"n").as("n_points"),
        sum($"area").as("sum_area"),
        (floor(avg($"area") * 10000.0 + 0.5) / 10000.0).as("mean_area"))
      .orderBy($"scheme")
  }

  /** A10 — distributed spatial sort: range-repartition on the Hilbert
    * key (sampling-based global ordering, no driver collect of data —
    * the scale replacement for the reference's
    * `stac_json_links.sort`, write.py:196-211). Emits every granule
    * with its GLOBAL rank, computed without a global window: ranks
    * come from per-partition row_numbers plus partition offsets (the
    * bucketed-offset house pattern; the offsets frame is ≤
    * `partitions` rows). The DuckDB oracle recomputes the rank as
    * `row_number() OVER (ORDER BY hilbert, granule_id)` — so the
    * hash gate proves the range partitions are disjoint AND ordered:
    * any boundary overlap or misordered partition would shift ranks
    * and fail the compare (the property the old rows-only spec could
    * only assert in-engine).
    */
  def spatialSort(spark: SparkSession, dir: String,
                  partitions: Int = 16): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val sorted = hilbertIndexQuery(spark, dir)
      .select($"granule_id", $"hilbert")
      .repartitionByRange(partitions, $"hilbert", $"granule_id")
      .sortWithinPartitions($"hilbert", $"granule_id")
      .withColumn("part_id", spark_partition_id())
    // Both branches below hang off the SAME range exchange inside ONE
    // job, so Spark reuses the shuffle stage and they see identical
    // (sampled) boundaries — two separate actions would re-sample and
    // could disagree. The offsets window is global but runs over the
    // ≤ `partitions`-row counts frame, not the data.
    val offsets = sorted.groupBy($"part_id")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum($"cnt").over(
        W.orderBy($"part_id").rowsBetween(W.unboundedPreceding, -1)),
        lit(0L)))
      .select($"part_id", $"off")
    val w = W.partitionBy($"part_id").orderBy($"hilbert", $"granule_id")
    sorted.join(broadcast(offsets), "part_id")
      .withColumn("rank", row_number().over(w).cast("long") + $"off")
      .select($"rank", $"granule_id", $"hilbert")
      .orderBy($"rank")
  }

  /** A12 — failed-link accounting per day (reference: fetch.py:53-66
    * returns (items, failed_links); failures logged, not fatal).
    */
  def failedLinks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    catalog(spark, dir)
      .groupBy($"collection", to_date($"ts").as("day"))
      .agg(
        sum(when($"fetch_failed", 1L).otherwise(0L)).as("n_failed"),
        sum(when(!$"fetch_failed", 1L).otherwise(0L)).as("n_ok"),
        array_join(sort_array(collect_list(
          when($"fetch_failed", $"url_stac"))), ",").as("failed_csv"))
      .filter($"n_failed" > 0)
      .orderBy($"collection", $"day")
  }

  /** A18 — grid-bucketed spatial join: granule points vs a set of
    * query bboxes (the multi-region variant of A3's single-bbox scan
    * filter, and the engine answer to "which catalog rows intersect
    * each AOI"). A naive formulation is a theta join (point-in-box
    * comparisons) that Spark can only run as a nested loop; instead
    * both sides key into a fixed 10° grid — regions explode to the
    * cells they overlap (tiny, broadcast), points compute their single
    * cell scan-side — so the join is a cell-keyed equi-join with the
    * exact containment check as a residual filter. A point matches a
    * region through exactly one cell (its own), so no post-join dedup
    * is needed. At 100 TB this is the bounded-candidate spatial join:
    * work scales with matches per cell, never |points|·|regions|.
    */
  def gridJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val regions = StacSynth.regions.toDF("region_id", "w", "s", "e", "n")
    val cells = regions
      .withColumn("cx", explode(sequence(
        floor($"w" / 10).cast("int"), floor($"e" / 10).cast("int"))))
      .withColumn("cy", explode(sequence(
        floor($"s" / 10).cast("int"), floor($"n" / 10).cast("int"))))
    val pts = catalog(spark, dir)
      .select($"granule_id", $"lon", $"lat")
      .withColumn("cx", floor($"lon" / 10).cast("int"))
      .withColumn("cy", floor($"lat" / 10).cast("int"))
    pts.join(broadcast(cells), Seq("cx", "cy"))
      .filter($"lon" >= $"w" && $"lon" < $"e" &&
        $"lat" >= $"s" && $"lat" < $"n")
      .groupBy($"region_id")
      .agg(count(lit(1)).as("n_granules"),
        min($"granule_id").as("first_granule"),
        max($"granule_id").as("last_granule"))
      .orderBy($"region_id")
  }

  /** A28 — nearest-granule spatial join: each AOI centroid matched to
    * its nearest catalog point among the 3×3 ring of 10° grid cells
    * around it (flat lon/lat squared distance, documented planar
    * approximation away from the antimeridian — A19 handles wrapped
    * AOIs). The argmin is `min(struct(d2, granule_id))` — a
    * partial-aggregable lexicographic min (ties to the smallest id),
    * so candidates collapse map-side and no window or sort touches the
    * catalog.
    *
    * Scale shape: the query side (centroids × 9 cells) broadcasts; the
    * catalog joins on its scan-side cell key, so the only shuffle is
    * the regions-sized argmin aggregate — the grid-bucketed kNN-join
    * shape that replaces the quadratic point-to-point distance join.
    */
  def nearestJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = StacSynth.regions.toDF("region_id", "w", "s", "e", "n")
      .select($"region_id",
        (($"w" + $"e") / 2).as("qlon"), (($"s" + $"n") / 2).as("qlat"))
      .withColumn("qcx", floor($"qlon" / 10).cast("int"))
      .withColumn("qcy", floor($"qlat" / 10).cast("int"))
      .withColumn("cx", explode(array((-1 to 1).map(d => $"qcx" + d): _*)))
      .withColumn("cy", explode(array((-1 to 1).map(d => $"qcy" + d): _*)))
      .select($"region_id", $"qlon", $"qlat", $"cx", $"cy")
    val pts = catalog(spark, dir)
      .select($"granule_id", $"lon", $"lat")
      .withColumn("cx", floor($"lon" / 10).cast("int"))
      .withColumn("cy", floor($"lat" / 10).cast("int"))
    pts.join(broadcast(q), Seq("cx", "cy"))
      .withColumn("d2",
        ($"lon" - $"qlon") * ($"lon" - $"qlon") +
          ($"lat" - $"qlat") * ($"lat" - $"qlat"))
      .groupBy($"region_id")
      .agg(min(struct($"d2", $"granule_id")).as("m"),
        count(lit(1)).as("n_candidates"))
      .select($"region_id", $"m.granule_id".as("nearest_granule"),
        (floor($"m.d2" * 1000000.0 + 0.5) / 1000000.0).as("dist2"),
        $"n_candidates")
      .orderBy($"region_id")
  }

  /** A24 — property-filtered catalog query: the search a real HLS
    * consumer runs against the widened item schema (clear-ish scenes in
    * an AOI with usable sun geometry — eo:cloud_cover is THE standard
    * first filter on optical catalogs). All plain comparisons on
    * top-level columns, so at scale every predicate reaches the
    * parquet scan of a materialized catalog and row groups whose
    * cloud-cover stats miss the cut are skipped without decoding.
    */
  def cloudCoverFilter(spark: SparkSession, dir: String,
                       maxCloud: Long = 20, minSunElev: Long = 15,
                       bbox: (Double, Double, Double, Double) =
                         (-150.0, -50.0, -100.0, 50.0)): DataFrame = {
    import spark.implicits._
    val (w, s, e, n) = bbox
    Validation.validateBbox(w, s, e, n)
    catalog(spark, dir)
      .filter($"cloud_cover" <= maxCloud && $"sun_elevation" >= minSunElev)
      .filter($"lon" >= w && $"lon" <= e && $"lat" >= s && $"lat" <= n)
      .select($"granule_id", $"cloud_cover", $"sun_azimuth",
        $"sun_elevation", $"lon", $"lat")
      .orderBy($"granule_id")
  }

  /** A13 — asset access inside the item's assets object. */
  def assetAccess(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    catalog(spark, dir)
      .withColumn("b04_href", get_json_object($"assets_json", "$.B04.href"))
      .withColumn("b04_type", get_json_object($"assets_json", "$.B04.type"))
      .withColumn("b04_title", get_json_object($"assets_json", "$.B04.title"))
      .withColumn("fmask_href", get_json_object($"assets_json", "$.Fmask.href"))
      .select($"granule_id", $"b04_href", $"b04_type", $"b04_title",
        $"fmask_href")
      .orderBy($"granule_id")
  }

  /** A25 — catalog upsert, latest-version-wins (the ingest-merge a
    * long-lived catalog runs on every CMR re-harvest: reprocessed
    * granules overlay their previous versions). A deterministic
    * reprocessing delta (every 7th granule re-emitted as v2.1, one
    * hour later) is unioned with the base catalog and ONE
    * partial-aggregable `max(struct(ts, version, payload))` argmax per
    * granule keeps the newest row — no window over the catalog, no
    * join: the merge is a single granule-keyed aggregate whose partial
    * combine discards superseded versions map-side, exactly what an
    * upsert at 100 TB wants (compare: row_number() would sort every
    * version of every granule).
    */
  def upsertLatest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cat = catalog(spark, dir)
      .select($"granule_id", $"ts", $"cloud_cover")
    val v20 = cat.withColumn("version", lit("2.0"))
    val v21 = cat.filter($"granule_id" % 7 === 0)
      .withColumn("ts", $"ts" + expr("INTERVAL 1 HOUR"))
      .withColumn("version", lit("2.1"))
    v20.unionByName(v21)
      .groupBy($"granule_id")
      .agg(max(struct($"ts", $"version", $"cloud_cover")).as("s"))
      .select($"granule_id", $"s.version".as("version"), $"s.ts".as("ts"),
        $"s.cloud_cover".as("cloud_cover"))
      .orderBy($"granule_id")
  }

  /** A27 — catalog snapshot diff (the audit step between two harvest
    * generations: what did the re-harvest add, drop, or reprocess?):
    * two deterministic snapshots of the catalog (granule_id % 13 == 0
    * absent from the old snapshot = "added"; % 11 == 5 absent from the
    * new = "removed"; % 7 == 0 re-emitted with a bumped payload =
    * "changed") FULL OUTER joined on granule_id, classified scan-side,
    * unchanged rows dropped.
    *
    * Scale shape: ONE key-partitioned full-outer join (sort-merge on
    * granule_id — co-partitions if both snapshots are bucketed by key,
    * which a production catalog would be) and a scan-side CASE; no
    * window, no second shuffle — the diff output is change-sized, not
    * catalog-sized.
    */
  def catalogDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cat = catalog(spark, dir).select($"granule_id", $"cloud_cover")
    val snapA = cat.filter($"granule_id" % 13 =!= 0)
      .select($"granule_id", $"cloud_cover".as("old_cloud"))
    val snapB = cat.filter($"granule_id" % 11 =!= 5)
      .select($"granule_id",
        when($"granule_id" % 7 === 0, $"cloud_cover" + 1)
          .otherwise($"cloud_cover").as("new_cloud"))
    snapA.join(snapB, Seq("granule_id"), "full_outer")
      .withColumn("change",
        when($"old_cloud".isNull, lit("added"))
          .when($"new_cloud".isNull, lit("removed"))
          .when($"old_cloud" =!= $"new_cloud", lit("changed")))
      .filter($"change".isNotNull)
      .select($"change", $"granule_id", $"old_cloud", $"new_cloud")
      .orderBy($"change", $"granule_id")
  }

  /** A26 — coverage-gap detection (catalog QA: sensor outages and
    * missed acquisitions show up as calendar gaps in a zone's
    * observation cadence): distinct (collection, UTM zone, day)
    * observations, lead() per (collection, zone) ordered by day, emit
    * every gap longer than one day with its length. Scale shape: the
    * distinct collapses the catalog to (groups × days) rows first, so
    * the window partitions are calendar-bounded regardless of corpus
    * size, and the partition key count grows with the grid — never a
    * global window.
    */
  def coverageGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy($"collection", $"zone").orderBy($"day")
    catalog(spark, dir)
      .select($"collection", substring($"tile", 1, 2).as("zone"),
        to_date($"ts").as("day"))
      .distinct()
      .withColumn("next_day", lead($"day", 1).over(w))
      .filter($"next_day".isNotNull &&
        datediff($"next_day", $"day") > 1)
      .select($"collection", $"zone", $"day".as("last_seen"),
        (datediff($"next_day", $"day").cast("long") - 1).as("gap_days"))
      .orderBy($"collection", $"zone", $"last_seen")
  }

  private val cte = StacSynth.sqlCte

  /** Bucket span for the A29 locality report: 2^28 / 100 buckets — a
    * NON-power-of-4 count on purpose: power-of-4 ranges align to
    * quadrant blocks where both curves look identical; unaligned
    * ranges are where Morton's quadrant jumps inflate bucket bboxes
    * (measured here: ~2.5× Hilbert's total area on the test catalog).
    * (Defined BEFORE the oracles map — vals initialize in declaration
    * order and the map interpolates this value.)
    */
  private final val LocalitySpan: Long = (1L << 28) / 100

  val oracles: Map[String, String] = Map(
    "stac_parse_items" -> (cte +
      """SELECT granule_id,
        |  json_extract_string(item_json, '$.id') AS item_id,
        |  json_extract_string(item_json, '$.collection') AS item_collection,
        |  json_extract_string(item_json, '$.properties.datetime') AS item_datetime,
        |  CAST(json_extract(item_json, '$.properties."eo:cloud_cover"') AS BIGINT) AS cloud_cover,
        |  CAST(json_extract(item_json, '$.properties."view:sun_azimuth"') AS BIGINT) AS sun_azimuth,
        |  CAST(json_extract(item_json, '$.properties."view:sun_elevation"') AS BIGINT) AS sun_elevation,
        |  CAST(json_extract(item_json, '$.grid.lon10') AS BIGINT) AS lon10,
        |  CAST(json_extract(item_json, '$.grid.lat10') AS BIGINT) AS lat10
        |FROM stac ORDER BY granule_id""".stripMargin),
    "stac_link_extract" -> (cte +
      """SELECT granule_id,
        |  list_filter(links, l -> l LIKE 'https%' AND l LIKE '%stac.json')[1] AS stac_link
        |FROM stac
        |WHERE len(list_filter(links, l -> l LIKE 'https%' AND l LIKE '%stac.json')) > 0
        |ORDER BY granule_id""".stripMargin),
    "stac_bbox_filter" -> (cte +
      """SELECT granule_id, lon, lat FROM stac
        |WHERE lon >= -150.0 AND lon <= -100.0 AND lat >= -50.0 AND lat <= 50.0
        |ORDER BY granule_id""".stripMargin),
    "stac_temporal_filter" -> (cte +
      """SELECT granule_id, ts FROM stac
        |WHERE ts >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND ts <= TIMESTAMP '1996-03-31 23:59:59'
        |ORDER BY granule_id""".stripMargin),
    "stac_daily_links" -> (cte +
      """SELECT collection, CAST(ts AS DATE) AS day, count(*) AS n_links,
        |  string_agg(url_stac, ',' ORDER BY url_stac) AS links_csv
        |FROM stac GROUP BY collection, CAST(ts AS DATE)
        |ORDER BY collection, day""".stripMargin),
    "stac_monthly_rollup" -> (cte +
      """SELECT collection, date_trunc('month', CAST(ts AS DATE)) AS month_start,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days_present,
        |  CAST(day(last_day(min(CAST(ts AS DATE)))) - (CASE
        |    WHEN collection = 'HLSL30_2.0' AND date_trunc('month', CAST(ts AS DATE)) = DATE '1995-01-01' THEN 15
        |    WHEN collection = 'HLSS30_2.0' AND date_trunc('month', CAST(ts AS DATE)) = DATE '1995-01-01' THEN 10
        |    ELSE 1 END) + 1 AS BIGINT) AS expected_days,
        |  count(DISTINCT CAST(ts AS DATE)) = CAST(day(last_day(min(CAST(ts AS DATE)))) - (CASE
        |    WHEN collection = 'HLSL30_2.0' AND date_trunc('month', CAST(ts AS DATE)) = DATE '1995-01-01' THEN 15
        |    WHEN collection = 'HLSS30_2.0' AND date_trunc('month', CAST(ts AS DATE)) = DATE '1995-01-01' THEN 10
        |    ELSE 1 END) + 1 AS BIGINT) AS complete,
        |  count(*) AS n_links
        |FROM stac
        |GROUP BY collection, date_trunc('month', CAST(ts AS DATE))
        |ORDER BY collection, month_start""".stripMargin),
    "stac_mgrs_extract" -> (cte +
      """SELECT granule_id,
        |  regexp_extract(url_stac, '\.T([0-9]{2}[A-Z]{3})\.', 1) AS mgrs_tile
        |FROM stac ORDER BY granule_id""".stripMargin),
    "stac_failed_links" -> (cte +
      """SELECT collection, CAST(ts AS DATE) AS day,
        |  CAST(sum(CASE WHEN fetch_failed THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
        |  CAST(sum(CASE WHEN fetch_failed THEN 0 ELSE 1 END) AS BIGINT) AS n_ok,
        |  string_agg(CASE WHEN fetch_failed THEN url_stac END, ','
        |    ORDER BY CASE WHEN fetch_failed THEN url_stac END) AS failed_csv
        |FROM stac GROUP BY collection, CAST(ts AS DATE)
        |HAVING sum(CASE WHEN fetch_failed THEN 1 ELSE 0 END) > 0
        |ORDER BY collection, day""".stripMargin),
    "stac_bbox_wrapped" -> (cte +
      """SELECT granule_id, lon, lat FROM stac
        |WHERE (lon >= 150.0 OR lon <= -140.0)
        |  AND lat >= -20.0 AND lat <= 60.0
        |ORDER BY granule_id""".stripMargin),
    "stac_grid_join" -> (cte.stripSuffix("\n") + ",\n" +
      s"""regions(region_id, w, s, e, n) AS (VALUES
        |    ${StacSynth.regionsSqlValues})
        |SELECT region_id, count(*) AS n_granules,
        |  min(granule_id) AS first_granule,
        |  max(granule_id) AS last_granule
        |FROM stac JOIN regions
        |  ON lon >= w AND lon < e AND lat >= s AND lat < n
        |GROUP BY region_id ORDER BY region_id""".stripMargin),
    "stac_revisit_cadence" -> (cte +
      """, rc0 AS (
        |  SELECT DISTINCT collection, substr(tile, 1, 2) AS zone,
        |    granule_id, CAST(ts AS DATE) AS day
        |  FROM stac),
        |rc1 AS (
        |  SELECT collection,
        |    (day - lag(day) OVER (PARTITION BY collection, zone
        |      ORDER BY day, granule_id))::BIGINT AS gap_days
        |  FROM rc0),
        |rg AS (SELECT collection, gap_days FROM rc1
        |       WHERE gap_days IS NOT NULL),
        |rhist AS (
        |  SELECT collection, gap_days, count(*) AS n FROM rg
        |  GROUP BY 1, 2),
        |rmed AS (
        |  SELECT collection,
        |    floor(quantile_cont(gap_days, 0.5) * 10000.0 + 0.5)
        |      / 10000.0 AS median_gap
        |  FROM rg GROUP BY collection)
        |SELECT h.collection, h.gap_days, h.n, m.median_gap
        |FROM rhist h JOIN rmed m ON m.collection = h.collection
        |ORDER BY h.collection, h.gap_days""".stripMargin),
    "stac_best_scene" -> (cte +
      """, r AS (
        |  SELECT tile, date_trunc('month', ts)::DATE AS month,
        |    granule_id, cloud_cover, epoch_us(ts) AS ts_us,
        |    count(*) OVER (PARTITION BY tile, date_trunc('month', ts))
        |      AS n_scenes,
        |    row_number() OVER (
        |      PARTITION BY tile, date_trunc('month', ts)
        |      ORDER BY cloud_cover, epoch_us(ts) DESC, granule_id) AS rn
        |  FROM stac)
        |SELECT tile, month, n_scenes::BIGINT AS n_scenes,
        |  granule_id AS best_granule, cloud_cover AS best_cloud,
        |  ts_us AS best_ts_us
        |FROM r WHERE rn = 1
        |ORDER BY tile, month""".stripMargin),
    "stac_nearest_join" -> (cte.stripSuffix("\n") + ",\n" +
      s"""regions(region_id, w, s, e, n) AS (VALUES
        |    ${StacSynth.regionsSqlValues}),
        |q AS (
        |  SELECT region_id, (w + e) / 2 AS qlon, (s + n) / 2 AS qlat,
        |    floor(((w + e) / 2) / 10)::INT AS qcx,
        |    floor(((s + n) / 2) / 10)::INT AS qcy
        |  FROM regions),
        |qc AS (
        |  SELECT region_id, qlon, qlat,
        |    qcx + dx AS cx, qcy + dy AS cy
        |  FROM q,
        |    (SELECT unnest([-1, 0, 1]) AS dx) a,
        |    (SELECT unnest([-1, 0, 1]) AS dy) b),
        |cand AS (
        |  SELECT qc.region_id, qc.qlon, qc.qlat, p.granule_id,
        |    p.lon, p.lat
        |  FROM qc JOIN stac p
        |    ON floor(p.lon / 10)::INT = qc.cx
        |    AND floor(p.lat / 10)::INT = qc.cy),
        |d AS (
        |  SELECT region_id, granule_id,
        |    (lon - qlon) * (lon - qlon) + (lat - qlat) * (lat - qlat)
        |      AS d2
        |  FROM cand),
        |r AS (
        |  SELECT region_id, granule_id, d2,
        |    row_number() OVER (PARTITION BY region_id
        |      ORDER BY d2, granule_id) AS rn,
        |    count(*) OVER (PARTITION BY region_id) AS n_candidates
        |  FROM d)
        |SELECT region_id, granule_id AS nearest_granule,
        |  floor(d2 * 1000000.0 + 0.5) / 1000000.0 AS dist2,
        |  n_candidates
        |FROM r WHERE rn = 1 ORDER BY region_id""".stripMargin),
    "stac_cloud_filter" -> (cte +
      """SELECT granule_id, cloud_cover, sun_azimuth, sun_elevation, lon, lat
        |FROM stac
        |WHERE cloud_cover <= 20 AND sun_elevation >= 15
        |  AND lon >= -150.0 AND lon <= -100.0 AND lat >= -50.0 AND lat <= 50.0
        |ORDER BY granule_id""".stripMargin),
    "stac_coverage_gaps" -> (cte +
      """, g AS (
        |  SELECT DISTINCT collection, substr(tile, 1, 2) AS zone,
        |    CAST(ts AS DATE) AS day
        |  FROM stac),
        |w AS (
        |  SELECT *, lead(day) OVER (PARTITION BY collection, zone
        |    ORDER BY day) AS next_day
        |  FROM g)
        |SELECT collection, zone, day AS last_seen,
        |  date_diff('day', day, next_day)::BIGINT - 1 AS gap_days
        |FROM w
        |WHERE next_day IS NOT NULL AND date_diff('day', day, next_day) > 1
        |ORDER BY collection, zone, last_seen""".stripMargin),
    "stac_catalog_diff" -> (cte +
      """, snap_a AS (
        |  SELECT granule_id, cloud_cover AS old_cloud FROM stac
        |  WHERE granule_id % 13 <> 0),
        |snap_b AS (
        |  SELECT granule_id,
        |    CASE WHEN granule_id % 7 = 0 THEN cloud_cover + 1
        |         ELSE cloud_cover END AS new_cloud
        |  FROM stac WHERE granule_id % 11 <> 5),
        |d AS (
        |  SELECT coalesce(a.granule_id, b.granule_id) AS granule_id,
        |    a.old_cloud, b.new_cloud,
        |    CASE WHEN a.granule_id IS NULL THEN 'added'
        |         WHEN b.granule_id IS NULL THEN 'removed'
        |         WHEN a.old_cloud <> b.new_cloud THEN 'changed'
        |    END AS change
        |  FROM snap_a a FULL OUTER JOIN snap_b b
        |    ON a.granule_id = b.granule_id)
        |SELECT change, granule_id, old_cloud, new_cloud
        |FROM d WHERE change IS NOT NULL
        |ORDER BY change, granule_id""".stripMargin),
    "stac_upsert_latest" -> (cte +
      """, v20 AS (
        |  SELECT granule_id, '2.0' AS version, ts, cloud_cover FROM stac),
        |v21 AS (
        |  SELECT granule_id, '2.1' AS version, ts + INTERVAL 1 HOUR AS ts,
        |    cloud_cover
        |  FROM stac WHERE granule_id % 7 = 0),
        |allv AS (SELECT * FROM v20 UNION ALL SELECT * FROM v21),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY granule_id
        |    ORDER BY ts DESC, version DESC) AS rn
        |  FROM allv)
        |SELECT granule_id, version, ts, cloud_cover
        |FROM r WHERE rn = 1 ORDER BY granule_id""".stripMargin),
    "stac_asset_access" -> (cte +
      """SELECT granule_id,
        |  json_extract_string(assets_json, '$.B04.href') AS b04_href,
        |  json_extract_string(assets_json, '$.B04.type') AS b04_type,
        |  json_extract_string(assets_json, '$.B04.title') AS b04_title,
        |  json_extract_string(assets_json, '$.Fmask.href') AS fmask_href
        |FROM stac ORDER BY granule_id""".stripMargin),
    // Hilbert xy→d re-derived in SQL: the standard rotate-and-flip loop
    // as a 14-level recursive CTE (state (x,y,s,d), s halves per level),
    // morton as a direct bit-interleave sum — full value parity with the
    // codegen'd expressions, no custom hash anywhere.
    "hilbert_index" -> (hilbertIdxSql +
      """SELECT granule_id, gx, gy, hilbert, morton FROM idx
        |ORDER BY granule_id""".stripMargin),
    "spatial_sort" -> (hilbertIdxSql +
      """SELECT row_number() OVER (ORDER BY hilbert, granule_id)
        |    ::BIGINT AS rank,
        |  granule_id, hilbert FROM idx
        |ORDER BY rank""".stripMargin),
    "spatial_locality_report" -> (hilbertIdxSql +
      s""", stacked AS (
        |  SELECT 'hilbert' AS scheme, hilbert // ${LocalitySpan} AS bucket,
        |    gx, gy FROM idx
        |  UNION ALL
        |  SELECT 'morton' AS scheme, morton // ${LocalitySpan} AS bucket,
        |    gx, gy FROM idx),
        |per AS (
        |  SELECT scheme, bucket, count(*) AS n,
        |    (max(gx) - min(gx) + 1) * (max(gy) - min(gy) + 1) AS area
        |  FROM stacked GROUP BY scheme, bucket)
        |SELECT scheme, count(*) AS n_buckets,
        |  CAST(sum(n) AS BIGINT) AS n_points,
        |  CAST(sum(area) AS BIGINT) AS sum_area,
        |  floor(avg(area) * 10000.0 + 0.5) / 10000.0 AS mean_area
        |FROM per GROUP BY scheme ORDER BY scheme""".stripMargin))

  /** Hilbert/morton index derivation shared by the A9 oracle and the
    * A29 locality report: the rotate-and-flip loop as a 14-level
    * recursive CTE + morton bit-interleave, ending in an `idx` CTE.
    */
  private def hilbertIdxSql: String = cte.replaceFirst("WITH stac_catalog",
    "WITH RECURSIVE stac_catalog").stripSuffix("\n") + ",\n" +
    """gc AS (
      |  SELECT granule_id,
      |    least(greatest(CAST(floor((lon + 180.0) / 360.0 * 16384) AS BIGINT), 0), 16383) AS gx,
      |    least(greatest(CAST(floor((lat + 90.0) / 180.0 * 16384) AS BIGINT), 0), 16383) AS gy
      |  FROM stac),
      |h(granule_id, x, y, s, d) AS (
      |  SELECT granule_id, gx, gy, 8192::BIGINT, 0::BIGINT FROM gc
      |  UNION ALL
      |  SELECT granule_id,
      |    CASE WHEN (y & s) > 0 THEN x
      |         WHEN (x & s) > 0 THEN s - 1 - y
      |         ELSE y END,
      |    CASE WHEN (y & s) > 0 THEN y
      |         WHEN (x & s) > 0 THEN s - 1 - x
      |         ELSE x END,
      |    s // 2,
      |    d + s * s * xor(CASE WHEN (x & s) > 0 THEN 3 ELSE 0 END,
      |                    CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END)
      |  FROM h WHERE s > 0),
      |idx AS (
      |  SELECT gc.granule_id, gc.gx, gc.gy, h.d AS hilbert,
      |    CAST(list_sum([((gc.gx >> i) & 1) * (1::BIGINT << (2 * i))
      |        + ((gc.gy >> i) & 1) * (1::BIGINT << (2 * i + 1))
      |      for i in range(0, 14)]) AS BIGINT) AS morton
      |  FROM gc JOIN h ON h.granule_id = gc.granule_id AND h.s = 0)
      |""".stripMargin

}

/** Bbox validation (reference: validation.py). */
object Validation {
  def validateBbox(minLon: Double, minLat: Double,
                   maxLon: Double, maxLat: Double): Unit = {
    require(minLon >= -180 && minLon <= 180,
      s"min_lon must be between -180 and 180, got $minLon")
    require(maxLon >= -180 && maxLon <= 180,
      s"max_lon must be between -180 and 180, got $maxLon")
    require(minLat >= -90 && minLat <= 90,
      s"min_lat must be between -90 and 90, got $minLat")
    require(maxLat >= -90 && maxLat <= 90,
      s"max_lat must be between -90 and 90, got $maxLat")
    require(minLon < maxLon,
      s"min_lon ($minLon) must be less than max_lon ($maxLon)")
    require(minLat < maxLat,
      s"min_lat ($minLat) must be less than max_lat ($maxLat)")
  }
}
