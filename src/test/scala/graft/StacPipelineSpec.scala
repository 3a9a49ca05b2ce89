package graft

import java.nio.file.Files

import graft.stac.{StacPipeline, StacSynth}

class StacPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("dateRange: origin-date default, yesterday default, validation") {
    import graft.stac.HlsCollections
    val today = java.time.LocalDate.parse("2013-04-15")
    val r = StacPipeline.dateRange(HlsCollections.HLSL30, today = today)
    assert(r === Seq("2013-04-11", "2013-04-12", "2013-04-13", "2013-04-14"))
    val r2 = StacPipeline.dateRange(HlsCollections.HLSS30,
      startDate = Some("2024-01-30"), endDate = Some("2024-02-02"))
    assert(r2 === Seq("2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"))
    intercept[IllegalArgumentException] {
      StacPipeline.dateRange(HlsCollections.HLSL30,
        startDate = Some("2024-02-02"), endDate = Some("2024-01-30"))
    }
  }

  test("json-array daily cache matches the reference's exact file layout") {
    import org.apache.spark.sql.functions.to_date
    val tmp = java.nio.file.Files.createTempDirectory("graft-json").toString
    val catalog = StacSynth.catalog(spark, sf)
    // pick a day that actually has HLSS30 granules at this SF
    val day = catalog.filter($"collection" === "HLSS30_2.0")
      .select(to_date($"ts").cast("string")).orderBy($"ts").head().getString(0)
    val Array(y, m, d) = day.split("-")
    val path = StacPipeline.writeDailyLinksJsonArray(spark, catalog, tmp,
      "HLSS30_2.0", day)
    assert(path.endsWith(s"links/HLSS30_2.0/$y/$m/$day.json"))
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    // a single JSON array of https stac.json URLs, like links.py writes
    assert(content.startsWith("[") && content.endsWith("]"))
    val parsed = content.stripPrefix("[").stripSuffix("]").split(", ")
    assert(parsed.nonEmpty && parsed.forall(s => s.startsWith("\"https") &&
      s.endsWith("stac.json\"")))
    // empty day still writes a valid empty array
    val p2 = StacPipeline.writeDailyLinksJsonArray(spark, catalog, tmp,
      "HLSS30_2.0", "2030-01-01")
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p2)), "UTF-8") === "[]")
  }

  test("end-to-end: cache daily links for a month, then write monthly geoparquet") {
    val tmp = Files.createTempDirectory("graft-pipe").toString
    val catalog = StacSynth.catalog(spark, sf).cache()
    val cid = "HLSS30_2.0"

    // which days of 1996-03 have data?
    val days = catalog
      .filter($"collection" === cid)
      .filter(org.apache.spark.sql.functions.date_format($"ts", "yyyy-MM") === "1996-03")
      .select(org.apache.spark.sql.functions.dayofmonth($"ts"))
      .distinct().as[Int].collect().sorted

    for (d <- days) {
      val wrote = StacPipeline.cacheDailyStacJsonLinks(spark, catalog, tmp,
        cid, f"1996-03-$d%02d")
      assert(wrote)
    }
    // skip-existing short-circuits on re-run
    assert(!StacPipeline.cacheDailyStacJsonLinks(spark, catalog, tmp,
      cid, f"1996-03-${days.head}%02d", skipExisting = true))

    // month readback is partition-pruned to exactly the cached days
    val monthly = StacPipeline.readMonthlyLinks(spark, tmp, cid, 1996, 3)
    assert(monthly.count() > 0)
    assert(monthly.select($"day").distinct().count() === days.length)

    if (days.length == 31) {
      assert(StacPipeline.writeMonthlyStacGeoparquet(spark, tmp, cid,
        1996, 3, requireCompleteLinks = true))
    } else {
      // incomplete month must throw under requireCompleteLinks…
      intercept[IllegalStateException] {
        StacPipeline.writeMonthlyStacGeoparquet(spark, tmp, cid,
          1996, 3, requireCompleteLinks = true)
      }
      // …and succeed without it
      assert(StacPipeline.writeMonthlyStacGeoparquet(spark, tmp, cid, 1996, 3))
    }
    val out = spark.read.parquet(s"$tmp/v0.1/$cid")
    assert(out.filter($"year" === 1996 && $"month" === 3).count() ===
      monthly.count())

    // bbox-filtered daily cache is a subset
    StacPipeline.cacheDailyStacJsonLinks(spark, catalog, s"$tmp/bb",
      cid, f"1996-03-${days.head}%02d",
      bbox = Some((-150.0, -50.0, -100.0, 50.0)))
    val bbLinks = spark.read.parquet(
      s"$tmp/bb/links/collection=$cid/year=1996/month=3/day=${days.head}")
    val allLinks = spark.read.parquet(
      s"$tmp/links/collection=$cid/year=1996/month=3/day=${days.head}")
    assert(bbLinks.count() <= allLinks.count())
  }
}
