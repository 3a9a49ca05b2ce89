package graft

import java.nio.file.Files

import graft.stac.{StacFetch, StacPipeline, StacSynth}

/** In-memory transport: serves the catalog's own item_json per URL,
  * throws for URLs in the fail set; counts per-netloc opens so reuse
  * is assertable (executors share this JVM under local[N]).
  */
object MockTransport {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
}

class MockTransport(bodies: Map[String, String], failing: Set[String])
    extends StacFetch.Transport {
  def open(scheme: String, netloc: String): String => Array[Byte] = {
    MockTransport.opens.incrementAndGet()
    url => {
      if (failing(url)) throw new RuntimeException(s"503 on $url")
      bodies.getOrElse(url,
        throw new NoSuchElementException(s"404 $url")).getBytes("UTF-8")
    }
  }
}

/** Fails `flaky` URLs on their first attempt only, `dead` URLs
  * always — attempt counts shared per-JVM (local[N] executors).
  */
object FlakyTransport {
  val seen = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}

class FlakyTransport(bodies: Map[String, String], flaky: Set[String],
                     dead: Set[String]) extends StacFetch.Transport {
  def open(scheme: String, netloc: String): String => Array[Byte] = { url =>
    val n = FlakyTransport.seen.merge(url, 1, (a, b) => a + b)
    if (dead(url)) throw new RuntimeException(s"503 permanent $url")
    if (flaky(url) && n <= 1) throw new RuntimeException(s"503 transient $url")
    bodies(url).getBytes("UTF-8")
  }
}

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

  test("fetch operator: success/failure separation, netloc reuse, bounded pool") {
    import org.apache.spark.sql.functions._
    val catalog = StacSynth.catalog(spark, sf).cache()
    val bodies = catalog.select($"url_stac", $"item_json").as[(String, String)]
      .collect().toMap
    val failUrls = catalog.filter($"fetch_failed")
      .select($"url_stac").as[String].collect().toSet
    assert(failUrls.nonEmpty, "synth catalog plants fetch failures")
    val links = catalog.select($"url_stac".as("stac_link")).repartition(4)
    MockTransport.opens.set(0)
    val (items, failed) = StacFetch.fetchItems(links, "stac_link",
      new MockTransport(bodies, failUrls), maxConcurrent = 8)
    val nItems = items.count(); val nFailed = failed.count()
    // failures become rows, successes parse — together they partition
    // the input exactly (fetch.py:78-88)
    assert(nItems + nFailed === catalog.count())
    assert(nFailed === failUrls.size)
    assert(failed.filter($"error".contains("503")).count() === nFailed)
    // one open per (partition × netloc): 4 partitions, 1 https netloc
    assert(MockTransport.opens.get() <= 4,
      s"expected ≤4 netloc opens, got ${MockTransport.opens.get()}")
    // parsed fields round-trip the catalog's own values (columns
    // renamed: items derives from catalog, so a direct self-join on
    // shared names is ambiguous)
    val cat2 = catalog.select($"url_stac".as("c_url"),
      $"collection".as("c_col"), $"ts".as("c_ts"),
      $"lon".as("c_lon"), $"lat".as("c_lat"))
    val joined = items.join(cat2, $"url_stac" === $"c_url")
      .filter($"collection" =!= $"c_col" || $"ts" =!= $"c_ts" ||
        abs($"lon" - $"c_lon") > 1e-9 || abs($"lat" - $"c_lat") > 1e-9)
    assert(joined.count() === 0, "fetched item fields must match catalog")
    // malformed body joins the failed side, not an exception
    val badLinks = Seq("https://data.example.com/bad.json")
      .toDF("stac_link")
    val bad = new MockTransport(
      Map("https://data.example.com/bad.json" -> "not json at all"),
      Set.empty)
    val (bi, bfail) = StacFetch.fetchItems(badLinks, "stac_link", bad)
    assert(bi.count() === 0 && bfail.count() === 1)
    assert(bfail.head().getString(1).contains("Malformed"))
  }

  test("fetch retries recover transient failures, keep terminal ones") {
    import org.apache.spark.sql.functions._
    val catalog = StacSynth.catalog(spark, sf).cache()
    val bodies = catalog.select($"url_stac", $"item_json").as[(String, String)]
      .collect().toMap
    // flaky: fail on first attempt only; dead: always fail
    val flaky = catalog.filter($"granule_id" % 97 === 0)
      .select($"url_stac").as[String].collect().toSet
    val dead = catalog.filter($"granule_id" % 101 === 0)
      .select($"url_stac").as[String].collect().toSet
    assert(flaky.nonEmpty && dead.nonEmpty)
    FlakyTransport.seen.clear()
    val links = catalog.select($"url_stac".as("stac_link")).repartition(4)
    val (items, failed) = graft.stac.StacFetch.fetchWithRetries(
      links, "stac_link", new FlakyTransport(bodies, flaky, dead),
      attempts = 3, maxConcurrent = 8)
    val failedUrls = failed.select($"url").as[String].collect().toSet
    // dead links exhaust retries; flaky ones recover on the 2nd pass
    assert(failedUrls === dead)
    assert(items.count() === catalog.count() - dead.size)
    // one attempt only: flaky links fail too
    FlakyTransport.seen.clear()
    val (i1, f1) = graft.stac.StacFetch.fetchWithRetries(
      links, "stac_link", new FlakyTransport(bodies, flaky, dead),
      attempts = 1, maxConcurrent = 8)
    assert(f1.count() === (flaky ++ dead).size.toLong)
    assert(i1.count() === catalog.count() - (flaky ++ dead).size)
  }

  test("streaming fetch: micro-batched fetch equals the batch semantics") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft-sfetch").toString
    val catalog = StacSynth.catalog(spark, sf).cache()
    val bodies = catalog.select($"url_stac", $"item_json").as[(String, String)]
      .collect().toMap
    val failUrls = catalog.filter($"fetch_failed")
      .select($"url_stac").as[String].collect().toSet
    // several micro-batches: one source file per trigger
    catalog.select($"url_stac".as("stac_link")).repartition(4)
      .write.parquet(s"$tmp/links-src")
    val linkStream = spark.readStream
      .schema("stac_link STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/links-src")
    graft.streaming.StacStreams.fetchLinkStream(linkStream, "stac_link",
      new MockTransport(bodies, failUrls), s"$tmp/items", s"$tmp/failed",
      maxConcurrent = 8)
    val items = spark.read.parquet(s"$tmp/items")
    val failed = spark.read.parquet(s"$tmp/failed")
    assert(items.count() + failed.count() === catalog.count())
    assert(failed.count() === failUrls.size)
    // item fields survive the streaming path identically
    val cat2 = catalog.select($"url_stac".as("c_url"), $"ts".as("c_ts"))
    assert(items.join(cat2, $"url_stac" === $"c_url")
      .filter($"ts" =!= $"c_ts").count() === 0)
  }

  test("end-to-end with fetch: link cache → fetch → monthly geoparquet + failed") {
    val tmp = Files.createTempDirectory("graft-fetch-pipe").toString
    val catalog = StacSynth.catalog(spark, sf).cache()
    val cid = "HLSL30_2.0"
    val days = catalog
      .filter($"collection" === cid)
      .filter(org.apache.spark.sql.functions.date_format($"ts", "yyyy-MM") === "1996-03")
      .select(org.apache.spark.sql.functions.dayofmonth($"ts"))
      .distinct().as[Int].collect().sorted
    assert(days.nonEmpty)
    for (d <- days) {
      StacPipeline.cacheDailyStacJsonLinks(spark, catalog, tmp, cid,
        f"1996-03-$d%02d")
    }
    val bodies = catalog.select($"url_stac", $"item_json").as[(String, String)]
      .collect().toMap
    val failUrls = catalog.filter($"fetch_failed")
      .select($"url_stac").as[String].collect().toSet
    val failed = StacPipeline.fetchAndWriteMonthly(spark, tmp, cid, 1996, 3,
      new MockTransport(bodies, failUrls)).cache()
    val monthLinks = StacPipeline.readMonthlyLinks(spark, tmp, cid, 1996, 3)
    val expectFailed = monthLinks
      .filter($"stac_link".isin(failUrls.toSeq: _*)).count()
    assert(failed.count() === expectFailed)
    val out = spark.read.parquet(s"$tmp/v0.1/$cid")
      .filter($"year" === 1996 && $"month" === 3)
    assert(out.count() === monthLinks.count() - expectFailed)
    // the geoparquet contract survives the fetch path: full asset
    // structs (href/type/title) and the filterable item properties
    // (write.py:219 — rustac writes whole items)
    assert(out.columns.contains("geometry"))
    assert(out.columns.contains("assets"))
    assert(Set("cloud_cover", "sun_azimuth", "sun_elevation")
      .subsetOf(out.columns.toSet))
    val assets = out.select($"assets")
      .head().getMap[String, org.apache.spark.sql.Row](0)
    assert(Set("B04", "B05", "Fmask").subsetOf(assets.keySet.toSet))
    assert(assets("B04").getAs[String]("href").endsWith(".B04.tif"))
    assert(assets("B04").getAs[String]("type").startsWith("image/tiff"))
    assert(assets("B04").getAs[String]("title") === "B04")
    // properties round-trip the catalog's deterministic values
    val cat3 = catalog.select($"url_stac".as("c_url"),
      $"cloud_cover".as("c_cc"), $"sun_azimuth".as("c_az"),
      $"sun_elevation".as("c_el"))
    assert(out.join(cat3, $"url_stac" === $"c_url")
      .filter($"cloud_cover" =!= $"c_cc" || $"sun_azimuth" =!= $"c_az" ||
        $"sun_elevation" =!= $"c_el").count() === 0)
  }

  test("fetch windows bound per-partition memory: window w starts only after window w-1 completes") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val catalog = StacSynth.catalog(spark, sf).cache()
    val bodies = catalog.select($"url_stac", $"item_json").as[(String, String)]
      .collect().toMap
    val links = catalog.select($"url_stac".as("stac_link"))
      .limit(40).repartition(2)
    WindowProbeTransport.reset()
    val mc = 4
    val raw = StacFetch.fetchRaw(links, "stac_link",
      new WindowProbeTransport(bodies), maxConcurrent = mc)
    assert(raw.count() === 40)
    // For each partition, the j-th get to START (0-based) must observe
    // at least floor(j/mc)*mc COMPLETED gets in its partition: awaiting
    // in windows means a new window launches only after the previous
    // one fully finished (the whole-partition materialization this
    // replaces submits everything up front, so the (mc+1)-th start
    // would observe ~1 completion, not mc).
    val byPart = WindowProbeTransport.observations.asScala.toSeq
      .groupBy(_._1).values
    assert(byPart.nonEmpty)
    byPart.foreach { obs =>
      obs.sortBy(_._2).zipWithIndex.foreach { case ((_, _, doneAtStart), j) =>
        assert(doneAtStart >= (j / mc) * mc,
          s"get #$j started with only $doneAtStart completed; " +
            s"window semantics require >= ${(j / mc) * mc}")
      }
    }
  }
}

/** Records, per partition, each get's start ordinal and how many gets
  * of that partition had COMPLETED when it started — the observable
  * that distinguishes windowed awaits from whole-partition fan-out.
  */
object WindowProbeTransport {
  import java.util.concurrent.atomic.AtomicInteger
  import java.util.concurrent.ConcurrentHashMap
  val started = new ConcurrentHashMap[Int, AtomicInteger]()
  val done = new ConcurrentHashMap[Int, AtomicInteger]()
  // (partitionId, startOrdinal, completedAtStart)
  val observations =
    new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Int)]()
  def reset(): Unit = { started.clear(); done.clear(); observations.clear() }
  private def ctr(m: ConcurrentHashMap[Int, AtomicInteger], p: Int) =
    m.computeIfAbsent(p, _ => new AtomicInteger(0))
  def onStart(p: Int): Unit =
    observations.add((p, ctr(started, p).getAndIncrement(), ctr(done, p).get()))
  def onDone(p: Int): Unit = { ctr(done, p).incrementAndGet(); () }
}

class WindowProbeTransport(bodies: Map[String, String])
    extends StacFetch.Transport {
  def open(scheme: String, netloc: String): String => Array[Byte] = {
    // `open` runs on the task thread (store creation is sequential);
    // the gets run on pool threads with no TaskContext, so the
    // partition id must be captured HERE
    val p = org.apache.spark.TaskContext.getPartitionId()
    url => {
      WindowProbeTransport.onStart(p)
      try {
        Thread.sleep(1) // widen the start/completion interleaving window
        bodies(url).getBytes("UTF-8")
      } finally WindowProbeTransport.onDone(p)
    }
  }
}
