package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.get_json_object

import graft.stac.CmrSource
import graft.stac.CmrSource.{Page, PageFetcher}

/** Serves `total` entries in pages, tokens "after-N"; records every
  * (pageSize, token) request so the protocol sequence is assertable.
  */
class FakeCmr(total: Int) extends PageFetcher {
  val calls = scala.collection.mutable.ArrayBuffer.empty[(Int, Option[String])]
  def fetch(pageSize: Int, searchAfter: Option[String]): Page = {
    calls += ((pageSize, searchAfter))
    val from = searchAfter.map(_.stripPrefix("after-").toInt).getOrElse(0)
    val until = math.min(from + pageSize, total)
    val entries = (from until until).map { i =>
      s"""{"id": "G$i", "links": [{"href": "https://ex.com/meta/$i.xml"}, {"href": "https://ex.com/$i/item_stac.json"}, {"href": "s3://bucket/$i/item_stac.json"}]}"""
    }
    Page(entries, if (until < total) Some(s"after-$until") else None)
  }
}

class CmrSourceSpec extends SparkSpecBase {
  import spark.implicits._

  test("page size clamp matches cmr_api.py:56") {
    assert(CmrSource.clampPageSize(5000) === 2000)
    assert(CmrSource.clampPageSize(0) === 1)
    assert(CmrSource.clampPageSize(-3) === 1)
    assert(CmrSource.clampPageSize(500) === 500)
  }

  test("token loop pages to exhaustion and the fetcher sees the token chain") {
    val dir = Files.createTempDirectory("graft-cmr").toString
    val cmr = new FakeCmr(total = 25)
    val res = CmrSource.spoolTo(spark, cmr, dir, pageSize = 10)
    assert(res === CmrSource.SpoolResult(3, 25L, complete = true))
    assert(cmr.calls.toSeq === Seq(
      (10, None), (10, Some("after-10")), (10, Some("after-20"))))
    assert(CmrSource.entries(spark, dir).count() === 25)
    // completed sweep: further calls are no-ops
    val again = CmrSource.spoolTo(spark, cmr, dir, pageSize = 10)
    assert(again === CmrSource.SpoolResult(0, 0L, complete = true))
    assert(cmr.calls.size === 3)
  }

  test("mid-stream resume continues from the committed token") {
    val dir = Files.createTempDirectory("graft-cmr-resume").toString
    val cmr = new FakeCmr(total = 45)
    // first sweep dies after 2 of 5 pages
    val partial = CmrSource.spoolTo(spark, cmr, dir, pageSize = 10, maxPages = 2)
    assert(partial === CmrSource.SpoolResult(2, 20L, complete = false))
    // a fresh process resumes from the token file, not from page 0
    val cmr2 = new FakeCmr(total = 45)
    val rest = CmrSource.spoolTo(spark, cmr2, dir, pageSize = 10)
    assert(rest === CmrSource.SpoolResult(3, 25L, complete = true))
    assert(cmr2.calls.head === ((10, Some("after-20"))))
    // no page skipped, no page duplicated
    val ids = CmrSource.entries(spark, dir)
      .select(get_json_object($"entry_json", "$.id")).as[String].collect()
    assert(ids.sorted.toSeq === (0 until 45).map(i => s"G$i").sortBy(identity))
  }

  test("lost resume state: restart sweeps stale page files, no duplicated rows") {
    val dir = Files.createTempDirectory("graft-cmr-stale").toString
    // first sweep lands 4 pages of 10 then dies mid-stream
    CmrSource.spoolTo(spark, new FakeCmr(total = 60), dir,
      pageSize = 10, maxPages = 4)
    // simulate the resume state being lost (crash between delete and
    // rename on a non-atomic FS — the window writeSmall now minimizes)
    val state = new java.io.File(dir, "_search_after")
    assert(state.exists()); assert(state.delete())
    // the restarted source yields FEWER pages (bigger page size): the
    // 4 stale page-files must not survive alongside the new 3
    val res = CmrSource.spoolTo(spark, new FakeCmr(total = 60), dir,
      pageSize = 20)
    assert(res === CmrSource.SpoolResult(3, 60L, complete = true))
    val ids = CmrSource.entries(spark, dir)
      .select(get_json_object($"entry_json", "$.id")).as[String].collect()
    assert(ids.length === 60, s"stale pages leaked: ${ids.length} rows")
    assert(ids.distinct.length === 60)
  }

  test("requested page size reaches the fetcher clamped") {
    val dir = Files.createTempDirectory("graft-cmr-clamp").toString
    val cmr = new FakeCmr(total = 3)
    CmrSource.spoolTo(spark, cmr, dir, pageSize = 99999)
    assert(cmr.calls.head._1 === 2000)
  }

  test("CMR → links → fetch → monthly geoparquet, no pre-built catalog") {
    import org.apache.spark.sql.functions._
    import graft.stac.{StacPipeline, StacSynth}
    val tmp = Files.createTempDirectory("graft-cmr-e2e").toString
    val catalog = StacSynth.catalog(spark, sf).cache()
    val cid = "HLSL30_2.0"
    val day = catalog.filter($"collection" === cid)
      .filter(date_format($"ts", "yyyy-MM") === "1996-03")
      .select(date_format($"ts", "yyyy-MM-dd")).orderBy($"ts")
      .head().getString(0)
    val dayUrls = catalog.filter($"collection" === cid)
      .filter(date_format($"ts", "yyyy-MM-dd") === day)
      .select($"url_stac").as[String].collect().sorted
    assert(dayUrls.nonEmpty)
    // CMR fetcher pages over that day's granules, 2 per page
    val cmr = new CmrSource.PageFetcher {
      def fetch(pageSize: Int, searchAfter: Option[String]): CmrSource.Page = {
        val from = searchAfter.map(_.toInt).getOrElse(0)
        val until = math.min(from + 2, dayUrls.length)
        val entries = (from until until).map { i =>
          s"""{"id": "G$i", "links": [{"href": "${dayUrls(i)}"}]}"""
        }
        CmrSource.Page(entries,
          if (until < dayUrls.length) Some(until.toString) else None)
      }
    }
    assert(StacPipeline.cacheDailyLinksFromCmr(spark, cmr, s"$tmp/spool",
      tmp, cid, day))
    val Array(y, m, d) = day.split("-").map(_.toInt)
    val cached = spark.read.parquet(s"$tmp/links/collection=$cid/" +
      s"year=$y/month=$m/day=$d")
    assert(cached.count() === dayUrls.length.toLong)
    // chain into fetch → monthly geoparquet using the catalog's bodies
    val bodies = catalog.select($"url_stac", $"item_json").as[(String, String)]
      .collect().toMap
    val failUrls = catalog.filter($"fetch_failed")
      .select($"url_stac").as[String].collect().toSet
    val failed = StacPipeline.fetchAndWriteMonthly(spark, tmp, cid, y, m,
      new MockTransport(bodies, failUrls)).cache()
    val expectFailed = dayUrls.count(failUrls.contains).toLong
    assert(failed.count() === expectFailed)
    val out = spark.read.parquet(s"$tmp/v0.1/$cid")
    assert(out.count() === dayUrls.length - expectFailed)
    assert(out.columns.contains("geometry"))
  }

  test("stac link extraction: first protocol match, malformed rows skipped") {
    val dir = Files.createTempDirectory("graft-cmr-links").toString
    CmrSource.spoolTo(spark, new FakeCmr(total = 7), dir, pageSize = 3)
    val links = CmrSource.stacJsonLinks(CmrSource.entries(spark, dir))
    val rows = links.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length === 7)
    assert(rows.forall { case (id, l) =>
      l.startsWith("https") && l.endsWith("stac.json") })
    // s3 protocol selects the s3 variant instead
    val s3 = CmrSource.stacJsonLinks(CmrSource.entries(spark, dir), "s3")
    assert(s3.count() === 7)
    assert(s3.head().getString(1).startsWith("s3://"))
    // linkless and malformed entries are skipped, not failures
    val weird = Seq(
      """{"id": "A", "links": "not-a-list"}""",
      """{"id": "B"}""",
      """not json""",
      """{"id": "C", "links": [{"href": "https://ex.com/c_stac.json"}]}""")
      .toDF("entry_json")
    val ok = CmrSource.stacJsonLinks(weird).collect()
    assert(ok.map(_.getString(0)).toSeq === Seq("C"))
  }
}
