package graft.stac

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CMR paged-source model (reference: cmr_api.py:43–72) — the
  * `cmr-search-after` protocol as a resumable Spark source.
  *
  * The protocol is inherently sequential: each response carries the
  * opaque token that addresses the next page, so ONE query's pages
  * cannot be fetched in parallel. The scale design is therefore:
  *
  *   - page loop on the driver, each page durably spooled (one file
  *     per page + the token committed AFTER the page lands), so a
  *     crashed sweep resumes mid-stream from the last committed token
  *     instead of restarting — the paging loop is a checkpointed
  *     iterator;
  *   - parallelism comes from ABOVE the loop: the reference fans out
  *     one query per collection×day (batch_publisher.py feeding
  *     links.py), and each of those independent sweeps spools
  *     concurrently;
  *   - downstream is ordinary Spark: [[entries]] reads the spool as a
  *     DataFrame and [[stacJsonLinks]] re-expresses
  *     `extract_stac_json_links` (cmr_api.py:74–103) as a declarative
  *     transform.
  *
  * The HTTP transport is injected (zero egress here); the real
  * implementation is a GET with the `cmr-search-after` header
  * (cmr_api.py:60–71).
  */
object CmrSource {

  /** Page-size clamp, `min(max(1, page_size), 2000)` (cmr_api.py:56). */
  def clampPageSize(pageSize: Int): Int = math.min(math.max(1, pageSize), 2000)

  /** One page: entry JSON documents + the token for the next page
    * (None ⇔ last page — the absent `cmr-search-after` response
    * header, cmr_api.py:68-69).
    */
  final case class Page(entries: Seq[String], searchAfter: Option[String])

  /** The injected protocol step: fetch one page. `searchAfter` is the
    * token from the previous page (absent on the first request).
    */
  trait PageFetcher extends Serializable {
    def fetch(pageSize: Int, searchAfter: Option[String]): Page
  }

  final case class SpoolResult(pagesFetched: Int, newEntries: Long,
                               complete: Boolean)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(spark: SparkSession, p: Path): Option[String] = {
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  private def writeSmall(spark: SparkSession, p: Path, s: String): Unit = {
    val f = fs(spark, p)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // atomic rename-overwrite where the FS supports it (posix local,
    // HDFS via FileContext) — a delete-then-rename window would lose
    // the resume state on a crash between the two ops
    try {
      org.apache.hadoop.fs.FileContext
        .getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        // object-store fallback: non-atomic, but the worst case is an
        // orphaned tmp or a lost state file — both recovered by the
        // stale-page sweep in spoolTo, never a skipped page
        if (f.exists(p)) f.delete(p, false)
        if (!f.rename(tmp, p))
          throw new java.io.IOException(s"rename $tmp -> $p failed")
    }
  }

  /** Run the token loop, spooling each page under `dir` as
    * `page-NNNNNN.jsonl` (one entry per line). The token file is
    * committed only after its page file is fully written, so a crash
    * between the two re-fetches at most one page and never skips one.
    * `maxPages` bounds this sweep (resume later); a completed sweep
    * writes `_COMPLETE` and further calls are no-ops.
    */
  def spoolTo(spark: SparkSession, fetcher: PageFetcher, dir: String,
              pageSize: Int = 2000, maxPages: Int = Int.MaxValue): SpoolResult = {
    val ps = clampPageSize(pageSize)
    val root = new Path(dir)
    val f = fs(spark, root)
    f.mkdirs(root)
    if (f.exists(new Path(root, "_COMPLETE")))
      return SpoolResult(0, 0L, complete = true)

    // resume state: (next page index, token from the last landed page)
    val state = readSmall(spark, new Path(root, "_search_after"))
      .map(_.split("\n", 2))
    var pageNo = state.map(_(0).toInt).getOrElse(0)
    var token: Option[String] = state.flatMap(_.lift(1)).filter(_.nonEmpty)

    // stale-page sweep: page files at/after the resume point are
    // leftovers of a sweep whose state was lost or rolled back — if
    // this (re)start yields fewer pages they would survive and
    // duplicate rows in entries(), so they go first
    val PageRe = "page-(\\d{6})\\.jsonl".r
    val stat = f.listStatus(root)
    stat.map(_.getPath).foreach { p =>
      p.getName match {
        case PageRe(idx) if idx.toInt >= pageNo => f.delete(p, false)
        case _ =>
      }
    }

    var pages = 0
    var rows = 0L
    var done = false
    while (!done && pages < maxPages) {
      val page = fetcher.fetch(ps, token)
      writeSmall(spark, new Path(root, f"page-$pageNo%06d.jsonl"),
        page.entries.mkString("", "\n", "\n"))
      pageNo += 1
      pages += 1
      rows += page.entries.size
      token = page.searchAfter
      token match {
        case Some(t) =>
          writeSmall(spark, new Path(root, "_search_after"), s"$pageNo\n$t")
        case None =>
          writeSmall(spark, new Path(root, "_COMPLETE"), "")
          f.delete(new Path(root, "_search_after"), false)
          done = true
      }
    }
    SpoolResult(pages, rows, done)
  }

  /** The spooled sweep as a DataFrame of raw entry JSON (splittable:
    * one task per page file; at full-archive scale pages spread over
    * the cluster like any other text source).
    */
  def entries(spark: SparkSession, dir: String): DataFrame =
    spark.read.textFile(s"$dir/page-*.jsonl").toDF("entry_json")

  /** `extract_stac_json_links` (cmr_api.py:74–103) declaratively: the
    * FIRST link whose href starts with `protocol` and ends with
    * `stac.json`; entries with no links array or no matching href are
    * skipped, malformed JSON parses to null and is skipped too.
    */
  def stacJsonLinks(entriesDf: DataFrame, protocol: String = "https"): DataFrame = {
    val spark = entriesDf.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("links", ArrayType(StructType(Seq(
        StructField("href", StringType)))))))
    entriesDf
      .withColumn("e", from_json($"entry_json", schema))
      .withColumn("stac_link", graft.functions.first_link(
        filter($"e.links.href", h => h.isNotNull), protocol, "stac.json"))
      .filter($"stac_link".isNotNull)
      .select($"e.id".as("granule_ur"), $"stac_link")
  }
}
