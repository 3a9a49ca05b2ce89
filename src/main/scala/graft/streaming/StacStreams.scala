package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.stac.StacSynth

/** Streaming variants of the STAC catalog pipeline: the reference's
  * daily-link cache treats CMR as a feed polled day by day
  * (links.py:61-117 + the Lambda publisher); here the catalog IS a
  * stream and the daily cache is a continuously maintained streaming
  * aggregate — the same `StacSynth.catalogFrom` transform runs over a
  * `readStream` source because every derived column is a
  * deterministic scalar expression.
  */
object StacStreams {

  private def catalogStream(spark: SparkSession, dir: String): DataFrame =
    StacSynth.catalogFrom(
      spark.readStream
        .schema(EventStreams.ordersSchema)
        .option("pathGlobFilter", "orders*.parquet")
        .parquet(dir))

  /** G7 — streaming daily-link maintenance: per-(collection, day) link
    * counts over the catalog stream, run to completion against the
    * static fixture so the batch A5 rollup is the oracle. At scale the
    * same plan tails a live feed with a watermark bounding state and
    * appends finalized days to the partitioned cache — replacing the
    * reference's poll-and-rewrite day files with an incremental
    * aggregate that never revisits history.
    */
  def dailyLinkCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = catalogStream(spark, dir)
      .groupBy($"collection", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_links"))
    EventStreams.runToCompletion(agg, "graft_stream_stac")
      .orderBy($"collection", $"day")
  }

  /** G10 — streaming catalog upsert: A25's latest-version-wins merge
    * as a continuously maintained aggregate. The reprocessing delta
    * stream unions with the base catalog stream (both derive from the
    * same source; every column is a scalar expression, so the batch
    * plan runs unchanged under the streaming engine) and the SAME
    * partial-aggregable `max(struct(ts, version, payload))` argmax
    * keeps each granule's newest version — state is one struct per
    * granule, updated in place as reprocessed versions arrive. Run to
    * completion against the static fixture, the batch A25 SQL is the
    * oracle; on a live feed the same plan IS the catalog's serving
    * state.
    */
  def upsertLatest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one source scan: a self-union of the stream would register TWO
    // file sources and plan/scan the catalog twice per batch — the
    // reprocessing delta is a pure function of the row, so each
    // granule EXPLODES to its 1–2 version rows in a stateless
    // projection instead (same rows as the v2.0 ∪ v2.1 union)
    val cat = catalogStream(spark, dir)
      .select($"granule_id", $"ts", $"cloud_cover")
    val merged = cat
      .select($"granule_id", explode(when($"granule_id" % 7 === 0,
        array(struct($"ts", lit("2.0").as("version"), $"cloud_cover"),
          struct(($"ts" + expr("INTERVAL 1 HOUR")).as("ts"),
            lit("2.1").as("version"), $"cloud_cover")))
        .otherwise(array(
          struct($"ts", lit("2.0").as("version"), $"cloud_cover"))))
        .as("v"))
      .groupBy($"granule_id")
      .agg(max(struct($"v.ts".as("ts"), $"v.version".as("version"),
        $"v.cloud_cover".as("cloud_cover"))).as("s"))
    EventStreams.runToCompletion(merged, "graft_stream_upsert")
      .select($"granule_id", $"s.version".as("version"), $"s.ts".as("ts"),
        $"s.cloud_cover".as("cloud_cover"))
      .orderBy($"granule_id")
  }

  /** G9 — streaming fetch: the link stream drives the A20 fetch
    * operator per micro-batch through `foreachBatch` (the sanctioned
    * hook for running an arbitrary batch transform inside a stream),
    * writing parsed items and failed links to their sinks. This is
    * continuous ingest: as new daily link caches land, their items
    * are fetched with the same bounded-concurrency/netloc-reuse/
    * failure-separation semantics as the batch path — the streaming
    * complement of `StacPipeline.fetchAndWriteMonthly`.
    *
    * Exactly-once to the sink: each micro-batch lands under its own
    * `batch_id=` partition via dynamic partition OVERWRITE, so a batch
    * replayed after a mid-write failure replaces its own partition
    * instead of appending duplicates (foreachBatch alone is only
    * at-least-once). The fetch itself may re-run on replay — fetches
    * are idempotent reads, the reference re-gets on retry too.
    */
  def fetchLinkStream(links: DataFrame, urlCol: String,
                      transport: graft.stac.StacFetch.Transport,
                      itemsPath: String, failedPath: String,
                      maxConcurrent: Int = 50): Unit = {
    val q = links.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.stac.StacFetch.fetchItemsScoped(batch, urlCol, transport,
          maxConcurrent) { (items, failed) =>
          def writeIdempotent(df: DataFrame, path: String): Unit =
            df.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(path)
          writeIdempotent(items, itemsPath)
          writeIdempotent(failed, failedPath)
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  val oracles: Map[String, String] = Map(
    "stream_stac_daily" -> (StacSynth.sqlCte +
      """SELECT collection, CAST(ts AS DATE) AS day, count(*) AS n_links
        |FROM stac GROUP BY collection, CAST(ts AS DATE)
        |ORDER BY collection, day""".stripMargin),
    // the batch A25 formulation IS the oracle — the stream must
    // converge to the same merged catalog
    "stream_upsert_latest" -> (StacSynth.sqlCte +
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
        |FROM r WHERE rn = 1 ORDER BY granule_id""".stripMargin))
}
