package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TextAnalysis

/** Streaming text-analysis operators: sketches maintained
  * incrementally over a document stream.
  */
object TextStreams {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** G8 — streaming count-min sketch: the E19 counter grid as a
    * continuously maintained streaming aggregate over the document
    * stream. The grid IS the streaming state — d×w cells regardless of
    * stream length (the whole point of a sketch as stream state), and
    * the same HUGEINT SQL that proves E19 bit-exact proves the
    * streamed grid equals the batch grid.
    */
  def cmsCounters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val agg = docs
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .select(posexplode(TextAnalysis.cmsBuckets($"token"))
        .as(Seq("r", "bucket")))
      .groupBy($"r", $"bucket").agg(count(lit(1)).as("c"))
    EventStreams.runToCompletion(agg, "graft_stream_cms")
      .select($"r".cast("long").as("r"), $"bucket", $"c")
      .orderBy($"r", $"bucket")
  }

  /** G11 — streaming importance scoring: H11's trained per-bucket
    * log-ratio table (an offline artifact, ≤256 rows) broadcast onto a
    * live document stream — the production "train offline, score
    * online" split for DSIR-style data selection at ingest time. The
    * stream side is a stateless projection + per-doc aggregate; state
    * is per-doc partial sums, never the corpus. Batch H11 (and its
    * DuckDB oracle) is the equality check.
    */
  def importanceScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val batchBg = graft.ops.Curation.bigramBuckets(
      graft.Tables.load(spark, dir, "documents"))
    val ratio = graft.ops.Curation.bucketLogRatio(batchBg, "en", 256)
    val docs = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val scored = graft.ops.Curation.bigramBuckets(docs)
      .join(broadcast(ratio), "b")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), avg($"lr").as("mlr"))
    EventStreams.runToCompletion(scored, "graft_stream_importance")
      .select($"doc_id", $"n_bigrams",
        (floor($"mlr" * 1000000.0 + 0.5).cast("double") / 1000000.0)
          .as("weight"))
      .orderBy($"doc_id")
  }

  /** G14 — streaming Gopher-rule gate: E28's hard quality filter as a
    * STATELESS stream projection (the per-row fold variant — the
    * explode→groupBy batch plan would need chained streaming
    * aggregations, which the engine rejects). This is the ingest-time
    * placement production pipelines actually use: score and gate each
    * document as it arrives, no state, unbounded throughput. The batch
    * E28 SQL is the oracle, so streamed ≡ batch exactly.
    */
  def gopherFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    EventStreams.runToCompletion(
      TextAnalysis.gopherRulesOn(docs), "graft_stream_gopher",
      mode = "append")
      .orderBy($"doc_id")
  }

  val oracles: Map[String, String] = Map(
    "stream_gopher_filter" -> TextAnalysis.oracles("text_gopher_rules"),
    "stream_importance" -> graft.ops.Curation.oracles("importance_weights"),
    "stream_cms_counters" -> (TextAnalysis.cmsBkCte +
      """SELECT CAST(r AS BIGINT) AS r, bucket, c FROM counters
        |ORDER BY r, bucket""".stripMargin))
}
