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

  val oracles: Map[String, String] = Map(
    "stream_cms_counters" -> (TextAnalysis.cmsBkCte +
      """SELECT CAST(r AS BIGINT) AS r, bucket, c FROM counters
        |ORDER BY r, bucket""".stripMargin))
}
