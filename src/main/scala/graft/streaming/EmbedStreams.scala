package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Similarity

/** Streaming similarity operators: offline-trained index artifacts
  * applied to a live embedding stream.
  */
object EmbedStreams {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** G13 — streaming nearest-centroid assignment: the per-label
    * centroid table (D4's offline artifact, ≤ labels×dims values)
    * folded into a stateless streaming projection over the embedding
    * stream — the "train offline, assign online" split an ingest-time
    * router runs in production (the same shape IVF cell assignment
    * takes in a live indexing pipeline). Zero streaming state: each
    * micro-batch maps through the broadcast-literal centroids; the
    * batch assignment SQL is the oracle, so streamed ≡ batch exactly.
    */
  def centroidAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = Similarity.collectedCentroids(spark, dir)
    val stream = spark.readStream
      .schema(embSchema)
      .option("pathGlobFilter", "embeddings*.parquet")
      .parquet(dir)
      .withColumn("v", transform($"embedding", x => x.cast("double")))
      .select($"vec_id", $"v")
    EventStreams.runToCompletion(
      Similarity.assignToCentroids(stream, cents),
      "graft_stream_centroid", mode = "append")
      .orderBy($"vec_id")
  }

  val oracles: Map[String, String] = Map(
    "stream_centroid_assign" -> Similarity.centroidAssignOracle)
}
