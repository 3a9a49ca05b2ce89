package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, with the decode step STUBBED (no image/audio codecs in
  * this environment — see `decodeStub`). The Spark-side mechanics are
  * real: binary columns, metadata structs, and batched per-partition
  * decoding via mapPartitions (the Scala analogue of mapInPandas:
  * the iterator is consumed in fixed-size batches so a real decoder
  * would amortize model/codec setup per batch, not per row).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String,
                            n_bytes: Long, payload: Array[Byte])
  final case class MediaFeature(doc_id: Long, media_type: String,
                                n_bytes: Long, feature_dim: Int,
                                feature_norm: Double)

  /** Attach a deterministic fake binary payload (UTF-8 of the text —
    * stands in for image/audio bytes) + metadata.
    */
  def withMedia(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .withColumn("payload", encode($"text", "UTF-8"))
      .withColumn("media_type",
        element_at(array(lit("image/png"), lit("audio/wav"),
          lit("video/mp4")), ($"doc_id" % 3 + 1).cast("int")))
      .withColumn("n_bytes", octet_length($"payload").cast("long"))
  }

  /** STUB decoder: a real implementation would decode the payload
    * (image decode / audio PCM / frame sampling) — unavailable here,
    * so it emits a deterministic fake feature. The batching shape is
    * the real contract: grouped(batchSize) per partition.
    */
  def decodeStub(spark: SparkSession, dir: String,
                 batchSize: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    withMedia(spark, dir)
      .select($"doc_id", $"media_type", $"n_bytes", $"payload")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup would happen here (codec init, model load)
          batch.map { r =>
            val fakeFeature = r.payload.iterator.map(b => (b & 0xff).toDouble)
              .take(16).toArray
            MediaFeature(r.doc_id, r.media_type, r.n_bytes,
              fakeFeature.length,
              math.sqrt(fakeFeature.map(x => x * x).sum))
          }
        }
      }
  }

  /** F1 — metadata + payload introspection query (binary semantics
    * exercised portably: octet length, header bytes, content hash).
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withMedia(spark, dir)
      .select($"doc_id", $"media_type", $"n_bytes",
        hex(substring($"payload", 1, 8)).as("header_hex"),
        md5($"payload").as("content_hash"))
      .orderBy($"doc_id")
  }

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
        |    ELSE 'video/mp4' END AS media_type,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  hex(encode(substring(text, 1, 8))) AS header_hex,
        |  md5(text) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin)
}
