package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Resilient text-corpus ingestion sources.
  *
  * JSONL is the interchange format of web-scale text corpora, and at
  * 100 TB two things are non-negotiable: the schema is EXPLICIT (a
  * schema-inference pass would read the corpus twice), and malformed
  * lines are ACCOUNTED, not fatal (a crawler shard with a truncated
  * record must not kill a month-long ingest) — the same
  * failures-as-rows stance as the A12/A20 fetch pipeline.
  */
object TextSources {

  /** documents-table schema + the corrupt-record capture column. */
  val documentsJsonlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** Read a JSONL documents corpus: (parsed rows, rejected lines).
    *
    * PERMISSIVE mode routes each malformed line into `_corrupt_record`
    * instead of failing the task; rows where it is null parsed fully.
    * Valid JSON that lacks the `doc_id` key is ALSO rejected (the
    * corpus contract requires it), re-serialized so the rejected side
    * still carries a raw line — good.count + bad.count covers every
    * input line, which is what "accounted, not fatal" means. The
    * split is one cached scan — the rejected side is typically
    * ~0 rows, and Spark disallows projecting ONLY the corrupt column
    * without materialization, so the cache is also correctness.
    */
  def readDocumentsJsonl(spark: SparkSession,
                         path: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, struct, to_json}
    val raw = spark.read
      .schema(documentsJsonlSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val good = raw.filter($"_corrupt_record".isNull &&
        $"doc_id".isNotNull)
      .drop("_corrupt_record")
    val bad = raw.filter($"_corrupt_record".isNotNull ||
        $"doc_id".isNull)
      .select(coalesce($"_corrupt_record",
        to_json(struct($"text", $"lang", $"source", $"n_chars")))
        .as("raw_line"))
    (good, bad)
  }
}
