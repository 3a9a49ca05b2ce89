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

  /** F2 — frame sampling: explode each video payload into fixed-size
    * frame chunks (first 4), with per-frame offset + content hash —
    * the row-multiplying shape a video pipeline feeds to a decoder.
    * Declarative (sequence + substring), so it carries a full oracle;
    * the imperative batched variant lives in [[decodeStub]].
    */
  def sampleFrames(spark: SparkSession, dir: String,
                   frameBytes: Int = 256, maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    withMedia(spark, dir)
      .filter($"media_type" === "video/mp4")
      .withColumn("frame_idx", explode(sequence(lit(0),
        least(floor(($"n_bytes" - 1) / frameBytes).cast("int"),
          lit(maxFrames - 1)))))
      .withColumn("byte_offset", ($"frame_idx" * frameBytes).cast("long"))
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        $"byte_offset",
        expr(s"md5(substring(payload, frame_idx * $frameBytes + 1, " +
          s"$frameBytes))").as("frame_hash"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** F7 — cross-video duplicate-frame detection: F2's frame hashes
    * grouped corpus-wide; any hash appearing in MORE than one video is
    * shared content (intros, watermark cards, re-uploads) — the
    * frame-granular dedup signal file-level hashing (F6) can't see.
    * One frame explode (the F2 shape) + one hash-keyed
    * partial-aggregable groupBy — content-linear, the C1 exact-dedup
    * shape applied at frame granularity.
    */
  def frameDupes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(spark, dir)
      .groupBy($"frame_hash")
      .agg(count(lit(1)).as("n_frames"),
        countDistinct($"doc_id").as("n_videos"),
        min($"doc_id").as("first_doc"))
      .filter($"n_videos" > 1)
      .orderBy($"n_frames".desc, $"frame_hash")
  }

  /** F3 — resize planning (the metadata half of an image-resize
    * stage): source dimensions come from the STUB decode (derived
    * deterministically from doc_id — a real decoder would read them
    * from the payload header), the aspect-preserving fit to a max
    * edge is exact integer math (w·maxEdge DIV longest), and the
    * output-byte estimate is what a downstream batcher packs against.
    * Pure projection — one scan, no shuffle before the sort; the
    * decode boundary is the only stubbed step, exactly as F1/F2.
    */
  def resizePlan(spark: SparkSession, dir: String,
                 maxEdge: Int = 512): DataFrame = {
    import spark.implicits._
    withMedia(spark, dir)
      .filter($"media_type" === "image/png")
      .withColumn("width", lit(64) + ($"doc_id" * 37) % 1920)
      .withColumn("height", lit(64) + ($"doc_id" * 53) % 1080)
      .withColumn("longest", greatest($"width", $"height"))
      .withColumn("out_w", when($"longest" <= maxEdge, $"width")
        .otherwise(expr(s"width * $maxEdge DIV longest")))
      .withColumn("out_h", when($"longest" <= maxEdge, $"height")
        .otherwise(expr(s"height * $maxEdge DIV longest")))
      .select($"doc_id", $"width", $"height", $"out_w", $"out_h",
        ($"out_w" * $"out_h" * 3).as("out_bytes"))
      .orderBy($"doc_id")
  }

  /** F6 — multimodal token-budget planner: estimated model-input
    * tokens per modality — the number a multimodal training run
    * budgets against (batch shapes, step counts, mixing ratios are
    * all denominated in tokens, not bytes). Exact integer rules per
    * modality, each the standard estimator shape: images cost
    * ceil(h/16)·ceil(w/16) patches of the F3 resize-planned output;
    * videos cost sampled-frames × a fixed 224² frame's 14² patches
    * (the F2 sampling rule); audio costs one token per 320 payload
    * bytes (a frame-hop proxy). Share of the corpus budget
    * floor-rounds at 6dp on both engines.
    *
    * Scale shape: pure scan-side projection (the dims/frame-count
    * rules are metadata arithmetic; a real pipeline reads them from
    * headers in the same projection) + ONE partial-aggregable
    * modality rollup; the share window runs over the modalities-sized
    * frame. The corpus never shuffles.
    */
  def tokenBudget(spark: SparkSession, dir: String,
                  maxEdge: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val all = Window.partitionBy()
    val perDoc = withMedia(spark, dir)
      .withColumn("width", lit(64) + ($"doc_id" * 37) % 1920)
      .withColumn("height", lit(64) + ($"doc_id" * 53) % 1080)
      .withColumn("longest", greatest($"width", $"height"))
      .withColumn("out_w", when($"longest" <= maxEdge, $"width")
        .otherwise(expr(s"width * $maxEdge DIV longest")))
      .withColumn("out_h", when($"longest" <= maxEdge, $"height")
        .otherwise(expr(s"height * $maxEdge DIV longest")))
      .withColumn("est_tokens",
        when($"media_type" === "image/png",
          expr("((out_w + 15) DIV 16) * ((out_h + 15) DIV 16)"))
          .when($"media_type" === "video/mp4",
            (least(expr("(n_bytes - 1) DIV 256"), lit(3L)) + 1L) * 196L)
          .otherwise(expr("(n_bytes + 319) DIV 320")))
    perDoc.groupBy($"media_type")
      .agg(count(lit(1)).as("n_docs"),
        sum($"est_tokens").as("total_tokens"),
        max($"est_tokens").as("max_doc_tokens"))
      .withColumn("token_share",
        floor($"total_tokens" / sum($"total_tokens").over(all)
          * 1000000.0 + 0.5) / 1000000.0)
      .orderBy($"media_type")
  }

  /** F4 — shard packing (webdataset-style export planning): each
    * modality's payloads pack contiguously in doc_id order into
    * ~`shardBytes` shards; a doc belongs to the shard its STARTING
    * byte offset falls in (exact integer rule any engine re-derives).
    *
    * Scale shape: the per-type running byte offset uses the H7/H8
    * bucketed-offset trick — ≤64 doc_id-range buckets per type
    * (bucket width derived from max doc_id, so the broadcast offsets
    * frame is O(types×64) at ANY corpus size), per-bucket windows +
    * broadcast bucket offsets compose the exact global cumsum; no
    * single-partition window anywhere. Output is shard-count-sized.
    */
  def shardPack(spark: SparkSession, dir: String,
                shardBytes: Long = 16384): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val media = withMedia(spark, dir)
      .select($"doc_id", $"media_type", $"n_bytes")
    val maxIdRow = media.agg(max($"doc_id")).head()
    if (maxIdRow.isNullAt(0))  // empty corpus: no shards
      return Seq.empty[(String, Long, Long, Long, Long, Long)]
        .toDF("media_type", "shard_id", "n_docs", "shard_bytes",
          "first_doc", "last_doc")
    val maxId = maxIdRow.getLong(0)
    val width = math.max(1L, (maxId + 64) / 64)
    val b = media.withColumn("bkt", floor($"doc_id" / width).cast("int"))
    val offsets = b.groupBy($"media_type", $"bkt")
      .agg(sum($"n_bytes").as("bb"))
      .withColumn("offset", coalesce(
        sum($"bb").over(Window.partitionBy($"media_type").orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"media_type", $"bkt", $"offset")
    val w = Window.partitionBy($"media_type", $"bkt").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offsets), Seq("media_type", "bkt"))
      .withColumn("cum", sum($"n_bytes").over(w) + $"offset")
      .withColumn("shard_id",
        expr(s"CAST((cum - n_bytes) DIV $shardBytes AS BIGINT)"))
      .groupBy($"media_type", $"shard_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_bytes").as("shard_bytes"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"media_type", $"shard_id")
  }

  /** F5 — two-stage binary media dedup, signature → verify: candidate
    * duplicate groups blocked on a CHEAP per-payload signature (a real
    * pipeline uses a perceptual hash of the decoded content; the
    * decode being stubbed like F1–F4, the signature is the md5 of the
    * leading `chunkBytes` — near-dup payloads share it, byte-exact
    * full-hash grouping finds nothing on this corpus), then the
    * verify stat: distinct FULL payload hashes per group (1 = exact
    * copies, >1 = near-dups needing content-level compare). Keeper =
    * min doc_id; only actual collision groups are emitted — the
    * removal worklist.
    *
    * Scale shape: both hashes are scan-side projections on the binary
    * column; one partial-aggregable (media_type, signature) groupBy —
    * corpus-linear, payloads never shuffle (only 16-byte hashes do).
    */
  def mediaDedup(spark: SparkSession, dir: String,
                 chunkBytes: Int = 128): DataFrame = {
    import spark.implicits._
    withMedia(spark, dir)
      .withColumn("sig", md5(substring($"payload", 1, chunkBytes)))
      .withColumn("full_hash", md5($"payload"))
      .groupBy($"media_type", $"sig")
      .agg(count(lit(1)).as("n_copies"),
        min($"doc_id").as("keeper_id"),
        countDistinct($"full_hash").as("n_distinct_payloads"))
      .filter($"n_copies" > 1)
      .orderBy($"media_type", $"sig")
  }

  /** F9 — modality-interleaved shard plan: F4 packs each modality
    * contiguously by byte budget; a MULTIMODAL training run instead
    * needs every shard to carry the same modality mix, or data
    * loaders starve one tower while another hoards (the
    * batch-composition twin of H9's source mixing). Each type's docs
    * get an exact global rank (H7 bucketed offsets — ≤64 doc_id-range
    * buckets per type, per-bucket row_number + broadcast cumulative
    * offsets; no corpus-wide window) and land in shard (rank−1) mod
    * nShards — round-robin, so per-shard type counts differ by ≤1 BY
    * CONSTRUCTION (the spec-visible invariant `max_type_docs −
    * min_type_docs ≤ 1`). Output is shard-count-sized.
    */
  def interleaveShards(spark: SparkSession, dir: String,
                       nShards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val media = withMedia(spark, dir)
      .select($"doc_id", $"media_type", $"n_bytes")
    val maxIdRow = media.agg(max($"doc_id")).head()
    if (maxIdRow.isNullAt(0))  // empty corpus: no shards
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("shard_id", "n_docs", "n_bytes", "n_types",
          "min_type_docs", "max_type_docs")
    val maxId = maxIdRow.getLong(0)
    val width = math.max(1L, (maxId + 64) / 64)
    val b = media.withColumn("bkt", floor($"doc_id" / width).cast("int"))
    val offsets = b.groupBy($"media_type", $"bkt")
      .agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum($"c").over(Window.partitionBy($"media_type").orderBy($"bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"media_type", $"bkt", $"off")
    val w = Window.partitionBy($"media_type", $"bkt").orderBy($"doc_id")
    val perType = b.join(broadcast(offsets), Seq("media_type", "bkt"))
      .withColumn("rnk", row_number().over(w).cast("long") + $"off")
      .withColumn("shard_id", ($"rnk" - 1) % nShards)
    perType.groupBy($"shard_id", $"media_type")
      .agg(count(lit(1)).as("td"), sum($"n_bytes").as("tb"))
      .groupBy($"shard_id")
      .agg(sum($"td").as("n_docs"), sum($"tb").as("n_bytes"),
        count(lit(1)).as("n_types"),
        min($"td").as("min_type_docs"), max($"td").as("max_type_docs"))
      .orderBy($"shard_id")
  }

  /** F8 — content-defined chunking (CDC) dedup report: the
    * storage-system dedup metric for binary payloads. Fixed-offset
    * chunking (F5's signature) misses a duplicate region the moment
    * one byte shifts it; CDC cuts where a CONTENT window hash hits a
    * mask (here: 8-byte window hash ≡ 0 mod 32 ⇒ ~32-byte expected
    * chunks), so shared runs chunk identically wherever they sit.
    * Per media type: chunk count, distinct-chunk count, total vs
    * unique bytes and the dedup ratio — the "how much smaller is the
    * chunk store?" number that decides whether a media corpus gets a
    * CAS layout.
    *
    * Scale shape: the position explode is the E-block shingle
    * discipline (corpus×bytes rows, all pipelined); the boundary
    * test is pure per-position (no sequential min/max constraint —
    * deliberately, so chunking parallelizes and the oracle can
    * re-derive it in closed form); the only windows are per-document
    * (bounded by payload size); the store rollup is a (type, hash)
    * partial agg.
    */
  def mediaCdcDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = withMedia(spark, dir)
      .select($"doc_id", $"media_type", $"text", $"n_chars")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"i")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val chunks = docs
      .select($"doc_id", $"media_type", $"text", $"n_chars",
        explode(sequence(lit(1L), $"n_chars")).as("i"))
      // md5 of the 8-char window decides the cut — content-defined
      .withColumn("b",
        ($"i" === 1L) || ($"i" + 7L <= $"n_chars" &&
          conv(substring(md5(expr("substring(text, i, 8)")
            .cast("binary")), 1, 12), 16, 10).cast("long") % 32 === 0))
      .withColumn("chunk_id", sum($"b".cast("long")).over(w))
      .groupBy($"doc_id", $"media_type", $"chunk_id")
      // text is functionally dependent on doc_id: carrying it through
      // first() spares a corpus join back to the docs frame
      .agg(min($"i").as("st"), count(lit(1)).as("len"),
        first($"text").as("text"))
      .select($"media_type", $"len",
        md5(expr("substring(text, st, len)").cast("binary")).as("h"))
    val store = chunks.groupBy($"media_type", $"h")
      .agg(min($"len").as("len"))
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n_distinct_chunks"),
        sum($"len").as("unique_bytes"))
    chunks.groupBy($"media_type")
      .agg(count(lit(1)).as("n_chunks"), sum($"len").as("total_bytes"))
      .join(store, "media_type")
      .select($"media_type", $"n_chunks", $"n_distinct_chunks",
        $"total_bytes", $"unique_bytes",
        (floor($"unique_bytes".cast("double") / $"total_bytes"
          * 1000000.0 + 0.5) / 1000000.0).as("dedup_ratio"),
        (floor($"total_bytes".cast("double") / $"n_chunks"
          * 10000.0 + 0.5) / 10000.0).as("avg_chunk_bytes"))
      .orderBy($"media_type")
  }

  /** F10 — modality co-occurrence matrix: for every unordered
    * modality pair, how many documents carry BOTH (diagonal rows =
    * docs carrying the type at all). The batch-composition input F9's
    * interleaver needs one level up: F9 balances SINGLE-modality rows
    * across shards, but a loader feeding a multi-tower model batches
    * by the attachment SET — co-occurrence says which towers co-fire
    * and how often, i.e. whether image+audio batches exist at all or
    * the corpus is effectively unimodal. Attachment sets are the
    * deterministic synth extension of `withMedia` (primary type by
    * doc_id%3, +audio for doc_id%5<2, +video for doc_id%7=0 — same
    * stub-decode boundary as F1–F8).
    *
    * Scale shape: the per-doc set explodes to ≤3 typed rows; the
    * pair join is doc_id-keyed (≤9 pairs per doc, corpus-linear);
    * output is modality²-bounded. Payloads never move — only doc_id
    * and a short string.
    */
  def cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = withMedia(spark, dir)
      .select($"doc_id", explode(array_distinct(filter(array(
        $"media_type",
        when($"doc_id" % 5 < 2, lit("audio/wav")),
        when($"doc_id" % 7 === 0, lit("video/mp4"))),
        x => x.isNotNull))).as("t"))
    m.as("a").join(m.as("b"),
        $"a.doc_id" === $"b.doc_id" && $"a.t" <= $"b.t")
      .groupBy($"a.t".as("modality_a"), $"b.t".as("modality_b"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"modality_a", $"modality_b")
  }

  /** F11 — payload byte-entropy triage: Shannon entropy of each
    * binary payload's BYTE distribution — the pre-decode storage-QA
    * gate that catches what no codec ever sees: near-zero entropy =
    * constant filler / truncated writes, entropy ≈ 8 bits on a
    * payload that should be raw PCM/bitmap = double-compressed or
    * encrypted bytes mislabeled as media. Runs on the opaque binary
    * column itself via [[graft.expressions.ByteLogUnits]] — one
    * codegen'd pass per payload, 256-counter stack histogram,
    * per-byte-value ln-contributions floored to integer 1e-9 units
    * INSIDE the expression (the E15 discipline), so the corpus-side
    * arithmetic is exact Longs and the bits conversion is one shared
    * double chain. (Oracle equivalence uses payload = UTF-8 text, so
    * byte counts equal char counts on the ASCII corpus; the operator
    * itself is pure binary.)
    */
  def payloadEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withMedia(spark, dir)
      .select($"doc_id", $"media_type", $"n_bytes",
        graft.functions.byte_log_units($"payload").as("units"))
      .select($"doc_id", $"media_type", $"n_bytes",
        when($"n_bytes" > 0,
          floor((log($"n_bytes".cast("double"))
            - $"units".cast("double") / 1000000000.0 / $"n_bytes")
            / log(lit(2.0)) * 1000000.0 + 0.5).cast("double")
            / 1000000.0).as("entropy_bits"))
      .withColumn("suspicious",
        when($"entropy_bits".isNotNull,
          $"entropy_bits" < 1.0 || $"entropy_bits" > 7.5))
      .orderBy($"doc_id")
  }

  val oracles: Map[String, String] = Map(
    "multimodal_payload_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |cc AS (
        |  SELECT doc_id, ch, count(*) AS c FROM c GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bytes,
        |    sum(CAST(floor(c::DOUBLE * ln(c::DOUBLE)
        |      * 1000000000.0 + 0.5) AS HUGEINT)) AS units
        |  FROM cc GROUP BY 1),
        |e AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image/png'
        |      WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END
        |      AS media_type,
        |    n_bytes,
        |    CASE WHEN n_bytes > 0 THEN
        |      floor((ln(n_bytes::DOUBLE)
        |        - units::DOUBLE / 1000000000.0 / n_bytes) / ln(2.0)
        |        * 1000000.0 + 0.5) / 1000000.0 END AS entropy_bits
        |  FROM agg)
        |SELECT doc_id, media_type, n_bytes, entropy_bits,
        |  CASE WHEN entropy_bits IS NOT NULL THEN
        |    entropy_bits < 1.0 OR entropy_bits > 7.5 END AS suspicious
        |FROM e ORDER BY doc_id""".stripMargin,
    "multimodal_cooccurrence" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    ['image/png','audio/wav','video/mp4'][(doc_id % 3 + 1)::INT]
        |      AS prim
        |  FROM documents),
        |m AS (
        |  SELECT DISTINCT doc_id, t FROM (
        |    SELECT doc_id, prim AS t FROM s
        |    UNION ALL
        |    SELECT doc_id, 'audio/wav' AS t FROM s WHERE doc_id % 5 < 2
        |    UNION ALL
        |    SELECT doc_id, 'video/mp4' AS t FROM s WHERE doc_id % 7 = 0
        |  ) u)
        |SELECT a.t AS modality_a, b.t AS modality_b,
        |  count(*)::BIGINT AS n_docs
        |FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.t <= b.t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "media_cdc_dedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image/png'
        |      WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type,
        |    text, n_chars
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, media_type, text, n_chars,
        |    unnest(range(1, n_chars + 1)) AS i
        |  FROM d),
        |b AS (
        |  SELECT doc_id, media_type, text, i,
        |    (i = 1 OR (i + 7 <= n_chars AND
        |      ('0x' || substring(md5(substring(text, i::INT, 8)), 1, 12))
        |        ::BIGINT % 32 = 0)) AS b
        |  FROM pos),
        |cid AS (
        |  SELECT doc_id, media_type, text, i,
        |    sum(b::INT) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS chunk_id
        |  FROM b),
        |ch AS (
        |  SELECT doc_id, media_type, chunk_id,
        |    min(i) AS st, count(*)::BIGINT AS len,
        |    md5(substring(max(text), min(i)::INT, count(*)::INT)) AS h
        |  FROM cid GROUP BY 1, 2, 3),
        |store AS (
        |  SELECT media_type, count(*)::BIGINT AS n_distinct_chunks,
        |    CAST(sum(len) AS BIGINT) AS unique_bytes
        |  FROM (SELECT media_type, h, min(len) AS len FROM ch
        |        GROUP BY 1, 2)
        |  GROUP BY 1),
        |tot AS (
        |  SELECT media_type, count(*)::BIGINT AS n_chunks,
        |    CAST(sum(len) AS BIGINT) AS total_bytes
        |  FROM ch GROUP BY 1)
        |SELECT tot.media_type, n_chunks, n_distinct_chunks,
        |  total_bytes, unique_bytes,
        |  floor(unique_bytes::DOUBLE / total_bytes * 1000000.0 + 0.5)
        |    / 1000000.0 AS dedup_ratio,
        |  floor(total_bytes::DOUBLE / n_chunks * 10000.0 + 0.5)
        |    / 10000.0 AS avg_chunk_bytes
        |FROM tot JOIN store ON store.media_type = tot.media_type
        |ORDER BY tot.media_type""".stripMargin,
    "multimodal_token_budget" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
        |      ELSE 'video/mp4' END AS media_type,
        |    octet_length(encode(text))::BIGINT AS n_bytes,
        |    64 + (doc_id * 37) % 1920 AS width,
        |    64 + (doc_id * 53) % 1080 AS height
        |  FROM documents),
        |r AS (
        |  SELECT *, greatest(width, height) AS longest FROM m),
        |d AS (
        |  SELECT media_type,
        |    CASE media_type
        |      WHEN 'image/png' THEN
        |        ((CASE WHEN longest <= 512 THEN width
        |            ELSE width * 512 // longest END + 15) // 16)
        |        * ((CASE WHEN longest <= 512 THEN height
        |            ELSE height * 512 // longest END + 15) // 16)
        |      WHEN 'video/mp4' THEN
        |        (least((n_bytes - 1) // 256, 3) + 1) * 196
        |      ELSE (n_bytes + 319) // 320
        |    END::BIGINT AS est_tokens
        |  FROM r),
        |g AS (
        |  SELECT media_type, count(*) AS n_docs,
        |    sum(est_tokens)::BIGINT AS total_tokens,
        |    max(est_tokens) AS max_doc_tokens
        |  FROM d GROUP BY media_type)
        |SELECT media_type, n_docs, total_tokens, max_doc_tokens,
        |  floor(total_tokens::DOUBLE / (SELECT sum(total_tokens) FROM g)
        |    * 1000000.0 + 0.5) / 1000000.0 AS token_share
        |FROM g ORDER BY media_type""".stripMargin,
    "multimodal_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
        |      ELSE 'video/mp4' END AS media_type,
        |    md5(substring(text, 1, 128)) AS sig,
        |    md5(text) AS full_hash
        |  FROM documents),
        |g AS (
        |  SELECT media_type, sig, count(*) AS n_copies,
        |    min(doc_id) AS keeper_id,
        |    count(DISTINCT full_hash) AS n_distinct_payloads
        |  FROM m GROUP BY media_type, sig)
        |SELECT media_type, sig, n_copies, keeper_id, n_distinct_payloads
        |FROM g WHERE n_copies > 1
        |ORDER BY media_type, sig""".stripMargin,
    "multimodal_shards" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
        |      ELSE 'video/mp4' END AS media_type,
        |    octet_length(encode(text))::BIGINT AS n_bytes
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, media_type, n_bytes,
        |    sum(n_bytes) OVER (PARTITION BY media_type ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM m)
        |SELECT media_type, ((cum - n_bytes) // 16384)::BIGINT AS shard_id,
        |  count(*)::BIGINT AS n_docs, sum(n_bytes)::BIGINT AS shard_bytes,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY media_type, shard_id
        |ORDER BY media_type, shard_id""".stripMargin,
    "multimodal_resize" ->
      """WITH img AS (
        |  SELECT doc_id,
        |    64 + (doc_id * 37) % 1920 AS width,
        |    64 + (doc_id * 53) % 1080 AS height
        |  FROM documents WHERE doc_id % 3 = 0),
        |g AS (
        |  SELECT *, greatest(width, height) AS longest FROM img),
        |r AS (
        |  SELECT doc_id, width, height,
        |    CASE WHEN longest <= 512 THEN width
        |      ELSE width * 512 // longest END AS out_w,
        |    CASE WHEN longest <= 512 THEN height
        |      ELSE height * 512 // longest END AS out_h
        |  FROM g)
        |SELECT doc_id, width, height, out_w, out_h,
        |  out_w * out_h * 3 AS out_bytes
        |FROM r ORDER BY doc_id""".stripMargin,
    "multimodal_interleave" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ['image/png', 'audio/wav', 'video/mp4'][(doc_id % 3 + 1)::INT]
        |      AS media_type,
        |    octet_length(encode(text))::BIGINT AS n_bytes
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, media_type, n_bytes,
        |    row_number() OVER (PARTITION BY media_type ORDER BY doc_id)
        |      AS rnk
        |  FROM m),
        |pt AS (
        |  SELECT (rnk - 1) % 16 AS shard_id, media_type,
        |    count(*)::BIGINT AS td, sum(n_bytes)::BIGINT AS tb
        |  FROM r GROUP BY 1, 2)
        |SELECT shard_id::BIGINT AS shard_id,
        |  sum(td)::BIGINT AS n_docs, sum(tb)::BIGINT AS n_bytes,
        |  count(*)::BIGINT AS n_types,
        |  min(td)::BIGINT AS min_type_docs,
        |  max(td)::BIGINT AS max_type_docs
        |FROM pt GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id, text,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, least((n_bytes - 1) // 256 + 1, 4))) AS frame_idx
        |  FROM v)
        |SELECT doc_id, frame_idx::BIGINT AS frame_idx,
        |  (frame_idx * 256)::BIGINT AS byte_offset,
        |  md5(substring(text, (frame_idx * 256 + 1)::INT, 256)) AS frame_hash
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_frame_dupes" ->
      """WITH v AS (
        |  SELECT doc_id, text,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, least((n_bytes - 1) // 256 + 1, 4))) AS frame_idx
        |  FROM v),
        |h AS (
        |  SELECT doc_id,
        |    md5(substring(text, (frame_idx * 256 + 1)::INT, 256))
        |      AS frame_hash
        |  FROM f)
        |SELECT frame_hash, count(*) AS n_frames,
        |  count(DISTINCT doc_id) AS n_videos,
        |  min(doc_id) AS first_doc
        |FROM h GROUP BY frame_hash HAVING count(DISTINCT doc_id) > 1
        |ORDER BY n_frames DESC, frame_hash""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
        |    ELSE 'video/mp4' END AS media_type,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  hex(encode(substring(text, 1, 8))) AS header_hex,
        |  md5(text) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin)
}
