package graft

import graft.ops.{Dedup, TextPipeline}

class TextPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("chunking covers every token once per window at the right stride") {
    val chunks = ops.TextAnalysis.chunkDocuments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTokens = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    chunks.groupBy(_._1).foreach { case (docId, cs) =>
      val n = nTokens(docId)
      // chunk indices dense from 0; all full-size except possibly last
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0L until cs.length).toSeq)
      sorted.init.foreach { case (_, _, tok) => assert(tok === 64L) }
      // stride 48 + final size lands exactly on the document's end
      val (_, lastIdx, lastTok) = sorted.last
      assert(lastIdx * 48 + lastTok === n,
        s"doc $docId: last chunk must reach token $n")
    }
  }

  test("curation drops near-dup doc_b ids and low-quality docs") {
    val curated = TextPipeline.curate(spark, sf).collect()
    assert(curated.nonEmpty && curated.length < 500)
    val curatedIds = curated.map(_.getLong(0)).toSet
    // every doc_b of a verified near-dup pair is gone
    val dropped = Dedup.minhashLsh(spark, sf).collect()
      .map(_.getLong(1)).toSet
    assert(dropped.nonEmpty)
    assert(curatedIds.intersect(dropped).isEmpty)
    // every survivor clears the quality gate
    assert(curated.forall(_.getDouble(2) >= 0.75))
    // langid values are from the closed set
    val langs = curated.map(_.getString(1)).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh")))
  }

  test("JSONL ingestion parses good lines and accounts corrupt ones") {
    import java.nio.file.{Files, Paths}
    val docs = Tables.load(spark, sf, "documents")
    val dir = Files.createTempDirectory("graft-jsonl").toString
    docs.coalesce(1).write.mode("overwrite").json(dir)
    // plant malformed lines alongside the good shard
    Files.writeString(Paths.get(dir, "part-corrupt.json"),
      "{\"doc_id\": 1, \"text\": \"truncated\n" +
        "not json at all\n" +
        "{\"doc_id\": \"not-a-number\", \"text\": \"x\"}\n" +
        // valid JSON but missing the required doc_id key: must land on
        // the rejected side, not vanish (every line is accounted)
        "{\"text\": \"orphan line\", \"lang\": \"en\"}\n")
    val (good, bad) = graft.ops.TextSources
      .readDocumentsJsonl(spark, dir)
    assert(good.count() === docs.count())
    assert(bad.count() === 4L)
    // good + bad covers every input line of the corrupt shard
    assert(good.count() + bad.count() === docs.count() + 4L)
    // the doc_id-less line still carries its content on the bad side
    assert(bad.collect().map(_.getString(0))
      .exists(_.contains("orphan line")))
    // full round-trip fidelity on the parsed side
    val a = docs.orderBy("doc_id").collect().map(_.toString)
    val b = good.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
