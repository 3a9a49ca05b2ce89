package graft

import graft.ops.{Dedup, TextPipeline}

class TextPipelineSpec extends SparkSpecBase {
  import spark.implicits._

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
}
