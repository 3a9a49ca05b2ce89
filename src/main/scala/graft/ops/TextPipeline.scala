package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The composite training-data curation pipeline — the flagship
  * LLM-data use case, composing the proven operators end-to-end:
  *
  *   1. near-dup removal: connected-components clusters over the
  *      MinHash-LSH pair graph (Dedup.clusters — transitive closure),
  *      keep each cluster's minimum doc_id;
  *   2. quality gate on the raw 4-component score;
  *   3. language ID + normalization fingerprint on the survivors.
  *
  * Every step is SQL-expressible, so the whole composite is
  * oracle-checked (`curate_corpus`). One LSH pass + one broadcast
  * anti-join + one scan-side projection — no all-pairs work anywhere.
  */
object TextPipeline {

  def curate(spark: SparkSession, dir: String,
             qualityMin: Double = 0.75,
             jaccardThreshold: Double = 0.8): DataFrame = {
    import spark.implicits._

    // 1. near-dup drop set: connected-components clusters (transitive
    // closure), keep each cluster's minimum doc_id
    val dropIds = Dedup.clusters(spark, dir, jaccardThreshold)
      .filter($"doc_id" =!= $"cluster_id")
      .select($"doc_id".as("doc_b"))

    // 2-3. quality + langid + clean fingerprint on survivors
    val docs = Tables.load(spark, dir, "documents")
      .join(broadcast(dropIds), $"doc_id" === $"doc_b", "left_anti")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") > 0)
      .withColumn("len_score",
        least(length($"text").cast("double") / 500.0, lit(1.0)))
      .withColumn("punct_ratio",
        length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("double") /
          length($"text").cast("double"))
      .withColumn("stop_ratio",
        size(filter($"toks", t => Seq("the", "a", "of", "and", "to", "in",
          "is", "on", "for", "with").map(t === _).reduce(_ || _)))
          .cast("double") / size($"toks").cast("double"))
      .withColumn("uniq_ratio",
        size(array_distinct($"toks")).cast("double") /
          size($"toks").cast("double"))
      .withColumn("quality",
        ($"len_score" + (lit(1.0) - $"punct_ratio") +
          (lit(1.0) - $"stop_ratio") + $"uniq_ratio") / 4.0)
      .filter($"quality" >= qualityMin)

    val withLang = Seq(
      "de" -> Seq("der", "die", "und", "nicht", "das"),
      "en" -> Seq("the", "and", "of", "is", "with"),
      "es" -> Seq("el", "la", "que", "los", "una"),
      "fr" -> Seq("le", "les", "des", "est", "une"),
      "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4")).foldLeft(docs) {
      case (df, (lang, words)) =>
        df.withColumn(s"s_$lang",
          size(filter($"toks", t => words.map(t === _).reduce(_ || _))))
    }

    withLang
      .withColumn("pred_lang",
        when($"s_de" >= greatest($"s_en", $"s_es", $"s_fr", $"s_zh"), "de")
          .when($"s_en" >= greatest($"s_es", $"s_fr", $"s_zh"), "en")
          .when($"s_es" >= greatest($"s_fr", $"s_zh"), "es")
          .when($"s_fr" >= $"s_zh", "fr")
          .otherwise("zh"))
      .withColumn("cleaned",
        trim(regexp_replace(
          regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " ")))
      .select($"doc_id", $"pred_lang",
        (floor($"quality" * 10000.0 + 0.5).cast("double") / 10000.0)
          .as("quality"),
        md5($"cleaned").as("clean_hash"))
      .orderBy($"doc_id")
  }

  private val pairsCte =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([array_to_string(t[i:i+2], ' ')
      |      for i in range(1, greatest(len(t) - 1, 2))]) AS s
      |  FROM toks WHERE len(t) >= 3)
      |""".stripMargin.stripSuffix("\n") + Dedup.candCte(8000) + ",\n" +
    """pairs AS (
      |  SELECT c.da AS doc_a, c.db AS doc_b
      |  FROM cand c JOIN sh a ON a.doc_id = c.da
      |  JOIN sh b ON b.doc_id = c.db
      |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |      / len(list_distinct(a.s || b.s)) >= 0.8),
      |edges AS (
      |  SELECT doc_a, doc_b FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |reach(doc_id, lab) AS (
      |  SELECT DISTINCT doc_a, doc_a FROM edges
      |  UNION
      |  SELECT e.doc_a, r.lab FROM reach r
      |  JOIN edges e ON e.doc_b = r.doc_id),
      |drops AS (
      |  SELECT doc_id AS drop_id FROM (
      |    SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY doc_id)
      |  WHERE doc_id <> cluster_id),
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "curate_corpus" -> (pairsCte +
      """kept AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS tk
        |  FROM documents
        |  WHERE doc_id NOT IN (SELECT drop_id FROM drops)
        |    AND len(string_split(text, ' ')) > 0),
        |scored AS (
        |  SELECT doc_id, text, tk,
        |    (least(length(text)::DOUBLE / 500.0, 1.0)
        |     + (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text)::DOUBLE)
        |     + (1.0 - len(list_filter(tk, x -> x IN ('the','a','of','and','to','in','is','on','for','with')))::DOUBLE / len(tk)::DOUBLE)
        |     + len(list_distinct(tk))::DOUBLE / len(tk)::DOUBLE) / 4.0 AS quality,
        |    len(list_filter(tk, x -> x IN ('der','die','und','nicht','das')))::BIGINT AS s_de,
        |    len(list_filter(tk, x -> x IN ('the','and','of','is','with')))::BIGINT AS s_en,
        |    len(list_filter(tk, x -> x IN ('el','la','que','los','una')))::BIGINT AS s_es,
        |    len(list_filter(tk, x -> x IN ('le','les','des','est','une')))::BIGINT AS s_fr,
        |    len(list_filter(tk, x -> x IN ('de5','shi4','bu4','le5','zai4')))::BIGINT AS s_zh
        |  FROM kept)
        |SELECT doc_id,
        |  CASE
        |    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang,
        |  floor(quality * 10000.0 + 0.5) / 10000.0 AS quality,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS clean_hash
        |FROM scored
        |WHERE quality >= 0.75
        |ORDER BY doc_id""".stripMargin))
}
