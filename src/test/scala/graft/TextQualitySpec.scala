package graft

import java.security.MessageDigest

import graft.ops.TextAnalysis

/** Semantic specs for the quality-gate text ops (E14/E15/E16):
  * independent pure-Scala recomputation per document, compared against
  * the distributed results.
  */
class TextQualitySpec extends SparkSpecBase {
  import spark.implicits._

  private def roundP(x: Double, dp: Int): Double = {
    val p = math.pow(10, dp)
    math.floor(x * p + 0.5) / p
  }

  private lazy val texts: Map[Long, String] =
    Tables.load(spark, sf, "documents").select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("repetition measures match a per-doc recomputation") {
    val got = TextAnalysis.repetition(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size === texts.size)
    texts.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val n = toks.length.toLong
      val uni = toks.groupBy(identity).map(_._2.length)
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val maxRun = toks.foldLeft((0L, "", 0L)) {
        case ((best, prev, run), t) =>
          val r = if (t == prev) run + 1 else 1L
          (math.max(best, r), t, r)
      }._1
      val row = got(id)
      assert(row.getLong(1) === n)
      assert(row.getLong(2) === uni.size.toLong)
      assert(row.getDouble(3) === roundP(1.0 - uni.size.toDouble / n, 4))
      assert(row.getDouble(4) === roundP(uni.max.toDouble / n, 4))
      val topBig =
        if (bigrams.isEmpty) 0.0
        else bigrams.groupBy(identity).map(_._2.length).max.toDouble / (n - 1)
      assert(row.getDouble(5) === roundP(topBig, 4))
      assert(row.getLong(6) === maxRun)
      assert(row.getBoolean(7) === (uni.max * 5 > n))
    }
  }

  test("char entropy matches a per-doc recomputation") {
    val got = TextAnalysis.charEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, text) =>
      val counts = text.toSeq.groupBy(identity).map(_._2.length.toDouble)
      val nc = text.length.toDouble
      val h = counts.map(c => -c / nc * math.log(c / nc)).sum / math.log(2.0)
      val row = got(id)
      assert(row.getLong(1) === text.length.toLong)
      assert(row.getLong(2) === counts.size.toLong)
      // recomputation differs from the engine's ln(n) - slc/n form by
      // summation-order ulps only — compare at 5 dp under the 6-dp round
      assert(math.abs(row.getDouble(3) - h) < 1e-5)
      assert(row.getDouble(3) >= 0.0 &&
        row.getDouble(3) <= math.log(counts.size.toDouble) / math.log(2.0) + 1e-9)
    }
  }

  test("pii scrub redacts every injected email/ip/phone byte-exactly") {
    val got = TextAnalysis.piiScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val md = MessageDigest.getInstance("MD5")
    texts.foreach { case (id, text) =>
      val aug = s"$text contact user$id@example.com or call +1-555-" +
        f"${id % 10000}%04d from 10.${id % 256}.0.1"
      val scrubbed = aug
        .replaceAll("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
        .replaceAll("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
        .replaceAll("\\+[0-9][0-9\\-]{5,14}[0-9]", "<PHONE>")
      val row = got(id)
      assert(row.getLong(1) >= 1L, s"doc $id: injected email not counted")
      assert(row.getLong(2) >= 1L, s"doc $id: injected ip not counted")
      assert(row.getLong(3) >= 1L, s"doc $id: injected phone not counted")
      assert(row.getLong(4) === scrubbed.length.toLong)
      val hash = md.digest(scrubbed.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(row.getString(5) === hash, s"doc $id: scrub mismatch")
      // nothing PII-shaped survives
      assert(!scrubbed.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"))
    }
  }

  test("MATTR equals a brute-force sliding-window recompute") {
    val w = 25
    val got = TextAnalysis.mattr(spark, sf, w).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      if (toks.nonEmpty) {
        val expected =
          if (toks.length >= w) {
            val sums = toks.sliding(w).map(_.distinct.length.toLong).sum
            sums.toDouble / ((toks.length - w + 1).toLong * w)
          } else toks.distinct.length.toDouble / toks.length
        val row = got(id)
        assert(row.getLong(1) === toks.length.toLong)
        assert(row.getLong(2) === toks.distinct.length.toLong)
        assert(row.getDouble(3) === roundP(expected, 6),
          s"doc $id: ${row.getDouble(3)} vs brute ${roundP(expected, 6)}")
      }
    }
  }

  test("readability equals a per-doc Flesch recompute") {
    val got = TextAnalysis.readability(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1).filter(_.nonEmpty).toSeq
      if (toks.nonEmpty) {
        val words = toks.length.toDouble
        val sents =
          math.max(text.split("[.!?]+", -1).count(_.trim.nonEmpty), 1)
            .toDouble
        val syll = toks.map(t =>
          math.max("[aeiouy]+".r.findAllIn(t).size, 1).toLong).sum.toDouble
        val flesch = roundP(
          206.835 - 1.015 * (words / sents) - 84.6 * (syll / words), 4)
        val row = got(id)
        assert(row.getLong(1) === words.toLong, s"doc $id words")
        assert(row.getLong(2) === sents.toLong, s"doc $id sentences")
        assert(row.getLong(3) === syll.toLong, s"doc $id syllables")
        assert(row.getDouble(4) === flesch,
          s"doc $id: ${row.getDouble(4)} vs recomputed $flesch")
      }
    }
  }

  test("Kneser-Ney bigram surprisal matches an in-memory recompute") {
    val d = 0.75
    val allBigrams = texts.values.toSeq.flatMap { t =>
      val toks = t.split(" ").filter(_.nonEmpty).toSeq
      if (toks.length >= 2) toks.sliding(2).map(p => (p(0), p(1))).toSeq
      else Seq.empty
    }
    val c12 = allBigrams.groupBy(identity).map { case (k, v) => k -> v.length }
    val c1 = allBigrams.groupBy(_._1).map { case (k, v) => k -> v.length }
    val n1f = c12.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.length }
    val n1p = c12.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.length }
    val bt = c12.size
    val got = TextAnalysis.knBigram(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      if (toks.length >= 2) {
        val lps = toks.sliding(2).map { p =>
          val (w1, w2) = (p(0), p(1))
          math.log(math.max(c12((w1, w2)) - d, 0.0) / c1(w1) +
            d / c1(w1) * n1f(w1) * (n1p(w2).toDouble / bt))
        }.toSeq
        val row = got(id)
        assert(row.getLong(1) === lps.length.toLong)
        val expected = roundP(-(lps.sum / lps.length), 6)
        assert(math.abs(row.getDouble(2) - expected) < 2e-6,
          s"doc $id: ${row.getDouble(2)} vs brute $expected")
      }
    }
  }

  test("burstiness: function-word dispersion below heavy content words") {
    val rows = TextAnalysis.burstiness(spark, sf).collect()
    val vocab = texts.values.toSeq
      .flatMap(_.split(" ").filter(_.nonEmpty)).distinct.size
    assert(rows.length === math.min(50, vocab))
    rows.foreach { r =>
      val (cnt, df) = (r.getLong(1), r.getLong(2))
      val (mean, disp) = (r.getDouble(3), r.getDouble(4))
      assert(disp >= 0.0, s"${r.getString(0)}: dispersion $disp < 0")
      assert(mean > 0.0)
      // a token appearing once per containing doc has disp = 1 - mean < 1;
      // dispersion exceeding 1 requires within-doc repetition
      if (disp > 1.0) assert(cnt > df, s"${r.getString(0)} can't be bursty")
    }
  }

  test("gopher rules equal an in-memory recompute; keep is the rule conjunction") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val stop = Set("the", "a", "of", "and", "to", "in", "is",
      "on", "for", "with")
    val expected = docs.map { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val wc = ws.groupBy(identity).map { case (w, o) => w -> o.size }
      val n = ws.length.toLong
      val mean = math.floor(
        ws.map(_.length.toLong).sum.toDouble / n * 10000.0 + 0.5) / 10000.0
      val topF = math.floor(wc.values.max.toDouble / n * 1000000.0 + 0.5) / 1000000.0
      val dupF = math.floor((n - wc.size).toDouble / n * 1000000.0 + 0.5) / 1000000.0
      val nStop = wc.keySet.count(stop).toLong
      val keep = if (n >= 50 && n <= 100000 && mean >= 3.0 && mean <= 10.0 &&
        nStop >= 2 && topF <= 0.1) 1L else 0L
      id -> ((n, mean, nStop, topF, dupF, keep))
    }.toMap
    val got = TextAnalysis.gopherRules(spark, sf)
      .as[(Long, Long, Double, Long, Double, Double, Long)].collect()
    assert(got.length === expected.size)
    got.foreach { case (id, n, mean, nStop, topF, dupF, keep) =>
      assert((n, mean, nStop, topF, dupF, keep) === expected(id), s"doc $id")
    }
    // thresholds actually discriminate on this corpus
    assert(got.exists(_._7 == 1L) && got.exists(_._7 == 0L))
  }

  test("vocab coverage: bucketed global rank equals a naive global sort") {
    import spark.implicits._
    val counts = Tables.load(spark, sf, "documents")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum
    val cums = counts.scanLeft(0L)(_ + _._2).drop(1)
    val expect = Seq(0.5, 0.75, 0.9, 0.99).map { t =>
      val i = cums.indexWhere(_ >= t * total)
      t -> (i + 1L, cums(i), total)
    }.toMap
    val got = TextAnalysis.vocabCoverage(spark, sf).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
  }

  test("bm25 equals an in-memory Okapi recompute on the same corpus") {
    import spark.implicits._
    val terms = Set("hash", "join", "vector", "spark")
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) =>
      (id, t.split(" ", -1).filter(_.nonEmpty))
    }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length.toDouble).sum / n
    val df = terms.map(t =>
      t -> toks.count(_._2.contains(t)).toDouble).toMap
    val idf = df.map { case (t, d) =>
      t -> math.log(1.0 + (n - d + 0.5) / (d + 0.5))
    }
    val scores = toks.flatMap { case (id, tk) =>
      val dl = tk.length.toDouble
      val s = terms.toSeq.flatMap { t =>
        val tf = tk.count(_ == t).toDouble
        if (tf == 0) None
        else Some(idf(t) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
      }
      if (s.isEmpty) None
      else Some(id -> math.floor(s.sum * 1e6 + 0.5) / 1e6)
    }
    val expect = scores.sortBy { case (id, s) => (-s, id) }.take(50).toMap
    val got = TextAnalysis.bm25(spark, sf)
      .select($"doc_id", $"bm25").as[(Long, Double)].collect()
    assert(got.length === expect.size)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expect(id)) < 1e-9, s"doc $id")
    }
  }

  test("pmi collocations match a serial recomputation") {
    val docs = texts.values.toSeq
      .map(_.split(" ", -1).toSeq).filter(_.length >= 2)
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { ts =>
      ts.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1L)
      ts.sliding(2).foreach { p =>
        val g = p.mkString(" "); big(g) = big.getOrElse(g, 0L) + 1L
      }
    }
    val nUni = uni.values.sum.toDouble
    val nBig = big.values.sum.toDouble
    val exp = big.toSeq.filter(_._2 >= 5).map { case (g, cab) =>
      val parts = g.split(" ", -1)
      val pmi = math.log((cab.toDouble / nBig) /
        ((uni(parts(0)).toDouble / nUni) * (uni(parts(1)).toDouble / nUni)))
      (g, cab, roundP(pmi, 4))
    }.sortBy { case (g, _, p) => (-p, g) }.take(50)
    val got = TextAnalysis.pmiCollocations(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === exp)
  }

  test("logistic-regression training matches a serial replay") {
    val rawFeats = TextAnalysis.qualityLrFeatures(spark, sf)
      .select($"y", $"x0", $"x1", $"x2", $"x3")
      .as[(Double, Double, Double, Double, Double)].collect()
    val n = rawFeats.length.toDouble
    def zscore(xs: Array[Double]): Array[Double] = {
      val m = xs.sum / n
      val q = xs.map(x => x * x).sum / n
      val sd = math.sqrt(math.max(q - m * m, 1e-12))
      xs.map(x => (x - m) / sd)
    }
    val z1 = zscore(rawFeats.map(_._3))
    val z2 = zscore(rawFeats.map(_._4))
    val z3 = zscore(rawFeats.map(_._5))
    val feats = rawFeats.indices.map(i =>
      (rawFeats(i)._1, rawFeats(i)._2, z1(i), z2(i), z3(i))).toArray
    val w = Array.fill(4)(0.0)
    val iters = 15
    val lr = 1.0
    for (_ <- 1 to iters) {
      val g = Array.fill(4)(0.0)
      feats.foreach { case (y, x0, x1, x2, x3) =>
        val xs = Array(x0, x1, x2, x3)
        val m = (0 until 4).map(j => w(j) * xs(j)).sum
        val p = 1.0 / (1.0 + math.exp(-m))
        (0 until 4).foreach(j => g(j) += (p - y) * xs(j))
      }
      (0 until 4).foreach(j => w(j) -= lr / n * g(j))
    }
    var acc = 0.0
    var ll = 0.0
    feats.foreach { case (y, x0, x1, x2, x3) =>
      val xs = Array(x0, x1, x2, x3)
      val m = (0 until 4).map(j => w(j) * xs(j)).sum
      val p = 1.0 / (1.0 + math.exp(-m))
      if ((if (p >= 0.5) 1.0 else 0.0) == y) acc += 1
      ll += -(y * math.log(p) + (1.0 - y) * math.log(1.0 - p))
    }
    acc /= n
    ll /= n
    val got = TextAnalysis.qualityLr(spark, sf)
      .as[(String, Double)].collect().toMap
    assert(got("n_docs") === n)
    (0 until 4).foreach { j =>
      assert(math.abs(got(s"w$j") - w(j)) < 1e-4, s"w$j: ${got(s"w$j")} vs ${w(j)}")
    }
    assert(math.abs(got("accuracy") - acc) < 1e-4)
    assert(math.abs(got("log_loss") - ll) < 1e-4)
    // the classifier must beat the majority-class baseline
    val majority = math.max(feats.count(_._1 == 1.0), feats.count(_._1 == 0.0)) / n
    assert(got("accuracy") >= majority - 1e-9,
      s"accuracy ${got("accuracy")} below majority baseline $majority")
  }

  test("Porter stemmer matches the published algorithm's vectors") {
    import graft.text.PorterStemmer.stem
    // canonical examples from the 1980 paper's step tables
    val vectors = Map(
      "caresses" -> "caress", "ponies" -> "poni", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "hopping" -> "hop",
      "falling" -> "fall", "filing" -> "file", "happy" -> "happi",
      "sky" -> "sky", "relational" -> "relat",
      "generalizations" -> "gener", "oscillators" -> "oscil")
    vectors.foreach { case (w, s) =>
      assert(stem(w) === s, s"stem($w)")
    }
    // the property the report measures: an inflection family folds
    // to ONE stem
    assert(Set("relation", "relational", "relating").map(stem).size === 1)
    val rows = graft.ops.TextAnalysis.stemReport(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_stems") <= r.getAs[Long]("n_words"))
      // stems never grow on average
      assert(r.getAs[Double]("avg_stem_len") <=
        r.getAs[Double]("avg_word_len") + 1e-9)
      val red = r.getAs[Double]("vocab_reduction")
      assert(red >= 0.0 && red < 1.0)
    }
  }

  test("length KS: full pair grid, bounded statistic, ≡ serial ECDF sup") {
    import spark.implicits._
    val rows = graft.ops.TextAnalysis.lengthKs(spark, sf).collect()
    val nSources = Tables.load(spark, sf, "documents")
      .select($"source").distinct.count().toInt
    assert(rows.length === nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      val d = r.getAs[Double]("ks_stat")
      assert(d >= 0.0 && d <= 1.0)
      // the flag compares the UNROUNDED pair; outside the 1e-6
      // rounding band it must agree with the rounded columns
      if (math.abs(d - r.getAs[Double]("crit_05")) > 2e-6)
        assert(r.getAs[Boolean]("reject_05") ===
          (d > r.getAs[Double]("crit_05")))
    }
    // serial replay of one pair's sup-gap from the raw lengths
    val first = rows.head
    val (sa, sb) = (first.getAs[String]("src_a"), first.getAs[String]("src_b"))
    val lens = Tables.load(spark, sf, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val la = lens.filter(_._1 == sa).map(_._2).sorted
    val lb = lens.filter(_._1 == sb).map(_._2).sorted
    val xs = (la ++ lb).distinct.sorted
    val dSerial = xs.map { x =>
      math.abs(la.count(_ <= x).toDouble / la.length -
        lb.count(_ <= x).toDouble / lb.length)
    }.max
    assert(math.abs(first.getAs[Double]("ks_stat") - dSerial) < 2e-6)
  }
}
