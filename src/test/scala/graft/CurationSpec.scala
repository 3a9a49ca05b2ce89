package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Curation}

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  // --- generic as-of join semantics on a hand-built frame ---

  private def asof(left: Seq[(Long, Long)], right: Seq[(Long, Long, Long)]) = {
    val l = left.toDF("k", "lts")
    val r = right.toDF("k", "rts", "pay")
    AsOf.joinAsOf(l, r, "k", "lts", "rts", Seq("pay"))
      .select($"k", $"lts", $"pay").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
  }

  test("as-of join picks latest right row at-or-before each left row") {
    val got = asof(
      left = Seq((1L, 10L), (1L, 25L), (1L, 5L)),
      right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L)))
    assert(got === Set(
      (1L, 10L, Some(100L)), // tie: rts == lts matches (<= bound)
      (1L, 25L, Some(200L)), // latest of {10, 20}
      (1L, 5L, None)))       // nothing at-or-before → null payload
  }

  private def asofNearest(left: Seq[(Long, Long)],
                          right: Seq[(Long, Long)], tol: Long) = {
    val l = left.toDF("k", "lts")
    val r = right.toDF("k", "rts")
    AsOf.joinAsOfNearest(l, r, "k", "lts", "rts", tol)
      .collect().map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getLong(2)),
        Option(row.getString(3)))).toSet
  }

  test("nearest as-of: direction, tolerance, and backward tie-break") {
    val got = asofNearest(
      left = Seq((1L, 100L), (1L, 10L), (1L, 500L), (2L, 50L)),
      right = Seq((1L, 90L), (1L, 104L), (1L, 300L), (2L, 400L)),
      tol = 50L)
    assert(got === Set(
      // 100: backward 90 (gap 10) beats forward 104 (gap 4)? no —
      // forward is nearer, direction flips
      (1L, 100L, Some(104L), Some("forward")),
      (1L, 10L, None, None),             // nearest is 90, outside tol
      (1L, 500L, None, None),            // 300 is 200 away, outside tol
      (2L, 50L, None, None)))            // key 2's only row is 350 away
  }

  test("nearest as-of: equidistant resolves backward, exact tie gap 0") {
    val got = asofNearest(
      left = Seq((1L, 200L), (1L, 300L)),
      right = Seq((1L, 190L), (1L, 210L), (1L, 300L)),
      tol = 1000L)
    assert(got === Set(
      (1L, 200L, Some(190L), Some("backward")), // 190/210 equidistant
      (1L, 300L, Some(300L), Some("backward")))) // exact match, gap 0
  }

  test("nearest as-of query: gaps bounded by tolerance, all purchases kept") {
    val df = AsOf.nearestViewPurchase(spark, sf)
    val purchases = Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase").count()
    assert(df.count() === purchases)
    assert(df.filter(abs($"gap_us") > 7200000000L).count() === 0)
    assert(df.filter($"asof_direction" === "forward" && $"gap_us" > 0)
      .count() === 0, "forward matches have v_us after the purchase")
    assert(df.filter($"asof_direction" === "backward" && $"gap_us" < 0)
      .count() === 0)
  }

  test("as-of join never crosses keys") {
    val got = asof(
      left = Seq((1L, 50L), (2L, 50L)),
      right = Seq((1L, 40L, 100L)))
    assert(got === Set((1L, 50L, Some(100L)), (2L, 50L, None)))
  }

  test("as-of query: every gap is non-negative, all purchases kept") {
    val df = AsOf.viewPurchase(spark, sf)
    val n = df.count()
    val purchases = Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase").count()
    assert(n === purchases, "left join keeps every purchase")
    assert(df.filter($"gap_us" < 0).count() === 0)
  }

  // --- curation operators ---

  test("dataset split is deterministic, exhaustive, and ~75/12.5/12.5") {
    val rows = Curation.datasetSplit(spark, sf).collect()
    assert(rows.length === 500)
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"),
      "train must be the large split")
    // re-running yields byte-identical assignment (hash, not RNG)
    val again = Curation.datasetSplit(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("sequence packing: packs are contiguous and within budget + tail doc") {
    val budget = 512
    val rows = Curation.packSequences(spark, sf, budget).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(2), r.getLong(0)))
    rows.groupBy(_._1).foreach { case (_, docs) =>
      // pack ids per lang are dense from 0
      val packs = docs.map(_._2).distinct.sorted
      assert(packs.head === 0L && packs === (0L until packs.length).toArray.toSeq)
      // a pack only exceeds the budget by (part of) its final doc
      docs.groupBy(_._2).foreach { case (_, inPack) =>
        val tokens = inPack.map(_._3).sum
        val maxDoc = inPack.map(_._3).max
        assert(tokens - maxDoc < budget,
          "removing the last doc must bring the pack under budget")
      }
    }
  }

  test("contamination: flagged docs truly share an 8-gram with benchmark") {
    val flagged = Curation.contaminationCheck(spark, sf).collect()
    assert(flagged.forall(_.getLong(1) > 0))
    // cross-check one flagged doc by brute force
    flagged.headOption.foreach { r =>
      val docId = r.getLong(0)
      def grams(id: Long): Set[String] = {
        val text = Tables.load(spark, sf, "documents")
          .filter($"doc_id" === id).select($"text").head.getString(0)
        text.split(" ").sliding(8).map(_.mkString(" ")).toSet
      }
      val bench = (0L until 50L).flatMap(grams).toSet
      assert(grams(docId).intersect(bench).size === r.getLong(1))
    }
  }

  test("mix weights rebalance to uniform language shares") {
    val rows = Curation.langMixWeights(spark, sf).collect()
    val reweighted = rows.map(r => r.getLong(1) * r.getDouble(2))
    // n_docs × weight is the same (total/n_langs) for every language
    assert(reweighted.map(x => math.round(x * 100)).distinct.length === 1)
  }

  test("global shuffle: ranks are a permutation in exact hash order") {
    val rows = Curation.globalShuffle(spark, sf)
      .select($"rank", $"sk").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.map(_._1).sorted.toSeq === (1L to rows.length).toSeq,
      "ranks are dense 1..n")
    // bucket-offset composition must equal one global sort of the key
    assert(rows.sortBy(_._1).map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
  }

  test("epoch plan: caps bind, budget conserved, rare langs upsampled") {
    val cap = 4.0
    val rows = Curation.langEpochPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // independent recompute from per-lang token totals
    val counts = Tables.load(spark, sf, "documents")
      .select($"lang", $"text").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1).split(" ")
        .count(_.nonEmpty).toLong).sum).toMap
    val z = counts.values.map(n => math.pow(n.toDouble, 0.3)).sum
    val budget = counts.values.sum.toDouble
    rows.foreach { case (lang, nTok, epochs, eff, freed) =>
      assert(nTok === counts(lang), s"$lang token total")
      val raw = math.pow(nTok.toDouble, 0.3) / z * budget / nTok
      val e = math.min(raw, cap)
      assert(math.abs(epochs - e) < 1e-6, s"$lang epochs $epochs vs $e")
      assert(epochs <= cap + 1e-9)
      assert(math.abs(eff - math.floor(e * nTok)) <= 1,
        s"$lang eff_tokens")
      if (freed > 0) assert(epochs === cap, s"$lang freed without cap")
    }
    // temperature flattening: the rarest language gets the most epochs
    val byTok = rows.sortBy(_._2)
    assert(byTok.head._3 >= byTok.last._3)
  }

  test("stratified sample keeps every language near the rarest share") {
    val docs = Tables.load(spark, sf, "documents")
    val minShare = docs.groupBy($"lang").count().agg(min($"count"))
      .head.getLong(0).toDouble
    val kept = Curation.stratifiedSample(spark, sf)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty)
    kept.values.foreach { n =>
      // 2-digit hash buckets: expect ±40% of the target at sf0.001 sizes
      assert(n <= minShare * 1.4 && n >= minShare * 0.4,
        s"per-lang kept count $n far from target $minShare")
    }
  }

  test("budget select: bucketed prefix sums equal a true global cumsum") {
    val rows = Curation.budgetSelect(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the global priority-ordered cumulative sum serially
    val stats = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", split($"text", " ").as("tk"))
      .select($"doc_id", size($"tk").cast("long").as("n_tok"),
        (floor(size(array_distinct($"tk")).cast("double") / size($"tk")
          * 1000000.0 + 0.5).cast("double") / 1000000.0).as("ur"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ordered = stats.sortBy { case (id, _, ur) => (-ur, id) }
    val budget = 0.10 * stats.map(_._2).sum
    var cum = 0L
    val expected = ordered.flatMap { case (id, n, ur) =>
      cum += n
      if (cum <= budget) Some((id, n, ur, cum)) else None
    }.sortBy(_._1).toSeq
    val got = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("curriculum order equals the single-window formulation") {
    val got = Curation.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty)
    // serial reference: one global sort by (surprisal, doc_id), then a
    // running rank + token cumsum
    val s = graft.ops.TextAnalysis.unigramLogprob(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, sur) => (sur, id) }
    var cum = 0L
    val expected = s.zipWithIndex.map { case ((id, nt, sur), i) =>
      cum += nt
      (id, nt, sur, (i + 1).toLong, cum)
    }.toSeq
    assert(got === expected)
    // the schedule is a permutation with strictly increasing cum_tok
    assert(got.map(_._4) === (1L to got.length.toLong))
    assert(got.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
  }

  test("importance weights: target-language docs score above the rest") {
    import spark.implicits._
    val w = graft.ops.Curation.importanceWeights(spark, sf)
    val langs = Tables.load(spark, sf, "documents").select($"doc_id", $"lang")
    val byLang = w.join(langs, "doc_id")
      .groupBy($"lang" === "en").agg(avg($"weight").as("mw"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the whole point of DSIR-style weights: ln(p_en/p_all) is higher
    // on the en sub-corpus than on the rest, on average
    assert(byLang(true) > byLang(false),
      s"en mean ${byLang(true)} !> other mean ${byLang(false)}")
    // n_bigrams = token count - 1, checked on a sample
    val docLens = Tables.load(spark, sf, "documents")
      .select($"doc_id", (size(split($"text", " ")) - 1).cast("long").as("nb"))
    val joined = w.join(docLens, "doc_id")
      .filter($"n_bigrams" =!= $"nb").count()
    assert(joined === 0)
  }

  test("duplicate spans cover text that truly recurs in another doc") {
    import spark.implicits._
    val n = 8
    val spans = graft.ops.Dedup.dupSpans(spark, sf, n).collect()
    assert(spans.nonEmpty)
    val toks = Tables.load(spark, sf, "documents")
      .select($"doc_id", split($"text", " ").as("t")).as[(Long, Seq[String])]
      .collect().toMap
    // per doc: spans are ≥ n tokens, in-bounds, disjoint with gaps
    spans.groupBy(_.getLong(0)).foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.foreach { s =>
        assert(s.getLong(2) - s.getLong(1) + 1 >= n)
        assert(s.getLong(2) < toks(doc).length)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(1) > a.getLong(2) + 1)
        case _ =>
      }
    }
    // every span's FIRST n-gram must appear verbatim in some other doc
    val gramIndex = toks.toSeq.flatMap { case (doc, t) =>
      t.sliding(n).filter(_.length == n).map(g => (g.mkString(" "), doc))
    }.groupBy(_._1).map { case (g, ds) => g -> ds.map(_._2).toSet }
    spans.foreach { s =>
      val doc = s.getLong(0)
      val start = s.getLong(1).toInt
      val gram = toks(doc).slice(start, start + n).mkString(" ")
      assert((gramIndex(gram) - doc).nonEmpty,
        s"span head gram of doc $doc not shared: '$gram'")
    }
  }

  test("split leakage: exactly the cross-split subset of near-dup pairs") {
    import spark.implicits._
    val leaks = Curation.splitLeakage(spark, sf)
      .as[(Long, String, Long, String, Double)].collect()
    assert(leaks.nonEmpty)
    leaks.foreach { case (_, sa, _, sb, j) =>
      assert(sa != sb)
      assert(j >= 0.8)
    }
    val splits = Curation.datasetSplit(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val allPairs = graft.ops.Dedup.minhashLsh(spark, sf)
      .as[(Long, Long, Double)].collect()
    val expected = allPairs.filter { case (a, b, _) =>
      splits(a) != splits(b)
    }.map { case (a, b, j) => (a, splits(a), b, splits(b), j) }.toSet
    assert(leaks.toSet === expected)
  }

  test("knn label check: flags are consistent and majority is a real mode") {
    import spark.implicits._
    val checked = graft.ops.Similarity.knnLabelCheck(spark, sf).collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val frac = r.getDouble(3)
      assert(frac > 0.0 && frac <= 1.0)
      val flagged = r.getLong(4)
      assert(flagged === (if (r.getInt(1) != r.getInt(2)) 1L else 0L))
    }
    // recompute the mode from the graph edges for a consistency check
    val labels = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val edges = graft.ops.Similarity.knnGraph(spark, sf)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect()
    val expected = edges.groupBy(_._1).map { case (v, es) =>
      val counts = es.map(e => labels(e._2))
        .groupBy(identity).map { case (l, o) => (l, o.size) }
      v -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
    }
    checked.foreach { r =>
      assert(r.getInt(2) === expected(r.getLong(0)))
    }
  }

  test("knn pagerank equals an in-memory integer power iteration") {
    import spark.implicits._
    val edges = graft.ops.Similarity.knnGraph(spark, sf)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect()
    val nodes = Tables.load(spark, sf, "embeddings")
      .select($"vec_id").as[Long].collect().sorted
    val n = nodes.length.toLong
    val Scale = 1000000000000L
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val bySrc = edges.groupBy(_._1)
    var r: Map[Long, Long] = nodes.map(_ -> Scale / n).toMap
    val teleport = 3L * Scale / (20L * n)
    for (_ <- 1 to 6) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      bySrc.foreach { case (s, es) =>
        val c = r(s) / outdeg(s)
        es.foreach { case (_, d) => in(d) += c }
      }
      r = nodes.map(v => v -> (teleport + 17L * in(v) / 20L)).toMap
    }
    val got = graft.ops.Similarity.knnGraphPagerank(spark, sf)
      .as[(Long, Long)].collect()
    assert(got.length === n)
    got.foreach { case (v, pr) => assert(pr === r(v), s"vec $v") }
    // mass sanity: everything positive, total ≤ 1.0 (dangling leak only)
    assert(got.forall(_._2 > 0L))
    assert(got.map(_._2).sum <= Scale)
  }

  test("closeness centrality equals an in-memory BFS replay") {
    import spark.implicits._
    val ed = graft.ops.Similarity.knnGraph(spark, sf)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect()
    val adj = (ed ++ ed.map(_.swap)).distinct
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val got = graft.ops.Similarity.knnGraphCloseness(spark, sf).collect()
    assert(got.length === 8)
    got.foreach { r =>
      val seed = r.getAs[Long]("seed_id")
      // serial bounded BFS
      var dist = Map(seed -> 0)
      var frontier = Set(seed)
      for (d <- 1 to 6) {
        val next = frontier.flatMap(adj).diff(dist.keySet)
        dist ++= next.map(_ -> d)
        frontier = next
      }
      val reached = dist.size - 1
      val sumd = dist.values.sum.toLong
      assert(r.getAs[Long]("n_reached") === reached.toLong, s"seed $seed")
      assert(r.getAs[Long]("sum_dist") === sumd, s"seed $seed")
      assert(r.getAs[Long]("ecc") ===
        (if (dist.isEmpty) 0L else dist.values.max.toLong))
      val expect = if (sumd > 0)
        math.floor(reached.toDouble / sumd * 1e6 + 0.5) / 1e6
      else 0.0
      assert(r.getAs[Double]("closeness") === expect, s"seed $seed")
    }
  }

  test("label propagation equals an in-memory 3-round replay") {
    import graft.ops.Similarity
    val edges = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")))
    val truth = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val seeds = truth.keySet.filter(_ % 5 == 0)
    var lbl: Map[Long, Option[Int]] =
      truth.map { case (v, l) => v -> (if (seeds(v)) Some(l) else None) }
    for (_ <- 1 to 3) {
      val votes = edges.flatMap { case (v, n) => lbl(n).map(v -> _) }
        .groupBy(_._1).view.mapValues { vs =>
          vs.groupBy(_._2).view.mapValues(_.length).toSeq
            .sortBy { case (l, c) => (-c, l) }.head._1
        }.toMap
      lbl = truth.map { case (v, l) =>
        v -> (if (seeds(v)) Some(l) else votes.get(v).orElse(None))
      }
    }
    val got = Similarity.knnLabelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length === truth.size)
    got.foreach { case (v, isSeed, l) =>
      assert(isSeed === (if (seeds(v)) 1L else 0L))
      assert(l === lbl(v).getOrElse(-1), s"vec $v")
      if (seeds(v)) assert(l === truth(v)) // seeds frozen
    }
    // propagation actually labels beyond the seed set
    val labeledNonSeed = got.count(g => g._2 == 0L && g._3 != -1)
    assert(labeledNonSeed > 0)
  }

  test("weighted sample: exactly the n smallest integer priorities") {
    import java.security.MessageDigest
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    def prio(id: Long, w: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"wsample:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      java.lang.Long.parseLong(hex, 16) / math.max(w, 1L)
    }
    val expect = docs.map { case (id, w) => (id, prio(id, w)) }
      .sortBy { case (id, p) => (p, id) }.take(200).map(_._1).toSet
    val got = Curation.weightedSample(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === expect)
    // the weighting is real: sampled docs skew long
    val sampledMean = docs.filter(d => got(d._1)).map(_._2.toDouble).sum / 200
    val corpusMean = docs.map(_._2.toDouble).sum / docs.length
    assert(sampledMean > corpusMean)
  }

  test("source quality cap ≡ per-source window top-k") {
    val k = 15
    val got = Curation.sourceQualityCap(spark, sf, k)
    // heap path ≡ the window formulation (the oracle's plan shape)
    val scored = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"source")
      .join(graft.ops.TextAnalysis.quality(spark, sf)
        .select($"doc_id", $"quality"), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"quality".desc, $"doc_id")
    val expect = scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= k)
      .select($"source", $"rnk", $"doc_id", $"quality")
      .collect().map(_.toSeq).toSet
    assert(got.select($"source", $"rnk", $"doc_id", $"quality")
      .collect().map(_.toSeq).toSet === expect)
    // every source retains min(k, its doc count) rows
    val bySource = got.collect().groupBy(_.getString(0))
    bySource.foreach { case (_, rows) =>
      val n = rows.head.getAs[Long]("n_source_docs")
      assert(rows.length === math.min(k.toLong, n))
      // ranks are 1..m and quality is non-increasing along them
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to rows.length).toSeq)
      val qs = sorted.map(_.getAs[Double]("quality")).toSeq
      assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("packed-shard sink: one file per shard, plan-exact, order restorable") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    val plan = Curation.writePackedShards(spark, sf, out, docsPerShard = 100)
      .collect()
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(plan.map(_.getAs[Long]("n_docs")).sum === nDocs)
    // shard dirs on disk match the plan, one parquet file each
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(dirs.length === plan.length)
    dirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${d.getName}: one file per shard")
    }
    // readback: full corpus, shard-local ranks contiguous per the plan
    val back = spark.read.parquet(out)
    assert(back.count() === nDocs)
    val byShard = back.select($"shard_id", $"rank")
      .as[(Long, Long)].collect().groupBy(_._1)
    plan.foreach { p =>
      val sid = p.getAs[Long]("shard_id")
      val ranks = byShard(sid).map(_._2).sorted
      assert(ranks.head === p.getAs[Long]("first_rank"))
      assert(ranks.last === p.getAs[Long]("last_rank"))
      assert(ranks.length === p.getAs[Long]("n_docs"))
      assert(ranks.toSeq === (ranks.head to ranks.last).toSeq,
        s"shard $sid ranks contiguous")
    }
  }

  test("dataset card: shares sum to 1, totals conserve the corpus") {
    val card = Curation.datasetCard(spark, sf).collect()
    val docs = graft.Tables.load(spark, sf, "documents")
    val nDocs = docs.count()
    assert(card.map(_.getAs[Long]("n_docs")).sum === nDocs)
    val pct = card.map(_.getAs[Double]("pct_docs")).sum
    assert(math.abs(pct - 1.0) < 1e-3)
    val chars = docs.agg(sum($"n_chars")).as[Long].collect()(0)
    assert(card.map(_.getAs[Long]("total_chars")).sum === chars)
    card.foreach { r =>
      val d = r.getAs[Double]("dup_rate")
      assert(d >= 0.0 && d < 1.0)
    }
  }

  test("grouped split keeps exact-dup groups together; doc-hash split does not") {
    import spark.implicits._
    // synthesize duplicates: clone 40 docs under shifted doc_ids so
    // content groups have 2 members with far-apart ids (the gate-SF
    // corpora carry no exact dups, which would make this vacuous)
    val docs = Tables.load(spark, sf, "documents")
    val clones = docs.filter($"doc_id" < 40)
      .withColumn("doc_id", $"doc_id" + 100000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft-gsplit").toString
    docs.unionByName(clones).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val grouped = graft.ops.Curation.groupedSplit(spark, tmp).collect()
    val byGroup = grouped.groupBy(_.getAs[Long]("group_id"))
    // every content group lands in ONE split
    byGroup.values.foreach { members =>
      assert(members.map(_.getAs[String]("split")).distinct.length === 1)
    }
    // the cloned groups really have 2 members and min-id group ids
    val dupGroups = byGroup.filter(_._2.length > 1)
    assert(dupGroups.size === 40)
    dupGroups.foreach { case (gid, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min === gid)
      assert(members.forall(_.getAs[Long]("n_group_members") === 2L))
    }
    // the contrast: H2's doc_id-hash split separates at least one of
    // these pairs (id and id+100000 hash independently)
    val h2 = graft.ops.Curation.datasetSplit(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val separated = (0L until 40L).count(i => h2(i) != h2(i + 100000L))
    assert(separated > 0, "doc-hash split kept every dup pair together")
  }

  test("budget waterfill ≡ serial waterfill; allocation exactly exhausts the budget") {
    import spark.implicits._
    val rows = graft.ops.Curation.budgetWaterfill(spark, sf).collect()
    assert(rows.nonEmpty)
    // serial replay from the same per-source supplies
    val avail = Tables.load(spark, sf, "documents")
      .select($"source", size(org.apache.spark.sql.functions.filter(
        split($"text", " "), t => t =!= "")).cast("long").as("n"))
      .groupBy($"source").agg(sum($"n").as("a"))
      .as[(String, Long)].collect().sortBy(r => (r._2, r._1))
    val total = avail.map(_._2).sum
    val budget = total / 2
    val k = avail.length
    var lp = 0L
    var li = 0
    while (lp + avail(li)._2 * (k - li) < budget) { lp += avail(li)._2; li += 1 }
    val level = (budget - lp) / (k - li)
    val rem = (budget - lp) % (k - li)
    val bySource = rows.map(r => r.getAs[String]("source") -> r).toMap
    avail.foreach { case (s, a) =>
      val r = bySource(s)
      assert(r.getAs[Long]("level") === level)
      assert(r.getAs[Long]("alloc") === math.min(a, level), s"alloc($s)")
      assert(r.getAs[Boolean]("saturated") === (a <= level))
      assert(r.getAs[Long]("unallocated") === rem)
    }
    // the defining property: allocations + remainder exhaust the
    // budget exactly, and no source is over-asked
    assert(rows.map(_.getAs[Long]("alloc")).sum + rem === budget)
    rows.foreach(r => assert(
      r.getAs[Long]("alloc") <= r.getAs[Long]("available")))
    // non-trivial at the gate SF: at least one saturated small source
    // OR the level caps at least one large source
    assert(rows.exists(_.getAs[Boolean]("saturated")) ||
      rows.exists(r => r.getAs[Long]("alloc") < r.getAs[Long]("available")))
  }
}
