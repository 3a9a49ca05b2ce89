package graft

import graft.ops.{BpeMerge, Events, TextAnalysis}

/** Specs for the sketch/loop operators added in round 4: count-min
  * heavy hitters (E19), approximate percentiles (B35), and the BPE
  * merge loop (E20) — each checked against an independent exact
  * recomputation, since their driver checks are rows-only or (for
  * CMS) the oracle proves hashing parity but not the sketch bound.
  */
class SketchSpec extends SparkSpecBase {

  test("cms heavy hitters: estimate never underestimates, top-1 is the modal token") {
    val rows = TextAnalysis.cmsHeavyHitters(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2),
        s"CMS underestimated ${r.getString(1)}") // est_cnt >= exact_cnt
    }
    // independent exact recomputation of the modal token
    import spark.implicits._
    val exactTop = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("t"))
      .filter($"t" =!= "").groupBy($"t").count()
      .orderBy($"count".desc, $"t").head()
    assert(rows.head.getString(1) === exactTop.getString(0))
    assert(rows.head.getLong(2) === exactTop.getLong(1))
  }

  test("hash64 column matches driver-side computation") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val key = 0x5EEDC0DEL
    val rows = Seq("alpha", "beta", "gamma").toDF("s")
      .select($"s", graft.functions.hash64($"s", key).as("h")).collect()
    rows.foreach { r =>
      val expected = graft.expressions.Hash64Expr.compute(
        UTF8String.fromString(r.getString(0)), key)
      assert(r.getLong(1) === expected)
    }
  }

  test("approx percentiles: ordered, each within a ±1%-rank window of the data") {
    import spark.implicits._
    val rows = Events.approxPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    // the sketch's contract is RANK error (≤ n/accuracy, here exact),
    // not value error — so assert each approx value lands inside the
    // sorted data within a generous ±1% rank window
    val byType = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, a) => t -> a.map(_._2).sorted }
    rows.foreach { r =>
      val vals = byType(r.getString(0))
      val n = vals.length
      def inWindow(a: Double, q: Double): Boolean = {
        val lo = vals(math.max(0, math.ceil((q - 0.01) * n).toInt - 1))
        val hi = vals(math.min(n - 1, math.floor((q + 0.01) * n).toInt))
        a >= lo && a <= hi
      }
      val (a50, a90, a99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(a50 <= a90 && a90 <= a99)
      assert(inWindow(a50, 0.50) && inWindow(a90, 0.90) && inWindow(a99, 0.99))
    }
  }

  test("bpe merge loop matches a single-threaded reference run") {
    import spark.implicits._
    val got = TextAnalysis.bpeMerges(spark, sf, steps = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // reference: same greedy algorithm, plain Scala over collected corpus
    val freq = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").as[String].collect()
      .flatMap(_.split(" ")).filter(t => t.nonEmpty && t.length >= 2)
      .groupBy(identity).map { case (t, o) => (t.map(_.toString).toSeq, o.length.toLong) }
    var words: Seq[(Seq[String], Long)] = freq.toSeq
    val expected = (1 to 5).flatMap { step =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) None else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        words = words.map { case (syms, f) => (BpeMerge.merge(syms, a, b), f) }
        Some((step.toLong, a, b, cnt))
      }
    }
    assert(got.toSeq === expected)
  }

  test("bpe encode matches a serial replay of the trained merges") {
    import spark.implicits._
    val got = TextAnalysis.bpeEncode(spark, sf, steps = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val merges = TextAnalysis.bpeMerges(spark, sf, steps = 4).collect()
      .map(r => (r.getString(1), r.getString(2)))
    // serial reference: per-doc sum of replayed-merge word lengths
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        val bpe = ws.map(w => BpeMerge.encodedLength(w, merges).toLong).sum
        (id, ws.length.toLong, bpe,
          math.floor(bpe * 1000000.0 / ws.length + 0.5) / 1000000.0)
      }.sortBy(_._1).toSeq
    assert(got.toSeq === expected)
    // merges strictly shrink or preserve every document
    got.foreach { case (_, nWs, nBpe, _) => assert(nBpe >= nWs) }
  }

  test("tokenizer fertility ≡ per-lang rollup of the encode frame") {
    import spark.implicits._
    val encFull = TextAnalysis.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val meta = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect()
    val exp = meta.filter(m => encFull.contains(m._1))
      .groupBy(_._2).map { case (lang, docs) =>
        val words = docs.map(d => encFull(d._1)._1).sum
        val bpe = docs.map(d => encFull(d._1)._2).sum
        val chars = docs.map(_._3.length.toLong).sum
        (lang, docs.length.toLong, words, bpe,
          math.floor(bpe * 1000000.0 / words + 0.5) / 1000000.0,
          math.floor(chars * 1000000.0 / bpe + 0.5) / 1000000.0)
      }.toSet
    val got = TextAnalysis.tokenizerFertility(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSet
    assert(got === exp)
    // fertility ≥ 1 everywhere: a word never encodes below one token
    assert(got.forall(_._5 >= 1.0))
  }

  test("bpe first merge equals the bpe_pair_stats top pair") {
    val firstMerge = TextAnalysis.bpeMerges(spark, sf, steps = 1).head()
    val topPair = TextAnalysis.bpePairStats(spark, sf).head()
    assert(firstMerge.getString(1) + firstMerge.getString(2)
      === topPair.getString(1))
    assert(firstMerge.getLong(3) === topPair.getLong(2))
  }

  test("IVF nprobe sweep: recall monotone, exact at full probe") {
    val rows = graft.ops.Similarity.ivfNprobeSweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 4L, 8L))
    // every config is scored against the same exact top-k set
    assert(rows.map(_.getAs[Long]("n_total")).distinct.length === 1)
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must be monotone in nprobe: $recalls")
    // probing every cell scans the whole corpus: recall is exactly 1
    assert(recalls.last === 1.0, recalls.toString)
    // and the curve is informative: partial probing loses something
    assert(recalls.head < 1.0,
      "nprobe=1 should miss at least one neighbor on this corpus")
  }

  test("IVF cell stats: counts partition the corpus, shares sum to 1") {
    val rows = graft.ops.Similarity.ivfCellStats(spark, sf).collect()
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === n)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // mean-normalized imbalance: the biggest cell is at least average
    assert(rows.map(_.getDouble(3)).max >= 1.0 - 1e-9)
  }

  test("PQ distortion: positive, and more codewords means less error") {
    val fine = graft.ops.Similarity.pqDistortion(spark, sf, ks = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val coarse = graft.ops.Similarity.pqDistortion(spark, sf, ks = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fine.size === 8 && coarse.size === 8)
    assert(fine.values.forall(_ > 0.0))
    // summed over subspaces, a 16-word codebook reconstructs better
    assert(fine.values.sum <= coarse.values.sum + 1e-9,
      s"fine ${fine.values.sum} vs coarse ${coarse.values.sum}")
  }

  test("JL projection: norms preserved in expectation, deterministic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val proj = graft.ops.Similarity.jlProject(spark, sf)
    val pn = proj.groupBy($"vec_id")
      .agg(sum($"value" * $"value").as("pn"))
    val on = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", aggregate($"embedding", lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double")).as("on"))
    val ratios = pn.join(on, "vec_id")
      .select(($"pn" / $"on").as("r")).as[Double].collect()
    assert(ratios.nonEmpty)
    // E[||Pv||^2] = ||v||^2 for the Achlioptas sign matrix: the mean
    // ratio concentrates near 1 even at k=16 (per-vector tails are
    // wide by design -- this is the coarse stage of a two-stage rank)
    val mean = ratios.sum / ratios.length
    assert(mean > 0.85 && mean < 1.15, s"mean ratio $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0))
    // deterministic sign matrix: a second run is bit-identical
    val a = proj.collect().map(_.toSeq)
    val b = graft.ops.Similarity.jlProject(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("MMR: ≡ serial greedy replay, and more diverse than plain top-k") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = graft.ops.Similarity.mmrDiversifiedTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val vecs = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    // serial replay per query: same shortlist (m=16 by cos desc, id
    // asc), same greedy argmax
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val qv = vecs(qid)
      val shortlist = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(16)
      val ids = shortlist.map(_._1).toArray
      val rel = shortlist.map(_._2).toArray
      var selected = List.empty[Int]
      val expect = (1 to 5).map { _ =>
        val scored = ids.indices.filterNot(selected.contains).map { c =>
          val red = if (selected.isEmpty) 0.0
            else selected.map(s => cos(vecs(ids(c)), vecs(ids(s)))).max
          (c, 0.5 * rel(c) - 0.5 * red)
        }
        val (best, sc) = scored.maxBy { case (c, s) => (s, -ids(c)) }
        selected ::= best
        (ids(best), math.floor(sc * 1e6 + 0.5) / 1e6)
      }
      val mine = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(mine === expect, s"query $qid")
      // diversity: MMR's selected set has lower mean pairwise sim
      // than the plain top-5 (which drags in near-duplicates)
      def meanPairSim(sel: Seq[Long]): Double = {
        val ps = for {
          i <- sel.indices; j <- (i + 1) until sel.length
        } yield cos(vecs(sel(i)), vecs(sel(j)))
        ps.sum / ps.length
      }
      val mmrSel = mine.map(_._1)
      val topkSel = shortlist.take(5).map(_._1)
      assert(meanPairSim(mmrSel) <= meanPairSim(topkSel) + 1e-9,
        s"query $qid: MMR not more diverse")
    }
  }

  test("JL distortion report agrees with the projection it audits") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rep = graft.ops.Similarity.jlDistortion(spark, sf).collect()
    assert(rep.length === 32 * 31 / 2)
    val ratios = rep.map(_.getAs[Double]("ratio"))
    assert(ratios.forall(_ > 0.0))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean")
    // cross-check one pair's projected distance against the D24 output
    val p = graft.ops.Similarity.jlProject(spark, sf)
      .filter($"vec_id" < 2).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Long]("dim")).map(_.getAs[Double]("value"))
      }
    val d2 = p(0L).zip(p(1L)).map { case (x, y) => (x - y) * (x - y) }.sum
    val row01 = rep.find(r => r.getAs[Long]("vec_a") == 0L &&
      r.getAs[Long]("vec_b") == 1L).get
    assert(math.abs(row01.getAs[Double]("proj_d2") - d2) < 1e-9)
  }
}
