package graft

import org.apache.spark.sql.functions.{size, split, transform}

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenShift single-pass counts match the two-pass reference") {
    // r14 rewrote tokenShift from two corpus explode+count passes
    // (full and keeper-semi-joined) + a token-keyed join into ONE
    // flagged pass; this pins the rewrite row-for-row against the old
    // shape computed independently here.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sf, "documents")
    val keepers = Dedup.clusterKeepers(spark, sf)
      .select(col("keeper_id").as("doc_id"))
    def counts(d: org.apache.spark.sql.DataFrame) = d
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val full = counts(docs)
    val kept = counts(docs.join(keepers, Seq("doc_id"), "left_semi"))
    val nf = full.agg(sum(col("c"))).collect()(0).getLong(0).toDouble
    val nk = kept.agg(sum(col("c"))).collect()(0).getLong(0).toDouble
    val ref = full.join(kept.select(col("t"), col("c").as("ck")),
        Seq("t"), "left").na.fill(0L, Seq("ck")).collect()
      .map { r =>
        val (t, c, ck) = (r.getString(0), r.getLong(1), r.getLong(2))
        val d = math.floor((ck / nk - c / nf) * 1e6 + 0.5) / 1e6
        (t, c, ck, d)
      }
      .sortBy { case (t, _, _, d) => (-math.abs(d), t) }.take(20)
      .map { case (t, c, ck, d) => (t, c, ck, d) }.toSeq
    val got = Dedup.tokenShift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(5))).toSeq
    assert(got === ref)
  }

  test("exact dedup groups by content hash, keeps min id") {
    val rows = Dedup.exact(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum === 500L) // total docs preserved
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("minhash LSH finds the same pairs as brute force") {
    val lsh = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute, "LSH must recall every brute-force pair here")
    assert(lsh.nonEmpty, "test corpus has planted near-dups")
  }

  test("simhash: near-dup docs collide within small hamming distance") {
    val pairs = Dedup.simhashPairs(spark, sf, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every high-jaccard pair should be hamming-close in simhash space
    val nearDups = Dedup.minhashLsh(spark, sf, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = nearDups.count(pairs.contains)
    assert(nearDups.isEmpty ||
      caught.toDouble / nearDups.size >= 0.8,
      s"simhash caught $caught of ${nearDups.size} jaccard>=0.9 pairs")
  }

  test("simhash is deterministic and insensitive to tiny perturbation") {
    import graft.expressions.{SimHash64 => SH}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def sim(tokens: Seq[String]): Long =
      SH.compute(new GenericArrayData(
        tokens.map(t => UTF8String.fromString(t)).toArray))
    val base = Seq.tabulate(60)(i => s"tok$i")
    val perturbed = base.updated(3, "changed")
    val h1 = sim(base); val h2 = sim(base); val h3 = sim(perturbed)
    assert(h1 === h2)
    assert(java.lang.Long.bitCount(h1 ^ h3) <= 16,
      "one-token change flips few bits")
  }

  test("knn IVF with full probing equals brute force exactly") {
    val exact = Similarity.knnBruteForce(spark, sf).collect().toSeq
    val full = Similarity.knnIvf(spark, sf, cells = 8, nprobe = 8)
      .collect().toSeq
    assert(full === exact, "nprobe=cells must degrade to exact search")
  }

  test("knn IVF pruned probing keeps useful recall on this corpus") {
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.knnIvf(spark, sf, cells = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    // the test corpus is near-isotropic (top-5 cosine ≈ 0.3–0.5), so
    // pruning to half the cells keeps roughly half-plus of the hits
    assert(recall >= 0.4, s"IVF recall $recall below 0.4")
  }

  test("knn PQ: deterministic, retrieves planted copies, beats chance recall") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pq = Similarity.knnPq(spark, sf).collect()
    assert(pq.map(_.getLong(0)).distinct.length === 10)
    // determinism: codebooks are seeded, no RNG anywhere
    assert(Similarity.knnPq(spark, sf).collect().toSeq === pq.toSeq)
    // planted-copy regime (PQ's actual claim for byte codes): an exact
    // copy encodes to the query's own codes, so its ADC distance is
    // the attainable minimum and it must surface at rank 1
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val planted = vecs.union(
      vecs.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 10000L))
    val res = Similarity.knnPqOn(planted, k = 1, numQueries = 5,
      m = 8, ks = 16, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (q <- 0 until 5)
      assert(res(q.toLong) === q + 10000L,
        s"query $q must find its planted copy, got ${res(q.toLong)}")
    // recall vs exact L2 on the unmodified corpus: this data is
    // near-isotropic (max pairwise cosine ≈ 0.5), so distance contrast
    // is tiny and no 8-byte code can rank the true top-5 highly —
    // assert the ADC ordering still carries >10× chance-level signal
    // (chance: 5/499 ≈ 0.01)
    val arr = vecs.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = arr.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> arr.filter(_._1 != qid).map { case (id, v) => (d2(qv, v), id) }
        .sortBy(t => (t._1, t._2)).take(5).map(_._2).toSet
    }.toMap
    val got = pq.groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recall = exact.map { case (q, ids) =>
      ids.count(got(q).contains).toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.1, s"PQ recall $recall not above chance")
  }

  test("knn IVF-PQ: deterministic, planted copies at rank 1, recall above chance") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val res = Similarity.knnIvfPq(spark, sf).collect()
    assert(res.map(_.getLong(0)).distinct.length === 10)
    // determinism: sampled training + seeded hash order, no RNG
    assert(Similarity.knnIvfPq(spark, sf).collect().toSeq === res.toSeq)
    // planted copies: an exact copy lands in the query's own cell with
    // the query's own residual codes, so its ADC distance is the
    // attainable minimum and it must surface at rank 1 even at nprobe=1
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val planted = vecs.union(
      vecs.filter($"vec_id" < 5).withColumn("vec_id", $"vec_id" + 10000L))
    val got = Similarity.knnIvfPqOn(planted, k = 1, numQueries = 5,
      cells = 8, nprobe = 1, m = 8, ks = 16, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (q <- 0 until 5)
      assert(got(q.toLong) === q + 10000L,
        s"query $q must find its planted copy, got ${got(q.toLong)}")
    // recall vs exact L2: near-isotropic corpus (see the PQ spec), so
    // assert the pruned+quantized ordering still beats chance (≈0.01)
    val arr = vecs.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = arr.filter(_._1 < 10).map { case (qid, qv) =>
      qid -> arr.filter(_._1 != qid).map { case (id, v) => (d2(qv, v), id) }
        .sortBy(t => (t._1, t._2)).take(5).map(_._2).toSet
    }.toMap
    val gotSets = res.groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val recall = exact.map { case (q, ids) =>
      ids.count(gotSets(q).contains).toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.1, s"IVF-PQ recall $recall not above chance")
  }

  test("knn LSH retrieves planted exact duplicates (its regime)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .withColumn("v", transform($"embedding", x => x.cast("double")))
      .select($"vec_id", $"v")
    // plant copies of vectors 0..4 as ids 10000..10004
    val copies = vecs.filter($"vec_id" < 5)
      .withColumn("vec_id", $"vec_id" + 10000L)
    val corpus = vecs.union(copies)
    val res = Similarity.knnLshOn(corpus, k = 1, numQueries = 5, planes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (q <- 0 until 5)
      assert(res(q.toLong) === q + 10000L,
        s"query $q must find its planted copy, got ${res(q.toLong)}")
  }

  test("semantic dedup: greedy keep-lowest-id matches an in-memory per-cell reference") {
    import spark.implicits._
    val res = Dedup.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2))))
    val byId = res.toMap
    // every vector appears exactly once with a kept verdict
    assert(res.length === graft.Tables.load(spark, sf, "embeddings").count())
    // re-derive the greedy drop set from the SAME cell assignment
    // (collect cells + vectors, brute-force within-cell cosine)
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val byCell = byId.toSeq.groupBy(_._2._1)
    for ((_, members) <- byCell) {
      val ids = members.map(_._1).sorted
      val expectedDropped = ids.filter(idB =>
        ids.exists(idA => idA < idB && cos(vecs(idA), vecs(idB)) >= 0.45)).toSet
      for (id <- ids)
        assert(byId(id)._2 === !expectedDropped.contains(id),
          s"vec $id kept=${byId(id)._2} disagrees with reference")
    }
    // determinism: a second run produces the identical verdict set
    val again = Dedup.semanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2))))
    assert(again.toSeq === res.toSeq)
  }

  test("knn SQ8: rescored results track exact search at rank 1") {
    import spark.implicits._
    val exact = Similarity.knnBruteForce(spark, sf).filter($"rnk" === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val sq8 = Similarity.knnSq8(spark, sf).filter($"rnk" === 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(sq8.keySet === exact.keySet)
    // int8 quantization is mild (|err| <= scale/2 per dim) and stage 2
    // rescores with exact floats — rank-1 should almost always agree
    val agree = exact.keys.count(q => sq8(q) == exact(q))
    assert(agree >= 8, s"rank-1 agreement $agree/10 below 8/10")
  }

  test("containment pairs: prefix filter is lossless vs brute force") {
    import spark.implicits._
    val got = Dedup.containmentPairs(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty)
    // brute-force reference over the same bounded doc set
    val sh = Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 2500)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .as[(Long, Seq[String])].collect()
      .map { case (id, t) =>
        id -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
    val expected = (for {
      (a, sa) <- sh; (b, sb) <- sh if a != b
      inter = (sa & sb).size if inter * 10000 >= sa.size * 9000
    } yield (a, b,
      math.floor(inter.toDouble / sa.size * 10000.0 + 0.5) / 10000.0)).toSet
    assert(got === expected)
    // asymmetry is real: at least one pair contained only one way
    assert(got.exists { case (a, b, _) => !got.exists(p => p._1 == b && p._2 == a) })
  }

  test("distributed kmeans: inertia non-increasing, exact final argmin, full partition") {
    import spark.implicits._
    val vecs = Tables.load(spark, sf, "embeddings")
      .withColumn("v", transform($"embedding", x => x.cast("double")))
      .select($"vec_id", $"v")
    val (cents, assigned, inertias) =
      graft.ops.Similarity.kmeansFit(vecs, k = 8, iters = 3)
    // Lloyd guarantee: each (assign, update) round can only lower inertia
    assert(inertias.sliding(2).forall(p => p.length < 2 || p(1) <= p(0) + 1e-9),
      s"inertia increased: $inertias")
    val rows = assigned.select($"vec_id", $"v", $"cell")
      .as[(Long, Seq[Double], Int)].collect()
    assert(rows.length === vecs.count())
    // every vector sits in its true nearest final centroid's cell
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.foreach { case (id, v, cell) =>
      val best = cents.minBy { case (i, c) => (d2(v, c), i) }._1
      assert(cell === best, s"vec $id in $cell, nearest is $best")
    }
    // registry artifact: one row per non-empty cluster, sizes sum to n
    val out = graft.ops.Similarity.embeddingKmeans(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum === rows.length)
  }

  test("sq8 quantization: all-zero vector yields zero codes, never NaN") {
    import spark.implicits._
    val df = Seq(
      (0L, Array.fill(8)(0.0)),
      (1L, Array.tabulate(8)(i => (i - 4) / 4.0))).toDF("vec_id", "v")
    val rows = Similarity.sq8Codes(df).orderBy($"vec_id").collect()
    val zero = rows(0)
    assert(!zero.getDouble(zero.fieldIndex("scale")).isNaN)
    assert(zero.getSeq[Int](zero.fieldIndex("codes")).forall(_ == 0))
    val nonzero = rows(1)
    val codes = nonzero.getSeq[Int](nonzero.fieldIndex("codes"))
    // v = [-1, -0.75, …, 0.75]; floor(x*127 + 0.5): -1 → -127, 0.75 → 95
    assert(codes.min === -127 && codes.max === 95)
    assert(codes.forall(c => c >= -127 && c <= 127))
  }

  test("knn graph: planted twins are mutual rank-1, edges sane, partial-agg plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .withColumn("v", transform($"embedding", x => x.cast("double")))
      .select($"vec_id", $"v")
    val copies = vecs.filter($"vec_id" < 5)
      .withColumn("vec_id", $"vec_id" + 10000L)
    val corpus = vecs.union(copies)
    val df = Similarity.knnGraphOn(corpus, k = 3, planes = 12)
    val rows = df.collect()
    val rank1 = rows.filter(_.getLong(1) == 1L)
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // identical vectors share a bucket by construction → each twin is
    // the other's rank-1 neighbor, in BOTH directions
    for (q <- 0L until 5L) {
      assert(rank1(q) === q + 10000L, s"src $q rank-1 is ${rank1(q)}")
      assert(rank1(q + 10000L) === q, s"src ${q + 10000L} rank-1 is ${rank1(q + 10000L)}")
    }
    // no self edges, ranks within 1..k
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3))
    // the rollup must be the two-phase k-bounded heap, not a window sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("RunningWindowFunction"))
  }

  test("multi-table LSH beats single-table in the mid-similarity band") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .withColumn("v", transform($"embedding", x => x.cast("double")))
      .select($"vec_id", $"v")
    // plant mid-similarity neighbors (cosine ≈ 0.85): mix each vector
    // with its shifted self
    val mixed = vecs.filter($"vec_id" < 5)
      .withColumn("v", transform($"v",
        (x, i) => x + lit(0.6) * element_at($"v", (i + 1) % 64 + 1)))
      .withColumn("vec_id", $"vec_id" + 20000L)
    val corpus = vecs.union(mixed)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val top = df.filter($"rnk" === 1).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
      (0 until 5).count(q => top.get(q.toLong).contains(q + 20000L)) / 5.0
    }
    val multi = recallOf(graft.ops.Similarity.knnLshMultiOn(
      corpus, k = 1, numQueries = 5, tables = 8, planes = 8))
    val single = recallOf(graft.ops.Similarity.knnLshOn(
      corpus, k = 1, numQueries = 5, planes = 16))
    assert(multi >= single,
      s"multi-table recall $multi below single-table $single")
    assert(multi >= 0.6, s"multi-table recall $multi below 0.6")
  }

  test("cluster keepers: one per cluster, max quality, min-id tiebreak, corpus partition") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val keepers = Dedup.clusterKeepers(spark, sf).cache()
    val labels = Dedup.clusters(spark, sf)
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    // every doc lands in exactly one cluster: sizes sum to the corpus
    assert(keepers.agg(sum($"cluster_size")).head().getLong(0) === nDocs)
    // clustered docs keep exactly one representative from THEIR cluster
    val k = keepers.select($"cluster_id", $"keeper_id", $"keeper_quality")
    val q = graft.ops.TextAnalysis.quality(spark, sf)
      .select($"doc_id", $"quality")
    val joined = labels.select($"doc_id", $"cluster_id").join(q, "doc_id")
      .join(k, "cluster_id")
    // no cluster member outranks its keeper (higher quality, or equal
    // quality with a smaller id)
    assert(joined.filter($"quality" > $"keeper_quality" ||
      ($"quality" === $"keeper_quality" && $"doc_id" < $"keeper_id"))
      .count() === 0)
    // keeper is a member of its own cluster (or the singleton itself)
    val members = labels.select($"cluster_id", $"doc_id").union(
      graft.Tables.load(spark, sf, "documents")
        .select($"doc_id".as("cluster_id"), $"doc_id"))
    assert(k.join(members,
      k("cluster_id") === members("cluster_id") &&
        k("keeper_id") === members("doc_id"), "left_anti").count() === 0)
    keepers.unpersist()
  }

  test("cluster labels are transitive minima over the pair graph") {
    val pairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // both endpoints of every pair share a cluster id, which is the
    // min of the cluster's members
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 === clusters(b)._1, s"pair ($a,$b) split")
    }
    clusters.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid label not the min id")
      assert(members.head._2._2 === members.size.toLong)
    }
    // corpus has chained dups: at least one cluster of size >= 3
    assert(clusters.values.map(_._2).max >= 3L,
      "expected a transitive chain in the planted dups")
  }

  test("ann recall report: exact counts, sq8 dominates, totals = queries x k") {
    import spark.implicits._
    val rep = Similarity.annRecallReport(spark, sf)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(rep.map(_._1).toSeq === Seq("lsh", "lsh_multi", "sq8"))
    rep.foreach { case (m, hits, total, recall) =>
      assert(total === 50L, s"$m total")
      assert(hits >= 0L && hits <= total)
      assert(math.abs(recall - math.floor(
        hits.toDouble / total * 1000000.0 + 0.5) / 1000000.0) === 0.0)
    }
    val byM = rep.map(r => r._1 -> r._4).toMap
    // multi-table LSH can only add candidate tables vs one table of
    // more planes; rescored sq8 tracks exact search on this corpus
    assert(byM("sq8") >= byM("lsh_multi"))
  }

  test("driver union-find and distributed propagation produce identical clusters") {
    val fast = Dedup.clusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val dist = Dedup.clusters(spark, sf, driverCcMaxEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(fast.nonEmpty && fast === dist)
  }

  test("langid predicts mostly en on english-stopword corpus") {
    val rows = TextAnalysis.langId(spark, sf).collect()
    val en = rows.count(_.getString(6) == "en")
    assert(en.toDouble / rows.length > 0.5)
  }

  test("incremental dedup equals the plain anti-join formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, expr, lit, md5, min}
    val got = Dedup.incremental(spark, sf).collect().toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", md5($"text").as("content_hash"))
    val cut = docs.agg(expr("max(doc_id) DIV 2")).head().getLong(0)
    val expected = docs.filter($"doc_id" >= cut)
      .join(docs.filter($"doc_id" < cut).select($"content_hash"),
        Seq("content_hash"), "left_anti")
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_batch_copies"))
      .orderBy($"keeper_id").collect().toSeq
    assert(got === expected)
  }

  test("multimodal decode stub batches per partition deterministically") {
    val feats = Multimodal.decodeStub(spark, sf).collect()
    assert(feats.length === 500)
    assert(feats.forall(_.feature_dim === 16))
    assert(feats.forall(_.feature_norm > 0))
    val again = Multimodal.decodeStub(spark, sf).collect()
    assert(feats.map(f => (f.doc_id, f.feature_norm)).toMap ===
      again.map(f => (f.doc_id, f.feature_norm)).toMap)
  }

  test("media chunk-signature dedup equals an in-memory recompute, groups are real collisions") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val mtype = Map(0L -> "image/png", 1L -> "audio/wav", 2L -> "video/mp4")
    val expected = docs
      .map { case (id, t) =>
        (mtype(id % 3), md5hex(t.take(128)), id, md5hex(t))
      }
      .groupBy(r => (r._1, r._2))
      .collect { case ((m, sig), rows) if rows.length > 1 =>
        (m, sig, rows.length.toLong, rows.map(_._3).min,
          rows.map(_._4).distinct.length.toLong)
      }.toSeq.sorted
    val got = Multimodal.mediaDedup(spark, sf)
      .as[(String, String, Long, Long, Long)].collect().toSeq.sorted
    assert(got.nonEmpty && got === expected)
    // the signature catches near-dups the full hash misses on this
    // corpus: at least one group is not byte-identical
    assert(got.exists(_._5 > 1L))
  }

  test("dedup-adjusted temperature mix recomputed from kept counts") {
    import spark.implicits._
    val kept = Dedup.dedupLangRetention(spark, sf)
      .select($"lang", $"n_kept").as[(String, Long)].collect().toMap
    val z = kept.values.map(n => math.pow(n.toDouble, 0.3)).sum
    val tot = kept.values.sum.toDouble
    val got = graft.ops.Curation.dedupTemperatureMix(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(got.map(_._1).sorted.toSeq === kept.keys.toSeq.sorted)
    got.foreach { case (lang, n, p, up) =>
      assert(n === kept(lang))
      val w = math.pow(n.toDouble, 0.3)
      assert(math.abs(p - w / z) <= 1e-5, s"$lang p_sample")
      assert(math.abs(up - w / z * tot / n) <= 1e-5, s"$lang up_factor")
    }
    // temperature flattens: sampled share of the largest language is
    // below its natural share, smallest above
    val maxL = kept.maxBy(_._2)._1
    val minL = kept.minBy(_._2)._1
    val byLang = got.map(r => r._1 -> r._3).toMap
    assert(byLang(maxL) < kept(maxL) / tot)
    assert(byLang(minL) > kept(minL) / tot)
  }

  test("threshold sweep: monotone counts, 0.8 row equals the C4 pair pass") {
    import spark.implicits._
    val rows = Dedup.thresholdSweep(spark, sf)
      .as[(Double, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0.7, 0.8, 0.9))
    // raising the threshold can only shrink every count
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3 && hi._4 <= lo._4)
    case _ => }
    // internal consistency: removed <= affected <= 2 * pairs
    rows.foreach { case (_, p, aff, rem) =>
      assert(rem <= aff && aff <= 2 * p && (p == 0 || rem >= 1))
    }
    // the 0.8 row is exactly the standalone C4 operator's pair count
    val c4 = Dedup.ngramJaccard(spark, sf, threshold = 0.8).count()
    assert(rows.find(_._1 == 0.8).get._2 === c4)
  }

  test("near-dup contamination equals brute force against the benchmark slice") {
    import spark.implicits._
    val got = Dedup.contaminationNearDup(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    val sh = Tables.load(spark, sf, "documents")
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .as[(Long, Seq[String])].collect()
      .map { case (id, t) =>
        id -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
    val (bench, corpus) = sh.partition(_._1 < 50L)
    val expected = (for {
      (b, sb) <- bench; (c, sc) <- corpus
      inter = (sb & sc).size.toDouble
      j = inter / (sb.size + sc.size - inter) if j >= 0.8
    } yield (c, b, math.floor(j * 10000.0 + 0.5) / 10000.0)).toSet
    assert(got === expected)
    assert(got.nonEmpty) // the check is not vacuous on this corpus
    got.foreach { case (c, b, j) =>
      assert(c >= 50L && b < 50L && j >= 0.8)
    }
  }

  test("diversity sample: buckets partition the corpus, rep is the min member") {
    import spark.implicits._
    val rows = graft.ops.Similarity.diversitySample(spark, sf)
      .as[(Long, Long, Long)].collect()
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum === n) // every vector in exactly one bucket
    assert(rows.map(_._1).distinct.length === rows.length)
    // representatives are distinct vectors, one per bucket
    assert(rows.map(_._3).distinct.length === rows.length)
    // dense regions collapse: at least one bucket holds >1 member
    assert(rows.exists(_._2 > 1L))
  }

  test("embedding PCA matches a serial power-iteration replay") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(transform($"embedding", x => x.cast("double")).as("v"))
      .as[Seq[Double]].collect().map(_.toArray)
    val d = 64
    val n = vecs.length.toDouble
    val mu = Array.tabulate(d)(j => vecs.map(_(j)).sum / n)
    val totVar = (0 until d).map { j =>
      vecs.map(x => x(j) * x(j)).sum / n - mu(j) * mu(j)
    }.sum
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var lambda = 0.0
    for (_ <- 1 to 5) {
      val av = Array.fill(d)(0.0)
      vecs.foreach { x =>
        val c = Array.tabulate(d)(j => x(j) - mu(j))
        val s = (0 until d).map(j => c(j) * v(j)).sum
        (0 until d).foreach(j => av(j) += c(j) * s)
      }
      (0 until d).foreach(j => av(j) /= n)
      val norm = math.sqrt(av.map(x => x * x).sum)
      lambda = av.zip(v).map { case (a, b) => a * b }.sum
      v = av.map(_ / norm)
    }
    val flip =
      if (v(v.zipWithIndex.maxBy { case (x, _) => math.abs(x) }._2) < 0) -1.0
      else 1.0
    val expV = v.map(_ * flip)
    val got = Similarity.embeddingPca(spark, sf)
      .as[(Long, Double)].collect().toMap
    val gotV = Array.tabulate(d)(j => got(j.toLong))
    val cos = expV.zip(gotV).map { case (a, b) => a * b }.sum /
      (math.sqrt(expV.map(x => x * x).sum) *
        math.sqrt(gotV.map(x => x * x).sum))
    assert(cos > 0.999999, s"component misaligned: cos=$cos")
    val expRatio = lambda / totVar
    assert(math.abs(got(-1L) - expRatio) < 1e-4,
      s"explained-variance ratio ${got(-1L)} vs $expRatio")
    assert(expRatio > 0.0 && expRatio <= 1.0 + 1e-9)
  }

  test("boilerplate report ≡ serial window recount") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    // serial recompute: 16-token windows, per-source distinct-doc ≥ 3
    val wins = docs.flatMap { case (id, src, text) =>
      val t = text.split(" ", -1)
      t.grouped(16).filter(_.length == 16)
        .map(w => (id, src, w.mkString(" "))).toSeq
    }
    val common = wins.groupBy(w => (w._2, w._3))
      .filter(_._2.map(_._1).distinct.length >= 3).keySet
    val exp = wins.groupBy(_._1).map { case (id, ws) =>
      val boiler = ws.count(w => common((w._2, w._3)))
      (id, ws.length.toLong, boiler.toLong,
        boiler * 10 <= ws.length * 3)
    }.toSet
    val got = graft.ops.Dedup.boilerplateReport(spark, sf)
      .select($"doc_id", $"n_windows", $"n_boiler", $"keep")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got === exp)
    assert(got.nonEmpty)
  }

  test("minhash estimator report ≡ serial signature replay") {
    import java.security.MessageDigest
    import org.apache.spark.sql.functions._
    def h48(s: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val t = text.split(" ", -1)
        val sh = (1 to math.max(t.length - 2, 1))
          .map(i => t.slice(i - 1, i + 2).mkString(" ")).distinct
        (id, sh)
      }.filter(_._2.nonEmpty).toMap
    // serial sigs for the pairs the operator emitted
    val got = graft.ops.Dedup.minhashEstimator(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      def sig(id: Long): Seq[Long] = (0 until 16).map(i =>
        docs(id).map(s => h48(s"$i:$s")).min)
      val agree = sig(a).zip(sig(b)).count { case (x, y) => x == y }
      val est = math.floor(agree.toDouble / 16 * 10000.0 + 0.5) / 10000.0
      assert(r.getAs[Double]("estimate") === est, s"pair ($a,$b)")
      val sa = docs(a).toSet; val sb = docs(b).toSet
      val i = sa.intersect(sb).size.toDouble
      val u = sa.union(sb).size.toDouble
      assert(r.getAs[Double]("jaccard") ===
        math.floor(i / u * 10000.0 + 0.5) / 10000.0)
    }
  }

  test("embedding norm audit ≡ serial recompute") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.load(spark, sf, "embeddings")
      .select($"label", $"embedding").as[(Int, Seq[Float])].collect()
    val exp = vecs.groupBy(_._1).map { case (label, vs) =>
      val scaled = vs.map { case (_, e) =>
        val norm = math.sqrt(e.foldLeft(0.0)((acc, x) =>
          acc + x.toDouble * x.toDouble))
        math.floor(norm * 10000.0 + 0.5).toLong
      }
      val n = scaled.length.toLong
      val ss = scaled.sum
      val ss2 = scaled.map(s => s * s).sum
      (label, n, scaled.count(_ == 0L).toLong,
        math.floor(ss.toDouble / n + 0.5) / 10000.0,
        math.floor(math.sqrt(
          (ss2.toDouble - ss.toDouble * ss / n) / n) + 0.5) / 10000.0,
        scaled.min.toDouble / 10000.0, scaled.max.toDouble / 10000.0)
    }.toSet
    val got = graft.ops.Similarity.embeddingNormAudit(spark, sf)
      .select($"label", $"n_vecs", $"n_zero_vecs", $"mean_norm",
        $"std_norm", $"min_norm", $"max_norm")
      .as[(Int, Long, Long, Double, Double, Double, Double)]
      .collect().toSet
    assert(got === exp)
    // dims are consistent on this corpus
    val dims = graft.ops.Similarity.embeddingNormAudit(spark, sf)
      .select($"dim_min", $"dim_max").as[(Long, Long)].collect()
    assert(dims.forall { case (a, b) => a === 64L && b === 64L })
  }

  test("lsh tuning: monotone recall/cost, true pairs match the sweep") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Dedup.lshTuning(spark, sf).collect()
      .sortBy(_.getAs[Long]("bands"))
    assert(rows.map(_.getAs[Long]("bands")).toSeq === Seq(2L, 4L, 8L))
    // one fixed signature budget: more bands = fewer rows per band
    assert(rows.map(r => r.getAs[Long]("bands") *
      r.getAs[Long]("rows_per_band")).distinct.toSeq === Seq(16L))
    // the same exact true-pair set evaluates every config
    assert(rows.map(_.getAs[Long]("n_true_pairs")).distinct.length === 1)
    // C15's sweep at t=0.8 counts the identical pair set
    val sweep08 = graft.ops.Dedup.thresholdSweep(spark, sf)
      .filter($"threshold" === 0.8).select($"n_pairs")
      .as[Long].collect().head
    assert(rows.head.getAs[Long]("n_true_pairs") === sweep08)
    // permissiveness is monotone in bands: recall and bucket work rise
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    val work = rows.map(_.getAs[Long]("bucket_pair_work")).toSeq
    assert(work.zip(work.tail).forall { case (a, b) => a <= b })
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    // the closed-form thresholds bracket sensibly: more bands = looser
    val at = rows.map(_.getAs[Double]("approx_threshold")).toSeq
    assert(at.zip(at.tail).forall { case (a, b) => a > b })
  }

  test("sorted-neighborhood: exact-verified pairs, measured recall floor") {
    import spark.implicits._
    val sn = graft.ops.Dedup.sortedNeighborhood(spark, sf).collect()
    assert(sn.nonEmpty)
    val pairs = sn.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.distinct.length === pairs.length)
    sn.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      // precision is 1.0 BY CONSTRUCTION: every emitted pair passed
      // the exact integer Jaccard gate on full shingle sets
      assert(r.getAs[Long]("i") * 10000 >= r.getAs[Long]("u") * 8000)
      assert(r.getAs[Long]("rank_dist") >= 1 &&
        r.getAs[Long]("rank_dist") <= 7)
    }
    // measured recall vs the exhaustive t=0.8 truth (C15's sweep):
    // two-pass SN with w=8 recovers most of it on this corpus — the
    // documented trade for replacing per-gram joins with one sort
    val truth = graft.ops.Dedup.thresholdSweep(spark, sf)
      .filter($"threshold" === 0.8).select($"n_pairs")
      .as[Long].collect().head
    assert(sn.length <= truth)
    assert(sn.length.toDouble / truth >= 0.6,
      s"recall ${sn.length}/$truth below the measured floor")
  }

  test("CDC chunking: byte conservation, and cuts survive a shift") {
    import spark.implicits._
    val rows = graft.ops.Multimodal.mediaCdcDedup(spark, sf).collect()
    assert(rows.length === 3)
    // conservation: chunk bytes per type == total payload chars
    val expected = Tables.load(spark, sf, "documents")
      .selectExpr("element_at(array('image/png','audio/wav','video/mp4')," +
        " cast(doc_id % 3 + 1 as int)) as mt", "n_chars")
      .groupBy($"mt").agg(org.apache.spark.sql.functions.sum($"n_chars"))
      .as[(String, Long)].collect().toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("total_bytes") ===
        expected(r.getAs[String]("media_type")))
      assert(r.getAs[Double]("dedup_ratio") > 0.0 &&
        r.getAs[Double]("dedup_ratio") <= 1.0)
      assert(r.getAs[Long]("n_distinct_chunks") <= r.getAs[Long]("n_chunks"))
    }
    // the content-defined property: chunk a text and a 3-char-shifted
    // copy serially; far more chunk hashes survive than fixed-offset
    // chunking could retain (every fixed 32-byte frame moves)
    def chunksOf(s: String): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def h48(w: String): Long = {
        val hex = md.digest(w.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 12), 16)
      }
      val bs = (1 to s.length).filter(i =>
        i == 1 || (i + 7 <= s.length && h48(s.substring(i - 1, i + 7)) % 32 == 0))
      bs.zip(bs.tail :+ (s.length + 1)).map { case (a, b) =>
        s.substring(a - 1, b - 1)
      }
    }
    val text = Tables.load(spark, sf, "documents")
      .orderBy($"n_chars".desc).select($"text").as[String].head()
    val base = chunksOf(text).toSet
    val shifted = chunksOf("xy " + text).toSet
    val survived = base.intersect(shifted).size.toDouble / base.size
    assert(survived > 0.5, s"only $survived of chunks survived the shift")
  }

  test("KMV sketch: exact below k, bounded estimator error above k") {
    val rows = graft.ops.Dedup.kmvOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ndA, estA) = (r.getAs[Long]("nd_a"), r.getAs[Double]("est_a"))
      // unsaturated sketch holds the whole set -> estimate IS the count
      if (ndA <= 16) assert(estA === ndA.toDouble)
      // saturated: KMV relative error ~1/sqrt(k); generous 2-sigma cap
      else assert(math.abs(estA - ndA) / ndA < 0.5, s"$ndA vs $estA")
      // internal consistency of the pairwise report
      assert(r.getAs[Double]("est_union") > 0.0)
      assert(r.getAs[Double]("est_inter") >= 0.0)
      val jEst = r.getAs[Double]("jacc_est")
      assert(jEst >= 0.0 && jEst <= 1.0)
      val jEx = r.getAs[Double]("jacc_exact")
      assert(jEx >= 0.0 && jEx <= 1.0)
      // exact side obeys inclusion-exclusion accounting
      assert(r.getAs[Long]("exact_union") ===
        ndA + r.getAs[Long]("nd_b") - r.getAs[Long]("exact_inter"))
    }
  }
}
