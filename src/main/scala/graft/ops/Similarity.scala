package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table.
  *
  * D1 is the exact baseline (one corpus pass × broadcast queries).
  * Scale paths: [[knnIvf]] (inverted-file index: seeded Lloyd
  * centroids, probe the nprobe nearest cells) for general corpora,
  * and [[knnLsh]] (random-hyperplane buckets) for high-similarity
  * regimes (near-dup retrieval), where hyperplane collision
  * probability is meaningful.
  */
object Similarity {

  /** Index-ordered cosine — a codegen'd Catalyst expression (a tight
    * primitive loop; Spark's higher-order functions run interpreted
    * and were the pairwise bottleneck). Single sequential pass, same
    * evaluation order as the oracle's list_cosine_similarity.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.cosine_similarity(a, b)

  private[graft] def loadVecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings")
      .withColumn("v", transform($"embedding", x => x.cast("double")))
      .select($"vec_id", $"v")
  }

  /** Top-k per query over a (possibly pruned) scored candidate set. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= k)
      .select($"query_id", $"rnk", $"vec_id".as("neighbor_id"),
        (floor($"cos" * 1000000.0 + 0.5) / 1000000.0).as("cosine"))
      .orderBy($"query_id", $"rnk")
  }

  /** D1 — brute-force cosine top-k for query vectors (vec_id < 10):
    * broadcast the tiny query side, window-rank per query.
    */
  def knnBruteForce(spark: SparkSession, dir: String,
                    k: Int = 5, numQueries: Int = 10): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir)
    val queries = vecs.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    topK(vecs.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("cos", cosine($"qv", $"v")), k)
  }

  /** D27 — MMR (maximal-marginal-relevance) diversified top-k: plain
    * cosine top-k returns near-duplicates of the best hit (this
    * corpus's near-dup structure guarantees it); MMR greedily picks
    * argmax [λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)], trading relevance
    * against redundancy — the standard retrieval-diversification
    * layer between an ANN shortlist and the consumer.
    *
    * Scale shape: the shortlist (top-m per query through the B37
    * heap — queries×m rows to the shuffle) is the only corpus-scale
    * work; the greedy loop is inherently sequential in k but runs
    * per-QUERY on an m-sized candidate row (typed `map` over one row
    * per query — m·d doubles), so queries parallelize and the corpus
    * never re-scans. Rows-only by declaration (greedy argmax over
    * float cosines has no clean SQL form); the spec replays the greedy
    * serially AND pins the diversity win over plain top-k.
    */
  def mmrDiversifiedTopK(spark: SparkSession, dir: String,
                         k: Int = 5, m: Int = 16,
                         lambda: Double = 0.5,
                         numQueries: Int = 10): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir)
    val queries = vecs.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val topm = udaf(graft.expressions.TopKPairs(m))
    val shortlist = vecs
      .join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("cos", cosine($"qv", $"v"))
      .groupBy($"query_id")
      .agg(topm($"cos", $"vec_id").as("cand"))
      .select($"query_id", expr("transform(cand, p -> p._2)").as("ids"),
        expr("transform(cand, p -> p._1)").as("rels"))
    val byId = vecs.select($"vec_id".as("cid"), $"v".as("cv"))
    val packed = shortlist
      .select($"query_id", posexplode($"ids").as(Seq("pos", "cid")))
      .join(byId, "cid")
      .groupBy($"query_id")
      .agg(sort_array(collect_list(struct($"pos", $"cid", $"cv")))
        .as("cands"))
      .join(shortlist.select($"query_id", $"rels"), "query_id")
      .as[(Long, Seq[(Int, Long, Seq[Double])], Seq[Double])]
    packed.flatMap { case (qid, cands, rels) =>
      val n = cands.length
      val ids = cands.map(_._2).toArray
      val vs = cands.map(_._3.toArray).toArray
      val rel = rels.toArray
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        if (na == 0.0 || nb == 0.0) 0.0
        else d / (math.sqrt(na) * math.sqrt(nb))
      }
      val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Double)]
      while (selected.length < math.min(k, n)) {
        var best = -1; var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < n) {
          if (!selected.contains(c)) {
            val red =
              if (selected.isEmpty) 0.0
              else selected.map(s => cos(vs(c), vs(s))).max
            val score = lambda * rel(c) - (1.0 - lambda) * red
            // deterministic tie-break: smaller vec_id wins
            if (score > bestScore ||
              (score == bestScore && best >= 0 && ids(c) < ids(best))) {
              best = c; bestScore = score
            }
          }
          c += 1
        }
        selected += best
        out += ((qid, selected.length.toLong, ids(best),
          math.floor(bestScore * 1e6 + 0.5) / 1e6))
      }
      out.toSeq
    }.toDF("query_id", "rnk", "vec_id", "mmr_score")
      .orderBy($"query_id", $"rnk")
  }

  /** Deterministic training sample: at most `cap` vectors, collected
    * in ONE job — ordering by a seeded 64-bit hash of vec_id is a
    * deterministic pseudo-random permutation, so `limit(cap)` is a
    * uniform sample and the plan is a TakeOrderedAndProject (partial
    * per-partition top-cap, one driver merge; no count pass, no full
    * sort). Codebook/centroid quality depends on the sample
    * distribution, not the corpus size — at 100 TB the training set is
    * still `cap` vectors, so index build cost is decoupled from data
    * volume (the round-4 scale defect: training used to re-scan the
    * corpus once per subspace per Lloyd iteration, ~24 full passes for
    * PQ defaults).
    */
  private[graft] def sampleTrainingSet(vecs: DataFrame,
                                       cap: Int): Array[Array[Double]] = {
    import vecs.sparkSession.implicits._
    vecs
      .orderBy(graft.functions.hash64($"vec_id".cast("string"), 0x5EEDL).asc,
        $"vec_id".asc)
      .limit(cap)
      .select($"v").collect().map(_.getSeq[Double](0).toArray)
  }

  /** Driver-side Lloyd over the (small) training sample: strided
    * deterministic seeds, `iters` assign/mean steps, ties and empty
    * clusters resolved exactly like the in-plan assignment
    * (lowest-index centroid wins; empty keeps its previous value).
    */
  private[graft] def lloydTrain(points: Array[Array[Double]], k: Int,
                                iters: Int): Array[(Int, Seq[Double])] = {
    // Empty-corpus degenerate: return k dummy centroids so callers'
    // plans still ANALYZE (centroid literals must be non-empty arrays
    // for zip_with/getField typing); every downstream row comes from
    // a join against the empty corpus, so the dummies never reach an
    // output. The dim is unknowable from zero points — 1 is fine for
    // the same reason.
    if (points.isEmpty)
      return Array.tabulate(k)(i => (i, Seq(0.0)))
    val dim = points(0).length
    val stride = math.max(1, points.length / k)
    var cents: Array[Array[Double]] = Array.tabulate(k)(i =>
      points(math.min(i * stride, points.length - 1)).clone())
    def nearest(p: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var i = 0
      while (i < k) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = p(j) - cents(i)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0L)
      for (p <- points) {
        val c = nearest(p)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += p(j); j += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c)))
    }
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
  }

  /** D2a — IVF top-k: deterministic centroids (sampled, driver-side
    * Lloyd — see [[sampleTrainingSet]]), inverted cell assignment,
    * probe the `nprobe` nearest cells per query. At 100 TB: centroids
    * broadcast, the corpus is partitioned by cell, a query touches
    * nprobe/cells of the data, and the whole build is one sample
    * collect plus ONE corpus assignment pass.
    */
  def knnIvf(spark: SparkSession, dir: String,
             k: Int = 5, numQueries: Int = 10,
             cells: Int = 8, nprobe: Int = 4,
             lloydIters: Int = 1, trainSample: Int = 2048): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir).cache()
    val centroids =
      lloydTrain(sampleTrainingSet(vecs, trainSample), cells, lloydIters)
    val assigned = assignCells(vecs, centroids).cache()
    val queries = assigned.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val probes = probeCells(queries, centroids, nprobe)

    topK(assigned.join(broadcast(probes),
        $"cell" === $"probe_cell" && $"vec_id" =!= $"query_id")
      .withColumn("cos", cosine($"qv", $"v")), k)
  }

  /** D23 — IVF nprobe tuning sweep: recall@k vs probed-cell count for
    * nprobe ∈ {1, 2, 4, 8 = all} against the in-engine exact top-k —
    * the C20-equivalent for the ANN side (every IVF deployment sets
    * exactly this knob: more probes = more of the corpus scanned per
    * query = higher recall; this measures the curve on the real
    * collection instead of guessing). At nprobe = cells the candidate
    * set IS the corpus, so recall must be exactly 1.0 — a built-in
    * self-check the spec pins.
    *
    * Scale shape: the index trains ONCE (sampled driver-side Lloyd,
    * D2a's determinism stance) and the corpus is assigned ONCE; each
    * probe setting re-joins only the queries×probes frame against the
    * cell-partitioned corpus (the D2a query path), and the recall
    * join is queries×k-sized. Driver check is rows-only (k-means
    * training is not SQL); the sweep's monotonicity and the
    * recall-1.0 anchor are the spec.
    */
  def ivfNprobeSweep(spark: SparkSession, dir: String,
                     k: Int = 5, numQueries: Int = 10,
                     cells: Int = 8): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir).cache()
    val centroids =
      lloydTrain(sampleTrainingSet(vecs, 2048), cells, iters = 1)
    val assigned = assignCells(vecs, centroids).cache()
    val queries = assigned.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val exact = topK(vecs.join(broadcast(queries),
        $"vec_id" =!= $"query_id")
      .withColumn("cos", cosine($"qv", $"v")), k)
      .select($"query_id", $"neighbor_id")
      .cache()
    Seq(1, 2, 4, cells).distinct.map { nprobe =>
      val probes = probeCells(queries, centroids, nprobe)
      val got = topK(assigned.join(broadcast(probes),
          $"cell" === $"probe_cell" && $"vec_id" =!= $"query_id")
        .withColumn("cos", cosine($"qv", $"v")), k)
        .select($"query_id", $"neighbor_id")
      got.join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(exact.agg(count(lit(1)).as("n_total")))
        .select(lit(nprobe.toLong).as("nprobe"), $"n_hits", $"n_total",
          (floor($"n_hits".cast("double") / $"n_total" * 1000000.0 + 0.5)
            / 1000000.0).as("recall"))
    }.reduce(_ unionByName _).orderBy($"nprobe")
  }

  /** Nearest-centroid assignment (centroids broadcast as literals).
    * Argmin via array_sort — linear expression size, unlike a
    * reduce(when) chain whose tree grows 3^cells (see [[knnPq]]).
    */
  private[graft] def assignCells(vecs: DataFrame,
                                 centroids: Array[(Int, Seq[Double])]): DataFrame = {
    import vecs.sparkSession.implicits._
    def dist2(v: Column, c: Seq[Double]): Column =
      graft.functions.squared_distance(v, typedLit(c))
    vecs.withColumn("cell",
      element_at(array_sort(array(centroids.map { case (i, c) =>
        struct(dist2($"v", c).as("d"), lit(i).as("cell"))
      }: _*)), 1).getField("cell"))
  }

  /** Nearest-centroid assignment carrying the winning distance too —
    * the Lloyd-iteration kernel ([[embeddingKmeans]]).
    */
  private def assignWithDist(vecs: DataFrame,
                             cents: Array[(Int, Seq[Double])]): DataFrame = {
    import vecs.sparkSession.implicits._
    def dist2(v: Column, c: Seq[Double]): Column =
      graft.functions.squared_distance(v, typedLit(c))
    vecs.withColumn("best",
      element_at(array_sort(array(cents.map { case (i, c) =>
        struct(dist2($"v", c).as("d"), lit(i).as("cell"))
      }: _*)), 1))
      .select($"vec_id", $"v", $"best.cell".as("cell"), $"best.d".as("d"))
  }

  /** D10 — fully DISTRIBUTED Lloyd k-means (the un-sampled scale path
    * next to D2a's sampled driver-side training — for when the corpus
    * distribution must drive the centroids, e.g. domain clustering for
    * data-mixing balance): deterministic strided seeding, then per
    * iteration ONE corpus assignment pass (broadcast centroid
    * literals, argmin via array_sort) and ONE posexplode →
    * map-side-combined avg per (cell, dim) — the k×dim update frame is
    * all that ever reaches the driver, exactly MLlib's shape. Empty
    * clusters keep their previous centroid. Per-iteration
    * localCheckpoint truncates the growing plan.
    */
  private[graft] def kmeansFit(vecs: DataFrame, k: Int, iters: Int)
      : (Array[(Int, Seq[Double])], DataFrame, Seq[Double]) = {
    import vecs.sparkSession.implicits._
    val n = vecs.count()
    val stride = math.max(1L, n / k)
    var cents: Array[(Int, Seq[Double])] = vecs
      .filter($"vec_id" % stride === 0).orderBy($"vec_id").limit(k)
      .select($"v").as[Seq[Double]].collect().zipWithIndex
      .map { case (c, i) => (i, c) }
    // empty-corpus degenerate: dummy seeds keep the assignment
    // expression analyzable (lloydTrain stance) — with zero vectors
    // every downstream frame is empty regardless
    if (cents.isEmpty)
      cents = Array.tabulate(k)(i => (i, Seq(0.0)))
    val inertias = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to iters) {
      val assigned = assignWithDist(vecs, cents).localCheckpoint()
      inertias += assigned.agg(coalesce(sum($"d"), lit(0.0)))
        .as[Double].head
      val updated = assigned
        .select($"cell", posexplode($"v").as(Seq("i", "x")))
        .groupBy($"cell", $"i").agg(avg($"x").as("m"))
        .groupBy($"cell")
        .agg(transform(array_sort(collect_list(struct($"i", $"m"))),
          s => s.getField("m")).as("c"))
        .as[(Int, Seq[Double])].collect().toMap
      cents = cents.map { case (i, c) => (i, updated.getOrElse(i, c)) }
    }
    (cents, assignWithDist(vecs, cents), inertias.toSeq)
  }

  def embeddingKmeans(spark: SparkSession, dir: String,
                      k: Int = 8, iters: Int = 3): DataFrame = {
    import spark.implicits._
    val (_, assigned, _) = kmeansFit(loadVecs(spark, dir), k, iters)
    assigned.groupBy($"cell")
      .agg(count(lit(1)).as("n_vecs"),
        (floor(sum($"d") * 100.0 + 0.5) / 100.0).as("inertia"))
      .orderBy($"cell")
  }

  /** Per-query nprobe nearest cells, exploded to (query, probe_cell). */
  private def probeCells(queries: DataFrame,
                         centroids: Array[(Int, Seq[Double])],
                         nprobe: Int): DataFrame = {
    import queries.sparkSession.implicits._
    def dist2(v: Column, c: Seq[Double]): Column =
      graft.functions.squared_distance(v, typedLit(c))
    val scored = array(centroids.map { case (i, c) =>
      struct(dist2($"qv", c).as("d"), lit(i).as("cell"))
    }: _*)
    queries
      .withColumn("probe_cell",
        explode(slice(transform(array_sort(scored), s => s.getField("cell")),
          1, nprobe)))
  }

  /** D5 — product-quantization ANN (IVF-PQ's compression half): the
    * vector splits into `m` subspaces, each trained to a `ks`-entry
    * codebook (seeded strided picks + Lloyd, same determinism stance
    * as D2a), and every vector is stored as m one-byte codes — here
    * 64 float dims → 8 bytes, a 32× shard-memory cut, the difference
    * between an in-RAM and an on-disk ANN index at 100 TB. Queries
    * score candidates by ADC (asymmetric distance): a per-query
    * m×ks lookup table of partial distances is BROADCAST and the
    * approximate distance is a sum of m table hits — no float vector
    * is ever touched at query time. Codebooks train driver-side on a
    * strided sample ([[sampleTrainingSet]]), so the whole index build
    * is one sample collect plus ONE corpus encode pass — training
    * cost no longer grows with corpus size. Codebook floats are
    * engine-specific (rows-only check); recall vs exact L2 is
    * spec-bounded.
    */
  def knnPq(spark: SparkSession, dir: String,
            k: Int = 5, numQueries: Int = 10,
            m: Int = 8, ks: Int = 16, lloydIters: Int = 2): DataFrame =
    knnPqOn(loadVecs(spark, dir), k, numQueries, m, ks, lloydIters)

  private[graft] def knnPqOn(vecsIn: DataFrame, k: Int, numQueries: Int,
                             m: Int, ks: Int, lloydIters: Int,
                             trainSample: Int = 2048): DataFrame = {
    val spark = vecsIn.sparkSession
    import spark.implicits._
    val vecs = vecsIn.cache()
    val dim = 64
    val subDim = dim / m

    def subCol(s: Int): Column = slice($"v", s * subDim + 1, subDim)

    // argmin as element_at(array_sort(...), 1): the expression tree is
    // LINEAR in ks — a reduce(when) chain re-references its accumulator
    // three times per level and grows 3^ks nodes (analysis-time hang at
    // ks=16)
    def nearest(c: Column, cents: Array[(Int, Seq[Double])]): Column =
      element_at(array_sort(array(cents.map { case (i, cv) =>
        struct(graft.functions.squared_distance(c, typedLit(cv)).as("d"),
          lit(i).as("code"))
      }: _*)), 1).getField("code")

    // all m codebooks from ONE sampled collect, trained driver-side
    val sample = sampleTrainingSet(vecs, trainSample)
    val books: Array[Array[(Int, Seq[Double])]] = Array.tabulate(m) { s =>
      lloydTrain(sample.map(_.slice(s * subDim, (s + 1) * subDim)),
        ks, lloydIters)
    }

    // encode: vector → m codes, ONE pass, no row multiplication
    val encoded = vecs.select($"vec_id" +:
        (0 until m).map(s => nearest(subCol(s), books(s)).as(s"c$s")): _*)

    // ADC applied MAP-SIDE: the per-query m×ks partial-distance table
    // is a flat literal (index s·ks+code), each vector row looks up
    // its m codes per query and emits (query_id, adc) directly — no
    // n×m explode, no join, no re-aggregation; summation order is
    // fixed (s ascending), so the score is bit-deterministic
    val qRows = vecs.filter($"vec_id" < numQueries)
      .select($"vec_id", $"v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    // empty corpus: zero query structs would make the posexplode array
    // VOID-typed and fail analysis — the empty typed frame IS the answer
    if (qRows.isEmpty)
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("query_id", "rnk", "neighbor_id", "adc_dist")
    val lutLit = typedLit(qRows.toSeq.map { case (_, qv) =>
      (0 until m).flatMap { s =>
        val q = qv.slice(s * subDim, (s + 1) * subDim)
        books(s).map { case (_, cv) =>
          q.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
      }
    })
    val scored = encoded.select($"vec_id", posexplode(array(
        qRows.toSeq.zipWithIndex.map { case ((qid, _), qi) =>
          val lutRow = element_at(lutLit, qi + 1)
          struct(lit(qid).as("query_id"),
            (0 until m).map(s =>
              element_at(lutRow, lit(s * ks + 1) + col(s"c$s")))
              .reduce(_ + _).as("adc"))
        }: _*)).as(Seq("qi", "qa")))
      .select($"vec_id", $"qa.query_id".as("query_id"), $"qa.adc".as("adc"))
      .filter($"vec_id" =!= $"query_id")

    // k-bounded partial-agg top-k (B37 machinery): ≤ queries×k rows
    // per map partition reach the shuffle, not n×queries window input;
    // negation turns the min-ADC search into TopKPairs' max ordering
    // with the same (adc asc, vec_id asc) tiebreak
    val topk = udaf(graft.expressions.TopKPairs(k))
    scored.groupBy($"query_id")
      .agg(topk(-$"adc", $"vec_id").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("idx", "p")))
      .select($"query_id", ($"idx" + 1).cast("long").as("rnk"),
        $"p._2".as("neighbor_id"), (floor(-$"p._1" * 1000000.0 + 0.5) / 1000000.0).as("adc_dist"))
      .orderBy($"query_id", $"rnk")
  }

  /** D6 — IVF-PQ, the production ANN composition (coarse quantizer ×
    * product codes, the Faiss-IVFPQ shape): vectors are bucketed by
    * their nearest IVF centroid and their RESIDUAL (v − centroid) is
    * PQ-encoded — residuals concentrate around zero, so the same ks
    * codebook entries quantize them far better than raw vectors. A
    * query probes its `nprobe` nearest cells and ADC-scores only those
    * cells' codes against a per-(query, cell) residual lookup table.
    *
    * Scale shape: ONE sampled collect trains both quantizers, ONE
    * corpus pass assigns + encodes (m bytes/vector in the index), the
    * probe tables (queries × nprobe × m × ks doubles) broadcast, the
    * candidate set is the probed cells only (nprobe/cells of the
    * corpus), and the B37 k-bounded partial top-k keeps the single
    * shuffle at ≤ partitions × queries × k rows. Codebook floats are
    * engine-specific → rows-only driver check + DedupSpec bounds
    * (planted copies at rank 1, recall above chance, determinism).
    */
  def knnIvfPq(spark: SparkSession, dir: String,
               k: Int = 5, numQueries: Int = 10,
               cells: Int = 8, nprobe: Int = 4,
               m: Int = 8, ks: Int = 16, lloydIters: Int = 2): DataFrame =
    knnIvfPqOn(loadVecs(spark, dir), k, numQueries, cells, nprobe, m, ks,
      lloydIters)

  private[graft] def knnIvfPqOn(vecsIn: DataFrame, k: Int, numQueries: Int,
                                cells: Int, nprobe: Int, m: Int, ks: Int,
                                lloydIters: Int,
                                trainSample: Int = 2048): DataFrame = {
    val spark = vecsIn.sparkSession
    import spark.implicits._
    val vecs = vecsIn.cache()
    val dim = 64
    val subDim = dim / m
    require(nprobe >= 1 && nprobe <= cells, s"nprobe must be in [1, $cells]")

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }

    // ONE sampled collect trains the coarse quantizer AND, on the
    // sample's residuals, all m codebooks
    val sample = sampleTrainingSet(vecs, trainSample)
    val centroids = lloydTrain(sample, cells, lloydIters)
    val centArr: Array[Array[Double]] = centroids.map(_._2.toArray)
    def nearestCell(p: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (i <- centArr.indices) {
        val d = d2(p, centArr(i))
        if (d < bestD) { bestD = d; best = i }
      }
      best
    }
    val residualSample = sample.map { p =>
      val c = centArr(nearestCell(p))
      Array.tabulate(dim)(j => p(j) - c(j))
    }
    val books: Array[Array[(Int, Seq[Double])]] = Array.tabulate(m) { s =>
      lloydTrain(residualSample.map(_.slice(s * subDim, (s + 1) * subDim)),
        ks, lloydIters)
    }

    // corpus: assign cell, take residual, encode m codes — ONE pass
    def nearestCode(c: Column, cents: Array[(Int, Seq[Double])]): Column =
      element_at(array_sort(array(cents.map { case (i, cv) =>
        struct(graft.functions.squared_distance(c, typedLit(cv)).as("d"),
          lit(i).as("code"))
      }: _*)), 1).getField("code")
    val centLit = typedLit(centArr.map(_.toSeq).toSeq)
    val encoded = assignCells(vecs, centroids)
      .withColumn("r",
        zip_with($"v", element_at(centLit, $"cell" + 1), (a, b) => a - b))
      .select($"vec_id" +: $"cell" +: (0 until m).map(s =>
        nearestCode(slice($"r", s * subDim + 1, subDim), books(s))
          .as(s"c$s")): _*)

    // per-(query, probed cell) ADC tables over the query's residual IN
    // THAT CELL — tiny (queries × nprobe rows), broadcast, equi-joined
    // on cell so each corpus row meets only the queries probing it
    val qRows = vecs.filter($"vec_id" < numQueries)
      .select($"vec_id", $"v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probeRows: Seq[(Long, Int, Seq[Double])] = qRows.toSeq.flatMap {
      case (qid, qv) =>
        val probed = centArr.indices
          .map(i => (d2(qv, centArr(i)), i)).sorted.take(nprobe)
        probed.map { case (_, cell) =>
          val r = Array.tabulate(dim)(j => qv(j) - centArr(cell)(j))
          val lut = (0 until m).flatMap { s =>
            val rs = r.slice(s * subDim, (s + 1) * subDim)
            books(s).map { case (_, cv) => d2(rs, cv.toArray) }
          }
          (qid, cell, lut)
        }
    }
    val probes = probeRows.toDF("query_id", "cell", "lut")

    val scored = encoded.join(broadcast(probes), "cell")
      .filter($"vec_id" =!= $"query_id")
      .withColumn("adc", (0 until m).map(s =>
        element_at($"lut", lit(s * ks + 1) + col(s"c$s"))).reduce(_ + _))

    // same k-bounded partial top-k tail as knn_pq (B37 machinery)
    val topk = udaf(graft.expressions.TopKPairs(k))
    scored.groupBy($"query_id")
      .agg(topk(-$"adc", $"vec_id").as("top"))
      .select($"query_id", posexplode($"top").as(Seq("idx", "p")))
      .select($"query_id", ($"idx" + 1).cast("long").as("rnk"),
        $"p._2".as("neighbor_id"), (floor(-$"p._1" * 1000000.0 + 0.5) / 1000000.0).as("adc_dist"))
      .orderBy($"query_id", $"rnk")
  }

  /** D2b — LSH top-k for high-similarity regimes: 16 deterministic
    * hyperplane signs → bucket, probe own bucket + 1-bit flips.
    * Prunes hard; recall is meaningful when neighbors are angularly
    * close (near-duplicates), which SimilaritySpec exercises with
    * planted copies.
    */
  def knnLsh(spark: SparkSession, dir: String,
             k: Int = 5, numQueries: Int = 10, planes: Int = 16): DataFrame =
    knnLshOn(loadVecs(spark, dir), k, numQueries, planes)

  /** D31 — LSH anisotropy-mitigation report: bucket health (bucket
    * count, max occupancy, exact within-bucket candidate-pair bound
    * Σ occ·(occ−1)/2) for raw sign-LSH next to the two standard
    * mitigations — MEAN-CENTERED (sign(x·p − μ·p)) and TOP-PC-REMOVED
    * (bucket the residual after projecting out the dominant principal
    * component) — the deploy-time check this round's x1000 rehearsal
    * showed every sign-LSH rollout needs. On anisotropic embeddings
    * the all-same-sign buckets absorb a constant FRACTION of the
    * corpus (measured: 8% of 500k vectors, occ 20k at mean 9.4), so
    * the true candidate set grows quadratically no matter how many
    * planes are added — planes cannot split vectors they all agree
    * on. The report says WHICH mitigation works before anyone pays
    * for a kNN build: on this corpus family centering barely moves
    * max occupancy (the skew is a variance direction, not an offset)
    * while PC removal collapses it ~40× (26.8k → 681 at 500k vectors,
    * candidate pairs 877M → 43M) — the D16 diagnostic made
    * actionable.
    *
    * Exactness: μ comes from per-dimension EXACT integer-unit sums
    * (Σ round(x_j·1e6) as BIGINT — associative, partitioning cannot
    * move it; the D22 discipline) then one double division per
    * dimension; the PC comes from [[powerIterTrain]] — 5
    * power-iteration steps over the hash-sampled centered training
    * set with every fold sequential in sample/index order; plane
    * thresholds μ·p, u·p, μ·u are index-ordered folds. The DuckDB
    * oracle replays ALL of it bit-exactly (sample via
    * [[OracleU64.hashSampleCtes]], iteration via
    * [[OracleU64.powerIterCtes]]), so all three variants' bucket
    * assignments — and therefore the integer outputs — hash-match.
    *
    * Scale shape: one corpus pass of 64 integer column aggregates
    * (one 65-column row to the driver), one bounded sample collect
    * (2048 rows — training cost decoupled from corpus size), one
    * corpus pass bucketing all variants (the 3× explode), a
    * bucket-keyed count and a 3-group rollup — all partial-
    * aggregable, nothing pair-shaped.
    */
  def lshCenteredReport(spark: SparkSession, dir: String,
                        planes: Int = 12): DataFrame = {
    import spark.implicits._
    val dim = 64
    val vecs = loadVecs(spark, dir)
    // coalesce: sum() over an EMPTY corpus is null, and the driver
    // row read below must still work (EmptyInputSpec shape)
    val aggs = (0 until dim).map(j =>
      coalesce(sum(floor(element_at($"v", j + 1) * 1000000.0 + 0.5)
        .cast("long")), lit(0L)).as(s"s$j")) :+ count(lit(1)).as("n")
    val row = vecs.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(dim)
    val mean = Array.tabulate(dim) { j =>
      if (n == 0L) 0.0
      else row.getLong(j).toDouble / (n.toDouble * 1000000.0)
    }
    val u = powerIterTrain(sampleTrainingSet(vecs, 2048), mean, 5)
    def foldWith(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var j = 0
      while (j < dim) { s += a(j) * b(j); j += 1 }
      s
    }
    val planesArr = planeComponents(planes)
    val thr = planesArr.map(pl => foldWith(pl, mean))
    val upl = planesArr.map(pl => foldWith(pl, u))
    val muu = foldWith(mean, u)
    val planesLit = typedLit(planesArr.map(_.toSeq).toSeq)
    def bucketCol(cond: Int => org.apache.spark.sql.Column) =
      (0 until planes).map { p =>
        when(graft.functions.dot_product(
          element_at($"planes", p + 1), $"v") >= cond(p),
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    vecs.withColumn("planes", planesLit)
      // per-row PC projection, computed once and reused by all planes
      .withColumn("dxu",
        graft.functions.dot_product(typedLit(u.toSeq), $"v"))
      .select(explode(array(
        struct(lit("raw").as("variant"),
          bucketCol(_ => lit(0.0)).as("bucket")),
        struct(lit("centered").as("variant"),
          bucketCol(p => lit(thr(p))).as("bucket")),
        struct(lit("pc_removed").as("variant"),
          // sign((x−μ−((x−μ)·u)u)·p) ⟺ x·p ≥ μ·p + ((x·u)−(μ·u))·(u·p)
          bucketCol(p => lit(thr(p)) + ($"dxu" - lit(muu)) * lit(upl(p)))
            .as("bucket")))).as("vb"))
      .select($"vb.variant".as("variant"), $"vb.bucket".as("bucket"))
      .groupBy($"variant", $"bucket").agg(count(lit(1)).as("occ"))
      .groupBy($"variant")
      .agg(count(lit(1)).as("n_buckets"),
        max($"occ").as("max_occupancy"),
        // occ·(occ−1) is always even, so the shift is an exact halve
        shiftright(sum($"occ" * ($"occ" - 1)), 1).as("candidate_pairs"))
      .orderBy($"variant")
  }

  /** Deterministic top-principal-component estimate for D31: `iters`
    * power-iteration steps over the (hash-sampled, mean-centered)
    * training set, every fold sequential in sample/index order so the
    * DuckDB replay ([[OracleU64.powerIterCtes]]) is bit-exact. The
    * unnormalized gradient accumulates per dimension in sample order
    * (the pinned k-group-fold house rule); the L2 norm folds
    * index-ordered; sqrt and the normalizing division are single
    * correctly-rounded IEEE ops.
    */
  private[graft] def powerIterTrain(sample: Array[Array[Double]],
                                    mean: Array[Double],
                                    iters: Int): Array[Double] = {
    val dim = 64
    if (sample.isEmpty) return new Array[Double](dim)
    val y = sample.map(x => Array.tabulate(dim)(j => x(j) - mean(j)))
    var v = Array.fill(dim)(0.125)
    var t = 0
    while (t < iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < y.length) {
        val yi = y(i)
        var s = 0.0
        var j = 0
        while (j < dim) { s += yi(j) * v(j); j += 1 }
        j = 0
        while (j < dim) { w(j) += s * yi(j); j += 1 }
        i += 1
      }
      var nn = 0.0
      var j = 0
      while (j < dim) { nn += w(j) * w(j); j += 1 }
      val nrm = math.sqrt(nn)
      // degenerate centered sample (all points equal the mean, or a
      // gradient that cancels exactly): w = 0 ⇒ nrm = 0, and dividing
      // would poison every downstream threshold with NaN. Keep the
      // previous iterate — once w is 0 it stays 0, so this is a fixed
      // point, mirrored in OracleU64.powerIterCtes' CASE.
      if (nrm == 0.0) return v
      v = Array.tabulate(dim)(j => w(j) / nrm)
      t += 1
    }
    v
  }

  /** Deterministic single-table hyperplane bucketing shared by D2b and
    * D7: plane components are splitmix64-derived (seed p·64+j), the
    * bucket is the sign bitmask — exactly re-derivable in DuckDB.
    */
  /** The splitmix64-derived hyperplane table shared by every sign-LSH
    * variant (seed p·64+j) — kept in one place so the engine and the
    * DuckDB replays cannot drift.
    */
  private[graft] def planeComponents(planes: Int): Array[Array[Double]] = {
    val dim = 64
    Array.tabulate(planes, dim) { (p, j) =>
      val h = graft.expressions.Hash64.splitmix64(p.toLong * dim + j)
      (h >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }
  }

  private def lshBucketsOn(vecs: DataFrame, planes: Int): DataFrame = {
    import vecs.sparkSession.implicits._
    val planesArr = planeComponents(planes)
    val planesLit = typedLit(planesArr.map(_.toSeq).toSeq)
    vecs
      .withColumn("planes", planesLit)
      .withColumn("bucket",
        (0 until planes).map { p =>
          when(graft.functions.dot_product(
            element_at($"planes", p + 1), $"v") >= 0,
            lit(1L << p)).otherwise(lit(0L))
        }.reduce(_.bitwiseOR(_)))
      .drop("planes")
  }

  private[graft] def knnLshOn(vecs: DataFrame, k: Int, numQueries: Int,
                              planes: Int): DataFrame = {
    import vecs.sparkSession.implicits._
    val bucketed = lshBucketsOn(vecs, planes)

    val queries = bucketed.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"bucket".as("qbucket"))
      .withColumn("probe", explode(array(
        ($"qbucket" +: (0 until planes).map(p =>
          $"qbucket".bitwiseXOR(lit(1L << p)))): _*)))

    topK(bucketed.join(broadcast(queries),
        $"bucket" === $"probe" && $"vec_id" =!= $"query_id")
      .withColumn("cos", cosine($"qv", $"v")), k)
  }

  /** D7 — corpus-wide kNN graph (every vector's top-k neighbors, the
    * all-pairs companion to D1's query-vs-corpus form): the building
    * block for near-dup graphs, diversity/coverage analysis, and
    * graph-based clustering of a training corpus. Brute force is n² —
    * a non-starter at corpus scale — so candidates come from the D2b
    * LSH buckets: each vector probes its own bucket plus all 1-bit
    * flips, scores only the vectors it collides with, and keeps top-k.
    *
    * Scale shape (r13 restructure — the r12 x1000 rehearsal killed
    * the old form at 500k×64-double vectors): the bucket equi-join
    * runs ID-ONLY — 16-byte (id, bucket) rows on both sides — so LSH
    * bucket skew (sign buckets on clustered embeddings are HEAVILY
    * skewed; the old run pinned 3/32 cores streaming hot-bucket
    * candidates whose rows each carried two 512-byte vectors) now
    * costs 16 bytes/candidate and a hot bucket's SMJ match-group
    * buffer is KB-sized ids instead of the spilled MB vector array
    * the old run re-read once per probe row (quadratic disk IO on
    * the hot bucket — the actual kill mechanism). Vectors attach
    * AFTER candidate generation by two id-keyed lookup joins,
    * adaptively: when the vector table's estimated BYTES (n·(8·dim +
    * overhead), r14 — a row gate is blind to dimensionality and
    * admits >8 GB broadcasts at 512 dims) fit the broadcast ceiling
    * both lookups BROADCAST, so the candidate-id
    * stream never shuffles with a payload and cosine + the map-side
    * k-bounded heap pipeline in one stage; above that the lookups
    * are plain id-keyed shuffle joins — uniformly-hashed keys (no
    * bucket skew), the cluster-scale path where broadcast would OOM
    * the driver. The B37 heap partial-aggregates map-side either
    * way, so the per-source rollup moves ≤ sources×k rows.
    * Bit-identical to the old form (same candidate set — a pair
    * collides on at most ONE probe since the probe values are
    * distinct — same cosine, same deterministic top-k), so every
    * pinned oracle hash is unchanged. Edges are only as complete as
    * the LSH recall — the high-similarity regime (near-dup
    * neighbors) is exactly where sign-LSH recall concentrates, and
    * the DuckDB oracle re-derives the same buckets bit-exactly, so
    * the check is still exact.
    */
  def knnGraph(spark: SparkSession, dir: String,
               k: Int = 5, planes: Int = 12): DataFrame =
    knnGraphOn(loadVecs(spark, dir), k, planes)

  /** D32 — the kNN graph THROUGH the SQ8 two-stage route, forced at
    * any corpus size (`forceSq8`): what [[knnGraph]]
    * becomes above 400k vectors runs here under the driver's
    * full-hash gate at every committed SF, so the production scale
    * path is oracle-checked, not just spec-bounded. Every stage is
    * exactly replayable — splitmix64 buckets, integer code vectors
    * (floor(x/scale + 0.5)), an exact integer dot, one deterministic
    * double multiply chain, and the (value DESC, id ASC) heap rule at
    * both the k·4 shortlist and the final k.
    */
  def knnGraphSq8(spark: SparkSession, dir: String,
                  k: Int = 5, planes: Int = 12): DataFrame =
    knnGraphOn(loadVecs(spark, dir), k, planes, forceSq8 = true)

  /** Estimated in-memory bytes of one broadcast vector table: dim
    * doubles + array/row overhead per row. The r13 gate admitted
    * `rows ≤ 2²¹` blind to dimensionality — at production 512-dim
    * embeddings that is ~8.4 GB per broadcast, over Spark's hard 8 GB
    * cap, so the "protected" path would hard-fail instead of taking
    * the shuffle fallback one line below. Bytes, not rows.
    */
  private[graft] def vecBroadcastBytes(n: Long, dim: Int): Long =
    n * (dim.toLong * 8L + 48L)

  /** Ceiling per broadcast vector table: conservative 900 MB — two
    * vector tables broadcast simultaneously, the driver retains every
    * broadcast it builds alongside its own state, and the 8 GB Spark
    * limit is a hard failure, not a fallback.
    */
  private[graft] val VecBroadcastCeiling: Long = 900L << 20

  private[graft] def knnGraphOn(vecs: DataFrame, k: Int,
                                planes: Int,
                                maxBroadcastBytes: Long =
                                  VecBroadcastCeiling,
                                forceSq8: Boolean = false,
                                rescoreFactor: Int = 4): DataFrame = {
    import vecs.sparkSession.implicits._
    val parts = vecs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    // repartition BEFORE checkpoint: a single-file parquet corpus
    // reads as 2-3 splits, and everything downstream of the
    // checkpoint (the probe explode and the whole fused
    // candidate-scoring stage) would inherit that near-serial
    // parallelism — the x1000 rehearsal measured the 3.4B-candidate
    // pipeline pinned to 2 cores for exactly this reason.
    val ids = lshBucketsOn(vecs, planes)
      .select($"vec_id", $"bucket")
      .repartition(parts).localCheckpoint()
    val probes = ids
      .select($"vec_id".as("src_id"), $"bucket".as("sbucket"))
      .withColumn("probe", explode(array(
        ($"sbucket" +: (0 until planes).map(p =>
          $"sbucket".bitwiseXOR(lit(1L << p)))): _*)))
      .select($"src_id", $"probe")
    // count off the 16-byte checkpointed id frame (no second scan of
    // the source), dim off one sampled row; gate each broadcast on
    // estimated BYTES. The id table used in the candidate join is
    // ~32 B/row in memory — its ceiling is separate and far higher,
    // so the skew protection (fan-out where the probe row lives)
    // stays active well past the vector gate.
    val n = ids.count()
    val dim = vecs.select(size($"v")).as[Int].take(1)
      .headOption.getOrElse(0)
    val fitsVec = vecBroadcastBytes(n, dim) <= maxBroadcastBytes
    val fitsIds = n * 32L <= (512L << 20)
    def lk(df: DataFrame): DataFrame = if (fitsVec) broadcast(df) else df
    // broadcast the 16-byte/row id table into the candidate join so
    // fan-out happens WHERE EACH PROBE ROW LIVES (uniformly spread by
    // the repartition above), never in a bucket-keyed shuffle: sign
    // buckets are degenerately skewed on anisotropic embeddings — the
    // x1000 corpus puts 8% of vectors in the two all-same-sign
    // buckets (measured occ 20k at mean 9.4), and a bucket-
    // partitioned exchange would hand ONE task that bucket's ~1B
    // candidate pairs. Above the broadcast gate the join falls back
    // to a shuffle of 16-byte rows, where AQE's skew split applies.
    val cand = (if (fitsIds) broadcast(ids) else ids)
      .join(probes, $"bucket" === $"probe" && $"vec_id" =!= $"src_id")
      .select($"src_id", $"vec_id")
    // scored: (src_id, vec_id, cos) for every surviving candidate.
    // THE ROUTE FOLLOWS THE BYTE GATE (r14, measured at 512 dims):
    // while the vector tables broadcast, the exact fused path wins —
    // one stage, no second pass (61 s vs the route's 82 s at
    // 150k×512). The moment they DON'T fit, the exact path must
    // shuffle the candidate stream with a full vector payload —
    // measured infeasible at 250k×512 (48 GB of spill in 500 s,
    // killed by a disk guard, ~2 TB projected) — so exactly there
    // the SQ8 two-stage route takes over: stage 1 scores candidates
    // with the codegen'd int8 dot over byte-packed codes (8× less
    // payload; the 568 B/row code table still BROADCASTS 8× past the
    // vector gate — 142 MB where the vectors are 1.04 GB), keeps
    // k·rescoreFactor per source in the same k-bounded heap, and
    // stage 2 re-ranks ONLY that shortlist (≤ n·k·rescoreFactor
    // rows) with exact float cosine: 151 s where exact dies.
    // Approximation surface: a true top-k neighbor is lost only if
    // the int8 misranking exceeds the (rescoreFactor−1)·k margin —
    // and only past the gate, where no oracle pins hashes (every
    // committed corpus broadcasts).
    val scored =
      if (forceSq8 || !fitsVec) {
        val quant = vecs.select($"vec_id", $"v")
          .withColumn("scale", graft.functions.sq8_scale($"v"))
          .select($"vec_id", $"scale",
            graft.functions.sq8_pack($"v", $"scale").as("codes"))
        val qBytes = n * (dim.toLong + 8L + 48L)
        def qlk(df: DataFrame): DataFrame =
          if (qBytes <= maxBroadcastBytes) broadcast(df) else df
        val topc = udaf(graft.expressions.TopKPairs(k * rescoreFactor))
        val shortlist = cand
          .join(qlk(quant), "vec_id")
          .join(qlk(quant.select($"vec_id".as("src_id"),
            $"scale".as("sscale"), $"codes".as("scodes"))), "src_id")
          .withColumn("approx",
            graft.functions.sq8_dot($"scodes", $"codes").cast("double")
              * $"sscale" * $"scale")
          .groupBy($"src_id")
          .agg(topc($"approx", $"vec_id").as("top"))
          .select($"src_id", explode($"top").as("p"))
          .select($"src_id", $"p._2".as("vec_id"))
        shortlist
          .join(lk(vecs.select($"vec_id", $"v")), "vec_id")
          .join(lk(vecs.select($"vec_id".as("src_id"),
            $"v".as("srcv"))), "src_id")
          .withColumn("cos", cosine($"srcv", $"v"))
          .select($"src_id", $"vec_id", $"cos")
      } else {
        cand
          .join(lk(vecs.select($"vec_id", $"v")), "vec_id")
          .join(lk(vecs.select($"vec_id".as("src_id"),
            $"v".as("srcv"))), "src_id")
          .withColumn("cos", cosine($"srcv", $"v"))
          .select($"src_id", $"vec_id", $"cos")
      }
    val topk = udaf(graft.expressions.TopKPairs(k))
    scored
      .groupBy($"src_id")
      .agg(topk($"cos", $"vec_id").as("top"))
      .select($"src_id", posexplode($"top").as(Seq("idx", "p")))
      .select($"src_id".as("vec_id"), ($"idx" + 1).cast("long").as("rnk"),
        $"p._2".as("neighbor_id"), (floor($"p._1" * 1000000.0 + 0.5) / 1000000.0).as("cosine"))
      .orderBy($"vec_id", $"rnk")
  }

  /** D13 — coverage-stratified diversity sample: ONE representative
    * per LSH sign-bucket — the cheap, fully distributed stand-in for
    * k-center / facility-location selection when a corpus must be
    * downsampled WITHOUT collapsing its coverage of embedding space
    * (each Hamming region of the hyperplane partition keeps exactly
    * one exemplar; dense near-dup regions are collapsed hardest,
    * sparse regions survive untouched — the opposite bias of uniform
    * sampling). Representative = min vec_id (deterministic, retry-
    * safe); the quality-ranked variant composes with C10's keeper
    * rule. Greedy/sequential selectors (MMR, k-center) cannot
    * distribute; the bucket partition is the scalable approximation.
    *
    * Scale shape: one scan-side bucket projection (the D2b/D7
    * machinery) + one partial-aggregable groupBy — map-side combine
    * reduces each partition to ≤ one row per bucket before the only
    * shuffle, and the output is buckets-sized (≤ 2^planes) at any
    * corpus size. Buckets re-derive bit-exactly in DuckDB → full
    * oracle.
    */
  def diversitySample(spark: SparkSession, dir: String,
                      planes: Int = 12): DataFrame = {
    import spark.implicits._
    lshBucketsOn(loadVecs(spark, dir), planes)
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_members"), min($"vec_id").as("rep_vec_id"))
      .orderBy($"bucket")
  }

  /** D9 — kNN label-consistency check (mislabel detection): each
    * vector's label is compared against the majority label of its D7
    * graph neighbors — the standard embedding-space QA pass for
    * labeled training corpora (points whose neighborhood disagrees
    * with their label are likely mislabeled or out-of-distribution).
    * Majority = highest neighbor count, smallest label on ties.
    *
    * Scale shape: inherits D7's bucketed graph build; the label joins
    * are vec_id-keyed corpus-linear shuffles (labels ride with the
    * corpus, never collected); the majority window partitions per
    * vector over ≤ k rows.
    */
  def knnLabelCheck(spark: SparkSession, dir: String,
                    k: Int = 5, planes: Int = 12): DataFrame = {
    import spark.implicits._
    val labels = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label")
    val edges = knnGraphOn(loadVecs(spark, dir), k, planes)
      .select($"vec_id", $"neighbor_id")
    val votes = edges
      .join(labels.select($"vec_id".as("neighbor_id"),
        $"label".as("nlabel")), Seq("neighbor_id"))
      .groupBy($"vec_id", $"nlabel")
      .agg(count(lit(1)).as("c"))
    val tot = votes.groupBy($"vec_id").agg(sum($"c").as("nn"))
    val wMaj = Window.partitionBy($"vec_id").orderBy($"c".desc, $"nlabel")
    votes
      .withColumn("r", row_number().over(wMaj))
      .filter($"r" === 1)
      .join(tot, "vec_id")
      .join(labels, "vec_id")
      .select($"vec_id", $"label", $"nlabel".as("neighbor_majority"),
        (floor($"c".cast("double") / $"nn" * 1000000.0 + 0.5) / 1000000.0)
          .as("majority_frac"),
        when($"label" =!= $"nlabel", 1L).otherwise(0L).as("flagged"))
      .orderBy($"vec_id")
  }

  /** D14 — semi-supervised label propagation over the D7 kNN graph:
    * 20% of vectors (vec_id % 5 == 0) keep their true label as frozen
    * seeds; every other node re-takes, for a fixed 3 rounds, the modal
    * label of its currently-labeled neighbors (count desc, smallest
    * label on ties — fully deterministic, so the unrolled DuckDB CTE
    * chain is an exact oracle). The transductive labeling pass a
    * weakly-supervised corpus-annotation pipeline runs.
    *
    * Scale shape: each round is one edges⋈labels hash join (edges are
    * corpus×k, labels corpus-sized, both keyed on vec_id) + a
    * partial-agg vote count; rounds are a FIXED small constant, so
    * plan depth is bounded — no iterate-to-convergence lineage blowup.
    */
  def knnLabelProp(spark: SparkSession, dir: String,
                   k: Int = 5, planes: Int = 12,
                   iters: Int = 3): DataFrame = {
    import spark.implicits._
    val truth = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label", ($"vec_id" % 5 === 0).as("is_seed"))
    val edges = knnGraphOn(loadVecs(spark, dir), k, planes)
      .select($"vec_id", $"neighbor_id")
    val wMaj = Window.partitionBy($"vec_id").orderBy($"c".desc, $"lbl")
    var labels = truth
      .select($"vec_id", when($"is_seed", $"label").as("lbl"))
    for (_ <- 1 to iters) {
      val modal = edges
        .join(labels.filter($"lbl".isNotNull)
          .select($"vec_id".as("neighbor_id"), $"lbl"), "neighbor_id")
        .groupBy($"vec_id", $"lbl").agg(count(lit(1)).as("c"))
        .withColumn("r", row_number().over(wMaj))
        .filter($"r" === 1)
        .select($"vec_id", $"lbl".as("new_lbl"))
      labels = truth.join(modal, Seq("vec_id"), "left")
        .select($"vec_id",
          when($"is_seed", $"label").otherwise($"new_lbl").as("lbl"))
    }
    truth.join(labels, "vec_id")
      .select($"vec_id",
        when($"is_seed", 1L).otherwise(0L).as("is_seed"),
        coalesce($"lbl", lit(-1)).as("label"))
      .orderBy($"vec_id")
  }

  /** D11 — PageRank over the D7 kNN graph (damping 0.85, fixed
    * iteration count): graph centrality as a data-valuation signal —
    * high-rank vectors sit in dense, well-connected neighborhoods
    * (cluster cores), low-rank ones are outliers — the graph-based
    * complement to H11's importance weights for corpus selection.
    *
    * Cross-engine exactness: ranks are SCALED BIGINTs (10^12 = mass
    * 1.0) and every step is integer arithmetic — `r div od` per edge,
    * exact BIGINT sums, `(17·s) div 20` damping, teleport
    * `(3·SCALE) div (20·n)` — so summation order can't perturb a
    * result bit anywhere and the unrolled-iteration DuckDB oracle
    * hash-matches exactly (float PageRank would flake on engine
    * summation order). Dangling mass (sources with no out-edges) leaks
    * deterministically on both sides.
    *
    * Scale shape: the edge list is materialized once (localCheckpoint
    * — same lineage-bounding the C6 components loop uses) and each
    * iteration is two vec_id-keyed corpus-linear joins + one
    * partial-agg sum; rank state is one row per vector. Iterations are
    * a fixed constant, so the whole thing is O(iters · |E|) shuffle.
    */
  def knnGraphPagerank(spark: SparkSession, dir: String, k: Int = 5,
                       planes: Int = 12, iters: Int = 6): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir)
    val n = vecs.count()
    if (n == 0L)  // empty corpus: no nodes, no ranks — typed empty out
      return vecs.select($"vec_id", lit(0L).as("pr"))
    val Scale = 1000000000000L
    val teleport = 3L * Scale / (20L * n)
    val edges = knnGraphOn(vecs, k, planes)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
      .localCheckpoint()
    val nodes = vecs.select($"vec_id")
    // hoist the loop-INVARIANT edges⋈outdeg join out of the iteration
    // (r15, guide §2.4): od depends only on the checkpointed edge
    // list, so joining it inside the loop re-ran one exchange + join
    // per iteration for identical rows; materialize (src, dst, od)
    // once and each iteration is one join + one partial-agg sum
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("od"))
    val edgesOd = edges.join(outdeg, "src").localCheckpoint()
    var ranks = nodes.select($"vec_id", lit(Scale / n).as("r"))
    for (_ <- 1 to iters) {
      val sums = edgesOd
        .join(ranks.withColumnRenamed("vec_id", "src"), "src")
        .select($"dst", expr("r div od").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("s"))
      ranks = nodes.join(sums, nodes("vec_id") === sums("dst"), "left")
        .select(nodes("vec_id"),
          (lit(teleport) + expr("(17 * coalesce(s, 0)) div 20")).as("r"))
        .localCheckpoint()
    }
    ranks.select($"vec_id", $"r".as("pr")).orderBy($"vec_id")
  }

  /** D26 — bounded multi-source BFS closeness centrality on the
    * undirected kNN graph: how CENTRAL each probe vertex sits in the
    * embedding manifold (hubs with high closeness dominate greedy
    * ANN routing and label propagation — D9/D14's diagnostics read
    * per-node degree; this reads global REACH). For 8 deterministic
    * seed vertices, BFS to depth 6: reached count, distance sum,
    * eccentricity, and closeness (reached/Σdist) — the bounded-probe
    * form every large-graph toolkit uses, because exact all-pairs
    * closeness is O(V·E).
    *
    * Scale shape: the BSP frontier loop (B-block PageRank stance) —
    * per round ONE edge equi-join + one anti-join against visited +
    * distinct, all keyed on vertex id, frontier `localCheckpoint`ed
    * so lineage stays bounded; 6 rounds × edge-linear shuffle. All
    * quantities integers; the one closeness division is engine-
    * identical.
    */
  def knnGraphCloseness(spark: SparkSession, dir: String, k: Int = 5,
                        planes: Int = 12, nSeeds: Int = 8,
                        maxDepth: Int = 6): DataFrame = {
    import spark.implicits._
    val ed = knnGraphOn(loadVecs(spark, dir), k, planes)
      .select($"vec_id".as("src"), $"neighbor_id".as("dst"))
    val edges = ed
      .unionAll(ed.select($"dst".as("src"), $"src".as("dst")))
      .distinct().localCheckpoint()
    var visited = loadVecs(spark, dir)
      .filter($"vec_id" < nSeeds)
      .select($"vec_id".as("seed"), $"vec_id".as("node"),
        lit(0).as("dist"))
      .localCheckpoint()
    var frontier = visited
    for (d <- 1 to maxDepth) {
      // dist is CONSTANT within a round, so distinct on (seed, node)
      // alone — hash-partitioned on exactly the anti-join key, so the
      // two operators share ONE exchange (r15, guide §2.4); the old
      // 3-column distinct partitioned on (seed, node, dist) and paid
      // a second exchange for the anti-join. Same rows either way.
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(frontier("seed"), edges("dst").as("node"))
        .distinct()
        .join(visited.select($"seed", $"node"), Seq("seed", "node"),
          "left_anti")
        .withColumn("dist", lit(d))
        .localCheckpoint()
      // no checkpoint on visited: it is a UNION of already-
      // checkpointed frontiers, so its lineage is flat (d inputs,
      // each materialized) — checkpointing it re-materialized the
      // whole visited set every round, one extra corpus-of-visited
      // job per depth for nothing
      visited = visited.unionAll(next)
      frontier = next
    }
    visited.groupBy($"seed")
      .agg(count(lit(1)).as("cnt"), sum($"dist").as("sum_dist"),
        max($"dist").as("ecc"))
      .select($"seed".as("seed_id"),
        ($"cnt" - 1L).as("n_reached"),
        $"sum_dist".cast("long").as("sum_dist"),
        $"ecc".cast("long").as("ecc"),
        when($"sum_dist" > 0L,
          floor(($"cnt" - 1L).cast("double") / $"sum_dist"
            * 1000000.0 + 0.5) / 1000000.0)
          .otherwise(lit(0.0)).as("closeness"))
      .orderBy($"seed_id")
  }

  /** D15 — triangle census + local clustering coefficient on the
    * undirected kNN graph: the standard graph-quality diagnostic for
    * an embedding space (high clustering = tight semantic neighborhoods;
    * triangle-free hubs flag degenerate/noisy regions that poison
    * label propagation and graph-based dedup).
    *
    * Each triangle {x<y<z} is enumerated exactly once via the
    * canonical-edge 3-way join e(a,b)⋈e(b,c)⋈e(a,c) with a<b<c
    * (Suri & Vassilvitskii 2011's one-round MR form, declared
    * relationally so Catalyst plans the joins). The edge table is
    * n·k rows (out-degree fixed at k), so the wedge fan-out per node
    * is degree² with degree ≈ 2k for all but hub nodes — AQE's skew
    * split handles the hubs, and every join keys on a vertex id, so
    * the whole census is edge-linear shuffle. Clustering coefficient
    * is 2·tri/(deg·(deg−1)) — exact integers into one division,
    * 6-dp floor-rounded.
    */
  def knnGraphTriangles(spark: SparkSession, dir: String, k: Int = 5,
                        planes: Int = 12): DataFrame = {
    import spark.implicits._
    val edges = knnGraphOn(loadVecs(spark, dir), k, planes)
      .select(least($"vec_id", $"neighbor_id").as("a"),
        greatest($"vec_id", $"neighbor_id").as("b"))
      .distinct()
      .localCheckpoint()
    val wedges = edges.join(
      edges.select($"a".as("b"), $"b".as("c")), "b")
    val tris = wedges.join(
      edges.select($"a".as("ta"), $"b".as("tc")),
      $"a" === $"ta" && $"c" === $"tc")
      .select($"a", $"b", $"c")
    val perNode = tris
      .select(explode(array($"a", $"b", $"c")).as("vec_id"))
      .groupBy($"vec_id").agg(count(lit(1)).as("triangles"))
    val deg = edges.select($"a".as("vec_id"))
      .unionAll(edges.select($"b".as("vec_id")))
      .groupBy($"vec_id").agg(count(lit(1)).as("degree"))
    perNode.join(deg, "vec_id")
      .select($"vec_id", $"degree", $"triangles",
        (floor(lit(2.0) * $"triangles" / ($"degree" * ($"degree" - 1))
          * 1000000.0 + 0.5) / 1000000.0).as("clustering"))
      .orderBy($"triangles".desc, $"vec_id")
  }

  /** D17 — mutual-kNN graph: keep only reciprocated edges (a in b's
    * top-k AND b in a's top-k) — the standard robustification before
    * graph clustering/label propagation, because hub nodes collect
    * thousands of one-way in-edges that mutuality filters out (the
    * same hubs D15 flags). One vertex-keyed self-join of the n·k edge
    * list on the reversed pair — edge-linear shuffle, no new scoring
    * pass (the ranked edge list is localCheckpoint'd and probed from
    * both sides).
    */
  def knnMutualGraph(spark: SparkSession, dir: String, k: Int = 5,
                     planes: Int = 12): DataFrame = {
    import spark.implicits._
    val g = knnGraphOn(loadVecs(spark, dir), k, planes).localCheckpoint()
    val rev = g.select($"vec_id".as("b2"), $"neighbor_id".as("a2"),
      $"rnk".as("rnk_ba"))
    g.filter($"vec_id" < $"neighbor_id")
      .join(rev, $"vec_id" === $"a2" && $"neighbor_id" === $"b2")
      .select($"vec_id".as("vec_a"), $"neighbor_id".as("vec_b"),
        $"rnk".as("rnk_ab"), $"rnk_ba", $"cosine")
      .orderBy($"vec_a", $"vec_b")
  }

  /** D30 — embedding cluster report: connected components over the
    * D17 MUTUAL-kNN graph (reciprocated edges only — the standard
    * robustification that keeps hub vectors from gluing unrelated
    * regions together), labeled min-id-per-component with cluster
    * sizes: the semantic-community discovery pass behind
    * cluster-and-cap curation (cap each semantic cluster's doc count
    * the way C10 caps near-dup groups) and embedding-space QA ("why
    * is 40% of the corpus one cluster?"). Reuses C6's ADAPTIVE CC
    * kernel (driver union-find under the 4M-edge gate, distributed
    * min-label + pointer-jumping above — both spec-proved identical),
    * so the scale path is already proven; the mutual-edge build is
    * one self-join of the k-bounded directed edge list.
    */
  def embeddingClusters(spark: SparkSession, dir: String, k: Int = 5,
                        planesMin: Int = 12, maxIters: Int = 20)
      : DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir)
    // occupancy-constant LSH: the x1000 scaling run showed a FIXED
    // plane count saturating (bucket occupancy grows linearly with
    // vectors → candidate verification quadratic — the shingle-
    // saturation mechanism in embedding space). Buckets must track
    // N/8: planes = smallest p ≥ 12 with 2^p·8 ≥ N, computed by the
    // same integer bit-length formula as the oracle (a float log2 at
    // a power-of-two boundary is a 1-ulp plane-count flip). At the
    // committed corpus sizes (N ≤ 2¹⁵) this stays exactly 12, so the
    // adaptive dial changes nothing the oracles pinned.
    val n = vecs.count()
    val planes =
      if (n <= 8L * 4096) planesMin
      else (64 - java.lang.Long.numberOfLeadingZeros((n + 7) / 8 - 1))
        .toInt
    val g = knnGraphOn(vecs, k, planes)
      .localCheckpoint()
    val rev = g.select($"vec_id".as("b2"), $"neighbor_id".as("a2"))
    val pairs = g.filter($"vec_id" < $"neighbor_id")
      .join(rev, $"vec_id" === $"a2" && $"neighbor_id" === $"b2")
      .select($"vec_id".as("doc_a"), $"neighbor_id".as("doc_b"))
      .localCheckpoint()
    val labels = Dedup.adaptiveComponents(pairs, maxIters)
    val sizes = labels.groupBy($"label")
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select($"doc_id".as("vec_id"), $"label".as("cluster_id"),
        $"cluster_size")
      .orderBy($"vec_id")
  }

  /** D20 — neighbor-set Jaccard link prediction on the undirected kNN
    * graph: for node pairs that share ≥1 neighbor but are NOT already
    * connected, score |N(a)∩N(b)| / |N(a)∪N(b)| and emit the top
    * predictions — the transitive-candidate discovery pass that
    * recovers near-dup pairs ANN bucketing missed (if a~x and b~x,
    * a~b is worth an exact check even when no LSH bucket put a,b
    * together).
    *
    * Scale shape: common-neighbor counting is the D15 wedge join
    * (edge⋈edge on the shared endpoint — fan-out deg², deg ≈ 2k);
    * degrees and the already-connected anti-join are edge-linear;
    * jaccard = c / (da + db − c) from exact integers, one division,
    * 6-dp floor-rounded; top-50 is TakeOrdered.
    */
  def knnLinkPrediction(spark: SparkSession, dir: String, k: Int = 5,
                        planes: Int = 12, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val edges = knnGraphOn(loadVecs(spark, dir), k, planes)
      .select(least($"vec_id", $"neighbor_id").as("a"),
        greatest($"vec_id", $"neighbor_id").as("b"))
      .distinct()
      .localCheckpoint()
    // undirected adjacency (both directions) for wedge counting
    val adj = edges.select($"a".as("u"), $"b".as("v"))
      .unionAll(edges.select($"b".as("u"), $"a".as("v")))
    val deg = adj.groupBy($"u").agg(count(lit(1)).as("d"))
    val common = adj.select($"v".as("w"), $"u".as("x"))
      .join(adj.select($"v".as("w"), $"u".as("y")), "w")
      .filter($"x" < $"y")
      .groupBy($"x", $"y").agg(count(lit(1)).as("c"))
    val candidates = common
      .join(edges, $"x" === $"a" && $"y" === $"b", "left_anti")
    candidates
      .join(deg.select($"u".as("x"), $"d".as("dx")), "x")
      .join(deg.select($"u".as("y"), $"d".as("dy")), "y")
      .select($"x".as("vec_a"), $"y".as("vec_b"), $"c".as("common"),
        (floor($"c".cast("double") / ($"dx" + $"dy" - $"c")
          * 1000000.0 + 0.5) / 1000000.0).as("jaccard"))
      .orderBy($"jaccard".desc, $"vec_a", $"vec_b")
      .limit(topK)
  }

  /** D21 — PQ quantization-distortion report: per-subspace mean
    * squared reconstruction error (distance from each subvector to its
    * nearest codeword) — the index-quality number that decides ks/m
    * before a PQ rollout (distortion caps achievable recall; a
    * subspace with outsized MSE wants more codewords or a rotation).
    * Training is D5's deterministic sampled Lloyd; the measurement is
    * ONE scan-side pass (the argmin distance evaluates in-plan per
    * subspace) into a single m-value aggregate — corpus-linear,
    * nothing iterative at measure time.
    */
  def pqDistortion(spark: SparkSession, dir: String, m: Int = 8,
                   ks: Int = 16, lloydIters: Int = 2): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir).localCheckpoint()
    val dim = 64
    val subDim = dim / m
    def subCol(s: Int): Column = slice($"v", s * subDim + 1, subDim)
    val sample = sampleTrainingSet(vecs, 2048)
    val books: Array[Array[(Int, Seq[Double])]] = Array.tabulate(m) { s =>
      lloydTrain(sample.map(_.slice(s * subDim, (s + 1) * subDim)),
        ks, lloydIters)
    }
    def minD(c: Column, cents: Array[(Int, Seq[Double])]): Column =
      element_at(array_sort(array(cents.map { case (i, cv) =>
        struct(graft.functions.squared_distance(c, typedLit(cv)).as("d"),
          lit(i).as("code"))
      }: _*)), 1).getField("d")
    // r13 (was a corpus-wide float avg — order-DEPENDENT, so the same
    // corpus could report different ulps under different partitionings
    // at 100 TB): per-row squared errors quantize to exact 1e-6
    // integer units FIRST (the D22 discipline), sum in DECIMAL(38,0)
    // (associative — partitioning cannot move it), and the mean
    // rounds half-up by exact integer arithmetic. Also what makes the
    // DuckDB full-hash replay possible.
    val per = vecs.select(
      (0 until m).map(s =>
        floor(minD(subCol(s), books(s)) * 1000000.0 + 0.5)
          .cast("decimal(38,0)").as(s"d$s")): _*)
    val aggs = (0 until m).map(s => sum(col(s"d$s")).as(s"m$s")) :+
      count(lit(1)).as("n")
    val r = per.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (r.isNullAt(0))  // empty corpus: no vectors, no distortion rows
      return Seq.empty[(Long, Double)].toDF("subspace", "mse")
    val n = BigInt(r.getLong(m))
    (0 until m).map { s =>
      val su = BigInt(r.getDecimal(s).toBigInteger)
      val mseMicro = (su * 2 + n) / (n * 2) // exact half-up of su/n
      (s.toLong, mseMicro.toDouble / 1000000.0)
    }.toDF("subspace", "mse").orderBy($"subspace")
  }

  /** D19 — IVF index-health report: per-cell population statistics
    * (count, share) plus the summary every index rollout review reads
    * — imbalance factor (max cell / mean cell: high = hot cells that
    * serialize probes), empty-cell count (wasted probe budget), and
    * assigned-total (must equal the corpus). Cell assignment is the
    * D2a machinery (sampled deterministic training + scan-side argmin
    * projection); the stats are one partial-aggregable groupBy(cell)
    * over a cells-sized frame.
    *
    * FULL-HASH oracle since r13 (was rows-only): the sampled k-means
    * replays bit-exactly in DuckDB via [[graft.ops.OracleU64.lloydReplay]]
    * with the 5 Lloyd steps unrolled; the invariants stay
    * spec-asserted.
    */
  def ivfCellStats(spark: SparkSession, dir: String,
                   cells: Int = 16): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir)
    val centroids = lloydTrain(sampleTrainingSet(vecs, 2048), cells, 5)
    val assigned = assignCells(vecs, centroids)
    val per = assigned.groupBy($"cell".cast("long").as("cell"))
      .agg(count(lit(1)).as("n"))
    val tot = per.agg(sum($"n").cast("double").as("total"),
      count(lit(1)).cast("double").as("nonempty"))
    per.crossJoin(broadcast(tot))
      .select($"cell", $"n",
        (floor($"n" / $"total" * 10000.0 + 0.5) / 10000.0).as("share"),
        (floor($"n" * $"nonempty" / $"total" * 10000.0 + 0.5) / 10000.0)
          .as("imbalance"))
      .orderBy($"cell")
  }

  /** D18 — embedding outlier/drift scoring: 1 − cos(x, mean of x's
    * kNN neighbors) — a vector far from its own neighborhood centroid
    * is mislabeled/noisy/out-of-distribution (the embedding-space twin
    * of E22's text-novelty signal); the top drifters are the audit
    * queue a curation pass reviews first.
    *
    * Scale shape: the D7 edge list joins the vector table on the
    * neighbor key (corpus-linear), the per-dimension neighbor mean is
    * a map-side-combined groupBy over corpus×d rows, and the cosine
    * reassembles from one more (vec, dim)-keyed join + rollup — every
    * stage keys on vec_id or (vec_id, dim), nothing quadratic. Top-50
    * is a TakeOrdered on the 6-dp-rounded score.
    */
  def embeddingDrift(spark: SparkSession, dir: String, k: Int = 5,
                     planes: Int = 12, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir).localCheckpoint()
    val edges = knnGraphOn(vecs, k, planes)
      .select($"vec_id", $"neighbor_id")
    // exact-integer cosine: components quantize to 1e-6 units (Long),
    // the neighbor-SUM vector replaces the neighbor mean (cosine is
    // scale-invariant, so dividing by k is unnecessary — and dropping
    // it makes every aggregate an exact integer sum, partition-order
    // independent: the round-10 anova seam, where a float avg + float
    // dot here would drift by accumulation order). DECIMAL(38,0)
    // products ≙ the oracle's HUGEINT. The 1e-6 component quantum
    // shifts the cosine O(1e-6·√d/‖x‖) — the output's own floor.
    val qvecs = vecs.select($"vec_id",
      transform($"v", x => floor(x * 1000000.0 + 0.5).cast("long"))
        .as("q"))
    val nbrSum = edges
      .join(qvecs.select($"vec_id".as("neighbor_id"), $"q".as("nq")),
        "neighbor_id")
      .select($"vec_id", posexplode($"nq").as(Seq("dim", "xq")))
      .groupBy($"vec_id", $"dim").agg(sum($"xq").as("su"))
    val own = qvecs.select($"vec_id", posexplode($"q").as(Seq("dim", "xq")))
    own.join(nbrSum, Seq("vec_id", "dim"))
      .groupBy($"vec_id")
      .agg(sum($"xq".cast("decimal(38,0)") * $"su").as("xm"),
        sum($"xq".cast("decimal(38,0)") * $"xq").as("xx"),
        sum($"su".cast("decimal(38,0)") * $"su").as("mm"))
      .select($"vec_id",
        when($"xx" > 0 && $"mm" > 0,
          floor((lit(1.0) - $"xm".cast("double") /
            (sqrt($"xx".cast("double")) * sqrt($"mm".cast("double"))))
            * 1000000.0 + 0.5) / 1000000.0).as("drift"))
      .orderBy($"drift".desc_nulls_last, $"vec_id")
      .limit(topK)
  }

  /** D16 — top principal component of the embedding corpus by
    * distributed power iteration: the whitening/drift diagnostic an
    * embedding pipeline runs before indexing (a dominant component
    * with high explained-variance signals anisotropy that wrecks
    * cosine ANN recall).
    *
    * Scale shape: the mean and total variance come from ONE moment
    * pass; each of the 5 power iterations is ONE corpus pass — the
    * per-row scalar s = (x−μ)ᵀv is computed in-plan (zip_with +
    * aggregate over the 64-dim arrays, no UDF), and the 64 partial
    * sums Σ(x_j−μ_j)·s reduce through a posexplode + map-side-combined
    * groupBy(dim) — so each iteration ships 64×partitions values, and
    * model state (v) re-broadcasts as a 64-literal array. O(iters)
    * corpus passes, O(d) driver state: the classic aggregate-the-
    * matvec decomposition. Sign fixed by making the largest-|loading|
    * dimension positive; eigenvalue = Rayleigh quotient from the final
    * pass.
    */
  def embeddingPca(spark: SparkSession, dir: String,
                   iters: Int = 5): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir).localCheckpoint()
    val d = 64
    val n = vecs.count().toDouble
    if (n == 0)  // empty corpus: no moments, no component — typed empty
      return Seq.empty[(Long, Double)].toDF("dim", "value")
    def litArr(a: Array[Double]): Column = array(a.map(lit): _*)
    // mean + E[x_j^2] as 2d direct per-dimension aggregates over ONE
    // pass — the earlier posexplode form multiplied the corpus 64× and
    // shuffled it into a groupBy(dim); per-column sums partial-agg to
    // a single 128-double row with no row multiplication at all
    val momAggs = (0 until d).flatMap { j =>
      val x = element_at($"v", j + 1)
      Seq(sum(x).as(s"s1_$j"), sum(x * x).as(s"s2_$j"))
    }
    val momRow = vecs.agg(momAggs.head, momAggs.tail: _*).collect()(0)
    val mu = Array.tabulate(d)(j => momRow.getDouble(2 * j) / n)
    val totVar = (0 until d)
      .map(j => momRow.getDouble(2 * j + 1) / n - mu(j) * mu(j)).sum
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val cCol = zip_with($"v", litArr(mu), (a, b) => a - b)
      val sCol = aggregate(zip_with(cCol, litArr(v), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
      // project (c, s) ONCE per row, then 64 direct column sums —
      // one corpus pass per matvec, zero shuffled rows
      val proj = vecs.select(cCol.as("c"), sCol.as("s"))
      val gAggs = (0 until d)
        .map(j => sum(element_at($"c", j + 1) * $"s").as(s"g$j"))
      val gRow = proj.agg(gAggs.head, gAggs.tail: _*).collect()(0)
      val av = Array.tabulate(d)(j => gRow.getDouble(j) / n)
      val norm = math.sqrt(av.map(x => x * x).sum)
      lambda = av.zip(v).map { case (a, b) => a * b }.sum
      v = av.map(_ / norm)
    }
    val flip = if (v(v.zipWithIndex.maxBy { case (x, _) => math.abs(x) }._2) < 0) -1.0 else 1.0
    val rows = v.zipWithIndex.map { case (x, j) =>
      (j.toLong, math.floor(flip * x * 1000000.0 + 0.5) / 1000000.0)
    }.toSeq
    val head = Seq((-1L, math.floor(lambda / totVar * 1000000.0 + 0.5) / 1000000.0))
    (head ++ rows).toDF("dim", "value").orderBy($"dim")
  }

  /** D12 — ANN recall evaluation harness: recall@k of each approximate
    * method (single-table LSH, multi-table LSH, SQ8 two-stage) against
    * the D1 exact baseline, the accept/reject report every index
    * configuration change needs before rollout. Counts are integers
    * and recall is one division, so the report is exact cross-engine.
    *
    * Scale shape: each method's query path runs as built (bucketed /
    * two-stage — never n²); the hit join is keyed on (query_id,
    * neighbor_id) over ≤ methods×queries×k rows and the rollup is
    * methods-sized.
    */
  def annRecallReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exact = knnBruteForce(spark, dir)
      .select($"query_id", $"neighbor_id")
    val cand = Seq(
      "lsh" -> knnLsh(spark, dir),
      "lsh_multi" -> knnLshMulti(spark, dir),
      "sq8" -> knnSq8(spark, dir))
      .map { case (m, df) =>
        df.select(lit(m).as("method"), $"query_id", $"neighbor_id")
      }.reduce(_ unionByName _)
    val methods = Seq("lsh", "lsh_multi", "sq8").toDF("method")
    val hits = cand.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy($"method").agg(count(lit(1)).as("n_hits"))
    val tot = exact.agg(count(lit(1)).as("n_total"))
    methods.join(hits, Seq("method"), "left")
      .crossJoin(broadcast(tot))
      .select($"method",
        coalesce($"n_hits", lit(0L)).as("n_hits"),
        $"n_total",
        (floor(coalesce($"n_hits", lit(0L)).cast("double") / $"n_total"
          * 1000000.0 + 0.5) / 1000000.0).as("recall"))
      .orderBy($"method")
  }

  /** D2c — multi-table LSH: `tables` independent hyperplane sets of
    * `planes` bits each; a candidate collides in ANY table. Collision
    * probability 1−(1−p^planes)^tables keeps recall useful in the
    * mid-similarity band (cosine ≈ 0.7–0.9) where one long signature
    * prunes too hard — the standard recall/cost dial for LSH at scale.
    */
  def knnLshMulti(spark: SparkSession, dir: String,
                  k: Int = 5, numQueries: Int = 10,
                  tables: Int = 8, planes: Int = 8): DataFrame =
    knnLshMultiOn(loadVecs(spark, dir), k, numQueries, tables, planes)

  private[graft] def knnLshMultiOn(vecs: DataFrame, k: Int,
                                   numQueries: Int, tables: Int,
                                   planes: Int): DataFrame = {
    import vecs.sparkSession.implicits._
    val dim = 64
    def component(t: Int, p: Int, j: Int): Double = {
      val h = graft.expressions.Hash64.splitmix64(
        ((t.toLong * 31 + p) * dim + j) + 1)
      (h >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }
    def tablePlanes(t: Int) =
      typedLit(Array.tabulate(planes, dim)(component(t, _, _))
        .map(_.toSeq).toSeq)
    val bucketCols = (0 until tables).map { t =>
      val pl = tablePlanes(t)
      (0 until planes).map { p =>
        when(graft.functions.dot_product(
          element_at(pl, p + 1), $"v") >= 0,
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    val bucketed = vecs
      .select($"vec_id", $"v",
        posexplode(array(bucketCols: _*)).as(Seq("tbl", "bucket")))
    val queries = bucketed.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"),
        $"tbl".as("qtbl"), $"bucket".as("qbucket"))
    val candidates = bucketed.join(broadcast(queries),
        $"tbl" === $"qtbl" && $"bucket" === $"qbucket" &&
          $"vec_id" =!= $"query_id")
      .dropDuplicates("query_id", "vec_id")
    topK(candidates.withColumn("cos", cosine($"qv", $"v")), k)
  }

  /** Shared SQ8 scale/codes over a frame carrying a double-array `v`
    * column: per-vector scale = max|x|/127 CLAMPED to 1e-30 — an
    * all-zero vector quantizes to all-zero codes instead of dividing
    * by zero into NaN codes (a latent crash/garbage path for real
    * corpora where zero vectors are common). The same clamp appears in
    * both DuckDB oracles so the arithmetic stays engine-identical.
    */
  private[graft] def sq8Codes(df: DataFrame): DataFrame =
    df.withColumn("scale", greatest(
        aggregate(col("v"), lit(0.0), (m, x) => greatest(m, abs(x))) / 127.0,
        lit(1e-30)))
      .withColumn("codes",
        transform(col("v"), x => floor(x / col("scale") + 0.5).cast("int")))

  /** E/D-support — int8 symmetric quantization of the embedding
    * column: per-vector scale = max|x|/127, stored codes ∈ [−127,127].
    * The 4× storage cut that makes billion-vector ANN shards fit in
    * memory; reports per-vector reconstruction error so the quality
    * cost is measured, not assumed. Arithmetic is portable (floor
    * rounding), so the driver gets a full SQL oracle.
    */
  def quantizeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sq8Codes(Tables.load(spark, dir, "embeddings")
        .withColumn("v", transform($"embedding", x => x.cast("double"))))
      .withColumn("max_err",
        aggregate(zip_with($"v", $"codes",
          (x, c) => abs(x - c.cast("double") * $"scale")),
          lit(0.0), (m, e) => greatest(m, e)))
      .select($"vec_id",
        (floor($"scale" * 1e9 + 0.5).cast("double") / 1e9).as("scale"),
        element_at($"codes", 1).as("code0"),
        element_at($"codes", 64).as("code63"),
        (floor($"max_err" * 1e9 + 0.5).cast("double") / 1e9).as("max_err"))
      .orderBy($"vec_id")
  }

  /** D8 — two-stage SQ8 retrieval (scan int8, rescore float): the
    * production memory/accuracy trade for flat indexes — the corpus
    * is scanned as D3's int8 codes (4× smaller, integer dot products),
    * the top k×rescoreFactor candidates per query come out of the B37
    * k-bounded heap, and only that tiny candidate set is rescored
    * with exact float cosine. Because the int8 dot product is EXACT
    * integer arithmetic and the per-vector scales are deterministic,
    * this approximate operator gets a full SQL oracle (the LSH/PQ
    * paths can't say that — their codebooks are engine floats).
    *
    * Scale shape: quantization is one projection; stage 1 moves only
    * queries × (k·rescoreFactor) rows per map partition through the
    * heap's partial aggregate; stage 2 joins the candidate set (tiny)
    * back to float vectors vec_id-keyed.
    */
  def knnSq8(spark: SparkSession, dir: String,
             k: Int = 5, numQueries: Int = 10,
             rescoreFactor: Int = 3): DataFrame = {
    import spark.implicits._
    val vecs = loadVecs(spark, dir)
    // codegen'd SQ8 kernels (r14): byte-packed codes + integer dot —
    // value-identical to the interpreted sq8Codes/zip_with/aggregate
    // form (same scale clamp, same floor(x/scale+0.5) codes, same
    // exact integer sum, same multiply order), but the corpus-sized
    // scoring scan stays inside whole-stage codegen instead of
    // per-element closure dispatch (measured 48.8 s → int8 dot at
    // x1000/500k vectors before the rewrite).
    val quant = vecs
      .withColumn("scale", graft.functions.sq8_scale($"v"))
      .withColumn("codes", graft.functions.sq8_pack($"v", $"scale"))
    val queries = quant.filter($"vec_id" < numQueries)
      .select($"vec_id".as("query_id"), $"v".as("qv"),
        $"scale".as("qscale"), $"codes".as("qcodes"))
    val approx = quant.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("iprod", graft.functions.sq8_dot($"qcodes", $"codes"))
      .withColumn("approx", $"iprod".cast("double") * $"scale" * $"qscale")
    val topc = udaf(graft.expressions.TopKPairs(k * rescoreFactor))
    val cands = approx.groupBy($"query_id")
      .agg(topc($"approx", $"vec_id").as("top"))
      .select($"query_id", explode($"top").as("p"))
      .select($"query_id", $"p._2".as("vec_id"))
    val rescored = cands
      .join(vecs, Seq("vec_id"))
      .join(broadcast(queries.select($"query_id", $"qv")), Seq("query_id"))
      .withColumn("cos", cosine($"qv", $"v"))
    topK(rescored, k)
  }

  /** Per-label centroids (class prototypes / one Lloyd step over given
    * assignments). Distributed shape: posexplode to (label, dim) rows
    * → partial-agg avg (map-side combine keeps the shuffle at
    * labels×dims rows regardless of corpus size). Emitted FLAT —
    * (label, dim, value, n_vecs) — all-scalar columns so the driver's
    * row-sort compare works; [[labelCentroidVectors]] is the assembled
    * array form for library callers.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "embeddings")
    // components quantize to integer 1e-6 units so the per-(label,
    // dim) mean is an exact integer sum / count — a float avg()
    // accumulates in partition order and can flip the 4dp floor on a
    // 1-ulp seam (round-10 anova lesson); the 1e-6 quantum sits two
    // decades under the output's own 1e-4 floor
    val dims = e.select($"label", posexplode(transform($"embedding",
        x => floor(x.cast("double") * 1000000.0 + 0.5).cast("long")))
        .as(Seq("i", "xq")))
      .groupBy($"label", $"i")
      // + 0.0 squashes IEEE negative zero (DuckDB round keeps -0.0)
      .agg((floor(sum($"xq").cast("double") / count(lit(1))
        / 1000000.0 * 10000.0 + 0.5) / 10000.0 + 0.0).as("centroid_v"))
    e.groupBy($"label").agg(count(lit(1)).as("n_vecs"))
      .join(dims, "label")
      .select($"label", $"i", $"centroid_v", $"n_vecs")
      .orderBy($"label", $"i")
  }

  /** Assembled-vector form of [[labelCentroids]]: the tiny labels×dims
    * frame is re-shaped into one centroid array per label with a
    * sorted collect_list (post-aggregate, so never corpus-sized).
    */
  def labelCentroidVectors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    labelCentroids(spark, dir)
      .groupBy($"label", $"n_vecs")
      .agg(transform(array_sort(collect_list(struct($"i", $"centroid_v"))),
        s => s.getField("centroid_v")).as("centroid"))
      .select($"label", $"n_vecs", $"centroid")
      .orderBy($"label")
  }

  /** Collected form of [[labelCentroidVectors]] for broadcast/literal
    * use: labels × 4dp-rounded centroid arrays — an offline index
    * artifact whose size (≤ labels×dims values) is independent of
    * corpus size.
    */
  private[graft] def collectedCentroids(spark: SparkSession,
                                        dir: String): Seq[(Int, Seq[Double])] = {
    val cs = labelCentroidVectors(spark, dir)
      .select(col("label"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    // empty-corpus degenerate: one dummy centroid keeps the argmin
    // expression analyzable (lloydTrain stance); no rows ever score
    if (cs.isEmpty) Seq((0, Seq(0.0))) else cs
  }

  /** Nearest-centroid assignment over a frame carrying (vec_id, v):
    * per-row argmin by (squared L2, label). The distance is an
    * index-ordered left fold — the same IEEE summation order as the
    * oracle's list_reduce, so distances are bit-identical — and
    * array_min over (d, label) structs is the exact tie-broken argmin.
    * Stateless projection: works identically on a batch frame or a
    * streaming one (G12 feeds it a readStream).
    */
  private[graft] def assignToCentroids(df: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import df.sparkSession.implicits._
    val scored = array(cents.map { case (lbl, c) =>
      struct(
        aggregate(zip_with($"v", typedLit(c), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d"),
        lit(lbl).as("label"))
    }: _*)
    df.withColumn("best", array_min(scored))
      .select($"vec_id", $"best.label".as("assigned_label"),
        (floor($"best.d" * 1000000.0 + 0.5) / 1000000.0).as("dist"))
  }

  /** G12 oracle: batch SQL form of the nearest-centroid assignment —
    * the embedding_centroids 4dp centroid CTE reassembled into arrays,
    * index-ordered list_reduce distances, (dist, label) argmin.
    */
  private[graft] def centroidAssignOracle: String =
    """WITH x AS (
      |  SELECT label, i,
      |    CAST(floor(embedding[i]::DOUBLE * 1000000.0 + 0.5)
      |      AS BIGINT) AS xq
      |  FROM embeddings,
      |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t),
      |c AS (
      |  SELECT label, i,
      |    floor(sum(xq)::DOUBLE / count(*) / 1000000.0
      |      * 10000.0 + 0.5) / 10000.0 + 0.0 AS cv
      |  FROM x GROUP BY label, i),
      |cvec AS (
      |  SELECT label, array_agg(cv ORDER BY i) AS cva FROM c GROUP BY label),
      |ve AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |d AS (
      |  SELECT vec_id, label, list_reduce(
      |    list_prepend(0.0::DOUBLE,
      |      [(e[i] - cva[i]) * (e[i] - cva[i]) for i in range(1, 65)]),
      |    (a, b) -> a + b) AS dist
      |  FROM ve CROSS JOIN cvec),
      |r AS (
      |  SELECT vec_id, label, dist, row_number() OVER (
      |    PARTITION BY vec_id ORDER BY dist, label) AS rn
      |  FROM d)
      |SELECT vec_id, label AS assigned_label,
      |  floor(dist * 1000000.0 + 0.5) / 1000000.0 AS dist
      |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** DuckDB re-derivation of the random-hyperplane LSH: the plane
    * components come from Hash64.splitmix64, which [[OracleU64]]
    * rebuilds in SQL; dot products use an index-ordered list_reduce so
    * the IEEE summation order (and hence every sign) matches the
    * codegen'd DotProduct kernel bit-for-bit.
    */
  private def lshOracleSingle: String = {
    import OracleU64._
    s"""WITH seeds AS (
       |  SELECT p, j, (p * 64 + j)::HUGEINT AS x0
       |  FROM (SELECT unnest(range(0, 16)) AS p),
       |       (SELECT unnest(range(0, 64)) AS j)),
       |m1 AS (SELECT p, j, ${mixStep1("x0")} AS x FROM seeds),
       |m2 AS (SELECT p, j, ${mixStep2("x")} AS x FROM m1),
       |m3 AS (SELECT p, j, ${mixStep3("x")} AS x FROM m2),
       |m4 AS (SELECT p, j, ${mixStep4("x")} AS h FROM m3),
       |comps AS (SELECT p, j,
       |  ${shr("h", 11)}::DOUBLE / 4503599627370496.0 * 2.0 - 1.0 AS comp
       |  FROM m4),
       |planes AS (
       |  SELECT p, array_agg(comp ORDER BY j) AS pl FROM comps GROUP BY p),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |dots AS (
       |  SELECT vec_id, p, list_reduce(
       |    list_prepend(0.0::DOUBLE, [pl[i] * e[i] for i in range(1, 65)]),
       |    (a, b) -> a + b) AS d
       |  FROM v CROSS JOIN planes),
       |buckets AS (
       |  SELECT vec_id, CAST(coalesce(
       |    sum(CASE WHEN d >= 0 THEN (1::BIGINT << p) END), 0) AS BIGINT)
       |    AS bucket
       |  FROM dots GROUP BY vec_id),
       |q AS (
       |  SELECT vec_id AS query_id, e AS qe, bucket AS qbucket
       |  FROM v JOIN buckets USING (vec_id) WHERE vec_id < 10),
       |probes AS (
       |  SELECT query_id, qe, qbucket AS probe FROM q
       |  UNION ALL
       |  SELECT query_id, qe, xor(qbucket, (1::BIGINT << p))
       |  FROM q, (SELECT unnest(range(0, 16)) AS p)),
       |cand AS (
       |  SELECT pr.query_id, pr.qe, b.vec_id, v2.e
       |  FROM probes pr
       |  JOIN buckets b ON b.bucket = pr.probe AND b.vec_id <> pr.query_id
       |  JOIN v v2 ON v2.vec_id = b.vec_id),
       |scored AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    list_cosine_similarity(qe, e) AS cos,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY list_cosine_similarity(qe, e) DESC, vec_id) AS rnk
       |  FROM cand)
       |SELECT query_id, rnk, neighbor_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
       |FROM scored WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** D7 oracle: the single-table bucket derivation at 12 planes with
    * EVERY vector as a source — bit-exact buckets, exact cosine rank.
    */
  /** Shared CTE chain re-deriving [[knnGraphOn]]'s edges bit-exactly
    * (splitmix64 planes → sign buckets → 1-bit probes → exact cosine
    * rank); `scored` is the per-source ranked candidate list.
    */
  private def lshGraphCte: String = {
    import OracleU64._
    s"""WITH seeds AS (
       |  SELECT p, j, (p * 64 + j)::HUGEINT AS x0
       |  FROM (SELECT unnest(range(0, 12)) AS p),
       |       (SELECT unnest(range(0, 64)) AS j)),
       |m1 AS (SELECT p, j, ${mixStep1("x0")} AS x FROM seeds),
       |m2 AS (SELECT p, j, ${mixStep2("x")} AS x FROM m1),
       |m3 AS (SELECT p, j, ${mixStep3("x")} AS x FROM m2),
       |m4 AS (SELECT p, j, ${mixStep4("x")} AS h FROM m3),
       |comps AS (SELECT p, j,
       |  ${shr("h", 11)}::DOUBLE / 4503599627370496.0 * 2.0 - 1.0 AS comp
       |  FROM m4),
       |planes AS (
       |  SELECT p, array_agg(comp ORDER BY j) AS pl FROM comps GROUP BY p),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |dots AS (
       |  SELECT vec_id, p, list_reduce(
       |    list_prepend(0.0::DOUBLE, [pl[i] * e[i] for i in range(1, 65)]),
       |    (a, b) -> a + b) AS d
       |  FROM v CROSS JOIN planes),
       |buckets AS (
       |  SELECT vec_id, CAST(coalesce(
       |    sum(CASE WHEN d >= 0 THEN (1::BIGINT << p) END), 0) AS BIGINT)
       |    AS bucket
       |  FROM dots GROUP BY vec_id),
       |q AS (
       |  SELECT vec_id AS src_id, e AS qe, bucket AS qbucket
       |  FROM v JOIN buckets USING (vec_id)),
       |probes AS (
       |  SELECT src_id, qe, qbucket AS probe FROM q
       |  UNION ALL
       |  SELECT src_id, qe, xor(qbucket, (1::BIGINT << p))
       |  FROM q, (SELECT unnest(range(0, 12)) AS p)),
       |cand AS (
       |  SELECT pr.src_id, pr.qe, b.vec_id, v2.e
       |  FROM probes pr
       |  JOIN buckets b ON b.bucket = pr.probe AND b.vec_id <> pr.src_id
       |  JOIN v v2 ON v2.vec_id = b.vec_id),
       |scored AS (
       |  SELECT src_id, vec_id AS neighbor_id,
       |    list_cosine_similarity(qe, e) AS cos,
       |    row_number() OVER (PARTITION BY src_id
       |      ORDER BY list_cosine_similarity(qe, e) DESC, vec_id) AS rnk
       |  FROM cand)""".stripMargin
  }

  /** D15 oracle: the D7 edge CTE canonicalized to undirected a<b
    * edges, the same 3-way triangle join, per-node explode + degree.
    */
  private def closenessOracle: String =
    lshGraphCte.replaceFirst("WITH seeds", "WITH RECURSIVE seeds") +
      """,
        |ed AS (
        |  SELECT src_id AS src, neighbor_id AS dst FROM scored
        |  WHERE rnk <= 5),
        |sym AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM ed
        |    UNION ALL SELECT dst, src FROM ed)),
        |bfs(seed, node, dist) AS (
        |  SELECT vec_id, vec_id, 0 FROM v WHERE vec_id < 8
        |  UNION
        |  SELECT b.seed, s.dst, b.dist + 1
        |  FROM bfs b JOIN sym s ON s.src = b.node
        |  WHERE b.dist < 6),
        |md AS (
        |  SELECT seed, node, min(dist) AS d FROM bfs GROUP BY 1, 2)
        |SELECT seed AS seed_id, (count(*) - 1)::BIGINT AS n_reached,
        |  CAST(sum(d) AS BIGINT) AS sum_dist, max(d)::BIGINT AS ecc,
        |  CASE WHEN sum(d) > 0
        |    THEN floor((count(*) - 1)::DOUBLE / sum(d)
        |      * 1000000.0 + 0.5) / 1000000.0
        |    ELSE 0.0 END AS closeness
        |FROM md GROUP BY seed ORDER BY seed_id""".stripMargin

  private def trianglesOracle: String = lshGraphCte +
    """,
      |edges0 AS (
      |  SELECT src_id AS s, neighbor_id AS d FROM scored WHERE rnk <= 5),
      |tedges AS (
      |  SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
      |  FROM edges0),
      |tri AS (
      |  SELECT e1.a, e1.b, e2.b AS c
      |  FROM tedges e1
      |  JOIN tedges e2 ON e2.a = e1.b
      |  JOIN tedges e3 ON e3.a = e1.a AND e3.b = e2.b),
      |tnodes AS (
      |  SELECT vec_id, count(*) AS triangles FROM (
      |    SELECT unnest([a, b, c]) AS vec_id FROM tri)
      |  GROUP BY vec_id),
      |tdeg AS (
      |  SELECT vec_id, count(*) AS degree FROM (
      |    SELECT a AS vec_id FROM tedges
      |    UNION ALL SELECT b FROM tedges)
      |  GROUP BY vec_id)
      |SELECT n.vec_id, d.degree, n.triangles,
      |  floor(2.0 * n.triangles / (d.degree * (d.degree - 1))
      |    * 1000000.0 + 0.5) / 1000000.0 AS clustering
      |FROM tnodes n JOIN tdeg d USING (vec_id)
      |ORDER BY triangles DESC, vec_id""".stripMargin

  private def lshGraphOracle: String = lshGraphCte +
    """
      |SELECT src_id AS vec_id, rnk, neighbor_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
      |FROM scored WHERE rnk <= 5
      |ORDER BY vec_id, rnk""".stripMargin

  /** D32 oracle: the same candidate CTE chain, scored in two stages —
    * SQ8 codes (max|x|/127 clamped scale, floor(x/scale+0.5) integer
    * codes ≡ [[graft.expressions.Sq8Pack]]), exact-integer dot ×
    * the two scales in the engine's left-associated multiply order,
    * k·4 shortlist by (approx DESC, id), exact float cosine re-rank
    * by (cos DESC, id) — both row_number replays of the TopKPairs
    * heap rule.
    */
  private def sq8GraphOracle: String = lshGraphCte +
    """,
      |sq8sc AS (
      |  SELECT vec_id, e,
      |    greatest(list_aggregate([abs(x) for x in e], 'max') / 127.0,
      |      1e-30) AS scale
      |  FROM v),
      |sq8cod AS (
      |  SELECT vec_id, scale,
      |    [floor(e[i] / scale + 0.5)::BIGINT for i in range(1, 65)] AS c
      |  FROM sq8sc),
      |sq8s1 AS (
      |  SELECT src_id, vec_id,
      |    row_number() OVER (PARTITION BY src_id
      |      ORDER BY ap DESC, vec_id) AS crnk
      |  FROM (
      |    SELECT cd.src_id, cd.vec_id,
      |      (CAST(list_reduce(list_prepend(0::BIGINT,
      |        [sq.c[i] * nq.c[i] for i in range(1, 65)]),
      |        (a, b) -> a + b) AS DOUBLE) * sq.scale) * nq.scale AS ap
      |    FROM (SELECT src_id, vec_id FROM cand) cd
      |    JOIN sq8cod sq ON sq.vec_id = cd.src_id
      |    JOIN sq8cod nq ON nq.vec_id = cd.vec_id)),
      |sq8s2 AS (
      |  SELECT s.src_id, s.vec_id AS neighbor_id,
      |    list_cosine_similarity(q2.e, n2.e) AS cos,
      |    row_number() OVER (PARTITION BY s.src_id
      |      ORDER BY list_cosine_similarity(q2.e, n2.e) DESC,
      |        s.vec_id) AS rnk
      |  FROM sq8s1 s
      |  JOIN v q2 ON q2.vec_id = s.src_id
      |  JOIN v n2 ON n2.vec_id = s.vec_id
      |  WHERE s.crnk <= 20)
      |SELECT src_id AS vec_id, rnk, neighbor_id,
      |  floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
      |FROM sq8s2 WHERE rnk <= 5
      |ORDER BY vec_id, rnk""".stripMargin

  /** D9 oracle: majority vote over the graph edges, smallest label on
    * ties, fraction floor-rounded to 6dp — mirrors [[knnLabelCheck]].
    */
  private def labelCheckOracle: String = lshGraphCte +
    """,
      |edges AS (
      |  SELECT src_id AS vec_id, neighbor_id FROM scored WHERE rnk <= 5),
      |lbl AS (SELECT vec_id, label FROM embeddings),
      |votes AS (
      |  SELECT e.vec_id, l.label AS nlabel, count(*) AS c
      |  FROM edges e JOIN lbl l ON l.vec_id = e.neighbor_id
      |  GROUP BY e.vec_id, l.label),
      |tot AS (SELECT vec_id, sum(c) AS nn FROM votes GROUP BY vec_id),
      |maj AS (
      |  SELECT vec_id, nlabel, c,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY c DESC, nlabel) AS r
      |  FROM votes)
      |SELECT m.vec_id, l.label, m.nlabel AS neighbor_majority,
      |  floor(m.c::DOUBLE / t.nn * 1000000.0 + 0.5) / 1000000.0
      |    AS majority_frac,
      |  CASE WHEN l.label <> m.nlabel THEN 1 ELSE 0 END::BIGINT AS flagged
      |FROM maj m
      |JOIN lbl l ON l.vec_id = m.vec_id
      |JOIN tot t ON t.vec_id = m.vec_id
      |WHERE m.r = 1
      |ORDER BY m.vec_id""".stripMargin

  /** D14 oracle: the D7 edge CTE + the 3 propagation rounds UNROLLED —
    * each round is votes→deterministic-mode→frozen-seed overlay,
    * mirroring [[knnLabelProp]] exactly.
    */
  private def labelPropOracle: String = {
    val rounds = (1 to 3).map { i =>
      val prev = s"lp${i - 1}"
      s"""vt$i AS (
         |  SELECT e.vec_id, p.lbl, count(*) AS c
         |  FROM edges e JOIN $prev p ON p.vec_id = e.neighbor_id
         |  WHERE p.lbl IS NOT NULL GROUP BY e.vec_id, p.lbl),
         |md$i AS (
         |  SELECT vec_id, lbl FROM (
         |    SELECT vec_id, lbl,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY c DESC, lbl) AS r
         |    FROM vt$i) WHERE r = 1),
         |lp$i AS (
         |  SELECT s.vec_id,
         |    CASE WHEN s.vec_id % 5 = 0 THEN s.label ELSE m.lbl END AS lbl
         |  FROM embeddings s LEFT JOIN md$i m USING (vec_id))""".stripMargin
    }.mkString(",\n")
    lshGraphCte +
      s""",
         |edges AS (
         |  SELECT src_id AS vec_id, neighbor_id FROM scored WHERE rnk <= 5),
         |lp0 AS (
         |  SELECT vec_id, CASE WHEN vec_id % 5 = 0 THEN label END AS lbl
         |  FROM embeddings),
         |$rounds
         |SELECT vec_id,
         |  CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END::BIGINT AS is_seed,
         |  coalesce(lbl, -1) AS label
         |FROM lp3 ORDER BY vec_id""".stripMargin
  }

  /** D11 oracle: the D7 edge CTE + the power iteration UNROLLED (one
    * CTE per iteration) in the same scaled-BIGINT integer arithmetic
    * as [[knnGraphPagerank]] — DuckDB `//` ≡ Spark `div` on the
    * all-positive ranks, so the match is exact, not approximate.
    */
  private def pagerankOracle: String = {
    val iterCtes = (1 to 6).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT nodes.vec_id, CAST(
         |    (3000000000000 // (20 * (SELECT n FROM nn)))
         |    + (17 * coalesce(s.s, 0)) // 20 AS BIGINT) AS r
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS vec_id, CAST(sum(p.r // o.od) AS BIGINT) AS s
         |    FROM edges e
         |    JOIN $prev p ON p.vec_id = e.src
         |    JOIN od o ON o.src = e.src
         |    GROUP BY e.dst) s USING (vec_id))""".stripMargin
    }.mkString(",\n")
    lshGraphCte +
      s""",
         |edges AS (
         |  SELECT src_id AS src, neighbor_id AS dst FROM scored
         |  WHERE rnk <= 5),
         |nodes AS (SELECT vec_id FROM embeddings),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |od AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
         |r0 AS (
         |  SELECT vec_id, CAST(1000000000000 // (SELECT n FROM nn)
         |    AS BIGINT) AS r
         |  FROM nodes),
         |""".stripMargin + iterCtes +
      """
        |SELECT vec_id, r AS pr FROM r6 ORDER BY vec_id""".stripMargin
  }

  /** Multi-table variant: 8 tables × 8 planes, seed ((t·31+p)·64+j)+1,
    * any-table collision, candidates deduped before scoring — exactly
    * [[knnLshMulti]]'s shape.
    */
  private def lshOracleMulti: String = {
    import OracleU64._
    s"""WITH seeds AS (
       |  SELECT t, p, j, (((t * 31 + p) * 64 + j) + 1)::HUGEINT AS x0
       |  FROM (SELECT unnest(range(0, 8)) AS t),
       |       (SELECT unnest(range(0, 8)) AS p),
       |       (SELECT unnest(range(0, 64)) AS j)),
       |m1 AS (SELECT t, p, j, ${mixStep1("x0")} AS x FROM seeds),
       |m2 AS (SELECT t, p, j, ${mixStep2("x")} AS x FROM m1),
       |m3 AS (SELECT t, p, j, ${mixStep3("x")} AS x FROM m2),
       |m4 AS (SELECT t, p, j, ${mixStep4("x")} AS h FROM m3),
       |comps AS (SELECT t, p, j,
       |  ${shr("h", 11)}::DOUBLE / 4503599627370496.0 * 2.0 - 1.0 AS comp
       |  FROM m4),
       |planes AS (
       |  SELECT t, p, array_agg(comp ORDER BY j) AS pl
       |  FROM comps GROUP BY t, p),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |dots AS (
       |  SELECT vec_id, t, p, list_reduce(
       |    list_prepend(0.0::DOUBLE, [pl[i] * e[i] for i in range(1, 65)]),
       |    (a, b) -> a + b) AS d
       |  FROM v CROSS JOIN planes),
       |buckets AS (
       |  SELECT vec_id, t, CAST(coalesce(
       |    sum(CASE WHEN d >= 0 THEN (1::BIGINT << p) END), 0) AS BIGINT)
       |    AS bucket
       |  FROM dots GROUP BY vec_id, t),
       |q AS (
       |  SELECT vec_id AS query_id, t, bucket FROM buckets
       |  WHERE vec_id < 10),
       |cand AS (
       |  SELECT DISTINCT q.query_id, b.vec_id
       |  FROM q JOIN buckets b
       |    ON b.t = q.t AND b.bucket = q.bucket AND b.vec_id <> q.query_id),
       |scored AS (
       |  SELECT c.query_id, c.vec_id AS neighbor_id,
       |    list_cosine_similarity(vq.e, vn.e) AS cos,
       |    row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY list_cosine_similarity(vq.e, vn.e) DESC, c.vec_id)
       |      AS rnk
       |  FROM cand c
       |  JOIN v vq ON vq.vec_id = c.query_id
       |  JOIN v vn ON vn.vec_id = c.vec_id)
       |SELECT query_id, rnk, neighbor_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
       |FROM scored WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** D22 — embedding hygiene audit: the pre-indexing sanity report an
    * ANN rollout runs before any of D1–D8 touches the collection. Per
    * label: vector count, dimensionality min/max (≠ means a corrupt
    * batch), zero-vector count (cosine against them is undefined —
    * they break D2/D8 unless clamped, see the SQ8 scale clamp), and
    * the L2-norm distribution (mean/std/min/max) — a wild norm spread
    * means the embedder mixed checkpoints or the collection mixes
    * normalized and raw vectors, which silently corrupts dot-product
    * retrieval.
    *
    * Exactness shape: each vector's norm is an index-ordered fold
    * (bit-identical to the oracle's list fold), then SCALED TO 1e4
    * INTEGER CENTS before any cross-row aggregation — integer sums
    * are associative, so partitioning cannot move the mean/std the
    * way a float `avg` can; the final mean/std derive from the two
    * exact integer sums (Σs, Σs² both < 2⁵³, exact in doubles) with
    * one 4dp rounding at the edge. One corpus pass, label-keyed
    * partial aggregation — nothing corpus-sized shuffles.
    */
  def embeddingNormAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "embeddings")
      .withColumn("d", size($"embedding").cast("long"))
      .withColumn("norm", sqrt(aggregate($"embedding", lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .withColumn("s", floor($"norm" * 10000.0 + 0.5).cast("long"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        min($"d").as("dim_min"), max($"d").as("dim_max"),
        sum(when($"s" === 0L, 1L).otherwise(0L)).as("n_zero_vecs"),
        sum($"s").as("ss"), sum($"s" * $"s").as("ss2"),
        min($"s").as("smin"), max($"s").as("smax"))
      .select($"label", $"n_vecs", $"dim_min", $"dim_max", $"n_zero_vecs",
        (floor($"ss".cast("double") / $"n_vecs" + 0.5) / 10000.0)
          .as("mean_norm"),
        (floor(sqrt(($"ss2".cast("double") -
          $"ss".cast("double") * $"ss" / $"n_vecs") / $"n_vecs") + 0.5)
          / 10000.0).as("std_norm"),
        ($"smin".cast("double") / 10000.0).as("min_norm"),
        ($"smax".cast("double") / 10000.0).as("max_norm"))
      .orderBy($"label")
  }

  /** D24 — Johnson–Lindenstrauss random projection 64 → 16 dims with
    * a DETERMINISTIC ±1 sign matrix (Achlioptas construction, signs
    * from md5 parity — retry-safe, no RNG state, any executor
    * regenerates the identical matrix): the cheap dimensionality
    * reduction that front-ends D2/D8 when the raw dimension is the
    * cost driver — pairwise distances survive to ~1/√k relative
    * error, which is enough for the COARSE stage of a two-stage
    * retrieval (project → shortlist → exact rescore in full
    * dimension, the D8 pattern).
    *
    * Exactness shape: elements quantize to 1e4 integer units FIRST,
    * so each projected coordinate is a pure BIGINT signed sum —
    * associative, partitioning-proof, and order-free on both engines
    * (no float fold anywhere); the single double division at the edge
    * (/10⁴/√16, and √16 = 4 is exact) is engine-identical. One
    * corpus pass, no shuffle at all until the explode's exchange-free
    * projection; the 16×64 sign LUT is a compile-time literal, not a
    * join side.
    */
  def jlProject(spark: SparkSession, dir: String,
                outDims: Int = 16): DataFrame = {
    import spark.implicits._
    val inDims = 64
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, d: Int): Int = {
      val hex = md.digest(s"jl:$j:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1 else -1
    }
    val signs: Seq[Seq[Int]] =
      Seq.tabulate(outDims, inDims)((j, d) => sign(j, d))
    val lut = typedLit(signs)
    Tables.load(spark, dir, "embeddings")
      .withColumn("q", transform($"embedding",
        x => floor(x.cast("double") * 10000.0 + 0.5).cast("long")))
      .withColumn("p", transform(sequence(lit(0), lit(outDims - 1)),
        j => aggregate(
          zip_with($"q", element_at(lut, j + 1),
            (a, s) => a * s),
          lit(0L), (acc, x) => acc + x)))
      .select($"vec_id", posexplode($"p").as(Seq("dim", "pint")))
      .select($"vec_id", $"dim".cast("long").as("dim"),
        ($"pint".cast("double") / (10000.0 * math.sqrt(outDims)))
          .as("value"))
      .orderBy($"vec_id", $"dim")
  }

  /** D25 — JL distortion report: the measured justification for D24
    * (the C21 estimator-audit discipline pointed at the projection) —
    * per pair of a fixed 32-vector probe set, the original vs
    * projected squared distance and their ratio, which the JL lemma
    * says concentrates near 1 at ~1/√k spread. This is the number a
    * deployment reads to size D24's shortlist multiplier (a p99 ratio
    * of 2 ⇒ shortlist 2× deeper before the exact rescore).
    *
    * Exactness shape: both distances are pure BIGINT sums of squared
    * integer deltas (quantized exactly like D24 — the projected side
    * reuses the identical md5-parity LUT), so the single ratio
    * division is the only float op. The probe set is fixed-size: the
    * whole report is one tiny corpus-independent job regardless of
    * collection size.
    */
  def jlDistortion(spark: SparkSession, dir: String,
                   probeVecs: Int = 32): DataFrame = {
    import spark.implicits._
    val outDims = 16
    val inDims = 64
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, d: Int): Int = {
      val hex = md.digest(s"jl:$j:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1 else -1
    }
    val lut = typedLit(Seq.tabulate(outDims, inDims)((j, d) => sign(j, d)))
    val probes = Tables.load(spark, dir, "embeddings")
      .filter($"vec_id" < probeVecs)
      .withColumn("q", transform($"embedding",
        x => floor(x.cast("double") * 10000.0 + 0.5).cast("long")))
      .withColumn("p", transform(sequence(lit(0), lit(outDims - 1)),
        j => aggregate(
          zip_with($"q", element_at(lut, j + 1), (a, s) => a * s),
          lit(0L), (acc, x) => acc + x)))
      .select($"vec_id", $"q", $"p")
    val a = probes.select($"vec_id".as("vec_a"), $"q".as("qa"),
      $"p".as("pa"))
    val b = probes.select($"vec_id".as("vec_b"), $"q".as("qb"),
      $"p".as("pb"))
    a.join(b, $"vec_a" < $"vec_b")
      .withColumn("od2i", aggregate(
        zip_with($"qa", $"qb", (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("pd2i", aggregate(
        zip_with($"pa", $"pb", (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x))
      .select($"vec_a", $"vec_b",
        ($"od2i".cast("double") / 100000000.0).as("orig_d2"),
        ($"pd2i".cast("double") / (16.0 * 100000000.0)).as("proj_d2"),
        // null ratio for identical quantized probes (od2i = 0):
        // Spark would emit Infinity while DuckDB's float div-by-zero
        // behavior is settings-dependent — null on both sides is the
        // only portable answer.
        when($"od2i" > 0,
          floor($"pd2i".cast("double") / (lit(16.0) * $"od2i")
            * 1000000.0 + 0.5) / 1000000.0).as("ratio"))
      .orderBy($"vec_a", $"vec_b")
  }

  /** D28 — per-label centroid separation audit: for every label, the
    * vector count, centroid norm, and the distance from the label
    * centroid to the GLOBAL centroid — the class-geometry readout
    * behind "are these labels separable in embedding space at all?"
    * (collapsed per-label centroids ⇒ the labels carry no linear
    * signal and any centroid-based router/classifier downstream is
    * noise; a far-out centroid flags a batch-effect cluster).
    *
    * Exactness: components quantize to integer 1e-6 units; per-label
    * and global per-dim SUMS are exact Long aggregates
    * (partition-order independent), and the centroid difference per
    * dim uses the exact integer numerator su_d·N − g_d·n (DECIMAL ≙
    * HUGEINT) converted to double once; the ≤d-term distance fold
    * runs in SORTED dim order on both sides. Per-label mean-free:
    * nothing here ever divides inside the sum.
    *
    * Scale shape: one posexplode → (label, dim) partial agg
    * (corpus-linear); everything after runs on the labels×dims frame.
    */
  def labelCentroidSeparation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = Tables.load(spark, dir, "embeddings")
      .select($"label".cast("long").as("label"),
        posexplode(transform($"embedding",
          x => floor(x.cast("double") * 1000000.0 + 0.5).cast("long")))
          .as(Seq("dim", "xq")))
    val per = q.groupBy($"label", $"dim")
      .agg(sum($"xq").as("su"), count(lit(1)).as("nd"))
    val glob = per.groupBy($"dim")
      .agg(sum($"su").as("g"), sum($"nd").as("nn"))
    val joined = per.join(glob, "dim")
      .withColumn("diff",
        ($"su".cast("decimal(38,0)") * $"nn" -
          $"g".cast("decimal(38,0)") * $"nd").cast("double"))
    joined.groupBy($"label")
      .agg(max($"nd").as("n_vecs"), max($"nn").as("n_total"),
        sum($"su".cast("decimal(38,0)") * $"su").as("ss"),
        sort_array(collect_list(struct($"dim", $"diff"))).as("ds"))
      .select($"label", $"n_vecs",
        (floor(sqrt($"ss".cast("double")) /
          ($"n_vecs".cast("double") * 1000000.0) * 1000000.0 + 0.5)
          / 1000000.0).as("centroid_norm"),
        (floor(sqrt(aggregate($"ds", lit(0.0),
          (a, x) => a + x.getField("diff") * x.getField("diff"))) /
          ($"n_vecs".cast("double") * $"n_total" * 1000000.0)
          * 1000000.0 + 0.5) / 1000000.0).as("dist_to_global"))
      .orderBy($"label")
  }

  /** D29 — nearest-centroid label purity: assign every vector to its
    * nearest label centroid (the 4dp-parity assignment G12 already
    * proves) and report, per TRUE label, how many come home — the
    * measured answer to D28's geometry question ("the centroids are
    * separated" ⇒ but do the POINTS respect the separation?). Purity
    * near 1/|labels| says the labels carry no centroid-linear signal;
    * the top confusion partner names which pair to merge or re-audit.
    *
    * Scale shape: centroids are the labels×dims offline artifact
    * (bounded collect, the audited kind); assignment is one broadcast
    * scan with an array-order fold per (vector, label) — corpus-
    * linear ×|labels|; the rollup is labels²-bounded. Ties in the
    * argmin break on label (array_min struct order), identically in
    * the oracle's (dist, label) row_number.
    */
  def labelPurity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = collectedCentroids(spark, dir)
    if (cents.isEmpty)
      return Seq.empty[(Long, Long, Long, Double, Long)]
        .toDF("label", "n_vecs", "n_correct", "purity", "confused_with")
        .select($"label", $"n_vecs", $"n_correct", $"purity",
          $"confused_with".cast("long"))
    val assigned = assignToCentroids(loadVecs(spark, dir), cents)
      .select($"vec_id", $"assigned_label".cast("long").as("al"))
    val truth = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label".cast("long").as("label"))
    val conf = truth.join(assigned, "vec_id")
      .groupBy($"label", $"al").agg(count(lit(1)).as("n"))
    conf.groupBy($"label")
      .agg(sum($"n").as("n_vecs"),
        sum(when($"al" === $"label", $"n").otherwise(0L))
          .as("n_correct"),
        max(when($"al" =!= $"label",
          struct($"n", (-$"al").as("neg")))).as("mc"))
      .select($"label", $"n_vecs", $"n_correct",
        (floor($"n_correct".cast("double") / $"n_vecs" * 10000.0 + 0.5)
          / 10000.0).as("purity"),
        (-$"mc.neg").as("confused_with"))
      .orderBy($"label")
  }

  /** D31 oracle — all three bucket variants replayed bit-exactly: the
    * splitmix64 plane table (the lshGraphCte chain), per-dimension
    * exact integer-unit sums, one double division per dimension, the
    * hash-sample + unrolled power iteration for the top PC, the
    * index-ordered μ·p / u·p / μ·u folds, and the same
    * `dot ≥ threshold` sign tests; all outputs are integers.
    */
  private def lshCenteredOracle: String = {
    import OracleU64._
    s"""WITH seeds AS (
       |  SELECT p, j, (p * 64 + j)::HUGEINT AS x0
       |  FROM (SELECT unnest(range(0, 12)) AS p),
       |       (SELECT unnest(range(0, 64)) AS j)),
       |m1 AS (SELECT p, j, ${mixStep1("x0")} AS x FROM seeds),
       |m2 AS (SELECT p, j, ${mixStep2("x")} AS x FROM m1),
       |m3 AS (SELECT p, j, ${mixStep3("x")} AS x FROM m2),
       |m4 AS (SELECT p, j, ${mixStep4("x")} AS h FROM m3),
       |comps AS (SELECT p, j,
       |  ${shr("h", 11)}::DOUBLE / 4503599627370496.0 * 2.0 - 1.0 AS comp
       |  FROM m4),
       |planes AS (
       |  SELECT p, array_agg(comp ORDER BY j) AS pl FROM comps GROUP BY p),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |ds AS (SELECT unnest(range(1, 65)) AS j),
       |sums AS (
       |  SELECT d.j,
       |    CAST(sum(CAST(floor(v.e[d.j] * 1000000.0 + 0.5) AS BIGINT))
       |      AS BIGINT) AS s,
       |    count(*)::BIGINT AS n
       |  FROM v, ds d GROUP BY d.j),
       |mn AS (SELECT j, s::DOUBLE / (n * 1000000)::DOUBLE AS m FROM sums),
       |mvec AS (SELECT list(m ORDER BY j) AS mv FROM mn),
       |${OracleU64.hashSampleCtes(2048)},
       |${OracleU64.powerIterCtes(5)},
       |thr AS (
       |  SELECT p,
       |    list_reduce(
       |      list_prepend(0.0::DOUBLE, [pl[i] * mv[i] for i in range(1, 65)]),
       |      (a, b) -> a + b) AS t,
       |    list_reduce(
       |      list_prepend(0.0::DOUBLE, [pl[i] * ul[i] for i in range(1, 65)]),
       |      (a, b) -> a + b) AS u
       |  FROM planes, mvec, uvec),
       |muu AS (
       |  SELECT list_reduce(
       |    list_prepend(0.0::DOUBLE, [mv[i] * ul[i] for i in range(1, 65)]),
       |    (a, b) -> a + b) AS m
       |  FROM mvec, uvec),
       |dots AS (
       |  SELECT vec_id, p, list_reduce(
       |    list_prepend(0.0::DOUBLE, [pl[i] * e[i] for i in range(1, 65)]),
       |    (a, b) -> a + b) AS d
       |  FROM v CROSS JOIN planes),
       |dxu AS (
       |  SELECT vec_id, list_reduce(
       |    list_prepend(0.0::DOUBLE, [ul[i] * e[i] for i in range(1, 65)]),
       |    (a, b) -> a + b) AS s
       |  FROM v, uvec),
       |braw AS (
       |  SELECT vec_id, CAST(coalesce(
       |    sum(CASE WHEN d >= 0 THEN (1::BIGINT << p) END), 0) AS BIGINT)
       |    AS bucket
       |  FROM dots GROUP BY vec_id),
       |bctr AS (
       |  SELECT dd.vec_id, CAST(coalesce(
       |    sum(CASE WHEN dd.d >= th.t THEN (1::BIGINT << dd.p) END), 0)
       |    AS BIGINT) AS bucket
       |  FROM dots dd JOIN thr th ON th.p = dd.p GROUP BY dd.vec_id),
       |bpc AS (
       |  SELECT dd.vec_id, CAST(coalesce(
       |    sum(CASE WHEN dd.d >= th.t + (du.s - mu.m) * th.u
       |        THEN (1::BIGINT << dd.p) END), 0)
       |    AS BIGINT) AS bucket
       |  FROM dots dd
       |  JOIN thr th ON th.p = dd.p
       |  JOIN dxu du ON du.vec_id = dd.vec_id, muu mu
       |  GROUP BY dd.vec_id),
       |occ AS (
       |  SELECT 'raw' AS variant, bucket, count(*)::BIGINT AS o
       |  FROM braw GROUP BY 1, 2
       |  UNION ALL
       |  SELECT 'centered', bucket, count(*)::BIGINT
       |  FROM bctr GROUP BY 1, 2
       |  UNION ALL
       |  SELECT 'pc_removed', bucket, count(*)::BIGINT
       |  FROM bpc GROUP BY 1, 2)
       |SELECT variant, count(*)::BIGINT AS n_buckets,
       |  max(o)::BIGINT AS max_occupancy,
       |  (CAST(sum(o * (o - 1)) AS BIGINT) // 2)::BIGINT AS candidate_pairs
       |FROM occ GROUP BY variant ORDER BY variant""".stripMargin
  }

  /** D14 oracle (r13; was rows-only): the greedy MMR selection
    * UNROLLED — k row-number argmax steps over the m=16 shortlist,
    * each step scoring 0.5·rel − 0.5·max(cos to selected) with the
    * engine's exact float ops (`list_cosine_similarity` ≙ the pinned
    * CosineSimilarity fold; one multiply and one subtract per score;
    * (score DESC, vec_id) tie order ≙ the driver loop's min-id tie
    * break). Selection happens on RAW floats exactly like the engine;
    * only the emitted score is 6-dp floored.
    */
  private def mmrOracle(k: Int = 5, m: Int = 16,
                        numQueries: Int = 10): String = {
    def step(t: Int): String = {
      val prev = s"sel${t - 1}"
      s"""st$t AS (
         |  SELECT query_id, cid, e, score FROM (
         |    SELECT c.query_id, c.cid, c.e,
         |      0.5 * c.cos - 0.5 * (
         |        SELECT max(list_cosine_similarity(c.e, s.e))
         |        FROM $prev s WHERE s.query_id = c.query_id) AS score,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY 0.5 * c.cos - 0.5 * (
         |          SELECT max(list_cosine_similarity(c.e, s.e))
         |          FROM $prev s WHERE s.query_id = c.query_id) DESC,
         |          c.cid) AS r
         |    FROM sl c
         |    WHERE NOT EXISTS (SELECT 1 FROM $prev s
         |      WHERE s.query_id = c.query_id AND s.cid = c.cid))
         |  WHERE r = 1),
         |sel$t AS (
         |  SELECT query_id, rnk, cid, score, e FROM $prev
         |  UNION ALL
         |  SELECT query_id, $t AS rnk, cid, score, e FROM st$t),"""
        .stripMargin
    }
    s"""WITH mq AS (
       |  SELECT vec_id AS query_id, [x::DOUBLE for x in embedding] AS qv
       |  FROM embeddings WHERE vec_id < $numQueries),
       |mv AS (
       |  SELECT vec_id, [x::DOUBLE for x in embedding] AS e
       |  FROM embeddings),
       |sl AS (
       |  SELECT query_id, cid, cos, e FROM (
       |    SELECT mq.query_id, x.vec_id AS cid,
       |      list_cosine_similarity(mq.qv, x.e) AS cos, x.e,
       |      row_number() OVER (PARTITION BY mq.query_id
       |        ORDER BY list_cosine_similarity(mq.qv, x.e) DESC,
       |          x.vec_id) AS r
       |    FROM mq, mv x WHERE x.vec_id <> mq.query_id) WHERE r <= $m),
       |sel1 AS (
       |  SELECT query_id, 1 AS rnk, cid, score, e FROM (
       |    SELECT query_id, cid, e, 0.5 * cos - 0.5 * 0.0 AS score,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY 0.5 * cos - 0.5 * 0.0 DESC, cid) AS r
       |    FROM sl) WHERE r = 1),
       |${(2 to k).map(step).mkString("\n")}
       |fin AS (SELECT * FROM sel$k)
       |SELECT query_id, rnk::BIGINT AS rnk, cid AS vec_id,
       |  floor(score * 1000000.0 + 0.5) / 1000000.0 AS mmr_score
       |FROM fin ORDER BY query_id, rnk""".stripMargin
  }

  /** D5 oracle (r13; was rows-only): the whole PQ pipeline replayed
    * bit-exactly — the hash-ordered sample sliced into m=8 subspaces,
    * each trained by its own namespaced [[OracleU64.lloydBlock]]
    * (ks=16, 2 Lloyd steps, 8-dim folds), the corpus encoded by
    * per-subspace argmin with (d, code) tie order, per-query ADC
    * lookup tables from the same sequential squared-distance fold,
    * and the approximate distance folded over subspaces IN s ORDER
    * (the engine's `reduce(_ + _)` is a left fold) before the
    * (adc, vec_id) top-5 window.
    */
  private def pqOracle(k: Int = 5, numQueries: Int = 10, m: Int = 8,
                       ks: Int = 16, lloydIters: Int = 2): String = {
    import OracleU64._
    val subDim = 64 / m
    def slice(v: String, s: Int): String =
      s"$v[${s * subDim + 1}:${(s + 1) * subDim}]"
    val sliceCtes = (0 until m).map { s =>
      s"pts$s AS (SELECT pos, ${slice("v", s)} AS v FROM spts)"
    }.mkString(",\n")
    val books = (0 until m)
      .map(s => lloydBlock(s"p$s", ks, lloydIters, subDim, s"pts$s"))
      .mkString(",\n")
    def ct(s: Int): String = lloydLast(s"p$s", lloydIters)
    val encArms = (0 until m).map { s =>
      s"""    SELECT x.vec_id, $s AS s, c.i AS code,
         |      row_number() OVER (PARTITION BY x.vec_id
         |        ORDER BY ${dist2FoldDim(slice("x.v", s), "c.c", subDim)},
         |          c.i) AS r
         |    FROM vx x, ${ct(s)} c""".stripMargin
    }.mkString("\n    UNION ALL\n")
    val bookUnion = (0 until m).map { s =>
      s"SELECT $s AS s, i, c FROM ${ct(s)}"
    }.mkString(" UNION ALL ")
    val lutDist = dist2FoldDim(s"q.sq[sc.s + 1]", "sc.c", subDim)
    s"""WITH ${hashSampleCtes(2048)},
       |$sliceCtes,
       |$books,
       |enc AS MATERIALIZED (
       |  SELECT vec_id, s, code FROM (
       |$encArms) WHERE r = 1),
       |qs AS (
       |  SELECT vec_id AS query_id,
       |    [${(0 until m).map(s => slice("v", s)).mkString(", ")}] AS sq
       |  FROM vx WHERE vec_id < $numQueries),
       |lut AS MATERIALIZED (
       |  SELECT q.query_id, sc.s, sc.i AS code, $lutDist AS d
       |  FROM qs q, ($bookUnion) sc),
       |adc AS (
       |  SELECT e.vec_id, l.query_id,
       |    list_reduce(list_prepend(0.0, list(l.d ORDER BY l.s)),
       |      (a, b) -> a + b) AS adc
       |  FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
       |  GROUP BY e.vec_id, l.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id AS neighbor_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, vec_id) AS rnk
       |  FROM adc WHERE vec_id <> query_id)
       |SELECT query_id, rnk::BIGINT AS rnk, neighbor_id,
       |  floor(adc * 1000000.0 + 0.5) / 1000000.0 AS adc_dist
       |FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** D6 oracle (r13; was rows-only): the full IVF-PQ composition
    * replayed — the coarse quantizer is a 64-dim [[OracleU64.lloydBlock]],
    * the sample's residuals (against each point's nearest cell, (d, i)
    * tie order) slice into m=8 subspaces each trained by its own
    * namespaced block, the corpus assigns + residual-encodes in SQL
    * with the same folds, per-(query, probed-cell) residual lookup
    * tables come from the (d², i)-sorted nprobe=4 probe set, and the
    * ADC folds subspaces in s order before the (adc, vec_id) top-5.
    */
  private def ivfPqOracle(k: Int = 5, numQueries: Int = 10,
                          cells: Int = 8, nprobe: Int = 4, m: Int = 8,
                          ks: Int = 16, lloydIters: Int = 2): String = {
    import OracleU64._
    val subDim = 64 / m
    def slice(v: String, s: Int): String =
      s"$v[${s * subDim + 1}:${(s + 1) * subDim}]"
    val coarse = lloydBlock("", cells, lloydIters, 64, "spts")
    val cct = lloydLast("", lloydIters)
    val sliceCtes = (0 until m).map { s =>
      s"rpts$s AS (SELECT pos, ${slice("v", s)} AS v FROM rs)"
    }.mkString(",\n")
    val books = (0 until m)
      .map(s => lloydBlock(s"q$s", ks, lloydIters, subDim, s"rpts$s"))
      .mkString(",\n")
    def ct(s: Int): String = lloydLast(s"q$s", lloydIters)
    val encArms = (0 until m).map { s =>
      s"""    SELECT cr.vec_id, $s AS s, c.i AS code,
         |      row_number() OVER (PARTITION BY cr.vec_id
         |        ORDER BY ${dist2FoldDim(slice("cr.rv", s), "c.c", subDim)},
         |          c.i) AS r
         |    FROM cr, ${ct(s)} c""".stripMargin
    }.mkString("\n    UNION ALL\n")
    val bookUnion = (0 until m).map { s =>
      s"SELECT $s AS s, i, c FROM ${ct(s)}"
    }.mkString(" UNION ALL ")
    s"""WITH ${hashSampleCtes(2048)},
       |$coarse,
       |rsa AS MATERIALIZED (
       |  SELECT pos, cell FROM (
       |    SELECT p.pos, c.i AS cell,
       |      row_number() OVER (PARTITION BY p.pos
       |        ORDER BY ${dist2Fold("p.v", "c.c")}, c.i) AS r
       |    FROM spts p, $cct c) WHERE r = 1),
       |rs AS MATERIALIZED (
       |  SELECT p.pos, [p.v[j] - c.c[j] for j in range(1, 65)] AS v
       |  FROM spts p JOIN rsa USING (pos) JOIN $cct c ON c.i = rsa.cell),
       |$sliceCtes,
       |$books,
       |ca AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT x.vec_id, c.i AS cell,
       |      row_number() OVER (PARTITION BY x.vec_id
       |        ORDER BY ${dist2Fold("x.v", "c.c")}, c.i) AS r
       |    FROM vx x, $cct c) WHERE r = 1),
       |cr AS MATERIALIZED (
       |  SELECT x.vec_id, ca.cell,
       |    [x.v[j] - c.c[j] for j in range(1, 65)] AS rv
       |  FROM vx x JOIN ca USING (vec_id) JOIN $cct c ON c.i = ca.cell),
       |enc AS MATERIALIZED (
       |  SELECT vec_id, s, code FROM (
       |$encArms) WHERE r = 1),
       |qp AS MATERIALIZED (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.vec_id AS query_id, q.v AS qv, c.i AS cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${dist2Fold("q.v", "c.c")}, c.i) AS r
       |    FROM vx q, $cct c WHERE q.vec_id < $numQueries)
       |  WHERE r <= $nprobe),
       |qr AS MATERIALIZED (
       |  SELECT qp.query_id, qp.cell,
       |    [qp.qv[j] - c.c[j] for j in range(1, 65)] AS rv
       |  FROM qp JOIN $cct c ON c.i = qp.cell),
       |lut AS MATERIALIZED (
       |  SELECT qr.query_id, qr.cell, sc.s, sc.i AS code,
       |    ${dist2FoldDim(s"qr.srv[sc.s + 1]", "sc.c", subDim)} AS d
       |  FROM (SELECT query_id, cell,
       |          [${(0 until m).map(s => slice("rv", s)).mkString(", ")}]
       |            AS srv
       |        FROM qr) qr, ($bookUnion) sc),
       |adc AS (
       |  SELECT e.vec_id, l.query_id,
       |    list_reduce(list_prepend(0.0, list(l.d ORDER BY l.s)),
       |      (a, b) -> a + b) AS adc
       |  FROM enc e
       |  JOIN ca ON ca.vec_id = e.vec_id
       |  JOIN lut l ON l.cell = ca.cell AND l.s = e.s AND l.code = e.code
       |  GROUP BY e.vec_id, l.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id AS neighbor_id, adc,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, vec_id) AS rnk
       |  FROM adc WHERE vec_id <> query_id)
       |SELECT query_id, rnk::BIGINT AS rnk, neighbor_id,
       |  floor(adc * 1000000.0 + 0.5) / 1000000.0 AS adc_dist
       |FROM ranked WHERE rnk <= $k
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** D21 oracle (r13; was rows-only): the same per-subspace codebook
    * replay as [[pqOracle]], then per-row MIN squared error (float
    * min is order-independent), 1e-6-unit quantization, HUGEINT sum
    * ≙ the engine's DECIMAL(38,0), and the exact integer half-up
    * mean (2·Σ + n) / (2·n).
    */
  private def pqDistortionOracle(m: Int = 8, ks: Int = 16,
                                 lloydIters: Int = 2): String = {
    import OracleU64._
    val subDim = 64 / m
    def slice(v: String, s: Int): String =
      s"$v[${s * subDim + 1}:${(s + 1) * subDim}]"
    val sliceCtes = (0 until m).map { s =>
      s"pts$s AS (SELECT pos, ${slice("v", s)} AS v FROM spts)"
    }.mkString(",\n")
    val books = (0 until m)
      .map(s => lloydBlock(s"p$s", ks, lloydIters, subDim, s"pts$s"))
      .mkString(",\n")
    def ct(s: Int): String = lloydLast(s"p$s", lloydIters)
    val distArms = (0 until m).map { s =>
      s"""    SELECT x.vec_id, $s AS s,
         |      ${dist2FoldDim(slice("x.v", s), "c.c", subDim)} AS d
         |    FROM vx x, ${ct(s)} c""".stripMargin
    }.mkString("\n    UNION ALL\n")
    s"""WITH ${hashSampleCtes(2048)},
       |$sliceCtes,
       |$books,
       |md AS MATERIALIZED (
       |  SELECT vec_id, s,
       |    CAST(floor(min(d) * 1000000.0 + 0.5) AS HUGEINT) AS du
       |  FROM (
       |$distArms) GROUP BY vec_id, s),
       |ag AS (
       |  SELECT s, sum(du) AS su, count(*)::HUGEINT AS n
       |  FROM md GROUP BY s)
       |SELECT s::BIGINT AS subspace,
       |  ((su * 2 + n) // (n * 2))::DOUBLE / 1000000.0 AS mse
       |FROM ag ORDER BY subspace""".stripMargin
  }

  private val oraclesBase: Map[String, String] = Map(
    "knn_lsh_centered" -> lshCenteredOracle,
    "knn_mmr_topk" -> mmrOracle(),
    "knn_pq" -> pqOracle(),
    "knn_ivfpq" -> ivfPqOracle(),
    "knn_pq_distortion" -> pqDistortionOracle(),
    // D2a — full-hash via the OracleU64.lloydReplay bit-exact training
    // replay (r13; was rows-only): cells = 8, one Lloyd step, then the
    // nprobe = 4 nearest-cell probes per query ((d, i) tie order = the
    // engine's array_sort-of-struct), within-probed-cells cosine and
    // the pinned (cos DESC, vec_id) window top-5.
    "knn_ivf" ->
      (graft.ops.OracleU64.lloydReplay(k = 8, iters = 1) + s""",
         |qp AS MATERIALIZED (
         |  SELECT query_id, i AS probe_cell FROM (
         |    SELECT q.vec_id AS query_id, c.i,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${graft.ops.OracleU64.dist2Fold("q.v", "c.c")},
         |          c.i) AS r
         |    FROM vx q, ct1 c WHERE q.vec_id < 10) WHERE r <= 4),
         |scored AS (
         |  SELECT p.query_id, f.vec_id AS neighbor_id,
         |    list_cosine_similarity(qv.v, nv.v) AS cos,
         |    row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY list_cosine_similarity(qv.v, nv.v) DESC,
         |        f.vec_id) AS rnk
         |  FROM qp p
         |  JOIN fa f ON f.cell = p.probe_cell AND f.vec_id <> p.query_id
         |  JOIN vx qv ON qv.vec_id = p.query_id
         |  JOIN vx nv ON nv.vec_id = f.vec_id)
         |SELECT query_id, rnk::BIGINT AS rnk, neighbor_id,
         |  floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
         |FROM scored WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin),
    // D23 — full-hash (r13; was rows-only): same replayed index, the
    // four probe settings UNROLLED and unioned, recall counted against
    // the brute-force exact top-5 derived in-query.
    "knn_ivf_nprobe_sweep" ->
      (graft.ops.OracleU64.lloydReplay(k = 8, iters = 1) + s""",
         |qs AS (SELECT vec_id AS query_id, v AS qv FROM vx
         |       WHERE vec_id < 10),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, x.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY list_cosine_similarity(q.qv, x.v) DESC,
         |          x.vec_id) AS rnk
         |    FROM qs q, vx x WHERE x.vec_id <> q.query_id)
         |  WHERE rnk <= 5),
         |pr AS (
         |  SELECT q.query_id, c.i AS probe_cell,
         |    row_number() OVER (PARTITION BY q.query_id
         |      ORDER BY ${graft.ops.OracleU64.dist2Fold("q.qv", "c.c")},
         |        c.i) AS r
         |  FROM qs q, ct1 c),
         |${Seq(1, 2, 4, 8).map { np =>
            s"""got$np AS (
               |  SELECT query_id, neighbor_id FROM (
               |    SELECT p.query_id, f.vec_id AS neighbor_id,
               |      row_number() OVER (PARTITION BY p.query_id
               |        ORDER BY list_cosine_similarity(qv.v, nv.v) DESC,
               |          f.vec_id) AS rnk
               |    FROM (SELECT query_id, probe_cell FROM pr
               |          WHERE r <= $np) p
               |    JOIN fa f ON f.cell = p.probe_cell
               |      AND f.vec_id <> p.query_id
               |    JOIN vx qv ON qv.vec_id = p.query_id
               |    JOIN vx nv ON nv.vec_id = f.vec_id)
               |  WHERE rnk <= 5),
               |r$np AS (
               |  SELECT $np::BIGINT AS nprobe,
               |    (SELECT count(*) FROM got$np g
               |     JOIN exact e ON e.query_id = g.query_id
               |       AND e.neighbor_id = g.neighbor_id)::BIGINT AS n_hits,
               |    (SELECT count(*) FROM exact)::BIGINT AS n_total)"""
              .stripMargin
          }.mkString(",\n")}
         |SELECT nprobe, n_hits, n_total,
         |  floor(n_hits::DOUBLE / n_total * 1000000.0 + 0.5) / 1000000.0
         |    AS recall
         |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
         |      UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r8)
         |ORDER BY nprobe""".stripMargin),
    // D19 — full-hash via the OracleU64.lloydReplay bit-exact training
    // replay (r13; was rows-only): cells = 16, 5 unrolled Lloyd steps,
    // then the same count/share/imbalance arithmetic left-to-right.
    "knn_ivf_cell_stats" ->
      (OracleU64.lloydReplay(k = 16, iters = 5) +
        """,
          |per AS (
          |  SELECT cell::BIGINT AS cell, count(*)::BIGINT AS n
          |  FROM fa GROUP BY 1),
          |tot AS (
          |  SELECT sum(n)::DOUBLE AS total,
          |    count(*)::DOUBLE AS nonempty FROM per)
          |SELECT cell, n,
          |  floor(n / total * 10000.0 + 0.5) / 10000.0 AS share,
          |  floor(n * nonempty / total * 10000.0 + 0.5) / 10000.0
          |    AS imbalance
          |FROM per, tot ORDER BY cell""".stripMargin),
    "embedding_label_purity" -> {
      // the G12 assignment CTE re-used verbatim, then a truth join +
      // labels²-bounded confusion rollup
      val assign = centroidAssignOracle
        .replace("SELECT vec_id, label AS assigned_label,",
          "SELECT vec_id, label AS al,")
        .replace("floor(dist * 1000000.0 + 0.5) / 1000000.0 AS dist\n",
          "0 AS unused\n")
      s"""WITH asg AS ($assign),
         |t AS (SELECT vec_id, label::BIGINT AS label FROM embeddings),
         |c AS (
         |  SELECT t.label, asg.al::BIGINT AS al, count(*) AS n
         |  FROM t JOIN asg USING (vec_id) GROUP BY 1, 2),
         |p AS (
         |  SELECT label, CAST(sum(n) AS BIGINT) AS n_vecs,
         |    CAST(sum(CASE WHEN al = label THEN n ELSE 0 END)
         |      AS BIGINT) AS n_correct
         |  FROM c GROUP BY label),
         |w AS (
         |  SELECT label, al, row_number() OVER (
         |    PARTITION BY label ORDER BY n DESC, al) AS rk
         |  FROM c WHERE al <> label),
         |mc AS (SELECT label, al AS confused_with FROM w WHERE rk = 1)
         |SELECT p.label, p.n_vecs, p.n_correct,
         |  floor(p.n_correct::DOUBLE / p.n_vecs * 10000.0 + 0.5)
         |    / 10000.0 AS purity,
         |  mc.confused_with
         |FROM p LEFT JOIN mc USING (label) ORDER BY p.label""".stripMargin
    },
    "embedding_label_centroids" ->
      """WITH q AS (
        |  SELECT label::BIGINT AS label,
        |    generate_subscripts(embedding, 1)::BIGINT - 1 AS dim,
        |    CAST(floor(unnest(embedding)::DOUBLE * 1000000.0 + 0.5)
        |      AS BIGINT) AS xq
        |  FROM embeddings),
        |per AS (
        |  SELECT label, dim, sum(xq)::BIGINT AS su,
        |    count(*)::BIGINT AS nd
        |  FROM q GROUP BY label, dim),
        |gtot AS (
        |  SELECT dim, sum(su)::BIGINT AS g, sum(nd)::BIGINT AS nn
        |  FROM per GROUP BY dim),
        |j AS (
        |  SELECT per.label, per.dim, per.su, per.nd, gtot.nn,
        |    (per.su::HUGEINT * gtot.nn
        |      - gtot.g::HUGEINT * per.nd)::DOUBLE AS diff
        |  FROM per JOIN gtot USING (dim)),
        |agg AS (
        |  SELECT label, max(nd) AS n_vecs, max(nn) AS n_total,
        |    sum(su::HUGEINT * su) AS ss,
        |    list_reduce(list_prepend(0.0::DOUBLE,
        |      coalesce(list(diff * diff ORDER BY dim), [])),
        |      (a, x) -> a + x) AS d2
        |  FROM j GROUP BY label)
        |SELECT label, n_vecs,
        |  floor(sqrt(ss::DOUBLE) / (n_vecs::DOUBLE * 1000000.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS centroid_norm,
        |  floor(sqrt(d2) / (n_vecs::DOUBLE * n_total * 1000000.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS dist_to_global
        |FROM agg ORDER BY label""".stripMargin,
    "embedding_jl_distortion" ->
      """WITH e AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |    generate_subscripts(embedding, 1) AS di
        |  FROM embeddings WHERE vec_id < 32),
        |q AS (
        |  SELECT vec_id, di - 1 AS d,
        |    CAST(floor(v::DOUBLE * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM e),
        |s AS (
        |  SELECT js.j, ds.d, CASE WHEN ('0x' || substring(
        |      md5('jl:' || js.j || ':' || ds.d), 1, 1))::INT % 2 = 0
        |    THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT unnest(range(0, 16)) AS j) js,
        |       (SELECT unnest(range(0, 64)) AS d) ds),
        |p AS (
        |  SELECT q.vec_id, s.j,
        |    CAST(sum(s.sgn * q.q) AS BIGINT) AS pint
        |  FROM q JOIN s ON s.d = q.d
        |  GROUP BY q.vec_id, s.j),
        |od AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS od2i
        |  FROM q a JOIN q b ON a.d = b.d AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |pd AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    CAST(sum((a.pint - b.pint) * (a.pint - b.pint)) AS BIGINT)
        |      AS pd2i
        |  FROM p a JOIN p b ON a.j = b.j AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT od.vec_a, od.vec_b,
        |  od2i::DOUBLE / 100000000.0 AS orig_d2,
        |  pd2i::DOUBLE / (16.0 * 100000000.0) AS proj_d2,
        |  CASE WHEN od2i > 0 THEN
        |    floor(pd2i::DOUBLE / (16.0 * od2i) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS ratio
        |FROM od JOIN pd ON pd.vec_a = od.vec_a AND pd.vec_b = od.vec_b
        |ORDER BY od.vec_a, od.vec_b""".stripMargin,
    "embedding_jl_project" ->
      """WITH e AS (
        |  SELECT vec_id, unnest(embedding) AS v,
        |    generate_subscripts(embedding, 1) AS di
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, di - 1 AS d,
        |    CAST(floor(v::DOUBLE * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM e),
        |s AS (
        |  SELECT js.j, ds.d, CASE WHEN ('0x' || substring(
        |      md5('jl:' || js.j || ':' || ds.d), 1, 1))::INT % 2 = 0
        |    THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT unnest(range(0, 16)) AS j) js,
        |       (SELECT unnest(range(0, 64)) AS d) ds),
        |p AS (
        |  SELECT q.vec_id, s.j AS dim,
        |    CAST(sum(s.sgn * q.q) AS BIGINT) AS pint
        |  FROM q JOIN s ON s.d = q.d
        |  GROUP BY q.vec_id, s.j)
        |SELECT vec_id, dim::BIGINT AS dim,
        |  pint::DOUBLE / 40000.0 AS value
        |FROM p ORDER BY vec_id, dim""".stripMargin,
    "embedding_norm_audit" ->
      """WITH n AS (
        |  SELECT label, len(embedding)::BIGINT AS d,
        |    floor(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |      for x in embedding])) * 10000.0 + 0.5)::BIGINT AS s
        |  FROM embeddings),
        |g AS (
        |  SELECT label, count(*)::BIGINT AS n_vecs,
        |    min(d) AS dim_min, max(d) AS dim_max,
        |    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_zero_vecs,
        |    CAST(sum(s) AS BIGINT) AS ss, CAST(sum(s * s) AS BIGINT) AS ss2,
        |    min(s) AS smin, max(s) AS smax
        |  FROM n GROUP BY label)
        |SELECT label, n_vecs, dim_min, dim_max, n_zero_vecs,
        |  floor(ss::DOUBLE / n_vecs + 0.5) / 10000.0 AS mean_norm,
        |  floor(sqrt((ss2::DOUBLE - ss::DOUBLE * ss / n_vecs) / n_vecs)
        |    + 0.5) / 10000.0 AS std_norm,
        |  smin::DOUBLE / 10000.0 AS min_norm,
        |  smax::DOUBLE / 10000.0 AS max_norm
        |FROM g ORDER BY label""".stripMargin,
    "knn_lsh" -> lshOracleSingle,
    "diversity_sample" -> (lshGraphCte +
      """
        |SELECT bucket, count(*) AS n_members, min(vec_id) AS rep_vec_id
        |FROM buckets GROUP BY bucket ORDER BY bucket""".stripMargin),
    "knn_graph" -> lshGraphOracle,
    "knn_graph_sq8" -> sq8GraphOracle,
    "knn_graph_triangles" -> trianglesOracle,
    "knn_graph_closeness" -> closenessOracle,
    "knn_link_prediction" -> (lshGraphCte +
      """,
        |le AS (
        |  SELECT DISTINCT least(src_id, neighbor_id) AS a,
        |    greatest(src_id, neighbor_id) AS b
        |  FROM scored WHERE rnk <= 5),
        |adj AS (
        |  SELECT a AS u, b AS v FROM le
        |  UNION ALL SELECT b, a FROM le),
        |ldeg AS (SELECT u, count(*) AS d FROM adj GROUP BY u),
        |com AS (
        |  SELECT p.u AS x, q.u AS y, count(*) AS c
        |  FROM adj p JOIN adj q ON p.v = q.v AND p.u < q.u
        |  GROUP BY p.u, q.u),
        |lpc AS (
        |  SELECT com.x, com.y, com.c FROM com
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM le WHERE le.a = com.x AND le.b = com.y))
        |SELECT lpc.x AS vec_a, lpc.y AS vec_b, lpc.c AS common,
        |  floor(lpc.c::DOUBLE / (dx.d + dy.d - lpc.c)
        |    * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM lpc
        |JOIN ldeg dx ON dx.u = lpc.x
        |JOIN ldeg dy ON dy.u = lpc.y
        |ORDER BY jaccard DESC, vec_a, vec_b LIMIT 50""".stripMargin),
    "embedding_drift" -> (lshGraphCte +
      """,
        |dedges AS (
        |  SELECT src_id AS vec_id, neighbor_id FROM scored WHERE rnk <= 5),
        |dv AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |dims AS (SELECT unnest(range(1, 65)) AS dim),
        |nm AS (
        |  SELECT de.vec_id, dims.dim,
        |    CAST(sum(CAST(floor(nv.e[dims.dim] * 1000000.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS su
        |  FROM dedges de JOIN dv nv ON nv.vec_id = de.neighbor_id, dims
        |  GROUP BY de.vec_id, dims.dim),
        |own AS (
        |  SELECT vec_id, dims.dim,
        |    CAST(floor(e[dims.dim] * 1000000.0 + 0.5) AS BIGINT) AS xq
        |  FROM dv, dims),
        |dot AS (
        |  SELECT o.vec_id, sum(o.xq::HUGEINT * nm.su) AS xm,
        |    sum(o.xq::HUGEINT * o.xq) AS xx,
        |    sum(nm.su::HUGEINT * nm.su) AS mm
        |  FROM own o JOIN nm ON nm.vec_id = o.vec_id AND nm.dim = o.dim
        |  GROUP BY o.vec_id)
        |SELECT vec_id,
        |  CASE WHEN xx > 0 AND mm > 0 THEN
        |    floor((1.0 - xm::DOUBLE / (sqrt(xx::DOUBLE)
        |      * sqrt(mm::DOUBLE))) * 1000000.0 + 0.5) / 1000000.0
        |  END AS drift
        |FROM dot ORDER BY drift DESC NULLS LAST, vec_id LIMIT 50""".stripMargin),
    "knn_mutual_graph" -> (lshGraphCte +
      """,
        |g AS (
        |  SELECT src_id AS vec_id, rnk, neighbor_id,
        |    floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |  FROM scored WHERE rnk <= 5)
        |SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b,
        |  a.rnk AS rnk_ab, b.rnk AS rnk_ba, a.cosine
        |FROM g a JOIN g b
        |  ON b.vec_id = a.neighbor_id AND b.neighbor_id = a.vec_id
        |WHERE a.vec_id < a.neighbor_id
        |ORDER BY vec_a, vec_b""".stripMargin),
    "embedding_clusters" ->
      (lshGraphCte
        .replaceFirst("WITH seeds",
          """WITH RECURSIVE nplanes AS (
            |  SELECT CASE WHEN count(*) <= 32768 THEN 12
            |    ELSE length(printf('%b', ((count(*) + 7) // 8) - 1))
            |    END::INT AS np
            |  FROM embeddings),
            |seeds""".stripMargin)
        .replace("range(0, 12)", "range(0, (SELECT np FROM nplanes))") +
      """,
        |g AS (
        |  SELECT src_id AS vec_id, neighbor_id FROM scored
        |  WHERE rnk <= 5),
        |mu AS (
        |  SELECT a.vec_id AS doc_a, a.neighbor_id AS doc_b
        |  FROM g a JOIN g b
        |    ON b.vec_id = a.neighbor_id AND b.neighbor_id = a.vec_id
        |  WHERE a.vec_id < a.neighbor_id),
        |edges AS (
        |  SELECT doc_a, doc_b FROM mu
        |  UNION ALL SELECT doc_b, doc_a FROM mu),
        |reach(doc_id, lab) AS (
        |  SELECT DISTINCT doc_a, doc_a FROM edges
        |  UNION
        |  SELECT e.doc_a, r.lab FROM reach r
        |  JOIN edges e ON e.doc_b = r.doc_id),
        |comp AS (
        |  SELECT doc_id, min(lab) AS cluster_id
        |  FROM reach GROUP BY doc_id),
        |sized AS (
        |  SELECT cluster_id, count(*) AS cluster_size
        |  FROM comp GROUP BY cluster_id)
        |SELECT c.doc_id AS vec_id, c.cluster_id, s.cluster_size
        |FROM comp c JOIN sized s USING (cluster_id)
        |ORDER BY vec_id""".stripMargin),
    "knn_label_check" -> labelCheckOracle,
    "knn_label_prop" -> labelPropOracle,
    "knn_graph_pagerank" -> pagerankOracle,
    "knn_sq8" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |q0 AS (
        |  SELECT vec_id, e,
        |    greatest(list_max(list_transform(e, x -> abs(x))) / 127.0,
        |      1e-30) AS scale
        |  FROM v),
        |qz AS (
        |  SELECT vec_id, e, scale,
        |    list_transform(e, x -> CAST(floor(x / scale + 0.5) AS INT))
        |      AS codes
        |  FROM q0),
        |qq AS (
        |  SELECT vec_id AS query_id, e AS qe, scale AS qscale,
        |    codes AS qcodes
        |  FROM qz WHERE vec_id < 10),
        |s AS (
        |  SELECT qq.query_id, z.vec_id, z.scale, qq.qscale,
        |    list_reduce(list_prepend(0::BIGINT,
        |      [CAST(qq.qcodes[i] * z.codes[i] AS BIGINT)
        |        for i in range(1, 65)]),
        |      (a, b) -> a + b) AS iprod
        |  FROM qq JOIN qz z ON z.vec_id <> qq.query_id),
        |a AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY iprod::DOUBLE * scale * qscale DESC, vec_id) AS crnk
        |  FROM s),
        |cand AS (SELECT query_id, vec_id FROM a WHERE crnk <= 15),
        |r AS (
        |  SELECT c.query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv.e, cv.e) AS cos
        |  FROM cand c
        |  JOIN v qv ON qv.vec_id = c.query_id
        |  JOIN v cv ON cv.vec_id = c.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM r)
        |SELECT query_id, rnk, neighbor_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "knn_lsh_multi" -> lshOracleMulti,
    "embedding_centroids" ->
      """WITH x AS (
        |  SELECT label, i,
        |    CAST(floor(embedding[i]::DOUBLE * 1000000.0 + 0.5)
        |      AS BIGINT) AS xq
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t),
        |c AS (
        |  SELECT label, i - 1 AS i,
        |    floor(sum(xq)::DOUBLE / count(*) / 1000000.0
        |      * 10000.0 + 0.5) / 10000.0 + 0.0 AS centroid_v
        |  FROM x GROUP BY label, i),
        |n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
        |SELECT c.label, c.i, c.centroid_v, n.n_vecs
        |FROM c JOIN n USING (label) ORDER BY label, i""".stripMargin,
    "embedding_quantize" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |q AS (
        |  SELECT vec_id, e,
        |    greatest(list_max(list_transform(e, x -> abs(x))) / 127.0,
        |      1e-30) AS scale
        |  FROM v),
        |c AS (
        |  SELECT vec_id, e, scale,
        |    list_transform(e, x -> CAST(floor(x / scale + 0.5) AS INT)) AS codes
        |  FROM q)
        |SELECT vec_id,
        |  floor(scale * 1e9 + 0.5) / 1e9 AS scale,
        |  codes[1] AS code0, codes[64] AS code63,
        |  floor(list_max([abs(e[i] - codes[i] * scale)
        |    for i in range(1, len(e) + 1)]) * 1e9 + 0.5) / 1e9 AS max_err
        |FROM c ORDER BY vec_id""".stripMargin,
    "knn_brute_force" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, v.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.qe, v.e) AS cos,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qe, v.e) DESC, v.vec_id) AS rnk
        |  FROM q JOIN v ON v.vec_id <> q.query_id)
        |SELECT query_id, rnk, neighbor_id, floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |FROM scored WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin)

  /** D12 oracle: each method's existing exact oracle as a WITH-bearing
    * subquery, hit-joined against the brute-force subquery — integer
    * counts + one division, so the report is exact.
    */
  private def recallReportOracle: String = {
    def sub(name: String) =
      s"(SELECT query_id, neighbor_id FROM (${oraclesBase(name)}) t)"
    s"""WITH exact AS (SELECT * FROM ${sub("knn_brute_force")}),
       |cand AS (
       |  SELECT 'lsh' AS method, * FROM ${sub("knn_lsh")}
       |  UNION ALL SELECT 'lsh_multi' AS method, *
       |    FROM ${sub("knn_lsh_multi")}
       |  UNION ALL SELECT 'sq8' AS method, * FROM ${sub("knn_sq8")}),
       |tot AS (SELECT count(*) AS n_total FROM exact),
       |hits AS (
       |  SELECT method, count(*) AS n_hits
       |  FROM cand JOIN exact USING (query_id, neighbor_id)
       |  GROUP BY method)
       |SELECT m.method, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       |  t.n_total,
       |  floor(coalesce(h.n_hits, 0)::DOUBLE / t.n_total * 1000000.0
       |    + 0.5) / 1000000.0 AS recall
       |FROM (VALUES ('lsh'), ('lsh_multi'), ('sq8')) m(method)
       |LEFT JOIN hits h USING (method) CROSS JOIN tot t
       |ORDER BY method""".stripMargin
  }

  val oracles: Map[String, String] =
    oraclesBase + ("ann_recall_report" -> recallReportOracle)
}
