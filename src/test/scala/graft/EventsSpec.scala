package graft

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Events, TextAnalysis}

class EventsSpec extends SparkSpecBase {
  import spark.implicits._

  test("HLL approx distinct within rsd bounds of exact") {
    val rows = Events.approxUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("cohort retention matrix equals an in-memory recompute") {
    val wkUs = 7L * 86400L * 1000000L
    val got = Events.cohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val userWeeks = Tables.load(spark, sf, "events")
      .selectExpr("user_id", s"(ts DIV 1000) DIV $wkUs AS w").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cohorts = userWeeks.groupBy(_._1).view
      .mapValues(_.map(_._2).min).toMap
    val sizes = cohorts.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expected = userWeeks.toSeq
      .map { case (u, w) => (cohorts(u), w - cohorts(u)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k @ (cw, _), n) =>
      assert(got(k)._1 === n, s"cell $k users")
      val rate = math.floor(n.toDouble / sizes(cw) * 1000000.0 + 0.5) /
        1000000.0
      assert(got(k)._2 === rate, s"cell $k rate")
    }
    // offset 0 row of every cohort covers the whole cohort
    sizes.keys.foreach { cw =>
      assert(got((cw, 0L))._2 === 1.0, s"cohort $cw week-0 retention")
    }
  }

  test("funnel keeps users whose purchases all precede signup (edge case absent from corpus)") {
    // synthesize: user A converts, user B purchased only BEFORE signup,
    // user C never purchased
    val events = Seq(
      (1L, 1000L, 100L, "signup", 1.0, "{}"),
      (2L, 2000L, 100L, "purchase", 5.0, "{}"),
      (3L, 1000L, 200L, "purchase", 5.0, "{}"), // before B's signup
      (4L, 5000L, 200L, "signup", 1.0, "{}"),
      (5L, 1000L, 300L, "signup", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    // write with LongType ts (matches the nanosAsLong read layout)
    events.write.parquet(s"$tmp/events.parquet")
    val out = Analytics.eventsFunnel(spark, tmp).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out.keySet === Set(100L, 200L, 300L),
      "every signup user must appear, converted or not")
    assert(out(100L).isDefined, "user 100 converted")
    assert(out(200L).isEmpty, "user 200 purchased only before signup")
    assert(out(300L).isEmpty, "user 300 never purchased")
  }

  test("salted skew join equals the plain join and keeps the shuffle in the plan") {
    import spark.implicits._
    val salted = Events.skewJoin(spark, sf)
    // the hint must survive planning: no broadcast exchange anywhere
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "dim side must not auto-broadcast — the salted shuffle is the op")
    assert(plan.contains("ShuffledHashJoin"), "expected a shuffled hash join")
    val direct = Tables.load(spark, sf, "events")
      .withColumn("skew_key",
        when($"event_type".isin("view", "click", "error"), 0L)
          .otherwise($"user_id" % 50))
      .join(spark.range(0, 50).select($"id".as("skew_key"),
        (($"id" * 7 + 3) % 11).as("weight")), "skew_key")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(sum($"value" * $"weight"), 2).as("weighted_value"))
      .orderBy($"event_type")
    assert(salted.collect().toSeq === direct.collect().toSeq)
  }

  test("merged daily HLL sketches track the exact distinct count") {
    val rows = Events.hllMergeUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (merged, direct, exact) =
        (r.getLong(2).toDouble, r.getLong(3).toDouble, r.getLong(4).toDouble)
      // merge-of-parts must agree with the one-shot sketch, and both
      // with truth, within standard HLL error at lgK=12 (~1.6% rsd)
      assert(math.abs(merged - direct) <= 0.02 * exact)
      assert(math.abs(merged - exact) <= 0.05 * exact)
    }
  }

  test("gap fill: full calendar per type, counts conserved, zeros present") {
    import spark.implicits._
    val rows = Events.dailyGapFill(spark, sf)
      .as[(String, java.sql.Date, Long)].collect()
    val byType = rows.groupBy(_._1)
    val spans = byType.values.map(_.length).toSet
    assert(spans.size === 1, s"types cover different calendars: $spans")
    val total = Tables.load(spark, sf, "events").count()
    assert(rows.map(_._3).sum === total)
    byType.values.foreach { ds =>
      val sorted = ds.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.getTime - a._2.getTime === 86400000L,
            s"calendar gap between ${a._2} and ${b._2}")
        case _ =>
      }
    }
  }

  test("zipf fit: negative slope near -1 on natural-ish corpus") {
    import spark.implicits._
    val r = TextAnalysis.zipfFit(spark, sf).collect().head
    val vocab = Tables.load(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "").distinct().count()
    assert(r.getLong(0) === math.min(500L, vocab))
    val slope = r.getDouble(1)
    assert(slope < 0.0, s"zipf slope $slope not negative")
    assert(slope > -3.0 && slope < -0.1, s"zipf slope $slope implausible")
  }

  test("heaps fit: exponent in the sublinear band, matches serial recompute") {
    import spark.implicits._
    val r = TextAnalysis.heapsFit(spark, sf).collect().head
    val docs = Tables.load(spark, sf, "documents")
      .select($"text").as[String].collect()
      .map(_.split(" ").filter(_.nonEmpty)).filter(_.nonEmpty)
    assert(r.getLong(0) === docs.length.toLong)
    // serial closed-form recompute (same formula, serial sum order)
    val pts = docs.map(t =>
      (math.log(t.length.toDouble), math.log(t.distinct.length.toDouble)))
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getDouble(1) - slope) <= 1e-5)
    // vocabulary growth is sublinear but real: 0 < beta < 1
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0,
      s"heaps beta ${r.getDouble(1)} out of band")
  }

  test("token budget: modality rules exact, shares sum to one") {
    val rows = graft.ops.Multimodal.tokenBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).sorted.toSeq ===
      Seq("audio/wav", "image/png", "video/mp4"))
    val n = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._2).sum === n)
    // shares partition the budget (6dp rounding slack)
    assert(math.abs(rows.map(_._5).sum - 1.0) <= 3e-6)
    // per-modality rule spot checks against first principles
    val byType = rows.map(r => r._1 -> r).toMap
    // video: frames capped at 4, 196 tokens per frame
    assert(byType("video/mp4")._4 <= 4L * 196L)
    // image: resize fit bounds patches by ceil(512/16)^2
    assert(byType("image/png")._4 <= 32L * 32L)
    rows.foreach { case (_, nd, tot, mx, _) =>
      assert(mx <= tot && tot >= nd) // every doc costs >= 1 token
    }
  }

  test("scd2: intervals tile each user's timeline, runs alternate state") {
    import spark.implicits._
    val rows = Events.scd2(spark, sf)
      .select($"user_id", $"run_id", $"state", $"valid_from_us",
        $"valid_to_us", $"is_current", $"n_events")
      .collect()
    val total = Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getLong(6)).sum === total, "runs must cover every event")
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_.getInt(5) == 1) === 1)
      assert(sorted.last.getInt(5) === 1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // intervals chain: a.valid_to == b.valid_from, states change
          assert(a.getLong(4) === b.getLong(3))
          assert(a.getString(2) !== b.getString(2),
            s"adjacent runs share state ${a.getString(2)}")
        case _ =>
      }
    }
  }

  test("transitions: probabilities sum to 1 per row, counts cover all pairs") {
    import spark.implicits._
    val rows = Events.transitions(spark, sf).collect()
    val nPairs = rows.map(_.getLong(2)).sum
    val nEvents = Tables.load(spark, sf, "events").count()
    val nUsers = Tables.load(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(nPairs === nEvents - nUsers, "pairs = events - one per user")
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"row sums to $psum")
    }
  }

  test("streaming transition counts equal the batch matrix") {
    val batch = Events.transitions(spark, sf).collect().toSeq
    val streamed = graft.streaming.EventStreams
      .transitionCounts(spark, sf).collect().toSeq
    assert(streamed === batch)
  }

  test("MAD outliers match an in-memory median/MAD recompute") {
    import spark.implicits._
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val vals = Tables.load(spark, sf, "events")
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val expected = vals.groupBy(_._2).flatMap { case (_, rows) =>
      val med = median(rows.map(_._3).toSeq)
      val mad = median(rows.map(r => math.abs(r._3 - med)).toSeq)
      if (mad <= 0) Seq.empty[Long]
      else rows.filter { r =>
        val rz = math.floor(0.6745 * (r._3 - med) / mad * 10000.0 + 0.5) / 10000.0
        math.abs(rz) > 3.5
      }.map(_._1).toSeq
    }.toSet
    val got = Events.madOutliers(spark, sf)
      .select($"event_id").as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("shard packing: contiguous, byte-conserving, budget-bounded") {
    import spark.implicits._
    val budget = 16384L
    val shards = graft.ops.Multimodal.shardPack(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val media = graft.ops.Multimodal.withMedia(spark, sf)
      .select($"media_type", $"n_bytes").as[(String, Long)].collect()
    val maxPayload = media.map(_._2).max
    shards.groupBy(_._1).foreach { case (mt, ss) =>
      val sorted = ss.sortBy(_._2)
      // shard ids dense from 0; doc ranges strictly increasing
      assert(sorted.map(_._2) === sorted.indices.map(_.toLong))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._5 > a._6)
        case _ =>
      }
      // every shard starts before the budget boundary, so a shard can
      // exceed the budget only by its final straddling payload
      sorted.foreach { s => assert(s._4 < budget + maxPayload) }
      assert(sorted.map(_._4).sum ===
        media.filter(_._1 == mt).map(_._2).sum)
      assert(sorted.map(_._3).sum === media.count(_._1 == mt))
    }
  }

  test("bigram surprisal equals an in-memory Jelinek-Mercer recompute") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
      .filter(_._2.length >= 2)
    val uni = docs.flatMap(_._2).groupBy(identity).map { case (w, o) => w -> o.size }
    val tw = uni.values.sum.toDouble
    val bgs = docs.flatMap { case (_, t) => t.sliding(2).map(p => (p(0), p(1))) }
    val c1 = bgs.groupBy(_._1).map { case (w, o) => w -> o.size }
    val c12 = bgs.groupBy(identity).map { case (p, o) => p -> o.size }
    val expected = docs.map { case (id, t) =>
      val lps = t.sliding(2).map { p =>
        math.log(0.7 * (c12((p(0), p(1))).toDouble / c1(p(0))) +
          0.3 * (uni(p(1)).toDouble / tw))
      }.toSeq
      id -> math.floor(-lps.sum / lps.length * 1000000.0 + 0.5) / 1000000.0
    }.toMap
    val got = TextAnalysis.bigramSurprisal(spark, sf)
      .select($"doc_id", $"avg_surprisal").as[(Long, Double)].collect()
    assert(got.length === expected.size)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) <= 1e-6, s"doc $id: $s vs ${expected(id)}")
    }
  }

  test("last-touch attribution equals an in-memory recompute and conserves purchases") {
    import spark.implicits._
    val rows = Tables.load(spark, sf, "events")
      .filter($"event_type".isin("click", "view", "purchase"))
      .select($"user_id", expr("ts DIV 1000").as("us"), $"event_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect()
    val lookbackUs = 7L * 86400L * 1000000L
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      ordered.zipWithIndex.collect {
        case ((_, us, _, "purchase", v), i) =>
          val touch = ordered.take(i).reverse
            .find(e => e._4 == "click" || e._4 == "view")
          val ch = touch match {
            case Some((_, tus, _, t, _)) if us - tus <= lookbackUs => t
            case _ => "direct"
          }
          (ch, v)
      }
    }.groupBy(_._1).map { case (ch, vs) =>
      (ch, vs.size.toLong,
        math.floor(vs.map(_._2).sum * 100.0 + 0.5) / 100.0)
    }
    val got = Events.attribution(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.map(_._2).sum ===
      rows.count(_._4 == "purchase").toLong) // every purchase attributed
    assert(got.length === expected.size)
    got.foreach { case (ch, n, rev) =>
      val (_, en, erev) = expected.find(_._1 == ch).get
      assert(n === en, s"channel $ch count")
      assert(math.abs(rev - erev) <= 0.011, s"channel $ch revenue $rev vs $erev")
    }
  }

  test("gini bucketed ranks handle negative per-user totals (sign-aware bucket)") {
    // refund-heavy users drive totals negative; the sign-aware
    // ±length bucket must still produce ranks equal to a global
    // v_cents-desc sort, i.e. the same Gini as the serial formula
    import spark.implicits._
    val cents = Seq(50000L, 12345L, 999L, 998L, 10L, 0L, -5L, -999L,
      -1000L, -123456L)
    val per = cents.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("user_id", "v_cents")
    val got = Events.giniOfPerUser(per).collect().head
    val sorted = cents.sortBy(-_)
    val n = sorted.length.toLong
    val t = sorted.sum.toDouble
    val srv = sorted.zipWithIndex.map { case (v, i) => (i + 1) * v.toDouble }.sum
    val expected = 2.0 * ((n + 1) * t - srv) / (n * t) - (n + 1).toDouble / n
    assert(got.getLong(0) === n)
    assert(math.abs(got.getDouble(1) -
      math.floor(expected * 1000000.0 + 0.5) / 1000000.0) <= 1e-9)
  }

  test("first-touch and last-touch attribution conserve the same purchase total") {
    // B46/B70 contract lock: both attributions partition the SAME
    // purchase set (every purchase credited exactly once), so their
    // per-channel counts must sum to the same total and their
    // attributed revenue must sum to the same corpus revenue. A
    // future edit to either operator's window/join semantics that
    // drops or duplicates purchases breaks this before it reaches
    // the oracle.
    import spark.implicits._
    val nPurchases = Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase").count()
    val first = Events.firstTouchAttribution(spark, sf)
      .as[(String, Long, Double)].collect()
    val last = Events.attribution(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(first.map(_._2).sum === nPurchases)
    assert(last.map(_._2).sum === nPurchases)
    assert(math.abs(first.map(_._3).sum - last.map(_._3).sum) <= 0.05,
      s"revenue conservation: ${first.map(_._3).sum} vs ${last.map(_._3).sum}")
    // same channel vocabulary: both report click/view/direct only
    assert(first.map(_._1).toSet.subsetOf(Set("click", "view", "direct")))
    assert(first.map(_._1).toSet === last.map(_._1).toSet)
  }

  test("rolling DAU/WAU equals an in-memory sliding-window recompute") {
    import spark.implicits._
    val active = Tables.load(spark, sf, "events")
      .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
      .select($"user_id", $"day".cast("string")).distinct()
      .as[(Long, String)].collect()
      .map { case (u, d) => (u, java.time.LocalDate.parse(d)) }
    val byDay = active.groupBy(_._2)
    val got = Events.activeUsers(spark, sf).collect()
      .map(r => (java.time.LocalDate.parse(r.getDate(0).toString),
        r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length === byDay.size)
    got.foreach { case (day, dau, wau, stick) =>
      assert(dau === byDay(day).map(_._1).distinct.length.toLong)
      val expWau = active.collect {
        case (u, d) if !d.isAfter(day) && d.isAfter(day.minusDays(7)) => u
      }.distinct.length.toLong
      assert(wau === expWau, s"wau($day)")
      assert(stick ===
        math.floor(dau.toDouble / wau * 1000000.0 + 0.5) / 1000000.0)
      assert(dau <= wau)
    }
  }

  test("value concentration: shares monotone, integer-exact vs naive sort") {
    import spark.implicits._
    val per = Tables.load(spark, sf, "events")
      .groupBy($"user_id").agg(sum($"value").as("v"))
      .select($"user_id", $"v").as[(Long, Double)].collect()
      .map { case (u, v) => (u, math.floor(v * 100.0 + 0.5).toLong) }
      .sortBy { case (u, c) => (-c, u) }
    val total = per.map(_._2).sum
    val cums = per.scanLeft(0L)(_ + _._2).drop(1)
    val expect = Seq(0.01, 0.1, 0.2, 0.5).map { p =>
      val nTop = math.ceil(p * per.length).toLong
      val top = cums(nTop.toInt - 1)
      p -> (nTop, top,
        math.floor(top.toDouble / total * 1e6 + 0.5) / 1e6)
    }.toMap
    val got = Events.userValueConcentration(spark, sf).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("value_share"))).toMap
    assert(got === expect)
    // Pareto shape: shares grow with user fraction, top-1% < 100%
    val shares = Seq(0.01, 0.1, 0.2, 0.5).map(p => got(p)._3)
    assert(shares === shares.sorted)
    assert(shares.head > 0.0 && shares.last < 1.0)
  }

  test("anomaly z-score equals an in-memory trailing-window recompute") {
    import spark.implicits._
    val daily = Tables.load(spark, sf, "events")
      .withColumn("day", to_date(timestamp_micros(expr("ts DIV 1000"))))
      .groupBy($"event_type", $"day").agg(sum($"value").as("v"))
      .select($"event_type", $"day".cast("string"), $"v")
      .as[(String, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expect = daily.toSeq.flatMap { case (t, rows) =>
      rows.zipWithIndex.flatMap { case ((_, day, v), i) =>
        val prior = rows.slice(math.max(0, i - 28), i).map(_._3)
        if (prior.length < 7) None else {
          val n = prior.length
          val s1 = prior.sum
          val s2 = prior.map(x => x * x).sum
          val varr = math.max((s2 - s1 * s1 / n) / (n - 1), 1e-12)
          val z = (v - s1 / n) / math.sqrt(varr)
          Some((t, day) -> math.floor(z * 10000.0 + 0.5) / 10000.0)
        }
      }
    }.toMap
    val got = Events.anomalyZscore(spark, sf)
      .select($"event_type", $"day".cast("string"), $"z_score", $"is_spike")
      .as[(String, String, Double, Int)].collect()
    assert(got.length === expect.size)
    got.foreach { case (t, day, z, spike) =>
      assert(math.abs(z - expect((t, day))) < 1e-9, s"($t,$day)")
      assert(spike === (if (z >= 3.0) 1 else 0))
    }
  }

  test("Mann-Whitney U ≡ serial average-rank computation") {
    import spark.implicits._
    val rows = graft.ops.Events.mannWhitney(spark, sf).collect()
    val nTypes = Tables.load(spark, sf, "events")
      .select($"event_type").distinct.count().toInt
    assert(rows.length === nTypes * (nTypes - 1) / 2)
    val vals = Tables.load(spark, sf, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
      .map { case (t, v) => (t, math.floor(v * 100.0 + 0.5).toLong) }
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val xa = vals.filter(_._1 == ta).map(_._2)
      val xb = vals.filter(_._1 == tb).map(_._2)
      // serial average ranks over the pooled sample
      val pooled = (xa.map((_, 'a')) ++ xb.map((_, 'b'))).sortBy(_._1)
      val rank = scala.collection.mutable.HashMap.empty[Long, Double]
      var i = 0
      while (i < pooled.length) {
        var j = i
        while (j < pooled.length && pooled(j)._1 == pooled(i)._1) j += 1
        rank(pooled(i)._1) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
        i = j
      }
      val r1 = xa.map(rank).sum
      val uSerial = r1 - xa.length.toLong * (xa.length + 1L) / 2.0
      assert(math.abs(r.getAs[Double]("u_stat") - uSerial) < 1e-6,
        s"$ta/$tb: ${r.getAs[Double]("u_stat")} vs $uSerial")
      assert(r.getAs[Long]("n_a") === xa.length.toLong)
      assert(r.getAs[Long]("n_b") === xb.length.toLong)
      // U is bounded by n_a*n_b
      assert(uSerial >= 0.0 && uSerial <= xa.length.toDouble * xb.length)
    }
  }
}
