package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events table, run to
  * completion against the static parquet so the driver can treat them
  * as batch queries with batch oracles. The streaming plumbing is the
  * real contract: file source → event-time windows → memory sink.
  *
  * At scale the same plans run against a live file/Kafka source with
  * watermarks bounding state; `complete` output here is what makes the
  * one-shot parity run deterministic.
  */
object EventStreams {

  private[streaming] val counter = new AtomicInteger(0)

  /** The file source needs a declared schema; `ts` has shipped as both
    * TIMESTAMP(NANOS) (ns BIGINT under `nanosAsLong`) and
    * TIMESTAMP(MICROS), so take the schema from the file footer (one
    * metadata read, no data scan) and canonicalize like the batch path.
    */
  /** Footer-schema memo: every event-stream query re-probed the
    * parquet footer through a throwaway batch read (file listing +
    * footer IO, ~0.1-0.2 s each across ~12 queries). The schema is
    * pure file metadata — re-derived per JVM, never a result — so one
    * probe per directory serves the session (r15).
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def eventStream(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val fileSchema = schemaMemo.computeIfAbsent(dir, d =>
      spark.read
        .option("pathGlobFilter", "events*.parquet").parquet(d).schema)
    var reader = spark.readStream.schema(fileSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    // the file source rejects single-FILE paths (it forces basePath to
    // the path itself), so the source is the DIRECTORY + a leaf glob;
    // the widened glob admits events.parquet (driver testdata) AND
    // events<N>.parquet siblings (how specs feed multiple micro-batches)
    val raw = reader.option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
    graft.Tables.normalizeEventTs(raw)
      .withColumn("tsm", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Streaming state partition count for one-shot parity runs: every
    * state store (agg / join / dedup) instantiates, loads, commits,
    * and fsyncs PER shuffle partition PER operator PER batch, so this
    * is the dominant fixed cost of a small run — measured ~1.0 s/query
    * at 8 partitions vs ~0.78 s at 4 on an otherwise-empty stream,
    * and a stream-stream join doubles the store count. 4 keeps the
    * one-shot runs parallel (the data work at bench SF saturates well
    * below that) while halving the store overhead; a production job
    * tunes this to its state volume, not to this constant. State
    * partitioning never changes results, only parallelism granularity.
    * Overridable via SPARK_GRAFT_STREAM_PARTITIONS (the production
    * knob; also how the bench A/Bs the setting).
    */
  private[streaming] def streamStatePartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "4")

  /** Run a one-shot streaming query to completion into a memory sink.
    * Runs at the reduced state partition count above, restored
    * afterwards.
    */
  private[streaming] def runToCompletion(df: DataFrame, prefix: String,
                                         mode: String = "complete"): DataFrame = {
    val spark = df.sparkSession
    val name = s"${prefix}_${counter.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamStatePartitions)
    try {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }

  /** G1 — streaming tumbling-window aggregation (1 h event-time
    * windows over the ns-precision event stream).
    */
  def windowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // integer-cents streaming state (DECIMAL(38,0) ≙ oracle HUGEINT):
    // a float sum would accumulate in micro-batch/partition order and
    // can cross the 2dp floor on a 1-ulp seam (round-10 anova lesson)
    val agg = eventStream(spark, dir)
      .groupBy(window($"tsm", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * 100.0 + 0.5).cast("long")
          .cast("decimal(38,0)")).as("vc"))
    runToCompletion(agg, "graft_stream_window")
      .select($"w.start".cast("timestamp_ntz").as("hour_start"),
        $"event_type", $"n",
        (floor($"vc".cast("double") / 100.0 * 100.0 + 0.5) / 100.0)
          .as("total_value"))
      .orderBy($"hour_start", $"event_type")
  }

  /** G2 — stateful sessionization via native `session_window` (30 min
    * gap). Session merge happens in streaming state; the finished
    * table is then sequenced per user for a deterministic output.
    * Note the boundary semantics: windows are [ts, ts+gap), so a gap
    * of exactly 30 min starts a NEW session (oracle uses >=).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val agg = eventStream(spark, dir)
      .groupBy(session_window($"tsm", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros($"tsm")).as("start_us"),
        max(unix_micros($"tsm")).as("end_us"),
        // integer-cents state: exact, micro-batch-order independent
        sum(floor($"value" * 100.0 + 0.5).cast("long")
          .cast("decimal(38,0)")).as("vc"))
    val done = runToCompletion(agg, "graft_stream_session")
    val w = Window.partitionBy($"user_id").orderBy($"start_us")
    done
      .withColumn("session_seq", row_number().over(w).cast("long"))
      .select($"user_id", $"session_seq", $"n_events", $"start_us",
        $"end_us",
        (floor($"vc".cast("double") / 100.0 * 100.0 + 0.5) / 100.0)
          .as("total_value"))
      .orderBy($"user_id", $"session_seq")
  }

  /** G3 — streaming deduplication: `dropDuplicates` state over a
    * semantic key (user, type, hour) — the streaming analogue of the
    * batch exact-dedup operator; per-type counts of unique keys.
    */
  def dedupCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = eventStream(spark, dir)
      .withColumn("hour", date_trunc("hour", $"tsm"))
      .dropDuplicates("user_id", "event_type", "hour")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_unique"))
    runToCompletion(agg, "graft_stream_dedup")
      .orderBy($"event_type")
  }

  /** G15 — streaming rolling active users (trailing-7-day WAU): the
    * B49 contribution-explode trick streams STATELESS-then-dedup —
    * each arriving event expands to the 7 window days its user can
    * serve (a stateless projection), `dropDuplicates` keeps one
    * (user, window day) contribution in state, and ONE downstream
    * aggregate maintains the per-day rolling distinct. The naive
    * formulation (per-day distinct over a 7-day range) would need a
    * range join or chained distinct aggregations — both rejected or
    * unbounded in streaming; this shape is the standard way to keep
    * an exact sliding distinct live at ingest. State = one row per
    * (user, window day), watermark-prunable in a production run.
    */
  def activeUsersWau(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = eventStream(spark, dir)
      .withColumn("day", to_date($"tsm"))
      .select($"user_id", explode(sequence(lit(0), lit(6))).as("o"), $"day")
      .select($"user_id", date_add($"day", $"o").as("day"))
      .dropDuplicates("user_id", "day")
      .groupBy($"day").agg(count(lit(1)).as("wau"))
    runToCompletion(agg, "graft_stream_wau")
      .orderBy($"day")
  }

  final case class TransitionPair(prev_type: String, next_type: String)

  /** G12 — streaming Markov transition counts: B43's stateful sequence
    * tracker as a live stream. `flatMapGroupsWithState` keeps each
    * user's LAST event (µs, event_id, type) as state — one small row
    * per user regardless of stream length. Each micro-batch sorts its
    * new rows for the user into (ts, event_id) order (batch-local,
    * bounded by per-user batch arrivals, the same bound G2's session
    * state carries), chains them onto the carried state, and emits the
    * adjacent-pair stream; a downstream streaming aggregate folds the
    * pairs into the ≤ types² matrix. Equal to batch B43 (the oracle)
    * because the file source replays in time order.
    */
  def transitionCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = eventStream(spark, dir)
      .select($"user_id", expr("ts DIV 1000").as("us"), $"event_id",
        $"event_type")
      .as[(Long, Long, Long, String)]
    val pairs = stream.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toVector.sortBy(r => (r._2, r._3))
          var last = state.getOption
          val out = Vector.newBuilder[TransitionPair]
          sorted.foreach { r =>
            last.foreach(l => out += TransitionPair(l._3, r._4))
            last = Some((r._2, r._3, r._4))
          }
          last.foreach(state.update)
          out.result().iterator
      }
    val counts = pairs.groupBy($"prev_type", $"next_type")
      .agg(count(lit(1)).as("n"))
    val byPrev = org.apache.spark.sql.expressions.Window
      .partitionBy($"prev_type")
    runToCompletion(counts, "graft_stream_trans")
      .withColumn("p",
        floor($"n".cast("double") / sum($"n").over(byPrev) * 1000000.0
          + 0.5) / 1000000.0)
      .select($"prev_type", $"next_type", $"n", $"p")
      .orderBy($"prev_type", $"next_type")
  }

  final case class UserTotals(user_id: Long, n: Long, total_cents: Long)

  /** G4 — custom state machine via `mapGroupsWithState`: per-user
    * running (count, sum) state, emitted on every update. Run over the
    * static file the final states equal the batch per-user aggregate
    * (the oracle). This is the arbitrary-stateful-logic API the
    * built-in windows can't express (e.g. CUSUM/anomaly state).
    */
  def userRunningTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // integer-cents state: the per-user running sum is exact and
    // independent of micro-batch/partition arrival order (a Double
    // state would drift by arrival order — round-10 anova lesson)
    val stream = eventStream(spark, dir)
      .select($"user_id".as[Long],
        floor($"value" * 100.0 + 0.5).cast("long").as[Long])
    val updated = stream.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (n, t) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { r => n += 1; t += r._2 }
          state.update((n, t))
          UserTotals(user, n, t)
      }
    val name = s"graft_stream_state_${counter.incrementAndGet()}"
    val q = updated.writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    // one input batch → one (final) update per user
    spark.table(name)
      .select($"user_id", $"n",
        (floor($"total_cents".cast("double") / 100.0 * 100.0 + 0.5)
          / 100.0).as("total_value"))
      .orderBy($"user_id")
  }

  final case class EwmaRow(event_type: String, n_events: Long,
                           ewma_cents: Double)

  /** G29 — streaming EWMA level monitor per event_type: the live
    * "what does this metric sit at NOW, smoothed" gauge (λ = 0.25) —
    * the streaming face of B86's batch EWMA chart, kept as state so
    * ingest reads the level without any re-scan. State is TWO fields
    * per type (current ewma, count); rows fold in (event-time,
    * event_id) order within each batch — the G4/G18 in-order
    * contract — so the fold is the same deterministic double sequence
    * in any batch slicing, and the oracle replays it with an ordered
    * `list_reduce` (an EWMA is inherently sequential: this is the
    * sorted-fold exactness discipline, not an unordered float sum).
    * Inputs are exact integer cents; the one division to dollars
    * happens at output.
    *
    * ACROSS batches the fold relies on the source delivering monotone
    * event-time slices (true for the file source over time-ordered
    * files, asserted by the specs). Because a violated contract would
    * produce a silently DIFFERENT EWMA than the oracle, the state
    * carries the max (ts, event_id) already folded and the operator
    * fails fast — not silently diverges — when a batch delivers a row
    * at or before that mark (out-of-order delivery).
    */
  def streamEwmaMonitor(spark: SparkSession, dir: String,
                        alpha: Double = 0.25,
                        maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = eventStream(spark, dir, maxFilesPerTrigger)
      .select($"event_type".as[String], $"event_id".as[Long],
        expr("ts DIV 1000").as[Long],
        floor($"value" * 100.0 + 0.5).cast("long").as[Long])
    val updated = stream.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long, Long, Long)],
         state: GroupState[(Double, Long, Long, Long)]) =>
          var (e, n, maxUs, maxId) =
            state.getOption.getOrElse((0.0, 0L, Long.MinValue, Long.MinValue))
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach { r =>
            if (r._3 < maxUs || (r._3 == maxUs && r._2 <= maxId))
              throw new IllegalStateException(
                s"streamEwmaMonitor[$tpe]: out-of-order batch — row " +
                  s"(ts=${r._3}, id=${r._2}) at or before folded max " +
                  s"(ts=$maxUs, id=$maxId); the sequential fold's " +
                  "monotone-slice contract is violated")
            val c = r._4.toDouble
            e = if (n == 0L) c else e + alpha * (c - e)
            n += 1
            maxUs = r._3; maxId = r._2
          }
          state.update((e, n, maxUs, maxId))
          EwmaRow(tpe, n, e)
      }
    val name = s"graft_stream_ewma_${counter.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamStatePartitions)
    try {
      val q = updated.writeStream
        .outputMode(OutputMode.Update)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // one input batch → one (final) update per type; multi-batch runs
    // keep the last update per key (spec feeds time-ordered slices)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"n_events".desc)
    spark.table(name)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"event_type", $"n_events",
        (floor($"ewma_cents" / 100.0 * 10000.0 + 0.5) / 10000.0)
          .as("ewma"))
      .orderBy($"event_type")
  }

  /** G30 — streaming EXACT percentiles via a bounded-domain value
    * histogram as state: per (event_type, distinct value) one counter,
    * forever (the 2dp metric domain bounds distinct values at ~33k per
    * type — fixed state on an unbounded stream, where a true streaming
    * quantile would need a GK/KLL sketch and surrender exactness).
    * This is the third state pattern next to G25 (KMV set sketch) and
    * G27 (Misra–Gries): when the DOMAIN is bounded, the exact
    * histogram IS the constant-memory summary. The drained histogram
    * finalizes into interpolated p50/p90/p99 with the classic
    * pos = q·(n−1) rank interpolation written identically in the
    * oracle (rank selection against the cumulative histogram — no
    * per-type value materialization even at finalize).
    */
  def streamValuePercentiles(spark: SparkSession, dir: String,
                             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    val hist = eventStream(spark, dir, maxFilesPerTrigger)
      .groupBy($"event_type", $"value".as("v"))
      .agg(count(lit(1)).as("cnt"))
    val drained = runToCompletion(hist, "graft_stream_vpct")
    val w = W.partitionBy($"event_type").orderBy($"v")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val cum = drained
      .withColumn("cum", sum($"cnt").over(w))
      .withColumn("prev", $"cum" - $"cnt")
      .localCheckpoint()
    val ns = drained.groupBy($"event_type").agg(sum($"cnt").as("n"))
    val qs = Seq(0.5, 0.9, 0.99).toDF("q")
    val pos = ns.crossJoin(broadcast(qs))
      .withColumn("posd", $"q" * ($"n" - 1).cast("double"))
      .withColumn("klo", floor($"posd").cast("long") + 1)
      .withColumn("khi", ceil($"posd").cast("long") + 1)
    val vlo = pos.join(cum.select($"event_type", $"v".as("vlo"),
        $"cum", $"prev"),
      Seq("event_type")).filter($"klo" > $"prev" && $"klo" <= $"cum")
      .select($"event_type", $"q", $"n", $"posd", $"khi", $"vlo")
    val vhi = cum.select($"event_type".as("et2"), $"v".as("vhi"),
      $"cum".as("cum2"), $"prev".as("prev2"))
    val interp = vlo.join(vhi, $"event_type" === $"et2" &&
        $"khi" > $"prev2" && $"khi" <= $"cum2")
      .select($"event_type", $"q",
        ($"vlo" + ($"posd" - floor($"posd")) * ($"vhi" - $"vlo"))
          .as("p"), $"n")
    interp.groupBy($"event_type")
      .agg(max($"n").as("nn"),
        max(when($"q" === 0.5, $"p")).as("r50"),
        max(when($"q" === 0.9, $"p")).as("r90"),
        max(when($"q" === 0.99, $"p")).as("r99"))
      .select($"event_type",
        (floor($"r50" * 10000.0 + 0.5).cast("double") / 10000.0).as("p50"),
        (floor($"r90" * 10000.0 + 0.5).cast("double") / 10000.0).as("p90"),
        (floor($"r99" * 10000.0 + 0.5).cast("double") / 10000.0).as("p99"),
        $"nn".as("n"))
      .orderBy($"event_type")
  }

  final case class FunnelState(t1: Long, t2: Long, t3: Long,
                               upd: Long = 0L)
  final case class FunnelRow(user_id: Long, signup_us: Long,
                             view_us: java.lang.Long,
                             purchase_us: java.lang.Long,
                             completed: Boolean, upd: Long)

  /** G18 — streaming twin of the B54 ordered windowed funnel: per-user
    * funnel progress (signup → first later view → first later
    * purchase, complete within 7 days) as `mapGroupsWithState` — state
    * is THREE longs per user, advanced monotonically, so a month-long
    * stream holds O(users) fixed-width state and emits an updated
    * funnel row per user per batch. Rows are folded in event-time
    * order within each batch (the state machine is order-sensitive;
    * per-user in-order delivery is the same watermark assumption the
    * G4 running totals make). The one-shot run over the full table ≡
    * the batch operator — asserted in StreamingSpec.
    */
  def streamFunnel(spark: SparkSession, dir: String,
                   windowDays: Int = 7,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val horizonUs = windowDays * 86400000000L
    val stream = eventStream(spark, dir, maxFilesPerTrigger)
      .select($"user_id".as[Long], $"event_type".as[String],
        expr("ts DIV 1000").as[Long])
    val updated = stream.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          rows.toSeq.sortBy { case (_, tpe, us) => (us, tpe) }.foreach {
            case (_, tpe, us) =>
              if (tpe == "signup" && st.t1 < 0)
                st = st.copy(t1 = us)
              else if (tpe == "view" && st.t1 >= 0 && st.t2 < 0 &&
                us > st.t1)
                st = st.copy(t2 = us)
              else if (tpe == "purchase" && st.t2 >= 0 && st.t3 < 0 &&
                us > st.t2)
                st = st.copy(t3 = us)
          }
          // per-key update sequence: Update-mode memory sinks APPEND
          // each trigger's rows, so the reader below must argmax to
          // the latest update per user when the source spans >1 batch
          st = st.copy(upd = st.upd + 1)
          state.update(st)
          FunnelRow(user, st.t1,
            if (st.t2 >= 0) st.t2 else null,
            if (st.t3 >= 0) st.t3 else null,
            st.t3 >= 0 && st.t3 - st.t1 <= horizonUs, st.upd)
      }
    val name = s"graft_stream_funnel_${counter.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamStatePartitions)
    try {
      val q = updated.writeStream
        .outputMode(OutputMode.Update)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
      // latest update per user (A25 argmax): upd strictly increases
      // per key, so max(struct) picks the newest row even when the
      // sink holds one row per (user, trigger)
      .groupBy($"user_id")
      .agg(max(struct($"upd", $"signup_us", $"view_us", $"purchase_us",
        $"completed")).as("s"))
      .select($"user_id", $"s.signup_us".as("signup_us"),
        $"s.view_us".as("view_us"), $"s.purchase_us".as("purchase_us"),
        $"s.completed".as("completed"))
      .filter($"signup_us" >= 0)
      .orderBy($"user_id")
  }

  /** G5 — stream-stream interval join: each purchase matched to every
    * signup of the same user in the preceding day. Both sides carry
    * watermarks and the join carries the time-range predicate — that
    * pair is what lets the engine expire join state (without them,
    * stream-stream state grows without bound). Inner-join matches
    * append as soon as both rows arrive, so the one-shot run equals
    * the batch join (the oracle).
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = eventStream(spark, dir)
    val signups = events.filter($"event_type" === "signup")
      .select($"user_id".as("s_user"), $"tsm".as("signup_tsm"))
      .withWatermark("signup_tsm", "1 hour")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"tsm".as("purchase_tsm"), $"value")
      .withWatermark("purchase_tsm", "1 hour")
    val joined = signups.join(purchases,
      $"s_user" === $"p_user" &&
        $"purchase_tsm" >= $"signup_tsm" &&
        $"purchase_tsm" < $"signup_tsm" + expr("INTERVAL 1 DAY"))
    runToCompletion(joined, "graft_stream_join", mode = "append")
      .select($"s_user".as("user_id"),
        unix_micros($"signup_tsm").as("signup_us"),
        unix_micros($"purchase_tsm").as("purchase_us"),
        (floor($"value" * 100.0 + 0.5) / 100.0).as("purchase_value"))
      .orderBy($"user_id", $"signup_us", $"purchase_us")
  }

  /** G31 — stream-STATIC dimension enrichment join: the arriving
    * event stream LEFT-joins the batch `customer` dim on user key and
    * rolls revenue up per (market segment, event type) — the
    * canonical ingest-time enrichment every production feed runs
    * (attach the dim attributes WHILE the data lands, not in a
    * nightly re-join). The static side is a plain batch DataFrame:
    * Spark re-plans it per micro-batch (picking up dim updates
    * between triggers) and the join itself is STATELESS — no
    * watermark, no join state store, unlike G5's stream-stream shape;
    * with a small dim AQE broadcasts it every trigger, so the stream
    * side never shuffles. Revenue state is integer cents
    * (DECIMAL(38,0) ≙ oracle HUGEINT — micro-batch-order exact);
    * unmatched users land in an explicit 'UNKNOWN' segment so dim
    * gaps are visible, not dropped.
    */
  def streamStaticEnrich(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = graft.Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_mktsegment")
    val agg = eventStream(spark, dir)
      .join(cust, $"user_id" === $"c_custkey", "left")
      .withColumn("segment",
        coalesce($"c_mktsegment", lit("UNKNOWN")))
      .groupBy($"segment", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor($"value" * 100.0 + 0.5).cast("long")
          .cast("decimal(38,0)")).as("vc"))
    runToCompletion(agg, "graft_stream_enrich")
      .select($"segment", $"event_type", $"n_events",
        (floor($"vc".cast("double") / 100.0 * 100.0 + 0.5) / 100.0)
          .as("total_value"))
      .orderBy($"segment", $"event_type")
  }

  /** G22 — stream-stream LEFT OUTER interval join: every signup,
    * matched to its same-user purchases in the following day, OR
    * emitted once with null purchase columns — the "did NOT convert
    * within the window" stream an inner join (G5) cannot produce.
    * The null row for an unmatched signup can only be emitted once
    * its join window has PROVABLY closed, i.e. once the global
    * watermark (the MIN of both sides' per-source watermarks) passes
    * signup + 1 day; Spark's no-data micro-batch advances the
    * watermark after the last data batch and flushes those rows.
    *
    * One-shot determinism: matched rows equal the batch join; null
    * rows appear exactly for unmatched signups whose window upper
    * bound lies at-or-before the FINAL watermark
    * min(max signup ts, max purchase ts) − 1 h. Signups unmatched but
    * still inside the final watermark are withheld (they could yet
    * match on a live stream) — the oracle models that cutoff
    * explicitly rather than pretending the one-shot run is a batch
    * outer join. State is bounded by the same watermark: matched and
    * expired rows leave the join state store every batch.
    */
  def streamOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = eventStream(spark, dir)
    val signups = events.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id".as("s_user"),
        $"tsm".as("signup_tsm"))
      .withWatermark("signup_tsm", "1 hour")
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"tsm".as("purchase_tsm"), $"value")
      .withWatermark("purchase_tsm", "1 hour")
    val joined = signups.join(purchases,
      $"s_user" === $"p_user" &&
        $"purchase_tsm" >= $"signup_tsm" &&
        $"purchase_tsm" < $"signup_tsm" + expr("INTERVAL 1 DAY"),
      "left_outer")
    runToCompletion(joined, "graft_stream_outer_join", mode = "append")
      .select($"signup_id", $"s_user".as("user_id"),
        unix_micros($"signup_tsm").as("signup_us"),
        unix_micros($"purchase_tsm").as("purchase_us"),
        (floor($"value" * 100.0 + 0.5) / 100.0).as("purchase_value"),
        $"purchase_tsm".isNull.as("unconverted"))
      .orderBy($"signup_id", $"purchase_us")
  }

  /** G16 — streaming anomaly monitor: B52's trailing z-score with the
    * daily (event_type, day) totals maintained as STREAMING state (one
    * row per type×day, regardless of stream length) and the z-score
    * finalizer run over that compact frame when the stream drains —
    * the "incremental ingest, tiny analytic finalize" split an ingest
    * monitor actually deploys. Batch B52 (and its DuckDB oracle) is
    * the equality check.
    */
  def streamAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = eventStream(spark, dir)
      .groupBy($"event_type", to_date($"tsm").as("day"))
      // integer-cents state: the streaming sum is then exact and
      // micro-batch-order independent (see Events.anomalyFinalize)
      .agg(sum(floor($"value" * 100.0 + 0.5).cast("long")).as("vc"))
    graft.ops.Events.anomalyFinalize(
      runToCompletion(agg, "graft_stream_anomaly"))
  }

  final case class SessTState(start: Long, last: Long, n: Long)
  final case class SessTRow(user_id: Long, start_us: Long, end_us: Long,
                            n_events: Long)

  /** G26 — sessionization with EVENT-TIME TIMEOUT state expiry: the
    * one stateful contract G2's `session_window` hides — here the
    * session CLOSE is explicit: a later event ≥ gap away closes it
    * in-function, and an idle session closes when the WATERMARK
    * passes last+gap (`GroupStateTimeout.EventTimeTimeout`, the
    * `state.hasTimedOut` branch + `state.remove()`). This is the API
    * every custom-window production job uses to bound state: without
    * the timeout, one row per ever-seen user lives forever. Sessions
    * still open at the final watermark are WITHHELD, and the oracle
    * models that cutoff explicitly in the engine's own millisecond
    * arithmetic (G22 discipline) — fires iff
    * floor((end+gap)µs/1000) < floor(maxµs/1000) − delay_ms.
    */
  def streamSessionTimeout(spark: SparkSession, dir: String,
                           gapMin: Int = 30, delayMin: Int = 60,
                           maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMin * 60000000L
    val stream = eventStream(spark, dir, maxFilesPerTrigger)
      .withWatermark("tsm", s"$delayMin minutes")
      // keep the watermark column in the projection — dropping it
      // disconnects event-time timeout from the watermark
      .select($"user_id".as[Long], expr("ts DIV 1000").as[Long],
        $"tsm".as[java.sql.Timestamp])
    val out = stream.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessTState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessTRow(user, s.start, s.last, s.n))
          } else {
            var emitted = List.empty[SessTRow]
            var cur = state.getOption
            rows.toSeq.map(_._2).sorted.foreach { us =>
              cur match {
                case Some(s) if us - s.last >= gapUs =>
                  emitted ::= SessTRow(user, s.start, s.last, s.n)
                  cur = Some(SessTState(us, us, 1L))
                case Some(s) =>
                  cur = Some(s.copy(last = us, n = s.n + 1))
                case None =>
                  cur = Some(SessTState(us, us, 1L))
              }
            }
            cur.foreach { s =>
              val fireMs = (s.last + gapUs) / 1000L
              val wm = state.getCurrentWatermarkMs
              if (fireMs < wm) {
                // already past the strict-< closure rule, and no
                // admissible row can extend it (anything late enough
                // to land inside the gap is below the watermark and
                // dropped upstream) — emit NOW. Round 10 clamped the
                // timeout above the watermark instead, which traded
                // the "timeout must be > watermark" crash for SILENT
                // LOSS when this is the final batch and the watermark
                // never advances past the clamp (ADVICE r10 #3).
                emitted ::= SessTRow(user, s.start, s.last, s.n)
                if (state.exists) state.remove()
              } else {
                state.update(s)
                // fireMs == wm still needs the +1 clamp (Spark
                // requires the timeout STRICTLY above the watermark);
                // it then fires iff the watermark advances at all —
                // exactly the strict-< rule the oracle replays
                state.setTimeoutTimestamp(math.max(fireMs, wm + 1L))
              }
            }
            emitted.reverse.iterator
          }
      }
    val name = s"graft_stream_sesst_${counter.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamStatePartitions)
    try {
      val q = out.writeStream
        .outputMode(OutputMode.Append)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
      .orderBy($"user_id", $"start_us")
  }

  final case class DriftState(n: Long, cum: Long, minc: Long,
                              maxc: Long, nAlarms: Long,
                              firstAlarm: Long, upd: Long)
  final case class DriftRow(event_type: String, n: Long, cum_dev: Long,
                            min_cum: Long, max_cum: Long, n_alarms: Long,
                            first_alarm_id: Long, upd: Long)

  /** G24 — Page–Hinkley drift monitor as streaming state: the
    * sequential twin of B73's batch CUSUM. Per event_type the state
    * is FIVE longs (running deviation sum vs the μ₀=45.00 baseline,
    * its running min and max, the alarm-row count, the first alarmed
    * event) — an upward level shift accumulates cum − min(cum) until
    * it crosses λ=500.00, the classic sequential-detection gate, and
    * a monitor restart recovers the identical state from the
    * checkpoint because every quantity is an integer fold of the
    * input (no floats in state at all). Rows fold in event-time order
    * within each batch (same in-order contract as G4/G18). The
    * one-shot run ≡ the batch window formulation — the oracle — and
    * the thresholds are sized so alarms actually FIRE at every test
    * SF (non-vacuous: spec asserts ≥1 alarm and replays the fold
    * serially).
    */
  def streamDriftMonitor(spark: SparkSession, dir: String,
                         mu0Cents: Long = 4500L,
                         lambdaCents: Long = 50000L,
                         maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val stream = eventStream(spark, dir, maxFilesPerTrigger)
      .select($"event_type".as[String], $"event_id".as[Long],
        expr("ts DIV 1000").as[Long], $"value".as[Double])
    val updated = stream.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long, Long, Double)],
         state: GroupState[DriftState]) =>
          var st = state.getOption.getOrElse(
            DriftState(0L, 0L, Long.MaxValue, Long.MinValue, 0L, -1L, 0L))
          rows.toSeq.sortBy { case (_, id, us, _) => (us, id) }.foreach {
            case (_, id, _, v) =>
              val dev = math.floor(v * 100.0 + 0.5).toLong - mu0Cents
              val cum = st.cum + dev
              val minc = math.min(st.minc, cum)
              val maxc = math.max(st.maxc, cum)
              val alarmed = cum - minc > lambdaCents
              st = DriftState(st.n + 1, cum, minc, maxc,
                st.nAlarms + (if (alarmed) 1L else 0L),
                if (alarmed && st.firstAlarm < 0) id else st.firstAlarm,
                st.upd)
          }
          st = st.copy(upd = st.upd + 1)
          state.update(st)
          DriftRow(tpe, st.n, st.cum, st.minc, st.maxc, st.nAlarms,
            st.firstAlarm, st.upd)
      }
    val name = s"graft_stream_drift_${counter.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamStatePartitions)
    try {
      val q = updated.writeStream
        .outputMode(OutputMode.Update)
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
      // latest update per key (A25 argmax, the G18 multi-batch stance)
      .groupBy($"event_type")
      .agg(max(struct($"upd", $"n", $"cum_dev", $"min_cum", $"max_cum",
        $"n_alarms", $"first_alarm_id")).as("s"))
      .select($"event_type", $"s.n".as("n"), $"s.cum_dev".as("cum_dev"),
        $"s.min_cum".as("min_cum"), $"s.max_cum".as("max_cum"),
        $"s.n_alarms".as("n_alarms"),
        $"s.first_alarm_id".as("first_alarm_id"))
      .orderBy($"event_type")
  }

  /** Declared file-source schema for the ORDERS stream (shared with
    * StacStreams' synthetic catalog, which derives from orders too).
    */
  private[streaming] val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  /** G28 — streaming Benford first-digit gate: B81's fabricated-data
    * screen placed at INGEST (where a poisoned feed should be caught,
    * not after it lands). Digit extraction is a stateless projection
    * over the order stream (exact integer-cents string, no float log
    * in the digit path); the streaming aggregate holds NINE counters
    * forever — the cheapest possible stateful monitor. Shares/Benford
    * deltas are the stream_anomaly "incremental ingest, tiny
    * finalize" split: computed on the drained 9-row frame, so the
    * one-shot output equals batch B81 exactly and shares its oracle.
    */
  def benfordGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = spark.readStream
      .schema(EventStreams.ordersSchema)
      .option("pathGlobFilter", "orders*.parquet")
      .parquet(dir)
      .select(floor(abs($"o_totalprice") * 100.0 + 0.5).cast("long")
        .as("cents"))
      .filter($"cents" > 0)
      .select(substring($"cents".cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n"))
    val drained =
      runToCompletion(digits, "graft_stream_benford")
    val tot = drained.agg(sum($"n").as("nn"))
    drained.crossJoin(broadcast(tot))
      .select($"digit", $"n",
        (floor($"n".cast("double") / $"nn" * 1000000.0 + 0.5)
          / 1000000.0).as("share"),
        (floor(log10(lit(1.0) + lit(1.0) / $"digit") * 1000000.0 + 0.5)
          / 1000000.0).as("benford_p"),
        (floor(($"n".cast("double") / $"nn" -
          log10(lit(1.0) + lit(1.0) / $"digit")) * 1000000.0 + 0.5)
          / 1000000.0).as("delta"))
      .orderBy($"digit")
  }

  val oracles: Map[String, String] = Map(
    // B81's batch formulation IS the oracle — the drained stream must
    // converge to the same digit profile (G28, an orders-stream
    // ingest gate — lives here with the business-stream monitors)
    "stream_benford" -> graft.ops.Stats.oracles("revenue_benford"),
    "stream_value_percentiles" ->
      """WITH hist AS (
        |  SELECT event_type, value AS v, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY event_type, value),
        |cum AS (
        |  SELECT event_type, v, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM hist),
        |c2 AS (SELECT *, cum - cnt AS prev FROM cum),
        |ns AS (
        |  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM hist
        |  GROUP BY event_type),
        |pos AS (
        |  SELECT event_type, n, q, q * (n - 1)::DOUBLE AS posd,
        |    CAST(floor(q * (n - 1)::DOUBLE) AS BIGINT) + 1 AS klo,
        |    CAST(ceil(q * (n - 1)::DOUBLE) AS BIGINT) + 1 AS khi
        |  FROM ns, (SELECT unnest([0.5, 0.9, 0.99]) AS q) u),
        |vlo AS (
        |  SELECT p.event_type, p.q, p.n, p.posd, p.khi, c.v AS vlo
        |  FROM pos p JOIN c2 c ON c.event_type = p.event_type
        |    AND p.klo > c.prev AND p.klo <= c.cum),
        |ip AS (
        |  SELECT l.event_type, l.q, l.n,
        |    l.vlo + (l.posd - floor(l.posd)) * (c.v - l.vlo) AS p
        |  FROM vlo l JOIN c2 c ON c.event_type = l.event_type
        |    AND l.khi > c.prev AND l.khi <= c.cum)
        |SELECT event_type,
        |  floor(max(CASE WHEN q = 0.5 THEN p END) * 10000.0 + 0.5)
        |    / 10000.0 AS p50,
        |  floor(max(CASE WHEN q = 0.9 THEN p END) * 10000.0 + 0.5)
        |    / 10000.0 AS p90,
        |  floor(max(CASE WHEN q = 0.99 THEN p END) * 10000.0 + 0.5)
        |    / 10000.0 AS p99,
        |  max(n) AS n
        |FROM ip GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_ewma_monitor" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
        |    epoch_us(ts) AS us, event_id
        |  FROM events),
        |l AS (
        |  SELECT event_type, count(*)::BIGINT AS n_events,
        |    list(c::DOUBLE ORDER BY us, event_id) AS cs
        |  FROM e GROUP BY event_type)
        |SELECT event_type, n_events,
        |  floor(list_reduce(cs, (a, x) -> a + 0.25 * (x - a))
        |    / 100.0 * 10000.0 + 0.5) / 10000.0 AS ewma
        |FROM l ORDER BY event_type""".stripMargin,
    "stream_session_timeout" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events),
        |lagd AS (
        |  SELECT user_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w >= 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |sess AS (
        |  SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM lagd),
        |g AS (
        |  SELECT user_id, sid, min(us) AS start_us, max(us) AS end_us,
        |    count(*)::BIGINT AS n_events,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY min(us) DESC) AS rdesc
        |  FROM sess GROUP BY 1, 2),
        |wm AS (SELECT (max(us) // 1000) - 3600000 AS wm_ms FROM e)
        |SELECT user_id, start_us, end_us, n_events
        |FROM g, wm
        |WHERE rdesc > 1 OR ((end_us + 1800000000) // 1000) < wm_ms
        |ORDER BY user_id, start_us""".stripMargin,
    "stream_drift_monitor" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) - 4500 AS dev
        |  FROM events),
        |c AS (
        |  SELECT event_type, event_id, us, dev,
        |    CAST(sum(dev) OVER w AS BIGINT) AS cum
        |  FROM e WINDOW w AS (PARTITION BY event_type
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT event_type, event_id, us, dev, cum,
        |    CAST(min(cum) OVER w AS BIGINT) AS minc,
        |    CAST(max(cum) OVER w AS BIGINT) AS maxc
        |  FROM c WINDOW w AS (PARTITION BY event_type
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (SELECT *, cum - minc > 50000 AS alarmed FROM m)
        |SELECT event_type, count(*)::BIGINT AS n,
        |  CAST(sum(dev) AS BIGINT) AS cum_dev,
        |  min(minc) AS min_cum, max(maxc) AS max_cum,
        |  CAST(count(*) FILTER (WHERE alarmed) AS BIGINT) AS n_alarms,
        |  COALESCE(list_extract(
        |    min([us, event_id]) FILTER (WHERE alarmed), 2), -1)
        |    AS first_alarm_id
        |FROM a GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_anomaly" -> graft.ops.Events.oracles("events_anomaly"),
    "stream_funnel" ->
      graft.ops.Analytics.oracles("events_windowed_funnel"),
    "stream_active_users" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |w AS (
        |  SELECT DISTINCT user_id, day + o::INT AS day
        |  FROM a, (SELECT unnest(range(0, 7)) AS o) u)
        |SELECT day, count(*) AS wau FROM w GROUP BY day
        |ORDER BY day""".stripMargin,
    "stream_outer_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value
        |  FROM events),
        |s AS (SELECT event_id AS signup_id, user_id, us FROM e
        |      WHERE event_type = 'signup'),
        |p AS (SELECT user_id, us, value FROM e
        |      WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(us) FROM s),
        |         (SELECT max(us) FROM p)) - 3600000000 AS w),
        |m AS (
        |  SELECT s.signup_id, s.user_id, s.us AS signup_us,
        |    p.us AS purchase_us,
        |    floor(p.value * 100.0 + 0.5) / 100.0 AS purchase_value
        |  FROM s JOIN p ON p.user_id = s.user_id
        |    AND p.us >= s.us AND p.us < s.us + 86400000000),
        |u AS (
        |  SELECT s.signup_id, s.user_id, s.us AS signup_us
        |  FROM s, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.signup_id = s.signup_id)
        |    AND s.us + 86400000000 <= wm.w)
        |SELECT signup_id, user_id, signup_us, purchase_us,
        |  purchase_value, FALSE AS unconverted FROM m
        |UNION ALL
        |SELECT signup_id, user_id, signup_us, CAST(NULL AS BIGINT),
        |  CAST(NULL AS DOUBLE), TRUE FROM u
        |ORDER BY signup_id, purchase_us""".stripMargin,
    "stream_join" ->
      """SELECT s.user_id, epoch_us(s.ts) AS signup_us,
        |  epoch_us(p.ts) AS purchase_us,
        |  floor(p.value * 100.0 + 0.5) / 100.0 AS purchase_value
        |FROM events s JOIN events p ON s.user_id = p.user_id
        |  AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 DAY
        |WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
        |ORDER BY 1, 2, 3""".stripMargin,
    "stream_user_totals" ->
      """SELECT user_id, count(*) AS n,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_dedup_count" ->
      """SELECT event_type, count(*) AS n_unique FROM (
        |  SELECT DISTINCT user_id, event_type,
        |    date_trunc('hour', ts) AS hour
        |  FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_static_enrich" ->
      """SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
        |  e.event_type, count(*)::BIGINT AS n_events,
        |  floor(sum(CAST(floor(e.value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_value
        |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2
        |ORDER BY segment, event_type""".stripMargin,
    "stream_window_agg" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start, event_type,
        |  count(*) AS n,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin,
    "stream_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |      OR ts_us - prev_us >= 1800000000::BIGINT THEN 1 ELSE 0 END AS is_new
        |  FROM lagged),
        |sess AS (
        |  SELECT *, CAST(sum(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id AS session_seq, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  floor(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
        |    )::DOUBLE / 100.0 * 100.0 + 0.5) / 100.0 AS total_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_seq""".stripMargin,
    // G12 streamed ≡ batch B43 ≡ DuckDB: same matrix, same SQL.
    "stream_transitions" -> graft.ops.Events.oracles("events_transitions"))
}
