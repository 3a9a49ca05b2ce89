package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line to stdout AND writes the
  * same JSON to a file (`SPARK_GRAFT_BENCH_OUT`, default
  * `bench_out.json`). The file is rewritten after EVERY query with a
  * `"partial":true` marker, so an external timeout still leaves a
  * machine-readable per-query artifact — the stdout-only line has been
  * truncated by the driver's bounded tail in every prior round.
  *
  * Re-run policy (bounds worst-case wall clock under co-tenant load):
  *  - queries <= 2 s first run: timed once (noise there is absolute-small);
  *  - `stream_*` queries: timed once — their cost is deterministic
  *    per-query streaming-engine startup + state-store init, not noise,
  *    and re-running triples a fixed ~3 s cost for no extra signal;
  *  - other > 2 s queries: second run; if the two agree within 10% take
  *    the min (agreement rules out a transient stall), else a third run
  *    and take the median;
  *  - once total elapsed exceeds `SPARK_GRAFT_BENCH_BUDGET_SEC`
  *    (default 480 s) no more re-runs happen at all — every remaining
  *    query is timed once so the suite always terminates well inside
  *    the driver's timeout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "480").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first timed query doesn't absorb
    // executor startup + codegen compiler init (~8-10s otherwise)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }

    // 3-decimal (ms) precision keeps the JSON line short enough for the
    // driver's bounded stdout-tail window — full nanos overflowed it
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.US, v)
    def jsonLine(rs: Seq[(String, Double)], partial: Boolean): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
      val total = rs.map(_._2).sum
      val part = if (partial) ",\"partial\":true" else ""
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$part}"""
    }
    def writeOut(s: String): Unit = {
      val p = java.nio.file.Paths.get(outPath)
      java.nio.file.Files.write(p, (s + "\n").getBytes("UTF-8"))
    }

    val benchStart = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - benchStart) / 1e9

    // dev-only subset runs (e.g. SPARK_GRAFT_BENCH_ONLY=stream_): the
    // driver never sets this, so its per-round artifact stays full
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq).getOrElse(Seq.empty)
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.exists(n.startsWith) }

    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    selected.foreach { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      val a = once()
      val overBudget = elapsed() > budgetSec
      val best =
        if (a < 0) { val b = once(); math.max(a, b) }
        else if (a <= 2.0 || name.startsWith("stream_") || overBudget) a
        else {
          val b = once()
          if (b >= 0 && math.abs(a - b) <= 0.10 * math.min(a, b)) math.min(a, b)
          else {
            val runs = (Seq(a, b, once()).filter(_ >= 0)).sorted
            runs(runs.length / 2)
          }
        }
      // per-query cache hygiene: operators that cache (LSH docs, IVF
      // vectors) must not squeeze later queries' execution memory
      spark.catalog.clearCache()
      acc += (name -> best)
      writeOut(jsonLine(acc.toSeq, partial = true))
    }
    val line = jsonLine(acc.toSeq, partial = false)
    writeOut(line)
    // The driver parses its bounded stdout tail for the JSON line; the
    // full 229-query line (>5 KB) overflowed it in r01–r07, and even a
    // 2.8 KB compact line was clipped from the FRONT in r08 — the tail
    // window is smaller than (line + sbt epilogue). So the stdout line
    // is now hard-capped at the TOP-20 SLOWEST queries (<1 KB), and it
    // is printed twice: once here and once after spark.stop(), so the
    // last copy sits as close to the end of stdout as this process can
    // put it. The complete per-query artifact is always bench_out.json.
    val out =
      if (line.length <= 900) line
      else {
        val kept = acc.sortBy(-_._2).take(20)
        val qs = kept.map { case (k, v) => "\"" + k + "\":" + f(v) }
          .mkString("{", ",", "}")
        s"""{"metric":"total","value":${f(acc.map(_._2).sum)},"unit":"sec"""" +
          s""","queries":$qs,"queries_elided":${acc.size - kept.size}""" +
          s""","queries_full":"bench_out.json","sf":"$sfDir"}"""
      }
    println(out)
    spark.stop()
    println(out)
  }
}
