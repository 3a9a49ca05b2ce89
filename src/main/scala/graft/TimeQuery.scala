package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries in isolation (median of 3) — the
  * per-operator half of the audit loop next to [[Explain]], without
  * paying a full Bench sweep per iteration.
  *
  * Usage: runMain graft.TimeQuery <sfDir> <query> [query...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    args.tail.foreach { name =>
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }.sorted
      println(f"[time] $name%-24s median ${runs(1)}%.3f s  (${runs.map(r => f"$r%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
