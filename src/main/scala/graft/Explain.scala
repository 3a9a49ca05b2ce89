package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for named queries —
  * the per-operator audit loop for pushdown / broadcast / codegen
  * (findings recorded in SURVEY.md §4).
  *
  * Usage: runMain graft.Explain <sfDir> <query> [query...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
