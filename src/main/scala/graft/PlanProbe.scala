package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]")
    spark.sparkContext.setLogLevel("WARN")
    val le = graft.stac.StacOps.linkExtract(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime(); le.count(); println(s"LINK_EXTRACT ${(System.nanoTime()-t0)/1e9}s")
    le.explain("formatted")
    val me = graft.stac.StacOps.mgrsExtract(spark, "/root/testdata/sf0.1")
    val t1 = System.nanoTime(); me.count(); println(s"MGRS ${(System.nanoTime()-t1)/1e9}s")
    spark.stop()
  }
}
