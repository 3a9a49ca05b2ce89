package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: decompose a query's wall-clock into driver-side phases
  * (DataFrame construction + analysis, optimization/planning) vs
  * execution, and count the jobs/stages/tasks the run schedules —
  * the measurement behind the r15 per-query-floor work (guide §1).
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <query> [query...]
  */
object ProfileQuery {
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

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val i = s.stageInfo
        val ms = (for {
          a <- i.completionTime; b <- i.submissionTime
        } yield a - b).getOrElse(-1L)
        if (ms >= 100)
          stageLog.add(s"stage${i.stageId}(${i.numTasks}t ${ms}ms rdds=" +
            i.rddInfos.map(_.name).mkString("|").take(120) + ")")
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)

    args.tail.foreach { name =>
      (1 to 3).foreach { i =>
        jobs = 0; stages = 0; tasks = 0; stageLog.clear()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime() // construction (incl. any eager jobs)
        val jobsConstr = jobs
        df.count()
        val t2 = System.nanoTime()
        Thread.sleep(120) // let the listener bus drain
        val phases = df.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
          .mkString(" ")
        println(f"[prof] $name%-26s run$i total=${(t2 - t0) / 1e9}%.3f s " +
          f"construct=${(t1 - t0) / 1e9}%.3f s (jobs=$jobsConstr) " +
          f"exec=${(t2 - t1) / 1e9}%.3f s jobs=$jobs stages=$stages " +
          f"tasks=$tasks  [$phases]")
        import scala.jdk.CollectionConverters._
        if (!stageLog.isEmpty)
          println("       slow stages: " + stageLog.asScala.mkString(", "))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
