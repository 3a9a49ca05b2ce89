package graft

/** Round-9 verdict item #4: every registered query must survive a
  * 0-row copy of the tables — the shape a production pipeline hits on
  * an empty partition/day/source. `EmptyCheck.run` forces each query
  * with `count()` and collects (query, rootCause) failures; green
  * means all queries return an empty or defined-degenerate result
  * without throwing.
  */
class EmptyInputSpec extends SparkSpecBase {

  test("all registered queries survive 0-row input tables") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_empty_spec").toString
    EmptyCheck.buildEmptyDir(spark, "/root/testdata/sf0.001", dir)
    val failures = EmptyCheck.run(spark, dir)
    assert(failures.isEmpty,
      s"\n${failures.size} queries crash on empty input:\n" +
        failures.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
  }
}
