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

  test("all registered queries survive single-row input tables") {
    // the other degenerate partition shape: one row per table means
    // single-member groups, zero variance, a one-day calendar, a
    // one-sided median split, and idf 0 for every term — the seams
    // the 0-row sweep's null-guards don't reach
    val dir = java.nio.file.Files
      .createTempDirectory("graft_onerow_spec").toString
    EmptyCheck.buildEmptyDir(spark, "/root/testdata/sf0.001", dir,
      rows = 1)
    val failures = EmptyCheck.run(spark, dir)
    assert(failures.isEmpty,
      s"\n${failures.size} queries crash on one-row input:\n" +
        failures.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
  }
}
