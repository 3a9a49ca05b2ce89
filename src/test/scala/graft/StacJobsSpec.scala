package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stac.StacJobs

class StacJobsSpec extends AnyFunSuite {

  test("full message parses with all fields") {
    val r = StacJobs.parseCacheDailyRequest(
      """{"collection": "HLSS30", "date": "2024-01-15",
        | "dest": "s3://bucket/path",
        | "bounding_box": [-100, 40, -90, 50],
        | "protocol": "https", "skip_existing": false}""".stripMargin)
    assert(r.collection.name === "HLSS30")
    assert(r.date === "2024-01-15")
    assert(r.dest === Some("s3://bucket/path"))
    assert(r.boundingBox === Some((-100.0, 40.0, -90.0, 50.0)))
    assert(r.protocol === "https")
    assert(!r.skipExisting)
  }

  test("defaults mirror the reference: protocol s3, skip_existing true") {
    val r = StacJobs.parseCacheDailyRequest(
      """{"collection": "HLSL30", "date": "2024-01-15"}""")
    assert(r.protocol === "s3")
    assert(r.skipExisting)
    assert(r.dest.isEmpty && r.boundingBox.isEmpty)
  }

  test("error wording matches the reference handler") {
    def msg(js: String): String =
      intercept[IllegalArgumentException] {
        StacJobs.parseCacheDailyRequest(js)
      }.getMessage
    assert(msg("""{"date": "2024-01-15"}""") ===
      "Missing required parameter: 'collection'")
    assert(msg("""{"collection": "HLSL30"}""") ===
      "Missing required parameter: 'date'")
    assert(msg("""{"collection": "NOPE", "date": "2024-01-15"}""")
      .startsWith("Invalid collection: NOPE"))
    assert(msg("""{"collection": "HLSL30", "date": "Jan 15"}""") ===
      "Invalid date format: Jan 15. Expected ISO format (YYYY-MM-DD)")
    assert(msg("""{"collection": "HLSL30", "date": "2024-01-15",
        "bounding_box": [1, 2]}""")
      === "Invalid bounding_box: expected 4 values, got 2")
    assert(msg("""{"collection": "HLSL30", "date": "2024-01-15",
        "protocol": "ftp"}""")
      === "Invalid protocol: ftp. Must be 's3' or 'https'")
    assert(msg("not json at all").startsWith("Invalid JSON message"))
  }
}
