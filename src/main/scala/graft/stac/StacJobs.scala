package graft.stac

import com.fasterxml.jackson.databind.ObjectMapper

/** The reference's job-message contract (handler.py:22-120): parse and
  * validate the JSON messages that drive cache-daily jobs. Mirrors the
  * reference's required/optional fields, defaults, and error wording,
  * so an operator can point their existing queue payloads at graft.
  *
  * Uses Jackson (already on the Spark classpath) — no extra deps.
  */
object StacJobs {

  final case class CacheDailyRequest(
      collection: HlsCollections.Collection,
      date: String, // YYYY-MM-DD, validated
      dest: Option[String],
      boundingBox: Option[(Double, Double, Double, Double)],
      protocol: String, // "s3" | "https", default "s3" (handler.py:104)
      skipExisting: Boolean) // default true (handler.py:109)

  private val mapper = new ObjectMapper()

  def parseCacheDailyRequest(json: String): CacheDailyRequest = {
    val node = try mapper.readTree(json) catch {
      case e: Exception =>
        throw new IllegalArgumentException(s"Invalid JSON message: ${e.getMessage}")
    }

    val collectionStr = Option(node.get("collection")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        "Missing required parameter: 'collection'"))
    val collection = HlsCollections.byName(collectionStr)

    val dateStr = Option(node.get("date")).map(_.asText())
      .getOrElse(throw new IllegalArgumentException(
        "Missing required parameter: 'date'"))
    val date = try java.time.LocalDate.parse(dateStr) catch {
      case _: Exception => throw new IllegalArgumentException(
        s"Invalid date format: $dateStr. Expected ISO format (YYYY-MM-DD)")
    }

    val dest = Option(node.get("dest")).map(_.asText())

    val bbox = Option(node.get("bounding_box")).map { arr =>
      if (!arr.isArray || arr.size() != 4) {
        throw new IllegalArgumentException(
          s"Invalid bounding_box: expected 4 values, got ${arr.size()}")
      }
      val b = (arr.get(0).asDouble(), arr.get(1).asDouble(),
        arr.get(2).asDouble(), arr.get(3).asDouble())
      Validation.validateBbox(b._1, b._2, b._3, b._4)
      b
    }

    val protocol = Option(node.get("protocol")).map(_.asText()).getOrElse("s3")
    if (protocol != "s3" && protocol != "https") {
      throw new IllegalArgumentException(
        s"Invalid protocol: $protocol. Must be 's3' or 'https'")
    }

    val skipExisting = Option(node.get("skip_existing"))
      .forall(_.asBoolean(true))

    CacheDailyRequest(collection, date.toString, dest, bbox, protocol,
      skipExisting)
  }
}
