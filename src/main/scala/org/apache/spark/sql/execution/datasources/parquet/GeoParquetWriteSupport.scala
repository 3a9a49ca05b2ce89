package org.apache.spark.sql.execution.datasources.parquet

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.api.WriteSupport.FinalizedWriteContext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** Parquet write support that emits GeoParquet `geo` file metadata.
  *
  * The reference writes stac-geoparquet via rustac
  * (reference: write.py:219), whose output carries the GeoParquet
  * footer key `geo` so geopandas / DuckDB-spatial / rustac recognize
  * the geometry column. Spark's stock parquet sink has no hook for
  * custom footer metadata, so this subclass:
  *
  *   - observes each row as it is written and folds the WKB point
  *     geometry into a running bbox (zero extra passes, zero extra
  *     I/O — the per-file bbox is exact and free);
  *   - emits the `geo` key from [[finalizeWrite]], the parquet-mr
  *     extension point for end-of-file metadata.
  *
  * This is the 100 TB-safe design: metadata cost is O(1) per file, no
  * post-write footer rewriting, works on any FileSystem including
  * object stores with no append support.
  */
class GeoParquetWriteSupport extends ParquetWriteSupport {

  private var geomIdx: Int = -1
  private var geomCol: String = GeoParquetWriteSupport.DefaultGeometryColumn
  private var minX = Double.MaxValue
  private var minY = Double.MaxValue
  private var maxX = Double.MinValue
  private var maxY = Double.MinValue
  private var decoded = 0L // geometries the bbox fold could decode
  private var total = 0L   // all non-null geometries written
  // WKB geometry-type codes observed in this file (1=Point, 2=LineString…)
  private val typeCodes = mutable.SortedSet.empty[Int]

  override def init(configuration: Configuration): WriteSupport.WriteContext = {
    val ctx = super.init(configuration)
    geomCol = configuration.get(
      GeoParquetWriteSupport.GeometryColumnKey,
      GeoParquetWriteSupport.DefaultGeometryColumn)
    val schemaJson = configuration.get(ParquetWriteSupport.SPARK_ROW_SCHEMA)
    if (schemaJson != null) {
      DataType.fromJson(schemaJson) match {
        case s: StructType =>
          geomIdx = s.fields.indexWhere(f =>
            f.name == geomCol && f.dataType == BinaryType)
        case _ =>
      }
    }
    ctx
  }

  override def write(row: InternalRow): Unit = {
    if (geomIdx >= 0 && !row.isNullAt(geomIdx)) {
      val wkb = row.getBinary(geomIdx)
      total += 1
      GeoParquetWriteSupport.wkbGeometryType(wkb).foreach(typeCodes.add)
      GeoParquetWriteSupport.wkbPointXY(wkb).foreach {
        case (x, y) =>
          if (x < minX) minX = x
          if (x > maxX) maxX = x
          if (y < minY) minY = y
          if (y > maxY) maxY = y
          decoded += 1
      }
    }
    super.write(row)
  }

  override def finalizeWrite(): FinalizedWriteContext = {
    if (geomIdx < 0) new FinalizedWriteContext(java.util.Collections.emptyMap())
    else {
      val meta = new java.util.HashMap[String, String]()
      // the bbox is exact only when EVERY non-null geometry was
      // decodable as a plain-XY Point — decoded-vs-written counts, not
      // the masked type code, gate it, so an EWKB/ISO-Z point the fold
      // skipped can never leave an under-covering bbox for the
      // footer-bbox pruner (geometry_types still reports what was seen)
      val allPoints = decoded > 0 && decoded == total
      meta.put("geo", GeoParquetWriteSupport.geoMetadataJson(
        geomCol,
        if (allPoints) Some((minX, minY, maxX, maxY)) else None,
        typeCodes.toSeq))
      new FinalizedWriteContext(meta)
    }
  }
}

object GeoParquetWriteSupport {
  val GeometryColumnKey = "graft.geoparquet.geometry.column"
  val DefaultGeometryColumn = "geometry"
  /** GeoParquet spec version rustac emits (write.py:219 output contract). */
  val GeoParquetVersion = "1.1.0"

  /** Decode (x, y) from a WKB POINT; None for other geometry types. */
  def wkbPointXY(wkb: Array[Byte]): Option[(Double, Double)] = {
    if (wkb == null || wkb.length < 21) return None
    val order =
      if (wkb(0) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(wkb).order(order)
    buf.get() // endianness byte
    val geomType = buf.getInt()
    // 1 = Point; 0x*1 with flags (Z/M/SRID variants) not produced here
    if (geomType != 1) None else Some((buf.getDouble(), buf.getDouble()))
  }

  /** The base WKB geometry-type code (header only); None when the
    * buffer is too short to carry one. Both dialect encodings reduce
    * to the base code: EWKB sets high flag bits (0x80000000 Z,
    * 0x40000000 M, 0x20000000 SRID — masked off first), ISO adds
    * 1000/2000/3000 Z/M/ZM offsets (removed mod 1000).
    */
  def wkbGeometryType(wkb: Array[Byte]): Option[Int] = {
    if (wkb == null || wkb.length < 5) return None
    val order =
      if (wkb(0) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(wkb).order(order)
    buf.get()
    val t = buf.getInt()
    Some((t & 0x0FFFFFFF) % 1000)
  }

  private val TypeNames = Map(
    1 -> "Point", 2 -> "LineString", 3 -> "Polygon", 4 -> "MultiPoint",
    5 -> "MultiLineString", 6 -> "MultiPolygon", 7 -> "GeometryCollection")

  /** PROJJSON for OGC:CRS84 (lon/lat WGS 84) — the GeoParquet spec's
    * default CRS, emitted explicitly because rustac does (the
    * reference's writer, write.py:219) and explicit beats implicit for
    * external readers.
    */
  val Crs84ProjJson: String =
    """{"type":"GeographicCRS","name":"WGS 84 (CRS84)",""" +
      """"datum":{"type":"GeodeticReferenceFrame","name":"World Geodetic System 1984",""" +
      """"ellipsoid":{"name":"WGS 84","semi_major_axis":6378137,"inverse_flattening":298.257223563}},""" +
      """"coordinate_system":{"subtype":"ellipsoidal","axis":[""" +
      """{"name":"Geodetic longitude","abbreviation":"Lon","direction":"east","unit":"degree"},""" +
      """{"name":"Geodetic latitude","abbreviation":"Lat","direction":"north","unit":"degree"}]},""" +
      """"id":{"authority":"OGC","code":"CRS84"}}"""

  /** The `geo` footer value per the GeoParquet 1.1.0 spec: version,
    * primary_column, per-column encoding/types/bbox/crs. The
    * geometry_types list reports the codes actually SEEN in the file
    * (empty = unknown/mixed per spec); bbox only accompanies all-Point
    * files where the running point bbox is exact.
    */
  def geoMetadataJson(
      primaryColumn: String,
      bbox: Option[(Double, Double, Double, Double)],
      seenTypeCodes: Seq[Int] = Seq(1)): String = {
    val sb = new mutable.StringBuilder()
    sb.append("{\"version\":\"").append(GeoParquetVersion).append("\",")
    sb.append("\"primary_column\":\"").append(primaryColumn).append("\",")
    sb.append("\"columns\":{\"").append(primaryColumn).append("\":{")
    sb.append("\"encoding\":\"WKB\",\"geometry_types\":[")
    sb.append(seenTypeCodes.flatMap(TypeNames.get)
      .map("\"" + _ + "\"").mkString(","))
    sb.append("],\"crs\":").append(Crs84ProjJson)
    bbox.foreach { case (x0, y0, x1, y1) =>
      sb.append(",\"bbox\":[")
        .append(x0).append(',').append(y0).append(',')
        .append(x1).append(',').append(y1).append(']')
    }
    sb.append("}}}")
    sb.toString()
  }
}
