package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** WKB (well-known binary) POINT encoder — the geometry column of the
  * stac-geoparquet layout the reference emits (write.py writes
  * GeoParquet via rustac; WKB is the standard geoparquet geometry
  * encoding). 21 bytes: little-endian flag, geometry type 1, lon, lat
  * as LE doubles.
  */
case class WkbPoint(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wkb_point"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    WkbPoint.encode(lon.asInstanceOf[Double], lat.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat) =>
      s"${ev.value} = graft.expressions.WkbPoint.encode($lon, $lat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WkbPoint {
  def encode(lon: Double, lat: Double): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(21)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte) // little-endian marker
    buf.putInt(1) // geometry type: Point
    buf.putDouble(lon)
    buf.putDouble(lat)
    buf.array()
  }
}
