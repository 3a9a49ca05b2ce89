package graft.stac

import org.apache.hadoop.mapreduce.Job
import org.apache.parquet.hadoop.ParquetOutputFormat

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{GeoParquetWriteSupport, ParquetFileFormat}
import org.apache.spark.sql.types.StructType

/** GeoParquet-emitting variant of Spark's parquet file source.
  *
  * `df.write.format("geoparquet")` (or the full class name) writes
  * byte-standard parquet whose footer additionally carries the
  * GeoParquet `geo` key — matching the output contract of the
  * reference, which writes stac-geoparquet via rustac with
  * `parquet_compression="zstd(6)"` (reference: write.py:219, 243).
  *
  * Differences vs the stock sink, both pinned here so every writer
  * task inherits them from the job configuration:
  *   - write support swapped for [[GeoParquetWriteSupport]] (running
  *     per-file bbox + `geo` footer key, zero extra passes);
  *   - zstd compression level pinned to 6 (Spark only exposes the
  *     codec, parquet-mr defaults the level to 3; the reference pins
  *     6). Overridable with the `zstdLevel` writer option.
  *
  * Reading back needs nothing special: the files are plain parquet
  * (`spark.read.parquet` works), and GeoParquet-aware readers pick up
  * the footer.
  */
class GeoParquetFileFormat extends ParquetFileFormat {

  override def shortName(): String = "geoparquet"

  override def toString: String = "GeoParquet"

  override def equals(other: Any): Boolean =
    other.isInstanceOf[GeoParquetFileFormat]

  override def prepareWrite(
      sparkSession: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): OutputWriterFactory = {
    val factory = super.prepareWrite(sparkSession, job, options, dataSchema)
    val conf = job.getConfiguration
    conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[GeoParquetWriteSupport].getName)
    conf.set(GeoParquetWriteSupport.GeometryColumnKey,
      options.getOrElse("geometryColumn",
        GeoParquetWriteSupport.DefaultGeometryColumn))
    // reference pins zstd(6) (write.py:243); parquet-mr default is 3
    conf.set("parquet.compression.codec.zstd.level",
      options.getOrElse("zstdLevel", "6"))
    factory
  }
}
