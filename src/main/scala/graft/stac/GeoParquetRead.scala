package graft.stac

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoParquet read side: surface the `geo` footer the sink writes and
  * use its per-file bbox for FILE-LEVEL spatial pruning.
  *
  * The monthly sink Hilbert-clusters rows before writing
  * (StacWrite.writeMonthly), so each part file covers a compact
  * spatial extent and its footer bbox is tight. A bbox query can then
  * skip whole files before any row is scanned — the spatial analogue
  * of partition pruning, and the payoff of writing real GeoParquet
  * metadata: at archive scale a city-sized AOI touches a handful of
  * files out of thousands, and only footers (KBs) are read for the
  * rest. Footer listing is a driver-side pass over file metadata,
  * the same cost class as the reader's own file listing.
  */
object GeoParquetRead {

  final case class FileGeo(path: String, bbox: Option[(Double, Double, Double, Double)])

  private val BboxRe = """"bbox":\[([^\]]+)\]""".r

  /** Per-file `geo` footer metadata under `dir` (recursive; skips
    * non-parquet and footer-less files). Footers for more than
    * `distributeAbove` files are read by EXECUTOR tasks — at archive
    * scale the metadata pass is a cluster job like the scan itself,
    * not a sequential driver loop; small directories stay driver-side
    * to skip the job overhead.
    */
  def listFileGeo(spark: SparkSession, dir: String,
                  distributeAbove: Int = 64): Seq[FileGeo] = {
    val root = new Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(conf)
    val files = collectParquetFiles(fs, root)
    if (files.size <= distributeAbove) {
      files.flatMap(p => readGeo(conf, p).map(toFileGeo(p.toString, _)))
    } else {
      val confF = org.apache.spark.sql.GraftBridge.confFactory(conf)
      spark.sparkContext
        .parallelize(files.map(_.toString), math.min(files.size, 256))
        .mapPartitions { it =>
          val c = confF()
          it.flatMap(s => readGeo(c, new Path(s)).map(toFileGeo(s, _)))
        }
        .collect().toSeq
    }
  }

  private def toFileGeo(path: String, geo: String): FileGeo =
    FileGeo(path, BboxRe.findFirstMatchIn(geo).map { m =>
      val b = m.group(1).split(',').map(_.trim.toDouble)
      (b(0), b(1), b(2), b(3))
    })

  private def collectParquetFiles(fs: FileSystem, p: Path): Seq[Path] = {
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[Path]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        out += f.getPath
    }
    out.result()
  }

  private def readGeo(conf: Configuration, p: Path): Option[String] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try Option(reader.getFooter.getFileMetaData.getKeyValueMetaData.get("geo"))
    finally reader.close()
  }

  /** Bbox query with file-level pruning: only part files whose footer
    * bbox intersects the query box are scanned (files without a
    * usable footer are conservatively kept); the row-level predicate
    * still applies on the survivors, so results are exact. Returns
    * (pruned DataFrame, files read, files total) so callers/specs can
    * see the pruning.
    */
  def readBbox(spark: SparkSession, dir: String,
               bbox: (Double, Double, Double, Double)): (DataFrame, Int, Int) = {
    val (w, s, e, n) = bbox
    Validation.validateBbox(w, s, e, n)
    val all = listFileGeo(spark, dir)
    require(all.nonEmpty, s"no parquet files under $dir")
    val keep = all.filter { fg =>
      fg.bbox.forall { case (x0, y0, x1, y1) =>
        x0 <= e && x1 >= w && y0 <= n && y1 >= s
      }
    }
    // basePath keeps partition columns (year=/month=) on the pruned set
    val df0 =
      if (keep.isEmpty)
        spark.read.option("basePath", dir).parquet(dir).limit(0)
      else
        spark.read.option("basePath", dir).parquet(keep.map(_.path): _*)
    val df = df0.filter(col("lon") >= w && col("lon") <= e &&
      col("lat") >= s && col("lat") <= n)
    (df, keep.size, all.size)
  }
}
