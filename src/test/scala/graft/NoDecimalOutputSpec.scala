package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType,
  ArrayType, MapType, StructField}

/** Round-14 verdict item #1 (invariant half): no registered query may
  * emit a DECIMAL column. DECIMAL(38,0) ≙ HUGEINT is value-exact
  * across Spark and DuckDB, but its *string rendering* is not pinned
  * across harness versions/fetch paths — the r12/r13 driver-gate hash
  * failures tracked the registry's ONE query with DECIMAL output
  * (`dedup_shingle_saturation`, fixed r14 by emitting canonical digit
  * strings). DECIMAL stays legal *inside* a plan (exact wide sums);
  * it must be cast to STRING (values beyond Long) or BIGINT (values
  * within) at the output boundary. Schema-only: no job runs.
  */
class NoDecimalOutputSpec extends SparkSpecBase {

  private def decimalPaths(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.flatMap { case StructField(n, t, _, _) =>
          decimalPaths(t, s"$path.$n")
        }.toSeq
      case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
      case m: MapType =>
        decimalPaths(m.keyType, s"$path<key>") ++
          decimalPaths(m.valueType, s"$path<value>")
      case _ => Nil
    }

  test("no registered query has a DECIMAL output column") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val schema =
          try q(spark, dir).schema
          catch { case e: Throwable => fail(s"$name: schema build " +
            s"threw ${e.getClass.getSimpleName}: ${e.getMessage}") }
        schema.fields.flatMap(f => decimalPaths(f.dataType, f.name))
          .map(p => s"$name: $p")
    }
    assert(offenders.isEmpty,
      s"\n${offenders.size} DECIMAL output columns (cast to STRING " +
        "or BIGINT at the boundary — DECIMAL rendering is not " +
        s"pinned cross-engine):\n  ${offenders.mkString("\n  ")}")
  }
}
