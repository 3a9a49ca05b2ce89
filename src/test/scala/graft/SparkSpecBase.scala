package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs: one local session per suite. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.getOrCreate("local[4]")
  val sf: String = "/root/testdata/sf0.001"
}
