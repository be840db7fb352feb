package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for DataFrame-level specs (one JVM-wide session —
  * getOrCreate reuses it across suites to keep `sbt test` fast). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
