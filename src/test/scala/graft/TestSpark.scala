package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (per the Spark testing
  * guidance: one SparkSession per JVM, lazy, never stopped mid-suite). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
