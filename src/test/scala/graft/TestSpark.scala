package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites (JVM is forked once by sbt). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("8")
  val sf0001 = "/root/testdata/sf0.001"
}
