package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession =
    Tables.configure(SparkSession.builder().appName("graft-test"), "4")
      .getOrCreate()
  val sfDir = "/root/testdata/sf0.001"
}
