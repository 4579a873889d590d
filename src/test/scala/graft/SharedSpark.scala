package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole forked test JVM (sessions are
  * expensive; suites share it and never stop it). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4)
      .appName("graft-tests")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec {
  def spark: SparkSession = SharedSpark.spark
}
