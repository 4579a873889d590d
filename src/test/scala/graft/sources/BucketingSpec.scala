package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("co-bucketed join plans with zero shuffle exchange") {
    val left = spark.createDataFrame(
      (1 to 500).map(i => (i.toLong, s"l$i"))).toDF("k", "lv")
    val right = spark.createDataFrame(
      (1 to 500).map(i => (i.toLong, s"r$i"))).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", "k", 4)
    Bucketing.writeBucketed(right, "bkt_right", "k", 4)

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle, got:\n$plan")
      assert(joined.count() === 500)

      // control: the same join over plain parquet DOES shuffle
      val plainPlan = left.join(right, "k")
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
