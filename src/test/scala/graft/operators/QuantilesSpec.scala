package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QuantilesSpec extends AnyFunSuite with SparkSpec {

  test("sort-based exactQuantiles equals the builtin exact percentile") {
    val rnd = new scala.util.Random(11)
    val df = spark.createDataFrame(
      (1 to 500).map(i => (s"g${i % 3}", rnd.nextDouble() * 1000)))
      .toDF("flag", "v")
    val ours = Profile.exactQuantiles(df, "flag", "v",
      Seq("p50" -> 0.5, "p95" -> 0.95, "p0" -> 0.0, "p100" -> 1.0))
      .orderBy("flag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val builtin = df.groupBy("flag").agg(
      round(expr("percentile(v, 0.5)"), 6).as("p50"),
      round(expr("percentile(v, 0.95)"), 6).as("p95"),
      round(expr("percentile(v, 0.0)"), 6).as("p0"),
      round(expr("percentile(v, 1.0)"), 6).as("p100"))
      .orderBy("flag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(ours.toSeq === builtin.toSeq)
  }

  test("exactQuantiles interpolates single-element and two-element groups") {
    val df = spark.createDataFrame(Seq(("a", 10.0), ("b", 1.0), ("b", 2.0)))
      .toDF("flag", "v")
    val got = Profile.exactQuantiles(df, "flag", "v", Seq("p50" -> 0.5))
      .orderBy("flag").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("a", 10.0), ("b", 1.5)))
  }
}
