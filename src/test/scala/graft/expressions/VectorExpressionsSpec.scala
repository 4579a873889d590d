package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {
  import VectorExpressions.vecDot

  private lazy val df = spark.createDataFrame(Seq(
    (0L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
    (1L, Seq(0.5f, -0.5f), Seq(2f, 2f))))
    .toDF("id", "a", "b")

  test("vec_dot equals the interpreted zip_with+aggregate fold bit-for-bit") {
    val fold = aggregate(
      zip_with(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double")), (p, q) => p * q),
      lit(0.0d), (acc, v) => acc + v)
    val rows = df.select(vecDot(col("a"), col("b")).as("native"),
      fold.as("fold")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(rows.map(_.getDouble(0)).toSeq === Seq(32.0, 0.0))
  }

  test("vec_dot is registered for SQL via GraftExtensions") {
    df.createOrReplaceTempView("vecs")
    val got = spark.sql(
      "SELECT id, vec_dot(a, b) AS d FROM vecs ORDER BY id")
      .collect().map(_.getDouble(1)).toSeq
    assert(got === Seq(32.0, 0.0))
  }

  test("null arrays propagate null") {
    val withNull = df.select(col("id"),
      when(col("id") === 0, col("a")).as("a"), col("b"))
    val got = withNull.select(vecDot(col("a"), col("b"))).collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
  }

  test("non-numeric array types are rejected at analysis") {
    val bad = spark.createDataFrame(Seq(Tuple1(Seq("x", "y")))).toDF("s")
    val e = intercept[Exception] {
      bad.select(vecDot(col("s"), col("s"))).collect()
    }
    assert(e.getMessage.contains("vec_dot") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("vec_dot_long equals the interpreted fold exactly, incl. negatives") {
    import VectorExpressions.vecDotLong
    val ldf = spark.createDataFrame(Seq(
      (0L, Seq(127L, -64L, 32L, 0L), Seq(127L, 0L, 0L, 0L)),
      (1L, Seq(-127L, 5L), Seq(127L, 1000000L))))
      .toDF("id", "a", "b")
    val fold = aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
      lit(0L), (acc, v) => acc + v)
    val rows = ldf.select(vecDotLong(col("a"), col("b")).as("native"),
      fold.as("fold")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(rows.map(_.getLong(0)).toSeq === Seq(16129L, 4983871L))
  }

  test("vec_dot_long is registered for SQL and rejects non-long arrays") {
    import VectorExpressions.vecDotLong
    spark.createDataFrame(Seq((0L, Seq(2L, 3L), Seq(4L, 5L))))
      .toDF("id", "a", "b").createOrReplaceTempView("lvecs")
    val got = spark.sql("SELECT vec_dot_long(a, b) FROM lvecs")
      .collect().head.getLong(0)
    assert(got === 23L)
    val e = intercept[Exception] {
      df.select(vecDotLong(col("a"), col("b"))).collect() // float arrays
    }
    assert(e.getMessage.contains("vec_dot_long") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("double arrays work too (mixed float/double)") {
    val mixed = df.select(col("a"),
      transform(col("b"), _.cast("double")).as("bd"))
    val got = mixed.select(vecDot(col("a"), col("bd"))).collect()
      .map(_.getDouble(0)).toSeq
    assert(got === Seq(32.0, 0.0))
  }
}
