package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The engine's SQL face: registered tables + injected functions make
  * every capability reachable from `spark.sql` — the surface BI tools
  * and SQL-first users hit.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("analytics SQL over registered views matches the DataFrame route") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT o_orderpriority AS priority, count(*) AS n
        |FROM orders_v GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val df = Tables.orders(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("o_orderpriority").as("priority"))
      .count().withColumnRenamed("count", "n")
      .orderBy("priority").collect().map(_.toSeq).toSeq
    assert(sql === df)
  }

  test("injected native functions compose in SQL (vec_dot + top_k)") {
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_v")
    val got = spark.sql(
      """SELECT label,
        |       top_k(CAST(vec_dot(embedding, embedding) AS DOUBLE),
        |             CAST(vec_id AS STRING), 2) AS top
        |FROM emb_v GROUP BY label ORDER BY label LIMIT 2""".stripMargin)
      .collect()
    assert(got.length === 2)
    got.foreach { r =>
      val top = r.getSeq[org.apache.spark.sql.Row](1)
      assert(top.nonEmpty && top.size <= 2)
      // unit-norm embeddings: self dot ≈ 1
      assert(math.abs(top.head.getDouble(0) - 1.0) < 1e-3)
    }
  }

  test("bpe_token_count is callable from SQL") {
    val got = spark.sql(
      "SELECT bpe_token_count('vector orderkey') AS n").head.getLong(0)
    // 'vector' folds to 1 token, 'orderkey' to 4 (BpeSpec)
    assert(got === 5L)
  }

  test("script_counts is callable from SQL") {
    // 'a' latin, '1' digit, 'д' cyrillic — bucket order latin, digit,
    // punct, cyrillic, greek, cjk, arabic, hangul, other
    val got = spark.sql("SELECT script_counts('a1д') AS c")
      .head.getSeq[Long](0)
    assert(got === Seq(1L, 1L, 0L, 1L, 0L, 0L, 0L, 0L, 0L))
  }
}
