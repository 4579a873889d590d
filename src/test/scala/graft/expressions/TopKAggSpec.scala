package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TopKAggSpec extends AnyFunSuite with SparkSpec {

  private lazy val df = spark.createDataFrame(Seq(
    ("g1", 5.0, "a"), ("g1", 9.0, "b"), ("g1", 7.0, "c"), ("g1", 9.0, "a2"),
    ("g2", 1.0, "x")))
    .toDF("g", "score", "label")

  test("keeps the k best per group, sorted (score desc, label asc)") {
    val got = df.groupBy("g")
      .agg(TopKAgg.topK(col("score"), col("label"), 2).as("top"))
      .orderBy("g").collect()
    val g1 = got(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getString(1)))
    assert(g1 === Seq((9.0, "a2"), (9.0, "b"))) // tie → label asc wins
    val g2 = got(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getString(1)))
    assert(g2 === Seq((1.0, "x")))
  }

  test("map-side partials merge correctly across many partitions") {
    val big = spark.createDataFrame(
      (1 to 1000).map(i => ("g", i.toDouble, s"l$i")))
      .toDF("g", "score", "label").repartition(16)
    val top = big.groupBy("g")
      .agg(TopKAgg.topK(col("score"), col("label"), 3).as("top"))
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getString(1)))
    assert(top === Seq((1000.0, "l1000"), (999.0, "l999"), (998.0, "l998")))
  }

  test("topKDistinct == .distinct() + topK on a duplicate-bearing stream") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(19)
    // duplicates always carry the identical (score, label) — the
    // NN-descent candidate-rule contract the distinct arm serves
    val base = (1 to 400).map { i =>
      ("g" + (i % 7), (i % 37).toDouble, f"l${i % 53}%03d")
    }
    val dups = base ++ base.take(250) ++ base.drop(100).take(200)
    val multiset = rnd.shuffle(dups).toDF("g", "score", "label")
      .repartition(16)
    def fmt(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("g").collect().map(r => (r.getString(0),
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getString(1))))).toSeq
    val viaDistinctExchange = fmt(multiset.distinct().groupBy("g")
      .agg(TopKAgg.topK(col("score"), col("label"), 5).as("top")))
    val viaHeapDedupe = fmt(multiset.groupBy("g")
      .agg(TopKAgg.topKDistinct(col("score"), col("label"), 5).as("top")))
    assert(viaHeapDedupe === viaDistinctExchange)
    // an eviction-then-duplicate re-insert must also collapse: one
    // group, tiny k, the duplicate of an evicted element arrives last
    val tricky = Seq(("g", 1.0, "low"), ("g", 9.0, "a"), ("g", 8.0, "b"),
      ("g", 1.0, "low")).toDF("g", "score", "label").coalesce(1)
    val got = fmt(tricky.groupBy("g")
      .agg(TopKAgg.topKDistinct(col("score"), col("label"), 2).as("top")))
    assert(got === Seq(("g", Seq((9.0, "a"), (8.0, "b")))))
  }

  test("registered for SQL as top_k via GraftExtensions") {
    df.createOrReplaceTempView("topk_in")
    val got = spark.sql(
      "SELECT top_k(score, label, 1) AS t FROM topk_in GROUP BY g ORDER BY g")
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).head.getString(1))
    assert(got.toSeq === Seq("a2", "x"))
  }
}
