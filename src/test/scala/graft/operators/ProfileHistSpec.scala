package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Histogram-sketch laws: edge-bin clamping, cell-wise shard
  * mergeability (the property that makes the grid a 100 TB citizen),
  * the hand-computed quantile grid, and the one-sided bracketing
  * guarantee — the estimate is always ≥ the true type-1 quantile and
  * within one step of it when the value is in range (the histogram
  * analogue of Count-Min's est ≥ exact).
  */
class ProfileHistSpec extends AnyFunSuite with SparkSpec {

  private def vals(rows: Seq[Double], key: String = "k") = {
    val s = spark; import s.implicits._
    rows.map(v => (key, v)).toDF("key", "v")
  }

  test("bin assignment clamps out-of-range values into the edge bins") {
    val got = Profile.histSketch(
      vals(Seq(-3.0, 0.0, 4.99, 5.0, 499.0, 1e9)),
      "key", "v", lo = 0L, step = 5L, bins = 100)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // -3, 0, 4.99 → bin 0; 5.0 → bin 1; 499 and 1e9 → clamped bin 99
    assert(got === Map(0L -> 3L, 1L -> 1L, 99L -> 2L))
  }

  test("shard sketches merge cell-wise to the whole-stream sketch") {
    val rows = (1 to 100).map(_.toDouble * 7 % 53)
    val whole = Profile.histSketch(vals(rows), "key", "v", 0L, 5L, 12)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val merged = Profile.histMerge(
      Profile.histSketch(vals(rows.take(37)), "key", "v", 0L, 5L, 12)
        .unionByName(
          Profile.histSketch(vals(rows.drop(37)), "key", "v", 0L, 5L, 12)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged === whole)
  }

  test("hand-computed quantile grid: 1..100 at step 10") {
    // bins: b0 = 1..9 (9 rows), b1..b8 = 10 each, b9 = 90..99 + the
    // clamped 100 (11 rows); cum = 9, 19, ..., 89, 100
    val sk = Profile.histSketch(
      vals((1 to 100).map(_.toDouble)), "key", "v", 0L, 10L, 10)
    val got = Profile.histQuantiles(sk, 0L, 10L,
      Seq("p50" -> 5000, "p90" -> 9000, "p99" -> 9900))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).head
    // ranks 50/90/99 → first cum ≥ rank at bins 5/9/9 → edges 60/100/100
    assert(got === ((100L, 60L, 100L, 100L)))
  }

  test("estimate brackets the true type-1 quantile within one step") {
    val rows = (1 to 200).map(i => (i * 37 % 97).toDouble)
    val sorted = rows.sorted
    val sk = Profile.histSketch(vals(rows), "key", "v", 0L, 5L, 100)
    val got = Profile.histQuantiles(sk, 0L, 5L,
      Seq("p25" -> 2500, "p50" -> 5000, "p75" -> 7500, "p99" -> 9900))
      .collect().head
    Seq(2500, 5000, 7500, 9900).zipWithIndex.foreach { case (q, i) =>
      val rank = (q.toLong * rows.size + 9999) / 10000
      val truth = sorted((rank - 1).toInt)
      val est = got.getLong(i + 2).toDouble
      assert(est >= truth && est - 5 <= truth,
        s"q=$q: est $est vs true $truth")
    }
  }

  test("keys quantile independently") {
    val s = spark; import s.implicits._
    val df = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble * 10))).toDF("key", "v")
    val got = Profile.histQuantiles(
      Profile.histSketch(df, "key", "v", 0L, 5L, 200), 0L, 5L,
      Seq("p50" -> 5000))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // a: rank 25 → value 25 → bin 5 → edge 30; b: rank 25 → 250 → bin 50 → 255
    assert(got === Map("a" -> 30L, "b" -> 255L))
  }
}
