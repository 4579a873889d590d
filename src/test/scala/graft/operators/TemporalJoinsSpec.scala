package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TemporalJoinsSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before, per key") {
    val left = spark.createDataFrame(Seq(
      (1L, 10L, ts("2024-01-01 00:00:10")),
      (2L, 10L, ts("2024-01-01 00:01:00")),
      (3L, 20L, ts("2024-01-01 00:00:30")),
      (4L, 30L, ts("2024-01-01 00:00:05")))) // key with no right rows
      .toDF("id", "k", "t")
    val right = spark.createDataFrame(Seq(
      (10L, ts("2024-01-01 00:00:10"), 1.0), // exact tie with left id=1
      (10L, ts("2024-01-01 00:00:50"), 2.0),
      (10L, ts("2024-01-01 00:02:00"), 3.0), // after every left row
      (20L, ts("2024-01-01 00:00:00"), 4.0)))
      .toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect()
    // tie at equal timestamp is INCLUSIVE
    assert(out(0).getDouble(out(0).fieldIndex("v")) === 1.0)
    assert(out(1).getDouble(out(1).fieldIndex("v")) === 2.0)
    assert(out(2).getDouble(out(2).fieldIndex("v")) === 4.0)
    assert(out(3).isNullAt(out(3).fieldIndex("v")))
    assert(out(3).isNullAt(out(3).fieldIndex("rt")))
    assert(out.length === 4) // left join: every left row exactly once
  }

  test("asOfJoin carries the matched right row atomically through payload nulls") {
    val left = spark.createDataFrame(Seq(
      (1L, 10L, ts("2024-01-01 00:01:00"))))
      .toDF("id", "k", "t")
    val right = spark.createDataFrame(Seq(
      (10L, ts("2024-01-01 00:00:10"), Some(7.0)),
      (10L, ts("2024-01-01 00:00:20"), Option.empty[Double]))) // latest, null v
      .toDF("k", "rt", "v")
    val out = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect()
    // the matched row is the LATEST one — its null v must NOT be
    // backfilled from the older row (the struct travels whole)
    assert(out(0).getTimestamp(out(0).fieldIndex("rt")) ===
      ts("2024-01-01 00:00:20"))
    assert(out(0).isNullAt(out(0).fieldIndex("v")))
  }

  test("rangeJoin matches [start, end) exactly, incl. bucket-spanning intervals") {
    val points = spark.createDataFrame(Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // == start: in
      (2L, 10L, ts("2024-01-01 00:59:59")), // just inside
      (3L, 10L, ts("2024-01-01 01:00:00")), // == end: out
      (4L, 20L, ts("2024-01-01 00:30:00")), // other key: out
      (5L, 10L, ts("2024-01-01 02:15:00")))) // second interval, spans buckets
      .toDF("pid", "k", "t")
    val intervals = spark.createDataFrame(Seq(
      (100L, 10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (101L, 10L, ts("2024-01-01 01:30:00"), ts("2024-01-01 02:30:00")),
      (102L, 10L, ts("2024-01-01 03:00:00"), ts("2024-01-01 03:00:00")))) // empty
      .toDF("iid", "k", "s", "e")
    // bucket (600 s) much smaller than the interval: the containment
    // answer must be identical to the single-bucket case, with no dups
    for (bucket <- Seq(600L, 3600L, 86400L)) {
      val got = TemporalJoins
        .rangeJoin(points, intervals, Seq("k"), "t", "s", "e", bucket)
        .select("pid", "iid").orderBy("pid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq === Seq((1L, 100L), (2L, 100L), (5L, 101L)),
        s"bucket=$bucket")
    }
  }

  test("asOfJoin plans no nested loop or cartesian product") {
    val left = spark.createDataFrame(Seq(
      (1L, 10L, ts("2024-01-01 00:00:10"))))
      .toDF("id", "k", "t")
    val right = spark.createDataFrame(Seq(
      (10L, ts("2024-01-01 00:00:00"), 1.0)))
      .toDF("k", "rt", "v")
    val plan = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
