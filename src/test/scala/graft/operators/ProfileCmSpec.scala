package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Count-Min sketch laws: the one-sided error bound (est ≥ exact
  * always; est == exact at collision-free width), cell-wise shard
  * mergeability (the property that makes the sketch a 100 TB
  * citizen), and the zero-floor for never-seen candidates.
  */
class ProfileCmSpec extends AnyFunSuite with SparkSpec {

  private def toks(rows: Seq[String]) = {
    val s = spark; import s.implicits._
    rows.toDF("token")
  }

  // skewed stream: "a"×40, "b"×12, c..j ×1..3
  private def stream = toks(
    Seq.fill(40)("a") ++ Seq.fill(12)("b") ++
      ('c' to 'j').flatMap(ch => Seq.fill((ch - 'b') % 3 + 1)(ch.toString)))

  test("cmSketchOf(counts) == cmSketch(stream) — the one-aggregation derivation") {
    val counts = stream.groupBy("token").agg(count(lit(1)).as("c"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rw", "bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(Profile.cmSketchOf(counts, 3, 4)) ===
      rows(Profile.cmSketch(stream, 3, 4)))
    assert(rows(Profile.cmSketchOf(counts, 4, 512)) ===
      rows(Profile.cmSketch(stream, 4, 512)))
  }

  test("cmEstimate never underestimates; exact at collision-free width") {
    val exact = stream.groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tight width (collisions likely) — one-sided error only
    val tight = Profile.cmEstimate(
      Profile.cmSketch(stream, 3, 4), toks(exact.keys.toSeq), 3, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(tight(t) >= n, s"$t: est ${tight(t)} < exact $n")
    }
    // wide grid: 10 tokens into 4×4096 — est == exact for all
    val wide = Profile.cmEstimate(
      Profile.cmSketch(stream, 4, 4096), toks(exact.keys.toSeq), 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide === exact)
  }

  test("shard sketches merge cell-wise to the whole-stream sketch") {
    val a = stream.filter(col("token") <= "d")
    val b = stream.filter(col("token") > "d")
    val whole = Profile.cmSketch(stream, 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val merged = Profile.cmMerge(
      Profile.cmSketch(a, 4, 8).unionByName(Profile.cmSketch(b, 4, 8)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged === whole)
  }

  test("never-seen candidate floors at 0 via the sparse-cell coalesce") {
    val est = Profile.cmEstimate(
      Profile.cmSketch(stream, 4, 4096), toks(Seq("zzz-unseen")), 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("zzz-unseen") === 0L)
  }

  test("degenerate grid parameters are rejected") {
    intercept[IllegalArgumentException] {
      Profile.cmSketch(stream, 0, 512)
    }
    intercept[IllegalArgumentException] {
      Profile.cmSketch(stream, 4, 1)
    }
  }
}
