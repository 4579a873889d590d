package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BloomExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("bloomMightContain: no false negatives, few false positives, null-safe") {
    val s = spark; import s.implicits._
    val inserted = (0L until 1000L).map(_ * 7919L)
    val bf = BloomFilter.create(inserted.size.toLong, 0.01)
    inserted.foreach(bf.putLong)

    val hits = inserted.toDF("k")
      .filter(BloomExpressions.bloomMightContain(col("k"), bf))
      .count()
    assert(hits === inserted.size.toLong) // one-sided: never a false negative

    // disjoint probe set: expect ~1% FPs, assert a loose ceiling
    val probes = (1L to 10000L).map(_ * 7919L + 3L)
    val fps = probes.toDF("k")
      .filter(BloomExpressions.bloomMightContain(col("k"), bf))
      .count()
    assert(fps < 500L, s"false-positive count $fps way over the 1% design rate")

    // null key -> null out (filter drops it), nullIntolerant contract
    val withNull = Seq(Some(7919L), None).toDF("k")
      .filter(BloomExpressions.bloomMightContain(col("k"), bf))
      .count()
    assert(withNull === 1L)
  }

  test("probe survives codegen and interpreted paths identically") {
    val s = spark; import s.implicits._
    val bf = BloomFilter.create(10L, 0.01)
    bf.putLong(42L)
    val df = Seq(42L, 43L).toDF("k")
      .withColumn("hit", BloomExpressions.bloomMightContain(col("k"), bf))
    val byKey = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(byKey(42L))
    // 43 COULD be a false positive in principle; with one insertion in
    // a 10-item filter the probability is ~0 — treat as deterministic
    assert(!byKey(43L))
  }
}
