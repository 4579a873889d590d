package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Temperature-scaled mixture weights and the UniMax waterfill
  * against direct plain-JVM references, plus the allocation
  * invariants the closed form must satisfy (budget exhaustion, cap
  * respect, uniformity of the non-capped level).
  */
class MixtureSpec extends AnyFunSuite with SparkSpec {

  /** doc_id-free corpus: (source, n words) pairs expanded to docs. */
  private def corpus(sizes: (String, Int)*): DataFrame = {
    val rows = sizes.zipWithIndex.map { case ((src, n), i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "), src)
    }
    spark.createDataFrame(rows).toDF("doc_id", "text", "source")
  }

  test("temperature alpha=0.3 matches the grid-rounded reference") {
    val df = corpus("a" -> 80, "b" -> 15, "c" -> 5)
    val got = Mixture.collectTemp(Decontam.domainMixTemperature(df))
    val tot = 100.0
    def a(n: Long): Long =
      BigDecimal(math.pow(n / tot, 0.3) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val as = Map("a" -> a(80), "b" -> a(15), "c" -> a(5))
    val sumA = as.values.sum.toDouble
    for ((src, n) <- Seq("a" -> 80L, "b" -> 15L, "c" -> 5L)) {
      val (share, target, w) = got(src)
      assert(share === math.rint(n / tot * 1e6) / 1e6)
      assert(target === math.rint(as(src) / sumA * 1e6) / 1e6)
      assert(w === math.rint((as(src) * tot) / (sumA * n) * 1e6) / 1e6)
    }
    // temperature boosts the tail: c's weight > 1 > a's weight
    assert(got("c")._3 > 1.0 && got("a")._3 < 1.0)
  }

  test("temperature endpoints: alpha=0 is uniform, alpha=1 identity") {
    val df = corpus("a" -> 60, "b" -> 30, "c" -> 10)
    val flat = Mixture.collectTemp(
      Decontam.domainMixTemperature(df, alpha = 0.0))
    assert(flat.values.map(_._2).toSet === Set(0.333333))
    val id = Mixture.collectTemp(
      Decontam.domainMixTemperature(df, alpha = 1.0))
    id.foreach { case (_, (share, target, w)) =>
      assert(math.abs(target - share) <= 1e-6)
      assert(math.abs(w - 1.0) <= 1e-5)
    }
  }

  /** Plain-JVM mirror of the DOCUMENTED waterfill semantics
    * (Curation.unimaxAlloc scaladoc), written from the spec with
    * plain collections: caps ascending with prefix sums, the full
    * prefix by the cap·(sources-left) test, even split + first-`rem`
    * remainder over the open sources.
    */
  private def refAlloc(sizes: Map[String, Long], budget: Long,
      maxEpochs: Int): Map[String, Long] = {
    val order = sizes.toSeq.map { case (s, n) => (s, n * maxEpochs) }
      .sortBy { case (s, c) => (c, s) }
    val k = order.size
    val prefix = order.map(_._2).scanLeft(0L)(_ + _)
    val full = order.zipWithIndex.collect {
      case ((s, c), i) if c * (k - i) <= budget - prefix(i) => s
    }.toSet
    val open = order.collect { case (s, _) if !full(s) => s }
    val capped = order.collect { case (s, c) if full(s) => s -> c }.toMap
    if (open.isEmpty) capped
    else {
      val rest = budget - capped.values.sum
      val base = rest / open.size
      val rem = rest % open.size
      capped ++ open.zipWithIndex.map { case (s, j) =>
        s -> (base + (if (j < rem) 1L else 0L)) }
    }
  }

  test("unimax allocation matches the sequential waterfill") {
    val cases = Seq(
      (Map("a" -> 80L, "b" -> 15L, "c" -> 5L), 100L, 4),
      (Map("a" -> 50L, "b" -> 50L), 1000L, 4), // budget > capacity
      (Map("a" -> 97L, "b" -> 3L, "c" -> 11L, "d" -> 7L), 77L, 2),
      (Map("x" -> 1L, "y" -> 1000L), 500L, 4),
      (Map("solo" -> 42L), 100L, 1))
    cases.foreach { case (sizes, budget, epochs) =>
      val df = corpus(sizes.toSeq.sortBy(_._1)
        .map { case (s, n) => s -> n.toInt }: _*)
      val got = Curation.unimaxAlloc(df, budget, epochs)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      val want = refAlloc(sizes, budget, epochs)
      assert(got === want, s"sizes=$sizes budget=$budget epochs=$epochs")
      // invariants: caps respected; budget exhausted up to capacity
      got.foreach { case (s, alloc) =>
        assert(alloc <= sizes(s) * epochs)
      }
      val capTotal = sizes.values.map(_ * epochs).sum
      assert(got.values.sum === math.min(budget, capTotal))
    }
  }

  test("unimax: non-capped sources sit within one token of each other") {
    val df = corpus("a" -> 500, "b" -> 400, "c" -> 3, "d" -> 600)
    val got = Curation.unimaxAlloc(df, 900L, 4)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val open = got.filter { case (_, cap, alloc) => alloc < cap }
    val levels = open.map(_._3)
    assert(levels.max - levels.min <= 1)
    // c is capped at 12 and fully funded first
    assert(got.find(_._1 == "c").get._3 === 12L)
  }
}

/** Collect helper shared by the temperature tests. */
private object Mixture {
  def collectTemp(df: DataFrame): Map[String, (Double, Double, Double)] =
    df.collect().map(r =>
      r.getString(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
}
