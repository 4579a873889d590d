package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DecontamSpec extends AnyFunSuite with SparkSpec {

  private lazy val train = {
    val s = spark; import s.implicits._
    Seq(
      // shares the full "quick brown fox jumps" 4 consecutive words
      // with bench doc 100 -> two distinct 3-grams
      (1L, "the quick brown fox jumps high", "en", "web"),
      // shares exactly ONE 3-gram with bench 100 ("quick brown fox")
      (2L, "a quick brown fox sleeps", "en", "web"),
      // no overlap at all
      (3L, "completely different words here now", "en", "web"),
      // exact copy of bench doc 150 -> many shared 3-grams
      (4L, "to be or not to be that is the question", "en", "book"))
      .toDF("doc_id", "text", "lang", "source")
  }

  private lazy val bench = {
    val s = spark; import s.implicits._
    Seq(
      (100L, "the quick brown fox jumps far away", "en", "eval"),
      (150L, "to be or not to be that is the question", "en", "eval"))
      .toDF("doc_id", "text", "lang", "source")
  }

  test("shinglesN: distinct word n-grams, short docs yield empty") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Decontam.shinglesN(col("text"), 3).as("g"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) === Seq("a b c", "b c d"))
    assert(m(2L) === Seq.empty)
    assert(m(3L) === Seq.empty)
    // n=1 degenerates to the distinct word set
    val w = Seq((1L, "b a b"))
      .toDF("doc_id", "text")
      .select(Decontam.shinglesN(col("text"), 1).as("g"))
      .collect()(0).getSeq[String](0)
    assert(w.toSet === Set("a", "b"))
  }

  test("overlapScreen finds pairs at >= minShared distinct 3-grams") {
    val hits = Decontam.overlapScreen(train, bench, n = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 x bench 100: "the quick brown","quick brown fox","brown fox jumps"
    assert(hits((1L, 100L)) === 3L)
    // doc 4 is an exact copy of bench 150: 8 distinct 3-grams
    assert(hits((4L, 150L)) === 8L)
    // doc 2 shares only one 3-gram -> below threshold; doc 3 none
    assert(hits.keySet === Set((1L, 100L), (4L, 150L)))
  }

  test("overlapRatio: per-doc contaminated-gram fraction, per-myriad") {
    val got = Decontam.overlapRatio(train, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1 "the quick brown fox jumps high": 4 distinct 3-grams —
    // "the quick brown", "quick brown fox", "brown fox jumps" shared
    // with bench 100, "fox jumps high" clean -> 3*10000 div 4 = 7500
    assert(got(1L) === ((4L, 3L, 7500L)))
    // doc 3: no overlap -> ratio 0
    assert(got(3L)._2 === 0L)
    assert(got(3L)._3 === 0L)
    // doc 4 is an exact copy of bench 150 -> every gram contaminated
    assert(got(4L)._1 === got(4L)._2)
    assert(got(4L)._3 === 10000L)
  }

  test("survivors is the exact complement of screened train ids") {
    val kept = Decontam.survivors(train, bench, n = 3, minShared = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(2L, 3L))
  }

  test("repetitionStats: ratios and modal-token share") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b a b a b"), // 5 bigrams, 2 distinct; modal token a:3 of 6
      (2L, "u v w x"),     // no repetition
      (3L, "z"))           // too short for a bigram
      .toDF("doc_id", "text")
    val rows = Decontam.repetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows(1L) === ((5L, 2L, 0.6, 0.5)))
    assert(rows(2L) === ((3L, 3L, 0.0, 0.25)))
    assert(rows(3L) === ((0L, 0L, 0.0, 1.0)))
  }

  test("domainMix: shares sum to 1, weight restores uniform target") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f", "web"),   // 6 tokens
      (2L, "g h", "web"),           // web total: 8
      (3L, "i j k l", "book"))      // book total: 4
      .toDF("doc_id", "text", "source")
    val rows = Decontam.domainMix(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("web")._1 === 2L)
    assert(rows("web")._2 === 8L)
    assert(rows("book")._3 === round6(4.0 / 12))
    // weight x share = 1/k for every source (the resampling identity)
    rows.values.foreach { case (_, _, share, w) =>
      assert(math.abs(share * w - 0.5) < 2e-6)
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("winnowFingerprints: short-doc conventions and window minima") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "a b"),                    // under k=3 words -> no fingerprints
      (2L, "a b c d"),                // 2 k-grams < win=4 -> one global min
      (3L, (1 to 20).map(i => s"w$i").mkString(" "))) // full windows
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFunctions.winnowFingerprints(col("text")).as("f"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L).isEmpty)
    assert(m(2L).size === 1)
    // 18 k-grams, 15 windows, expected ~2/(win+1) retention after dedup
    assert(m(3L).nonEmpty && m(3L).size <= 15)
    assert(m(3L) === m(3L).sorted)
  }

  test("winnowPairs: shared contiguous run of k+win-1 words guarantees a pair") {
    val s = spark; import s.implicits._
    // 6 shared consecutive words (= k + win - 1 with k=3, win=4)
    // embedded in otherwise-disjoint docs -> the winnowing guarantee
    // says they MUST share >= 1 fingerprint
    val shared = "p q r s t u"
    val docs = Seq(
      (1L, s"a b c d $shared e f g h"),
      (2L, s"m n o $shared x y z"),
      (3L, "completely different words entirely here now today friend"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("bloomSurvivors equals survivors exactly (verify screens bloom FPs)") {
    val exact = Decontam.survivors(train, bench).collect().map(_.getLong(0)).toSeq
    // default fpp, and a pathological fpp=0.5 that floods the
    // prescreen with false positives — the exact verify must absorb
    // them all; the one-sidedness of bloom errors is what makes the
    // composition lossless
    for (fpp <- Seq(0.01, 0.5)) {
      val viaBloom = Decontam.bloomSurvivors(train, bench, fpp = fpp)
        .collect().map(_.getLong(0)).toSeq
      assert(viaBloom === exact, s"fpp=$fpp")
    }
    assert(exact === Seq(2L, 3L))
  }
}
