package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CurationSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.createDataFrame(Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away " * 5),
    (1L, "the quick brown fox jumps over the lazy dog and runs far away " * 5),
    (2L, "tiny"),
    (3L, "the of and to in is a rich long document with many distinct " +
      "useful words that keep the type token ratio high and length fine " +
      "plus plenty of stopwords to score well on every quality dimension")))
    .toDF("doc_id", "text")

  test("curate: dup loses to its keeper, short doc is low quality") {
    val got = Curation.curate(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getBoolean(4))).toMap
    assert(got(0L)._1 === "ok")
    assert(got(1L) === (("dup", false))) // same text, higher id
    assert(got(2L) === (("low_quality", false)))
    assert(got(3L) === (("ok", true)))
  }

  test("curateFull: gates fire in dup > contaminated > low_quality > repetitive order") {
    val s = spark; import s.implicits._
    val longOk = (1 to 60).map(i => s"w$i").mkString(" ") // quality-passing base
    val train = Seq(
      (0L, longOk, "en", "web"),                  // ok
      (1L, longOk, "en", "web"),                  // exact dup of 0
      (2L, "tiny doc", "en", "web"),              // low_quality (short)
      // shares >= 2 word-3-grams with the bench doc AND is short:
      // contamination must outrank low_quality
      (3L, "the quick brown fox jumps", "en", "web"),
      // quality-passing but one bigram repeated throughout -> repetitive
      (4L, (1 to 30).flatMap(_ => Seq("ab", "cd")).mkString(" ") + " tail",
        "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val bench = Seq((900L, "the quick brown fox jumps far", "en", "eval"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Curation.curateFull(train, bench, maxRepetition = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getString(4), r.getBoolean(5))).toMap
    assert(got(0L) === (("ok", true)))
    assert(got(1L) === (("dup", false)))
    assert(got(2L) === (("low_quality", false)))
    assert(got(3L) === (("contaminated", false)))
    assert(got(4L) === (("repetitive", false)))
  }

  test("sampleStratified: rate 1 keeps all, 0 keeps none, id-determined") {
    val s = spark; import s.implicits._
    val twoSrc = Seq(
      (0L, "x", "a"), (1L, "y", "a"), (2L, "z", "a"),
      (3L, "x", "b"), (4L, "y", "b"))
      .toDF("doc_id", "text", "source")
    val kept = Curation.sampleStratified(twoSrc, Map("a" -> 1.0, "b" -> 0.0))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(0L, 1L, 2L)) // all of a, none of b
    // deterministic across row orders (id-hash, not position)
    val shuffled = Curation.sampleStratified(
      twoSrc.orderBy(org.apache.spark.sql.functions.rand(3)),
      Map("a" -> 0.5, "b" -> 0.5)).collect().map(_.getLong(0)).toSet
    val plain = Curation.sampleStratified(twoSrc, Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(_.getLong(0)).toSet
    assert(shuffled === plain)
    // upsampling rates are rejected, not clamped
    intercept[IllegalArgumentException] {
      Curation.sampleStratified(twoSrc, Map("a" -> 1.5))
    }
  }

  test("sampleStratified hits each stratum's rate on a large corpus") {
    val s = spark; import s.implicits._
    val big = (0L until 4000L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "ev" else "od")).toDF("doc_id", "text", "source")
    val kept = Curation.sampleStratified(big, Map("ev" -> 0.25, "od" -> 0.75))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform: expect 500±noise of 2000 and 1500±noise
    assert(math.abs(kept("ev") - 500L) < 100, s"ev=${kept("ev")}")
    assert(math.abs(kept("od") - 1500L) < 100, s"od=${kept("od")}")
  }

  test("sampleWeighted: without replacement, weight-dominant, deterministic") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val s = spark; import s.implicits._
    val frame = (0L until 50L).map(i => (i, 10L)).toDF("doc_id", "wt")
    // doc 7 carries astronomically more mass: its priority
    // (m*10^6) div w collapses toward 0, so it MUST be drawn
    val skewed = frame.withColumn("wt",
      when(col("doc_id") === 7L, lit(1000000000000L)).otherwise(col("wt")))
    val got = Curation.sampleWeighted(skewed, col("wt"), n = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 5)
    assert(got.map(_._1).distinct.length === 5) // without replacement
    assert(got.map(_._1).contains(7L), s"heavy doc missing: ${got.toSeq}")
    // priorities ascend with rank (rank 1 = smallest key)
    assert(got.sortBy(_._3).map(_._2).toSeq ==
      got.map(_._2).sorted.toSeq)
    // deterministic: a second run is identical
    val again = Curation.sampleWeighted(skewed, col("wt"), n = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === got.toSeq)
    // equal weights reduce to the pure md5-uniform draw: the sample
    // is the n smallest m — independent of the (constant) weight
    val eq1 = Curation.sampleWeighted(frame, col("wt"), n = 5)
      .collect().map(_.getLong(0)).toSeq
    val eq2 = Curation.sampleWeighted(
      frame.withColumn("wt", lit(1000L)), col("wt"), n = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(eq1 === eq2)
    // zero/negative mass is never drawn
    val zeroed = Curation.sampleWeighted(
      frame.withColumn("wt",
        when(col("doc_id") < 45L, lit(0L)).otherwise(col("wt"))),
      col("wt"), n = 10).collect().map(_.getLong(0))
    assert(zeroed.forall(_ >= 45L) && zeroed.length === 5)
  }

  test("resampleStratified: whole weights replicate, fractional extends sampler") {
    val s = spark; import s.implicits._
    val twoSrc = Seq(
      (0L, "x", "a"), (1L, "y", "a"),
      (2L, "x", "b"), (3L, "y", "b"))
      .toDF("doc_id", "text", "source")
    // integer weights: exact replication, copy numbering 1..n
    val doubled = Curation.resampleStratified(twoSrc, Map("a" -> 2.0, "b" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(doubled === Seq((0L, 1L), (0L, 2L), (1L, 1L), (1L, 2L)))
    // w <= 1 degenerates to sampleStratified's keep set (copies in {0,1})
    val w = Map("a" -> 0.5, "b" -> 0.25)
    val sampled = Curation.sampleStratified(twoSrc, w)
      .collect().map(_.getLong(0)).toSet
    val resampled = Curation.resampleStratified(twoSrc, w)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(resampled.map(_._1).toSet === sampled)
    assert(resampled.forall(_._2 === 1L))
  }

  test("resampleStratified lands each stratum on its expected mass") {
    val s = spark; import s.implicits._
    val big = (0L until 4000L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "ev" else "od")).toDF("doc_id", "text", "source")
    val counts = Curation.resampleStratified(big, Map("ev" -> 1.5, "od" -> 0.75))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("ev") - 3000L) < 150, s"ev=${counts("ev")}")
    assert(math.abs(counts("od") - 1500L) < 150, s"od=${counts("od")}")
  }

  test("shardOrder: dense per-shard positions, stable permutation") {
    val s = spark; import s.implicits._
    val big = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val rows = Curation.shardOrder(big, nShards = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 500)
    assert(rows.forall { case (_, sh, _) => sh >= 0 && sh < 8 })
    // pos is dense 1..n_shard within every shard (a total read order)
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted === (1L to g.length).toSeq)
    }
    // id-hash determinism: input order never changes the coordinates
    val again = Curation.shardOrder(
      big.orderBy(org.apache.spark.sql.functions.rand(3)), nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet === again.toSet)
    // and the permutation actually scrambles: some doc beats a lower id
    val posOf = rows.map(t => t._1 -> (t._2, t._3)).toMap
    assert((1L until 500L).exists(i =>
      posOf(i)._1 == posOf(i - 1)._1 && posOf(i)._2 < posOf(i - 1)._2))
  }

  test("selectBudget: exact maximal prefix of the (quality desc, id) order") {
    val corpus = spark.createDataFrame((0L until 200L).map { i =>
      // varied lengths/vocab so quality values collide AND differ
      val words = (0 until (5 + (i % 17)).toInt)
        .map(j => s"w${(i * 7 + j) % 13}")
      (i, words.mkString(" "))
    }).toDF("doc_id", "text")
    // naive oracle: global cumsum over the fully sorted corpus
    val scored = Curation.selectBudget(corpus, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val sorted = scored.sortBy { case (id, q, _) => (-q, id) }
    val budget = 300L
    val expect = sorted.scanLeft((-1L, 0.0, 0L, 0L)) {
      case ((_, _, _, cum), (id, q, n)) => (id, q, n, cum + n)
    }.tail.takeWhile(_._4 <= budget)
    val got = Curation.selectBudget(corpus, budget)
      .orderBy(col("quality").desc, col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect.toSeq)
    assert(expect.nonEmpty && expect.last._4 <= budget)
    // quality ties exist in this corpus, so the tie-break path is live
    assert(sorted.map(_._2).distinct.length < sorted.length)
    // edges: zero budget selects nothing; full budget selects everything
    assert(Curation.selectBudget(corpus, 0L).count() === 0L)
    assert(Curation.selectBudget(corpus, Long.MaxValue).count() === 200L)
  }

  test("dsirWeights: docs matching the target outrank docs that don't") {
    val raw = spark.createDataFrame(Seq(
      (0L, "x x x x"), (1L, "y y y y"), (2L, "x x y y")))
      .toDF("doc_id", "text")
    val target = spark.createDataFrame(Seq(
      (100L, "x x x x x x"), (101L, "x x x x")))
      .toDF("doc_id", "text")
    val got = Curation.dsirWeights(raw, target, buckets = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 4 unigrams + 3 bigrams = 7 features each
    assert(got.map(_._2).toSeq === Seq(7L, 7L, 7L))
    val score = got.map(t => t._1 -> t._3).toMap
    assert(score(0L) > score(2L) && score(2L) > score(1L))
  }

  test("dsirWeights is deterministic and target-frame-scoped") {
    val raw = spark.createDataFrame(
      (0L to 20L).map(i => (i, s"tok$i alpha beta tok${i % 3}")))
      .toDF("doc_id", "text")
    val target = raw.filter(org.apache.spark.sql.functions
      .col("doc_id") < 5)
    val a = Curation.dsirWeights(raw, target).orderBy("doc_id").collect()
    val b = Curation.dsirWeights(raw, target).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("dsirSelect: exact maximal prefix of the (score desc, id) order") {
    val raw = spark.createDataFrame(
      (0L to 30L).map(i => (i,
        (0 to (i % 7).toInt).map(j => s"w${(i + j) % 5}").mkString(" "))))
      .toDF("doc_id", "text")
    val target = raw.filter(org.apache.spark.sql.functions
      .col("doc_id") % 3 === 0)
    val budget = 40L
    // brute force from the weights the operator itself reports
    val w = Curation.dsirWeights(raw, target).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val nTok = raw.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong)
      .toMap
    val order = w.toSeq.sortBy { case (id, s) => (-s, id) }
    val expect = order.scanLeft((-1L, 0L)) { case ((_, cum), (id, _)) =>
      (id, cum + nTok(id)) }.drop(1).takeWhile(_._2 <= budget)
      .map { case (id, cum) => (id, nTok(id), cum) }
    val got = Curation.dsirSelect(raw, target, budget)
      .orderBy(org.apache.spark.sql.functions.col("dsir_score").desc,
        org.apache.spark.sql.functions.col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
  }

  test("split: stable content-hash buckets in range, text-determined") {
    val s1 = Curation.split(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val s2 = Curation.split(docs.orderBy(org.apache.spark.sql.functions.rand(7)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(s1.toSet === s2.toSet) // row order never changes assignment
    assert(s1.forall { case (_, b, sp) =>
      b >= 0 && b < 100 &&
        sp == (if (b < 90) "train" else if (b < 95) "val" else "test")
    })
    // identical texts land in the same split (doc 0 and 1)
    val m = s1.map(t => t._1 -> t._3).toMap
    assert(m(0L) === m(1L))
  }

  test("splitLeakFree: clusters are split-homogeneous, singletons match split()") {
    val s = spark; import s.implicits._
    // 0-1-2 one near-dup chain, 3 a singleton, 4-5 byte-identical
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val frame = Seq(
      (0L, base), (1L, base + " mu"), (2L, base + " nu"),
      (3L, "completely different text with other words entirely here"),
      (4L, "twin text payload"), (5L, "twin text payload"))
      .toDF("doc_id", "text")
    val clusters = Dedup.clusters(frame, Dedup.minhashPairs(frame))
    val got = Curation.splitLeakFree(frame, clusters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    // law: every member of a cluster carries the cluster's split
    assert(got.values.groupBy(_._1).forall(_._2.map(_._2).toSet.size == 1))
    // dup chain stays together; twins stay together
    assert(got(0L)._2 === got(1L)._2 && got(1L)._2 === got(2L)._2)
    assert(got(4L)._2 === got(5L)._2)
    // a singleton's assignment equals the plain per-doc split
    val plain = Curation.split(frame).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(3L)._2 === plain(3L))
    // order-insensitivity (content-hash determinism end to end)
    val again = Curation.splitLeakFree(
      frame.orderBy(org.apache.spark.sql.functions.rand(3)),
      clusters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(again === got)
  }

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val old = spark.createDataFrame(Seq(
      (1L, "same text"), (2L, "will change"), (3L, "will vanish")))
      .toDF("doc_id", "text")
    val neu = spark.createDataFrame(Seq(
      (1L, "same text"), (2L, "has changed"), (4L, "brand new")))
      .toDF("doc_id", "text")
    val got = Curation.corpusDiff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("applyPatch: reconstructing v2 from v1 + the diff patch is exact") {
    val old = spark.createDataFrame(Seq(
      (1L, "same text"), (2L, "will change"), (3L, "will vanish")))
      .toDF("doc_id", "text")
    val neu = spark.createDataFrame(Seq(
      (1L, "same text"), (2L, "has changed"), (4L, "brand new")))
      .toDF("doc_id", "text")
    val patch = Curation.corpusDiff(old, neu)
      .filter(org.apache.spark.sql.functions.col("status") =!= "unchanged")
      .join(neu, Seq("doc_id"), "left")
      .select("doc_id", "status", "text")
    // the patch is SMALL: only the 3 non-unchanged rows ship
    assert(patch.count() === 3)
    val rebuilt = Curation.applyPatch(old, patch).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = neu.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt === want)
  }

  test("capPerSource: heap top-N equals the window-ranked reference") {
    val s = spark; import s.implicits._
    // 8 docs across 2 sources with distinct quality profiles
    val src = (0 until 8).map { i =>
      val text =
        if (i % 4 == 0) "tiny"
        else ((1 to (10 * i + 5)).map(j => s"w${i}_$j") :+ "the").mkString(" ")
      (i.toLong, text, if (i < 4) "a" else "b")
    }.toDF("doc_id", "text", "source")
    val got = Curation.capPerSource(src, 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    // window-ranked reference from curate's quality column
    val q = Curation.curate(src.select("doc_id", "text"))
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = src.select("doc_id", "source").collect()
      .map(r => (r.getString(1), r.getLong(0), q(r.getLong(0))))
      .groupBy(_._1).toSeq.flatMap { case (srcName, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(2).zipWithIndex
          .map { case ((sn, id, qv), i) => (sn, id, qv, i + 1L) }
      }.sortBy(t => (t._1, t._4))
    assert(got.toSeq === want)
    assert(got.count(_._1 == "a") === 2 && got.count(_._1 == "b") === 2)
  }

  test("capPerSource: quality ties break to the smaller doc_id") {
    val s = spark; import s.implicits._
    val twin = "the same text scored identically for both documents here"
    val src = Seq((7L, twin, "a"), (3L, twin, "a"), (12L, twin, "a"))
      .toDF("doc_id", "text", "source")
    val got = Curation.capPerSource(src, 2).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(3L, 7L))
  }

  test("curriculum: exact-rank quartiles, ascending-quality stages") {
    val s = spark; import s.implicits._
    // 8 docs with strictly ascending TTR ppm: stage = 2 docs each
    val docs = (0 until 8).map { i =>
      // i+1 distinct words out of 8 tokens -> score (i+1)*125000
      val words = (0 to i).map(k => s"w$k") ++ Seq.fill(7 - i)("w0")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Curation.curriculum(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.map(_._2).toSeq ===
      (1 to 8).map(i => i * 125000L)) // the score law
    assert(got.map(_._3).toSeq === Seq(1, 1, 2, 2, 3, 3, 4, 4))
    // higher score never lands in a lower stage
    got.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._3) }
    // all-tie corpus: one stage
    val tied = (0 until 6).map(i => (i.toLong, "x y")).toDF("doc_id", "text")
    assert(Curation.curriculum(tied).collect()
      .forall(_.getInt(2) === 1))
    // epoch_key is the portable doc_id hash: deterministic run to run
    val k1 = Curation.curriculum(docs).orderBy("doc_id")
      .collect().map(_.getLong(3)).toSeq
    val k2 = Curation.curriculum(docs).orderBy("doc_id")
      .collect().map(_.getLong(3)).toSeq
    assert(k1 === k2)
  }
}
