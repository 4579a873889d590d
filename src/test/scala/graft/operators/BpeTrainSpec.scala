package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BpeTrainSpec extends AnyFunSuite with SparkSpec {

  private def df(texts: String*) =
    spark.createDataFrame(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t) }).toDF("doc_id", "text")

  test("learns the classic merge sequence on a hand corpus") {
    // vocab: low ×2 (one doc has it twice), lower, lowest — 'l','o'
    // is the most frequent adjacent pair (4), then 'lo','w' (4 after
    // merge 1), then 'e' pairs
    val docs = df("low low lower", "lowest low")
    val got = BpeTrain.learnMerges(docs, nMerges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got(0) === ((1L, "l", "o", "lo", 5L)))
    assert(got(1) === ((2L, "lo", "w", "low", 5L)))
    // after [lo][w]: low=[low], lower=[low,e,r], lowest=[low,e,s,t]
    // pairs: (low,e)x2, (e,r)x1, (e,s)x1, (s,t)x1
    assert(got(2) === ((3L, "low", "e", "lowe", 2L)))
  }

  test("ties break on (count desc, left, right) binary order") {
    // 'ab' and 'ba' pairs both occur twice ('abab'); 'ab' < 'ba'
    val got = BpeTrain.learnMerges(df("abab abab"), nMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // pairs in 'abab': (a,b)x2, (b,a)x1 per word, freq 2 → ab=4, ba=2
    assert(got(0) === (("a", "b", 4L)))
  }

  test("back-to-back pairs merge left-to-right, non-overlapping") {
    // 'aaaa' with merge (a,a): greedy gives [aa][aa], so round 2's
    // top pair is (aa,aa)
    val got = BpeTrain.learnMerges(df("aaaa"), nMerges = 2).collect()
      .map(r => (r.getString(3), r.getLong(4)))
    assert(got(0) === (("aa", 3L))) // positional count in a-a-a-a
    assert(got(1) === (("aaaa", 1L)))
  }

  test("minFreq prunes the vocabulary before the loop") {
    val docs = df("zz zz zz qq")
    // qq appears once; with minFreq=2 only zz trains
    val got = BpeTrain.learnMerges(docs, nMerges = 1, minFreq = 2L)
      .collect().map(r => r.getString(3))
    assert(got(0) === "zz")
  }

  test("auto minFreq is corpus-derived and provably bounds the collect") {
    val docs = df("zz zz zz qq")
    // a caller-FORCED minFreq below the bound still trips the guard
    val e = intercept[IllegalArgumentException] {
      BpeTrain.learnMerges(docs, nMerges = 1, minFreq = 1L, maxVocab = 1)
    }
    assert(e.getMessage.contains("maxVocab"))
    // auto at the same cap: minFreq = ceil(4/1) = 4 → empty vocab →
    // loud exhaustion, never an oversized collect
    val e2 = intercept[IllegalArgumentException] {
      BpeTrain.learnMerges(docs, nMerges = 1, maxVocab = 1)
    }
    assert(e2.getMessage.contains("exhausted"))
    // auto at a sane cap degenerates to minFreq = 1 — unpruned
    val auto = BpeTrain.learnMerges(docs, nMerges = 1).collect()
    assert(auto(0).getString(3) === "zz")
  }

  test("learnWithTokenization exposes the trainer's final word state") {
    val docs = df("low low lower", "lowest low")
    // after merges (l,o) and (lo,w): low=[low], lower=[low,e,r],
    // lowest=[low,e,s,t]
    val (_, tok) = BpeTrain.learnWithTokenization(docs, nMerges = 2)
    val got = tok.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("low" -> 1L, "lower" -> 3L, "lowest" -> 4L))
  }

  test("incremental pair maintenance equals a full recount, 30 merges") {
    // naive reference: recount every pair over the whole vocab per
    // merge (the pre-r10 implementation) — the incremental trainer
    // must produce the identical merge table
    def naive(wf: Seq[(String, Long)], nMerges: Int)
        : Seq[(Long, String, String, String, Long)] = {
      var words = wf.map { case (w, f) =>
        (w.split("").filter(_.nonEmpty), f) }
      val out = scala.collection.mutable
        .ArrayBuffer[(Long, String, String, String, Long)]()
      for (rank <- 1 to nMerges) {
        val cnt = scala.collection.mutable.Map[(String, String), Long]()
        words.foreach { case (ts, f) =>
          var i = 0
          while (i + 1 < ts.length) {
            val k = (ts(i), ts(i + 1))
            cnt(k) = cnt.getOrElse(k, 0L) + f; i += 1
          }
        }
        val ((l, r), c) = cnt.toSeq.minBy { case ((pl, pr), pc) =>
          (-pc, pl, pr) }
        out += ((rank.toLong, l, r, l + r, c))
        words = words.map { case (ts, f) =>
          val o = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < ts.length) {
            if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
              o += l + r; i += 2
            } else { o += ts(i); i += 1 }
          }
          (o.toArray, f)
        }
      }
      out.toSeq
    }
    val texts = Seq(
      "the theme therefore then an anthem hem stem stem",
      "low lower lowest low low slow slowest",
      "abab baba aabb bbaa abba baab",
      "the the the an an hem slow")
    val docs = df(texts: _*)
    val wf = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }.toSeq
    val want = naive(wf, 30)
    val got = BpeTrain.learnMerges(docs, nMerges = 30).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === want)
  }
}
