package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RetrievalSpec extends AnyFunSuite with SparkSpec {

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("postings: tf counts multiplicity, len is the token count") {
    val p = Retrieval.postings(df((1L, "cat cat dog"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    // two terms: cat tf=2, dog tf=1; len 3 on both rows
    assert(p.map(_._2).toSet === Set(3L))
    assert(p.map(_._3).sorted.toSeq === Seq(1L, 2L))
  }

  test("bm25: rare-term match outranks common-term match, ties on doc_id") {
    val corpus = df(
      (1L, "cat sat here"), // matches 'cat' (rare: df=1)
      (2L, "dog ran far"), // matches 'dog' (common: df=3)
      (3L, "dog dog dog"), // more dog mass but same idf
      (4L, "dog naps a lot"),
      (5L, "zebra only words"))
    val q = df((100L, "cat dog"))
    val got = Retrieval.bm25TopK(q, corpus, k = 5).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 5 shares nothing -> absent
    assert(!got.map(_._1).contains(5L))
    // idf(cat) [df=1] > idf(dog) [df=3], same tf/len shape -> doc 1 first
    assert(got.head._1 === 1L)
    // ranks are a dense 1..n sequence
    assert(got.map(_._3).toSeq === (1L to got.length).toSeq)
    // doc 3 (tf=3, len=3) beats docs 2/4 (tf=1): tf saturation raises
    // but never inverts a same-term score at equal idf
    val byDoc = got.map(g => g._1 -> g._2).toMap
    assert(byDoc(3L) > byDoc(2L))
    assert(byDoc(2L) > 0L)
    // scores are exact integers and stable across runs
    val again = Retrieval.bm25TopK(q, corpus, k = 5).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === got.toSeq)
  }

  test("bm25: df cap drops boilerplate terms from the index") {
    // 'the' appears in ALL 5 corpus docs (df = 5 = 100% > 90% cap);
    // 'cat' in one. A query of only capped terms matches nothing.
    val corpus = df(
      (1L, "the cat"), (2L, "the dog"), (3L, "the bird"),
      (4L, "the fish"), (5L, "the newt"))
    val onlyCapped = Retrieval.bm25TopK(df((10L, "the")), corpus)
    assert(onlyCapped.count() === 0L)
    // mixed query still scores via the rare term, and the capped term
    // contributes nothing: doc 1 is the only match
    val got = Retrieval.bm25TopK(df((11L, "the cat")), corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((11L, 1L)))
    // cap disabled (1000 permille): 'the' matches every doc
    val uncapped =
      Retrieval.bm25TopK(df((12L, "the")), corpus, k = 9,
        maxDfPermille = 1000)
    assert(uncapped.count() === 5L)
  }

  test("bm25Screen batch twin: per-hit contributions sum to the ranker's score") {
    val corpus = df((1L, "cat sat here"), (2L, "dog ran far"),
      (3L, "dog dog dog"), (4L, "dog naps a lot"), (5L, "zebra only words"))
    val q = df((100L, "cat dog"))
    val idx = Retrieval.bm25Index(corpus)
    val hits = graft.streaming.DocStreams.bm25Screen(q, idx)
    val summed = hits.groupBy("query_id", "doc_id")
      .agg(org.apache.spark.sql.functions.sum("c").as("score"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val ranked = Retrieval.bm25TopK(q, corpus, k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(summed === ranked)
  }

  test("bm25: pinned closed-form scores — term == idf at tf=1, len=avgdl") {
    // Corpus engineered so avgdl is exact: lengths 3+6+2+1 = 12 over
    // N = 4 docs -> adl = (100*12) div 4 = 300 centi-tokens. 'cat'
    // appears once in d1 (len 3 = avgdl) and d2 (len 6 = 2*avgdl);
    // df = 2 survives the 900-permille cap (2000 <= 3600).
    //   idf(cat) = round(1e6*(ln(2*4+2) - ln(2*2+1)))
    //            = round(1e6*ln 2) = 693147
    //   d1: dln = (9000*3) div 300 = 90
    //       score = (693147*220*1) div (100*1 + 30 + 90)
    //             = 152492340 div 220 = 693147  — exactly idf: the
    //       documented Okapi identity at tf=1, len=avgdl. Any drift
    //       in the dln constant (e.g. the round-12 90000 regression,
    //       dln=900 -> 148050) fails this law in-repo, not only at
    //       the oracle gate.
    //   d2: dln = (9000*6) div 300 = 180
    //       score = 152492340 div 310 = 491910 (trunc)
    val corpus = df(
      (1L, "cat aa bb"),
      (2L, "cat aa bb cc dd ee"),
      (3L, "xx yy"),
      (4L, "zz"))
    val got = Retrieval.bm25TopK(df((100L, "cat")), corpus, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 693147L, 1L), (2L, 491910L, 2L)))
  }

  test("rrfFuse: hand-computed fusion, integer-exact, ties to lower neighbor") {
    def ranks(rows: (Long, Long, Long)*) =
      spark.createDataFrame(rows).toDF("query_id", "neighbor_id", "rank")
    // contributions at kRrf=60: rank1 -> 10^6//61 = 16393,
    // rank2 -> 16129, rank3 -> 15873
    val a = ranks((10L, 1L, 1L), (10L, 2L, 2L), (10L, 3L, 3L))
    val b = ranks((10L, 2L, 1L), (10L, 1L, 2L), (10L, 4L, 3L))
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // n1 = n2 = 16393 + 16129 = 32522 (cross-list tie -> neighbor asc);
    // n3 = n4 = 15873 single-list (tie again; n3 takes rank 3, n4 cut)
    assert(got.toSeq === Seq(
      (10L, 1L, 32522L, 1L), (10L, 2L, 32522L, 2L), (10L, 3L, 15873L, 3L)))
    // per-query isolation: a second query fuses independently
    val c = ranks((10L, 1L, 1L), (20L, 7L, 1L))
    val two = Retrieval.rrfFuse(Seq(c), k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(two.toSeq === Seq((10L, 1L, 16393L), (20L, 7L, 16393L)))
  }

  test("hardNegatives: near-duplicate candidates never ship as negatives") {
    // query 100 is byte-identical to doc 1 -> identical minhash
    // signature -> every band collides -> doc 1 is screened even
    // though it is the top BM25 hit; docs 2/3 are lexically close
    // (hard) but distinct
    val corpus = df(
      (1L, "cat sat on the mat today"),
      (2L, "cat sat near a mat"),
      (3L, "dog sat on grass"))
    val q = df((100L, "cat sat on the mat today"))
    val got = Retrieval.hardNegatives(q, corpus, k = 3).collect()
      .map(r => r.getLong(1)).toSeq
    assert(!got.contains(1L), s"duplicate shipped as negative: $got")
    assert(got.nonEmpty, "screen dropped every candidate")
    // and with no duplicate in the corpus the screen passes BM25's
    // ranking through unchanged
    val clean = Retrieval.hardNegatives(df((200L, "zebra runs")), corpus
      .union(df((4L, "zebra walks"))), k = 3).collect()
      .map(r => r.getLong(1)).toSeq
    assert(clean === Seq(4L))
  }

  test("hardNegatives: stored index + signatures reproduce the in-plan build") {
    // the amortization hooks must be result-invisible: a pre-built
    // bm25Index and a pre-mined corpus signature frame (here passed
    // directly; in deployment read back from parquet — exact integer
    // frames either way) yield byte-identical negatives
    val corpus = df(
      (1L, "cat sat on the mat today"),
      (2L, "cat sat near a mat"),
      (3L, "dog sat on grass"))
    val q = df((100L, "cat sat on the mat today"))
    def rows(got: org.apache.spark.sql.DataFrame) =
      got.collect().map(_.toString).toSeq
    val inPlan = rows(Retrieval.hardNegatives(q, corpus, k = 3))
    val reused = rows(Retrieval.hardNegatives(q, corpus, k = 3,
      index = Some(Retrieval.bm25Index(corpus)),
      corpusSigs = Some(Dedup.minhashSignatures(corpus))))
    assert(reused === inPlan)
  }

  test("bm25: per-query isolation — each query ranks its own matches") {
    val corpus = df((1L, "alpha beta"), (2L, "gamma delta"))
    val q = df((10L, "alpha"), (20L, "gamma"))
    val got = Retrieval.bm25TopK(q, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 1L), (20L, 2L)))
  }

  test("phrase: counts every start position, overlaps included") {
    val corpus = df(
      (1L, "a b a b a"), // "a b a" occurs at pos 1 and 3 (overlapping)
      (2L, "a b c a b a"), // once, at pos 4
      (3L, "b a b a b"), // once, at pos 2
      (4L, "a a a"), // zero — 'b' never in the middle
      (5L, "a b")) // shorter than the phrase: guard path, zero
    val got = Retrieval.phraseCounts(corpus, Seq("a", "b", "a")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("phrase: single-token phrase counts plain term frequency") {
    val got = Retrieval
      .phraseCounts(df((1L, "x y x"), (2L, "y")), Seq("x")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 2L))
  }

  test("phraseTopK: ordered by count desc then doc_id, limit honored") {
    val corpus = df(
      (9L, "p q p q"), // 1 occurrence of "p q p"... no: pos1 only
      (2L, "p q p q p"), // pos 1 and 3 -> 2
      (5L, "p q p")) // 1
    val got = Retrieval.phraseTopK(corpus, Seq("p", "q", "p"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 2L), (5L, 1L)))
    // rejects malformed phrase tokens before touching the plan
    intercept[IllegalArgumentException] {
      Retrieval.phraseCounts(corpus, Seq("p q"))
    }
    intercept[IllegalArgumentException] {
      Retrieval.phraseCounts(corpus, Seq.empty)
    }
  }
}
