package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LangIdSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang")

  test("charGrams: 1-based positions, short docs yield empty not descending") {
    val got = docs((0L, "abcd", "x"), (1L, "ab", "x"), (2L, "", "x"))
      .select(col("doc_id"), LangId.charGrams(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L) === Seq("abc", "bcd"))
    assert(got(1L) === Seq.empty)
    assert(got(2L) === Seq.empty)
  }

  test("trained NB separates distinct character distributions") {
    // class A lives on 'aaa...' grams, class B on 'zzz...' grams;
    // a held-out doc drawn from A's distribution must score A
    val seed = docs(
      (0L, "aaabbbaaabbb", "A"), (5L, "aaabbbaaaabb", "A"),
      (10L, "zzzyyyzzzyyy", "B"), (15L, "zzzyyyzzzzyy", "B"))
    val m = LangId.train(seed)
    val test = docs((100L, "aaabbbaab", "?"), (101L, "zzzyyyzzy", "?"))
    val pred = LangId.predict(test, m).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(100L -> "A", 101L -> "B"))
  }

  test("weak-label quality classes: separable keep/drop signal fully recovered") {
    // the classifier-based quality filter's shape (quality_nb_score):
    // the label column is keep/drop, not a language — the generic NB
    // must recover a clean marker signal at 100% on held-out docs
    val rnd = new scala.util.Random(5)
    def soup() = Seq.fill(10)("w" + rnd.nextInt(50)).mkString(" ")
    val all = docs((0L until 40L).map { i =>
      val keep = i % 2 == 0
      val marker = if (keep) " excellent wellformed prose paragraph"
        else " garbled spam noise fragment"
      (i, soup() + marker, if (keep) "keep" else "drop")
    }: _*)
    val m = LangId.train(all.filter(col("doc_id") % 5 === 0))
    val got = LangId.predict(all, m).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 40L).foreach { i =>
      assert(got(i) === (if (i % 2 == 0) "keep" else "drop"), s"doc $i")
    }
  }

  test("predictRowwise equals predict exactly — incl. prior-only docs and tie-breaks") {
    // two classes trained on SAME-LENGTH texts → equal class gram
    // counts → equal floors; equal seed sizes → equal priors. The
    // sub-n doc then scores prior-only in BOTH classes — an exact tie
    // the two argmax implementations must break identically (lang ASC)
    val seed = docs(
      (0L, "aaaaaaaaaa", "alpha"), (1L, "aaaaaaaaaa", "alpha"),
      (2L, "zzzzzzzzzz", "beta"), (3L, "zzzzzzzzzz", "beta"))
    val m = LangId.train(seed)
    val probe = docs(
      (10L, "aaaaaaa", "x"), (11L, "zzzzz", "x"),
      (12L, "qq", "x"),  // shorter than n=3: prior-only, exact tie
      (13L, "", "x"),    // empty: same
      (14L, "aazz", "x"))
    val viaWindow = LangId.predict(probe, m).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val rowwise = LangId.predictRowwise(probe, m).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rowwise === viaWindow)
    assert(rowwise.find(_._1 == 12L).get._2 === "alpha") // tie → lang ASC
  }

  test("wordFeats: word buckets land in the disjoint [buckets, " +
    "2*buckets) range; char buckets stay below") {
    val seed = docs((0L, "abc def ghi", "A"), (1L, "zzz yyy", "B"))
    val m = LangId.train(seed, wordFeats = true)
    assert(m.wordFeats && m.totalBuckets === 2 * m.buckets)
    val bs = m.delta.select("b").collect().map(_.getLong(0))
    assert(bs.forall(b => b >= 0 && b < 2L * m.buckets))
    assert(bs.exists(_ >= m.buckets), "no word-range features trained")
    assert(bs.exists(_ < m.buckets), "no char-range features trained")
    val m0 = LangId.train(seed)
    assert(!m0.wordFeats &&
      m0.delta.select("b").collect().map(_.getLong(0))
        .forall(_ < m0.buckets))
  }

  test("wordFeats: predictRowwise equals predict exactly — incl. " +
    "sub-n and empty docs (which still carry word evidence)") {
    val seed = docs(
      (0L, "the cat sat", "alpha"), (1L, "the dog ran", "alpha"),
      (2L, "zq xv wk", "beta"), (3L, "zq pf mm", "beta"))
    val m = LangId.train(seed, wordFeats = true)
    val probe = docs(
      (10L, "the cat ran", "x"), (11L, "zq wk", "x"),
      (12L, "qq", "x"), // shorter than n=3: word unigram only
      (13L, "", "x"),   // empty: one empty-token word feature
      (14L, "the zq", "x"))
    def out(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val viaWindow = out(LangId.predict(probe, m))
    assert(out(LangId.predictRowwise(probe, m)) === viaWindow)
    // every probe doc is scored (no doc drops out of the feature walk)
    assert(viaWindow.map(_._1).toSeq === Seq(10L, 11L, 12L, 13L, 14L))
  }

  test("wordFeats separates word-identity classes: shared-character " +
    "vocab, class-specific words") {
    // both classes draw from the same character soup, so char
    // trigrams overlap heavily; the WORDS are class-specific
    val seed = docs(
      (0L, "abab baba abab", "A"), (1L, "abab abab baba", "A"),
      (2L, "aabb bbaa aabb", "B"), (3L, "aabb aabb bbaa", "B"))
    val m = LangId.train(seed, wordFeats = true)
    val pred = LangId.predict(
      docs((100L, "abab baba", "?"), (101L, "bbaa aabb", "?")), m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(100L -> "A", 101L -> "B"))
  }

  test("persisted() model predicts identically (the composition contract)") {
    val seed = docs(
      (0L, "aaabbbaaabbb", "A"), (5L, "aaabbbaaaabb", "A"),
      (10L, "zzzyyyzzzyyy", "B"), (15L, "zzzyyyzzzzyy", "B"))
    val test = docs((100L, "aaabbbaab", "?"), (101L, "zzzyyyzzy", "?"))
    val m = LangId.train(seed)
    val p = m.persisted()
    try {
      assert(p.buckets === m.buckets && p.n === m.n)
      val a = LangId.predict(test, m).collect().map(_.toString).sorted
      val b = LangId.predict(test, p).collect().map(_.toString).sorted
      assert(a.toSeq === b.toSeq)
    } finally { p.delta.unpersist(); p.langStats.unpersist() }
  }

  test("persisted() carries wordFeats: a v2 model round-trips the " +
    "flag and both predict paths score identically through it") {
    val seed = docs(
      (0L, "red apple pie", "A"), (5L, "red apple tart", "A"),
      (10L, "blue delta wave", "B"), (15L, "blue delta ray", "B"))
    val test = docs((100L, "red apple wave", "?"), (101L, "blue delta pie", "?"))
    val m = LangId.train(seed, wordFeats = true)
    val p = m.persisted()
    try {
      assert(p.wordFeats && p.totalBuckets === m.totalBuckets)
      val a = LangId.predict(test, m).collect().map(_.toString).sorted
      val b = LangId.predict(test, p).collect().map(_.toString).sorted
      assert(a.toSeq === b.toSeq)
      // the rowwise LUT sizes off totalBuckets — with the flag dropped
      // this threw ArrayIndexOutOfBounds on the word-range rows
      val c = LangId.predictRowwise(test, p).collect().map(_.toString).sorted
      assert(a.toSeq === c.toSeq)
    } finally { p.delta.unpersist(); p.langStats.unpersist() }
  }

  test("scores: prior + G*floor + sum(delta) with exact integers") {
    val seed = docs((0L, "abcabc", "A"), (1L, "abcabc", "B"))
    val m = LangId.train(seed)
    // equal training text: only priors (equal) and shared deltas —
    // every test doc ties, and ties break lang ASC
    val pred = LangId.predict(docs((9L, "abc", "?")), m).collect()
    assert(pred.head.getString(1) === "A")
    // scores for both classes are identical integers
    val sc = LangId.scores(docs((9L, "abc", "?")), m).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(sc("A") === sc("B"))
  }

  test("document shorter than n scores prior only (G=0, no hits)") {
    val seed = docs((0L, "aaaa", "A"), (1L, "bbbb", "B"), (2L, "bbbb", "B"))
    val m = LangId.train(seed)
    // B has the larger prior (2 of 3 seed docs) — an uninformative
    // doc must fall back to it
    val pred = LangId.predict(docs((7L, "xy", "?")), m).collect()
    assert(pred.head.getString(1) === "B")
  }

  test("bucket count rides with the model (no silent mismatch possible)") {
    val seed = docs((0L, "aaaa", "A"))
    val m = LangId.train(seed, buckets = 64)
    assert(m.buckets === 64)
    // scoring uses the model's own bucket count — same prediction
    // regardless of any ambient default
    val p = LangId.predict(docs((1L, "aaaa", "?")), m).collect()
    assert(p.head.getString(1) === "A")
  }

  test("gram-less seed still trains: every labeled class keeps a floor " +
    "(the LangIdProps degenerate corpus)") {
    // every seed doc is shorter than n=3 → zero gram rows; before the
    // round-16 fix langStats came out EMPTY (inner join on gram-
    // bearing classes) and scores built unparseable stack(0,) SQL
    val seed = docs((0L, "h", "keep"), (5L, "", "junk"))
    val m = LangId.train(seed)
    val stats = m.langStats.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(stats.map(_._1).toSeq === Seq("junk", "keep"))
    // cl = 0 → floor = round(-ln(1024)·1e6) for both classes
    val expFloor = math.round(-math.log(1024.0) * 1e6)
    assert(stats.forall(_._3 === expFloor))
    // predict and predictRowwise agree on a mixed corpus (the
    // LangIdProps law, deterministic instance)
    val corpus = docs((1L, "wnozvxzw", "?"), (2L, "", "?"), (3L, "k", "?"))
    def out(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out(LangId.predict(corpus, m)) ===
      out(LangId.predictRowwise(corpus, m)))
    // ties on equal priors (1 doc each) break lang ASC → "junk"
    assert(out(LangId.predict(corpus, m)).forall(_._2 === "junk"))
  }

  test("scores on an empty-seed model fails loudly, not in the SQL parser") {
    val m = LangId.train(docs((0L, "abcdef", "x")).filter(col("doc_id") < 0))
    val ex = intercept[IllegalArgumentException] {
      LangId.predict(docs((1L, "abc", "?")), m).collect()
    }
    assert(ex.getMessage.contains("no classes"))
  }
}
