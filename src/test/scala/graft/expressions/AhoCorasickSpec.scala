package graft.expressions

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AhoCorasickSpec extends AnyFunSuite with SparkSpec {

  private def count(terms: Seq[String], text: String): Long =
    AhoCorasick.build(terms).countHits(UTF8String.fromString(text))

  /** Independent quadratic reference: every (position, term) pair. */
  private def ref(terms: Seq[String], text: String): Long =
    terms.map { t =>
      (0 to text.length - t.length).count(i => text.startsWith(t, i)).toLong
    }.sum

  test("the classic ushers vector: she, he, hers all end in one walk") {
    val terms = Seq("he", "she", "his", "hers")
    assert(count(terms, "ushers") === 3L) // she@4, he@4, hers@6
    assert(count(terms, "ushers") === ref(terms, "ushers"))
  }

  test("overlapping and nested matches all count") {
    assert(count(Seq("aa"), "aaaa") === 3L)   // positions 2,3,4
    assert(count(Seq("the", "he"), "the the") === 4L)
    assert(count(Seq("a", "aa", "aaa"), "aaa") === 6L) // 3+2+1
    // duplicate terms carry multiplicity
    assert(count(Seq("x", "x"), "xx") === 4L)
  }

  test("fail transitions restart mid-pattern, not at the root") {
    // scanning "ababc" for "ababc" and "babc": partial-match fallback
    // must keep the live "babc" suffix
    val terms = Seq("ababc", "babc")
    assert(count(terms, "abababc") === 2L)
    assert(count(terms, "abababc") === ref(terms, "abababc"))
  }

  test("matches the quadratic reference on random soups") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    val terms = Seq("a", "ab", "ba", "abc", "cab", "bb", "aab")
    (1 to 50).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(count(terms, text) === ref(terms, text), s"text=$text")
    }
  }

  test("empty text, no match, unicode terms; empty blocklist refused") {
    assert(count(Seq("zzz"), "") === 0L)
    assert(count(Seq("zzz"), "aaa") === 0L)
    assert(count(Seq("дд"), "ддд") === 2L)
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("")))
  }

  private def scrub(terms: Seq[String], text: String): String =
    BlocklistTrie.build(terms, "<T>")
      .scrub(UTF8String.fromString(text)).toString

  test("blocklist scrub: leftmost-longest greedy, non-overlapping") {
    // same start: longest wins
    assert(scrub(Seq("the", "theme"), "theme park") === "<T> park")
    // earlier start wins even against a longer later match
    assert(scrub(Seq("she", "hers"), "ushers") === "u<T>rs")
    // consumed input never rematches (non-overlapping)
    assert(scrub(Seq("aa"), "aaa") === "<T>a")
    // no match: identity; unicode
    assert(scrub(Seq("zz"), "abc") === "abc")
    assert(scrub(Seq("дд"), "ддд") === "<T>д")
  }

  test("blocklist scrub equals the longest-first regex alternation") {
    val terms = Seq("a", "ab", "ba", "abc", "cab", "bb", "aab")
    val pattern = terms.sortBy(-_.length).mkString("|")
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(60))("abc"(rnd.nextInt(3))).mkString
      assert(scrub(terms, text) === text.replaceAll(pattern, "<T>"),
        s"text=$text")
    }
  }

  test("the column route runs inside a plan (codegen reference object)") {
    val got = spark.createDataFrame(Seq((1L, "the theme"), (2L, "no hit")))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        BlocklistExpressions.blocklistHits(col("text"),
          Seq("the", "he", "theme")).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // "the theme": the@1, he@1, the@5, he@5, theme@5 -> 5
    assert(got.toSeq === Seq((1L, 5L), (2L, 0L)))
  }
}
