package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextFunctionsSpec extends AnyFunSuite with SparkSpec {
  import TextFunctions._

  private def run1(text: String, c: org.apache.spark.sql.Column): Any =
    spark.createDataFrame(Seq(Tuple1(text))).toDF("text")
      .select(c).head().get(0)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shingles2 builds adjacent word pairs, empty below 2 tokens") {
    assert(run1("a b c", shingles2(col("text"))) === Seq("a b", "b c"))
    assert(run1("solo", shingles2(col("text"))) === Seq())
  }

  test("wordHash matches an independent md5-prefix computation") {
    val expected = java.lang.Long.parseLong(md5hex("alpha").take(8), 16)
    assert(run1("alpha", wordHash(col("text"))) === expected)
  }

  test("fingerprint is the left fold of word hashes and is order-sensitive") {
    def h(w: String) = java.lang.Long.parseLong(md5hex(w).take(8), 16)
    val expected = ((0L * 131 + h("a")) % 1000000007L * 131 + h("b")) % 1000000007L
    assert(run1("a b", fingerprint(col("text"))) === expected)
    assert(run1("a b", fingerprint(col("text"))) !==
      run1("b a", fingerprint(col("text"))))
  }

  test("markerHits counts occurrences, not distinct hits") {
    assert(run1("the cat the hat", markerHits(col("text"),
      langMarkers.head._2)) === 2L)
  }

  test("langPredict picks the max-scoring language, en on all-zero") {
    assert(run1("der die das und", langPredict(col("text"))) === "de")
    assert(run1("el la los y", langPredict(col("text"))) === "es")
    assert(run1("qqq www", langPredict(col("text"))) === "en")
  }
}
