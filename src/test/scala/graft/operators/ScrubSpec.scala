package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ScrubSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.createDataFrame(Seq(
    (0L, "mail me at jo.doe+spam@sub.example.org today"),
    (1L, "call 555-867-5309 or 555-123-4567 now"),
    (2L, "server at 192.168.0.1 and backup 10.0.0.255"),
    (3L, "clean text with no pii at all"),
    (4L, "mixed a@b.io then 555-000-1111 then 8.8.8.8"),
    (5L, "")))
    .toDF("doc_id", "text")

  test("scrubPii counts each class on the original text") {
    val got = Scrub.scrubPii(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Array(
      (0L, 1L, 0L, 0L), (1L, 0L, 2L, 0L), (2L, 0L, 0L, 2L),
      (3L, 0L, 0L, 0L), (4L, 1L, 1L, 1L), (5L, 0L, 0L, 0L)))
  }

  test("redaction replaces every match with its class tag") {
    val clean = Scrub.scrubPii(docs).orderBy("doc_id").collect()
      .map(_.getString(5))
    assert(clean(0) === "mail me at <EMAIL> today")
    assert(clean(1) === "call <PHONE> or <PHONE> now")
    assert(clean(2) === "server at <IP> and backup <IP>")
    assert(clean(4) === "mixed <EMAIL> then <PHONE> then <IP>")
  }

  test("pii-free text passes through byte-identical") {
    val clean = Scrub.scrubPii(docs).orderBy("doc_id").collect()
      .map(_.getString(5))
    assert(clean(3) === "clean text with no pii at all")
    assert(clean(5) === "")
  }

  test("phone and ip word boundaries: digit runs inside words don't match") {
    val tricky = spark.createDataFrame(Seq(
      // no \b match: digits flush against letters
      (0L, "id ab555-123-4567cd and v1.2.3.4beta"),
      // punctuation IS a boundary: parenthesized ip and dotted sentence end
      (1L, "see (10.1.2.3) and call 555-123-4567.")))
      .toDF("doc_id", "text")
    val got = Scrub.scrubPii(tricky).orderBy("doc_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got(0) === ((0L, 0L, 0L, "id ab555-123-4567cd and v1.2.3.4beta")))
    assert(got(1) === ((0L, 1L, 1L, "see (<IP>) and call <PHONE>.")))
  }
}
