package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ChunkingSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    val s = spark; import s.implicits._
    rows.toSeq.map { case (id, text, src) => (id, text, "en", src) }
      .toDF("doc_id", "text", "lang", "source")
  }

  test("chunks: overlapping windows cover every token, last may be short") {
    val d = docs((1L, "a b c d e f g", "w"), (2L, "x", "w"))
    val out = Chunking.chunks(d, chunk = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    // starts 0, 3, 6 for the 7-token doc; window 3 is the 1-token tail
    assert(out((1L, 0L)) === ((4L, "a b c d")))
    assert(out((1L, 1L)) === ((4L, "d e f g")))
    assert(out((1L, 2L)) === ((1L, "g")))
    // a 1-token doc yields exactly one 1-token chunk
    assert(out((2L, 0L)) === ((1L, "x")))
    assert(out.size === 4)
  }

  test("chunks: stride == chunk is an exact partition of the tokens") {
    val d = docs((1L, "a b c d e", "w"))
    val out = Chunking.chunks(d, chunk = 2, stride = 2).collect()
      .map(r => r.getString(3))
    assert(out.toSeq === Seq("a b", "c d", "e"))
  }

  test("dupStats: chunk duplicated across docs flags per occurrence") {
    // 4-token chunks: docs 1 and 2 share their first chunk exactly;
    // doc 3 repeats ITS OWN chunk twice (not a cross-doc dup)
    val d = docs(
      (1L, "a b c d e f g h", "w"),
      (2L, "a b c d q r s t", "w"),
      (3L, "m n o p m n o p", "w"))
    val out = Chunking.dupStats(d, chunk = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((2L, 1L))) // 2 chunks, first one duplicated
    assert(out(2L) === ((2L, 1L)))
    assert(out(3L) === ((2L, 0L))) // intra-doc repeat is NOT a dup
  }

  test("clean: cross-doc duplicated chunks drop from all carriers, order kept") {
    val d = docs(
      (1L, "a b c d e f g h", "w"),
      (2L, "a b c d q r s t", "w"),
      (3L, "a b c d a b c d", "w"))
    val out = Chunking.clean(d, chunk = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) === ((1L, "e f g h")))
    assert(out(2L) === ((1L, "q r s t")))
    // doc 3 is nothing but the shared chunk -> fully cleaned away
    assert(out(3L) === ((0L, "")))
  }

  test("pack: per-source running token count assigns start-bin") {
    // source w: 3 docs of 4 tokens; budget 8 -> starts 0,4,8 -> bins 0,0,1
    val d = docs(
      (1L, "a b c d", "w"), (2L, "e f g h", "w"), (3L, "i j k l", "w"),
      (10L, "z z z z z", "v")) // other source packs independently from 0
    val out = Chunking.pack(d, budget = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) === 0L)
    assert(out(2L) === 0L)
    assert(out(3L) === 1L)
    assert(out(10L) === 0L)
  }

  test("pack: two-level prefix sum is blockSize-invariant") {
    // blockSize larger than any doc_id puts every doc in block 0, which
    // degenerates to the naive one-window-per-source running sum; equal
    // output at blockSize 1 / 2 / huge proves the decomposition exact,
    // including across block boundaries and with sparse non-contiguous
    // ids (7L, 100L)
    val d = docs(
      (1L, "a b c", "w"), (2L, "d e f g h", "w"), (3L, "i", "w"),
      (7L, "j k l m", "w"), (100L, "n o", "w"),
      (4L, "z z z z z z", "v"), (5L, "y y y", "v"))
    def run(bs: Long) = Chunking.pack(d, budget = 5, blockSize = bs)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val big = run(1000000L)
    assert(run(1L) === big)
    assert(run(2L) === big)
    assert(run(4096L) === big)
  }

  test("rareBigramRate: corpus-frequency threshold, no-bigram docs rate 0") {
    // "a b" occurs 3x corpus-wide (not rare at maxCount=2); every other
    // bigram once (rare). Doc 3 has a single token -> 0 bigrams.
    val d = docs(
      (1L, "a b a b c", "w"), // bigrams: a b, b a, a b, b c -> rare: b a, b c
      (2L, "a b z", "w"),     // bigrams: a b, b z -> rare: b z
      (3L, "q", "w"))
    val out = Decontam.rareBigramRate(d, maxCount = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((4L, 2L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("paragraph dedup: cross-doc boilerplate drops, unique lines stay") {
    val d = spark.createDataFrame(Seq(
      (0L, "unique alpha line\ncookie notice here\nunique beta line"),
      (1L, "different body text\ncookie notice here"),
      (2L, "cookie notice here"),
      (3L, "entirely original page"),
      // within-doc repeat, no other doc carries it: kept twice
      (4L, "self repeated line\nself repeated line")))
      .toDF("doc_id", "text")
    val stats = Chunking.paragraphDupStats(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats(0L) === ((3L, 1L)))
    assert(stats(1L) === ((2L, 1L)))
    assert(stats(2L) === ((1L, 1L)))
    assert(stats(3L) === ((1L, 0L)))
    assert(stats(4L) === ((2L, 0L))) // distinct-DOC count is 1
    val clean = Chunking.paragraphClean(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(clean(0L) === ((2L, "unique alpha line\nunique beta line")))
    assert(clean(1L) === ((1L, "different body text")))
    assert(clean(2L) === ((0L, ""))) // pure boilerplate page empties
    assert(clean(4L) === ((2L, "self repeated line\nself repeated line")))
  }

  test("empty paragraphs are structure, not cross-doc boilerplate") {
    // both docs contain a blank line (consecutive separators) — it
    // must neither count as duplicated nor be stripped
    val d = spark.createDataFrame(Seq(
      (0L, "alpha one\n\nbeta two"),
      (1L, "gamma three\n\ndelta four")))
      .toDF("doc_id", "text")
    val stats = Chunking.paragraphDupStats(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats(0L) === ((3L, 0L)))
    assert(stats(1L) === ((3L, 0L)))
    val clean = Chunking.paragraphClean(d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(clean(0L) === "alpha one\n\nbeta two") // blank line survives
    assert(clean(1L) === "gamma three\n\ndelta four")
  }
}
