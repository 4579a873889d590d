package graft.expressions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BpeSpec extends AnyFunSuite with SparkSpec {

  test("word-level merge walk follows rank order to the fixpoint") {
    // 'vector': (o,r) → (c,t) → (ct,or) → (e,ctor) → (v,ector) → 1 token
    assert(Bpe.wordTokenCount("vector") == 1)
    // 'orderkey': (o,r), (e,r), (d,er), (or,der) then stuck → 4 tokens
    assert(Bpe.wordTokenCount("orderkey") == 4)
    // no applicable merges → one token per code point
    assert(Bpe.wordTokenCount("xyz") == 3)
    assert(Bpe.wordTokenCount("q") == 1)
    assert(Bpe.wordTokenCount("") == 0)
  }

  test("first-occurrence-of-best-rank equals the all-occurrences apply") {
    // 'inin': rank-1 (i,n) twice; one-at-a-time must land on [in, in]
    assert(Bpe.wordTokenCount("inin") == 2)
    // 'ererer': (e,r) three times, no (er,er) merge learned → 3
    assert(Bpe.wordTokenCount("ererer") == 3)
  }

  test("document count sums words under the single-space convention") {
    import org.apache.spark.unsafe.types.UTF8String
    assert(Bpe.count(UTF8String.fromString("vector orderkey xyz")) == 8L)
    // consecutive spaces yield empty words, which count zero
    assert(Bpe.count(UTF8String.fromString("vector  vector")) == 2L)
    assert(Bpe.count(UTF8String.fromString("")) == 0L)
  }

  test("expression evaluates in a DataFrame (codegen path)") {
    val s = spark
    import s.implicits._
    val got = Seq((0L, "vector orderkey"), (1L, ""), (2L, "join join"))
      .toDF("doc_id", "text")
      .select($"doc_id", BpeExpressions.bpeCount($"text").as("n"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 'join': (j,o) → (jo,in)... (i,n) rank 1 first: [j,o,in] → (j,o)
    // rank 10 → [jo,in] → (jo,in) rank 11 → [join] → 1 token
    assert(got === Seq((0L, 5L), (1L, 0L), (2L, 2L)))
  }

  test("fertility aggregate: per-myriad tokens-per-word, hand values") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // 'join join' -> 2 BPE tokens over 2 words (fertility 10000);
    // 'vector orderkey' -> 5 tokens over 2 words (25000); one lang each
    val got = Seq(("aa", "join join"), ("bb", "vector orderkey"))
      .toDF("lang", "text")
      .select($"lang", BpeExpressions.bpeCount($"text").as("n_tok"),
        size(split($"text", " ")).cast("long").as("n_words"))
      .groupBy("lang")
      .agg(call_function("div", sum($"n_tok") * lit(10000L),
        sum($"n_words")).as("fertility_pm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("aa" -> 10000L, "bb" -> 25000L))
  }
}
