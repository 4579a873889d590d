package graft.operators

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
}
