package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The synthesis invariants SCALING.md's measurements rest on: k×
  * replication must preserve each replica's internal duplicate
  * structure exactly (so pair density stays constant under growth)
  * while keeping replica ID ranges disjoint.
  */
class ScalingBenchSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, "a b c d", "en", "web", 7L),
      (1L, "a b c d", "en", "web", 7L), // exact dup of 0
      (2L, "a b c x", "en", "web", 7L), // near dup of 0/1
      (3L, "p q r s t", "de", "book", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private lazy val embs = {
    val s = spark; import s.implicits._
    Seq(
      (0L, Array(0.6f, 0.8f, 0.0f), 1),
      (1L, Array(0.8f, 0.6f, 0.0f), 1),
      (2L, Array(0.0f, 0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
  }

  test("scaleDocuments: k× rows, disjoint ids, schema preserved") {
    val out = ScalingBench.scaleDocuments(docs, 3)
    assert(out.count() === 12)
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.select("doc_id").distinct().count() === 12)
    // replica 0 is the base corpus verbatim
    assert(out.filter(col("doc_id") < 10000000L).except(docs).isEmpty)
  }

  test("scaleDocuments preserves intra-replica pair structure exactly") {
    val out = ScalingBench.scaleDocuments(docs, 3)
    // exact-dup groups replicate: 3 replicas × (one dup pair + two singles)
    val exact = graft.operators.Dedup.exact(out)
    assert(exact.count() === 9)
    assert(exact.filter(col("n_copies") === 2).count() === 3)
    // word-set Jaccard is salt-invariant: the near-dup pair (0,2)/(1,2)
    // and dup pair (0,1) appear once per replica with the SAME jaccard
    val pairs = graft.operators.Dedup.ngramJaccardPairs(out, 0.5).collect()
    assert(pairs.length === 9)
    val base = pairs.filter(_.getLong(0) < 10000000L)
    val rep2 = pairs.filter(_.getLong(0) >= 20000000L)
    assert(base.map(r => (r.getLong(1) - r.getLong(0), r.getDouble(2))).toSet
      === rep2.map(r => (r.getLong(1) - r.getLong(0), r.getDouble(2))).toSet)
  }

  test("scaleEmbeddings: intra-replica dot products are bit-exact") {
    val out = ScalingBench.scaleEmbeddings(embs, 4)
    assert(out.count() === 12)
    assert(out.select("vec_id").distinct().count() === 12)
    // per-replica pairwise dots equal the base corpus's (sign flips
    // square away; the pattern is constant within a replica)
    val dot = graft.expressions.VectorExpressions.vecDot _
    def dots(lo: Long): Set[(Long, Long, Double)] = {
      val r = out.filter(col("vec_id") >= lo && col("vec_id") < lo + 10000000L)
      r.alias("a").join(r.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
        .select((col("a.vec_id") - lo).as("a_id"), (col("b.vec_id") - lo).as("b_id"),
          dot(col("a.embedding"), col("b.embedding")).as("d"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    }
    val base = dots(0L)
    assert(base === dots(30000000L))
    assert(base.exists { case (a, b, d) => a == 0L && b == 1L && math.abs(d - 0.96) < 1e-6 })
  }
}
