package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  // v0≡v1, v2 ⟂ v0, v3 = -v0
  private lazy val embs = spark.createDataFrame(Seq(
    (0L, Seq(1f, 0f, 0f, 0f), 0),
    (1L, Seq(1f, 0f, 0f, 0f), 0),
    (2L, Seq(0f, 1f, 0f, 0f), 1),
    (3L, Seq(-1f, 0f, 0f, 0f), 1)))
    .toDF("vec_id", "embedding", "label")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val sims = embs.alias("a").crossJoin(embs.alias("b"))
      .filter(col("a.vec_id") === 0)
      .select(col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims(0L) === 1.0)
    assert(sims(1L) === 1.0)
    assert(sims(2L) === 0.0)
    assert(sims(3L) === -1.0)
  }

  test("brute-force top-k ranks by sim desc with vec_id tie-break") {
    val got = Similarity.bruteForceTopK(embs, nQueries = 1, k = 3).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got === Seq((1L, 1.0, 1L), (2L, 0.0, 2L), (3L, -1.0, 3L)))
  }

  test("sign bucket encodes the first-dims sign pattern") {
    val buckets = embs
      .select(col("vec_id"), Similarity.signBucket(col("embedding")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(0L) === 15L) // all four dims >= 0
    assert(buckets(3L) === 14L) // dim 1 negative drops bit 0
  }

  test("near-dup pairs: only the identical pair clears 0.9 cosine") {
    val got = Similarity.nearDupPairs(embs, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((0L, 1L, 1.0)))
  }

  test("IVF routes to nearest centroid and scores within the cell") {
    // centroids = v0,v1 (identical): ties break to cell 0, so every
    // vector lands in cell 0 and IVF top-k degenerates to brute force
    val cells = Similarity.ivfCells(embs, nCells = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(cells.values.toSet === Set(0L))
    val got = Similarity.ivfTopK(embs, nQueries = 1, k = 2, nCells = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 1.0), (2L, 0.0)))
  }

  test("LSH top-k only scores within the bucket") {
    val got = Similarity.lshTopK(embs, nQueries = 4, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // v3 (bucket 14) is alone: no neighbors; v0/v1/v2 share bucket 15
    assert(!got.exists(_._1 == 3L))
    assert(got.filter(_._1 == 0L).map(_._2).toSet === Set(1L, 2L))
  }
}
