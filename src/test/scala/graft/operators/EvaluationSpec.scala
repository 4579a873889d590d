package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EvaluationSpec extends AnyFunSuite with SparkSpec {

  test("classPrf: hand confusion matrix, per-myriad truncating metrics") {
    val s = spark; import s.implicits._
    // A: tp=2 fp=1 fn=1 -> P=6666 R=6666 F1=6666
    // B: tp=1 fp=1 fn=1 -> P=5000 R=5000 F1=5000
    val scored = Seq(
      ("A", "A"), ("A", "A"), ("A", "B"),
      ("B", "B"), ("B", "A")).toDF("label", "pred")
    val got = Evaluation.classPrf(scored).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got("A") === ((2L, 1L, 1L, 6666L, 6666L, 6666L)))
    assert(got("B") === ((1L, 1L, 1L, 5000L, 5000L, 5000L)))
  }

  test("retrievalMetrics: hand-computed recall/RR/nDCG, edge rows") {
    val s = spark; import s.implicits._
    // q1 truth {1,2,3}; ranked: miss, hit@2, miss, hit@4 (k = 4)
    // q2 truth {7}, never ranked -> all-zero row
    // q3 ranked but NO truth -> dropped (no qrels, no grade)
    val ranked = Seq(
      (1L, 5L, 1L), (1L, 1L, 2L), (1L, 9L, 3L), (1L, 3L, 4L),
      (3L, 8L, 1L))
      .toDF("query_id", "neighbor_id", "rank")
    val truth = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 7L))
      .toDF("query_id", "neighbor_id")
    val got = Evaluation.retrievalMetrics(ranked, truth, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val d = Evaluation.ndcgDiscounts(4)
    // hits 2 of 3 -> recall 6666; first hit rank 2 -> RR 500000;
    // dcg = disc(2)+disc(4), ideal = disc(1..3) (min(3, 4) relevant)
    val ndcg = (d(1) + d(3)) * 10000L / (d(0) + d(1) + d(2))
    assert(got(1L) === ((2L, 6666L, 500000L, ndcg)))
    assert(got(2L) === ((0L, 0L, 0L, 0L)))
    assert(!got.contains(3L))
    // discount constants are the pinned grid values
    assert(d === Seq(1000000L, 630930L, 500000L, 430677L))
  }

  test("classPrf: never-predicted and hallucinated classes get rows") {
    val s = spark; import s.implicits._
    val scored = Seq(
      ("A", "GHOST"), // A never predicted; GHOST never a label
      ("A", "A")).toDF("label", "pred")
    val got = Evaluation.classPrf(scored).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // A: tp=1 fp=0 fn=1 -> P=10000 R=5000
    assert(got("A") === ((1L, 0L, 1L, 10000L, 5000L)))
    // GHOST: tp=0 fp=1 fn=0 -> P=0 (predicted, never right), R=0
    // (zero denominator scores 0, not an error)
    assert(got("GHOST") === ((0L, 1L, 0L, 0L, 0L)))
  }
}
