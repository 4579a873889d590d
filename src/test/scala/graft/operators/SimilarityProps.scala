package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SharedSpark

/** Brute-force ANN must agree with an independent driver-side
  * computation (same fold order, same rounding) on any vector set —
  * the ground-truth check the approximate variants are judged against.
  */
object SimilarityProps extends Properties("similarity") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-5, 5).map(_.toFloat)).map(_.toSeq)
      .suchThat(v => v.exists(_ != 0f)) // avoid zero norm

  private def localCos(a: Seq[Float], b: Seq[Float]): Double = {
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
        acc + p.toDouble * q.toDouble }
    val raw = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  property("semanticDedup auto-k = explicit chooseCells(n); invariants") =
    forAll(Gen.listOfN(7, genVec).suchThat(_.size >= 3),
        Gen.chooseNum(1L, 4L)) { (vecs, target) =>
      val embs = spark.createDataFrame(
        vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) })
        .toDF("vec_id", "embedding", "label")
      val n = vecs.size.toLong
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // the auto path (corpusN threaded) differs from the explicit
      // path ONLY in how k is derived — outputs must be identical
      val auto = ids(Similarity.semanticDedup(embs, corpusN = n))
      val explicitK = ids(Similarity.semanticDedup(embs,
        nCells = Similarity.chooseCells(n)))
      // invariants at ANY cell sizing: vec 0 survives (a drop needs a
      // smaller-id twin and none precedes 0), survivors are unique
      val sized = ids(Similarity.semanticDedup(embs,
        nCells = Similarity.chooseCells(n, target)))
      auto == explicitK &&
        sized.map(_._1).contains(0L) &&
        sized.map(_._1).distinct.size == sized.size
    }

  property("bruteForceTopK equals the locally computed exact top-k") =
    forAll(Gen.listOfN(6, genVec).suchThat(_.size >= 3)) { vecs =>
      val embs = spark.createDataFrame(
        vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) })
        .toDF("vec_id", "embedding", "label")
      val got = Similarity.bruteForceTopK(embs, nQueries = 2, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val expected = (0 until 2).flatMap { q =>
        vecs.indices.filter(_ != q)
          .map(c => (q.toLong, c.toLong, localCos(vecs(q), vecs(c))))
          .sortBy { case (_, c, s) => (-s, c) }
          .take(3)
      }
      got == expected
    }

  /** SQ8 ranking equals an independent driver-side replay of the
    * quantization + integer dot on ANY vector set — and every score
    * stays inside double's exact-integer range (the TopKAgg heap
    * contract the operator's bound argument rests on).
    */
  property("sqTopK equals the locally replayed int8 ranking; scores double-exact") =
    forAll(Gen.listOfN(6, genVec).suchThat(_.size >= 3)) { vecs =>
      def quant(v: Seq[Float]): (Long, Seq[Long]) = {
        val vi = v.map(x => math.round(x.toDouble * 1e6))
        val sc = vi.map(math.abs).maxOption.getOrElse(0L)
        val qv = vi.map { x =>
          if (sc == 0L) 0L
          else {
            val m = math.floor((math.abs(x) * 254L + sc).toDouble /
              (sc * 2L).toDouble).toLong
            if (x < 0) -m else m
          }
        }
        (sc, qv)
      }
      val codes = vecs.map(quant)
      val expected = (0 until 2).flatMap { q =>
        vecs.indices.filter(_ != q).map { c =>
          val dot = codes(q)._2.zip(codes(c)._2)
            .foldLeft(0L) { case (a, (x, y)) => a + x * y }
          (q.toLong, c.toLong, dot * codes(c)._1)
        }.sortBy { case (_, c, s) => (-s, c) }.take(3)
      }
      val embs = spark.createDataFrame(
        vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) })
        .toDF("vec_id", "embedding", "label")
      val got = Similarity.sqTopK(embs, nQueries = 2, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      got == expected &&
        got.forall { case (_, _, s) => s.toDouble.toLong == s }
    }
}
