package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Product quantization: trainer determinism, encode law (codes =
  * per-subspace integer-L2 argmin, verified against an independent
  * plain-Scala recomputation), and ADC top-k agreement with an
  * exhaustive Scala scan of the same codebook.
  */
class PqSpec extends AnyFunSuite with SparkSpec {

  private val M = Similarity.PqSub
  private val SD = Similarity.PqSubDim
  private val K = Similarity.PqK

  // 40 deterministic 64-dim vectors in [-0.9, 0.9]
  private lazy val raw: Seq[(Long, Seq[Float], Int)] =
    (0 until 40).map { i =>
      (i.toLong,
        Seq.tabulate(64)(j => ((((i * 37 + j * 11) % 19) - 9) / 10.0f)),
        i % 3)
    }

  private lazy val embs = spark.createDataFrame(raw)
    .toDF("vec_id", "embedding", "label")

  // plain-Scala mirror of the integer pipeline
  private def ints(v: Seq[Float]): Array[Long] =
    v.map(x => math.round(x.toDouble * 1e6)).toArray
  private def sqDist(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, c) => (x - c) * (x - c) }.sum
  private def encodeOne(v: Array[Long],
      model: Seq[Seq[Array[Long]]]): (Seq[Int], Long) = {
    val picks = (0 until M).map { s =>
      val vs = v.slice(s * SD, (s + 1) * SD)
      model(s).zipWithIndex
        .map { case (cv, c) => (sqDist(vs, cv), c) }.min
    }
    (picks.map(_._2), picks.map(_._1).sum)
  }

  private lazy val model = Similarity.pqTrain(embs)

  test("rndDiv rounds half away from zero") {
    assert(Similarity.rndDiv(7, 2) === 4)   // 3.5 -> 4
    assert(Similarity.rndDiv(-7, 2) === -4) // -3.5 -> -4
    assert(Similarity.rndDiv(6, 4) === 2)   // 1.5 -> 2
    assert(Similarity.rndDiv(5, 4) === 1)   // 1.25 -> 1
    assert(Similarity.rndDiv(0, 3) === 0)
  }

  test("pqTrain: m x ksub x subDim shape, input-order invariant") {
    assert(model.size === M)
    assert(model.forall(_.size === K))
    assert(model.forall(_.forall(_.length === SD)))
    val reversed = Similarity.pqTrain(embs.orderBy(col("vec_id").desc))
    assert(model.map(_.map(_.toSeq)) === reversed.map(_.map(_.toSeq)))
  }

  test("pqEncode matches the plain-Scala argmin law") {
    val got = Similarity.pqEncode(embs, model).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val want = raw.map { case (id, v, _) =>
      val (codes, recon) = encodeOne(ints(v), model)
      (id, codes.mkString(" "), recon)
    }
    assert(got === want)
    assert(got.forall(_._2.split(" ").forall(c => c.toInt >= 0 && c.toInt < K)))
  }

  test("pqTopK matches an exhaustive Scala ADC scan") {
    val nq = 3
    val k = 2
    val byId = raw.map { case (id, v, _) => id -> ints(v) }.toMap
    val codes = byId.map { case (id, v) => id -> encodeOne(v, model)._1 }
    val want = (0L until nq.toLong).flatMap { q =>
      val qv = byId(q)
      val luts = (0 until M).map { s =>
        val qs = qv.slice(s * SD, (s + 1) * SD)
        model(s).map(cv => sqDist(qs, cv))
      }
      byId.keys.filter(_ != q).toSeq
        .map(x => (codes(x).zipWithIndex
          .map { case (c, s) => luts(s)(c) }.sum, x))
        .sorted.take(k).zipWithIndex
        .map { case ((adc, x), i) => (q, x, adc, (i + 1).toLong) }
    }.sortBy(t => (t._1, t._4))
    val got = Similarity.pqTopK(embs, model, nQueries = nq, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
  }

  test("ivfPqTopK: adc values obey the LUT law, ranks contiguous asc") {
    val byId = raw.map { case (id, v, _) => id -> ints(v) }.toMap
    val codes = byId.map { case (id, v) => id -> encodeOne(v, model)._1 }
    def adcOf(q: Long, x: Long): Long =
      (0 until M).map { s =>
        val qs = byId(q).slice(s * SD, (s + 1) * SD)
        sqDist(qs, model(s)(codes(x)(s)))
      }.sum
    val rows = Similarity.ivfPqTopK(embs, nQueries = 4, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, adc, _) =>
      assert(n != q)
      assert(adc === adcOf(q, n), s"pair ($q,$n)")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to rs.length).toSeq, s"q=$q")
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq, s"q=$q")
    }
  }

  test("ADC top-1 is a near neighbor under exact L2") {
    // sanity (not a tight recall gate): for each query the ADC-top-1's
    // exact distance is within the top half of all exact distances
    val byId = raw.map { case (id, v, _) => id -> ints(v) }.toMap
    val top1 = Similarity.pqTopK(embs, model, nQueries = 5, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    top1.foreach { case (q, n) =>
      val exact = byId.keys.filter(_ != q).toSeq
        .map(x => sqDist(byId(q), byId(x)) -> x).sorted
      val rank = exact.indexWhere(_._2 == n)
      assert(rank >= 0 && rank < exact.size / 2,
        s"query $q: ADC top-1 $n has exact rank $rank of ${exact.size}")
    }
  }
}
