package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SharedSpark

/** The UniMax waterfill and the temperature mixture against their
  * direct definitions on RANDOM source profiles — sizes, budgets, and
  * epoch caps the fixed MixtureSpec cases don't reach (power-law
  * heads, budgets above/below capacity, single-source corpora,
  * token-count ties between sources).
  */
object MixtureProps extends Properties("mixture") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private val genProfile: Gen[List[(String, Int)]] = for {
    k <- Gen.chooseNum(1, 7)
    sizes <- Gen.listOfN(k, Gen.oneOf(1, 2, 3, 7, 7, 40, 400))
  } yield sizes.zipWithIndex.map { case (n, i) => (s"s$i", n) }

  private def corpus(sizes: List[(String, Int)]) =
    spark.createDataFrame(sizes.zipWithIndex.map { case ((src, n), i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "), src)
    }).toDF("doc_id", "text", "source")

  property("unimax matches the closed-form waterfill definition") =
    forAll(genProfile, Gen.chooseNum(0L, 3000L),
      Gen.chooseNum(1, 5)) { (sizes, budget, epochs) =>
      val got = Curation.unimaxAlloc(corpus(sizes), budget, epochs)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      // direct definition, plain collections
      val order = sizes.map { case (s, n) => (s, n.toLong * epochs) }
        .sortBy { case (s, c) => (c, s) }
      val k = order.size
      val prefix = order.map(_._2).scanLeft(0L)(_ + _)
      val full = order.zipWithIndex.collect {
        case ((s, c), i) if c * (k - i) <= budget - prefix(i) => s
      }.toSet
      val open = order.collect { case (s, _) if !full(s) => s }
      val capped = order.collect { case (s, c) if full(s) => s -> c }.toMap
      val want =
        if (open.isEmpty) capped
        else {
          val rest = budget - capped.values.sum
          capped ++ open.zipWithIndex.map { case (s, j) =>
            s -> (rest / open.size +
              (if (j < rest % open.size) 1L else 0L)) }
        }
      val capTotal = order.map(_._2).sum
      got == want &&
        got.values.sum == math.min(budget, capTotal) &&
        got.forall { case (s, a) => a <= capped.getOrElse(s,
          order.find(_._1 == s).get._2) }
    }

  property("temperature weights renormalize: Σ target_share ≈ 1") =
    forAll(genProfile.suchThat(_.nonEmpty),
      Gen.oneOf(0.0, 0.3, 0.5, 1.0)) { (sizes, alpha) =>
      val rows = Decontam.domainMixTemperature(corpus(sizes), alpha)
        .collect().map(r => (r.getDouble(4), r.getDouble(5)))
      val shareSum = rows.map(_._1).sum
      // 6-dp rounding per source bounds the drift from exactly 1
      math.abs(shareSum - 1.0) <= 1e-5 * rows.length &&
        rows.forall(_._2 > 0.0)
    }
}
