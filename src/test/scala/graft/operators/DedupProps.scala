package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SharedSpark

/** Structural invariants of the dedup family on generated corpora —
  * duplication patterns the fixed fixtures don't reach.
  */
object DedupProps extends Properties("dedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(3, 12)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  // duplicate some docs on purpose: pick texts then sample WITH replacement
  private val genCorpus: Gen[List[String]] = for {
    base <- Gen.nonEmptyListOf(genDoc)
    picks <- Gen.nonEmptyListOf(Gen.oneOf(base))
  } yield picks

  private def docsDf(texts: List[String]) =
    spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s0") })
      .toDF("doc_id", "text", "lang", "source")

  property("exact dedup partitions the corpus; keepers are group minima") =
    forAll(genCorpus) { texts =>
      val rows = Dedup.exact(docsDf(texts)).collect()
      val copies = rows.map(_.getLong(1)).sum
      val expectGroups = texts.distinct.size
      copies == texts.size && rows.length == expectGroups &&
        rows.forall(r => r.getLong(0) == texts.indexOf(texts(r.getLong(0).toInt)))
    }

  property("minhash pairs are ordered, thresholded, and symmetric-free") =
    forAll(genCorpus) { texts =>
      val pairs = Dedup.minhashPairs(docsDf(texts)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      pairs.forall { case (a, b, j) => a < b && j >= 0.5 && j <= 1.0 } &&
        pairs.map(p => (p._1, p._2)).distinct.length == pairs.length
    }

  property("clusters: labels are component minima and cover every doc") =
    forAll(genCorpus) { texts =>
      val df = docsDf(texts)
      val pairs = Dedup.minhashPairs(df)
      val labels = Dedup.clusters(df, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      labels.size == texts.size &&
        labels.forall { case (d, c) => c <= d } &&
        edges.forall { case (a, b) => labels(a) == labels(b) }
    }
}
