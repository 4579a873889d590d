package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.SharedSpark

/** The streaming argmax ([[LangId.predictRowwise]] — model as driver
  * literals, per-row scoring) must equal the window-based
  * [[LangId.predict]] on ANY corpus and label assignment: random
  * texts (including sub-n ones that score prior-only), random class
  * counts, seed slices that may leave a class gram-less. The two
  * implementations share no code past the trained model, so this is
  * a genuine two-sided check of the argmax algebra and tie order.
  */
object LangIdProps extends Properties("langid") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private val genText: Gen[String] =
    Gen.chooseNum(0, 18).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val genDocs: Gen[Seq[(Long, String, String)]] =
    Gen.chooseNum(8, 14).flatMap { n =>
      Gen.listOfN(n, Gen.zip(genText, Gen.oneOf("keep", "drop", "junk")))
        .map(_.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) })
    }

  // NoShrink: the shrinker would minimize below the generator's >= 8
  // docs (train's nonempty-seed contract) — an empty corpus is out of
  // contract for BOTH implementations, not a disagreement between them
  property("predictRowwise == predict on random corpora and labels") =
    forAllNoShrink(genDocs) { rows =>
      val docs = spark.createDataFrame(rows)
        .toDF("doc_id", "text", "lang")
      val m = LangId.train(docs.filter(
        org.apache.spark.sql.functions.col("doc_id") % 5 === 0))
      def out(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      out(LangId.predict(docs, m)) == out(LangId.predictRowwise(docs, m))
    }
}
