package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SharedSpark

/** The bounded-heap top_k aggregate must agree with the window-function
  * route (row_number over score desc, label asc) on ANY input — the
  * invariant that makes it a safe substitution at scale.
  */
object TopKProps extends Properties("top_k") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private val genRow: Gen[(String, Double, String)] = for {
    g <- Gen.oneOf("g1", "g2", "g3")
    score <- Gen.chooseNum(0, 20).map(_.toDouble) // small range → many ties
    label <- Gen.identifier.map(_.take(4))
  } yield (g, score, label)

  property("equals row_number window top-k for any data") =
    forAll(Gen.nonEmptyListOf(genRow)) { rows =>
      val df = spark.createDataFrame(rows.distinct)
        .toDF("g", "score", "label").repartition(7)
      val viaAgg = df.groupBy("g")
        .agg(TopKAgg.topK(col("score"), col("label"), 3).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("g"), col("t.score"), col("t.label"))
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy("g")
        .orderBy(col("score").desc, col("label"))
      val viaWindow = df
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("g", "score", "label")
        .collect().map(_.toSeq).toSet
      viaAgg == viaWindow
    }
}
