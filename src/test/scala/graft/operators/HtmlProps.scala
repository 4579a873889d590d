package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SharedSpark

/** extractText against a restoration law on random markup-free
  * payloads: wrapping clean text in generated markup (nested tags,
  * script/style elements with hostile code, comments, entity noise)
  * and extracting must give back exactly the whitespace-collapsed
  * original — the property the composed ingest oracle's
  * "pre-markup text" shortcut relies on.
  */
object HtmlProps extends Properties("html") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private val word: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "x7", "q", "word")

  private val cleanText: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))

  private val scriptBody: Gen[String] = Gen.oneOf(
    "var a = 1 < 2;", "if (x) { y(); }",
    "var s = \"</style>\";", "f(a,b)")

  private val wrap: Gen[String => String] = for {
    cls <- Gen.chooseNum(0, 9)
    js <- scriptBody
    comment <- Gen.oneOf(true, false)
    style <- Gen.oneOf(true, false)
  } yield (t: String) =>
    s"""<html><body><div class="c$cls"><p>$t</p>""" +
      s"<script>$js</script>" +
      (if (comment) "<!-- note <hidden> -->" else "") +
      (if (style) "<style>p { a: 1; }</style>" else "") +
      "</div></body></html>"

  property("extraction restores markup-free text exactly") =
    forAll(Gen.chooseNum(1, 6).flatMap(k =>
      Gen.listOfN(k, Gen.zip(cleanText, wrap)))) { docs =>
      val df = spark.createDataFrame(
        docs.zipWithIndex.map { case ((t, w), i) => (i.toLong, w(t)) })
        .toDF("doc_id", "text")
      val got = Scrub.extractHtml(df).orderBy("doc_id").collect()
        .map(_.getString(3)).toList
      got == docs.map(_._1)
    }

  property("extraction is idempotent on its own output") =
    forAll(Gen.listOfN(3, Gen.zip(cleanText, wrap))) { docs =>
      val df = spark.createDataFrame(
        docs.zipWithIndex.map { case ((t, w), i) => (i.toLong, w(t)) })
        .toDF("doc_id", "text")
      val once = Scrub.extractHtml(df)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("clean_text").as("text"))
      val twice = Scrub.extractHtml(once).orderBy("doc_id").collect()
        .map(_.getString(3)).toList
      twice == docs.map(_._1)
    }
}
