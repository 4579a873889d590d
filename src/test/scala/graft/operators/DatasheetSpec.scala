package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DatasheetSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.createDataFrame(Seq(
    (0L, "the cat sat on the mat today", "en", "web", 28L),
    (1L, "the cat sat on the mat today", "en", "web", 28L), // exact dup
    (2L, "ein kurzer deutscher text hier", "de", "books", 30L),
    (3L, "one more unique doc body here", "en", "web", 29L)))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("datasheet renders byte-identically on identical inputs") {
    val a = Datasheet.render(docs)
    val b = Datasheet.render(docs)
    assert(a.map(_._1) === Seq("corpus_datasheet.md", "corpus_mixture.svg"))
    assert(a === b)
  }

  test("the numbers in the card match the operators that feed it") {
    val md = Datasheet.render(docs).head._2
    // language distribution: 3 en, 1 de
    assert(md.contains("| de | 1 |"))
    assert(md.contains("| en | 3 |"))
    // exact duplication: 3 distinct texts over 4 docs, 1 dup copy
    assert(md.contains("| 3 | 4 | 1 |"))
    // profile covers every column of the input schema
    docs.columns.foreach(c => assert(md.contains(s"| $c |"), c))
    // section headers present and ordered
    val idx = Seq("## Column profile", "## Source mixture",
      "## Language distribution", "## Exact duplication",
      "## Gopher quality").map(md.indexOf)
    assert(idx.forall(_ >= 0) && idx === idx.sorted)
  }

  test("a dup-free corpus reports 0 exact dups, not null") {
    val unique = docs.filter(org.apache.spark.sql.functions
      .col("doc_id") =!= 1L)
    val md = Datasheet.render(unique).head._2
    assert(md.contains("| 3 | 3 | 0 |"))
    val dupSection = md.substring(md.indexOf("## Exact duplication"),
      md.indexOf("## Gopher quality"))
    assert(!dupSection.contains("null"), dupSection)
  }

  test("the mixture figure is valid SVG naming every source") {
    val svg = Datasheet.render(docs).last._2
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    Seq("web", "books").foreach(s => assert(svg.contains(s)))
  }
}
