package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QualityFiltersSpec extends AnyFunSuite with SparkSpec {

  // 60 plain words: passes every Gopher rule except g_stop (no
  // required stopwords) unless they are appended.
  private val plain60 = Seq.fill(60)("word").mkString(" ")

  private def gopher(rows: (Long, String)*) = {
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    QualityFilters.gopherRules(df).orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9), r.getInt(10),
          r.getInt(11)))
      .toMap
  }

  test("gopher: each rule fails independently") {
    val got = gopher(
      (0L, plain60 + " the and"), // all pass
      (1L, Seq.fill(10)("word").mkString(" ") + " the and"), // g_words low
      (2L, Seq.fill(60)("xy").mkString(" ") + " the and"), // g_len < 3
      (3L, plain60 + " the and " + Seq.fill(8)("#").mkString(" ")), // g_sym
      (4L, plain60 + " the and " + Seq.fill(20)("123").mkString(" ")), // g_alpha
      (5L, plain60 + " the")) // g_stop: only 1 required stopword
    assert(got(0L) === ((1, 1, 1, 1, 1, 1)))
    assert(got(1L) === ((0, 1, 1, 1, 1, 0)))
    assert(got(2L) === ((1, 0, 1, 1, 1, 0)))
    assert(got(3L) === ((1, 1, 0, 1, 1, 0)))
    assert(got(4L) === ((1, 1, 1, 0, 1, 0)))
    assert(got(5L) === ((1, 1, 1, 1, 0, 0)))
  }

  test("gopherPass (projection form) equals gopherRules' pass column exactly") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (0L, plain60 + " the and"),
      (1L, Seq.fill(10)("word").mkString(" ") + " the and"),
      (2L, Seq.fill(60)("xy").mkString(" ") + " the and"),
      (3L, plain60 + " the and " + Seq.fill(8)("#").mkString(" ")),
      (4L, plain60 + " the and " + Seq.fill(20)("123").mkString(" ")),
      (5L, plain60 + " the"))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
    val viaFrame = QualityFilters.gopherRules(df).collect()
      .map(r => r.getLong(0) -> r.getInt(11)).toMap
    val viaExpr = df
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        QualityFilters.gopherPass(col("text"), col("w"))
          .cast("int").as("pass"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaExpr === viaFrame)
  }

  test("gopher: metrics are exact on a hand-computed doc") {
    val df = spark.createDataFrame(Seq(
      (0L, "the cat sat with a hat"))).toDF("doc_id", "text")
    val r = QualityFilters.gopherRules(df).collect().head
    assert(r.getLong(1) === 6L) // n_words
    assert(r.getDouble(2) === 2.833333) // mean_word_len 17/6 rounded to 6 dp
    assert(r.getDouble(3) === 0.0) // symbol_ratio
    assert(r.getDouble(4) === 1.0) // alpha_frac
    assert(r.getLong(5) === 2L) // n_req_stop: the, with
  }

  test("gopher: ellipsis and hash both count as symbols") {
    val df = spark.createDataFrame(Seq(
      (0L, "a b ... c # d ...."))).toDF("doc_id", "text")
    val r = QualityFilters.gopherRules(df).collect().head
    // "..." twice ("...." contains one non-overlapping "...") + one "#"
    assert(r.getDouble(3) === 0.428571) // round(3/7, 6)
  }

  private val goodLine = "one two three four five six."

  test("c4: line rules — punctuation, length, javascript") {
    val text = Seq(
      goodLine, // kept
      "one two three four five six", // no terminal punctuation
      "too short line.", // < 5 words
      "please enable javascript to continue.", // javascript
      "does it work with a question?", // kept: '?' terminal
      "she said \"yes\"").mkString("\n") // '"' terminal but 3 words: dropped
    val df = spark.createDataFrame(Seq((0L, text))).toDF("doc_id", "text")
    val r = QualityFilters.c4Clean(df, minLines = 2).collect().head
    assert(r.getLong(1) === 6L)
    assert(r.getLong(2) === 2L)
    assert(r.getString(3) ===
      goodLine + "\n" + "does it work with a question?")
    assert(r.getInt(4) === 1)
  }

  test("c4: page-level kills — lorem ipsum, curly brace, too few lines") {
    val three = Seq(goodLine, goodLine, goodLine).mkString("\n")
    val got = QualityFilters.c4Clean(spark.createDataFrame(Seq(
      (0L, three),
      (1L, three + "\nlorem ipsum dolor sit amet."),
      (2L, three + "\nfunction() { return 1; }"),
      (3L, goodLine + "\n" + goodLine)))
      .toDF("doc_id", "text")).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(4)))
    assert(got(0) === ((0L, 3L, 1)))
    assert(got(1) === ((1L, 4L, 0))) // lorem line survives line rules, page dies
    assert(got(2) === ((2L, 3L, 0))) // brace line dropped AND page dies
    assert(got(3) === ((3L, 2L, 0))) // < 3 kept lines
  }

  test("gopherRepetition: duplicate-line fractions are exact") {
    val dupLine = "aaaa bbbb cccc dddd x." // 22 chars
    val df = spark.createDataFrame(Seq(
      (0L, Seq(dupLine, dupLine, "unique line here now.").mkString("\n")),
      // long enough that the count-1 top bigram's chars stay <= 20%
      (1L, "aa bb cc dd ee ff.\ngg hh ii jj kk ll.\nmm nn oo pp qq rr.")))
      .toDF("doc_id", "text")
    val got = QualityFilters.gopherRepetition(df).orderBy("doc_id")
      .collect()
    val r0 = got(0)
    assert(r0.getLong(1) === 3L) // n_lines
    assert(r0.getDouble(2) === 0.666667) // 2/3 dup lines
    // dup chars 44 of 44+21=65 line chars
    assert(r0.getDouble(3) === 0.676923)
    assert((r0.getInt(5), r0.getInt(6)) === ((0, 0))) // both rules fail
    val r1 = got(1)
    assert(r1.getDouble(2) === 0.0)
    assert((r1.getInt(5), r1.getInt(6), r1.getInt(8)) === ((1, 1, 1)))
  }

  test("gopherRepetition: top-bigram character coverage") {
    val df = spark.createDataFrame(Seq(
      (0L, "x y x y x y"))).toDF("doc_id", "text")
    val r = QualityFilters.gopherRepetition(df).collect().head
    // "x y" occurs 3x, covers 3*3=9 of 11 chars
    assert(r.getDouble(4) === 0.818182)
    assert(r.getInt(7) === 0) // r_2gram fails
  }

  test("gopherRepetition: single-token doc has no bigrams, passes") {
    val r = QualityFilters.gopherRepetition(
      spark.createDataFrame(Seq((0L, "lonely"))).toDF("doc_id", "text"))
      .collect().head
    assert(r.getDouble(4) === 0.0)
    assert(r.getInt(8) === 1) // pass
  }

  test("scriptProfile: dominance, tie-break, mixed ratio, empty doc") {
    val docs = spark.createDataFrame(Seq(
      (0L, "hello world"),   // pure latin, nothing secondary
      (1L, "aaaa дд"), // latin 4, cyrillic 2 -> 500000 ppm
      (2L, "ддд"), // pure cyrillic
      (3L, "a д"),      // 1-1 tie -> bucket order picks latin
      (4L, ""),              // no script chars at all
      (5L, "123 ...")))      // digits/punct are script-neutral
      .toDF("doc_id", "text")
    val got = QualityFilters.scriptProfile(docs).orderBy("doc_id")
      .select("doc_id", "dominant_script", "mixed_ppm")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (0L, "latin", 0L), (1L, "latin", 500000L), (2L, "cyrillic", 0L),
      (3L, "latin", 1000000L), (4L, "none", 0L), (5L, "none", 0L)))
    // count columns ride along exactly
    val r1 = QualityFilters.scriptProfile(docs)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L).head()
    assert(r1.getAs[Long]("n_latin") === 4L)
    assert(r1.getAs[Long]("n_cyrillic") === 2L)
    assert(r1.getAs[Long]("n_punct") === 1L)
  }
}
