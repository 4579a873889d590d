package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SharedSpark

/** The three quality filters against independent plain-JVM references
  * computing the stated rule semantics directly (string splits,
  * regexes, occurrence counts — no Spark). The properties pin the
  * HOF/explode machinery to the definitions on generated corpora that
  * mix punctuation variants, symbols, digit tokens, stopwords, page
  * markers, and duplicate lines the fixed fixtures don't reach.
  */
object QualityProps extends Properties("quality") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SharedSpark.spark

  private val words = Vector("the", "a", "and", "have", "ox", "lorem",
    "ipsum", "zz", "q", "##", "...", "12", "x7", "padding", "javascript")

  private val genLine: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    ws <- Gen.listOfN(n, Gen.oneOf(words))
    end <- Gen.oneOf("", ".", "!", "?", "\"", "x")
  } yield ws.mkString(" ") + end

  private val genDoc: Gen[String] = for {
    n <- Gen.chooseNum(1, 7)
    ls <- Gen.listOfN(n, genLine)
    dup <- Gen.oneOf(true, false)
    brace <- Gen.oneOf(List.empty[String], List("f() { g }"))
  } yield ((if (dup) ls ++ ls.take(1) else ls) ++ brace).mkString("\n")

  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(k => Gen.listOfN(k, genDoc))

  private def df(docs: List[String]) =
    spark.createDataFrame(docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t) }).toDF("doc_id", "text")

  // ---- plain-JVM references (split with limit -1: Spark's split
  // keeps trailing empty strings; Java's default drops them) ----

  private def toks(t: String): Array[String] = t.split(" ", -1)

  private def gopherRef(t: String): (Long, Long, Long, Long, Long) = {
    val w = toks(t)
    val symbols = "#".r.findAllIn(t).length +
      "\\.\\.\\.".r.findAllIn(t).length
    (w.length.toLong, w.map(_.length.toLong).sum,
      symbols.toLong,
      w.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
        .toLong,
      QualityFilters.RequiredStopwords.count(w.contains).toLong)
  }

  property("gopherRules metrics equal the direct definition") =
    forAll(genCorpus) { docs =>
      val got = QualityFilters.gopherRules(df(docs)).orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(1),
          r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9), r.getInt(10)))
      val want = docs.map { t =>
        val (n, sl, sym, al, st) = gopherRef(t)
        ((n,
          if (n >= 50 && n <= 100000) 1 else 0,
          if (3 * n <= sl && sl <= 10 * n) 1 else 0,
          if (10 * sym <= n) 1 else 0,
          if (5 * al >= 4 * n) 1 else 0,
          if (st >= 2) 1 else 0))
      }
      got.toSeq == want
    }

  private def keepRef(l: String): Boolean =
    l.nonEmpty && ".!?\"".contains(l.last) &&
      l.split(" ", -1).length >= 5 &&
      !l.toLowerCase.contains("javascript")

  property("c4Clean equals the direct line/page rules") =
    forAll(genCorpus) { docs =>
      val got = QualityFilters.c4Clean(df(docs)).orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4)))
      val want = docs.map { t =>
        val lines = t.split("\n", -1)
        val kept = lines.filter(keepRef)
        val pageOk = !t.contains("lorem ipsum") && !t.contains("{")
        (lines.length.toLong, kept.length.toLong, kept.mkString("\n"),
          if (pageOk && kept.length >= 3) 1 else 0)
      }
      got.toSeq == want
    }

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  property("gopherRepetition equals the direct occurrence counts") =
    forAll(genCorpus) { docs =>
      val got = QualityFilters.gopherRepetition(df(docs)).orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(1), r.getInt(5), r.getInt(6), r.getInt(7)))
      val want = docs.map { t =>
        val lines = t.split("\n", -1)
        val lineGroups = lines.groupBy(identity).values
        val nDup = lineGroups.filter(_.length >= 2).map(_.length).sum
        val lineChars = lines.map(_.length).sum
        val dupChars = lineGroups.filter(_.length >= 2)
          .map(g => g.length * g.head.length).sum
        val w = toks(t.replace('\n', ' '))
        val grams = w.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toList
        val topCover =
          if (grams.isEmpty) 0L
          else {
            val byGram = grams.groupBy(identity)
              .map { case (g, o) => (o.length.toLong, h60(g), g.length.toLong) }
            // (count desc, hash asc) — mirrors the struct-max tie-break
            val top = byGram.maxBy { case (c, h, _) => (c, -h) }
            top._1 * top._3
          }
        val nChars = t.length.toLong
        ((lines.length.toLong,
          if (10 * nDup <= 3 * lines.length) 1 else 0,
          if (5 * dupChars <= lineChars) 1 else 0,
          if (5 * topCover <= nChars) 1 else 0))
      }
      got.toSeq == want
    }
}
