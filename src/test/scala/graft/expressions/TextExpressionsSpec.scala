package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextExpressionsSpec extends AnyFunSuite with SparkSpec {

  /** Independent reference: per-bit ±1 majority, bit set iff sum > 0. */
  private def refSimhash(hs: Seq[Long]): Long =
    (0 until 16).map { b =>
      val s = hs.map(h => ((h >>> b) & 1L) * 2 - 1).sum
      if (s > 0) 1L << b else 0L
    }.sum

  test("simhash_fold matches the per-bit majority reference on random arrays") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(Seq.empty[Long]) ++
      (1 to 40).map(n => Seq.fill(rnd.nextInt(20) + 1)(rnd.nextLong()))
    cases.foreach { hs =>
      val got = spark.range(1)
        .select(TextExpressions.simhashFold(
          lit(hs.toArray)).as("s"))
        .head().getLong(0)
      assert(got === refSimhash(hs), s"for input $hs")
    }
  }

  test("simhash_fold equals the interpreted 16-aggregate composition it replaced") {
    val docs = spark.createDataFrame(Seq(
      (0L, "alpha beta gamma delta"), (1L, "the quick brown fox"),
      (2L, "x"), (3L, "a b c d e f g h i j k l m")))
      .toDF("doc_id", "text")
    import graft.functions.TextFunctions._
    val hashes = transform(wordSet(col("text")), wordHash(_))
    val legacy = (0 until 16).map { b =>
      val s = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1) * 2 - 1)
      when(s > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = docs.select(simhash16(col("text")).as("fast"), legacy.as("slow"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("minhash_bands equals the interpreted 8-permutation composition it replaced") {
    import graft.functions.TextFunctions._
    val docs = spark.createDataFrame(Seq(
      (0L, "alpha beta gamma delta"), (1L, "the quick brown fox jumps"),
      (2L, "solo"), (3L, "a b a b a")))
      .toDF("doc_id", "text")
    val hs = shingleHashes(shingles2(col("text")))
    val rows = docs.select(
      TextExpressions.minhashBands(hs).as("fast"),
      array((0 until 4).map(b => bandKeyInt(hs, b)): _*).as("slow"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) {
        // empty shingle set: native form is NULL, composed form is an
        // array of null band keys — both yield null keys downstream
        assert(r.getSeq[Any](1).forall(_ == null))
      } else {
        assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      }
    }
    assert(rows.exists(_.isNullAt(0))) // the one-word doc hits the case
  }

  test("minhash_bands on random hash arrays matches a driver-side reference") {
    import graft.functions.TextFunctions.{MinhashA, MinhashB, MinhashP}
    val rnd = new scala.util.Random(13)
    (1 to 25).foreach { _ =>
      val hs = Seq.fill(rnd.nextInt(30) + 1)(rnd.nextLong().abs % MinhashP)
      val expect = (0 until 4).map { b =>
        def m(i: Int) = hs.map(h => (MinhashA(i) * h + MinhashB(i)) % MinhashP).min
        m(2 * b) * 1000003L + m(2 * b + 1)
      }
      val got = spark.range(1)
        .select(TextExpressions.minhashBands(lit(hs.toArray)).as("b"))
        .head().getSeq[Long](0)
      assert(got === expect)
    }
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    val rnd = new scala.util.Random(17)
    val vocab = (1 to 40).map(i => s"w$i")
    (1 to 30).foreach { _ =>
      val a = rnd.shuffle(vocab).take(rnd.nextInt(20)).sorted
      val b = rnd.shuffle(vocab).take(rnd.nextInt(20)).sorted
      val row = spark.range(1).select(
        TextExpressions.sortedIntersectCount(
          lit(a.toArray), lit(b.toArray)).as("fast"),
        size(array_intersect(lit(a.toArray), lit(b.toArray)))
          .cast("long").as("slow")).head()
      assert(row.getLong(0) === row.getLong(1), s"a=$a b=$b")
    }
    // empty-side edges
    val e = spark.range(1).select(TextExpressions.sortedIntersectCount(
      lit(Array.empty[String]), lit(Array("x"))).as("c")).head()
    assert(e.getLong(0) === 0L)
  }

  test("modal_run_length matches groupBy-max reference on random sorted arrays") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "ccc", "d", "e")
    val cases = Seq(Seq.empty[String]) ++
      (1 to 40).map(_ => Seq.fill(rnd.nextInt(25) + 1)(vocab(rnd.nextInt(vocab.size))).sorted)
    cases.foreach { xs =>
      val got = spark.range(1)
        .select(TextExpressions.modalRunLength(lit(xs.toArray)).as("m"))
        .head().getLong(0)
      val want = if (xs.isEmpty) 0L
        else xs.groupBy(identity).values.map(_.size).max.toLong
      assert(got === want, s"xs=$xs")
    }
  }

  test("modal_run_length is callable from SQL via GraftExtensions") {
    val got = spark.sql(
      "SELECT modal_run_length(array_sort(array('b','a','b','c','b'))) AS m")
      .head().getLong(0)
    assert(got === 3L)
  }

  test("modal_run_length is null-safe: null elements count as one value") {
    // SQL registration makes arbitrary containsNull arrays reachable
    val got = spark.sql(
      "SELECT modal_run_length(array_sort(array('a', CAST(NULL AS STRING), " +
        "CAST(NULL AS STRING), 'a'))) AS m").head().getLong(0)
    assert(got === 2L) // run of two 'a's == run of two nulls
    val allNull = spark.sql(
      "SELECT modal_run_length(array(CAST(NULL AS STRING), CAST(NULL AS STRING))) AS m")
      .head().getLong(0)
    assert(allNull === 2L)
  }

  test("simhash_fold is callable from SQL via GraftExtensions") {
    val got = spark.sql(
      "SELECT simhash_fold(array(1L, 1L, 3L)) AS s").head().getLong(0)
    // bit0: all three set (+3) → set; bit1: one of three (+1-1-1=-1) → clear
    assert(got === refSimhash(Seq(1L, 1L, 3L)))
    assert(got === 1L)
  }

  // edge-heavy fixture for the gram-hash equivalences: repeats (dedup),
  // doc shorter than n, single token, empty string (split("") = [""]),
  // multi-space (empty tokens), unicode
  private lazy val gramDocs = spark.createDataFrame(Seq(
    (0L, "a b a b c a b"), (1L, "x"), (2L, ""), (3L, "a  b"),
    (4L, "один два три один два"), (5L, "the the the the"),
    (6L, "p q r s t u v w x y z")))
    .toDF("doc_id", "text")

  test("gram_hashes equals the composed distinct shingle+wordHash60 chain") {
    import graft.functions.TextFunctions._
    for (n <- 1 to 4) {
      val rows = gramDocs.select(
        TextExpressions.gramHashes60(tokens(col("text")), n).as("fused"),
        transform(shinglesNTokens(tokens(col("text")), n), wordHash60(_))
          .as("legacy"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("char_gram_buckets equals the composed substr+md5-hex chain") {
    import graft.functions.TextFunctions._
    // multibyte row 4 pins code-point (not byte) slicing; rows 1-2
    // pin the shorter-than-n empty result
    for (n <- Seq(2, 3); b <- Seq(64, 1024)) {
      val rows = gramDocs.select(
        TextExpressions.charGramBuckets(col("text"), n, b).as("fused"),
        when(length(col("text")) >= n,
          transform(sequence(lit(1), length(col("text")) - (n - 1)),
            i => pmod(wordHash(col("text").substr(i, lit(n))),
              lit(b.toLong))))
          .otherwise(array().cast("array<long>")).as("legacy"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n b=$b")
      }
    }
  }

  test("gram_hashes positional equals the composed seq chain (order+mult)") {
    import graft.functions.TextFunctions._
    for (n <- 1 to 3) {
      val rows = gramDocs.select(
        TextExpressions.gramHashes60(tokens(col("text")), n,
          distinct = false).as("fused"),
        transform(shingleSeqTokens(tokens(col("text")), n), wordHash60(_))
          .as("legacy"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("gram_hashes mod-p equals the composed shingleHashes chain") {
    import graft.functions.TextFunctions._
    val rows = gramDocs.select(
      TextExpressions.gramHashesMod(tokens(col("text")), 2).as("fused"),
      shingleHashes(shingles2(col("text"))).as("legacy"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("nfc_normalize matches java.text.Normalizer; identity on ASCII/NFC") {
    val cases = Seq(
      "Cafe\u0301",      // decomposed -> composes to U+00E9
      "Caf\u00e9",       // already NFC -> identity
      "vis-a\u0300-vis", // combining grave
      "A\u030a",         // A + ring -> U+00C5
      "\ufb01le",        // ligature fi: NFC keeps it (NFKC would split)
      "ascii only", "", "\u043e\u0434\u0438\u043d",
      "e\u0301\u0302")  // stacked combining marks
    val s = spark; import s.implicits._
    val rows = cases.toDF("t")
      .select(TextExpressions.nfcNormalize(col("t")).as("n"))
      .collect().map(_.getString(0))
    rows.zip(cases).foreach { case (got, in) =>
      assert(got === java.text.Normalizer.normalize(
        in, java.text.Normalizer.Form.NFC),
        s"for ${in.codePoints().toArray.toSeq}")
    }
    // canonical-dup screen: decomposed and precomposed hash-equal AFTER
    val pair = Seq("Cafe\u0301", "Caf\u00e9").toDF("t")
      .select(md5(TextExpressions.nfcNormalize(col("t"))).as("h"))
      .collect().map(_.getString(0))
    assert(pair(0) === pair(1))
  }

  test("nfc_normalize: null propagates; callable from SQL") {
    val n = spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS x")
    assert(n.head().isNullAt(0))
    // decomposed SQL literal composes to the 2-char NFC form
    val got = spark.sql("SELECT nfc_normalize('Cafe\u0301') AS x")
      .head().getString(0)
    assert(got === "Caf\u00e9")
    assert(got.length === 4)
  }

  test("gram_hashes null text propagates null; is callable from SQL") {
    val nulls = spark.sql(
      "SELECT gram_hashes60(CAST(NULL AS ARRAY<STRING>), 2) AS g")
    assert(nulls.head().isNullAt(0))
    val got = spark.sql(
      "SELECT gram_hashes60(array('a','b','a','b'), 2, false) AS g")
      .head().getSeq[Long](0)
    assert(got.length === 3) // positional keeps the repeated "a b"
    assert(got(0) === got(2))
  }

  test("script_counts: one walk hits every bucket; astral chars count once") {
    // A b (latin)  space (punct)  é (Latin-1 letter -> latin)
    // 1 (digit)  . — (ASCII punct + General Punctuation)
    // д (cyrillic)  中 (cjk)  π (greek)  م (arabic)  한 (hangul)
    // 😀 (astral smiley, surrogate PAIR -> one 'other' codepoint)
    val text = "Ab é1 .—д中πم한" +
      new String(Character.toChars(0x1F600))
    val got = spark.createDataFrame(Seq(Tuple1(text))).toDF("t")
      .select(TextExpressions.scriptCounts(col("t")).as("c"))
      .head().getSeq[Long](0)
    //              latin digit punct cyr greek cjk arabic hangul other
    // punct = two spaces + '.' + the em dash
    assert(got === Seq(3L, 1L, 4L, 1L, 1L, 1L, 1L, 1L, 1L))
    // empty text: all zeros, not null
    val empty = spark.createDataFrame(Seq(Tuple1(""))).toDF("t")
      .select(TextExpressions.scriptCounts(col("t")).as("c"))
      .head().getSeq[Long](0)
    assert(empty === Seq.fill(9)(0L))
    // null propagates
    assert(spark.sql("SELECT script_counts(CAST(NULL AS STRING)) AS c")
      .head().isNullAt(0))
  }
}
