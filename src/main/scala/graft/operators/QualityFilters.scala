package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filtering — the two standard published
  * filter families every pretraining pipeline applies before model
  * training. No counterpart in the reference (whose surface is the 7
  * rideshare tasks: `codes/task1.py`-`task7.py`); the rules follow the
  * published C4 (Raffel et al. 2020 §2.2) and Gopher (Rae et al. 2021,
  * table A1) heuristics.
  *
  * Scale shape: both filters are pure per-row scalar work — string
  * splits, higher-order array functions, and codegen'd regex/LIKE
  * expressions over one materialized token/line array. No UDF, no
  * shuffle, no state; a 100 TB corpus streams through map-only, and
  * the filters compose with any upstream scan's partitioning.
  *
  * Determinism: every rule verdict is computed with INTEGER arithmetic
  * (e.g. mean word length in [3,10] as `3·n ≤ Σlen ≤ 10·n`), so the
  * pass/fail booleans are exact and engine-independent; the reported
  * ratio columns are rounded doubles for human consumption only.
  */
object QualityFilters {

  /** Gopher's required-stopword list (table A1: a document must
    * contain at least two distinct words from this list).
    */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  // The five Gopher metric expressions, shared by gopherRules and the
  // ingest screen. Callers must pass a MATERIALIZED token-array column
  // (one split per row), not `split(...)` inline — higher-order
  // functions get no common-subexpression elimination.
  private def sumTokenLen(w: Column): Column =
    aggregate(transform(w, t => length(t).cast("long")),
      lit(0L), (a, x) => a + x)
  private def symbolCount(t: Column): Column =
    (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")))
      .cast("long")
  private def alphaWordCount(w: Column): Column =
    size(filter(w, t => t.rlike("[a-zA-Z]"))).cast("long")
  private def reqStopCount(w: Column, stops: Seq[String]): Column =
    size(array_intersect(array_distinct(w),
      array(stops.map(lit): _*))).cast("long")

  /** Gopher document-level rules over a line-less corpus (the
    * line-shape rules — bullet/ellipsis line ratios — live in the C4
    * cleaner below, which owns the line structure):
    *
    *   g_words:  word count in [minWords, maxWords]
    *   g_len:    mean word length in [3, 10] characters
    *   g_sym:    symbol-to-word ratio (# or …) ≤ 0.1
    *   g_alpha:  ≥ 80% of words contain an alphabetic character
    *   g_stop:   ≥ 2 distinct required stopwords present
    *
    * Input carries (doc_id, textCol); output is one row per doc with
    * the measured metrics, the five rule verdicts (0/1), and the
    * conjunction `pass`.
    */
  def gopherRules(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    // Materialize the token array once: the metric trees below
    // reference it ~6×, and Spark's higher-order functions have no
    // common-subexpression elimination (the text_quality lesson).
    val withW = docs.select(col("doc_id"),
      split(col(textCol), " ").as("w"), col(textCol).as("_t"))
    val ints = withW.select(
      col("doc_id"),
      size(col("w")).cast("long").as("n_words"),
      sumTokenLen(col("w")).as("sum_len"),
      symbolCount(col("_t")).as("n_symbols"),
      alphaWordCount(col("w")).as("n_alpha_words"),
      reqStopCount(col("w"), RequiredStopwords).as("n_req_stop"))
    val gWords = col("n_words") >= minWords && col("n_words") <= maxWords
    val gLen = lit(3) * col("n_words") <= col("sum_len") &&
      col("sum_len") <= lit(10) * col("n_words")
    val gSym = lit(10) * col("n_symbols") <= col("n_words")
    val gAlpha = lit(5) * col("n_alpha_words") >= lit(4) * col("n_words")
    val gStop = col("n_req_stop") >= 2
    ints.select(
      col("doc_id"), col("n_words"),
      round(col("sum_len").cast("double") / col("n_words"), 6)
        .as("mean_word_len"),
      round(col("n_symbols").cast("double") / col("n_words"), 6)
        .as("symbol_ratio"),
      round(col("n_alpha_words").cast("double") / col("n_words"), 6)
        .as("alpha_frac"),
      col("n_req_stop"),
      gWords.cast("int").as("g_words"), gLen.cast("int").as("g_len"),
      gSym.cast("int").as("g_sym"), gAlpha.cast("int").as("g_alpha"),
      gStop.cast("int").as("g_stop"),
      (gWords && gLen && gSym && gAlpha && gStop).cast("int").as("pass"))
  }

  /** The [[gopherRules]] conjunction as ONE per-row predicate over
    * (text, tokens) — the weak-LABELING form: the label attach stays
    * a PROJECTION in the caller's plan instead of a corpus self-join
    * against the metric frame (quality_nb_score's original shape
    * planned a SortMergeJoin on doc_id just to carry `pass` back to
    * `text`). Callers materialize the token array once (the
    * text_quality lesson — higher-order functions get no CSE); each
    * metric helper walks it a single time. Same arithmetic as
    * [[gopherRules]] term for term, so the DuckDB oracles are
    * untouched.
    */
  def gopherPass(t: Column, w: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    val nWords = size(w).cast("long")
    val sumLen = sumTokenLen(w)
    val nSym = symbolCount(t)
    val nAlpha = alphaWordCount(w)
    val nStop = reqStopCount(w, RequiredStopwords)
    (nWords >= minWords && nWords <= maxWords) &&
      (lit(3) * nWords <= sumLen && sumLen <= lit(10) * nWords) &&
      (lit(10) * nSym <= nWords) &&
      (lit(5) * nAlpha >= lit(4) * nWords) &&
      (nStop >= 2)
  }

  /** One C4 line-keep verdict (Raffel et al. 2020 §2.2): the line ends
    * in terminal punctuation, has ≥ 5 words, and does not mention
    * javascript.
    */
  private def keepLine(l: Column): Column =
    l.rlike("[.!?\"]$") && size(split(l, " ")) >= 5 &&
      !lower(l).contains("javascript")

  /** C4 line-level cleaning: lines are kept per [[keepLine]]; the
    * document passes when ≥ minLines lines survive AND the page
    * mentions neither "lorem ipsum" nor a curly brace (the C4
    * page-level drops). Output: per doc, the line counts, the cleaned
    * text (kept lines re-joined), and the page verdict.
    */
  def c4Clean(docs: DataFrame, textCol: String = "text",
      minLines: Int = 3): DataFrame = {
    val withL = docs.select(col("doc_id"),
      split(col(textCol), "\n").as("lines"), col(textCol).as("_t"))
    val counted = withL.select(
      col("doc_id"),
      size(col("lines")).cast("long").as("n_lines"),
      filter(col("lines"), keepLine _).as("kept"),
      (!col("_t").contains("lorem ipsum") && !col("_t").contains("{"))
        .as("_page_ok"))
    counted.select(
      col("doc_id"), col("n_lines"),
      size(col("kept")).cast("long").as("n_kept"),
      array_join(col("kept"), "\n").as("clean"),
      (col("_page_ok") && size(col("kept")) >= minLines).cast("int")
        .as("pass"))
  }

  /** Gopher's repetition rules (Rae et al. 2021, table A1 bottom
    * half), the document-shape complement of [[gopherRules]]' scalar
    * rules:
    *
    *   r_lines:      duplicate-line fraction ≤ 0.30 (occurrences in
    *                 line-groups of size ≥ 2, over all lines)
    *   r_line_chars: fraction of line characters in duplicate lines
    *                 ≤ 0.20
    *   r_2gram:      fraction of text characters covered by the most
    *                 frequent word 2-gram ≤ 0.20 (count × gram chars
    *                 over length(text); ties break to the smallest
    *                 gram hash, so the verdict is engine-exact)
    *
    * Scale shape: two explodes (lines, bigram hashes) each aggregated
    * by (doc_id, key) then by doc_id — every shuffle is keyed by the
    * doc or (doc, key) pair, no corpus-wide window, no per-row O(L²)
    * higher-order scans (the HOF formulation would be quadratic in
    * document length; exploding keeps a 10k-line document linear).
    * Verdicts are integer arithmetic, ratios rounded for reporting.
    */
  def gopherRepetition(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    // fan out the per-doc line/bigram expression walk (round 19,
    // guide §2.5): both legs below are compute-heavy map work rooted
    // at the scan, single-core on a single-row-group corpus; every
    // downstream aggregate is an integer count/sum or lexicographic
    // max, so row placement cannot change a bit
    val base = graft.sources.Par.fanOut(
      docs.select(col("doc_id"), col(textCol).as("_t")))
    // line groups: per (doc, line) occurrence counts
    val lines = base.select(col("doc_id"),
      explode(split(col("_t"), "\n")).as("l"))
    val lg = lines.groupBy("doc_id", "l")
      .agg(count(lit(1)).as("c"), length(col("l")).cast("long").as("lc"))
    val perLine = lg.groupBy("doc_id").agg(
      sum("c").as("n_lines"),
      sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_dup_lines"),
      sum(col("c") * col("lc")).as("line_chars"),
      sum(when(col("c") >= 2, col("c") * col("lc")).otherwise(0L))
        .as("dup_line_chars"))
    // bigram cover: count and char length per (doc, gram hash); the
    // top gram by (count desc, hash asc) via one lexicographic max.
    // Per-gram char lengths are an ARRAY built once per doc (token
    // length pairs zipped off-by-one) and exploded zipped with the
    // hash array — carrying the token array through the explode and
    // re-slicing it per row would do O(L) work per gram, O(L²) per
    // doc (measured 4.9 s → sub-second at sf0.1).
    val w = graft.functions.TextFunctions
      .tokens(translate(col("_t"), "\n", " "))
    val bg = base
      .select(col("doc_id"),
        graft.expressions.TextExpressions
          .gramHashes60(w, 2, distinct = false).as("_h"),
        transform(w, t => length(t).cast("long")).as("_l"))
      .select(col("doc_id"), explode(zip_with(
        col("_h"),
        zip_with(
          slice(col("_l"), lit(1), greatest(size(col("_l")) - 1, lit(0))),
          slice(col("_l"), lit(2), greatest(size(col("_l")) - 1, lit(0))),
          (a, b) => a + b + 1L),
        (h, g) => struct(h.as("h"), g.as("gc")))).as("z"))
      .select(col("doc_id"), col("z.h").as("h"), col("z.gc").as("gc"))
    val gg = bg.groupBy("doc_id", "h")
      .agg(count(lit(1)).as("c"), max("gc").as("gc"))
    val topG = gg.groupBy("doc_id").agg(
      max(struct(col("c"), (-col("h")).as("nh"),
        (col("c") * col("gc")).as("cover"))).as("top"))
      .select(col("doc_id"), col("top.cover").as("top_cover"))
    val rLines = lit(10) * col("n_dup_lines") <= lit(3) * col("n_lines")
    val rLineChars = lit(5) * col("dup_line_chars") <= col("line_chars")
    val r2gram = lit(5) * col("top_cover") <= col("n_chars")
    base.select(col("doc_id"),
      length(col("_t")).cast("long").as("n_chars"))
      .join(perLine, "doc_id")
      .join(topG, Seq("doc_id"), "left")
      .withColumn("top_cover", coalesce(col("top_cover"), lit(0L)))
      .select(col("doc_id"), col("n_lines"),
        round(col("n_dup_lines").cast("double") / col("n_lines"), 6)
          .as("dup_line_frac"),
        round(col("dup_line_chars").cast("double") /
          greatest(col("line_chars"), lit(1L)), 6).as("dup_line_char_frac"),
        round(col("top_cover").cast("double") /
          greatest(col("n_chars"), lit(1L)), 6).as("top_2gram_char_frac"),
        rLines.cast("int").as("r_lines"),
        rLineChars.cast("int").as("r_line_chars"),
        r2gram.cast("int").as("r_2gram"),
        (rLines && rLineChars && r2gram).cast("int").as("pass"))
  }

  /** The full quality gate as ONE stateless per-row pipeline — C4 line
    * cleaning first, then the Gopher document rules over the CLEANED
    * text (the real pipeline order: line noise would otherwise skew
    * the document statistics). Emits a first-hit reject `reason`
    * (the curateFull idiom) and the conjunction verdict.
    *
    * Stateless and aggregation-free, so the same plan runs unchanged
    * on a streaming frame — this is the quality screen at ingest
    * (graft.streaming.DocStreams.qualityScreen). `reqStops` is config,
    * like Gopher's English list: pass a corpus-appropriate list.
    */
  def screen(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000, minLines: Int = 3,
      reqStops: Seq[String] = RequiredStopwords): DataFrame = {
    val s1 = docs.select(col("doc_id"),
      split(col(textCol), "\n").as("lines"), col(textCol).as("_t"))
    val s2 = s1.select(col("doc_id"),
      size(col("lines")).cast("long").as("n_lines"),
      filter(col("lines"), keepLine _).as("kept"),
      (!col("_t").contains("lorem ipsum") && !col("_t").contains("{"))
        .as("_page_ok"))
    val s3 = s2.select(col("doc_id"), col("n_lines"),
      size(col("kept")).cast("long").as("n_kept"),
      array_join(col("kept"), "\n").as("clean"),
      (col("_page_ok") && size(col("kept")) >= minLines).as("_c4_ok"))
    // materialize the cleaned text's token array once (see gopherRules)
    val s4 = s3.withColumn("w",
      split(translate(col("clean"), "\n", " "), " "))
    val s5 = s4.select(col("doc_id"), col("n_lines"), col("n_kept"),
      col("_c4_ok"),
      size(col("w")).cast("long").as("n_words"),
      sumTokenLen(col("w")).as("sum_len"),
      symbolCount(col("clean")).as("n_symbols"),
      alphaWordCount(col("w")).as("n_alpha_words"),
      reqStopCount(col("w"), reqStops).as("n_req_stop"))
    val gWords = col("n_words") >= minWords && col("n_words") <= maxWords
    val gLen = lit(3) * col("n_words") <= col("sum_len") &&
      col("sum_len") <= lit(10) * col("n_words")
    val gSym = lit(10) * col("n_symbols") <= col("n_words")
    val gAlpha = lit(5) * col("n_alpha_words") >= lit(4) * col("n_words")
    val gStop = col("n_req_stop") >= 2
    s5.select(
      col("doc_id"), col("n_lines"), col("n_kept"), col("n_words"),
      col("_c4_ok").cast("int").as("c4_pass"),
      when(!col("_c4_ok"), "c4_page")
        .when(!gWords, "gopher_words").when(!gLen, "gopher_len")
        .when(!gSym, "gopher_sym").when(!gAlpha, "gopher_alpha")
        .when(!gStop, "gopher_stop").otherwise("ok").as("reason"),
      (col("_c4_ok") && gWords && gLen && gSym && gAlpha && gStop)
        .cast("int").as("pass"))
  }

  /** Unicode-script profile per document — the language-routing /
    * mojibake quality signal: per-script character counts from ONE
    * code-point walk (native [[graft.expressions.ScriptCounts]],
    * whole-stage codegen), the dominant script (argmax over the seven
    * SCRIPT buckets — digits and punctuation are script-neutral —
    * first-max tie-break in bucket order), and `mixed_ppm` = the
    * secondary script's count as parts-per-million of the primary's
    * (integral `div`, so the contract stays FP-free). A high
    * `mixed_ppm` is either genuine code-switching or a decode bug —
    * both route the doc out of the monolingual pool. Map-only scalar
    * work; composes with any upstream partitioning.
    */
  def scriptProfile(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    import graft.expressions.{ScriptCount, TextExpressions}
    val names = ScriptCount.Buckets
    val counted = docs.select(col("doc_id"),
      TextExpressions.scriptCounts(col(textCol)).as("sc"))
    val countCols = names.zipWithIndex.map { case (nm, i) =>
      element_at(col("sc"), i + 1).as(s"n_$nm") }
    // script buckets only (no digit/punct), in tie-break order
    val scripts = Seq("latin", "cyrillic", "greek", "cjk", "arabic",
      "hangul", "other")
    val wide = counted.select(col("doc_id") +: countCols: _*)
      .withColumn("_scripts",
        array(scripts.map(nm => col(s"n_$nm")): _*))
      .withColumn("_big", array_max(col("_scripts")))
      .withColumn("_second",
        element_at(array_sort(col("_scripts")), scripts.length - 1))
    wide.select(
      col("doc_id") +: names.map(nm => col(s"n_$nm")) :+
        when(col("_big") === 0, "none")
          .otherwise(element_at(
            lit(scripts.toArray),
            array_position(col("_scripts"), col("_big")).cast("int")))
          .as("dominant_script") :+
        expr("CASE WHEN _big = 0 THEN 0L " +
          "ELSE (_second * 1000000L) div _big END").as("mixed_ppm"): _*)
  }
}
