package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document chunking and chunk-level operators — the sequence-prep half
  * of an LLM-training-data pipeline (no counterpart in the reference,
  * whose surface is the 7 rideshare tasks): fixed-token-window chunking
  * with overlap (the context-window shaping every pretraining run
  * performs), CCNet-style corpus-wide duplicated-chunk screening
  * (Wenzek et al., LREC'20 dedup paragraphs across shards — here the
  * "paragraph" is a fixed token window, since the corpus convention is
  * single-space text with no line structure), and token-budget packing
  * (greedy sequence packing into training bins).
  *
  * Scale design (100 TB corpus):
  *   - [[chunks]] is a pure per-row explode — no shuffle; output size
  *     is corpus size × (1 + overlap share).
  *   - [[dupStats]] / [[clean]] shuffle only (doc_id, 8-byte chunk
  *     hash) pairs: one hash-aggregation on the hash and one equi-join
  *     back — never the chunk text. AQE's skew handling covers the
  *     boilerplate-chunk hot keys.
  *   - [[pack]] is a two-level prefix sum — per-(source, block)
  *     aggregates cumsum'd on a small frame, then parallel within-block
  *     windows — so no single task ever serializes a whole source's
  *     doc stream (the property that lets 1000 executors pack a
  *     dozen-source corpus without stragglers).
  */
object Chunking {

  /** Token windows of `chunk` tokens every `stride` tokens (overlap =
    * chunk − stride), as arrays: one row per (doc, window). Window
    * starts walk 0, stride, 2·stride, … while they land strictly
    * inside the token sequence, so every token is covered and the last
    * window may be short — the standard sliding convention.
    */
  private def chunkArrays(w: Column, chunk: Int, stride: Int): Column = {
    require(chunk >= 1 && stride >= 1 && stride <= chunk,
      s"need 1 <= stride <= chunk, got chunk=$chunk stride=$stride")
    val nChunks = floor((size(w) - 1) / stride).cast("long") + 1
    transform(sequence(lit(0L), nChunks - 1),
      i => slice(w, (i * stride + 1).cast("int"), lit(chunk)))
  }

  /** Explode documents into overlapping fixed-token chunks:
    * (doc_id, chunk_id, n_tok, chunk). `chunk` tokens per window,
    * stepping `stride` (default 32/24 = 8-token overlap).
    */
  def chunks(docs: DataFrame, chunk: Int = 32, stride: Int = 24): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        posexplode(chunkArrays(col("w"), chunk, stride))
          .as(Seq("chunk_id", "cw")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("cw")).cast("long").as("n_tok"),
        array_join(col("cw"), " ").as("chunk"))
      .orderBy("doc_id", "chunk_id")

  /** Non-overlapping chunk rows with the 60-bit content hash — the
    * shared base of [[dupStats]] and [[clean]]: (doc_id, chunk_id,
    * chunk, h). Only the hash ever crosses a shuffle.
    */
  private def hashedChunks(docs: DataFrame, chunk: Int): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        posexplode(chunkArrays(col("w"), chunk, chunk))
          .as(Seq("chunk_id", "cw")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(col("cw"), " ").as("chunk"))
      .withColumn("h", wordHash60(col("chunk")))

  /** Corpus-wide duplicated-chunk table: every chunk hash and the
    * number of DISTINCT docs carrying it. The join-back side of the
    * CCNet screen; distinct-doc (not occurrence) counting so a chunk
    * repeated inside one doc is not "duplicated across the corpus".
    */
  private def chunkDocCounts(ch: DataFrame): DataFrame =
    ch.groupBy("h").agg(countDistinct(col("doc_id")).as("n_docs"))

  /** Per-doc duplicated-chunk profile over non-overlapping `chunk`-token
    * windows: (doc_id, n_chunks, n_dup, dup_ratio). A chunk is `dup`
    * iff its hash occurs in ≥ 2 distinct docs — the CCNet cross-shard
    * paragraph-dedup signal, counted per occurrence on the doc side.
    */
  def dupStats(docs: DataFrame, chunk: Int = 16): DataFrame = {
    val ch = hashedChunks(docs, chunk).select("doc_id", "h")
    ch.join(chunkDocCounts(ch), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_chunks").cast("double"), 6)
          .as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** CCNet-style cleaned corpus: each doc rebuilt from only its chunks
    * that NO other doc carries (all copies of a cross-doc duplicated
    * chunk drop — the LREC'20 convention), order preserved:
    * (doc_id, n_kept, clean_text). Docs losing every chunk stay, with
    * an empty text — survivorship is a downstream filter's call.
    */
  def clean(docs: DataFrame, chunk: Int = 16): DataFrame = {
    val ch = hashedChunks(docs, chunk)
    val kept = ch.join(chunkDocCounts(ch), "h")
      .filter(col("n_docs") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        // order rebuilt by chunk_id: struct sort keys on the first field
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk")))),
          t => t.getField("chunk")), " ").as("clean_text"))
    docs.select("doc_id").join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Greedy token-budget packing: docs walk their source's doc_id order
    * and bin b holds the docs whose running token count starts inside
    * [b·budget, (b+1)·budget) — the deterministic streaming packer
    * (docs may straddle a boundary; they belong to the bin they start
    * in). Integer-exact.
    *
    * Scale shape — the naive formulation is one running-sum window
    * `partitionBy("source")`: sources number in the dozens, so each
    * source's whole doc stream serializes through ONE window task — a
    * straggler by construction at 100 TB. This is the
    * [[Curation.selectBudget]] two-level prefix sum instead, with
    * (source, doc_id-range block) inner keys: (a) per-block token sums,
    * cumsum'd by a window over the AGGREGATED per-block frame (corpus
    * size / blockSize rows — thousands, not billions); (b) the
    * within-block prefix via a window PARTITIONED by (source, block) —
    * parallel across blocks, ≤ blockSize rows per task. Identical
    * output to the single-window form (floor-division blocks of the
    * ordering key preserve doc_id order across block boundaries).
    */
  def pack(docs: DataFrame, budget: Int = 256,
      blockSize: Long = 4096L): DataFrame =
    packBy(docs, size(tokens(col("text"))).cast("long"), budget, blockSize)

  /** [[pack]] generalized over the token-count EXPRESSION — the real
    * training packer keys on the tokenizer's counts, not whitespace
    * words: pass `BpeExpressions.bpeCount(col("text"))` to pack by
    * actual BPE tokens (`pipeline_pack_bpe`). Identical two-level
    * prefix-sum plan; only the per-doc size column changes.
    */
  def packBy(docs: DataFrame, nTok: org.apache.spark.sql.Column,
      budget: Int = 256, blockSize: Long = 4096L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val sized = docs.select(col("doc_id"), col("source"),
      nTok.cast("long").as("n_tok"))
      // `div` (integral), not floor(double /): long ids above 2^53 would
      // lose precision in the double round-trip and split/merge blocks
      .withColumn("block", expr(s"doc_id div ${blockSize}L"))
    // (a) per-(source, block) totals; cumsum over the SMALL aggregate
    val perBlock = sized.groupBy("source", "block")
      .agg(sum("n_tok").as("b_tok"))
    val wb = Window.partitionBy("source").orderBy("block")
    val before = perBlock
      .withColumn("cum_before", sum("b_tok").over(wb) - col("b_tok"))
      .select("source", "block", "cum_before")
    // (b) within-block prefix, parallel across (source, block)
    val win = Window.partitionBy("source", "block").orderBy("doc_id")
    sized.join(before, Seq("source", "block"))
      .withColumn("cum", col("cum_before") + sum("n_tok").over(win))
      // `div`, not floor(double /): a 100 TB source's cumulative token
      // prefix exceeds 2^53 and the double round-trip could land a
      // boundary doc one bin off (the same argument as `block` above);
      // operands are non-negative so div == the oracle's `//`
      .select(col("doc_id"), col("source"), col("n_tok"),
        expr(s"(cum - n_tok) div ${budget}L").as("bin"))
      .orderBy("doc_id")
  }

  // ---- paragraph-level dedup: the chunk machinery at CCNet's actual
  // unit (the paragraph/line, not a fixed token window) — the shape
  // that strips cross-document BOILERPLATE (nav bars, cookie notices,
  // license footers), which repeats verbatim across unrelated pages
  // and so never forms a fixed-window alignment. ----

  /** (doc_id, para_idx, para, h): documents split on the LITERAL
    * separator `sep`, one row per paragraph with its content hash.
    * Map-only explode. Spark's `split` takes a Java regex, so `sep`
    * is `Pattern.quote`d — a separator with metacharacters ("|",
    * ".", "\n\n") would otherwise silently diverge from the
    * literal-delimiter semantics the oracle and callers assume.
    */
  def paragraphs(docs: DataFrame, sep: String = "\n"): DataFrame =
    docs.select(col("doc_id"),
      posexplode(split(col("text"), java.util.regex.Pattern.quote(sep)))
        .as(Seq("para_idx", "para")))
      .select(col("doc_id"), col("para_idx").cast("long").as("para_idx"),
        col("para"), md5(col("para")).as("h"))

  /** Per-doc paragraph duplication profile: paragraphs appearing in
    * ≥ 2 DISTINCT docs are boilerplate candidates. Same two
    * aggregations as [[dupStats]] keyed on the paragraph hash.
    */
  def paragraphDupStats(docs: DataFrame, sep: String = "\n"): DataFrame = {
    val p = paragraphs(docs, sep).select("doc_id", "para", "h")
    // empty paragraphs (consecutive separators) are STRUCTURE, not
    // content: every doc with a blank line would otherwise share one
    // hash and read as cross-doc boilerplate
    val counts = p.filter(length(col("para")) > 0).groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"))
    p.join(counts, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(coalesce(col("n_docs"), lit(1L)) >= 2, 1L)
          .otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_paras"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_paras").cast("double"),
          6).as("dup_ratio"))
      .orderBy("doc_id")
  }

  /** Boilerplate-stripped corpus: every doc rebuilt (order preserved)
    * from only the paragraphs NO other doc carries — all copies of a
    * cross-doc duplicate drop, the [[clean]] convention at paragraph
    * granularity. Docs losing everything stay with empty text.
    */
  def paragraphClean(docs: DataFrame, sep: String = "\n"): DataFrame = {
    val p = paragraphs(docs, sep)
    // same structure-vs-content rule as [[paragraphDupStats]]: empty
    // paragraphs never count as duplicates and are always kept
    val counts = p.filter(length(col("para")) > 0)
      .select("doc_id", "h").groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"))
    val kept = p.join(counts, Seq("h"), "left")
      .filter(coalesce(col("n_docs"), lit(1L)) === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("para_idx"), col("para")))),
          t => t.getField("para")), sep).as("clean_text"))
    docs.select("doc_id").join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }
}
