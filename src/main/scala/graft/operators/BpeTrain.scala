package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** BPE merge-table TRAINING (Sennrich et al. 2016 §3.2) — the learn
  * half whose apply half is the fixed-table `BpeCount` expression:
  * start from characters, repeatedly merge the most frequent adjacent
  * token pair over the word-frequency table, emit the learned merges
  * in rank order.
  *
  * Scale split (the IVF-centroid / Bloom-filter precedent): the
  * CORPUS-sized work is one distributed word-frequency aggregation;
  * the merge loop then operates on the VOCABULARY — the model-sized
  * artifact every production BPE trainer (GPT-2's, SentencePiece's
  * BPE mode) holds in memory. The collect is bounded BY CONSTRUCTION:
  * the default `minFreq` is derived from the corpus as
  * ⌈total_tokens / maxVocab⌉, so the ≥ minFreq vocabulary can never
  * exceed maxVocab (|{w : freq ≥ ⌈T/V⌉}| ≤ T / ⌈T/V⌉ ≤ V) — at any
  * corpus size the guard cannot trip on natural growth, only on a
  * caller-forced minFreq.
  *
  * Merge loop cost (the standard trainer trick): pair counts are
  * maintained INCREMENTALLY — each merge touches only the words that
  * contain the winning pair (tracked by an occurrence index),
  * subtracting their old adjacent-pair multiset and adding the
  * post-merge one. A full recount per merge (the naive loop) re-walks
  * the whole vocabulary nMerges times — hours at a real 32k-merge
  * vocabulary; the incremental form is O(affected word length) per
  * merge plus one O(distinct pairs) argmax scan.
  *
  * Determinism (the oracle replays the SAME algorithm in unrolled
  * SQL): pair choice ties break (count DESC, left ASC, right ASC) on
  * ASCII-binary string order, identical in JVM compareTo and DuckDB
  * collation; the left-to-right non-overlapping merge application is
  * the shared `replace`-on-delimited-string semantics (see the
  * oracle's sentinel encoding in ExtraAnalogs).
  */
object BpeTrain {

  /** Distributed word-frequency table: (w, freq). */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** The learned merge table: (rank, left, right, merged, cnt) —
    * `cnt` the weighted adjacent-pair count that won rank `rank`.
    * `minFreq = 0` (the default) derives the frequency prune from the
    * corpus: ⌈total_tokens / maxVocab⌉, the smallest cut that
    * provably bounds the vocabulary collect at `maxVocab`.
    */
  def learnMerges(docs: DataFrame, nMerges: Int = 8,
      minFreq: Long = 0L, maxVocab: Int = 1000000): DataFrame =
    learnWithTokenization(docs, nMerges, minFreq, maxVocab)._1

  /** Train AND apply: the merge table plus the per-word token counts
    * `(w, n_tok)` under the learned tokenizer — the trainer's own
    * final word state, i.e. the SEQUENTIAL (training-order)
    * application every BPE trainer produces as a byproduct. Exposing
    * it closes the learn→tokenize loop without re-deriving
    * application semantics (rank-priority re-application can differ
    * on adversarial tables; the training-order result is the ground
    * truth the oracle's unrolled chain replays). The counts frame is
    * vocab-bounded (same ⌈T/maxVocab⌉ argument), so a caller
    * broadcasts it and tokenizes the corpus with one map-side join.
    */
  def learnWithTokenization(docs: DataFrame, nMerges: Int = 8,
      minFreq: Long = 0L, maxVocab: Int = 1000000)
      : (DataFrame, DataFrame) = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minFreq >= 0, s"minFreq must be >= 0, got $minFreq")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val spark = docs.sparkSession
    val wf = wordFreq(docs)
    val effMinFreq =
      if (minFreq > 0) minFreq
      else {
        // one tiny distributed agg over the (already grouped) word
        // table; coalesce covers the empty corpus (sum of no rows)
        val t = wf.agg(coalesce(sum(col("freq")), lit(0L)).as("t"))
          .collect()(0).getLong(0)
        math.max(1L, (t + maxVocab - 1) / maxVocab)
      }
    val rows = wf.filter(col("freq") >= effMinFreq).collect()
    require(rows.length <= maxVocab,
      s"vocabulary ${rows.length} exceeds maxVocab $maxVocab — the " +
        "caller forced a minFreq below the corpus-derived bound; " +
        "use minFreq = 0 (auto) or raise maxVocab")
    val wordStrs: Array[String] = rows.map(_.getString(0))
    val words: Array[Array[String]] = wordStrs.map(
      _.split("").filter(_.nonEmpty))
    val freqs: Array[Long] = rows.map(_.getLong(1))

    // global pair-count map + pair -> {word index} occurrence index:
    // the structures every incremental BPE trainer keeps
    val cnt = scala.collection.mutable.Map[(String, String), Long]()
    val occ = scala.collection.mutable
      .Map[(String, String), scala.collection.mutable.Set[Int]]()
    def add(wi: Int, ts: Array[String], f: Long): Unit = {
      var i = 0
      while (i + 1 < ts.length) {
        val k = (ts(i), ts(i + 1))
        cnt(k) = cnt.getOrElse(k, 0L) + f
        occ.getOrElseUpdate(k, scala.collection.mutable.Set.empty) += wi
        i += 1
      }
    }
    def remove(wi: Int, ts: Array[String], f: Long): Unit = {
      var i = 0
      while (i + 1 < ts.length) {
        val k = (ts(i), ts(i + 1))
        val c = cnt(k) - f
        if (c == 0L) { cnt.remove(k); occ.remove(k) }
        else { cnt(k) = c; occ(k) -= wi }
        i += 1
      }
      // a pair occurring several times in one word was removed from
      // occ on its first occurrence; re-membership happens in add()
      ()
    }
    words.indices.foreach(wi => add(wi, words(wi), freqs(wi)))

    val merges =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (rank <- 1 to nMerges) {
      require(cnt.nonEmpty,
        s"corpus exhausted before merge $rank of $nMerges")
      val ((l, r), c) = cnt.minBy { case ((pl, pr), pc) =>
        (-pc, pl, pr)
      }
      merges += ((rank.toLong, l, r, c))
      // incremental update: ONLY words containing (l, r) change —
      // subtract each one's old pair multiset, apply the
      // left-to-right non-overlapping merge (skip 2 on a hit; the
      // same semantics as the oracle's sentinel-delimited replace),
      // add the new multiset back
      val affected = occ.get((l, r)).map(_.toArray).getOrElse(Array.empty)
      affected.foreach { wi =>
        val old = words(wi); val f = freqs(wi)
        remove(wi, old, f)
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < old.length) {
          if (i + 1 < old.length && old(i) == l && old(i + 1) == r) {
            out += l + r; i += 2
          } else { out += old(i); i += 1 }
        }
        words(wi) = out.toArray
        add(wi, words(wi), f)
      }
    }
    val mergeDf = spark.createDataFrame(merges.toSeq.map {
      case (rk, l, r, c) => (rk, l, r, l + r, c)
    }).toDF("rank", "left", "right", "merged", "cnt")
    val tokDf = spark.createDataFrame(
      wordStrs.indices.map(wi => (wordStrs(wi), words(wi).length.toLong)))
      .toDF("w", "n_tok")
    (mergeDf, tokDf)
  }
}
