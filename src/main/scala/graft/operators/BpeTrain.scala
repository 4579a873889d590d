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
  * BPE mode) holds in memory — collected under an explicit `maxVocab`
  * guard with a `minFreq` prune (the standard vocab cap: frequency
  * pruning bounds the collect at any corpus size, since a 100 TB
  * corpus's >=minFreq vocabulary is bounded by corpus_tokens/minFreq
  * and in practice by the Heaps-law plateau).
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
    */
  def learnMerges(docs: DataFrame, nMerges: Int = 8,
      minFreq: Long = 1L, maxVocab: Int = 1000000): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(minFreq >= 1, s"minFreq must be >= 1, got $minFreq")
    val spark = docs.sparkSession
    val rows = wordFreq(docs).filter(col("freq") >= minFreq).collect()
    require(rows.length <= maxVocab,
      s"vocabulary ${rows.length} exceeds maxVocab $maxVocab — raise " +
        "minFreq (the standard frequency prune) or maxVocab")
    var words: Array[(Array[String], Long)] = rows.map { r =>
      (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1))
    }
    val merges =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (rank <- 1 to nMerges) {
      val cnt = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (ts, f) =>
        var i = 0
        while (i + 1 < ts.length) {
          val k = (ts(i), ts(i + 1))
          cnt(k) = cnt.getOrElse(k, 0L) + f
          i += 1
        }
      }
      require(cnt.nonEmpty,
        s"corpus exhausted before merge $rank of $nMerges")
      val ((l, r), c) = cnt.toSeq.minBy { case ((pl, pr), pc) =>
        (-pc, pl, pr)
      }
      merges += ((rank.toLong, l, r, c))
      // left-to-right non-overlapping application (skip 2 on a hit):
      // the same semantics as the oracle's sentinel-delimited replace
      words = words.map { case (ts, f) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
            out += l + r; i += 2
          } else { out += ts(i); i += 1 }
        }
        (out.toArray, f)
      }
    }
    spark.createDataFrame(merges.toSeq.map { case (rk, l, r, c) =>
      (rk, l, r, l + r, c)
    }).toDF("rank", "left", "right", "merged", "cnt")
  }
}
