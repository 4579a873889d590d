package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.TopKAgg
import graft.expressions.VectorExpressions.vecDot
import graft.operators.Similarity

/** Streaming similarity: arriving embeddings are screened against a
  * static ANN index (Similarity.buildIndex) — stream-static bucket
  * join, cosine via the native VecDot expression, and the bounded-heap
  * `top_k` aggregate under a watermark. Three engine extension pieces
  * composing in one streaming plan; state per window×query is one
  * k-element heap, evicted by the watermark.
  */
object VecStreams {

  /** Top-k index matches per arriving vector (`vec_id, embedding, ts`),
    * finalized per 1-hour event-time window. Matches arrive as
    * array<struct<score,label>> best-first; label = index vec_id.
    */
  def annScreen(streamEmbs: DataFrame, index: DataFrame, k: Int = 3,
      bits: Int = 4): DataFrame = {
    // multi-probe on the STREAM side: each arriving vector probes its
    // bucket plus every Hamming-1 neighbor — a narrow (bits+1)-way
    // explode per event, no extra state; the static index stays keyed
    // by its single build-time bucket.
    val q = streamEmbs
      .withColumn("bucket", Similarity.signBucket(col("embedding"), bits))
      .withColumn("bucket",
        explode(Similarity.probeBuckets(col("bucket"), bits)))
      .withColumn("norm", sqrt(vecDot(col("embedding"), col("embedding"))))
      .withWatermark("ts", "1 hour")
    val c = index.select(col("bucket"),
      col("vec_id").as("cand_id"), col("embedding").as("cand_emb"),
      col("norm").as("cand_norm"))
    q.join(c, Seq("bucket"))
      .select(col("ts"), col("vec_id"),
        round(vecDot(col("embedding"), col("cand_emb")) /
          (col("norm") * col("cand_norm")), 6).as("sim"),
        col("cand_id").cast("string").as("cand"))
      .groupBy(window(col("ts"), "1 hour"), col("vec_id"))
      .agg(TopKAgg.topK(col("sim"), col("cand"), k).as("matches"))
      .select(col("window.start").as("hour"), col("vec_id"), col("matches"))
  }
}
