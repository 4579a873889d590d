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

  /** IVF-routed streaming screen — the trained-index counterpart of
    * [[annScreen]]: each arriving vector ranks the k-means centroids
    * PER ROW (the model is a driver-held k×d literal — the
    * dsirScreen dense-model pattern; a window-rank over a streaming
    * frame isn't available) and probes its `nprobe` best cells'
    * inverted lists via one stream-static join. The per-row sort key
    * (−rounded sim, cent_id) reproduces the batch `assignRanked`
    * ordering exactly, so the probe set matches
    * [[graft.operators.Similarity.ivfTopK]]'s rk ≤ nprobe by
    * construction. Tail identical to [[annScreen]]: watermark, 1-hour
    * window, bounded-heap top-k.
    */
  def ivfScreen(streamEmbs: DataFrame, cells: DataFrame,
      cents: Seq[Array[Long]], k: Int = 3, nprobe: Int = 2): DataFrame = {
    require(cents.nonEmpty, "cents must be non-empty")
    require(nprobe >= 1 && nprobe <= cents.size,
      s"nprobe must be in [1, ${cents.size}], got $nprobe")
    val centLit = typedLit(Similarity.centroidModel(cents))
    // sort key: ascending (−sim) == batch's sim DESC for every real
    // cosine; a NaN sim (zero-norm centroid) must ALSO agree — Spark
    // sorts NaN largest, so batch DESC puts it FIRST, and −NaN is
    // still NaN (last ascending): map it to −∞ so it leads here too
    def negSim(s: org.apache.spark.sql.Column) =
      when(isnan(s), lit(Double.NegativeInfinity)).otherwise(-s)
    val q = streamEmbs
      .withColumn("norm", sqrt(vecDot(col("embedding"), col("embedding"))))
      .withColumn("cell", explode(transform(
        slice(array_sort(transform(centLit, c => struct(
          negSim(round(vecDot(col("embedding"), c.getField("_2")) /
            (col("norm") * c.getField("_3")), 6)).as("ns"),
          c.getField("_1").as("cid")))), 1, nprobe),
        t => t.getField("cid"))))
      .withWatermark("ts", "1 hour")
    val c = cells.select(col("cell"), col("vec_id").as("cand_id"),
      col("embedding").as("cand_emb"), col("norm").as("cand_norm"))
    q.join(c, Seq("cell"))
      .select(col("ts"), col("vec_id"),
        round(vecDot(col("embedding"), col("cand_emb")) /
          (col("norm") * col("cand_norm")), 6).as("sim"),
        col("cand_id").cast("string").as("cand"))
      .groupBy(window(col("ts"), "1 hour"), col("vec_id"))
      .agg(TopKAgg.topK(col("sim"), col("cand"), k).as("matches"))
      .select(col("window.start").as("hour"), col("vec_id"), col("matches"))
  }
}
