package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding table (`vec_id, embedding array<float>, label`) — the
  * BASELINE.json extension family (no analog in the reference).
  *
  * Dot products are `zip_with` + `aggregate` — a left-to-right double
  * fold DuckDB reproduces bit-for-bit via
  * `list_reduce(list_prepend(0.0, list_transform(…)), +)`. Higher-order
  * array functions are interpreted (no codegen), so each operator
  * prepares its inputs once per row ([[prepared]]: double-cast array +
  * norm) and pays exactly ONE fold per candidate pair — not three.
  *
  * Scale design (billions of vectors):
  *   - brute force broadcasts the (small) query set and streams the
  *     corpus once — one shuffle of (query_id, sim) pairs bounded by
  *     k via the per-query top-k window;
  *   - the LSH variant buckets both sides by sign-bit sketch (axis-
  *     aligned random-hyperplane LSH) and equi-joins on the bucket —
  *     per-bucket work is |bucket|², global work drops by the bucket
  *     count; the same bucket key works for IVF-style routing (probe
  *     nearest buckets) without changing the join shape.
  */
object Similarity {

  /** Double dot product of two float/double-array columns — the native
    * codegen expression (graft.expressions.VecDot); same left-to-right
    * accumulation as the `zip_with`+`aggregate` fold it replaced, so
    * oracle parity is unchanged.
    */
  def dot(x: Column, y: Column): Column =
    graft.expressions.VectorExpressions.vecDot(x, y)

  /** Element-exact double cosine between two float-array columns
    * (self-contained form; the join operators below use [[prepared]]
    * inputs instead to avoid recomputing norms per pair).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-bit sketch over the first `bits` dimensions: bit i set iff
    * embedding[i] >= 0. An axis-aligned instance of random-hyperplane
    * LSH for cosine; deterministic and engine-portable.
    */
  def signBucket(emb: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(element_at(emb, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embeddings with the norm materialized once per row — the per-pair
    * cosine is then a single codegen'd loop plus one divide. The float
    * array itself travels through joins/broadcasts uncast (half the
    * bytes of a double array); VecDot widens per element.
    */
  private def prepared(embs: DataFrame): DataFrame =
    embs.withColumn("norm",
      sqrt(dot(col("embedding"), col("embedding"))))

  private def pairSim(a: String, b: String): Column =
    round(dot(col(s"${a}_emb"), col(s"${b}_emb")) /
      (col(s"${a}_norm") * col(s"${b}_norm")), 6)

  private def side(embs: DataFrame, tag: String, extra: Column*): DataFrame =
    prepared(embs).select(
      col("vec_id").as(s"${tag}_id") +: col("embedding").as(s"${tag}_emb") +:
        col("norm").as(s"${tag}_norm") +: extra: _*)

  /** Queryable ANN index frame: (vec_id, embedding, norm, bucket) —
    * what a deployment persists (bucketed by `bucket`) and what the
    * streaming screen (graft.streaming.VecStreams) joins against.
    */
  def buildIndex(embs: DataFrame, bits: Int = 4): DataFrame =
    prepared(embs.withColumn("bucket", signBucket(col("embedding"), bits)))
      .select(col("vec_id"), col("embedding"), col("norm"), col("bucket"))

  /** Exact brute-force top-k neighbors for the query set `vec_id <
    * nQueries`: broadcast queries × full corpus scan, cosine, per-query
    * top-k by (sim desc, vec_id) via row_number. Self-pairs excluded.
    */
  def bruteForceTopK(embs: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val q = side(embs.filter(col("vec_id") < nQueries), "q")
    val c = side(embs, "c")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        pairSim("q", "c").as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate top-k: both sides keyed by the sign-bit
    * bucket; each query only scores its own bucket's members. The
    * recall/cost trade is the `bits` parameter.
    */
  def lshTopK(embs: DataFrame, nQueries: Int = 50, k: Int = 3,
      bits: Int = 4): DataFrame = {
    val bucketed = embs.withColumn("bucket", signBucket(col("embedding"), bits))
    val q = side(bucketed.filter(col("vec_id") < nQueries), "q", col("bucket"))
    val c = side(bucketed, "c", col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        pairSim("q", "c").as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** IVF-style cell assignment: every vector goes to its nearest of
    * `nCells` deterministic centroids (the lowest vec_ids — a stand-in
    * for trained k-means centers; the routing/join shape is identical).
    * Ties break toward the lower centroid id. Returns (vec_id,
    * embedding, norm, cell).
    */
  def ivfCells(embs: DataFrame, nCells: Int = 8): DataFrame = {
    val cents = prepared(embs.filter(col("vec_id") < nCells))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"),
        col("norm").as("cent_norm"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cent_sim").desc, col("cent_id"))
    prepared(embs)
      .crossJoin(broadcast(cents))
      .withColumn("cent_sim",
        round(dot(col("embedding"), col("cent_emb")) /
          (col("norm") * col("cent_norm")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("norm"),
        col("cent_id").as("cell"))
  }

  /** IVF top-k with nprobe=1: queries score only their own cell's
    * inverted list. Same degrade-gracefully join shape as [[lshTopK]],
    * but with data-adaptive cells instead of axis-aligned buckets.
    */
  def ivfTopK(embs: DataFrame, nQueries: Int = 50, k: Int = 3,
      nCells: Int = 8): DataFrame = {
    val cells = ivfCells(embs, nCells)
    val q = cells.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("cell"))
    val c = cells.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"), col("norm").as("c_norm"), col("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_emb"), col("c_emb")) /
          (col("q_norm") * col("c_norm")), 6).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** Embedding near-dup pairs: same sign-bucket, cosine >= threshold,
    * a < b. The bucket equi-join is the blocking step; the quadratic
    * verify runs per bucket only.
    */
  def nearDupPairs(embs: DataFrame, threshold: Double = 0.35,
      bits: Int = 4): DataFrame = {
    val bucketed = embs.withColumn("bucket", signBucket(col("embedding"), bits))
    val a = side(bucketed, "a", col("bucket"))
    val b = side(bucketed, "b", col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id").as("vec_a"), col("b_id").as("vec_b"),
        pairSim("a", "b").as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
