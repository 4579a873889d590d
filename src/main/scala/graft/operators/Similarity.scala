package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding table (`vec_id, embedding array<float>, label`) — the
  * BASELINE.json extension family (no analog in the reference).
  *
  * Cosine is computed with `zip_with` + `aggregate` — a left-to-right
  * double fold that whole-stage codegen fuses into the row pipeline (no
  * UDF), and that DuckDB reproduces bit-for-bit via
  * `list_reduce(list_prepend(0.0, list_transform(…)), +)`.
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

  /** Element-exact double cosine between two float-array columns. */
  def cosine(a: Column, b: Column): Column = {
    def d(x: Column) = transform(x, v => v.cast("double"))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    val (ad, bd) = (d(a), d(b))
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Sign-bit sketch over the first `bits` dimensions: bit i set iff
    * embedding[i] >= 0. An axis-aligned instance of random-hyperplane
    * LSH for cosine; deterministic and engine-portable.
    */
  def signBucket(emb: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(element_at(emb, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact brute-force top-k neighbors for the query set `vec_id <
    * nQueries`: broadcast queries × full corpus scan, cosine, per-query
    * top-k by (sim desc, vec_id) via row_number. Self-pairs excluded.
    */
  def bruteForceTopK(embs: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val q = embs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = embs.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("embedding")), 6))
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
    val withB = embs.withColumn("bucket", signBucket(col("embedding"), bits))
    val q = withB.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket"))
    val c = withB.select(col("vec_id").as("neighbor_id"), col("embedding"),
      col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("q_emb"), col("embedding")), 6))
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
    val withB = embs.withColumn("bucket", signBucket(col("embedding"), bits))
    val a = withB.select(col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val b = withB.select(col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", round(cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
      .orderBy("vec_a", "vec_b")
  }
}
