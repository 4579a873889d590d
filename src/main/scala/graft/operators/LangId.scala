package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wordHash

/** TRAINED language identification: a hashed character-n-gram naive
  * Bayes classifier — the standard fastText/langid.py-shaped model
  * (char n-grams → hashed feature buckets → per-class multinomial
  * with add-1 smoothing), learned from a labeled seed slice of the
  * corpus and applied to every document. Replaces the round-7
  * marker-word heuristic (`TextFunctions.langPredict`, kept as the
  * zero-training fallback) as the primary language-ID operator.
  *
  * Engine-exact determinism (the DSIR / Perplexity discipline): every
  * log term is rounded to the integer MICRO-NAT grid independently —
  * `lp(l,b) = round(1e6·(ln(c_lb+1) − ln(c_l+B)))`, the per-class
  * floor `round(−1e6·ln(c_l+B))`, the prior
  * `round(1e6·(ln(n_l) − ln(N)))` — so a document's class score is an
  * exact integer sum of model constants and the argmax is
  * engine-independent. The unseen-bucket backoff is algebraically
  * folded: score_l = prior_l + G·floor_l + Σ_observed Δ_l(b) with
  * Δ_l(b) = lp_l(b) − floor_l, which turns "every gram needs a row
  * per class" into an INNER join against the observed model only.
  *
  * Scale shape: training is two distributed aggregations over the
  * SEED slice (bounded by slice size, grouped to ≤ L·B model rows —
  * 5·1024 here); scoring streams the corpus through one map-only
  * gram explode, one broadcast inner join against the Δ model, one
  * (doc_id, lang) partial-aggregating groupBy, and a 5-rows-per-doc
  * argmax window. No corpus-sized shuffle beyond the per-doc
  * aggregation; no driver-side state at all (the model never leaves
  * the cluster, unlike the collect-based IVF/DSIR models).
  */
object LangId {

  /** Character n-grams of `text` (positions 1..len−n+1, 1-based —
    * the DuckDB `range` mirror). Documents shorter than `n` yield an
    * empty array, NOT a descending `sequence` artifact.
    */
  def charGrams(text: Column, n: Int = 3): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** The trained model. `delta`: (lang, b, delta) — the micro-nat
    * advantage of an OBSERVED (class, bucket) pair over that class'
    * floor; `langStats`: (lang, prior, floor) — micro-nat log-prior
    * and unseen-bucket floor per class. `buckets`/`n` ride with the
    * frames so a train/score feature-space mismatch is
    * unrepresentable (the [[Perplexity.LmModel]] contract).
    */
  final case class NbModel(delta: DataFrame, langStats: DataFrame,
      buckets: Int, n: Int)

  /** Train on a labeled seed slice (`lang` column = the label).
    * Both aggregations are distributed; nothing is collected.
    */
  def train(seed: DataFrame, buckets: Int = 1024, n: Int = 3): NbModel = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    require(n >= 1, s"n must be >= 1, got $n")
    val b = lit(buckets.toLong)
    val grams = seed.select(col("lang"),
      explode(charGrams(col("text"), n)).as("g"))
      .select(col("lang"), pmod(wordHash(col("g")), b).as("b"))
    val clb = grams.groupBy("lang", "b").agg(count(lit(1)).as("clb"))
    val cl = grams.groupBy("lang").agg(count(lit(1)).as("cl"))
    val floor = round(-log(col("cl") + b) * 1e6).cast("long")
    val langFloor = cl.select(col("lang"), col("cl"), floor.as("floor"))
    val delta = clb.join(langFloor, "lang")
      .select(col("lang"), col("b"),
        (round((log(col("clb") + lit(1L)) - log(col("cl") + b)) * 1e6)
          .cast("long") - col("floor")).as("delta"))
    val nDocs = seed.groupBy("lang").agg(count(lit(1)).as("nl"))
    val tot = nDocs.agg(sum(col("nl")).as("nn"))
    val langStats = nDocs.crossJoin(broadcast(tot))
      .join(langFloor.select("lang", "floor"), "lang")
      .select(col("lang"),
        round((log(col("nl")) - log(col("nn"))) * 1e6).cast("long")
          .as("prior"),
        col("floor"))
    NbModel(delta, langStats, buckets, n)
  }

  /** Per-document class scores: (doc_id, lang, score) — one row per
    * (doc, trained class), integer micro-nats.
    */
  def scores(docs: DataFrame, m: NbModel): DataFrame = {
    val b = lit(m.buckets.toLong)
    val withG = docs.select(col("doc_id"),
      greatest(length(col("text")) - (m.n - 1), lit(0)).cast("long")
        .as("n_grams"),
      charGrams(col("text"), m.n).as("gs"))
    val grams = withG.select(col("doc_id"), explode(col("gs")).as("g"))
      .select(col("doc_id"), pmod(wordHash(col("g")), b).as("b"))
    val hits = grams.join(broadcast(m.delta), Seq("b"))
      .groupBy("doc_id", "lang").agg(sum("delta").as("sd"))
    withG.select("doc_id", "n_grams")
      .crossJoin(broadcast(m.langStats))
      .join(hits, Seq("doc_id", "lang"), "left")
      .select(col("doc_id"), col("lang"),
        (col("prior") + col("n_grams") * col("floor") +
          coalesce(col("sd"), lit(0L))).as("score"))
  }

  /** Per-document prediction: (doc_id, pred_lang, score) — argmax
    * class, ties broken (score DESC, lang ASC); both engines agree
    * because scores are exact integers.
    */
  def predict(docs: DataFrame, m: NbModel): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("lang").asc)
    scores(docs, m)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"), col("score"))
  }
}
