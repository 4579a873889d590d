package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** BM25 retrieval (Robertson–Spärck Jones / Okapi, the standard
  * lexical ranking function): top-k corpus documents per query. The
  * retrieval primitive a curation stack uses to pull the nearest
  * lexical matches of an eval prompt (contamination auditing beyond
  * exact n-gram hits), to mine hard negatives, or to attach citations.
  *
  * Engine-exact determinism — every score is an INTEGER by
  * construction, so ranking ties break identically in both engines:
  *
  *   - idf is grid-rounded micro-nats (the Perplexity discipline):
  *     idf(t) = round(1e6·(ln(2N+2) − ln(2·df+1))) — the BM25+ form
  *     ln(1 + (N−df+½)/(df+½)) with the halves cleared to integers,
  *     both ln arguments exactly representable.
  *   - The tf normalization is computed as ONE truncating integer
  *     division per (term, doc): with k1 = 6/5 and b = 3/4,
  *       term = idf · 22·tf·adl ÷ (10·tf·adl + 3·adl + 900·len)
  *     where adl = (100·ΣL) div N is the integer centi-token average
  *     doc length — bounded by document length, NOT corpus size, so
  *     the int64 headroom holds at any corpus scale.
  *   - score(q, d) = Σ over shared terms — a sum of integers.
  *
  * Scale shape: postings = one fused gram explode over the corpus
  * (term hash, tf) plus a doc-length column; df and the two corpus
  * scalars are one aggregation each; query terms (distinct per query)
  * equi-join the postings on the 8-byte term hash — the inverted-
  * index probe — then one (query, doc) aggregation and a per-query
  * top-k window over the MATCHED docs only (never the full corpus).
  * Queries are expected to be few relative to the corpus; the
  * postings side streams, nothing corpus-sized is broadcast.
  */
object Retrieval {

  /** (doc_id, h, tf, len): the corpus posting table — term-hash
    * occurrence counts plus the document's token length. One fused
    * native gram walk ([[graft.expressions.TextExpressions
    * .gramHashes60]], positional so multiplicity survives), one
    * groupBy.
    */
  def postings(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("len"),
        explode(graft.expressions.TextExpressions.gramHashes60(
          tokens(col("text")), 1, distinct = false)).as("h"))
      .groupBy("doc_id", "len", "h")
      .agg(count(lit(1)).as("tf"))

  /** Top-k BM25 matches: (query_id, doc_id, score, rank) — `score`
    * integer micro-nat-scaled, rank 1..k per query by (score DESC,
    * doc_id). Only documents sharing ≥ 1 term with the query appear
    * (classic BM25: no match, no score).
    */
  def bm25TopK(queries: DataFrame, corpus: DataFrame, k: Int = 3)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val post = postings(corpus)
    // corpus scalars: N docs, total length -> integer centi-token avgdl
    val stats = corpus.agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(col("text"))).cast("long")).as("total_len"))
      .select(col("n_docs"),
        expr("(100 * total_len) div n_docs").as("adl"))
    // document frequency + grid-rounded idf per term
    val idf = post.groupBy("h").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("h"),
        round((log(col("n_docs") * 2 + lit(2L))
          - log(col("df") * 2 + lit(1L))) * 1e6).cast("long").as("idf"),
        col("adl"))
    // query terms: DISTINCT unigrams per query
    val qterms = queries.select(col("doc_id").as("query_id"),
      explode(graft.expressions.TextExpressions.gramHashes60(
        tokens(col("text")), 1, distinct = true)).as("h"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    qterms
      .join(post, Seq("h"))
      .join(idf, Seq("h"))
      .select(col("query_id"), col("doc_id"),
        expr("(idf * 22 * tf * adl) div " +
          "(10 * tf * adl + 3 * adl + 900 * len)").as("c"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c").as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
