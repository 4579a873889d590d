package graft.operators

import org.apache.spark.sql.DataFrame
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
  *   - The tf normalization is ONE truncating integer division per
  *     (term, doc): with k1 = 6/5 and b = 3/4,
  *       term = idf · 220·tf ÷ (100·tf + 30 + dln)
  *     where dln = (9000·len) div adl is the doc's pre-truncated
  *     length penalty against the integer centi-token average doc
  *     length adl = (100·ΣL) div N — adl carries the factor-100
  *     centi-token scale, so 90·len/avgdl = 9000·len/adl, and at
  *     len = avgdl the whole term reduces to exactly idf at tf = 1
  *     (220/(100+30+90)). (Pre-truncating the len/adl ratio
  *     — instead of multiplying the whole fraction through by adl —
  *     keeps every intermediate bounded by idf·220·tf, NOT by
  *     tf·adl·idf, which at corpus scale quietly wrapped int64 for
  *     long documents.)
  *   - tf is clamped at [[TfClamp]] before scoring: BM25 saturates in
  *     tf anyway (at 2²⁵ the term is within 1e-5 of its asymptote for
  *     any real dln), and the clamp is what makes the int64 headroom
  *     unconditional — idf ≤ 2.8e7 (N = 10¹²) × 220 × 2²⁵ ≈ 2.1e17.
  *     The one remaining documented bound: dln needs 9000·len within
  *     int64, i.e. documents under ~10¹⁵ tokens.
  *   - score(q, d) = Σ over shared terms — a sum of integers.
  *
  * Scale shape: postings = one fused gram explode over the corpus
  * (term hash, tf) plus a doc-length column; df and the two corpus
  * scalars are one aggregation each; query terms (distinct per query)
  * equi-join the scored postings index on the 8-byte term hash — the
  * inverted-index probe — then one (query, doc) aggregation and a
  * per-query bounded-heap top-k ([[graft.expressions.TopKAgg]]) over
  * the MATCHED docs only (never the full corpus): each map task
  * reduces its slice to a k-element heap, so the final shuffle
  * carries ≤ k rows per query per partition instead of the full
  * matched-doc stream a window sort would move. Queries are expected
  * to be few relative to the corpus; the postings side streams,
  * nothing corpus-sized is broadcast.
  *
  * The df cap (`maxDfPermille`) is what makes the probe scale-safe on
  * REAL text: term frequencies are Zipfian, so a query containing
  * "the" would otherwise fan out against nearly every document in the
  * corpus while contributing idf ≈ 0 to every score. Terms whose df
  * exceeds the cap are dropped from the INDEX (the standard stop-word
  * cut — [[Dedup]]'s df-capped substring anchors are the in-house
  * precedent), bounding the per-term join fan-out at
  * maxDfPermille·N/1000 and barely perturbing scores. The default 900
  * (90% of documents) only fires on genuinely boilerplate terms.
  */
object Retrieval {

  /** tf saturation clamp (see class doc): keeps idf·220·tf within
    * int64 at any corpus size while changing no realistic score.
    */
  val TfClamp: Long = 1L << 25

  /** Default df cap: drop terms appearing in > 90% of documents. */
  val DefaultMaxDfPermille = 900

  /** (doc_id, h, tf, len): the corpus posting table — term-hash
    * occurrence counts plus the document's token length. One fused
    * native gram walk ([[graft.expressions.TextExpressions
    * .gramHashes60]], positional so multiplicity survives), one
    * groupBy.
    */
  def postings(corpus: DataFrame): DataFrame =
    // fanned out (round 18): the md5-per-token walk is the index
    // build's dominant scalar cost and a single-row-group scan runs it
    // on one core; Par.fanOut no-ops when the scan already
    // parallelizes, and tf/df/idf are integer-exact under any row
    // placement
    graft.sources.Par.fanOut(corpus)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("len"),
        explode(graft.expressions.TextExpressions.gramHashes60(
          tokens(col("text")), 1, distinct = false)).as("h"))
      .groupBy("doc_id", "len", "h")
      .agg(count(lit(1)).as("tf"))

  /** The SCORED postings index: (h, doc_id, tf, dln, idf) — postings
    * with the grid-rounded idf attached and the doc length penalty
    * dln = (9000·len) div adl pre-truncated, df-capped (terms in
    * more than `maxDfPermille`‰ of documents are dropped — idf ≈ 0,
    * unbounded fan-out; see class doc). This is the static artifact a
    * deployment builds once over the accepted corpus and probes from
    * [[bm25TopK]] and the streaming screen
    * ([[graft.streaming.DocStreams.bm25Screen]]) alike — one builder,
    * so batch and stream scoring cannot drift.
    */
  def bm25Index(corpus: DataFrame,
      maxDfPermille: Int = DefaultMaxDfPermille): DataFrame = {
    require(maxDfPermille >= 1 && maxDfPermille <= 1000,
      s"maxDfPermille must be in [1,1000], got $maxDfPermille")
    val post = postings(corpus)
    // corpus scalars: N docs, total length -> integer centi-token avgdl
    // (fanned out — this is a second full tokenize walk of the corpus)
    val stats = graft.sources.Par.fanOut(corpus).agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(col("text"))).cast("long")).as("total_len"))
      .select(col("n_docs"),
        expr("(100 * total_len) div n_docs").as("adl"))
    // document frequency + grid-rounded idf per surviving term
    val idf = post.groupBy("h").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .filter(col("df") * 1000 <= col("n_docs") * maxDfPermille)
      .select(col("h"),
        round((log(col("n_docs") * 2 + lit(2L))
          - log(col("df") * 2 + lit(1L))) * 1e6).cast("long").as("idf"),
        col("adl"))
    post.join(idf, Seq("h"))
      .select(col("h"), col("doc_id"), col("tf"),
        expr("(9000 * len) div adl").as("dln"), col("idf"))
  }

  /** (query_id, h): DISTINCT unigram hashes per query — the probe
    * side of the inverted index, shared by [[bm25TopK]] and the
    * streaming screen.
    */
  def queryTerms(queries: DataFrame): DataFrame =
    queries.select(col("doc_id").as("query_id"),
      explode(graft.expressions.TextExpressions.gramHashes60(
        tokens(col("text")), 1, distinct = true)).as("h"))

  /** The per-(term, doc) integer score contribution (see class doc). */
  private[graft] val termScore =
    expr(s"(idf * 220 * least(tf, $TfClamp)) div " +
      s"(100 * least(tf, $TfClamp) + 30 + dln)")

  /** Top-k BM25 matches: (query_id, doc_id, score, rank) — `score`
    * integer micro-nat-scaled, rank 1..k per query by (score DESC,
    * doc_id). Only documents sharing ≥ 1 sub-cap term with the query
    * appear (classic BM25: no match, no score).
    *
    * Ranking runs through the bounded-heap
    * [[graft.expressions.TopKAgg]] (the [[Similarity.pqTopK]] shape),
    * NOT a row_number window: the window had to shuffle and sort the
    * whole matched-pair frame per query, while the heap gets map-side
    * partial aggregation — ≤ k rows per (query, partition) cross the
    * wire. The double heap score is exact: a per-term contribution is
    * ≤ 2.2·idf ≤ 6.2e7 micro-nats (idf caps at ~2.8e7 for N = 10¹²),
    * so integer scores stay below 2⁵³ for any query under ~10⁸
    * distinct terms. The heap tie-breaks (score DESC, label ASC) with
    * label the zero-padded doc_id, identical to the window's
    * (score DESC, doc_id) order for the non-negative doc_ids the
    * engine mints (the pqTopK label convention).
    */
  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of N rankings — the standard hybrid-retrieval combiner: each
    * list contributes 10⁶ div (kRrf + rank) integer micro-units per
    * (query, neighbor), fused score = the sum, top-k per query by
    * (score DESC, neighbor ASC). Rank-based, so METRIC-INCOMPATIBLE
    * backends fuse soundly (a cosine ANN list and a compressed-domain
    * L2 list, or BM25 against either — scores never compare across
    * lists, only ranks do); the truncating integer division keeps the
    * fusion engine-exact. Inputs need (query_id, neighbor_id, rank);
    * extra columns are ignored.
    *
    * Scale shape: per query each input list is k' rows (the backends
    * already bounded their own top-k), so the union, the per-pair
    * sum, and the [[graft.expressions.TopKAgg]] heap all run on
    * N·k'-row groups — nothing corpus-sized moves.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 3,
      kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1 && kRrf >= 0, s"bad k=$k / kRrf=$kRrf")
    rankings
      .map(_.select(col("query_id"), col("neighbor_id"),
        expr(s"1000000 div ($kRrf + rank)").as("c")))
      .reduce(_ unionByName _)
      .groupBy("query_id", "neighbor_id")
      .agg(sum("c").as("rrf"))
      .groupBy("query_id")
      .agg(graft.expressions.TopKAgg.topK(
        col("rrf").cast("double"),
        format_string("%012d", col("neighbor_id")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"),
        col("t.label").cast("long").as("neighbor_id"),
        col("t.score").cast("long").as("rrf"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Hard-negative mining for retrieval training (the DPR/contrastive
    * recipe): per query, the top lexical BM25 candidates that are NOT
    * near-duplicates of the query — lexically close enough to be hard,
    * screened so an actual duplicate (a false negative that would
    * poison the contrastive loss) never ships as a negative. The
    * near-dup screen is the MinHash band collision ([[Dedup]]'s LSH
    * banding — any shared band ⇒ candidate duplicate ⇒ dropped).
    *
    * Shape: BM25 over-fetches k·`overfetch` candidates (bounded,
    * query-sized), the candidate frame joins its own and the corpus
    * signatures — candidates BROADCAST, the corpus signature side
    * streams — and survivors re-rank through the bounded-heap
    * [[graft.expressions.TopKAgg]]. Nothing corpus-sized shuffles
    * beyond the signature scan.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int = 5,
      overfetch: Int = 2,
      maxDfPermille: Int = DefaultMaxDfPermille,
      index: Option[DataFrame] = None,
      corpusSigs: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && overfetch >= 1, s"bad k=$k / overfetch=$overfetch")
    val cands = bm25TopK(queries, corpus, k * overfetch, maxDfPermille,
        index)
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        col("score"))
    val qs = Dedup.minhashSignatures(queries.select("doc_id", "text"))
      .select(col("doc_id").as("query_id") +:
        (0 until 4).map(b => col(s"band$b").as(s"qb$b")): _*)
    // the corpus signature table is a stored ingest-time artifact in a
    // deployment (the streaming near-dup screen already mines it);
    // accept it pre-mined so the corpus-sized signature scan amortizes
    // across the retrieval family instead of re-running per call
    val cs = corpusSigs
      .getOrElse(Dedup.minhashSignatures(corpus.select("doc_id", "text")))
      .select(col("doc_id").as("neighbor_id") +:
        (0 until 4).map(b => col(s"band$b").as(s"cb$b")): _*)
    val dup = (0 until 4).map(b => col(s"qb$b") === col(s"cb$b"))
      .reduce(_ || _)
    cs.join(broadcast(cands.join(qs, Seq("query_id"))),
        Seq("neighbor_id"))
      .filter(!dup)
      .groupBy("query_id")
      .agg(graft.expressions.TopKAgg.topK(
        col("score").cast("double"),
        format_string("%012d", col("neighbor_id")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"),
        col("t.label").cast("long").as("neighbor_id"),
        col("t.score").cast("long").as("score"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** (doc_id, n_occ): exact whitespace-token phrase occurrence counts
    * per document, zero rows for non-matching docs. One map-only
    * corpus scan — the phrase test is a native higher-order filter
    * over the token array (`size(filter(sequence..))`), so no token
    * explode, no join and no shuffle happen at all until the caller
    * aggregates. For an ad-hoc phrase over a raw 100 TB corpus this
    * beats any inverted-index probe that does not already exist: a
    * positional-postings join would explode and shuffle every
    * occurrence of the phrase's individual words (Zipf-huge for
    * common words) to then discard all non-adjacent ones, while this
    * plan reads each document once and emits at most one row.
    * Occurrences may overlap (count at every start position), the
    * standard convention and the one a positional index replays.
    */
  def phraseCounts(corpus: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    require(phrase.forall(t => t.nonEmpty && !t.exists(c =>
      c == ' ' || c == '\'' || c == '\\')),
      s"phrase tokens must be non-empty, space/quote/backslash-free: $phrase")
    val k = phrase.length
    val matchAt = phrase.zipWithIndex.map { case (t, i) =>
      s"element_at(w, cast(i + $i as int)) = '$t'"
    }.mkString(" AND ")
    corpus
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        when(size(col("w")) >= k,
          expr(s"size(filter(sequence(1L, size(w) - ${k - 1}L), i -> $matchAt))"))
          .otherwise(lit(0)).cast("long").as("n_occ"))
      .filter(col("n_occ") > 0)
  }

  /** Top-k documents by exact phrase occurrence count (ties broken by
    * doc_id asc). Single global top-k over the map-only
    * [[phraseCounts]] scan — Catalyst turns the sort+limit into
    * `TakeOrderedAndProject`, so each task keeps a k-row heap and the
    * driver merges ≤ k rows per partition; the corpus never sorts.
    */
  def phraseTopK(corpus: DataFrame, phrase: Seq[String], k: Int = 10)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    phraseCounts(corpus, phrase)
      .orderBy(col("n_occ").desc, col("doc_id"))
      .limit(k)
  }

  def bm25TopK(queries: DataFrame, corpus: DataFrame, k: Int = 3,
      maxDfPermille: Int = DefaultMaxDfPermille,
      index: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // `index` = a stored [[bm25Index]] artifact (the streaming screen's
    // static-index convention): a deployment builds the scored postings
    // once over the accepted corpus and probes it per query batch
    val idx = index.getOrElse(bm25Index(corpus, maxDfPermille))
    queryTerms(queries)
      .join(idx, Seq("h"))
      .select(col("query_id"), col("doc_id"), termScore.as("c"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c").as("score"))
      .groupBy("query_id")
      .agg(graft.expressions.TopKAgg.topK(
        col("score").cast("double"), format_string("%012d", col("doc_id")),
        k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"),
        col("t.label").cast("long").as("doc_id"),
        col("t.score").cast("long").as("score"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }
}
