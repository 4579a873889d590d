package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators over a document table (`doc_id, text, lang,
  * source, …`) — the exact / near-dup family a training-data pipeline
  * needs (BASELINE.json north star; absent from the reference, whose only
  * "dedup" is Spark's distinct pivot values, `codes/task7.py:83`).
  *
  * Scale design (100 TB of documents):
  *   - exact dedup groups on a 128-bit content hash, never on the text —
  *     the shuffle carries 16 bytes + doc_id per row;
  *   - MinHash-LSH shuffles (band_idx, 128-bit band key) pairs; candidate
  *     generation is an equi-join on those keys, so skew is bounded by
  *     bucket size, and the quadratic Jaccard verification runs only
  *     within buckets (standard MMDS ch.3 banding);
  *   - blocked pairwise Jaccard keys the self-join on (lang, source)
  *     blocking attributes — the classic entity-resolution blocking that
  *     turns O(n²) global into Σ O(block²);
  *   - SimHash is a per-row scalar; near-dup lookups become equality on
  *     a 16-bit bucket (Manku et al., WWW'07 shape).
  */
object Dedup {

  /** Exact dedup: group on md5(text); keeper = min doc_id per group.
    * Output one row per distinct content hash.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))
      .select("keeper_id", "n_copies", "text_hash")

  /** Per-doc MinHash band keys (k=8 signature, 4 bands × 2 rows) over
    * word-2-gram shingles. This is the map-side half of LSH dedup; it's
    * also a useful artifact on its own (signatures can be stored and
    * diffed incrementally as the corpus grows). One md5 per shingle
    * (shingleHashes), then ALL 8 permutation minima in one native
    * array walk (graft.expressions.MinhashBands) instead of 8
    * interpreted array_min(transform(...)) scans.
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        graft.expressions.TextExpressions.minhashBands(
          shingleHashes(shingles2(col("text")))).as("bands"))
      .select(
        col("doc_id") +:
          (0 until 4).map(b => element_at(col("bands"), b + 1).as(s"band$b")): _*)

  /** MinHash-LSH near-dup pairs: docs sharing any band key become
    * candidates, verified with exact shingle-set Jaccard at `threshold`.
    * Output (doc_a, doc_b, jaccard) with a < b.
    *
    * Shuffle discipline (the 100 TB shape): candidate generation
    * explodes to (doc_id, band_pos, band:long) — 32 bytes/row, no text
    * — and equi-joins on (pos, band); only the surviving candidate ids
    * re-join the shingle arrays for verification, so full shingle sets
    * move for candidates only, never for the whole corpus×4 bands.
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val bands = docs
      .select(col("doc_id"),
        graft.expressions.TextExpressions.minhashBands(
          shingleHashes(shingles2(col("text")))).as("bands"))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("pos", "band")))
    // Self-join via ALIASES of one canonical projection so both sides
    // canonicalize to the same exchange (shareable at scale), and
    // PERSIST the candidate edge list: it is referenced three times
    // below (verify join + both candIds arms) and is the vanishing-
    // fraction artifact of the operator — without the persist each
    // reference re-runs the band self-join. MEMORY_AND_DISK, bounded
    // by |candidates|.
    val candidates = bands.alias("ba")
      .join(bands.alias("bb"),
        col("ba.pos") === col("bb.pos") && col("ba.band") === col("bb.band"))
      .filter(col("ba.doc_id") < col("bb.doc_id"))
      .select(col("ba.doc_id").as("doc_a"), col("bb.doc_id").as("doc_b"))
      .distinct()
      .cache()
    // shingle the candidate docs ONLY (semi-join first): verification
    // never re-derives features for the whole corpus — at scale the
    // survivors are a vanishing fraction of the input
    val candIds = candidates.select(col("doc_a").as("doc_id"))
      .union(candidates.select(col("doc_b").as("doc_id")))
      .distinct()
    val candSh = docs.join(candIds, "doc_id")
      .select(col("doc_id"), array_sort(shingles2(col("text"))).as("sh"))
    val inter = graft.expressions.TextExpressions
      .sortedIntersectCount(col("sh_a"), col("sh_b"))
    val union = size(col("sh_a")).cast("long") +
      size(col("sh_b")).cast("long") - inter
    // same aliasing trick for the two verify joins: candSh's exchange
    // is shared between the doc_a and doc_b sides
    candidates.alias("c")
      .join(candSh.alias("sa"), col("c.doc_a") === col("sa.doc_id"))
      .join(candSh.alias("sb"), col("c.doc_b") === col("sb.doc_id"))
      .select(col("c.doc_a").as("doc_a"), col("c.doc_b").as("doc_b"),
        col("sa.sh").as("sh_a"), col("sb.sh").as("sh_b"))
      .withColumn("jaccard", round(inter.cast("double") / union, 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      // total order via a SINGLE-partition sort, not orderBy: a range
      // exchange first SAMPLES its child — re-executing the expensive
      // join+verify pipeline twice. repartition(1), NOT coalesce(1):
      // coalesce is a narrow dependency that would collapse the whole
      // join+verify stage (the quadratic-in-bucket part) into ONE
      // task; the round-robin exchange keeps it parallel and shuffles
      // only the vanishing-fraction pair list into the one-task sort
      // (the reference exports single CSVs, so one output partition is
      // the right final shape at any scale)
      .repartition(1).sortWithinPartitions("doc_a", "doc_b")
  }

  /** Blocked pairwise n-gram Jaccard: self-join within (lang, source,
    * log-size bucket) blocks, word-set (1-gram) Jaccard at `threshold`.
    *
    * The size bucket is the classic LOSSLESS length filter: J(A,B) ≥ t
    * forces min(|A|,|B|)/max(|A|,|B|) ≥ t (since |A∩B| ≤ min and
    * |A∪B| ≥ max), so with buckets of width ln(1/t) on ln|set|, every
    * qualifying pair sits in the same or an adjacent bucket. One side
    * probes {k−1, k, k+1} (an explode, still a pure equi-join); pairs
    * two buckets apart are provably below threshold and never
    * materialize. Result set is IDENTICAL to the unblocked join.
    *
    * Scale effect: the join key is (lang, source, size-bucket), so a
    * dominant (en, web) corpus splinters across length buckets instead
    * of one near-cartesian block — the quadratic verify is bounded by
    * the largest same-length cohort, and key cardinality grows with the
    * corpus's length diversity, not with |lang × source|. For corpora
    * where even a single cohort is huge, compose with [[minhashPairs]]
    * (LSH banding) and keep (lang, source) as a pre-filter.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    val bucketWidth = -math.log(threshold) // ln(1/t)
    // word sets sorted ONCE per doc so the per-pair verify is a native
    // merge walk (SortedIntersectCount) instead of a hash-set build —
    // the verify is the quadratic-in-block part, the sort is linear
    val withSet = docs.select(col("doc_id"), col("lang"), col("source"),
      array_sort(wordSet(col("text"))).as("ws"))
      .withColumn("szb",
        floor(log(size(col("ws")).cast("double")) / bucketWidth).cast("long"))
    val a = withSet.select(col("lang"), col("source"),
      explode(array(col("szb") - 1, col("szb"), col("szb") + 1)).as("szb"),
      col("doc_id").as("doc_a"), col("ws").as("ws_a"))
    val b = withSet.select(col("lang"), col("source"), col("szb"),
      col("doc_id").as("doc_b"), col("ws").as("ws_b"))
    val inter = graft.expressions.TextExpressions
      .sortedIntersectCount(col("ws_a"), col("ws_b"))
    val union = size(col("ws_a")).cast("long") +
      size(col("ws_b")).cast("long") - inter
    a.join(b, Seq("lang", "source", "szb"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", round(inter.cast("double") / union, 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      // repartition(1) + single-partition sort (see minhashPairs): no
      // range-sampling double-execution, and — unlike coalesce(1) —
      // the blocked join+verify stays parallel upstream of the
      // exchange; only the surviving pair list crosses it
      .repartition(1).sortWithinPartitions("doc_a", "doc_b")
  }

  /** Per-doc 16-bit SimHash + its 8-bit prefix bucket (near-dup lookup
    * key): docs whose simhashes differ in ≤ k low bits land in the same
    * bucket with high probability.
    */
  def simhash(docs: DataFrame): DataFrame =
    // two-step projection: the 16-bit fold is interpreted (higher-order
    // aggregate has no codegen, hence no subexpression elimination), and
    // CollapseProject keeps the steps separate because the non-cheap
    // `simhash` alias is referenced twice above — so the fold evaluates
    // ONCE per row, with the bucket derived by a shift.
    docs.select(col("doc_id"), simhash16(col("text")).as("simhash"))
      .select(col("doc_id"), col("simhash"),
        shiftright(col("simhash"), 8).as("bucket"))

  /** SimHash near-dup pairs: docs sharing the 8-bit prefix bucket whose
    * 16-bit signatures differ in at most `maxHamming` bits (Manku et
    * al.'s bucket-then-verify shape; the prefix bucket is the blocking
    * key, the popcount of the XOR is the verify). Integer-exact.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // cache: the 16-bit-fold signature computation is the expensive
    // part and the self-join would otherwise evaluate it once per side
    val sigs = simhash(docs).cache()
    val a = sigs.select(col("bucket"), col("doc_id").as("doc_a"),
      col("simhash").as("sig_a"))
    val b = sigs.select(col("bucket"), col("doc_id").as("doc_b"),
      col("simhash").as("sig_b"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      // repartition(1) + single-partition sort (see minhashPairs): an
      // orderBy here would range-sample the bucket self-join + Hamming
      // verify and execute it twice; the cached signatures shield only
      // the scalar half
      .repartition(1).sortWithinPartitions("doc_a", "doc_b")
  }

  /** Dedup completion: collapse near-dup PAIRS into clusters and pick
    * one canonical survivor (min doc_id) per cluster — what a real
    * pipeline keeps. Iterative min-label propagation over the pair
    * graph (driver-coordinated loop, each step fully distributed), the
    * standard large-graph connected-components shape; near-dup
    * components are tiny so convergence is a handful of rounds.
    * Deterministic: labels converge to min reachable doc_id, so the
    * result is iteration-order independent (DuckDB verifies via a
    * recursive transitive-closure CTE).
    */
  def clusters(docs: DataFrame, pairs: DataFrame, maxIters: Int = 20,
      localThreshold: Int = 100000): DataFrame = {
    // fast path: an LSH pair graph is normally a vanishing fraction of
    // the corpus — when it fits the driver comfortably, union-find
    // locally and broadcast the mapping instead of iterating jobs.
    // Same labels either way (min doc_id per component).
    val sample = pairs.select(col("doc_a"), col("doc_b"))
      .limit(localThreshold + 1).collect()
    if (sample.length <= localThreshold) {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x
        else { val r = find(p); parent(x) = r; r }
      }
      sample.foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) { // attach the larger root under the smaller
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val mapping = parent.keys.map(x => (x, find(x))).toSeq
      val spark = docs.sparkSession
      import spark.implicits._
      val mapDf = broadcast(mapping.toDF("doc_id", "root"))
      return docs.select(col("doc_id"))
        .join(mapDf, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("root"), col("doc_id")).as("cluster_id"))
        .orderBy("doc_id")
    }

    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    // only docs touched by an edge can ever change labels — iterate on
    // that (tiny) subgraph; the untouched corpus anti-joins in at the
    // end as its own singleton clusters. At 100 TB the pair graph is a
    // vanishing fraction of the corpus, so the loop never touches the
    // bulk of the data.
    val edgeIds = edges.select(col("src").as("doc_id")).distinct().cache()
    var labels = edgeIds.select(col("doc_id"), col("doc_id").as("cluster_id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaNbr = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val next = labels.union(viaNbr)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"), "doc_id")
        .filter(col("cluster_id") < col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    val untouched = docs.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .join(edgeIds, Seq("doc_id"), "left_anti")
    untouched.union(labels).orderBy("doc_id")
  }
}
