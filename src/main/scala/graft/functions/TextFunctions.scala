package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks for the LLM-training-data pipeline
  * operators (dedup / similarity / text analysis — BASELINE.json north
  * star, beyond the reference's own surface which has no text ops at all;
  * the reference's closest relative is its string `concat_ws` route label,
  * `codes/task3.py:109`).
  *
  * Everything here is composed from `org.apache.spark.sql.functions` only
  * — no UDFs — so every expression stays inside whole-stage codegen and
  * is portable: each has an exact DuckDB-SQL equivalent used by the
  * verify oracle (graft.analog.ExtraAnalogs). Determinism contract:
  *   - hashes derive from md5 (identical hex in Spark and DuckDB),
  *   - folds are left-to-right with an explicit zero (matches DuckDB
  *     `list_reduce(list_prepend(zero, xs), …)`),
  *   - integer arithmetic throughout the hash paths (no FP drift).
  *
  * Scale notes (100 TB): all of these are per-row scalar expressions —
  * embarrassingly parallel, no shuffle, no state. The only data movement
  * any downstream dedup/similarity operator needs is the group-by /
  * join on the *short* derived keys (16-hex band keys, 16-bit buckets),
  * never on the raw text.
  */
object TextFunctions {

  /** Whitespace tokens (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word set — the 1-gram shingle set. */
  def wordSet(text: Column): Column = array_distinct(tokens(text))

  /** Distinct word `n`-gram shingles via iterated `zip_with`: each
    * shifted side pads with null and `concat` propagates it, so
    * trailing partial n-grams drop out in the filter — no
    * `sequence()` edge cases on docs shorter than n words.
    */
  def shinglesN(text: Column, n: Int): Column =
    shinglesNTokens(tokens(text), n)

  /** [[shinglesN]] over a pre-tokenized array — lets a caller that
    * already carries a token column skip re-splitting the text
    * (tokenization is a regex split per evaluation; Catalyst has no
    * CSE for it).
    */
  def shinglesNTokens(w: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val joined = (2 to n).foldLeft(w) { (acc, i) =>
      zip_with(acc, slice(w, lit(i), size(w)), (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(filter(joined, x => x.isNotNull))
  }

  /** Distinct word-2-gram shingles: "w1 w2" for each adjacent pair. */
  def shingles2(text: Column): Column = shinglesN(text, 2)

  /** POSITIONAL word n-gram sequence — duplicates and order kept
    * (what winnowing needs; [[shinglesNTokens]] is the distinct-set
    * variant).
    */
  def shingleSeqTokens(w: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val joined = (2 to n).foldLeft(w) { (acc, i) =>
      zip_with(acc, slice(w, lit(i), size(w)), (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, x => x.isNotNull)
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    * the MOSS algorithm): hash every positional word `k`-gram, slide
    * a window of `win` consecutive hashes, keep each window's
    * minimum, dedup. Guarantees any shared substring of at least
    * k + win − 1 words produces a shared fingerprint, while storing
    * ~2/(win+1) of the k-gram hashes — the standard local-similarity
    * sketch between exact hashing (too strict) and set-based minhash
    * (order-blind).
    *
    * Short-doc convention: fewer than `win` k-grams → one fingerprint
    * (the global min); no k-grams (doc under k words) → empty.
    * Sorted for deterministic export.
    */
  def winnowFingerprints(text: Column, k: Int = 3, win: Int = 4): Column = {
    require(k >= 1 && win >= 1, s"k and win must be >= 1, got k=$k win=$win")
    // the hash array is the CHILD of one native expression, so the
    // per-k-gram md5 chain evaluates once per row; the composed
    // transform(sequence, i -> array_min(slice(hs, i, win))) shape
    // re-evaluated that chain per window position (interpreted
    // higher-order funcs have no CSE) — quadratic in doc length.
    // The child itself is the fused positional GramHashes walk (same
    // values as transform(shingleSeqTokens, wordHash60) — the
    // interpreted zip_with + hex-roundtrip md5 chain it replaced).
    graft.expressions.TextExpressions.winnowMins(
      graft.expressions.TextExpressions.gramHashes60(
        tokens(text), k, distinct = false), win)
  }

  /** Unicode NFC canonical composition (native
    * [[graft.expressions.NfcNormalize]]) — run BEFORE md5/exact-dedup
    * on corpora that may carry decomposed forms: "é" as one codepoint
    * and as e + combining acute are byte-different but canonically
    * equal. DuckDB equivalent: `nfc_normalize(text)`.
    */
  def normalizeNfc(text: Column): Column =
    graft.expressions.TextExpressions.nfcNormalize(text)

  /** Portable 32-bit word hash: first 8 hex digits of md5, parsed to a
    * long. DuckDB equivalent: `('0x' || substr(md5(w),1,8))::BIGINT`.
    */
  def wordHash(w: Column): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long")

  /** MinHash universal-hash family (a_i·h + b_i mod p): one md5 per
    * shingle (via [[shingleHashes]]) and then 8 integer permutations —
    * higher-order array functions are interpreted (not codegen'd), so
    * trading 8 md5 evaluations per shingle for 8 multiply-adds is the
    * difference between 11 s and ~2 s on the sf0.1 pair query.
    */
  val MinhashP: Long = 1000000007L
  val MinhashA: Seq[Long] = Seq(1803059L, 3204979L, 5447717L, 7368787L,
    9653287L, 11935979L, 13933187L, 15485863L)
  val MinhashB: Seq[Long] = Seq(49979687L, 67867967L, 86028121L, 104395301L,
    122949823L, 141650939L, 160481183L, 179424673L)

  /** Integer hashes of the shingle set, reduced mod p — computed ONCE
    * per row and materialized as a column so the 8 permutations below
    * are pure arithmetic over it.
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => pmod(wordHash(s), lit(MinhashP)))

  /** Fused [[shingleHashes]] ∘ [[shinglesN]] over raw text: one native
    * walk (graft.expressions.GramHashes at 8 hex digits mod p) —
    * identical values; the minhash queries' dominant scalar cost was
    * this composition's interpreted zip_with + per-gram hex-md5 chain.
    */
  def shingleHashesN(text: Column, n: Int = 2): Column =
    graft.expressions.TextExpressions.gramHashesMod(tokens(text), n)

  /** MinHash component i over pre-hashed shingles. Empty set → null. */
  def minhashInt(hs: Column, i: Int): Column =
    array_min(transform(hs,
      h => pmod(lit(MinhashA(i)) * h + lit(MinhashB(i)), lit(MinhashP))))

  /** LSH band key `j` (r=2 rows per band) as one long:
    * sig[2j]·1000003 + sig[2j+1]. Docs agreeing on both rows of band j
    * get equal keys and become candidate pairs via an equi-join; an
    * 8-byte key keeps the candidate shuffle narrow.
    */
  def bandKeyInt(hs: Column, band: Int): Column =
    minhashInt(hs, 2 * band) * lit(1000003L) + minhashInt(hs, 2 * band + 1)

  /** 16-bit SimHash over the distinct word set: bit b is set iff the
    * count of words whose hash has bit b outweighs those that don't
    * (strictly positive sum of ±1). Exact integer arithmetic; the fold
    * is the native one-pass codegen expression
    * (graft.expressions.SimhashFold) — 16 interpreted per-bit
    * `aggregate` folds collapsed into one array walk.
    */
  def simhash16(text: Column): Column =
    graft.expressions.TextExpressions.simhashFold(
      transform(wordSet(text), wordHash(_)))

  /** Portable 60-bit word hash: first 15 hex digits of md5. 60 bits
    * (not 64) so the value — and any signature folded from it — stays
    * strictly positive in both engines' signed int64. DuckDB
    * equivalent: `('0x' || substr(md5(w),1,15))::BIGINT`.
    */
  def wordHash60(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** 60-bit SimHash over the distinct word set — the near-dup
    * fingerprint width Manku et al. (WWW'07) run at web scale (their
    * 64-bit, trimmed to 60 for signed-int64 portability). The 16-bit
    * sketch saturates on a large corpus (at 5k docs two-thirds of ALL
    * pairs sit within Hamming 3 of each other — measured); at 60 bits
    * Hamming ≤ 3 identifies genuinely near-identical documents.
    */
  def simhash60(text: Column): Column =
    graft.expressions.TextExpressions.simhashFold(
      transform(wordSet(text), wordHash60(_)), 60)

  /** Order-sensitive document fingerprint: left fold of
    * h = (h * 131 + wordHash(w)) mod 1e9+7 over the token sequence.
    * Word-order changes the value (unlike the set-based signatures),
    * so it distinguishes permuted near-dups that share a word set.
    */
  def fingerprint(text: Column): Column =
    aggregate(transform(tokens(text), wordHash(_)), lit(0L),
      (acc, h) => pmod(acc * 131 + h, lit(1000000007L)))

  /** Normalization: lowercase, strip non-alphanumerics (keeping
    * spaces), collapse whitespace runs, trim — the canonical form fed
    * to hashing/dedup so cosmetic variation doesn't defeat matching.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Tokens with stopwords removed (the `langMarkers` "en" list plays
    * the stopword list; swap in a fuller list at deployment).
    */
  def removeStopwords(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    filter(tokens(text), t => !array_contains(sw, t))
  }

  /** Occurrence count of marker words (stopword hits). Counts
    * occurrences, not distinct hits — ratio-friendly.
    */
  def markerHits(text: Column, markers: Seq[String]): Column =
    markerHitsTokens(tokens(text), markers)

  /** [[markerHits]] over a pre-tokenized array (see
    * [[shinglesNTokens]] for why).
    */
  def markerHitsTokens(w: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(w, t => array_contains(m, t))).cast("long")
  }

  /** Tiny per-language stopword marker lists for the heuristic
    * language-ID operator. Public common-word lists, nothing learned.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Heuristic language prediction: argmax of marker hits with a fixed
    * priority order (first listed wins ties — including the all-zero
    * case, which defaults to "en").
    */
  def langPredict(text: Column): Column = langPredictTokens(tokens(text))

  /** [[langPredict]] over a pre-tokenized array (see
    * [[shinglesNTokens]] for why — this one otherwise re-splits the
    * text once per language).
    */
  def langPredictTokens(w: Column): Column = {
    val scores = langMarkers.map { case (l, ms) => l -> markerHitsTokens(w, ms) }
    // lang i wins if its score >= every later lang's score (ties break
    // toward earlier entries; the CASE chain encodes that order).
    val cases = scores.zipWithIndex.init.map { case ((l, s), i) =>
      val beatsRest = scores.drop(i + 1)
        .map { case (_, s2) => s >= s2 }.reduce(_ && _)
      (beatsRest, lit(l))
    }
    cases.foldRight(lit(langMarkers.last._1): Column) {
      case ((cond, l), e) => when(cond, l).otherwise(e)
    }
  }
}
