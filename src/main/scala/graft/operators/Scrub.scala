package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass every training-data pipeline
  * runs before text leaves curation (emails, phone numbers, IP
  * addresses → placeholder tokens, with per-doc match counts kept as
  * audit columns). No counterpart in the reference (whose surface is
  * the 7 rideshare tasks); the patterns follow the C4/Dolma-style
  * regex scrubbers.
  *
  * Scale shape: pure per-row scalar work — `RegExpReplace` /
  * `RegExpCount` are codegen'd string expressions, no UDF, no
  * shuffle, no state. A 100 TB corpus streams through map-only.
  *
  * The patterns deliberately use only syntax with identical semantics
  * in Java regex (Spark) and RE2 (the DuckDB oracle): character
  * classes, bounded repetition, `\d`, and `\b` word boundaries — no
  * lookaround, no backreferences (RE2 has neither).
  */
object Scrub {

  /** Email: local part @ domain with a 2+ letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style dashed phone number (the common log/forum
    * shape; extend the alternation for other locales).
    */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 (format screen, not range validation — the
    * scrubber's job is redaction, and over-matching 999.0.0.1 is the
    * safe direction).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redaction order matters: emails first (their local/domain parts
    * can contain digit runs a later pattern might clip), then phones,
    * then IPs (dashed phones can't contain dots, so the two never
    * overlap — but the fixed order makes the composition total).
    */
  private val passes = Seq(
    EmailRe -> "<EMAIL>", PhoneRe -> "<PHONE>", Ipv4Re -> "<IP>")

  /** The redacted text for one column. */
  def redact(text: Column): Column =
    passes.foldLeft(text) { case (t, (re, tag)) =>
      regexp_replace(t, re, tag)
    }

  /** Per-doc scrub verdict: match counts per PII class (counted on the
    * ORIGINAL text, before any pass rewrites it) plus the redacted
    * text. Input must carry (doc_id, `textCol`); other columns pass
    * through untouched.
    */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("clean", redact(t))
  }

  // ---- HTML text extraction (the WARC→WET step of a web-crawl
  // pipeline: markup out, visible text + decoded entities kept) ----

  /** script / style elements with their CONTENT (which is code, not
    * text — and can contain `<`). TWO patterns, not one alternation:
    * RE2 has no backreferences, and a combined
    * `<(script|style)>.*?</(script|style)>` would let a script
    * element "close" at a `</style>` inside its code, leaking the
    * rest of the script into the extracted text. (A literal
    * `"</script>"` inside a JS string still terminates the element —
    * the browser-spec behavior, which real extractors share.) Inline
    * `(?is)`: case-insensitive + dotall, identical in Java regex and
    * RE2.
    */
  val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  val StyleRe = "(?is)<style[^>]*>.*?</style>"

  /** HTML comments, dotall (comments span lines). */
  val CommentRe = "(?s)<!--.*?-->"

  /** Any remaining tag — requires a tag-like start (`</p`, `<div`,
    * `<!DOCTYPE`), so a bare '<' in prose ("for x < 10 and y > 5")
    * is NOT eaten to the next '>' (the ADVICE r9 finding: the old
    * `<[^>]+>` deleted legitimate text between stray comparison
    * operators). Non-greedy not needed: `[^>]` self-bounds. Valid and
    * identical in Java regex and RE2 (the oracle interpolates this
    * constant).
    */
  val TagRe = "</?[a-zA-Z!][^>]*>"

  /** The fixed entity set decoded after tag removal — `&amp;` LAST,
    * so `&amp;lt;` decodes to the literal text `&lt;`, not to `<`
    * (the standard double-decode guard).
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** The extracted text for one column: drop script/style/comments
    * with their content, strip remaining tags (each becomes a space
    * so adjacent words never merge), decode the entity set, collapse
    * whitespace runs, trim.
    */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(html, ScriptRe, " "), StyleRe, " ")
    val noComment = regexp_replace(noScript, CommentRe, " ")
    val noTags = regexp_replace(noComment, TagRe, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (k, v)) =>
      replace(c, lit(k), lit(v)) // literal, not regex — same as the
        // oracle's replace()
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-doc HTML extraction: tag count on the original markup (the
    * audit column) plus the extracted text. Map-only codegen regex —
    * the identical plan runs under Structured Streaming (stateless),
    * so this IS the extract-at-ingest screen.
    */
  def extractHtml(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_tags", regexp_count(t, lit(TagRe)).cast("long"))
      .withColumn("clean_text", extractText(t))
  }

  // ---- Blocklist screening (Aho-Corasick) --------------------------------

  /** Per-doc blocklist hit count + flag over a term list of ANY size:
    * one automaton pass per row (native
    * [[graft.expressions.BlocklistHits]]) — O(len) per document
    * whatever the blocklist size, where the regex-alternation route is
    * O(terms) per position and structurally infeasible at the 100k-term
    * contraband/PII/trademark lists real pipelines screen against.
    * Hits count every (position, term) pair (overlaps and nested terms
    * included — the automaton's natural, order-free output). Map-only
    * scalar work; the automaton builds once on the driver and rides
    * the serialized expression to every task.
    */
  def blocklistHits(docs: DataFrame, terms: Seq[String],
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      graft.expressions.BlocklistExpressions
        .blocklistHits(col(textCol), terms).as("n_hits"))
      .withColumn("flagged", (col("n_hits") > 0).cast("int"))

  /** Leftmost-longest blocklist redaction (the [[redact]] discipline
    * for keyword lists instead of regexes): greedy non-overlapping
    * replacement via one trie walk per position — term-count-free
    * per-row cost, where the equivalent longest-first regex
    * alternation (which the oracle uses to replay it) re-tries every
    * alternative per position.
    */
  def blocklistScrub(docs: DataFrame, terms: Seq[String],
      replacement: String = "<TERM>",
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      graft.expressions.BlocklistExpressions
        .blocklistScrub(col(textCol), terms, replacement).as("clean"))
}
