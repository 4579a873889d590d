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
}
