package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL curation — the canonicalization layer every
  * web-scraped pretraining pipeline runs before URL-level dedup and
  * per-domain quotas (CCNet/RefinedWeb dedupe and budget by registrable
  * domain, not by raw URL string). No counterpart in the reference
  * (whose surface is the 7 rideshare tasks).
  *
  * Everything here is per-row scalar work over ONE url column: codegen
  * regex extraction and array functions — no UDF, no join, no shuffle;
  * a 100 TB crawl streams through map-only and the domain aggregation
  * downstream shuffles only (domain, stats) pairs.
  *
  * Parsing is deliberately regex-based (not `parse_url`) so the SAME
  * patterns replay verbatim in any RE2-compatible engine — the DuckDB
  * oracle runs the identical expressions; `java.net.URI` edge-case
  * behavior never enters the contract.
  */
object Web {

  /** Query parameters stripped during canonicalization: the standard
    * click-tracking keys that make one page look like many URLs.
    */
  val TrackingParams: Seq[String] = Seq("utm_source", "utm_medium",
    "utm_campaign", "utm_term", "utm_content", "gclid", "fbclid")

  /** Two-label public suffixes under which the registrable domain is
    * THREE labels (a pinned subset of the public-suffix list — the
    * full list is config, this is the contract's default).
    */
  val MultiLabelSuffixes: Seq[String] = Seq("co.uk", "ac.uk", "org.uk",
    "com.au", "co.jp", "com.br")

  /** Canonical per-URL profile:
    *   - `scheme`/`host` lowercased, port stripped from host
    *   - `path` ('' normalizes to '/'), fragment dropped
    *   - tracking params dropped, survivors kept in original order
    *   - `domain` = registrable domain (2 labels, or 3 under a
    *     [[MultiLabelSuffixes]] entry)
    *   - `clean_url` = scheme://host + path + surviving query — the
    *     URL-dedup key
    */
  def urlProfile(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val path0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // anchored pre-fragment: a legal '?' INSIDE the fragment
    // (http://h/p#sec?x=1, RFC 3986) must not read as a query string —
    // the lazy prefix [^#]*? stops at the first '?' before any '#'
    val query = regexp_extract(u, "^[^#]*?\\?([^#]*)", 1)
    val step = docs.select(col("doc_id"), scheme.as("scheme"),
      host.as("host"),
      when(path0 === "", lit("/")).otherwise(path0).as("path"),
      filter(split(query, "&"), p =>
        p =!= "" && !array_contains(lit(TrackingParams.toArray),
          substring_index(p, "=", 1))).as("_params"),
      split(host, "\\.").as("_labels"))
    val n = size(col("_labels"))
    // greatest(…, 1): slice is 1-based and throws on start 0 — a
    // single-label host must fall through to the `otherwise(host)` arm
    // without the unevaluated branches erroring
    val last2 = array_join(
      slice(col("_labels"), greatest(n - 1, lit(1)), lit(2)), ".")
    val last3 = array_join(
      slice(col("_labels"), greatest(n - 2, lit(1)), lit(3)), ".")
    val cleanQ = array_join(col("_params"), "&")
    step.select(col("doc_id"), col("scheme"), col("host"),
      when(n >= 3 &&
          array_contains(lit(MultiLabelSuffixes.toArray), last2), last3)
        .when(n >= 2, last2).otherwise(col("host")).as("domain"),
      col("path"),
      size(col("_params")).cast("long").as("n_params"),
      concat(col("scheme"), lit("://"), col("host"), col("path"),
        when(cleanQ =!= "", concat(lit("?"), cleanQ)).otherwise(lit("")))
        .as("clean_url"))
  }

  /** Registrable-domain rollup over [[urlProfile]] — the frame the
    * per-domain quota ([[Curation.sourceCap]]-style) and URL-dedup
    * stages key on. Shuffles only (domain, partial stats): map-side
    * combine keeps the exchange domain-count-sized at any corpus size.
    */
  def domainStats(profile: DataFrame): DataFrame =
    profile.groupBy("domain").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("host")).as("n_hosts"),
      countDistinct(col("clean_url")).as("n_urls"),
      sum(col("n_params")).as("sum_params"))

  /** URL-level dedup over the canonical key (the RefinedWeb first
    * stage: one crawl of a page per `clean_url`, whatever tracking
    * params or fragments the duplicates carried): survivor = min
    * doc_id per clean_url — one partial/final min-aggregate, the
    * [[Dedup.exact]] shape on the canonicalized key.
    */
  def urlDedup(profile: DataFrame): DataFrame = {
    val reps = profile.groupBy("clean_url")
      .agg(min(col("doc_id")).as("rep"))
    profile.select(col("doc_id"), col("clean_url"))
      .join(reps, Seq("clean_url"))
      .select(col("doc_id"), col("clean_url"),
        (col("doc_id") === col("rep")).cast("int").as("keep"))
  }
}
