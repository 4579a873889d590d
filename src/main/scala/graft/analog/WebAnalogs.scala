package graft.analog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Web
import graft.sources.Tables

/** Registry entries + DuckDB oracles for the web-corpus URL curation
  * layer (graft.operators.Web). The corpus has no url column, so — the
  * QualityAnalogs convention — each doc gets a deterministic
  * doc_id-keyed URL exercising every canonicalization rule: mixed-case
  * scheme/host, a WWW-case split, a multi-label public suffix in
  * UPPERCASE (suffix matching must happen after lowering), an explicit
  * port, tracking params sandwiching a real one, and a fragment.
  * Parsing is shared regex text: the oracle runs the IDENTICAL
  * patterns (both engines are RE2-compatible on this subset).
  */
object WebAnalogs {

  /** The injected-URL SQL expression, ONE text for both engines
    * (`cast` = STRING on the Spark side, VARCHAR in DuckDB).
    * `hostMod`/`pathExpr` parameterize the collision density: the
    * default (37, doc_id % 5) exercises the full canonicalization
    * rule set with mostly-distinct URLs (clean_url spacing
    * lcm(2, 37, 3, 5, 7) = 7770 — no collisions at small SFs); the
    * composed ingest screen passes hostMod 3 and a BLOCK-INDEX path
    * (doc_id div 60) so a %10-arrival collides with an accepted doc
    * exactly when an in-block ±42 partner exists — arrivals with
    * doc_id%60 ∈ {0, 10, 50} do, {20, 30, 40} don't, a fixed split
    * at EVERY shipped SF. `pathExpr` is engine-specific text (Spark
    * `div` vs DuckDB `//`), the only part of the recipe that is.
    */
  private[analog] def urlSql(cast: String, hostMod: Int = 37,
      pathExpr: String = "doc_id % 5"): String =
    s"CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END || '://' || " +
      s"CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE 'www.' END || " +
      s"'Site' || CAST(doc_id % $hostMod AS $cast) || " +
      s"CASE WHEN doc_id % 3 = 0 THEN '.CO.UK' ELSE '.com' END || " +
      s"CASE WHEN doc_id % 8 = 0 THEN ':8080' ELSE '' END || " +
      s"'/a/' || CAST($pathExpr AS $cast) || '/page' || " +
      s"CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&x=' || " +
      s"  CAST(doc_id % 7 AS $cast) || '&utm_campaign=c' ELSE '' END || " +
      s"CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END"

  /** The injected URL, one expression in both engines. */
  private def injectedUrls(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      expr(urlSql("STRING")).as("url"))

  /** The urlProfile canonicalization chain over an injected-URL
    * expression, CTE names prefixed by `p` so a composing oracle
    * (whose own chain may already use `inj`) stays collision-free.
    * Yields `${p}prof(doc_id, scheme, host, domain, path, n_params,
    * clean_url)`.
    */
  private[analog] def dUrlCteFor(injExpr: String, p: String = ""): String = {
    val tracking = Web.TrackingParams
      .map(x => s"'$x'").mkString("[", ", ", "]")
    val suffixes = Web.MultiLabelSuffixes
      .map(sx => s"'$sx'").mkString("[", ", ", "]")
    s"""${p}inj AS (
    |  SELECT doc_id, $injExpr AS url
    |  FROM documents),
    |${p}parts AS (
    |  SELECT doc_id,
    |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
    |      AS scheme,
    |    lower(regexp_extract(
    |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
    |      '^([^:]*)', 1)) AS host,
    |    regexp_extract(url,
    |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path0,
    |    regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS q
    |  FROM ${p}inj),
    |${p}arrs AS (
    |  SELECT doc_id, scheme, host,
    |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
    |    list_filter(string_split(q, '&'), p -> p <> ''
    |      AND NOT list_contains($tracking,
    |        CASE WHEN instr(p, '=') = 0 THEN p
    |          ELSE p[1:instr(p, '=') - 1] END)) AS params,
    |    string_split(host, '.') AS labels
    |  FROM ${p}parts),
    |${p}prof AS (
    |  SELECT doc_id, scheme, host,
    |    CASE WHEN len(labels) >= 3 AND list_contains($suffixes,
    |        array_to_string(labels[len(labels)-1:], '.'))
    |      THEN array_to_string(labels[len(labels)-2:], '.')
    |      WHEN len(labels) >= 2
    |      THEN array_to_string(labels[len(labels)-1:], '.')
    |      ELSE host END AS domain,
    |    path, CAST(len(params) AS BIGINT) AS n_params,
    |    scheme || '://' || host || path ||
    |      CASE WHEN array_to_string(params, '&') <> ''
    |        THEN '?' || array_to_string(params, '&') ELSE '' END
    |      AS clean_url
    |  FROM ${p}arrs)""".stripMargin
  }

  private lazy val dUrlCte: String = dUrlCteFor(urlSql("VARCHAR"))

  val queries: Seq[Q] = Seq(

    Q("web_url_profile",
      (s, d) => Web.urlProfile(injectedUrls(s, d)).orderBy("doc_id"),
      Some(s"""WITH $dUrlCte
        |SELECT doc_id, scheme, host, domain, path, n_params, clean_url
        |FROM prof ORDER BY doc_id""".stripMargin)),

    // Registrable-domain rollup: the frame per-domain quotas and
    // URL-level dedup key on. Map-side combine keeps the exchange
    // domain-count-sized; the oracle folds the same profile CTE.
    Q("web_domain_stats",
      (s, d) => Web.domainStats(Web.urlProfile(injectedUrls(s, d)))
        .orderBy("domain"),
      Some(s"""WITH $dUrlCte
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
        |  CAST(count(DISTINCT clean_url) AS BIGINT) AS n_urls,
        |  CAST(sum(n_params) AS BIGINT) AS sum_params
        |FROM prof GROUP BY domain ORDER BY domain""".stripMargin)),

    // URL-level dedup (the RefinedWeb first stage): one crawl per
    // canonical clean_url — different tracking params / fragments /
    // case on the same page collapse to one survivor (min doc_id).
    // The injected URLs collide by construction: doc_ids sharing
    // (parity, %37, %3, %5) produce the SAME clean_url whatever their
    // %8 port and %7 utm payload differences.
    Q("web_url_dedup",
      (s, d) => Web.urlDedup(Web.urlProfile(injectedUrls(s, d)))
        .orderBy("doc_id"),
      Some(s"""WITH $dUrlCte,
        |reps AS (
        |  SELECT clean_url, min(doc_id) AS rep
        |  FROM prof GROUP BY clean_url)
        |SELECT p.doc_id, p.clean_url,
        |  CAST(CASE WHEN p.doc_id = r.rep THEN 1 ELSE 0 END AS INT)
        |    AS keep
        |FROM prof p JOIN reps r USING (clean_url)
        |ORDER BY p.doc_id""".stripMargin)),

    // Per-DOMAIN quality quota: the web family keyed into the
    // curation family's bounded-heap per-key top-k
    // (Curation.capPerSource with source = registrable domain) —
    // cross-family composition, map-side k-element heaps, the shuffle
    // carries <= cap entries per domain whatever the crawl size.
    Q("web_domain_cap",
      (s, d) => {
        val dom = Web.urlProfile(injectedUrls(s, d))
          .select(col("doc_id"), col("domain"))
        val docs = Tables.documents(s, d).select("doc_id", "text")
          .join(dom, Seq("doc_id"))
          .select(col("domain").as("source"), col("doc_id"), col("text"))
        graft.operators.Curation.capPerSource(docs, 5)
          .withColumnRenamed("source", "domain")
          .orderBy("domain", "rank")
      },
      Some(s"""WITH $dUrlCte,
        |tok AS (
        |  SELECT p.domain AS source, d.doc_id,
        |    string_split(d.text, ' ') AS w
        |  FROM documents d JOIN prof p USING (doc_id)),
        |q AS (
        |  SELECT source, doc_id, ${ExtraAnalogs.dQuality} AS quality
        |  FROM tok),
        |r AS (
        |  SELECT source, doc_id, quality,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY quality DESC, doc_id) AS rank
        |  FROM q)
        |SELECT source AS domain, doc_id, quality,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY domain, rank""".stripMargin))
  )
}
