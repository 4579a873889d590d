package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rideshare.VisReport

/** Corpus datasheet (Gebru et al. 2021, "Datasheets for Datasets" —
  * the data card a curated training corpus ships with), composed
  * entirely from the already-oracle-verified pipeline operators:
  * table profile, per-source mixture, language distribution, exact-dup
  * rate, and Gopher quality pass rates, rendered as deterministic
  * markdown + one mixture SVG (the [[graft.rideshare.VisReport]]
  * renderers — byte-identical output on identical inputs, no plotting
  * dependency).
  *
  * Scale shape: every input frame is an AGGREGATE — column stats
  * (one row per column), per-source/per-language rollups (k rows),
  * two 1-row counts — so the collects behind the markdown tables are
  * bounded by schema width and source/language cardinality, never the
  * corpus (the VisReport boundary argument: the reference's own
  * notebooks collect the same aggregate shapes into pandas).
  */
object Datasheet {

  /** Render the datasheet artifacts: (artifact name, content). */
  def render(docs: DataFrame): Seq[(String, String)] = {
    val profile = Profile.profile(docs)
    val mix = Decontam.domainMix(docs)
    val mixRows = mix.collect() // k sources; reused for table + figure
    val lang = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang")
    val dup = Dedup.exact(docs)
      .agg(count(lit(1)).as("n_distinct_texts"),
        sum("n_copies").as("n_docs"),
        coalesce(sum(when(col("n_copies") >= 2, col("n_copies") - 1)),
          lit(0L)).as("n_exact_dups"))
    val quality = QualityFilters.gopherRules(docs)
      .agg(count(lit(1)).as("n_docs"), sum("pass").as("n_pass"),
        sum("g_words").as("n_words_ok"), sum("g_len").as("n_len_ok"),
        sum("g_sym").as("n_sym_ok"), sum("g_alpha").as("n_alpha_ok"),
        sum("g_stop").as("n_stop_ok"))

    val md = new StringBuilder
    md.append("# Corpus datasheet\n\n")
    md.append("## Column profile\n\n")
    md.append(VisReport.markdownTable(profile))
    md.append("\n## Source mixture (token shares, uniform-target weights)\n\n")
    md.append(VisReport.markdownTable(mix.columns.toSeq, mixRows.toSeq, 200))
    md.append("\n## Language distribution\n\n")
    md.append(VisReport.markdownTable(lang))
    md.append("\n## Exact duplication\n\n")
    md.append(VisReport.markdownTable(dup))
    md.append("\n## Gopher quality rule pass counts\n\n")
    md.append(VisReport.markdownTable(quality))

    val svg = VisReport.groupedBarSvg(
      mixRows.map(r => (r.getString(0), "token_share",
        r.getDouble(3))).toSeq,
      "Source mixture — token share per source", "share")
    Seq("corpus_datasheet.md" -> md.toString,
      "corpus_mixture.svg" -> svg)
  }
}
