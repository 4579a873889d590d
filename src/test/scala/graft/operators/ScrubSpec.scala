package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ScrubSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.createDataFrame(Seq(
    (0L, "mail me at jo.doe+spam@sub.example.org today"),
    (1L, "call 555-867-5309 or 555-123-4567 now"),
    (2L, "server at 192.168.0.1 and backup 10.0.0.255"),
    (3L, "clean text with no pii at all"),
    (4L, "mixed a@b.io then 555-000-1111 then 8.8.8.8"),
    (5L, "")))
    .toDF("doc_id", "text")

  test("scrubPii counts each class on the original text") {
    val got = Scrub.scrubPii(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Array(
      (0L, 1L, 0L, 0L), (1L, 0L, 2L, 0L), (2L, 0L, 0L, 2L),
      (3L, 0L, 0L, 0L), (4L, 1L, 1L, 1L), (5L, 0L, 0L, 0L)))
  }

  test("redaction replaces every match with its class tag") {
    val clean = Scrub.scrubPii(docs).orderBy("doc_id").collect()
      .map(_.getString(5))
    assert(clean(0) === "mail me at <EMAIL> today")
    assert(clean(1) === "call <PHONE> or <PHONE> now")
    assert(clean(2) === "server at <IP> and backup <IP>")
    assert(clean(4) === "mixed <EMAIL> then <PHONE> then <IP>")
  }

  test("pii-free text passes through byte-identical") {
    val clean = Scrub.scrubPii(docs).orderBy("doc_id").collect()
      .map(_.getString(5))
    assert(clean(3) === "clean text with no pii at all")
    assert(clean(5) === "")
  }

  test("phone and ip word boundaries: digit runs inside words don't match") {
    val tricky = spark.createDataFrame(Seq(
      // no \b match: digits flush against letters
      (0L, "id ab555-123-4567cd and v1.2.3.4beta"),
      // punctuation IS a boundary: parenthesized ip and dotted sentence end
      (1L, "see (10.1.2.3) and call 555-123-4567.")))
      .toDF("doc_id", "text")
    val got = Scrub.scrubPii(tricky).orderBy("doc_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got(0) === ((0L, 0L, 0L, "id ab555-123-4567cd and v1.2.3.4beta")))
    assert(got(1) === ((0L, 1L, 1L, "see (<IP>) and call <PHONE>.")))
  }

  test("extractHtml strips markup with content rules and decodes entities") {
    val html = spark.createDataFrame(Seq(
      (0L, "<html><body><p>hello <b>world</b></p>" +
        "<script>if (a<b) { x(); }</script></body></html>"),
      (1L, "no markup at all"),
      (2L, "&amp;lt; stays &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end"),
      (3L, "<!-- secret <hidden> -->visible<style>p { color: red; }</style>"),
      (4L, "<SCRIPT>case();</SCRIPT>upper survives"),
      (5L, "")))
      .toDF("doc_id", "text")
    val got = Scrub.extractHtml(html).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    // n_tags = the same TagRe applied by plain Java regex (pins the
    // column to the count-on-ORIGINAL-markup contract)
    html.collect().foreach { r =>
      val want = Scrub.TagRe.r.findAllIn(r.getString(1)).length.toLong
      assert(got(r.getLong(0).toInt)._2 === want)
    }
    assert(got.map(_._3) === Array(
      "hello world", // script CODE (with its bare '<') gone
      "no markup at all",
      "&lt; stays <tag> \"q\" 's' end", // &amp;-last double-decode guard
      "visible", // comment + style content gone
      "upper survives", // (?i): SCRIPT matches
      ""))
  }

  test("a script element never terminates at a </style> in its code") {
    // the single-alternation pattern <(script|style)>.*?</(script|style)>
    // would end the script at the quoted </style> and leak trackUser()
    val html = spark.createDataFrame(Seq(
      (0L, "before<script>var a = \"</style>\"; trackUser()</script>after"),
      (1L, "x<style>p { content: \"</script>\" }</style>y")))
      .toDF("doc_id", "text")
    val got = Scrub.extractHtml(html).orderBy("doc_id").collect()
      .map(_.getString(3))
    assert(got(0) === "before after")
    assert(!got(0).contains("trackUser"))
    // and symmetrically the style closes at </style>, not the quoted
    // </script> inside its content
    assert(got(1) === "x y")
  }
}
