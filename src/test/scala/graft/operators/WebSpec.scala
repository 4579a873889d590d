package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WebSpec extends AnyFunSuite with SparkSpec {

  private def profile(urls: (Long, String)*) =
    Web.urlProfile(spark.createDataFrame(urls).toDF("doc_id", "url"))
      .orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5), r.getString(6)))

  test("urlProfile: case, port, fragment, tracking params, suffix list") {
    val Array(a) = profile(
      (1L, "HTTPS://WWW.Example.CO.UK:8080/A/b?utm_source=x&q=1&gclid=z#top"))
    assert(a === (("https", "www.example.co.uk", "example.co.uk", "/A/b",
      1L, "https://www.example.co.uk/A/b?q=1")))
    // path case is preserved — only scheme/host lower
  }

  test("urlProfile: bare host, empty path, tracking-only query") {
    val Array(a, b, c) = profile(
      (1L, "http://site.com"),            // no path -> '/'
      (2L, "http://site.com/?utm_source=f"), // survivors empty -> no '?'
      (3L, "http://localhost/x"))         // single label: domain = host
    assert(a === (("http", "site.com", "site.com", "/", 0L,
      "http://site.com/")))
    assert(b === (("http", "site.com", "site.com", "/", 0L,
      "http://site.com/")))
    assert(c === (("http", "localhost", "localhost", "/x", 0L,
      "http://localhost/x")))
  }

  test("urlProfile: valueless params keep/drop by key; order preserved") {
    val Array(a) = profile(
      (1L, "http://a.b.com/p?z=9&utm_term&flag&x=1"))
    // 'utm_term' with no '=' is still a tracking KEY; 'flag' survives
    assert(a._5 === 3L)
    assert(a._6 === "http://a.b.com/p?z=9&flag&x=1")
    // deep subdomain: registrable domain is the last two labels
    assert(a._3 === "b.com")
  }

  test("urlDedup: tracking-param/fragment variants collapse to one survivor") {
    val prof = Web.urlProfile(spark.createDataFrame(Seq(
      (5L, "http://a.com/x?utm_source=f"),
      (2L, "HTTP://A.com/x#frag"),     // same clean_url as 5
      (9L, "http://a.com/x?id=1"),     // different (real param)
      (4L, "http://a.com/y"))).toDF("doc_id", "url"))
    val got = Web.urlDedup(prof).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    // min doc_id per clean_url survives: 2 beats 5
    assert(got.toSeq === Seq((2L, 1), (4L, 1), (5L, 0), (9L, 1)))
  }

  test("domainStats folds hosts, urls and params per registrable domain") {
    val prof = Web.urlProfile(spark.createDataFrame(Seq(
      (1L, "http://a.site.com/x?p=1"),
      (2L, "http://b.site.com/x?p=1&utm_source=f"),
      (3L, "http://b.site.com/y"),
      (4L, "http://other.org/z"))).toDF("doc_id", "url"))
    val got = Web.domainStats(prof).orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      ("other.org", 1L, 1L, 1L, 0L),
      ("site.com", 3L, 2L, 3L, 2L)))
  }
}
