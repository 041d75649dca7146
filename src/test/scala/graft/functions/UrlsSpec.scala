package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq

  test("scheme and host lowercase; path and query case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Path?Q=Val") ==
      Seq("https://www.example.com/Path?Q=Val"))
  }

  test("default ports drop; explicit non-default ports stay") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:8080/x", "https://a.com:80/x") == Seq(
      "http://a.com/x", "https://a.com/x",
      "http://a.com:8080/x",
      // :80 is NOT the https default - must survive
      "https://a.com:80/x"))
  }

  test("trailing slashes strip; root path and bare host meet at ''") {
    assert(canon("https://a.com/x/", "https://a.com/x///",
        "https://a.com/", "https://a.com") ==
      Seq("https://a.com/x", "https://a.com/x",
        "https://a.com", "https://a.com"))
  }

  test("params sort bytewise; tracking params drop; empty query drops '?'") {
    assert(canon("https://a.com/x?b=2&a=1") == Seq("https://a.com/x?a=1&b=2"))
    assert(canon(
      "https://a.com/x?utm_source=f&a=1&gclid=Z&fbclid=Y&ref=tw&b=2") ==
      Seq("https://a.com/x?a=1&b=2"))
    assert(canon("https://a.com/x?utm_campaign=c") == Seq("https://a.com/x"))
    // prefix lookalikes are NOT tracking params
    assert(canon("https://a.com/x?referrer=1&gclid2=3") ==
      Seq("https://a.com/x?gclid2=3&referrer=1"))
  }

  test("fragment drops") {
    assert(canon("https://a.com/x#sec", "https://a.com/x?a=1#sec") ==
      Seq("https://a.com/x", "https://a.com/x?a=1"))
    // a '?' INSIDE the fragment is fragment text, not a query — it must
    // not resurrect as a query string (and so must not collide with the
    // genuinely different resource /x?b=2)
    assert(canon("https://a.com/x#sec?b=2") == Seq("https://a.com/x"))
  }

  test("null and unparseable inputs canonicalize to null, not a guess") {
    val got = Seq(Some("not a url"), Some("ftp//broken"), None)
      .toDF("url").select(Urls.canonicalizeUrl($"url").as("c"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(None, None, None))
  }

  test("dedupByUrl keeps the lowest id per canonical URL and counts") {
    val df = Seq(
      (3L, "https://a.com/x?b=2&a=1"),
      (1L, "HTTPS://A.com:443/x/?a=1&b=2&utm_source=f"),
      (2L, "https://a.com/y"),
      (4L, "garbage"))
      .toDF("doc_id", "url")
    val got = Urls.dedupByUrl(df, "doc_id", "url")
      .orderBy($"canonical_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("https://a.com/x?a=1&b=2", 1L, 2L),
      ("https://a.com/y", 2L, 1L)))
  }
}
