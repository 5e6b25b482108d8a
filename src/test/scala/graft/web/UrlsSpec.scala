package graft.web

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** URL canonicalization rules, pinned case by case. */
class UrlsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(Urls.canonicalize(col("u")))
      .as[String].collect().toSeq

  test("scheme/host lowercased, www and default port stripped, fragment dropped") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b#frag") ==
      Seq("http://example.com/A/b"))
    assert(canon("HTTPS://Sub.Example.com:443/x") ==
      Seq("https://sub.example.com/x"))
    // non-default port survives; path case survives
    assert(canon("https://example.com:8080/Path") ==
      Seq("https://example.com:8080/Path"))
    // :443 is only a default for https
    assert(canon("http://example.com:443/x") ==
      Seq("http://example.com:443/x"))
  }

  test("tracking params dropped, remainder sorted, empty query elided") {
    assert(canon("http://h.com/p?utm_source=feed&b=2&a=1") ==
      Seq("http://h.com/p?a=1&b=2"))
    assert(canon("http://h.com/p?fbclid=XYZ") == Seq("http://h.com/p"))
    assert(canon("http://h.com/p?z=9") == Seq("http://h.com/p?z=9"))
  }

  test("one trailing slash stripped from non-root paths; root kept") {
    assert(canon("http://h.com/a/b/") == Seq("http://h.com/a/b"))
    assert(canon("http://h.com/") == Seq("http://h.com/"))
    assert(canon("http://h.com") == Seq("http://h.com"))
  }

  test("equivalent crawl variants collapse to one key") {
    val variants = canon(
      "HTTP://WWW.Host.com:80/a/?utm_source=x&b=2&a=1#f",
      "http://host.com/a?a=1&b=2",
      "http://Host.COM/a/?b=2&a=1")
    assert(variants.distinct.size == 1)
    assert(variants.head == "http://host.com/a?a=1&b=2")
  }

  test("canonicalHost strips the port") {
    val h = Seq("https://example.com:8080/Path").toDF("u")
      .select(Urls.canonicalHost(Urls.canonicalize(col("u"))))
      .as[String].head()
    assert(h == "example.com")
  }
}
