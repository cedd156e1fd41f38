package graft

import org.apache.spark.sql.functions._
import graft.ops.Urls

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  private def dom(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.domainOf(col("u"))).as[String].collect().toSeq

  test("canonicalizeUrl: scheme/host lowercase, default ports, fragments, tracking params") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b?x=1#frag") ==
      Seq("http://www.example.com/A/b?x=1"))
    // path case is preserved; non-default port survives
    assert(canon("https://Site.IO:8443/Path") == Seq("https://site.io:8443/Path"))
    // :443 is default only under https; :80 only under http
    assert(canon("https://a.com:80/x") == Seq("https://a.com:80/x"))
    assert(canon("http://a.com:443/x") == Seq("http://a.com:443/x"))
    assert(canon("https://a.com:443/x") == Seq("https://a.com/x"))
    // tracking params drop, real params keep their original order
    assert(canon("http://a.com/p?utm_source=x&id=7&utm_medium=y&b=2&gclid=z") ==
      Seq("http://a.com/p?id=7&b=2"))
    // the query drops entirely when only tracking params were present
    assert(canon("http://a.com/p?utm_campaign=x&fbclid=y") == Seq("http://a.com/p"))
    // a '?' with nothing behind it disappears
    assert(canon("http://a.com/p?") == Seq("http://a.com/p"))
    // bare ref is NOT tracking by default (it carries real payloads:
    // branch selectors, referenced ids); ref_src IS
    assert(canon("http://a.com/p?ref=main&ref_src=twsrc") == Seq("http://a.com/p?ref=main"))
    // caller-supplied pattern: a corpus where bare ref IS tracking opts in
    assert(Seq("http://a.com/p?ref=home&refresh=1").toDF("u")
      .select(Urls.canonicalizeUrl(col("u"), "^(utm_[a-z0-9_]*|ref)(=.*)?$"))
      .as[String].collect().toSeq == Seq("http://a.com/p?refresh=1"))
    // scheme-less best effort: host-first, no scheme prefix
    assert(canon("Example.COM/a?gclid=1") == Seq("example.com/a"))
    // empty path, query only
    assert(canon("http://A.com?id=1#x") == Seq("http://a.com?id=1"))
  }

  test("registrableDomain: generic TLD, suffix-lite ccSLD, IP, short hosts") {
    assert(dom("http://news.portal.example.com/x") == Seq("example.com"))
    assert(dom("https://WWW.bbc.CO.UK/news") == Seq("bbc.co.uk"))
    assert(dom("http://a.b.research.ac.jp") == Seq("research.ac.jp"))
    assert(dom("http://example.io/path") == Seq("example.io"))
    assert(dom("http://192.168.10.1:8080/admin") == Seq("192.168.10.1"))
    assert(dom("http://localhost:9000/x") == Seq("localhost"))
    // a bare two-label host that IS a listed suffix stays itself (n<=2 rule)
    assert(dom("http://co.uk") == Seq("co.uk"))
    // trailing dot (FQDN spelling) keys to the same domain as without it
    assert(dom("http://example.com./x", "http://example.com/x") ==
      Seq("example.com", "example.com"))
    assert(canon("http://Example.COM./p?x=1") == Seq("http://example.com/p?x=1"))
  }

  test("registrableDomain: caller-supplied public-suffix table") {
    // com.pl is NOT in the built-in lite list → default keys on com.pl...
    val hosts = Seq("shop.allegro.com.pl", "a.b.example.com").toDF("h")
    assert(hosts.select(Urls.registrableDomain(col("h"))).as[String].collect().toSeq ==
      Seq("com.pl", "example.com"))
    // ...a caller-supplied table that lists it keys on the registrable label
    val full = Urls.MultiPartSuffixes :+ "com.pl"
    assert(hosts.select(Urls.registrableDomain(col("h"), full)).as[String].collect().toSeq ==
      Seq("allegro.com.pl", "example.com"))
  }

  test("canonicalizeUrl is idempotent on its own output") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/A/b?x=1&utm_source=f#frag",
      "https://Site.IO:8443/Path?gclid=1&keep=2",
      "http://a.b.c.co.uk/d?e=f")
    val once = canon(urls: _*)
    assert(canon(once: _*) == once)
  }
}
