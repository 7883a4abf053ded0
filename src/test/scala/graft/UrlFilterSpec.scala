package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class UrlFilterSpec extends SparkSpec {

  import spark.implicits._

  private val urls = Seq(
    (1L, "https://spam.example.com/page?q=1"),   // exact blocked domain
    (2L, "https://deep.sub.spam.example.com/x"), // subdomain of blocked
    (3L, "https://www.spam.example.com"),        // www + blocked
    (4L, "http://user:pw@spam.example.com:8080/a"), // userinfo + port
    (5L, "https://example.com/spam.example.com"),   // blocked string in PATH only
    (6L, "https://notspam.example.com/x"),       // superstring, NOT a subdomain
    (7L, "ftp://clean.org"),
    (8L, "clean.org/relative"),                  // scheme-less
    (9L, null.asInstanceOf[String]),             // null URL is kept
    (10L, "https://SPAM.EXAMPLE.COM/upper")      // case-insensitive
  ).toDF("id", "url")

  private val blocked = Seq("spam.example.com")

  test("urlDomain strips scheme, userinfo, port, path, www, case") {
    val doms = urls.filter($"url".isNotNull)
      .select($"id", TextAnalysis.urlDomain($"url").as("d"))
      .as[(Long, String)].collect().toMap
    assert(doms(1L) == "spam.example.com")
    assert(doms(2L) == "deep.sub.spam.example.com")
    assert(doms(3L) == "spam.example.com")
    assert(doms(4L) == "spam.example.com")
    assert(doms(8L) == "clean.org")
    assert(doms(10L) == "spam.example.com")
  }

  test("domainSuffixes yields the dot-boundary chain") {
    val s = spark.range(1).select(
      TextAnalysis.domainSuffixes(lit("a.b.c.com")).as("s"))
      .as[Seq[String]].collect()(0)
    assert(s == Seq("a.b.c.com", "b.c.com", "c.com", "com"))
  }

  test("literal-blocklist filter: exact + subdomain blocked; path hits, superstrings, nulls kept") {
    val kept = TextAnalysis.filterUrlBlocklist(urls, "url", blocked)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(5L, 6L, 7L, 8L, 9L))
  }

  test("blocklist-frame variant agrees with the literal variant") {
    val blocklistDf = blocked.toDF("domain")
    val kept = TextAnalysis.filterUrlBlocklist(urls, "id", "url",
      blocklistDf, "domain").select("id").as[Long].collect().toSet
    // anti-join drops null-suffix rows only if they matched; null URL
    // yields suffixes of "" = [""], never in the blocklist -> kept
    assert(kept == Set(5L, 6L, 7L, 8L, 9L))
  }

  test("empty blocklist blocks nothing (templated configs start empty)") {
    val kept = TextAnalysis.filterUrlBlocklist(urls, "url", Nil)
      .select("id").as[Long].collect().toSet
    assert(kept.size == urls.count())
  }

  test("www-prefixed blocklist entries are normalized on both paths") {
    val kept = TextAnalysis.filterUrlBlocklist(urls, "url",
      Seq("www.spam.example.com")).select("id").as[Long].collect().toSet
    assert(!kept.contains(1L) && !kept.contains(3L))
  }

  test("canonicalizeUrl collapses equivalent spellings deterministically") {
    def c(u: String): String =
      Seq(Tuple1(u)).toDF("u")
        .select(TextAnalysis.canonicalizeUrl($"u")).head().getString(0)
    // case, default port, tracking params, fragment, param order
    assert(c("HTTPS://WWW.Site.COM:443/A/?utm_source=x&b=2&a=1#top") ==
      "https://www.site.com/A?a=1&b=2")
    assert(c("http://Site.com:80/") == "http://site.com/")
    assert(c("http://site.com") == "http://site.com/")          // empty path
    assert(c("http://u:p@site.com/x") == "http://site.com/x")   // userinfo
    assert(c("https://site.com:8443/x") == "https://site.com:8443/x") // real port kept
    assert(c("http://site.com/x?fbclid=1&gclid=2&utm_medium=m") ==
      "http://site.com/x")                                      // all tracking
    assert(c("ftp://Site.com:21/f/") == "ftp://site.com:21/f")  // non-http port kept
    assert(c("plain text, no url") == "plain text, no url")     // passthrough
    // the point: dedup keys now collapse
    val variants = Seq(
      "https://example.com/page?b=1&a=2",
      "HTTPS://EXAMPLE.COM:443/page/?a=2&b=1#sec",
      "https://u@example.com/page?utm_source=s&a=2&b=1")
    assert(variants.map(c).distinct.size == 1)
  }
}
