package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def domains(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlCuration.registeredDomain(col("url")).as("d"))
      .as[String].collect().toSeq

  test("registeredDomain: eTLD+1 fold, two-level suffixes, hosts, userinfo/port") {
    assert(domains(
      "https://www.example.co.uk/x",
      "http://a.b.example.com/path?q=1",
      "https://example.com",
      "https://localhost/admin",
      "https://user:pw@www.example.com:8080/p",
      "HTTPS://UPPER.EXAMPLE.ORG/Y",
      "not a url at all"
    ) == Seq(
      "example.co.uk",
      "example.com",
      "example.com",
      "localhost",
      "example.com",
      "example.org",
      ""))
  }

  test("domainCap: keeps exactly maxPerDomain md5-least ids per domain, deterministic") {
    val docs = (0L until 40L).map(i =>
      (i, s"https://farm${i % 2}.com/p/$i")).toDF("doc_id", "url")
    val out = UrlCuration.domainCap(docs, "url", maxPerDomain = 3)
    assert(out.count() == 6)
    // winners are the md5-least ids within each domain — recomputed with
    // java.security MessageDigest, independent of Spark's md5
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 40L).groupBy(_ % 2).values.flatMap(ids =>
      ids.sortBy(id => (md5hex(id.toString), id)).take(3)).toSet
    val got = out.select("doc_id").as[Long].collect().toSet
    assert(got == expected, s"got $got expected $expected")
    val again = UrlCuration.domainCap(docs, "url", maxPerDomain = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(got == again)
  }

  test("applyBlocklist: registered-domain match, case-insensitive, broadcast plan") {
    val docs = Seq(
      (1L, "https://spam.example.com/a"), // registered domain example.com -> blocked
      (2L, "https://ok.example.org/b"),
      (3L, "https://WWW.SPAM.NET/c") // blocklist entry given upper-case
    ).toDF("doc_id", "url")
    val bl = Seq("example.com", "SPAM.net").toDF("domain")
    val out = UrlCuration.applyBlocklist(docs, "url", bl)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"blocklist must broadcast:\n$plan")
  }

  test("domainCap: unparseable URLs pass through uncapped, not folded into one '' domain") {
    // 10 schemeless/malformed URLs + one real domain with 5 pages: the cap
    // must bite only the real domain; the unparseable slice survives intact
    val docs = ((0L until 10L).map(i => (i, s"not-a-url-$i")) ++
      (10L until 15L).map(i => (i, s"https://farm.com/p$i"))).toDF("doc_id", "url")
    val out = UrlCuration.domainCap(docs, "url", maxPerDomain = 2)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert((0L until 10L).forall(kept.contains), s"unparseable rows were capped: $kept")
    assert(kept.count(_ >= 10L) == 2, s"real domain not capped at 2: $kept")
  }

  test("applyBlocklist: empty blocklist entry cannot drop unparseable URLs") {
    val docs = Seq((1L, "no-scheme-here"), (2L, "https://bad.com/x")).toDF("doc_id", "url")
    val bl = Seq("", "bad.com").toDF("domain")
    val out = UrlCuration.applyBlocklist(docs, "url", bl)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("canonicalizeUrl: every variant class folds; non-variants survive") {
    def canon(u: String): String =
      Seq((1L, u)).toDF("doc_id", "url")
        .select(UrlCuration.canonicalizeUrl(col("url"))).head.getString(0)
    val base = "https://site.com/page/9"
    assert(canon("https://SITE.com/page/9") == base)           // host case
    assert(canon("https://site.com:443/page/9") == base)       // default port
    assert(canon("http://site.com:80/x") == "http://site.com/x")
    assert(canon("https://site.com/page/9#frag") == base)      // fragment
    assert(canon("https://site.com/page/9?utm_source=a&fbclid=z") == base)
    assert(canon("https://site.com/page/9?b=2&a=1") == base + "?a=1&b=2")
    assert(canon("https://site.com/page/9?a=1&utm_campaign=x&b=2") ==
      base + "?a=1&b=2")                                       // mixed strip+sort
    assert(canon("https://site.com/") == "https://site.com")   // root slash
    // NOT folded: real port, path case, deep trailing slash, real params
    assert(canon("https://site.com:8443/p") == "https://site.com:8443/p")
    assert(canon("https://site.com/Page/9") == "https://site.com/Page/9")
    assert(canon("https://site.com/a/") == "https://site.com/a/")
    // schemeless input passes through un-mangled
    assert(canon("not a url") == "not a url")
  }

  test("urlDedup: variants group under one canonical key, keeper is min id") {
    val docs = Seq(
      (10L, "https://A.com/x?utm_source=f"),
      (3L, "https://a.com/x#top"),
      (7L, "https://a.com:443/x"),
      (5L, "https://other.com/y")).toDF("doc_id", "url")
    val out = UrlCuration.urlDedup(docs, "url")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(
      "https://a.com/x" -> (3L, 3L),
      "https://other.com/y" -> (1L, 5L)))
  }

  test("urlFeatures: path depth and query flag") {
    val out = UrlCuration.urlFeatures(Seq(
      (1L, "https://a.com/x/y/z?q=1"),
      (2L, "https://a.com/"),
      (3L, "https://a.com")
    ).toDF("doc_id", "url"), "url")
      .select("doc_id", "url_depth", "url_has_query")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == Seq((1L, 3L, true), (2L, 1L, false), (3L, 0L, false)))
  }
}
