package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class UrlFilterSpec extends SparkSuite {

  import spark.implicits._

  private def regOf(urls: String*): Seq[Option[String]] =
    urls.toDF("url")
      .select(UrlFilter.registeredDomain(col("url")).as("rd"))
      .as[Option[String]].collect().toSeq

  test("registeredDomain: eTLD+1 for plain and two-part suffixes, ports/userinfo stripped") {
    assert(regOf("https://www.example.com/page") == Seq(Some("example.com")))
    assert(regOf("http://a.b.news.example.org/x?q=1") == Seq(Some("example.org")))
    // two-part public suffix: last THREE labels
    assert(regOf("https://shop.example.co.uk/") == Seq(Some("example.co.uk")))
    assert(regOf("https://www.gov.uk") == Seq(Some("www.gov.uk")))
    // port and userinfo are not part of the host
    assert(regOf("http://user:pw@cdn.example.com:8080/p") == Seq(Some("example.com")))
    // single-label host: the label itself
    assert(regOf("http://localhost/x") == Seq(Some("localhost")))
    // uppercase normalizes
    assert(regOf("HTTPS://WWW.EXAMPLE.COM/A") == Seq(Some("example.com")))
  }

  test("registeredDomain is null for unparseable URLs") {
    assert(regOf("not a url", "ftp//broken", "") == Seq(None, None, None))
  }

  test("capPerDomain keeps exactly maxPerDomain per registered domain in tie order") {
    // one hot domain (60 docs), one small (3), plus null-domain rows
    val docs = ((0 until 60).map(i => (i.toLong, s"https://a$i.hot.example.com/x")) ++
      Seq((100L, "https://www.small.org/y"), (101L, "https://www.small.org/z"),
        (102L, "https://cdn.small.org/w"), (200L, "junk"), (201L, "junk2")))
      .toDF("doc_id", "url")
    val got = UrlFilter.capPerDomain(docs, "url", maxPerDomain = 5, tieCol = "doc_id", salt = 4)
      .select("doc_id", "domain_rank").as[(Long, Int)].collect().toMap
    // hot domain: the 5 LOWEST doc_ids, ranked 1..5
    assert((0L to 4L).forall(i => got(i) == i + 1))
    assert(!got.contains(5L) && !got.contains(59L))
    // small domain under the cap: all kept
    assert(got(100L) == 1 && got(101L) == 2 && got(102L) == 3)
    // null-domain group capped like any other (both junk rows fit)
    assert(got(200L) == 1 && got(201L) == 2)
  }

  test("salted two-phase cap is result-identical to the one-window form") {
    val docs = (0 until 500).map(i =>
      (i.toLong, s"https://s${i % 3}.d${i % 7}.example.com/p$i")).toDF("doc_id", "url")
    val twoPhase = UrlFilter.capPerDomain(docs, "url", maxPerDomain = 10, tieCol = "doc_id", salt = 8)
      .select("doc_id", "registered_domain", "domain_rank")
      .orderBy("doc_id").collect().toSeq
    val oneWindow = UrlFilter.capPerDomain(docs, "url", maxPerDomain = 10, tieCol = "doc_id", salt = 1)
      .select("doc_id", "registered_domain", "domain_rank")
      .orderBy("doc_id").collect().toSeq
    assert(twoPhase == oneWindow)
  }

  test("filterBlockedDomains drops blocklisted registered domains, keeps null-domain rows") {
    val docs = Seq(
      (1L, "https://www.example.com/a"),
      (2L, "https://cdn.badsite.io/b"),          // blocked
      (3L, "https://x.shop.example.co.uk/c"),
      (4L, "http://tracker.badsite.io:80/d"),    // blocked via subdomain
      (5L, "garbage")                            // unparseable -> survives
    ).toDF("doc_id", "url")
    val block = Seq("BadSite.io ").toDF("domain") // normalization: case + trim
    val got = UrlFilter.filterBlockedDomains(docs, "url", block)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L, 5L))
  }

  test("canonicalizeUrl normalizes case, port, slash, fragment, tracking params, query order") {
    def canon(u: String): String =
      Seq(u).toDF("url").select(UrlFilter.canonicalizeUrl(col("url"))).as[String].head()
    assert(canon("HTTPS://WWW.Example.COM:443/p/1/?b=2&utm_source=x&a=1#frag")
      == "https://www.example.com/p/1?a=1&b=2")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    // non-default port survives; path case is preserved
    assert(canon("https://a.com:8080/Path") == "https://a.com:8080/Path")
    // no query, no fragment: unchanged apart from the trailing slash
    assert(canon("https://a.com/x/") == "https://a.com/x")
    // only tracking params -> query disappears entirely
    assert(canon("https://a.com/x?utm_campaign=c&fbclid=1&gclid=2&ref=r") == "https://a.com/x")
    // empty path
    assert(canon("https://a.com/") == "https://a.com")
  }

  test("canonicalGroups collapses variants of one page to one group") {
    val urls = Seq(
      (1L, "https://a.com/x?a=1&b=2"),
      (2L, "HTTPS://A.COM:443/x/?b=2&a=1&utm_source=s#top"),
      (3L, "https://a.com/y")
    ).toDF("doc_id", "url")
    val got = UrlFilter.canonicalGroups(urls, "url", "doc_id")
      .select("canonical_url", "canonical_id", "n_urls")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("https://a.com/x?a=1&b=2", 1L, 2L),
      ("https://a.com/y", 3L, 1L)))
  }

  test("politenessSchedule: host-affine workers, per-domain serial slots") {
    val urls = Seq(
      (1L, "https://www.a.com/1"), (2L, "https://cdn.a.com/2"), (3L, "https://a.com/3"),
      (4L, "https://b.org/1"), (5L, "https://b.org/2")
    ).toDF("doc_id", "url")
    val got = UrlFilter.politenessSchedule(urls, "url", "doc_id", delaySeconds = 5L, workers = 4)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // one worker per domain (host affinity), serial 5s slots in id order
    val byDomain = got.groupBy(_._2)
    assert(byDomain.keySet == Set("a.com", "b.org"))
    byDomain.foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.size == 1, "domain split across workers")
      assert(rows.sortBy(_._1).map(_._4) == rows.indices.map(_ * 5L))
    }
    got.foreach { case (_, _, w, _) => assert(w >= 0 && w < 4) }
  }
}
