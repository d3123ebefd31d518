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
}
