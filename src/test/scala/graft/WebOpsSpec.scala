package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the web-curation operators (WebOps): each RFC-3986
  * canonicalization rule on a handcrafted URL, the registered-domain
  * public-suffix rule, dedup/stats/blocklist composition, and the zero-
  * shuffle plan shape of the row-local layer. Cross-engine byte-equality
  * of the whole chain is the web_* gates' job (SparkEntry.oracleSql). */
class WebOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def canon(url: String): String = {
    val df = Seq(Tuple1(url)).toDF("url")
    df.select(WebOps.canonicalUrl(col("url"))).as[String].head()
  }

  test("canonicalization: fragment, case, default port, trailing slash") {
    assert(canon("HTTP://WWW.Example.COM:80/a/b/#frag") ==
      "http://www.example.com/a/b")
    // non-default port is identity-bearing and kept
    assert(canon("http://example.com:8080/a") == "http://example.com:8080/a")
    // :443 is default for https only — kept on http
    assert(canon("http://example.com:443/a") == "http://example.com:443/a")
    assert(canon("https://example.com:443/a") == "https://example.com/a")
    // bare root path canonicalizes to empty
    assert(canon("https://example.com/") == "https://example.com")
  }

  test("canonicalization: tracking params dropped, survivors sorted") {
    assert(canon("https://e.com/p?utm_source=x&b=2&a=1&fbclid=abc#s") ==
      "https://e.com/p?a=1&b=2")
    // a param NAMED like a tracking prefix but not equal is kept
    // (exact `name=` prefix compare, not LIKE)
    assert(canon("https://e.com/p?utm_sourcey=1") ==
      "https://e.com/p?utm_sourcey=1")
    // all params tracking → no query suffix at all
    assert(canon("https://e.com/p?gclid=1&msclkid=2") == "https://e.com/p")
  }

  test("registered domain: 2-label, co.uk 3-label, port stripped, www shed") {
    val hosts = Seq("www.example.com", "a.b.example.co.uk", "example.com:8080",
      "localhost", "sub.example.org").toDF("h")
    val got = hosts.select(WebOps.registeredDomain(col("h"))).as[String]
      .collect().toSeq
    assert(got == Seq("example.com", "example.co.uk", "example.com",
      "localhost", "example.org"))
  }

  test("urlDedup collapses mess to one class; min id canonical") {
    val urls = Seq(
      (1L, "https://E.com/x/?utm_source=a&id=7#top"),
      (2L, "HTTPS://e.COM:443/x?id=7"),
      (3L, "https://e.com/y?id=7") // different path → different class
    ).toDF("doc_id", "url")
    val got = WebOps.urlDedup(urls, "doc_id", "url").orderBy("id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true)))
  }

  test("domainStats counts docs vs distinct canonical urls") {
    val urls = Seq(
      (1L, "https://a.e.com/x"), (2L, "https://b.e.com/x/"),
      (3L, "https://b.e.com/x#f"), (4L, "https://other.org/z")
    ).toDF("doc_id", "url")
    val got = WebOps.domainStats(urls, "doc_id", "url")
      .orderBy("registered_domain")
      .as[(String, Long, Long)].collect().toSeq
    // a.e.com/x and b.e.com/x are DIFFERENT canonical urls (subdomain kept
    // in the url) but the same registered domain; 2 and 3 collapse.
    assert(got == Seq(("e.com", 3L, 2L), ("other.org", 1L, 1L)))
  }

  test("filterBlockedDomains drops blocked registered domains only") {
    val urls = Seq(
      (1L, "https://www.bad.com/x"), (2L, "https://good.com/x"),
      (3L, "https://sub.bad.com:8080/y")
    ).toDF("doc_id", "url")
    val blocked = Seq(Tuple1("bad.com")).toDF("registered_domain")
    val got = WebOps.filterBlockedDomains(urls, "url", blocked)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(2L))
    // helper columns must not leak
    assert(WebOps.filterBlockedDomains(urls, "url", blocked).columns.toSeq ==
      Seq("doc_id", "url"))
  }

  test("syntheticUrls: duplicate classes collapse, distinct cids do not") {
    val docs = spark.range(0, 200).select(col("id").as("doc_id"))
    val urls = WebOps.syntheticUrls(docs, "doc_id")
    val dedup = WebOps.urlDedup(urls, "doc_id", "url")
    val dups = dedup.where(!col("is_canonical"))
      .as[(Long, Long, Boolean)].collect().toSeq
    // exactly the doc_ids ≡ 3 (mod 10) pair with doc_id-3
    assert(dups.size == 20 && dups.forall { case (id, cid, _) =>
      id % 10 == 3 && cid == id - 3 })
    // canonical urls are otherwise unique (id=<cid> param guarantees it)
    assert(dedup.where(col("is_canonical")).count() == 180)
  }

  test("urlParts is row-local: zero Exchange in the plan") {
    val urls = Seq((1L, "https://e.com/x?b=2&a=1")).toDF("doc_id", "url")
    val plan = WebOps.urlParts(urls, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
