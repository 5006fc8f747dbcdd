package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(us: String*): Seq[(String, String, String)] = {
    us.map(Tuple1(_)).toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")), UrlOps.urlHost(col("u")),
        UrlOps.registeredDomain(col("u")))
      .as[(String, String, String)].collect().toSeq
  }

  test("canonicalization: ports, fragments, slashes, query order, case") {
    val got = canon(
      "HTTP://Example.COM:80/a/b/?b=2&a=1#x",
      "https://example.com:443/",
      "https://example.com:8443/a",
      "http://EXAMPLE.com",
      "http://a.b.c.example.org/p///",
      "http://single/p?k=v")
    assert(got(0) == (("http://example.com/a/b?a=1&b=2", "example.com", "example.com")))
    assert(got(1) == (("https://example.com/", "example.com", "example.com")))
    assert(got(2) == (("https://example.com:8443/a", "example.com", "example.com")))
    assert(got(3) == (("http://example.com/", "example.com", "example.com")))
    assert(got(4) == (("http://a.b.c.example.org/p", "a.b.c.example.org", "example.org")))
    assert(got(5) == (("http://single/p?k=v", "single", "single")))
  }

  test("canonical form is idempotent and collapses equivalent spellings") {
    val variants = Seq(
      "http://WWW.Site.com/x/?b=2&a=1",
      "http://www.site.COM:80/x?a=1&b=2#frag",
      "HTTP://www.site.com/x///?b=2&a=1")
    val cs = canon(variants: _*).map(_._1).distinct
    assert(cs == Seq("http://www.site.com/x?a=1&b=2"))
    assert(canon(cs.head).head._1 == cs.head, "idempotent")
  }

  test("hostSuffixes yields the full dot-suffix chain in order") {
    val got = Seq(Tuple1("cdn.media.ex2.org"), Tuple1("single"))
      .toDF("h").select(UrlOps.hostSuffixes(col("h")))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("cdn.media.ex2.org", "media.ex2.org", "ex2.org", "org"))
    assert(got(1) == Seq("single"))
  }

  test("blocklistFilter: registrable blocks subdomains, entries compose, clean passes") {
    val docs = Seq(
      (1L, "www.bad.com"),       // subdomain of listed bad.com
      (2L, "bad.com"),           // exact listed
      (3L, "notbad.com"),        // SUFFIX-chain match only, not substring
      (4L, "cdn.media.ex2.org"), // explicit subdomain entry matches
      (5L, "www.ex2.org"),       // sibling of listed subdomain: clean
      (6L, "x.a.b.com"))         // two entries match: hit = lexicographic min
      .toDF("doc_id", "host")
    val bl = Seq("bad.com", "media.ex2.org", "b.com", "a.b.com").toDF("domain")
    val got = UrlOps.blocklistFilter(docs, "doc_id", "host", bl, "domain")
      .select(col("doc_id"), col("blocked"), col("hit"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, "bad.com")))
    assert(got(2L) == ((1L, "bad.com")))
    assert(got(3L) == ((0L, "")))   // "notbad.com" must NOT match "bad.com"
    assert(got(4L) == ((1L, "media.ex2.org")))
    assert(got(5L) == ((0L, "")))
    assert(got(6L) == ((1L, "a.b.com")))
  }

  test("blocklistFilter meets the list in a broadcast equi-join") {
    val docs = Seq((1L, "a.b.com")).toDF("doc_id", "host")
    val bl = Seq("b.com").toDF("domain")
    val plan = UrlOps.blocklistFilter(docs, "doc_id", "host", bl, "domain")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"blocklist join is not broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
