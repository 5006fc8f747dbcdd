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
}
