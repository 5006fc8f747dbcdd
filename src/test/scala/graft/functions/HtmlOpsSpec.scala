package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML text extraction on hand fixtures: subtree removal, non-greedy
  * block boundaries, tag stripping, whitespace collapse, title, links. */
class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(h: String): String =
    Seq(h).toDF("h").select(HtmlOps.extractText(col("h"))).as[String].head()

  test("strips tags and collapses whitespace") {
    assert(extract("<p>hello   <b>bold</b> world</p>") === "hello bold world")
  }

  test("script and style subtrees are removed entirely") {
    assert(extract("<script>var x = '<p>not text</p>';</script>keep") === "keep")
    assert(extract("<style>p { color: red; }</style>keep") === "keep")
  }

  test("two script blocks don't merge (non-greedy): text between survives") {
    assert(extract("<script>a();</script>mid<script>b();</script>") === "mid")
  }

  test("title and link count") {
    val h = "<html><head><title>t1</title></head>" +
      "<body><a href=\"/\">x</a><a>y</a><abbr>no</abbr></body></html>"
    val (t, n) = Seq(h).toDF("h")
      .select(HtmlOps.title(col("h")), HtmlOps.linkCount(col("h")).cast("long"))
      .as[(String, Long)].head()
    assert(t === "t1")
    assert(n === 2) // <abbr> must not count as an anchor
  }
}
