package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML-to-text extraction — the step between WARC payloads (q99) and
  * the text filters (C4/Gopher): drop script/style subtrees, strip
  * tags, collapse whitespace, pull the title. Three codegen'd
  * regexp_replace passes + one regexp_extract, no UDF — ASCII-only
  * patterns Java regex (Spark) and RE2 (DuckDB) read identically, and
  * non-greedy block matches so adjacent scripts don't merge. */
object HtmlOps {
  /** Non-greedy script/style subtree patterns ('.' is enough: extracted
    * payloads are single-line here; real multi-line HTML would add
    * (?s)). */
  val ScriptRe = "<script[^>]*>.*?</script>"
  val StyleRe = "<style[^>]*>.*?</style>"
  val TagRe = "<[^>]*>"
  val TitleRe = "<title>([^<]*)</title>"

  /** Visible text: remove script/style blocks, strip remaining tags to
    * spaces, collapse runs, trim. */
  def extractText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, ScriptRe, " "),
          StyleRe, " "),
        TagRe, " "),
      " +", " "))

  def title(c: Column): Column = regexp_extract(c, TitleRe, 1)

  /** Count of anchor tags — the link-density signal boilerplate
    * classifiers threshold on. */
  def linkCount(c: Column): Column = regexp_count(c, lit("<a[ >]"))
}
