package graft

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** C4 line/page cleaning and Gopher quality rules on hand fixtures that
  * exercise each rule branch in isolation. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def keptOf(lines: Seq[String]): Seq[String] =
    Seq(lines).toDF("ls")
      .select(TextAnalysis.c4KeptLines(col("ls")).as("kept"))
      .as[Seq[String]].head()

  test("c4 line gate: terminal punctuation, word count, javascript") {
    val lines = Seq(
      "three words here.",        // kept
      "ends with bang!",          // kept
      "ends with question?",      // kept
      "quoted sentence end.\"",   // kept (closing quote)
      "no terminal punct",        // dropped: no terminal punctuation
      "two words.",               // dropped: < 3 words
      "uses javascript heavily.", // dropped: javascript mention
      "trailing comma line,")     // dropped: comma is not terminal
    assert(keptOf(lines) === lines.take(4))
  }

  test("c4 page gate: >= 5 kept lines, lorem ipsum, curly brace") {
    val five = (1 to 5).map(i => s"good sentence number $i.")
    def pageKeep(all: Seq[String]): Boolean =
      Seq(all).toDF("ls")
        .select(TextAnalysis.c4PageKeep(col("ls"),
          size(TextAnalysis.c4KeptLines(col("ls")))).as("pk"))
        .as[Boolean].head()
    assert(pageKeep(five))
    assert(!pageKeep(five.take(4)))                       // only 4 sentences
    assert(!pageKeep(five :+ "has lorem ipsum inside."))  // boilerplate
    assert(!pageKeep(five :+ "code { leaks } here."))     // curly brace
  }

  private def gopherCounts(words: Seq[String]): (Long, Long, Long, Long) =
    Seq(words).toDF("toks")
      .select(
        TextAnalysis.gopherSymbolWords(col("toks")).cast("long").as("s"),
        TextAnalysis.gopherAlphaWords(col("toks")).cast("long").as("a"),
        TextAnalysis.gopherStopHits(col("toks")).cast("long").as("st"),
        size(col("toks")).cast("long").as("n"))
      .as[(Long, Long, Long, Long)].head()

  test("gopher word counters: symbols, alpha, distinct stop words") {
    val (s, a, st, n) =
      gopherCounts(Seq("the", "cat", "#", "...", "42", "of", "the", "ok"))
    assert(s === 2)   // '#' and '...'
    assert(a === 5)   // all but '#', '...', '42'
    assert(st === 2)  // 'the' (once, distinct) and 'of'
    assert(n === 8)
  }

  test("gopher keep: each threshold flips the decision") {
    def keep(nWords: Long, mwC: Long, nSym: Long, nAlpha: Long, nStop: Long,
        nLines: Long, nBullet: Long, nEll: Long): Boolean =
      Seq((nWords, mwC, nSym, nAlpha, nStop, nLines, nBullet, nEll))
        .toDF("w", "m", "s", "a", "st", "l", "b", "e")
        .select(TextAnalysis.gopherKeep(col("w"), col("m"), col("s"),
          col("a"), col("st"), col("l"), col("b"), col("e")).as("k"))
        .as[Boolean].head()
    val base = (100L, 450L, 2L, 95L, 3L, 10L, 2L, 1L)
    assert((keep _).tupled(base))
    assert(!keep(49, 450, 2, 95, 3, 10, 2, 1))    // too few words
    assert(!keep(100, 299, 2, 95, 3, 10, 2, 1))   // mean word length < 3
    assert(!keep(100, 1001, 2, 95, 3, 10, 2, 1))  // mean word length > 10
    assert(!keep(100, 450, 11, 95, 3, 10, 2, 1))  // symbol ratio > 10%
    assert(!keep(100, 450, 2, 79, 3, 10, 2, 1))   // alpha ratio < 80%
    assert(!keep(100, 450, 2, 95, 1, 10, 2, 1))   // < 2 stop words
    assert(!keep(100, 450, 2, 95, 3, 10, 9, 1))   // 90% bullet lines
    assert(!keep(100, 450, 2, 95, 3, 10, 2, 4))   // > 30% ellipsis lines
  }

  test("boundary ratios: exactly-10% symbols and exactly-80% alpha keep") {
    def keep(nSym: Long, nAlpha: Long): Boolean =
      Seq((100L, 450L, nSym, nAlpha, 3L, 10L, 2L, 1L))
        .toDF("w", "m", "s", "a", "st", "l", "b", "e")
        .select(TextAnalysis.gopherKeep(col("w"), col("m"), col("s"),
          col("a"), col("st"), col("l"), col("b"), col("e")).as("k"))
        .as[Boolean].head()
    assert(keep(10, 95))    // 10% symbols: allowed (<=)
    assert(keep(2, 80))     // 80% alpha: allowed (>=)
    assert(!keep(2, 79))
  }
}
