package graft.operators

import graft.SparkSpec

/** Within-document line dedup: first-occurrence retention, lower+trim
  * normalization, order preservation, empty-line collapse. */
class LineDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    Dedup.dedupLinesWithin(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("normalized duplicates drop, first occurrence and order survive") {
    val got = run(Seq(
      (1L, "alpha\nbeta\nAlpha \ngamma\nbeta"),
      (2L, "one\ntwo\nthree")))
    // "Alpha " normalizes to "alpha" (dup of line 1); second "beta" drops
    assert(got(1L) == (("alpha\nbeta\ngamma", 5L, 3L)))
    // all-unique doc passes through byte-identically
    assert(got(2L) == (("one\ntwo\nthree", 3L, 3L)))
  }

  test("blank lines collapse to the first; single-line doc is identity") {
    val got = run(Seq(
      (1L, "a\n\nb\n\n\nc"), // empty keys dedup like any other
      (2L, "only line")))
    assert(got(1L) == (("a\n\nb\nc", 6L, 4L)))
    assert(got(2L) == (("only line", 1L, 1L)))
  }

  test("trailing newline keeps the one empty line it denotes") {
    // split keeps trailing empties: "x\n" -> ["x", ""] -> both kept
    val got = run(Seq((1L, "x\n")))
    assert(got(1L) == (("x\n", 2L, 2L)))
  }

  test("HOF fold matches the explode/window reference on random corpora") {
    // cross-check the shuffle-free projection against the textbook
    // explode -> rank-within-(doc, key) -> first-occurrence formulation
    val rnd = new scala.util.Random(41)
    val words = Seq("a", "b", "B ", " a", "", "cc", "Aa", "aa")
    val rows = (0L until 60L).map { id =>
      val n = 1 + rnd.nextInt(12)
      (id, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString("\n"))
    }
    val got = run(rows)
    val expect = rows.map { case (id, text) =>
      val ls = text.split("\n", -1)
      val kept = scala.collection.mutable.LinkedHashMap[String, String]()
      ls.foreach { l => kept.getOrElseUpdate(l.trim.toLowerCase, l) }
      id -> ((kept.values.mkString("\n"), ls.length.toLong, kept.size.toLong))
    }.toMap
    assert(got == expect)
  }
}

/** CORPUS-WIDE line dedup: global first-occurrence election ordered by
  * (doc_id, line index), blank lines exempt, within-doc duplicates also
  * covered, and a plain-Scala whole-corpus reference sweep. */
class CorpusLineDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    Dedup.dedupLinesAcross(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  /** Whole-corpus reference: one pass in (doc_id, idx) order. */
  private def reference(rows: Seq[(Long, String)]) = {
    val seen = scala.collection.mutable.HashSet[String]()
    rows.sortBy(_._1).map { case (id, text) =>
      val ls = text.split("\n", -1)
      val kept = ls.filter { l =>
        val k = l.trim.toLowerCase
        k.isEmpty || seen.add(k)
      }
      id -> ((kept.mkString("\n"), ls.length.toLong, kept.length.toLong))
    }.toMap
  }

  test("a line shared across documents survives only in the earliest doc") {
    val rows = Seq(
      (3L, "accept all cookies\nunique three"),
      (1L, "intro one\nAccept All Cookies\nbody one"),
      (2L, "Accept all cookies \nbody two"))
    val got = run(rows)
    // doc 1 has the earliest corpus position for the normalized banner
    assert(got(1L) == (("intro one\nAccept All Cookies\nbody one", 3L, 3L)))
    assert(got(2L) == (("body two", 2L, 1L)))
    assert(got(3L) == (("unique three", 2L, 1L)))
  }

  test("within one document the earlier index wins; blank lines are exempt") {
    val rows = Seq(
      (1L, "a\n\nA\n\nb"), // "A" normalizes to the doc's own earlier "a"
      (2L, "\n\nc"))       // blanks never dedup — even across docs
    val got = run(rows)
    assert(got(1L) == (("a\n\n\nb", 5L, 4L)))
    assert(got(2L) == (("\n\nc", 3L, 3L)))
  }

  test("matches the sequential whole-corpus reference on random corpora") {
    val rnd = new scala.util.Random(97)
    val words = Seq("alpha", "Beta", "beta ", "", " gamma", "delta", "ALPHA")
    val rows = (0L until 80L).map { id =>
      val n = 1 + rnd.nextInt(10)
      (id, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString("\n"))
    }
    assert(run(rows) == reference(rows))
  }

  test("composes with within-doc dedup: across(within(x)) == across(x)") {
    val rows = Seq(
      (1L, "x\ny\nX\nz"),
      (2L, "y\nw\nw"))
    val s = spark
    import s.implicits._
    val within = Dedup.dedupLinesWithin(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text_dedup").as("text"))
      .as[(Long, String)].collect().toSeq
    val a = run(within).map { case (k, (t, _, nk)) => k -> ((t, nk)) }
    val b = run(rows).map { case (k, (t, _, nk)) => k -> ((t, nk)) }
    assert(a == b)
  }
}
