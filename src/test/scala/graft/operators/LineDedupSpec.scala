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
