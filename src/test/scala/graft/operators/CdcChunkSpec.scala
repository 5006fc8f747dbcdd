package graft.operators

import graft.SparkSpec

/** Content-defined chunking: reference-loop equality, the insertion-
  * realignment property that distinguishes CDC from fixed-size blocks,
  * and corpus-wide dup accounting. */
class CdcChunkSpec extends SparkSpec {

  /** Reference: the same w=8, mod-64 boundary rule as a plain loop,
    * including the operator's printable-ASCII projection (non-ASCII ->
    * one space) that pins char-code semantics across Spark ascii() /
    * DuckDB ord() / JVM charAt. */
  private def refChunks(text: String): Seq[String] = {
    // regex (not a char map): one space per CODE POINT, so astral chars
    // (surrogate pairs) collapse to a single space exactly as Spark's
    // regexp_replace and DuckDB's RE2 do
    val s = text.trim.toLowerCase.replaceAll("[^\\x20-\\x7e]", " ")
    val pows = (7 to 0 by -1).map(k => math.pow(31, k).toLong)
    val cuts = (8 to s.length).filter { i =>
      val h = (0 until 8).map(k => s.charAt(i - 8 + k).toLong * pows(k)).sum
      h % 64 == 0
    }
    val bounds = 0 +: cuts :+ s.length
    bounds.sliding(2).map { case Seq(a, b) => s.substring(a, b) }
      .filter(_.nonEmpty).toSeq
  }

  private def run(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    Dedup.cdcChunkStats(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  private val docA = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest to hide from every hunter there"

  test("chunk counts match the reference loop; identical docs fully dedup") {
    val got = run(Seq((1L, docA), (2L, docA), (3L, "tiny")))
    val nA = refChunks(docA).length.toLong
    assert(nA > 1, "test doc must produce multiple chunks")
    // identical docs: every chunk occurs twice corpus-wide
    assert(got(1L) == ((nA, nA, got(2L)._3)))
    assert(got(2L)._1 == nA && got(2L)._2 == nA)
    // sub-window doc: one chunk, unique
    assert(got(3L) == ((1L, 0L, got(3L)._3)))
  }

  test("insertion realigns later chunks (the CDC property)") {
    val docB = "freshly inserted preamble paragraph sits here first " + docA
    val ca = refChunks(docA)
    val cb = refChunks(docB)
    // the suffix chunks realign byte-identically after the insertion
    val shared = ca.toSet.intersect(cb.toSet)
    assert(shared.nonEmpty, "no realigned chunks — CDC anchoring broken")
    assert(ca.takeRight(1) == cb.takeRight(1))
    // and the operator counts exactly those as corpus-wide dups
    val got = run(Seq((1L, docA), (2L, docB)))
    assert(got(1L)._2 == ca.count(shared.contains))
    assert(got(2L)._2 == cb.count(shared.contains))
  }

  test("non-ASCII input: boundaries agree with the reference after the " +
    "printable-ASCII projection (accents, CJK, emoji, NBSP)") {
    val docC = "café con leche — naïve résumé " +
      "中文文本 and some 🌉 emoji plus nbsp " + docA
    val ref = refChunks(docC)
    assert(ref.length > 1, "projected doc must still produce multiple chunks")
    val got = run(Seq((1L, docC), (2L, docC)))
    // operator chunk count equals the reference loop's, and the two
    // identical docs fully dedup — byte-identical chunking on both rows
    assert(got(1L) == ((ref.length.toLong, ref.length.toLong, got(2L)._3)))
  }

  test("chunks concatenate back to the normalized text (reference)") {
    for (t <- Seq(docA, "exactly8", "a b c d e f g h i j k l m n o p"))
      assert(refChunks(t).mkString == t.trim.toLowerCase)
  }
}
