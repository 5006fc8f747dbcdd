package graft.operators

import graft.SparkSpec

/** BpeTrainer vs a NAIVE single-machine BPE trainer (canonical
  * symbol-list algorithm, Sennrich et al. 2016 §3.2 — no shared code
  * with the operator's string-replace formulation): same merge table,
  * same order, same weighted counts. */
class BpeTrainerSpec extends SparkSpec {

  /** Canonical reference: symbol VECTORS, overlapping pair stats,
    * leftmost-non-overlapping merge application. */
  private def naiveBpe(words: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] = words.groupBy(identity).toSeq
      .map { case (w, ws) => (w.map(_.toString).toVector, ws.size.toLong) }
    val out = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.size) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, rr), cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, rr, cnt))
        vocab = vocab.map { case (syms, c) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == rr) {
              b += l + rr; i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), c)
        }
        r += 1
      }
    }
    out.result()
  }

  private def train(words: Seq[String], n: Int): Seq[(String, String, Long)] = {
    import spark.implicits._
    BpeTrainer.learnMerges(words.mkString(" ").split(" ").grouped(5)
      .map(_.mkString(" ")).toSeq.toDF("text"), "text", n)
      .map(m => (m.l, m.r, m.pcnt))
  }

  test("learned merge table matches the canonical trainer (order, counts, cascading merges)") {
    // 'the'-family words force cascading merges (t+h, then th+e); counts
    // weight by occurrence, not distinct word
    val words = Seq.fill(8)("the") ++ Seq.fill(5)("then") ++ Seq.fill(4)("that") ++
      Seq.fill(3)("hat") ++ Seq.fill(2)("cat") ++ Seq("thing", "there", "other")
    val got = train(words, 8)
    val want = naiveBpe(words, 8)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("overlapping repeats merge leftmost-non-overlapping ('aaaa' family)") {
    // pair stats count overlapping occurrences (aaaa -> 3x (a,a)) but the
    // merge applies non-overlapping (aaaa -> aa aa) — the subtlety the
    // double-replace trick must reproduce
    val words = Seq.fill(4)("aaaa") ++ Seq.fill(3)("aaa") ++ Seq.fill(2)("baaab")
    val got = train(words, 4)
    val want = naiveBpe(words, 4)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("tie-break is (count DESC, left, right) and exhaustion stops early") {
    // 'ab' and 'cd' tie at 3 — (a,b) < (c,d) lexicographically wins round 1
    val words = Seq.fill(3)("ab") ++ Seq.fill(3)("cd")
    val got = train(words, 10)
    val want = naiveBpe(words, 10)
    assert(got == want)
    assert(got.size == 2, s"two merges exhaust the vocab, got $got")
    assert(got.head._1 == "a" && got.head._2 == "b")
  }
}
