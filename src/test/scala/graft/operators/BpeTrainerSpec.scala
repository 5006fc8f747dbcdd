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

  /** GPT-2 bytes_to_unicode, reimplemented independently of the
    * operator's translate() table for replay. */
  private def byteSyms(tok: String): String = {
    val remap = ((0 to 32) ++ (127 to 160) ++ Seq(173)).zipWithIndex.toMap
    tok.getBytes("UTF-8").map { b =>
      val n = b & 0xff
      remap.get(n).map(i => (0x100 + i).toChar).getOrElse(n.toChar)
    }.mkString
  }

  test("byte-level: GPT-2 pre-tokens carry the leading space as 'Ġ'") {
    import spark.implicits._
    // "the cat" x3 in one doc: pre-tokens are "the", " cat" (space rides
    // the token); byte symbols make the leading space a 'Ġ' symbol, so
    // the naive trainer must see it as a first-class symbol
    val docs = Seq("the cat the cat the cat").toDF("text")
    val got = BpeTrainer.learnByteMerges(docs, "text", 6).map(m => (m.l, m.r, m.pcnt))
    // replay: pre-tokenize with the same regex, map bytes, naive BPE
    val pretok = BpeTrainer.ByteLevelPretokenRegex.r
      .findAllIn("the cat the cat the cat").map(byteSyms).toSeq
    val want = naiveBpe(pretok, 6)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the space symbol must appear inside some learned merge
    assert(got.exists { case (l, r, _) => (l + r).contains("Ġ") },
      s"no merge learned across the visible-space symbol: $got")
  }

  test("byte-level: punctuation splits off and digits group separately") {
    import spark.implicits._
    val docs = Seq("ab12, ab12, ab12").toDF("text")
    val got = BpeTrainer.learnByteMerges(docs, "text", 4).map(m => (m.l, m.r, m.pcnt))
    val pretok = BpeTrainer.ByteLevelPretokenRegex.r
      .findAllIn("ab12, ab12, ab12").map(byteSyms).toSeq
    // pre-tokens: "ab","12",","," ab","12",","," ab","12" -> letter runs
    // and digit runs never share a pre-token, so no (letter,digit) merge
    val want = naiveBpe(pretok, 4)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(!got.exists { case (l, r, _) =>
      l.exists(_.isLetter) && r.exists(_.isDigit) }, s"letter+digit merged: $got")
  }

  test("byte-level: a multi-byte character splits per byte and merges back") {
    import spark.implicits._
    // 'é' = C3 A9 -> symbols 'Ã' '©'; the trainer must learn merges over
    // those byte symbols exactly as the canonical trainer does over the
    // same per-byte split — GPT-2 byte fallback, not a reject
    val text = "café café café crème"
    val docs = Seq(text).toDF("text")
    val got = BpeTrainer.learnByteMerges(docs, "text", 8).map(m => (m.l, m.r, m.pcnt))
    val pretok = BpeTrainer.ByteLevelPretokenRegex.r.findAllIn(text).map(byteSyms).toSeq
    val want = naiveBpe(pretok, 8)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.exists { case (l, r, _) => (l + r).contains("Ã©") },
      s"no merge reassembled the bytes of 'é': $got")
  }

  test("byte-level: 3-byte CJK and a 4-byte emoji train byte-by-byte") {
    import spark.implicits._
    val text = "東京 東京 東京 🌍🌍"
    val docs = Seq(text).toDF("text")
    val got = BpeTrainer.learnByteMerges(docs, "text", 10).map(m => (m.l, m.r, m.pcnt))
    val pretok = BpeTrainer.ByteLevelPretokenRegex.r.findAllIn(text).map(byteSyms).toSeq
    val want = naiveBpe(pretok, 10)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }
}
