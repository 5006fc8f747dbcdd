package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: Viterbi optimality vs an independent
  * brute-force enumerator, tie/unk/empty edges, trainer coverage and
  * determinism. */
class UnigramLMSpec extends SparkSpec {

  /** Independent reference: enumerate EVERY segmentation recursively,
    * return the max achievable score (None if no segmentation). Compares
    * scores, not piece lists, so the DP's tie-break is not baked in. */
  private def bruteBest(word: String, vocab: Map[String, Double]): Option[Double] = {
    if (word.isEmpty) Some(0.0)
    else vocab.keysIterator
      .filter(word.startsWith)
      .flatMap(p => bruteBest(word.drop(p.length), vocab).map(_ + vocab(p)))
      .reduceOption(_ max _)
  }

  private def seg(words: Seq[String], vocab: Seq[(String, Double)]): Map[String, Seq[String]] = {
    val s = spark
    import s.implicits._
    words.toDF("tok")
      .withColumn("pieces", UnigramLM.segment(col("tok"), vocab))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
  }

  test("Viterbi achieves the brute-force max score on random words") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    // vocab: all chars + random multi-char pieces, near-irrational lps
    val pieces = alpha.map(_.toString) ++
      (0 until 12).map(_ => (0 until (2 + rnd.nextInt(2)))
        .map(_ => alpha(rnd.nextInt(4))).mkString).distinct
    val vocab = pieces.distinct.map(p => p -> (-1.0 - rnd.nextDouble * 3 - 0.001 * p.length))
    val vmap = vocab.toMap
    val words = (0 until 40).map(_ =>
      (0 until (1 + rnd.nextInt(9))).map(_ => alpha(rnd.nextInt(4))).mkString)
    val got = seg(words.distinct, vocab)
    words.distinct.foreach { w =>
      val expect = bruteBest(w, vmap).get // full char coverage
      val achieved = got(w).map(vmap).sum
      assert(math.abs(achieved - expect) < 1e-12,
        s"'$w': DP score $achieved != brute $expect (pieces ${got(w)})")
      // and the pieces reassemble the word
      assert(got(w).mkString == w, s"'$w' round-trip broke: ${got(w)}")
    }
  }

  test("exact score tie prefers the longer piece; unk and empty edges") {
    // a + b = -1.5 + -2.25 = -3.75 = lp(ab) exactly (dyadic doubles)
    val vocab = Seq("a" -> -1.5, "b" -> -2.25, "ab" -> -3.75)
    val got = seg(Seq("ab", "a", "", "ax", "x"), vocab)
    assert(got("ab") == Seq("ab"), s"tie must pick the longer piece: ${got("ab")}")
    assert(got("a") == Seq("a"))
    assert(got("") == Seq())
    assert(got("ax") == Seq(UnigramLM.Unk))
    assert(got("x") == Seq(UnigramLM.Unk))
  }

  test("longer piece wins only on ties — better split still beats it") {
    val vocab = Seq("a" -> -1.0, "b" -> -1.0, "ab" -> -2.5)
    assert(seg(Seq("ab"), vocab)("ab") == Seq("a", "b"))
  }

  test("sampled segmentation: valid paths, deterministic, seed-varied, " +
    "alpha -> inf recovers Viterbi") {
    val s = spark
    import s.implicits._
    val vocab = Seq("ab" -> -1.2, "bc" -> -1.4, "a" -> -2.0, "b" -> -2.1,
      "c" -> -2.3, "abc" -> -1.1)
    val words = Seq("abcabc", "ababab", "cab", "abcbcab", "aaa", "cba")
    def run(col2: org.apache.spark.sql.Column) =
      words.toDF("tok").withColumn("p", col2)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    val base = run(UnigramLM.segment(col("tok"), vocab))
    val s1 = run(UnigramLM.segmentSampled(col("tok"), vocab, seed = 1, alpha = 0.3))
    val s2 = run(UnigramLM.segmentSampled(col("tok"), vocab, seed = 2, alpha = 0.3))
    val s1b = run(UnigramLM.segmentSampled(col("tok"), vocab, seed = 1, alpha = 0.3))
    // every sampled path is VALID: reassembles the word from vocab pieces
    for (m <- Seq(s1, s2); w <- words) {
      assert(m(w).mkString == w, s"'$w' sampled to invalid path ${m(w)}")
      assert(m(w).forall(vocab.map(_._1).contains), s"'$w' off-vocab ${m(w)}")
    }
    assert(s1 == s1b, "same seed must reproduce exactly")
    assert(s1 != s2, "different seeds should vary some segmentation")
    // huge alpha: the model term dominates every Gumbel draw
    val hard = run(UnigramLM.segmentSampled(col("tok"), vocab, seed = 9, alpha = 1e9))
    assert(hard == base, s"alpha->inf must recover Viterbi: $hard vs $base")
  }

  test("trainer: bounded vocab, full char coverage, deterministic") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the brown dog"),
      (3L, "the five boxing wizards jump quickly over lazy dogs"),
      (4L, "quick zephyrs blow vexing daft jim while dogs jump"))
      .toDF("doc_id", "text")
    val cfg = UnigramLM.TrainConfig(maxPieceLen = 3, maxWordLen = 8,
      seedMinCnt = 2, seedSize = 40, vocabSize = 60, rounds = 2)
    val m1 = UnigramLM.train(docs, "doc_id", "text", cfg)
    val m2 = UnigramLM.train(docs, "doc_id", "text", cfg)
    assert(m1 == m2, "trainer must be deterministic")
    assert(m1.size <= cfg.vocabSize)
    val corpusChars = docs.collect().flatMap(_.getString(1).split("\\s+"))
      .filter(w => w.nonEmpty && w.length <= cfg.maxWordLen)
      .flatMap(_.toCharArray).map(_.toString).toSet
    val vocabChars = m1.map(_.piece).filter(_.length == 1).toSet
    assert(corpusChars.subsetOf(vocabChars),
      s"missing chars: ${corpusChars -- vocabChars}")
    // coverage makes every filtered word round-trip
    val rt = UnigramLM.roundTrip(docs, "doc_id", "text",
      m1.map(p => p.piece -> p.lp), cfg.maxWordLen).collect()
    rt.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.getLong(0)}: ${r.getLong(2)}/${r.getLong(1)} words round-tripped"))
    // probs normalize: sum over vocab of exp(lp) ~ 1 (6-dp rounded lps)
    val psum = m1.map(p => math.exp(p.lp)).sum
    assert(math.abs(psum - 1.0) < 1e-3, s"sum exp(lp) = $psum")
  }

  test("encodeCorpus: counts, unk accounting and id stream on a known doc") {
    val s = spark
    import s.implicits._
    val vocab = Seq("he" -> -1.0, "llo" -> -1.2, "h" -> -3.0, "e" -> -3.0,
      "l" -> -3.0, "o" -> -3.0)
    val out = UnigramLM.encodeCorpus(
      Seq((7L, "hello hello x")).toDF("doc_id", "text"), "doc_id", "text", vocab)
      .collect().head
    // hello -> he(0) llo(1); x -> <unk>(6)
    assert(out.getLong(1) == 3) // n_words
    assert(out.getLong(2) == 5) // n_pieces: 2 + 2 + 1
    assert(out.getLong(3) == 1) // n_unk
    val ids = Seq(0L, 1L, 0L, 1L, 6L)
    val fp = ids.foldLeft(7L)((a, x) => (a * 31 + x) % 1000000007L)
    assert(out.getLong(4) == fp, s"ids_fp ${out.getLong(4)} != $fp")
  }
}
