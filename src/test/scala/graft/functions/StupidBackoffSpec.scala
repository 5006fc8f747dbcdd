package graft.functions

import graft.SparkSpec

/** Stupid-backoff bigram LM (Brants et al. 2007): hand-computed scores,
  * the backoff branch, pruning, and alpha semantics. */
class StupidBackoffSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  // Corpus: unigrams a=6 b=5 c=2 (N=13); bigrams (a,b)=5 (b,a)=3 (b,c)=1.
  // With minBigramCount=2 only (b,c) is pruned, so doc 2 exercises both
  // the present branch and the backoff branch in one document.
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "c"),          // single token: no bigram, no output row
      (4L, "a b a b a")
    ).toDF("doc_id", "text")
  }

  private def scores(minCnt: Int = 2, alpha: Double = 0.4): Map[Long, (Long, Double)] =
    TextAnalysis.stupidBackoffScores(corpus, "doc_id", "text", minCnt, alpha)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand corpus: present and backoff branches score exactly") {
    val got = scores()
    assert(got.keySet == Set(1L, 2L, 4L)) // doc 3 has no bigram position
    val lnAB = math.log(6.0) - math.log(5.0) // ln c(a) - ln c(a,b)
    val lnBA = math.log(5.0) - math.log(3.0)
    val backBC = -math.log(0.4) + math.log(13.0) - math.log(2.0)
    assert(got(1L) == ((3L, r6((2 * lnAB + lnBA) / 3))))
    assert(got(2L) == ((2L, r6((lnAB + backBC) / 2))))
    assert(got(4L) == ((4L, r6((2 * lnAB + 2 * lnBA) / 4))))
  }

  test("minBigramCount=1: in-sample scoring never backs off") {
    // Every in-sample bigram has corpus count >= 1, so with no pruning the
    // backoff branch is dead and doc 2's (b,c) scores as ln c(b) - ln 1.
    val got = scores(minCnt = 1)
    val lnAB = math.log(6.0) - math.log(5.0)
    val lnBC = math.log(5.0) - math.log(1.0)
    assert(got(2L) == ((2L, r6((lnAB + lnBC) / 2))))
  }

  test("alpha raises/lowers only documents with backoff positions") {
    val a04 = scores(alpha = 0.4)
    val a08 = scores(alpha = 0.8)
    // doc 1 and 4 are all-present: alpha-invariant
    assert(a04(1L) == a08(1L) && a04(4L) == a08(4L))
    // doc 2 has one backoff position: larger alpha -> smaller penalty
    assert(a08(2L)._2 < a04(2L)._2)
    // exactly by ln(0.8/0.4)/2 at this document's position count
    assert(math.abs((a04(2L)._2 - a08(2L)._2) - math.log(2.0) / 2) < 1e-5)
  }
}
