package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes classifier: hand-computed Laplace-smoothed
  * log-likelihoods, OOV-drop semantics, prior-only scoring, tie order. */
class NaiveBayesSpec extends SparkSpec {

  // train (doc_id < 4): c1 = {a a b, a b} -> a:3 b:2 (ctoks 5, docs 2)
  //                     c2 = {c c}        -> c:2      (ctoks 2, docs 1)
  // V = 3 (a b c), n_train = 3.
  // test: doc 4 "a b" true c2 (should mispredict c1), doc 5 "c" true c2,
  //       doc 6 "z z" true c2 — fully OOV, scored on priors alone.
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "a a b", "c1"),
      (2L, "a b", "c1"),
      (3L, "c c", "c2"),
      (4L, "a b", "c2"),
      (5L, "c", "c2"),
      (6L, "z z", "c2")
    ).toDF("doc_id", "text", "source")
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ll terms: class c1 denominator ln(5+3), c2 denominator ln(2+3)
  private def t1(tcnt: Int) = math.log(tcnt + 1.0) - math.log(8.0)
  private def t2(tcnt: Int) = math.log(tcnt + 1.0) - math.log(5.0)
  private val prior1 = math.log(2.0) - math.log(3.0)
  private val prior2 = math.log(1.0) - math.log(3.0)

  private def classify() =
    TextAnalysis.naiveBayesClassify(corpus, "doc_id", "text", "source",
        col("doc_id") < 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("hand corpus: smoothed argmax, in-sample and held-out") {
    val got = classify()
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))

    // doc 4 "a b": c1 = prior1 + t1(3) + t1(2), c2 = prior2 + 2·t2(0)
    val ll4c1 = prior1 + t1(3) + t1(2)
    val ll4c2 = prior2 + 2 * t2(0)
    assert(ll4c1 > ll4c2) // the classifier must prefer c1...
    assert(got(4L) == (("c2", "c1", r6(ll4c1), 2L, 0L))) // ...and be wrong

    // doc 5 "c": c2 wins
    val ll5c2 = prior2 + t2(2)
    assert(got(5L) == (("c2", "c2", r6(ll5c2), 1L, 1L)))

    // in-sample train docs classify to their own class
    assert(got(1L)._2 == "c1" && got(1L)._5 == 1L)
    assert(got(3L)._2 == "c2" && got(3L)._5 == 1L)
  }

  test("fully-OOV doc scores on priors alone (majority class wins)") {
    val got = classify()
    // doc 6 "z z": no in-vocab token -> ll = prior, argmax = c1 (2 docs vs 1)
    assert(got(6L) == (("c2", "c1", r6(prior1), 0L, 0L)))
  }

  test("prior tie breaks by label ascending") {
    val s = spark
    import s.implicits._
    // both classes: 1 train doc, 1 token, same count profile -> for a
    // fully-OOV test doc every class scores the identical prior; the
    // deterministic winner is the lexicographically smallest label
    val df = Seq(
      (1L, "a", "cB"), (2L, "b", "cA"), (3L, "zz", "cB")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis
      .naiveBayesClassify(df, "doc_id", "text", "source", col("doc_id") < 3)
      .where(col("doc_id") === 3L).collect()
    assert(got.length == 1 && got(0).getString(2) == "cA")
  }
}
