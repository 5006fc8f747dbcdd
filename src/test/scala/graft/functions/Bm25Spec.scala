package graft.functions

import graft.SparkSpec

/** Okapi BM25 (Lucene-variant idf): hand-computed scores, no-hit
  * exclusion, and the rarity/saturation orderings the formula promises. */
class Bm25Spec extends SparkSpec {

  private val query = Seq("spark", "merge")
  private val (k1, b) = (1.2, 0.75)

  // N=3 docs, total length 8, df(spark)=1, df(merge)=2
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "spark merge spark"),
      (2L, "alpha beta gamma delta"), // no query term: no output row
      (3L, "merge")
    ).toDF("doc_id", "text")
  }

  private def idf(dfreq: Int) = math.log(1.0 + (3.0 - dfreq + 0.5) / (dfreq + 0.5))
  private def sat(tf: Int, dl: Int) = {
    val avgdl = 8.0 / 3.0
    tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
  }
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand corpus: scores match the formula, no-hit docs are absent") {
    val got = TextAnalysis.bm25Scores(corpus, "doc_id", "text", query, k1, b)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == ((2L, r6(idf(1) * sat(2, 3) + idf(2) * sat(1, 3)))))
    assert(got(3L) == ((1L, r6(idf(2) * sat(1, 1)))))
  }

  test("rarer terms outscore common ones; tf saturates sublinearly") {
    val s = spark
    import s.implicits._
    // 10 docs of equal length: "rare" in one, "common" in nine
    val docs = (1L to 10L).map { i =>
      val t = if (i == 1) "rare" else "common"
      (i, s"$t filler words here")
    }.toDF("doc_id", "text")
    val scores = TextAnalysis
      .bm25Scores(docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L)) // rarity dominates at equal tf and dl

    // saturation: doubling tf less than doubles the per-term score
    val sat1 = sat(1, 3); val sat2 = sat(2, 3)
    assert(sat2 < 2 * sat1 && sat2 > sat1)
  }
}
