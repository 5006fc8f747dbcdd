package graft.operators

import graft.SparkSpec

/** Reciprocal-rank fusion: hand rankings, absent-side handling, list
  * truncation, and per-query isolation. */
class RrfFuseSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def frames = {
    val s = spark
    import s.implicits._
    val sparse = Seq(
      (0L, 1L, 0.9), (0L, 2L, 0.8), (0L, 3L, 0.7),
      (1L, 7L, 0.5)).toDF("qid", "doc_id", "score")
    val dense = Seq(
      (0L, 2L, 0.99), (0L, 4L, 0.5),
      (1L, 8L, 0.4)).toDF("qid", "doc_id", "score")
    (sparse, dense)
  }

  test("fusion: both-lists doc wins, absent sides report rank 0") {
    val (sparse, dense) = frames
    val got = Similarity.rrfFuse(sparse, dense, "qid", "doc_id", "score")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    // q0: doc2 fuses rank2(sparse)+rank1(dense), beating every single-list doc
    assert(got((0L, 2L)) == ((1L, r6(1.0 / 62 + 1.0 / 61), 2L, 1L)))
    assert(got((0L, 1L)) == ((2L, r6(1.0 / 61), 1L, 0L)))
    assert(got((0L, 4L)) == ((3L, r6(1.0 / 62), 0L, 2L)))
    assert(got((0L, 3L)) == ((4L, r6(1.0 / 63), 3L, 0L)))
    // q1 is isolated: its own ranks start at 1
    assert(got((1L, 7L)) == ((1L, r6(1.0 / 61), 1L, 0L)))
    assert(got((1L, 8L)) == ((2L, r6(1.0 / 61), 0L, 1L)))
    assert(got.size == 6)
  }

  test("listK truncation drops tail candidates before fusion") {
    val (sparse, dense) = frames
    val got = Similarity
      .rrfFuse(sparse, dense, "qid", "doc_id", "score", listK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((0L, 3L))) // sparse rank 3 > listK
    assert(got.contains((0L, 1L)) && got.contains((0L, 2L)))
  }

  test("topN bounds the fused output per query") {
    val (sparse, dense) = frames
    val got = Similarity
      .rrfFuse(sparse, dense, "qid", "doc_id", "score", topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.count(_._1 == 0L) == 2 && got.forall(_._2 <= 2L))
  }
}
