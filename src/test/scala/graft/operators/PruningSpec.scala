package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prototype-distance pruning: assignment vs a brute-force reference,
  * ceil-keep arithmetic, hardest-first semantics, and the two-phase
  * rank's equality with a single-window rank across bucket counts. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 4
  private val K = 3

  private def cents: Seq[Seq[Double]] =
    Seq.tabulate(K, Dim)((k, j) => ((k * 5 + j * 3) % 7 - 3) / 2.0).map(_.toSeq)

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(Dim)(j =>
      (((seed * 2654435761L + j * 40503L) % 1000L) / 250.0f) - 2.0f)

  private def corpus(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map(i => (i.toLong, vec(i)))

  private def refAssign(v: Array[Float]): (Long, Long) = {
    val d2s = cents.map(c => (0 until Dim).foldLeft(0.0) { (acc, j) =>
      val d = v(j).toDouble - c(j); acc + d * d
    })
    val cell = d2s.zipWithIndex.minBy { case (d, i) => (d, i) }._2
    (cell.toLong, math.round(d2s(cell) * 1e6))
  }

  private def run(n: Int, nBuckets: Int) =
    Pruning.protoPrune(corpus(n).toDF("vec_id", "embedding"), "vec_id",
      "embedding", cents, keepNum = 7, keepDen = 10, nBuckets = nBuckets)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)

  test("assignment and distance match the brute-force reference") {
    val got = run(60, 64).map(r => r._1 -> (r._2, r._3)).toMap
    corpus(60).foreach { case (id, v) =>
      assert(got(id) === refAssign(v), s"vec $id")
    }
  }

  test("two-phase rank equals the single-window rank for any nBuckets") {
    val ref = run(80, 1)
    Seq(4, 64, 1024).foreach { nb =>
      assert(run(80, nb) === ref, s"nBuckets $nb")
    }
  }

  test("per-cell keep target is ceil(0.7 n) and exactly that many kept") {
    val rows = run(80, 64)
    rows.groupBy(_._2).foreach { case (cell, rs) =>
      val n = rs.length
      val expKeep = (n * 7 + 9) / 10
      assert(rs.head._6 === expKeep.toLong, s"cell $cell n_keep")
      assert(rs.count(_._5 == 1L) === expKeep, s"cell $cell kept count")
    }
  }

  test("kept rows are exactly the hardest (largest-distance) per cell") {
    val rows = run(80, 64)
    rows.groupBy(_._2).foreach { case (cell, rs) =>
      val sorted = rs.sortBy(r => (-r._3, r._1)) // (d_u desc, id)
      val expKept = sorted.take(rs.head._6.toInt).map(_._1).toSet
      assert(rs.filter(_._5 == 1L).map(_._1).toSet === expKept, s"cell $cell")
      // ranks are a permutation of 1..n in that order
      assert(sorted.map(_._4) === (1L to rs.length.toLong), s"cell $cell ranks")
    }
  }

  test("keepDen edge: keepNum == keepDen keeps everything") {
    val all = Pruning.protoPrune(corpus(30).toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, keepNum = 1, keepDen = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(all.forall(_._5 == 1L))
  }
}
