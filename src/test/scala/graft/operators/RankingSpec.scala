package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

class RankingSpec extends SparkSpec {
  import spark.implicits._

  /** Naive single-machine reference of the same integer recurrence. */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000L, dn: Long = 85, dd: Long = 100): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val deg = e.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val base = scale * (dd - dn) / dd
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val in = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) * dn / (dd * deg(u)) }.sum
      }
      r = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  test("integerPageRank == naive reference on random digraphs") {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(15)
      .withInitialSeed(org.scalacheck.rng.Seed(71L))
    val gen = for {
      n <- Gen.choose(3, 30)
      m <- Gen.choose(n, 4 * n)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
      iters <- Gen.choose(0, 6)
    } yield (es, iters)
    val res = SCTest.check(params, Prop.forAll(gen) { case (es, iters) =>
      if (es.forall(p => p._1 == p._2)) true // degenerate: no surviving edges
      else {
        val got = Ranking.integerPageRank(es.toDF("src", "dst"), "src", "dst", iters)
          .as[(Long, Long)].collect().toMap
        got == naive(es, iters)
      }
    })
    assert(res.passed, res.status.toString)
  }

  test("structure: sinks accumulate, sources hold base rank, dups/self-loops ignored") {
    // star into node 9 plus a self loop and duplicate edges
    val edges = Seq((1L, 9L), (1L, 9L), (2L, 9L), (3L, 9L), (9L, 9L), (1L, 2L))
    val out = Ranking.integerPageRank(edges.toDF("s", "d"), "s", "d", iterations = 1)
      .as[(Long, Long)].collect().toMap
    val base = 150000000L
    // node 1: two distinct out-edges (9, 2), deg 2 -> contributes 425e6 to each
    assert(out(9L) == base + 425000000L + 850000000L + 850000000L)
    assert(out(2L) == base + 425000000L)
    assert(out(1L) == base, "no in-edges -> base")
    assert(out(3L) == base)
    // total mass decays through the dangling sink (9 forwards nothing)
    assert(out.values.sum < edges.size * 1000000000L)
  }
}
