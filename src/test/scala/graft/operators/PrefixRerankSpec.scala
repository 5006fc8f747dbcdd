package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Matryoshka prefix-dim rerank: equality with a plain-Scala two-stage
  * reference, and the coarseK = corpus limit degenerating to exact
  * brute-force top-k. */
class PrefixRerankSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private val Pfx = 4

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(Dim)(j =>
      (((seed * 2654435761L + j * 40503L) % 1000L) / 500.0f) - 1.0f)

  private def corpus(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map(i => (i.toLong, vec(i)))

  private def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
    def dot(x: Array[Float], y: Array[Float]) =
      (0 until d).foldLeft(0.0)((acc, j) => acc + x(j).toDouble * y(j).toDouble)
    val raw = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def ref(rows: Seq[(Long, Array[Float])], pid: Long, k: Int,
      coarseK: Int): Seq[(Long, Long, Double, Long)] = {
    val pv = rows.find(_._1 == pid).get._2
    val coarse = rows.filter(_._1 != pid)
      .map { case (id, v) => (id, v, cos(pv, v, Pfx)) }
      .sortBy { case (id, _, s) => (-s, id) }
      .zipWithIndex.map { case ((id, v, _), i) => (id, v, i + 1L) }
      .take(coarseK)
    coarse.map { case (id, v, crnk) => (id, cos(pv, v, Dim), crnk) }
      .sortBy { case (id, s, _) => (-s, id) }
      .zipWithIndex.map { case ((id, s, crnk), i) => (i + 1L, id, s, crnk) }
      .take(k)
  }

  test("matches the two-stage reference including coarse ranks") {
    val rows = corpus(50)
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.prefixRerank(df.where(col("vec_id") % 13 === 0), df,
      k = 5, prefixDim = Pfx, coarseK = 12)
      .as[(Long, Long, Long, Double, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4, r._5)).toSeq).toMap
    rows.filter(_._1 % 13 == 0).foreach { case (pid, _) =>
      assert(got(pid) === ref(rows, pid, 5, 12), s"probe $pid")
    }
  }

  test("coarseK covering the corpus degenerates to exact brute-force") {
    val rows = corpus(40)
    val df = rows.toDF("vec_id", "embedding")
    val probes = df.where(col("vec_id") < 3)
    val viaRerank = Similarity.prefixRerank(probes, df, k = 5,
      prefixDim = Pfx, coarseK = 39)
      .select("probe_id", "neighbor_id", "rnk", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(probes, df, k = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaRerank === brute)
  }

  test("prefix pass can reorder what the full rerank corrects") {
    // two candidates identical in the prefix but different beyond it:
    // the coarse ranks tie-break by id, the rerank must separate them
    val pv = Array.fill(Dim)(1.0f)
    val near = pv.clone(); near(Dim - 1) = 0.9f
    val far = pv.clone()
    (Pfx until Dim).foreach(j => far(j) = -1.0f)
    val rows = Seq((0L, pv), (1L, far), (2L, near))
    val got = Similarity.prefixRerank(
      rows.toDF("vec_id", "embedding").where(col("vec_id") === 0),
      rows.toDF("vec_id", "embedding"), k = 2, prefixDim = Pfx, coarseK = 2)
      .as[(Long, Long, Long, Double, Long)].collect().sortBy(_._3)
    // coarse sims tie (identical prefixes) -> coarse ranks by id: far
    // (id 1) crnk 1, near (id 2) crnk 2; the full cosine flips them:
    // near wins rnk 1. Tuples are (neighbor_id, rnk, coarse_rnk).
    assert(got.map(r => (r._3, r._2, r._5)).toSeq ===
      Seq((1L, 2L, 1L), (2L, 1L, 2L)))
  }
}
