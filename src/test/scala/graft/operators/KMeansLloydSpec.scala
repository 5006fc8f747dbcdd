package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** From-scratch KMeans: equality with an independent local Lloyd's
  * (same init/tie/empty rules, plain arrays), blob recovery, and the
  * semDedupPreAssigned production wiring. */
class KMeansLloydSpec extends SparkSpec {

  /** Independent reference: local Lloyd's over arrays. hashUnit is
    * recomputed from its definition (poly-hash of "seed|id", mixed). */
  private def hu(seed: Long, id: Long): Double = {
    val P = 1000000007L
    val s = s"$seed|$id"
    val h = s.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % P)
    val m1 = h * 2654435761L % P
    (m1 * m1 % P).toDouble / P.toDouble
  }

  private def localFit(pts: Seq[(Long, Array[Double])], k: Int, seed: Long,
      rounds: Int): (Seq[Array[Double]], Map[Long, Int]) = {
    var cents = pts.sortBy { case (id, _) => (hu(seed, id), id) }
      .take(k).map(_._2.clone).toIndexedSeq
    def assign1(v: Array[Double]): Int = {
      var best = -1; var bd = Double.MaxValue
      for (c <- cents.indices) {
        var d = 0.0
        for (i <- v.indices) { val t = v(i) - cents(c)(i); d += t * t }
        if (d < bd) { bd = d; best = c } // strict <: first (smallest) cell wins ties
      }
      best
    }
    for (_ <- 1 to rounds) {
      val byCell = pts.groupBy { case (_, v) => assign1(v) }
      cents = cents.indices.map { c =>
        byCell.get(c) match {
          case Some(members) =>
            val dim = members.head._2.length
            val s = new Array[Double](dim)
            members.foreach { case (_, v) => for (i <- 0 until dim) s(i) += v(i) }
            s.map(_ / members.size)
          case None => cents(c)
        }
      }.toIndexedSeq
    }
    (cents.toSeq, pts.map { case (id, v) => id -> assign1(v) }.toMap)
  }

  test("fit matches the independent local Lloyd's exactly (integral blobs)") {
    val s = spark
    import s.implicits._
    val pts = (0L until 400L).map(i => (i, Array(
      (i % 5) * 80.0 + (i % 7) - 3,
      200.0 - (i % 5) * 40 + ((i / 7) % 5) - 2)))
    val df = pts.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
    val (model, assigned) = KMeansLloyd.fit(df, "id", "v", k = 5, dim = 2,
      seed = 42, rounds = 3)
    val (refCents, refAssign) = localFit(pts, k = 5, seed = 42, rounds = 3)
    model.cents.zip(refCents).zipWithIndex.foreach { case ((got, ref), c) =>
      assert(got == ref.toSeq, s"centroid $c: $got != ${ref.toSeq}")
    }
    val gotAssign = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotAssign == refAssign)
  }

  test("well-separated planted blobs are recovered with correct sizes") {
    val s = spark
    import s.implicits._
    val df = (0L until 300L).map(i =>
      (i, Seq((i % 3) * 1000.0 + (i % 11), (i % 3) * -500.0 + (i % 13))))
      .toDF("id", "v")
    val (model, assigned) = KMeansLloyd.fit(df, "id", "v", k = 3, dim = 2,
      seed = 7, rounds = 4)
    // every blob resolved: 3 non-empty cells of 100, centroids in-blob
    val sizes = assigned.groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.toSeq.sorted == Seq(100L, 100L, 100L), s"sizes $sizes")
    model.cents.foreach { c =>
      val blob = math.round(c.head / 1000.0)
      assert(math.abs(c.head - blob * 1000) < 15 &&
        math.abs(c(1) - blob * -500) < 15, s"centroid $c off-blob")
    }
  }

  test("fit assignments drive semDedupPreAssigned identically to semDedup") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (model, assigned) = KMeansLloyd.fit(emb, "vec_id", "embedding",
      k = 8, dim = 64, seed = 42, rounds = 2)
    val direct = Similarity.semDedup(emb, "vec_id", "embedding",
      model.cents, threshold = 0.3)
    val pre = Similarity.semDedupPreAssigned(
      emb.join(assigned.withColumnRenamed("id", "vec_id"), "vec_id"),
      "vec_id", "embedding", "cell", model.cents, threshold = 0.3)
    val a = direct.collect().map(_.toSeq).toSet
    val b = pre.collect().map(_.toSeq).toSet
    assert(a == b, s"production path diverged: ${(a -- b).take(3)} vs ${(b -- a).take(3)}")
  }
}
