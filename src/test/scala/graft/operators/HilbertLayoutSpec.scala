package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hilbert index: reference-loop equality, the adjacency property that
  * distinguishes it from Morton, and the clustered-layout bound. */
class HilbertLayoutSpec extends SparkSpec {

  /** Textbook xy2d (the loop the Spark fold and the SQL CTEs express). */
  private def xy2d(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("fold equals the reference loop over the full 32x32 grid") {
    val s = spark
    import s.implicits._
    val got = (0 until 32).flatMap(a => (0 until 32).map(b => (a, b)))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.hilbertValue(col("a"), col("b"), 5).as("d"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (a <- 0 until 32; b <- 0 until 32)
      assert(got((a, b)) == xy2d(32, a, b), s"($a,$b)")
  }

  test("consecutive indexes are grid neighbors (Morton is not)") {
    val n = 16
    val byD = (0 until n).flatMap(a => (0 until n).map(b => (xy2d(n, a, b), a, b)))
      .sortBy(_._1)
    // bijective onto 0..n^2-1
    assert(byD.map(_._1) == (0L until n.toLong * n))
    // every step moves exactly one cell
    byD.sliding(2).foreach { case Seq((_, a1, b1), (_, a2, b2)) =>
      assert(math.abs(a1 - a2) + math.abs(b1 - b2) == 1)
    }
  }

  test("hilbertOrderBy: every output partition covers one contiguous index range") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(2000)((rnd.nextInt(256), rnd.nextInt(256))).toDF("a", "b")
    val parts = Layout.hilbertOrderBy(df, "a", "b", 8, 8)
      .select(Layout.hilbertValue(col("a"), col("b"), 8).as("h"),
        spark_partition_id().as("p"))
      .groupBy("p").agg(min("h").as("lo"), max("h").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // ranges are disjoint and ordered: partition k's max < partition k+1's min
    parts.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
