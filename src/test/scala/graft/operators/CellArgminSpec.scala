package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** Native CellArgmin vs the HOF reference (array_min over cellDists):
  * bit-for-bit equality on float and double inputs including planted
  * exact ties (the (d2, cell) tie-break). */
class CellArgminSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 6
  private def cents: Seq[Seq[Double]] =
    Seq.tabulate(5, Dim)((k, j) => ((k * 7 + j * 3) % 11 - 5) / 4.0).map(_.toSeq)

  test("native == array_min(cellDists) on 80 float vectors") {
    val rows = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(Dim)(j =>
        (((i * 2654435761L + j * 40503L) % 1000L) / 250.0f) - 2.0f))
    }
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
      Similarity.cellArgmin(col("v"), cents).as("n"),
      array_min(Similarity.cellDists(col("v"), cents)).as("h"))
      .select(col("id"), col("n.d2"), col("n.cell"), col("h.d2"), col("h.cell"))
      .as[(Long, Double, Int, Double, Int)].collect()
    assert(got.length === 80)
    got.foreach { case (id, nd, nc, hd, hc) =>
      assert(java.lang.Double.doubleToLongBits(nd) ===
        java.lang.Double.doubleToLongBits(hd), s"vec $id d2")
      assert(nc === hc, s"vec $id cell")
    }
  }

  test("native == array_min(cellDists) on double vectors with exact ties") {
    // centroids 0 and 1 equidistant from the midpoint -> tie breaks to 0
    val tieCents = Seq(Seq(0.0, 0.0), Seq(2.0, 0.0), Seq(10.0, 10.0))
    val rows = Seq((1L, Array(1.0, 0.0)), (2L, Array(1.0, 5.0)),
      (3L, Array(9.0, 9.0)))
    val df = rows.toDF("id", "v")
    val got = df.select(col("id"),
      Similarity.cellArgmin(col("v"), tieCents).as("n"),
      array_min(Similarity.cellDists(col("v"), tieCents)).as("h"))
      .select(col("id"), col("n.d2"), col("n.cell"), col("h.d2"), col("h.cell"))
      .as[(Long, Double, Int, Double, Int)].collect().sortBy(_._1)
    got.foreach { case (id, nd, nc, hd, hc) =>
      assert(nd === hd, s"vec $id"); assert(nc === hc, s"vec $id")
    }
    assert(got.map(_._3).toSeq === Seq(0, 0, 2)) // ties -> lowest cell
  }
}
