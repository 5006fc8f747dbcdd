package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering: bit-interleave against a naive Scala reference,
  * and the layout guarantee — after zOrderBy, output partitions cover
  * disjoint z-ranges (what makes file min/max stats prune). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def naiveZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the naive interleave on a 32x32 grid") {
    val rows = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zValue(col("a"), col("b"), 5).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === naiveZ(a, b, 5)) }
  }

  test("z-order locality: adjacent cells differ in few leading bits") {
    // the defining property: a 2x2 block shares all but the low 2 bits
    for (a <- Seq(0L, 4L, 20L); b <- Seq(0L, 8L, 16L)) {
      val base = naiveZ(a, b, 8) >> 2
      assert(naiveZ(a + 1, b, 8) >> 2 === base)
      assert(naiveZ(a, b + 1, 8) >> 2 === base)
      assert(naiveZ(a + 1, b + 1, 8) >> 2 === base)
    }
  }

  test("zOrderBy yields disjoint per-partition z-ranges") {
    val df = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("x", "y")
    val laid = Layout.zOrderBy(df, "x", "y", bits = 6, numFiles = 8)
    val ranges = laid
      .withColumn("z", Layout.zValue(col("x"), col("y"), 6))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"),
        count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    assert(ranges.map(_._4).sum === 64L * 64L)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
