package graft.plans

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class SortedLongIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("merge-walk count equals size(array_intersect) on sorted sets") {
    val rows = (1 to 200).map { i =>
      val a = (1 to 50).map(k => (k.toLong * i) % 97).distinct.sorted
      val b = (1 to 50).map(k => (k.toLong * (i + 3)) % 97).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
      org.apache.spark.sql.GraftColumnBridge.column(
        SortedLongIntersectCount(
          org.apache.spark.sql.GraftColumnBridge.expression(col("a")),
          org.apache.spark.sql.GraftColumnBridge.expression(col("b")))).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("jaccardSorted matches set-jaccard and handles disjoint/identical") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),   // identical -> 1.0
      (Seq(1L, 2L), Seq(3L, 4L)),            // disjoint -> 0.0
      (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L)) // 2 / 5
    ).toDF("a", "b")
    val out = df.select(Dedup.jaccardSorted(col("a"), col("b"))).as[Double].collect()
    assert(out.toSeq == Seq(1.0, 0.0, 0.4))
  }

  test("interpreted (no-codegen) path agrees with codegen path") {
    val df = Seq((Seq(1L, 5L, 9L), Seq(5L, 9L, 11L))).toDF("a", "b")
    def run(): Double = df.select(Dedup.jaccardSorted(col("a"), col("b"))).as[Double].head()
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == withCodegen && withCodegen == 0.5)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
