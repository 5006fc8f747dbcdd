package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ORC sink -> source: typed round-trip fidelity and the two scan-time
  * prunings q140 relies on (partition-directory pruning on the partition
  * column, predicate pushdown on data columns). */
class OrcRoundtripSpec extends SparkSpec {

  test("diverse types round-trip byte-exactly") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orc-rt").toString
    val df = Seq(
      (1L, 2.5, "alpha", Seq(1, 2, 3), java.sql.Timestamp.valueOf("2024-01-02 03:04:05")),
      (2L, -0.125, "βeta", Seq.empty[Int], java.sql.Timestamp.valueOf("1999-12-31 23:59:59"))
    ).toDF("id", "v", "name", "xs", "ts")
    df.write.mode("overwrite").option("compression", "zlib").orc(dir)
    val back = s.read.orc(dir).orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    assert(back.toSeq == orig.toSeq)
  }

  test("partition filter prunes directories; data filter pushes into the scan") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orc-pp").toString
    (0L until 100L).map(i => (i, s"p${i % 4}", i * 2))
      .toDF("id", "part", "v")
      .write.mode("overwrite").partitionBy("part").orc(dir)
    val q = s.read.orc(dir).where(col("part") === "p1" && col("id") < 10L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.replaceAll("\\s", "").contains("(part#") || plan.contains("part#")),
      s"partition filter missing:\n${plan.take(1200)}")
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(id,10)"),
      s"id pushdown missing:\n${plan.take(1200)}")
    // and the pruned read is correct
    assert(q.select(sum(col("v"))).head.getLong(0) ==
      (0L until 100L).filter(i => i % 4 == 1 && i < 10).map(_ * 2).sum)
  }
}
