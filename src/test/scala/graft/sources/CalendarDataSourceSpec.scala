package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CalendarDataSourceSpec extends SparkSpec {

  private def cal(): DataFrame = spark.read
    .format("graft.sources.CalendarDataSource")
    .option("t0", "2024-01-01 00:00:00")
    .option("t1", "2024-12-31 23:00:00")
    .option("stepMinutes", "60")
    .option("chunkHours", "168")
    .load()

  private def nPartitions(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputPartitions.size

  test("emits the hourly timeline with scene ids") {
    val df = cal().where(col("time") < lit("2024-01-02").cast("timestamp"))
    assert(df.count() == 24)
    val first = df.orderBy("time").select("scene_id").head().getString(0)
    assert(first == "cal__202401010000")
  }

  test("time filters prune whole chunks at planning time") {
    val full = cal()
    val pruned = cal().where(
      col("time") >= lit("2024-06-01").cast("timestamp")
        && col("time") < lit("2024-06-15").cast("timestamp"))
    val (nFull, nPruned) = (nPartitions(full), nPartitions(pruned))
    assert(nFull >= 52, s"full year should plan ~53 week chunks, got $nFull")
    assert(nPruned <= 3, s"two-week window should plan <=3 chunks, got $nPruned")
    // pruning must not change results vs a post-hoc filter
    val post = full.where(
      col("time") >= lit("2024-06-01").cast("timestamp")
        && col("time") < lit("2024-06-15").cast("timestamp"))
    assert(pruned.count() == post.count() && pruned.count() == 14 * 24)
  }

  test("non-time filters remain as residual post-scan filters") {
    val df = cal().where(col("scene_id").endsWith("0600"))
    assert(df.count() == 366) // one 06:00 scene per day of 2024
  }

  test("column pruning reaches the scan (time-only projection)") {
    val df = cal().select("time")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=time") && !plan.contains("cols=time,scene_id"),
      s"scan should read only the time column:\n${plan.take(800)}")
    assert(df.count() == 366 * 24)
    // and a scene_id-only projection still works (reader emits per-schema)
    val ids = cal().select("scene_id")
    assert(ids.queryExecution.executedPlan.toString.contains("cols=scene_id"))
    assert(ids.distinct().count() == 366 * 24)
  }
}
