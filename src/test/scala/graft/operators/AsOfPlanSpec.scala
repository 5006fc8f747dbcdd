package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Evidence for the as-of join's scale claim: the naive theta-join form
  * plans as a nested-loop join (O(N*M) — unusable at 100 TB), while the
  * bucketed form plans as a hash equi-join. Same results, different
  * asymptotics. */
class AsOfPlanSpec extends SparkSpec {

  test("bucketed as-of is a hash join; naive |Δt|<=tol form is a nested loop") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val probe = e.where(col("event_type") === "view")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val build = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("b_id"), col("ts").as("b_ts"))

    val bucketed = AsOfJoin.nearestWithin(probe, build, "p_ts", "b_ts",
      900L * 1000000, Seq("p_id"))
    val bucketedPlan = bucketed.queryExecution.executedPlan.toString
    assert(bucketedPlan.contains("HashJoin") || bucketedPlan.contains("SortMergeJoin"),
      s"bucketed form should equi-join:\n${bucketedPlan.take(1500)}")
    assert(!bucketedPlan.contains("NestedLoop"))

    val naive = probe.join(build,
      abs(unix_micros(col("p_ts")) - unix_micros(col("b_ts"))) <= 900L * 1000000)
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoop") || naivePlan.contains("CartesianProduct"),
      s"naive form is expected to degrade to a nested loop:\n${naivePlan.take(1500)}")

    // and the bucketed candidate set is exact: same matched pairs as the
    // naive join post-processed with the same argmin
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_id"))
      .orderBy(abs(unix_micros(col("p_ts")) - unix_micros(col("b_ts"))), col("b_ts"))
    val naiveNearest = naive.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("p_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = bucketed.select("p_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naiveNearest && fast.nonEmpty)
  }

  test("inferDtMicros has no single-partition global sort and survives boundaries") {
    // a timeline whose minimum gap straddles partition boundaries: range
    // repartitioning splits the sorted domain, so the true min gap (1 us,
    // between 999_999 and 1_000_000) can only be found by the boundary
    // fix-up when partitions split there
    import spark.implicits._
    val tl = spark.range(0, 2000)
      .select((col("id") * 1000000L).as("us"))
      .union(spark.range(1).select(lit(999999999L).as("us"))) // gap 1 to 1000*1e6
      .select(timestamp_micros(col("us")).as("t_ts"))
      .repartition(16) // scatter input so the range exchange really works
    assert(AsOfJoin.inferDtMicros(tl, "t_ts") == 1L)

    // every element its own range partition -> ALL gaps are cross-boundary,
    // so the answer exists only if the driver-side fix-up is right
    val tiny = Seq(0L, 5000000L, 7000000L).toDF("us")
      .select(timestamp_micros(col("us")).as("t_ts"))
    assert(AsOfJoin.inferDtMicros(tiny, "t_ts") == 2000000L)

    // plan evidence: the inference pipeline range-repartitions; it never
    // plans a windowed global sort into one partition ("Window" with an
    // empty partition spec / SinglePartition exchange)
    val us = tl.select(unix_micros(col("t_ts")).as("us")).distinct()
      .repartitionByRange(col("us")).sortWithinPartitions("us")
    val plan = us.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range exchange:\n${plan.take(1200)}")
    assert(!plan.contains("SinglePartition") && !plan.contains("Window"),
      s"no single-partition/global-window stage allowed:\n${plan.take(1200)}")
  }
}
