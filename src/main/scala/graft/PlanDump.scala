package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print one registered query's formatted physical
  * plan (AQE off, so codegen stages and join strategies show
  * statically — the same view PlanRegressionSpec asserts on).
  *
  * Usage: runMain graft.PlanDump <queryName> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name' — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    finally spark.stop()
  }
}
