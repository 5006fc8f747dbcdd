package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins: pre-shuffle heavy tables once at write time
  * so repeated joins on the bucket key run with NO exchange on either
  * side (SURVEY §7.1.8 "bucketed spatial partitioning"; the 100 TB story
  * for the scene⋈pixels and weights⋈pixels joins that recur every run).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** True if the executed plan of `df` contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Join two bucketed tables on their bucket key — plan should be
    * exchange-free (verified by [[hasShuffle]] in tests). */
  def bucketedJoin(spark: SparkSession, tableA: String, tableB: String, key: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), key)
}
