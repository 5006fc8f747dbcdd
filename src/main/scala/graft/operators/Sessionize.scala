package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (the batch dual of Structured Streaming's
  * `session_window`): a new session starts when the gap to the previous
  * event of the same key exceeds `gapUs`.
  *
  * Classic gaps-and-islands: one lag + one running sum over the per-key
  * time order — two window passes over the same shuffle partitioning
  * (Spark reuses the exchange), fully expressible in ANSI SQL for the
  * oracle, and the same state semantics the streaming path produces.
  */
object Sessionize {

  /** Adds `session_id` (0-based per key, in time order). */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: Column, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), tieBreak)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || us - prev > gapUs, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }

  /** Per-session summary: bounds + event count. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: Column, gapUs: Long): DataFrame =
    assignSessions(df, keyCol, tsCol, tieBreak, gapUs)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"), max(col(tsCol)).as("t_end"))
}
