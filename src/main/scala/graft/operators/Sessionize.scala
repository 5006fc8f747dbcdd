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

  /** One funnel-machine step (Scala form, shared with the streaming
    * variant — `StreamOps.streamingFunnel`; the batch [[funnel]] runs
    * the same transitions as a Column fold, parity spec-pinned). */
  final case class FunnelState(stage: Long, t0: Long, conv: Long)

  def funnelStep(st: FunnelState, tus: Long, ty: String,
      steps: Seq[String], winUs: Long): FunnelState =
    if (ty == steps.head) FunnelState(1L, tus, st.conv)
    else if (ty == steps.last && st.stage == steps.size - 1L && tus - st.t0 <= winUs)
      FunnelState(0L, 0L, st.conv + 1)
    else {
      val i = steps.indexOf(ty)
      if (i > 0 && i < steps.size - 1 && st.stage == i && tus - st.t0 <= winUs)
        FunnelState(i + 1L, st.t0, st.conv)
      else st
    }

  /** Ordered-funnel analysis (the MATCH_RECOGNIZE-shaped sequential
    * pattern): per key, scan events in (ts, tieBreak) order through a
    * strict step machine — steps(0) (re)arms the funnel and stamps t0;
    * steps(i) advances stage i -> i+1 only while ts - t0 <= windowUs;
    * completing the last step counts a conversion and resets. One
    * aggregate fold over the per-key sorted event array (the q158
    * recurrence shape) — per-key histories fit a row, the q41
    * sessionize contract.
    *
    * Returns (key, n_events, n_conversions, final_stage). */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowSec: Long,
      tieBreak: String = "event_id"): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    val evs = sort_array(collect_list(struct(
      expr(s"unix_micros($tsCol)").as("tus"),
      col(tieBreak).as("tb"), col(typeCol).as("ty"))))
    val winUs = windowSec * 1000000L
    val acc0 = struct(lit(0L).as("stage"), lit(0L).as("t0"), lit(0L).as("conv"))
    def fold(events: Column): Column = aggregate(events, acc0, (a, e) => {
      val stage = a.getField("stage"); val t0 = a.getField("t0")
      val conv = a.getField("conv")
      val ty = e.getField("ty"); val tus = e.getField("tus")
      val inWin = tus - t0 <= winUs
      val arm = struct(lit(1L).as("stage"), tus.as("t0"), conv.as("conv"))
      // middle steps: advance stage i -> i+1 (strict order, in window)
      val mid = (1 until steps.size - 1).foldLeft(a) { (els, i) =>
        when(ty === steps(i) && stage === i && inWin,
          struct(lit(i + 1L).as("stage"), t0.as("t0"), conv.as("conv")))
          .otherwise(els)
      }
      when(ty === steps.head, arm)
        .otherwise(when(ty === steps.last && stage === (steps.size - 1L) && inWin,
          struct(lit(0L).as("stage"), lit(0L).as("t0"), (conv + 1).as("conv")))
          .otherwise(mid))
    })
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), evs.as("evs"))
      .select(col(keyCol), col("n_events"), fold(col("evs")).as("st"))
      .select(col(keyCol), col("n_events"),
        col("st.conv").as("n_conversions"),
        col("st.stage").as("final_stage"))
  }
}
