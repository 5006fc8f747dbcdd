package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface.
  *
  * The reference is batch-only; its nearest streaming analogs are the
  * scene-completeness gate (A1: emit a scene only once all inputs arrived)
  * and the sequential trajectory chaining (W2). Both are re-expressed here
  * on Spark's streaming engine per the target spec: watermarked windowed
  * aggregation, the A1 completeness gate as a stateful stream, and
  * `flatMapGroupsWithState` for per-key sequential state.
  *
  * Scale notes: state is partitioned by key (scene time / user), watermark
  * bounds state size, and every aggregation here is the same map-side
  * combining hash agg as the batch path — the batch/stream plans share
  * operator shapes by construction.
  */
object StreamOps {

  /** G8-analog: tumbling-window event counts with a watermark. */
  def windowedCounts(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("sum_cents"))

  /** A1-analog as a stream: emit a "scene" row once all `nTypes` distinct
    * event types have been observed within the hour bucket. Exact gate
    * (size of collect_set, supported in streaming aggregations) — an HLL
    * approx_count_distinct could falsely open or hold it vs the batch A1
    * count(DISTINCT) semantics. */
  def completenessGate(events: DataFrame, nTypes: Int, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(size(collect_set(col("event_type"))).cast("long").as("n_types"),
        count(lit(1)).as("n_events"))
      .where(col("n_types") >= nTypes)

  /** q41-analog as a stream: gap-based sessions via the engine's
    * `session_window`. Boundary (pinned by StreamLateDataSpec): an
    * event exactly `gap` after the previous one MERGES into the same
    * session — per-event windows behave as [t, t+gap] for merging, so
    * only a STRICTLY larger delta splits. The batch q41 dual splits at
    * deltas >= gap; the two agree on any corpus without exact-gap
    * deltas (the microsecond-real event tables — q98's green oracle),
    * and diverge by one merge on a corpus that hits the boundary.
    * State per key is one open session, evicted once the watermark
    * passes its close — bounded on an unbounded feed. */
  def sessionWindows(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"), max(col(tsCol)).as("t_end"))
      .select(col(keyCol), col("n_events"), col("t_start"), col("t_end"))

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Track(user_id: Long, n_events: Long, last_value: Double, drift: Double)

  /** W2/W5-analog: per-key sequential state (each update folds the new
    * batch into carried state, like frame-to-frame point tracking). */
  def trackPerUser(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[Track]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
          if (sorted.isEmpty) Iterator.empty
          else {
            val prev = state.getOption.getOrElse(Track(uid, 0L, sorted.head.value, 0.0))
            val drift = sorted.last.value - prev.last_value
            val next = Track(uid, prev.n_events + sorted.size, sorted.last.value, drift)
            state.update(next)
            Iterator(next)
          }
      }.toDF()
  }

  /** Drive a streaming DataFrame synchronously into a memory sink (local
    * smoke path; production would use a real sink + trigger). */
  /** Streaming exact dedup (the Dedup.exactDedup stream analog): emit
    * each content digest's FIRST arrival only. `dropDuplicates` keyed on
    * the digest with a watermark on the event time bounds the dedup
    * state to the watermark horizon — the standard shape for dedup over
    * an unbounded ingest feed (at 100 TB/day the state holds one row per
    * distinct digest inside the horizon, partitioned by digest hash). */
  def streamingExactDedup(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .withColumn("digest", md5(col(textCol)))
      // WithinWatermark variant: state for a digest is EVICTED once the
      // watermark passes it (plain dropDuplicates would grow state
      // unboundedly on an infinite stream)
      .dropDuplicatesWithinWatermark("digest")

  final case class TokRow(shard: Long, seq: Long, item: String)
  final case class MgCounter(item: String, est: Long)
  final case class MgShard(shard: Long, n_seen: Long, counters: Seq[MgCounter])

  /** Streaming Misra-Gries heavy hitters: per-shard MG(k) summaries
    * maintained in `flatMapGroupsWithState`, one state row per shard of
    * at most k−1 counters — bounded state on an UNBOUNDED stream, where
    * a streaming group-by count would grow with the distinct-item count.
    * Items shard by hash; the union of shard candidates contains every
    * item above N/k per shard (and the per-shard summaries merge by
    * `MisraGriesAgg.mgMerge` downstream, the batch pipeline's shape).
    *
    * Each micro-batch folds its rows in `seq` order, so the final state
    * is the exact sequential MG of the per-shard stream — the spec
    * replays it. Emits the updated shard summary each batch (Update
    * mode), counters sorted (est desc, item). */
  def streamingHeavyHitters(toks: DataFrame, k: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.select(col("shard"), col("seq"), col("item")).as[TokRow]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[TokRow], state: GroupState[MgShard]) =>
          val prev = state.getOption.getOrElse(MgShard(shard, 0L, Seq.empty))
          val buf = scala.collection.mutable.HashMap.from(
            prev.counters.map(c => c.item -> c.est))
          val batch = rows.toSeq.sortBy(_.seq)
          batch.foreach(r => graft.plans.MisraGriesAgg.mgUpdate(buf, r.item, k))
          val next = MgShard(shard, prev.n_seen + batch.size,
            buf.toSeq.sortBy { case (it, c) => (-c, it) }
              .map { case (it, c) => MgCounter(it, c) })
          state.update(next)
          Iterator(next)
      }.toDF()
  }

  /** Stream-stream time-interval join (the attribution shape: each
    * click joins the impressions of the same user in the preceding
    * `windowSec`). Both sides are watermarked so the join state is
    * bounded — Spark evicts an impression once no future click can
    * reach back to it (the watermark + interval bound give the engine a
    * provable eviction horizon; an unwatermarked stream-stream join
    * would buffer forever). Inner join, so late rows beyond either
    * watermark drop — the documented streaming-join contract. */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
      windowSec: Long, watermark: String): DataFrame = {
    val imp = impressions
      .select(col("user_id"), col("imp_id"), col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val clk = clicks
      .select(col("user_id").as("c_user"), col("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    imp.join(clk,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("user_id"), col("imp_id"), col("click_id"),
        col("imp_ts"), col("click_ts"))
  }

  final case class FunnelEv(user_id: Long, tus: Long, tb: Long, ty: String)
  final case class FunnelRow(user_id: Long, n_events: Long,
    n_conversions: Long, final_stage: Long)

  /** Streaming ordered funnel: per-user `Sessionize.FunnelState` in
    * flatMapGroupsWithState, stepping `Sessionize.funnelStep` — the
    * SAME transition table as the batch Column fold (parity
    * spec-pinned across micro-batch splits). Each micro-batch's rows
    * fold in (tus, tb) order; like [[trackPerUser]], cross-batch
    * ordering is the ingest contract (an out-of-order feed needs a
    * watermarked reorder buffer upstream). Emits the running per-user
    * totals each batch (Update mode); state is one 3-long struct per
    * user. */
  def streamingFunnel(events: DataFrame, steps: Seq[String],
      windowSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = windowSec * 1000000L
    events.select(col("user_id"), expr("unix_micros(ts)").as("tus"),
        col("event_id").as("tb"), col("event_type").as("ty")).as[FunnelEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEv],
         state: GroupState[(Long, Long, Long, Long)]) =>
          val (st0, t00, cv0, n0) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
          val batch = rows.toSeq.sortBy(e => (e.tus, e.tb, e.ty))
          val fin = batch.foldLeft(graft.operators.Sessionize.FunnelState(st0, t00, cv0)) {
            (a, e) => graft.operators.Sessionize.funnelStep(a, e.tus, e.ty, steps, winUs)
          }
          val n = n0 + batch.size
          state.update((fin.stage, fin.t0, fin.conv, n))
          Iterator(FunnelRow(uid, n, fin.conv, fin.stage))
      }.toDF()
  }

  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Update()): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
