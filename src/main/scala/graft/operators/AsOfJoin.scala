package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-in-time ("as-of") join.
  *
  * Reference semantics: convml_data/pipeline/aux_sources.py:178-241 —
  * two strategies that are the same operator with the probe side swapped:
  *  - `single_scene_per_aux_time` (aux_sources.py:178-223): each aux
  *    timestamp matched to the nearest scene time iff |Δt| <= dt_aux/2.
  *  - `all_scenes_within_dt_aux` (aux_sources.py:224-231): every scene
  *    matched to its nearest aux time iff |Δt| <= dt_aux/2.
  * Tolerance is INCLUSIVE at exactly dt/2; ties between two equidistant
  * build rows resolve to the earlier one (numpy argmin picks the first of
  * a sorted time axis). When dt_aux is not configured it is inferred as
  * the minimum successive gap of the aux timeline (aux_sources.py:202-207).
  *
  * Scale design: Spark has no built-in as-of join, and a naive
  * `abs(t1-t2) <= tol` theta-join is a broadcast-nested-loop (O(N*M)) —
  * unusable at 100 TB. Instead we discretize time into buckets of width
  * `halfWindowUs` and equi-join probe bucket b against build buckets
  * {b-1, b, b+1} (build side exploded x3). Any pair within the tolerance
  * shares adjacent buckets, so the candidate set is exact; a per-probe-row
  * `row_number` then keeps the nearest. The join is a plain shuffled (or
  * broadcast) hash equi-join on a long key — AQE-friendly, skew-salvageable,
  * and the explode only triples the (typically much smaller) build side.
  */
object AsOfJoin {

  /** Minimum successive gap of a timeline, in microseconds
    * (dt_aux inference, aux_sources.py:202-207). Scalar driver-side value.
    *
    * Scale shape: NO global window (a `Window.orderBy` with no partition
    * spec is a single-task sort — fine for a calendar, fatal for a 10^8-row
    * timeline). Instead: range-repartition by timestamp, per-partition
    * sorted scan emitting (first, last, minGap), then an O(#partitions)
    * driver-side fix-up for the cross-boundary gaps — range partitions are
    * ordered and disjoint, so `next.first - current.last` is exactly the
    * gap the partition split hid. */
  def inferDtMicros(timeline: DataFrame, tsCol: String): Long = {
    val spark = timeline.sparkSession
    import spark.implicits._
    val us = timeline.select(unix_micros(col(tsCol)).as("us")).distinct()
    val summaries = us
      .repartitionByRange(col("us"))
      .sortWithinPartitions("us")
      .as[Long]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          var prev = first
          var mn = Long.MaxValue
          while (it.hasNext) {
            val c = it.next()
            if (c - prev < mn) mn = c - prev
            prev = c
          }
          Iterator((first, prev, mn))
        }
      }
      .collect() // one row per non-empty partition — bounded, not data-sized
    if (summaries.isEmpty) Long.MaxValue
    else {
      val ordered = summaries.sortBy(_._1)
      val boundaryMin = ordered.iterator.sliding(2).withPartial(false)
        .map { case Seq(a, b) => b._1 - a._2 }
        .foldLeft(Long.MaxValue)(math.min)
      math.min(ordered.iterator.map(_._3).min, boundaryMin)
    }
  }

  /** For each probe row, attach the single nearest build row with
    * |probeTs - buildTs| <= halfWindowUs (inclusive). Probe rows with no
    * candidate are dropped (inner semantics, mirroring the reference's
    * scene_ids_by_aux_timestamp maps which only contain matches).
    *
    * @param probeKey columns uniquely identifying a probe row (tie-break
    *                 scope for row_number)
    * @param broadcastBuild hint when the build timeline is small (scene
    *                       catalogs are 10^2..10^5 rows)
    * Output: probe.* ++ build.* ++ dt_us (column names must be disjoint).
    */
  def nearestWithin(
      probe: DataFrame,
      build: DataFrame,
      probeTs: String,
      buildTs: String,
      halfWindowUs: Long,
      probeKey: Seq[String],
      broadcastBuild: Boolean = false): DataFrame = {
    require(halfWindowUs > 0, "tolerance must be positive")
    // integer `div` bucketing — exact long arithmetic, no FP boundary
    // risk; cast tolerates TIMESTAMP_NTZ inputs (lossless, UTC session)
    val p = probe
      .withColumn("__pus", unix_micros(col(probeTs).cast("timestamp")))
      .withColumn("__pb", expr(s"__pus div ${halfWindowUs}L"))
    val b3 = build
      .withColumn("__bus", unix_micros(col(buildTs).cast("timestamp")))
      .withColumn("__bb0", expr(s"__bus div ${halfWindowUs}L"))
      .withColumn("__pb", explode(array(col("__bb0") - 1, col("__bb0"), col("__bb0") + 1)))
      .drop("__bb0")
    val bSide = if (broadcastBuild) broadcast(b3) else b3
    val cand = p
      .join(bSide, "__pb")
      .withColumn("__dt_us", abs(col("__pus") - col("__bus")))
      .where(col("__dt_us") <= halfWindowUs)
    val w = Window
      .partitionBy(probeKey.map(col): _*)
      .orderBy(col("__dt_us"), col(buildTs))
    cand
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__pb", "__rn", "__pus", "__bus")
      .withColumnRenamed("__dt_us", "dt_us")
  }

  /** Strategy `single_scene_per_aux_time`: one output row per aux time. */
  def singleScenePerAuxTime(
      aux: DataFrame, scenes: DataFrame, auxTs: String, sceneTs: String,
      dtAuxUs: Long, auxKey: Seq[String]): DataFrame =
    nearestWithin(aux, scenes, auxTs, sceneTs, dtAuxUs / 2, auxKey)

  /** Strategy `all_scenes_within_dt_aux`: one output row per scene. */
  def allScenesWithinDtAux(
      scenes: DataFrame, aux: DataFrame, sceneTs: String, auxTs: String,
      dtAuxUs: Long, sceneKey: Seq[String]): DataFrame =
    nearestWithin(scenes, aux, sceneTs, auxTs, dtAuxUs / 2, sceneKey)
}
