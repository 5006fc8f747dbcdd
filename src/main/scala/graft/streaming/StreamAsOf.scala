package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming as-of join: the batch AsOfJoin's bucketed range form under
  * watermarks (SURVEY §7.3: "design the as-of join so its range-join form
  * also works under watermarks").
  *
  * Same discretization as the batch operator — probe bucket b equi-joins
  * build buckets {b-1,b,b+1} with an explicit |Δt| bound — which is
  * exactly the shape Structured Streaming's stream-stream join needs for
  * state cleanup: an equality key plus a time-range condition between two
  * watermarked streams. The nearest-match argmin then runs as a second
  * stateful operator (min_by aggregation per probe key), which Spark
  * 3.5+/4.x supports chained after the join.
  */
object StreamAsOf {

  /** probe(probeKey, probeTs) ⋈ build(buildTs, buildCols...) streaming.
    * Emits one row per probe key with the nearest build row within
    * `halfWindowUs`, once the watermark passes. Both inputs must be
    * streaming DataFrames; `watermark` bounds state retention.
    */
  def nearestWithin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, probeTs: String, buildTs: String,
      halfWindowUs: Long, watermark: String): DataFrame = {
    val p = probe
      .withWatermark(probeTs, watermark)
      .withColumn("__pb", expr(s"unix_micros($probeTs) div ${halfWindowUs}L"))
    val b = build
      .withWatermark(buildTs, watermark)
      .withColumn("__pb", explode(array(
        expr(s"unix_micros($buildTs) div ${halfWindowUs}L") - 1,
        expr(s"unix_micros($buildTs) div ${halfWindowUs}L"),
        expr(s"unix_micros($buildTs) div ${halfWindowUs}L") + 1)))
    val joined = p.join(b,
      p("__pb") === b("__pb")
        && col(buildTs) >= col(probeTs) - expr(s"INTERVAL ${halfWindowUs} MICROSECONDS")
        && col(buildTs) <= col(probeTs) + expr(s"INTERVAL ${halfWindowUs} MICROSECONDS"))
      .drop("__pb")
      .withColumn("__dt_us", abs(unix_micros(col(probeTs)) - unix_micros(col(buildTs))))
    joined
      .groupBy(col(probeKey), col(probeTs))
      .agg(min_by(struct(col(buildTs).as("matched_ts"), col("__dt_us").as("dt_us")),
        struct(col("__dt_us"), col(buildTs))).as("m"))
      .select(col(probeKey), col(probeTs), col("m.matched_ts"), col("m.dt_us"))
  }
}
