package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic point-in-interval range join via bucket discretization — the
  * shared machinery behind AsOfJoin and TensorOps.gatherTiles, exposed as
  * its own operator (F1's interval-table form: "range-join against an
  * intervals table", SURVEY §2.2).
  *
  * A naive `point BETWEEN lo AND hi` theta-join plans as a nested loop.
  * Discretizing: intervals explode to the integer buckets they overlap,
  * points carry their bucket, and the join is a hash equi-join on the
  * bucket plus the exact bounds as a post-filter. Bucket width should be
  * of the order of the typical interval length: cost is
  * O(points + intervals * avgIntervalLen/bucket + matches).
  */
object RangeJoin {

  /** Join `points` (with long column `pointCol`) to `intervals` (with
    * long columns `loCol`, `hiCol`, inclusive) on containment.
    *
    * `equiKeys` (present on both sides) join WITH the bucket: when a
    * natural key already pairs points to intervals (orderkey, scene_id),
    * folding it into the hash key bounds the candidate set per key
    * instead of pairing globally by time bucket — the difference between
    * O(matches) and O(co-bucketed pairs) at scale. */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__b", expr(s"$pointCol div ${bucketWidth}L"))
    val iv = intervals
      .withColumn("__b", explode(sequence(
        expr(s"$loCol div ${bucketWidth}L"), expr(s"$hiCol div ${bucketWidth}L"))))
    p.join(iv, "__b" +: equiKeys)
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }

  /** Timestamp convenience: containment of `pointTs` in [loTs, hiTs]. */
  def tsInInterval(
      points: DataFrame, intervals: DataFrame,
      pointTs: String, loTs: String, hiTs: String,
      bucketWidthUs: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    // cast handles TIMESTAMP_NTZ sources (parquet without the UTC flag);
    // lossless under the engine's fixed UTC session timezone
    val p = points.withColumn("__pt_us", unix_micros(col(pointTs).cast("timestamp")))
    val iv = intervals
      .withColumn("__lo_us", unix_micros(col(loTs).cast("timestamp")))
      .withColumn("__hi_us", unix_micros(col(hiTs).cast("timestamp")))
    pointInInterval(p, iv, "__pt_us", "__lo_us", "__hi_us", bucketWidthUs, equiKeys)
      .drop("__pt_us", "__lo_us", "__hi_us")
  }
}
