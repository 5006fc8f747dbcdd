package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D equal-width binned statistics.
  *
  * Reference: convml_data/pipeline/embeddings/aux_fields/plot_types.py:10-92
  * (`scalar_binning_2d`: per-bin mean/sem/count, bins with fewer than
  * `min_points` masked out).
  *
  * Scale design: one hash aggregation keyed on the two integer bin ids —
  * map-side combine makes this linear with a single small shuffle; no
  * window, no join. Bin ids are computed with `floor` (LongType in Spark),
  * so partition pruning/pushdown on the inputs is unaffected.
  */
object Binning {
  def binId(c: Column, width: Double): Column = floor(c.cast("double") / width)

  /** Per-bin count/sum/min/max of `v`; bins below `minCount` dropped. */
  def bin2d(
      df: DataFrame,
      xCol: Column, dx: Double,
      yCol: Column, dy: Double,
      v: Column,
      minCount: Long): DataFrame =
    df.groupBy(binId(xCol, dx).as("xbin"), binId(yCol, dy).as("ybin"))
      .agg(
        count(v).as("n"),
        sum(v).as("v_sum"),
        min(v).as("v_min"),
        max(v).as("v_max"))
      .where(col("n") >= minCount)
}
