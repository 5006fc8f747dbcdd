package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weights-based regridding — the reference's heaviest operator re-expressed
  * as a join + aggregation.
  *
  * Reference: convml_data/pipeline/regridding.py:87-117 (xESMF bilinear /
  * nearest_s2d onto a regular Cartesian grid), per-tile variant
  * convml_data/pipeline/tiles.py:255-265, embedding-grid variant
  * pipeline/embeddings/aux_fields/emb_regridding.py:26-53.
  *
  * Design (SURVEY §2.8 R1): interpolation = sparse weights matrix
  * (dst_cell, src_cell, w). Generating the weights is pure column math on
  * the destination grid (4 rows/dst for bilinear, 1 for nearest); applying
  * them is `src ⨝ weights on src_cell` then `groupBy(dst_cell).sum(w*v)`.
  * Key scale insight (SURVEY §7.4.1): weights depend only on the
  * (src_grid, dst_grid) pair — generate once, broadcast when small, reuse
  * across every scene sharing the grid. The join is a plain equi-join on
  * the integer src-cell key: Catalyst broadcasts it, AQE handles skew, and
  * the aggregation combines map-side. No custom physical operator needed.
  */
object Regrid {

  /** Regular grid: cell centers at x0 + (i + 0.5)*dx for i in 0..nx-1. */
  final case class GridDef(x0: Double, dx: Double, nx: Int, y0: Double, dy: Double, ny: Int) {
    def cellKey(i: Column, j: Column): Column = i * ny + j
  }

  /** Bilinear interpolation weights from `src` grid to `dst` grid:
    * one row per (dst_i, dst_j) × 4 neighbor corners, columns
    * (dst_i, dst_j, src_i, src_j, w). Destination cells whose stencil
    * falls outside the source grid are clamped to the edge (the reference
    * crops with a pad before regridding so the stencil is interior).
    */
  def bilinearWeights(spark: SparkSession, src: GridDef, dst: GridDef): DataFrame = {
    import spark.implicits._
    val base = spark.range(dst.nx.toLong * dst.ny)
      .select((col("id") / dst.ny).cast("int").as("dst_i"), (col("id") % dst.ny).cast("int").as("dst_j"))
    val fx = (lit(dst.x0) + (col("dst_i") + 0.5) * dst.dx - src.x0) / src.dx - 0.5
    val fy = (lit(dst.y0) + (col("dst_j") + 0.5) * dst.dy - src.y0) / src.dy - 0.5
    val cellsAndFracs = base
      .withColumn("i0", greatest(lit(0), least(lit(src.nx - 2), floor(fx).cast("int"))))
      .withColumn("j0", greatest(lit(0), least(lit(src.ny - 2), floor(fy).cast("int"))))
      .withColumn("tx", greatest(lit(0.0), least(lit(1.0), fx - col("i0"))))
      .withColumn("ty", greatest(lit(0.0), least(lit(1.0), fy - col("j0"))))
    cellsAndFracs.select(col("dst_i"), col("dst_j"),
      explode(array(
        struct(col("i0").as("src_i"), col("j0").as("src_j"),
          ((lit(1.0) - col("tx")) * (lit(1.0) - col("ty"))).as("w")),
        struct((col("i0") + 1).as("src_i"), col("j0").as("src_j"),
          (col("tx") * (lit(1.0) - col("ty"))).as("w")),
        struct(col("i0").as("src_i"), (col("j0") + 1).as("src_j"),
          ((lit(1.0) - col("tx")) * col("ty")).as("w")),
        struct((col("i0") + 1).as("src_i"), (col("j0") + 1).as("src_j"),
          (col("tx") * col("ty")).as("w")))).as("c"))
      .select(col("dst_i"), col("dst_j"), col("c.src_i"), col("c.src_j"), col("c.w"))
  }

  /** Nearest-neighbor weights: 1 row per dst cell, w = 1. */
  def nearestWeights(spark: SparkSession, src: GridDef, dst: GridDef): DataFrame = {
    val base = spark.range(dst.nx.toLong * dst.ny)
      .select((col("id") / dst.ny).cast("int").as("dst_i"), (col("id") % dst.ny).cast("int").as("dst_j"))
    val fx = (lit(dst.x0) + (col("dst_i") + 0.5) * dst.dx - src.x0) / src.dx - 0.5
    val fy = (lit(dst.y0) + (col("dst_j") + 0.5) * dst.dy - src.y0) / src.dy - 0.5
    base
      .withColumn("src_i", greatest(lit(0), least(lit(src.nx - 1), round(fx).cast("int"))))
      .withColumn("src_j", greatest(lit(0), least(lit(src.ny - 1), round(fy).cast("int"))))
      .withColumn("w", lit(1.0))
  }

  /** Apply a weights table to long-format source pixels.
    *
    * `src`: (groupCols..., src_i, src_j, value); output
    * (groupCols..., dst_i, dst_j, value = Σ w·v). Broadcast the weights —
    * they are O(dst cells), tiny next to the pixel table.
    */
  def applyWeights(src: DataFrame, weights: DataFrame, groupCols: Seq[String],
      valueCol: String = "value"): DataFrame =
    src.join(broadcast(weights), Seq("src_i", "src_j"))
      .groupBy((groupCols.map(col) :+ col("dst_i")) :+ col("dst_j"): _*)
      .agg(sum(col("w") * col(valueCol)).as(valueCol))
}
