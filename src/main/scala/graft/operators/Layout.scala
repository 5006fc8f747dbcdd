package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) clustering of a table on
  * two integer dimensions, so file-level min/max statistics prune scans
  * that filter on EITHER dimension — the multi-dimensional clustering
  * every 100 TB lakehouse table wants before it is written (the
  * Delta/Iceberg OPTIMIZE ZORDER family, built here from first
  * principles: bit interleave → range repartition → sort within files).
  *
  * Reference scope: the scene/tile parquet layouts convml-data writes
  * per (scene, tile) key (convml_data/pipeline/tiles.py write paths) —
  * here generalized to a layout the scan side can prune on both keys.
  *
  * The z-value is pure integer bit math (no UDF, codegen'd), identical
  * in the DuckDB oracle; the layout step is Spark-native
  * repartitionByRange + sortWithinPartitions, which at scale becomes
  * the shuffle that writes clustered files.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative ints:
    * a's bit i lands at position 2i, b's at 2i+1. Pure bit expression —
    * 2·bits shift/mask/or terms, whole-stage-codegen'd. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)

  /** The DuckDB mirror of [[zValue]] (same term order). */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Cluster `df` for writing: range-partition on the z-value into
    * `numFiles` output partitions and sort inside each — every output
    * file then covers a contiguous z-range, i.e. a small rectangle in
    * (a, b) space, and its min/max column stats prune both dimensions. */
  def zOrderBy(df: DataFrame, aCol: String, bCol: String, bits: Int,
      numFiles: Int): DataFrame = {
    val z = zValue(col(aCol).cast("long"), col(bCol).cast("long"), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Hilbert-curve index of (a, b) on a 2^bits × 2^bits grid — the
    * strictly-better-locality cousin of [[zValue]]: consecutive Hilbert
    * indexes are always GRID NEIGHBORS (Manhattan distance 1), so a
    * clustered file's key-range rectangle never jumps across the plane
    * the way Morton's quadrant seams do — the layout Delta/Iceberg
    * added after Z-order for exactly that reason. Classic iterative
    * quadrant-rotation formulation (Hilbert 1891; the standard xy2d
    * loop), expressed as an `aggregate` fold over the descending
    * quadrant sizes with a (x, y, d) struct accumulator — one lambda
    * body regardless of bits (a when-chain per step would grow the
    * expression tree geometrically), pure integer math, codegen'd. */
  def hilbertValue(aCol: Column, bCol: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    val sVals = typedlit((bits - 1 to 0 by -1).map(1L << _))
    val acc0 = struct(aCol.cast("long").as("x"), bCol.cast("long").as("y"),
      lit(0L).as("d"))
    aggregate(sVals, acc0, (acc, s) => {
      val x = acc.getField("x"); val y = acc.getField("y")
      val rx = when(x.bitwiseAND(s) > 0, 1L).otherwise(0L)
      val ry = when(y.bitwiseAND(s) > 0, 1L).otherwise(0L)
      val fx = when(rx === 1, s - 1 - x).otherwise(x)
      val fy = when(rx === 1, s - 1 - y).otherwise(y)
      struct(
        when(ry === 0, fy).otherwise(x).as("x"),
        when(ry === 0, fx).otherwise(y).as("y"),
        (acc.getField("d") + s * s * (lit(3L) * rx).bitwiseXOR(ry)).as("d"))
    }, _.getField("d"))
  }

  /** One DuckDB step of the same loop for quadrant size `s`: a
    * projection over (a, b, x, y, d) reading from `%P%` (the caller
    * substitutes the previous CTE name). Chained CTEs rather than one
    * inlined expression — textual substitution would grow ~4× per bit. */
  def hilbertStepSql(s: Long): String = {
    val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
    val fx = s"(CASE WHEN $rx = 1 THEN $s - 1 - x ELSE x END)"
    val fy = s"(CASE WHEN $rx = 1 THEN $s - 1 - y ELSE y END)"
    s"""SELECT a, b,
       | (CASE WHEN $ry = 0 THEN $fy ELSE x END) AS x,
       | (CASE WHEN $ry = 0 THEN $fx ELSE y END) AS y,
       | (d + $s * $s * xor(3 * $rx, $ry)) AS d
       |FROM %P%""".stripMargin
  }

  /** The full CTE chain `h0 .. h<bits>` computing [[hilbertValue]] over
    * a source CTE exposing integer columns a, b. The final CTE carries
    * (a, b, d). */
  def hilbertCtesSql(srcCte: String, bits: Int): String = {
    val h0 = s"h0 AS (SELECT a, b, a AS x, b AS y, 0 AS d FROM $srcCte)"
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (i, k) =>
      s"h${k + 1} AS (${hilbertStepSql(1L << i).replace("%P%", s"h$k")})"
    }
    (h0 +: steps).mkString(",\n")
  }

  /** [[zOrderBy]] with the Hilbert index as the clustering key. */
  def hilbertOrderBy(df: DataFrame, aCol: String, bCol: String, bits: Int,
      numFiles: Int): DataFrame = {
    val h = hilbertValue(col(aCol).cast("long"), col(bCol).cast("long"), bits)
    df.withColumn("_h", h)
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
  }
}
