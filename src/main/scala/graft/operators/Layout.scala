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
}
