package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CF mask-and-scale over the HDF5/netCDF-4 mount — the packed-storage
  * semantics xarray applies on open (`mask_and_scale=True`), which is
  * how the reference consumes every satellite granule
  * (convml_data/sources/goes16/satpy_rgb.py loads through satpy/xarray;
  * CF conventions §8.1 "Packed Data"):
  *
  *   decoded = raw == _FillValue ? null : raw * scale_factor + add_offset
  *
  * The attributes come from the file's own metadata
  * ([[HDF5.attributes]], a KB-scale driver-side header walk); absent
  * attributes default to identity (scale 1, offset 0, no fill) — an
  * unpacked variable round-trips unchanged. The transform is a plain
  * column projection on TOP of the mount scan, so `dK`/`idx` pruning
  * and residual filters on the raw columns are untouched, and the
  * whole expression stays inside whole-stage codegen.
  */
object CfDecode {

  /** The three CF packing attributes of one HDF5 dataset. */
  final case class CfAttrs(scale: Double, offset: Double, fill: Option[Double])

  /** Read scale_factor / add_offset / _FillValue for `dataset` (each a
    * 1-element numeric array per CF §8.1; absent -> identity). */
  def hdf5CfAttrs(path: String, dataset: String): CfAttrs = {
    val in = new PagedFileInput(path)
    val attrs = try HDF5.attributes(in).getOrElse(dataset, Nil) finally in.close()
    def num(name: String): Option[Double] = attrs.find(_.name == name).flatMap(_.num)
    CfAttrs(num("scale_factor").getOrElse(1.0), num("add_offset").getOrElse(0.0),
      num("_FillValue"))
  }

  /** Apply mask-and-scale to a mount DataFrame's `value` column using
    * `attrs`. Fill comparison happens on the RAW value (CF order:
    * mask, then scale). */
  def maskAndScale(df: DataFrame, attrs: CfAttrs): DataFrame = {
    val raw = col("value")
    val masked = attrs.fill match {
      case Some(f) => when(raw === lit(f), lit(null)).otherwise(raw)
      case None => raw
    }
    df.withColumn("value", (masked * lit(attrs.scale) + lit(attrs.offset)).cast("double"))
  }

  /** The `dataset` rows of the HDF5 mount at `path`, mask-and-scale
    * decoded from the file's own CF attributes. */
  def hdf5(spark: org.apache.spark.sql.SparkSession, path: String,
      dataset: String): DataFrame =
    maskAndScale(
      spark.read.format("graft.sources.Hdf5DataSource")
        .option("path", path).load()
        .where(col("dataset") === dataset),
      hdf5CfAttrs(path, dataset))
}
