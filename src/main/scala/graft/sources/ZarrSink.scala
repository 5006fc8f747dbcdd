package graft.sources

import org.apache.spark.sql.DataFrame

/** Minimal Zarr v2 export (S12): one store per scene, each holding the
  * (y, x) grid of a variable plus 1-D coordinate arrays, laid out per
  * the public zarr v2 spec — `.zgroup`/`.zarray`/`.zattrs` JSON and raw
  * little-endian C-order chunk files, no compressor. The `.zattrs`
  * carry xarray's `_ARRAY_DIMENSIONS` convention so the store opens
  * directly with `xr.open_zarr` — the export a reference user feeds
  * back into their tooling (the aux-field netCDF sink's sibling,
  * pipeline/embeddings/aux_fields/utils.py:43-68).
  *
  * Single-chunk per array: scene grids are O(tile) rasters. A large-
  * array variant would chunk on a (cy, cx) grid with one task per chunk
  * — same executor-side write pattern as [[NetCDFIngest.writeScenes]].
  */
object ZarrSink {

  private def jsonArray(shape: Seq[Int], dtype: String): String =
    s"""{"zarr_format": 2, "shape": [${shape.mkString(", ")}],
       | "chunks": [${shape.mkString(", ")}], "dtype": "$dtype",
       | "compressor": null, "fill_value": "NaN", "filters": null,
       | "order": "C"}""".stripMargin

  private def writeDoubles(path: java.io.File, values: Array[Double]): Unit = {
    val buf = java.nio.ByteBuffer.allocate(values.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    values.foreach(buf.putDouble)
    val fos = new java.io.FileOutputStream(path)
    try fos.write(buf.array()) finally fos.close()
  }

  private def writeArray(dir: java.io.File, name: String, shape: Seq[Int],
      dims: Seq[String], values: Array[Double], chunkKey: String): Unit = {
    val d = new java.io.File(dir, name); d.mkdirs()
    java.nio.file.Files.writeString(d.toPath.resolve(".zarray"), jsonArray(shape, "<f8"))
    java.nio.file.Files.writeString(d.toPath.resolve(".zattrs"),
      s"""{"_ARRAY_DIMENSIONS": [${dims.map("\"" + _ + "\"").mkString(", ")}]}""")
    writeDoubles(new java.io.File(d, chunkKey), values)
  }

  /** One zarr store per scene under `outDir` (same input contract as
    * [[NetCDFIngest.writeScenes]]: scene_id, time, x, y, value on a
    * regular per-scene grid). Returns (scene_id, path, n_px). */
  def writeScenes(df: DataFrame, outDir: String, varName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    new java.io.File(outDir).mkdirs()
    df.select("scene_id", "time", "x", "y", "value").as[NetCDFIngest.ScenePixel]
      .groupByKey(_.scene_id)
      .mapGroups { (sid, it) =>
        val rows = it.toArray
        val xs = rows.map(_.x).distinct.sorted
        val ys = rows.map(_.y).distinct.sorted
        val xi = xs.zipWithIndex.toMap; val yi = ys.zipWithIndex.toMap
        val grid = Array.fill(xs.length * ys.length)(Double.NaN)
        rows.foreach(r => grid(yi(r.y) * xs.length + xi(r.x)) = r.value)
        val store = new java.io.File(outDir, s"$sid.zarr")
        store.mkdirs()
        java.nio.file.Files.writeString(store.toPath.resolve(".zgroup"), """{"zarr_format": 2}""")
        writeArray(store, varName, Seq(ys.length, xs.length), Seq("y", "x"), grid, "0.0")
        writeArray(store, "y", Seq(ys.length), Seq("y"), ys, "0")
        writeArray(store, "x", Seq(xs.length), Seq("x"), xs, "0")
        (sid, store.getAbsolutePath, rows.length.toLong)
      }.toDF("scene_id", "path", "n_px")
  }
}
