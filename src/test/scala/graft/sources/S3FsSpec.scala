package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S3-contract behavior on [[S3Fs]]: sinks never rely on rename, and
  * the explicit-path flows (manifest-planned opens) are immune to
  * list-after-write eventual consistency, where listing-based
  * discovery is honestly eventual. */
class S3FsSpec extends SparkSpec {

  private def registerS3Fs(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.s3test.impl", classOf[S3Fs].getName)

  test("the sinks write final objects directly — ZERO rename calls") {
    registerS3Fs()
    S3Fs.reset()
    val dir = Files.createTempDirectory("graft-s3fs-sink").toString
    val grid = spark.range(24).select(
      concat(lit("s"), expr("id div 12")).as("scene_id"),
      expr("timestamp_seconds(1577836800)").as("time"),
      (expr("id % 4") * 10.0).as("x"),
      (expr("(id div 4) % 3") * 10.0).as("y"),
      (col("id") * 0.5).as("value"))
    // zarr v2 scene sink + a netCDF-3 write through the ByteStore seam
    ZarrSink.writeScenes(grid, s"s3test:$dir/z", "lwp",
      chunkRows = Some(3), zlibLevel = Some(6)).count()
    ByteStore.writeAllBytes(s"s3test:$dir/one.nc", NetCDF3.write(
      dims = Seq(NetCDF3.Dim("x", 2)), gattrs = Nil,
      vars = Seq(NetCDF3.VarSpec("v", Seq("x"), NetCDF3.NcDouble, Nil,
        Array(1.0, 2.0)))))
    val renames = S3Fs.ops.filter(_.startsWith("rename "))
    assert(renames.isEmpty, s"a sink renamed: ${renames.take(3)}")
    assert(S3Fs.ops.exists(_.startsWith("create ")), "writes must go through s3test")
    // and everything written reads back correct over the same scheme
    val vals = spark.read.format("graft.sources.ZarrDataSource")
      .option("path", s"s3test:$dir/z").load()
      .where(col("dataset") === "lwp").select("value")
      .collect().map(_.getDouble(0)).sorted
    assert(vals.toSeq == (0 until 24).map(_ * 0.5))
    assert(CoordCrop.nc3VarValues(s"s3test:$dir/one.nc", "v").toSeq == Seq(1.0, 2.0))
  }

  test("manifest-planned opens are immune to list-after-write inconsistency") {
    registerS3Fs()
    S3Fs.reset()
    val dir = Files.createTempDirectory("graft-s3fs-lst").toString
    def nc(name: String, day: Int, base: Double): Unit =
      ByteStore.writeAllBytes(s"s3test:$dir/$name", NetCDF3.write(
        dims = Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("x", 2)),
        gattrs = Nil,
        vars = Seq(
          NetCDF3.VarSpec("time", Seq("time"), NetCDF3.NcDouble,
            Seq(NetCDF3.Attr("units", NetCDF3.NcChar,
              s"hours since 2022-03-0$day")), Array(0.0, 6.0)),
          NetCDF3.VarSpec("lwp", Seq("time", "x"), NetCDF3.NcDouble, Nil,
            Array.tabulate(4)(i => base + i))),
        numRecs = 2))
    nc("a.nc", 1, 10.0)
    nc("b.nc", 2, 20.0)
    val manifest = s"$dir/_manifest" // manifest parquet on plain file://
    CatalogManifest.build(spark, "netcdf3", s"s3test:$dir/*.nc",
      Seq("lwp"), manifest)
    // the eventual-consistency window opens; a THIRD scene lands
    S3Fs.armInconsistency()
    try {
      nc("c.nc", 3, 30.0)
      // listing-based discovery cannot see c.nc yet (honest eventual)
      val listed = CoordCrop.catalogFiles(s"s3test:$dir/*.nc")
      assert(listed.map(_.split('/').last).toSet == Set("a.nc", "b.nc"),
        s"pending object leaked into a listing: $listed")
      // but direct-key reads DO see it (S3 read-after-write on keys)
      assert(ByteStore.isFile(s"s3test:$dir/c.nc"))
      assert(CoordCrop.nc3VarValues(s"s3test:$dir/c.nc", "lwp").nonEmpty)
      // the manifest-planned open never lists: full, correct rows for
      // the manifested members while the window is open
      val got = GridOpen.netcdf3CatalogFromManifest(spark, manifest, "lwp")
        .collect().map(r => (r.getString(0).split('/').last, r.getDouble(4)))
        .sorted
      assert(got.map(_._1).distinct.toSeq == Seq("a.nc", "b.nc"))
      assert(got.map(_._2).toSet == Set(10.0, 11.0, 12.0, 13.0, 20.0, 21.0, 22.0, 23.0))
    } finally S3Fs.settle()
    // the window closes: refresh sees the new scene, and it plans
    val (added, changed, removed, unchanged) = CatalogManifest.refresh(
      spark, "netcdf3", s"s3test:$dir/*.nc", Seq("lwp"), manifest)
    assert((added, changed, removed, unchanged) == ((1, 0, 0, 2)),
      s"got ($added, $changed, $removed, $unchanged)")
    val all = GridOpen.netcdf3CatalogFromManifest(spark, manifest, "lwp")
    assert(all.select("path").distinct().count() == 3)
  }
}
