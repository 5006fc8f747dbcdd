package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The turnkey open: one call per mount that discovers dimension
  * names, decodes coordinate VALUES (time axes to TIMESTAMP), applies
  * mask-and-scale, and pushes value/time crops to the scan — the
  * xr.open_dataset shape. Pinned per mount against hand-computed
  * values, plus the catalog variant's broadcast decode. */
class GridOpenSpec extends SparkSpec {

  test("netcdf3: named axes, time decode, mask-and-scale, pushed crop") {
    val dir = Files.createTempDirectory("graft-gridopen-nc").toString
    val p = Paths.get(dir, "t.nc")
    // 4 records x 3 columns; value -99 is the fill; scale 0.5 offset 2
    val raw = Array.tabulate(12)(i => if (i == 7) -99.0 else i * 1.0)
    Files.write(p, NetCDF3.write(
      dims = Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("x", 3)),
      gattrs = Nil,
      vars = Seq(
        NetCDF3.VarSpec("time", Seq("time"), NetCDF3.NcDouble,
          Seq(NetCDF3.Attr("units", NetCDF3.NcChar, "hours since 2024-02-01")),
          Array(0.0, 6.0, 12.0, 18.0)),
        NetCDF3.VarSpec("x", Seq("x"), NetCDF3.NcDouble, Nil,
          Array(100.0, 200.0, 300.0)),
        NetCDF3.VarSpec("lwp", Seq("time", "x"), NetCDF3.NcDouble, Seq(
          NetCDF3.Attr("_FillValue", NetCDF3.NcDouble, Array(-99.0)),
          NetCDF3.Attr("scale_factor", NetCDF3.NcDouble, Array(0.5)),
          NetCDF3.Attr("add_offset", NetCDF3.NcDouble, Array(2.0))), raw)),
      numRecs = 4))
    val df = GridOpen.netcdf3(spark, p.toString, "lwp",
      bounds = Map("x" -> (150.0, 300.0)),
      timeBounds = Map("time" -> ("2024-02-01 06:00:00", "2024-02-01 18:00:00")))
    assert(df.columns.toSeq == Seq("path", "idx", "time", "x", "value"))
    val rows = df.collect().map { r =>
      (r.getTimestamp(2).toInstant.toString, r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.sortBy(r => (r._1, r._2))
    // records 1..3, x idx 1..2; raw idx 7 (record 2, x 1) is the fill
    assert(rows.toSeq == Seq(
      ("2024-02-01T06:00:00Z", 200.0, Some(4.0 * 0.5 + 2.0)),
      ("2024-02-01T06:00:00Z", 300.0, Some(5.0 * 0.5 + 2.0)),
      ("2024-02-01T12:00:00Z", 200.0, None),
      ("2024-02-01T12:00:00Z", 300.0, Some(8.0 * 0.5 + 2.0)),
      ("2024-02-01T18:00:00Z", 200.0, Some(10.0 * 0.5 + 2.0)),
      ("2024-02-01T18:00:00Z", 300.0, Some(11.0 * 0.5 + 2.0))))
    // the crop reached the scan: record batches 1..3 only
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(d0,1)"), s"no pushed crop:\n$plan")
  }

  test("zarr: named axes from _ARRAY_DIMENSIONS; no-bounds open decodes everything") {
    val dir = Files.createTempDirectory("graft-gridopen-z").toString
    val grid = spark.range(12).select(
      lit("s0").as("scene_id"),
      expr("timestamp_seconds(1577836800)").as("time"),
      (expr("id % 4") * 10.0 + 100.0).as("x"),
      (expr("id div 4") * 20.0).as("y"),
      (col("id") * 1.0).as("value"))
    ZarrSink.writeScenes(grid, dir, "lwp").count()
    val df = GridOpen.zarr(spark, s"$dir/s0.zarr", "lwp")
    assert(df.columns.toSeq == Seq("path", "idx", "y", "x", "value"))
    val rows = df.orderBy("idx").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 12)
    assert(rows(0) == ((0.0, 100.0, 0.0)))
    assert(rows(11) == ((40.0, 130.0, 11.0)))
    // a bounded open prunes AND decodes the same way
    val cropped = GridOpen.zarr(spark, s"$dir/s0.zarr", "lwp",
      bounds = Map("y" -> (20.0, 40.0), "x" -> (110.0, 120.0)))
    val got = cropped.collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSet == rows.filter(r =>
      r._1 >= 20.0 && r._1 <= 40.0 && r._2 >= 110.0 && r._2 <= 120.0).toSet)
  }

  test("hdf5: dimension-scale axes, irregular time axis decodes row-wise") {
    val dir = Files.createTempDirectory("graft-gridopen-h5").toString
    val bytes = HDF5.write(Seq(
      HDF5.DsSpec("v", Seq(3, 2), Array.tabulate(6)(_ * 2.0),
        chunkDims = Some(Seq(1, 2)),
        attrs = Seq(HDF5.WAttrDimList("DIMENSION_LIST", Seq("time", "x")))),
      HDF5.DsSpec("time", Seq(3), Array(0.0, 1.0, 5.0), // irregular
        attrs = Seq(
          HDF5.WAttrString("NAME", "time"),
          HDF5.WAttrString("units", "hours since 2021-01-01"))),
      HDF5.DsSpec("x", Seq(2), Array(7.0, 9.0),
        attrs = Seq(HDF5.WAttrString("NAME", "x")))))
    val p = Paths.get(dir, "t.h5"); Files.write(p, bytes)
    val df = GridOpen.hdf5(spark, p.toString, "v")
    assert(df.columns.toSeq == Seq("path", "idx", "time", "x", "value"))
    val rows = df.orderBy("idx").collect()
      .map(r => (r.getTimestamp(2).toInstant.toString, r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("2021-01-01T00:00:00Z", 7.0), ("2021-01-01T00:00:00Z", 9.0),
      ("2021-01-01T01:00:00Z", 7.0), ("2021-01-01T01:00:00Z", 9.0),
      ("2021-01-01T05:00:00Z", 7.0), ("2021-01-01T05:00:00Z", 9.0)))
  }

  test("zarrCatalog: per-store epochs decode via broadcast joins, stores prune") {
    val dir = Files.createTempDirectory("graft-gridopen-cat").toString
    def store(name: String, units: String, base: Double): Unit = {
      val s = Paths.get(dir, s"$name.zarr")
      Files.createDirectories(s)
      Files.writeString(s.resolve(".zgroup"), """{"zarr_format": 2}""")
      def arr(aName: String, shape: Seq[Int], dims: Seq[String],
          data: Array[Double], extra: String = ""): Unit = {
        val d = s.resolve(aName); Files.createDirectories(d)
        Files.writeString(d.resolve(".zarray"),
          s"""{"zarr_format": 2, "shape": [${shape.mkString(",")}],
             | "chunks": [${shape.mkString(",")}], "dtype": ">f8",
             | "compressor": null, "fill_value": "NaN", "filters": null,
             | "order": "C"}""".stripMargin)
        Files.writeString(d.resolve(".zattrs"),
          s"""{"_ARRAY_DIMENSIONS": [${dims.map("\"" + _ + "\"").mkString(",")}]$extra}""")
        val bb = java.nio.ByteBuffer.allocate(data.length * 8)
        data.foreach(bb.putDouble)
        Files.write(d.resolve(shape.map(_ => "0").mkString(".")), bb.array())
      }
      arr("lwp", Seq(4, 2), Seq("time", "x"),
        Array.tabulate(8)(i => base + i))
      arr("time", Seq(4), Seq("time"), Array(0.0, 6.0, 12.0, 18.0),
        s""", "units": "$units"""")
      arr("x", Seq(2), Seq("x"), Array(50.0, 60.0))
    }
    store("sA", "hours since 2021-01-01", 100.0)
    store("sB", "hours since 2021-01-02", 200.0)
    store("sC", "hours since 2021-01-03", 300.0)
    val df = GridOpen.zarrCatalog(spark, dir, "lwp",
      timeBounds = Map("time" -> ("2021-01-01 12:00:00", "2021-01-02 06:00:00")))
    assert(df.columns.toSeq == Seq("path", "idx", "time", "x", "value"))
    val rows = df.collect().map { r =>
      (r.getString(0).split('/').last, r.getTimestamp(2).toInstant.toString,
        r.getDouble(3), r.getDouble(4))
    }.sortBy(r => (r._2, r._3))
    // sA rows 2-3 (12:00, 18:00 of Jan 1), sB rows 0-1 (00:00, 06:00 of Jan 2)
    assert(rows.toSeq == Seq(
      ("sA.zarr", "2021-01-01T12:00:00Z", 50.0, 104.0),
      ("sA.zarr", "2021-01-01T12:00:00Z", 60.0, 105.0),
      ("sA.zarr", "2021-01-01T18:00:00Z", 50.0, 106.0),
      ("sA.zarr", "2021-01-01T18:00:00Z", 60.0, 107.0),
      ("sB.zarr", "2021-01-02T00:00:00Z", 50.0, 200.0),
      ("sB.zarr", "2021-01-02T00:00:00Z", 60.0, 201.0),
      ("sB.zarr", "2021-01-02T06:00:00Z", 50.0, 202.0),
      ("sB.zarr", "2021-01-02T06:00:00Z", 60.0, 203.0)))
    // the decode joins are BROADCAST (no exchange of the scan side)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"decode not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"decode shuffled:\n$plan")
  }
}
