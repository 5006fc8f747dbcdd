package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CF mask-and-scale across the three gridded mounts: attributes read
  * from each store's OWN metadata (netCDF-3 header attr lists, zarr v2
  * .zattrs / v3 zarr.json attributes), fill -> null on the RAW value,
  * identity when the attrs are absent. The HDF5 variant is pinned in
  * Hdf5AttrsSpec; the oracle rows are q208 (HDF5), q209 (netCDF-3),
  * q210 (zarr v2). */
class CfDecodeSpec extends SparkSpec {

  test("netCDF-3: pack attrs decode from the header (float scale, short fill)") {
    val dir = Files.createTempDirectory("graft-cf-nc3").toString
    val p = Paths.get(dir, "packed.nc")
    val raw = Array.tabulate(12)(i => if (i % 5 == 0) -32768.0 else i * 100.0)
    Files.write(p, NetCDF3.write(
      dims = Seq(NetCDF3.Dim("y", 3), NetCDF3.Dim("x", 4)),
      gattrs = Nil,
      vars = Seq(
        NetCDF3.VarSpec("t2m", Seq("y", "x"), NetCDF3.NcDouble, Seq(
          NetCDF3.Attr("scale_factor", NetCDF3.NcFloat, Array(0.5f)),
          NetCDF3.Attr("add_offset", NetCDF3.NcDouble, Array(100.0)),
          NetCDF3.Attr("_FillValue", NetCDF3.NcShort, Array(-32768.toShort)),
          NetCDF3.Attr("units", NetCDF3.NcChar, "K")), raw),
        NetCDF3.VarSpec("plain", Seq("x"), NetCDF3.NcDouble, Nil,
          Array.tabulate(4)(_ * 2.0)))))
    val attrs = CfDecode.netcdf3CfAttrs(p.toString, "t2m")
    assert(attrs == CfDecode.CfAttrs(0.5f.toDouble, 100.0, Some(-32768.0)))
    val rows = CfDecode.netcdf3(spark, p.toString, "t2m")
      .select("idx", "value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    (0 until 12).foreach { i =>
      if (i % 5 == 0) assert(rows(i.toLong).isEmpty)
      else assert(rows(i.toLong).contains(i * 100.0 * 0.5f + 100.0))
    }
    // no attrs -> identity
    val plain = CfDecode.netcdf3(spark, p.toString, "plain")
      .orderBy("idx").select("value").collect().map(_.getDouble(0))
    assert(plain.toSeq == (0 until 4).map(_ * 2.0))
  }

  test("zarr v2: pack attrs decode from .zattrs (xarray to_zarr placement)") {
    val dir = Files.createTempDirectory("graft-cf-z2").toString
    val grid = spark.range(12).select(
      lit("s0").as("scene_id"),
      expr("timestamp_seconds(1577836800)").as("time"),
      (expr("id % 4") * 1.0).as("x"), (expr("id div 4") * 1.0).as("y"),
      // coalesce: the sink's encoder needs a non-nullable double
      coalesce(expr("CASE WHEN id % 5 = 0 THEN -999.0 ELSE id * 10.0 END"),
        lit(0.0)).as("value"))
    ZarrSink.writeScenes(grid, dir, "lwp").count()
    val store = s"$dir/s0.zarr"
    // merge the CF attrs into the array's .zattrs, as xarray writes them
    val za = Paths.get(store, "lwp", ".zattrs")
    val json = new String(Files.readAllBytes(za), "UTF-8").trim.stripSuffix("}")
    Files.write(za, (json +
      ""","scale_factor":0.1,"add_offset":5.0,"_FillValue":-999.0}""").getBytes("UTF-8"))
    assert(CfDecode.zarrCfAttrs(store, "lwp") ==
      CfDecode.CfAttrs(0.1, 5.0, Some(-999.0)))
    val rows = CfDecode.zarr(spark, store, "lwp")
      .select("idx", "value").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    (0 until 12).foreach { i =>
      if (i % 5 == 0) assert(rows(i.toLong).isEmpty)
      else assert(rows(i.toLong).contains(i * 10.0 * 0.1 + 5.0))
    }
  }

  test("netCDF-3: _Unsigned reinterprets signed bytes before mask and scale") {
    val dir = Files.createTempDirectory("graft-cf-nc3u").toString
    val p = Paths.get(dir, "u.nc")
    // stored signed bytes; -1 is the fill (reinterprets to 255 with the data)
    val raw = Array[Double](-1.0, 5.0, -128.0, 0.0, 7.0, -2.0)
    Files.write(p, NetCDF3.write(
      dims = Seq(NetCDF3.Dim("x", 6)),
      gattrs = Nil,
      vars = Seq(
        NetCDF3.VarSpec("b", Seq("x"), NetCDF3.NcByte, Seq(
          NetCDF3.Attr("_Unsigned", NetCDF3.NcChar, "true"),
          NetCDF3.Attr("_FillValue", NetCDF3.NcByte, Array((-1).toByte)),
          NetCDF3.Attr("scale_factor", NetCDF3.NcDouble, Array(0.5)),
          NetCDF3.Attr("add_offset", NetCDF3.NcDouble, Array(2.0))), raw),
        NetCDF3.VarSpec("bad", Seq("x"), NetCDF3.NcFloat, Seq(
          NetCDF3.Attr("_Unsigned", NetCDF3.NcChar, "true")), raw))))
    val attrs = CfDecode.netcdf3CfAttrs(p.toString, "b")
    assert(attrs == CfDecode.CfAttrs(0.5, 2.0, Some(-1.0), Some(256.0)))
    val got = CfDecode.netcdf3(spark, p.toString, "b")
      .orderBy("idx").select("value").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    // unsigned [255(fill), 5, 128, 0, 7, 254] -> *0.5 + 2
    assert(got == Seq(None, Some(4.5), Some(66.0), Some(2.0), Some(5.5), Some(129.0)))
    // _Unsigned on a non-signed-integer type is a loud file error
    val e = intercept[IllegalArgumentException](
      CfDecode.netcdf3CfAttrs(p.toString, "bad"))
    assert(e.getMessage.contains("_Unsigned"))
  }

  test("zarr v2: _Unsigned reinterprets signed ints before mask and scale") {
    val d = Files.createTempDirectory("graft-cf-z2u").toFile
    val a = new java.io.File(d, "b"); a.mkdirs()
    Files.writeString(a.toPath.resolve(".zarray"),
      """{"zarr_format": 2, "shape": [6], "chunks": [6], "dtype": "|i1",
        | "compressor": null, "fill_value": 0, "filters": null,
        | "order": "C"}""".stripMargin)
    Files.writeString(a.toPath.resolve(".zattrs"),
      """{"_Unsigned": "true", "_FillValue": -1, "scale_factor": 0.5,
        | "add_offset": 2.0}""".stripMargin)
    Files.write(a.toPath.resolve("0"),
      Array[Byte](-1, 5, -128, 0, 7, -2))
    val attrs = CfDecode.zarrCfAttrs(d.toString, "b")
    assert(attrs == CfDecode.CfAttrs(0.5, 2.0, Some(-1.0), Some(256.0)))
    val got = CfDecode.zarr(spark, d.toString, "b")
      .orderBy("idx").select("value").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(None, Some(4.5), Some(66.0), Some(2.0), Some(5.5), Some(129.0)))
    // _Unsigned on a float array is a loud store error
    val f = new java.io.File(d, "bad"); f.mkdirs()
    Files.writeString(f.toPath.resolve(".zarray"),
      """{"zarr_format": 2, "shape": [1], "chunks": [1], "dtype": "<f4",
        | "compressor": null, "fill_value": 0, "filters": null,
        | "order": "C"}""".stripMargin)
    Files.writeString(f.toPath.resolve(".zattrs"), """{"_Unsigned": "true"}""")
    Files.write(f.toPath.resolve("0"), Array[Byte](0, 0, 0, 0))
    val e = intercept[IllegalArgumentException](
      CfDecode.zarrCfAttrs(d.toString, "bad"))
    assert(e.getMessage.contains("_Unsigned"))
  }

  test("HDF5 packed ints: int16 scale/offset and _Unsigned int8 reinterpretation") {
    val res = getClass.getResourceAsStream("/fixtures/golden_ncattrs.h5")
    require(res != null, "golden_ncattrs.h5 missing — run tools/make_fixtures.py")
    val bytes = try res.readAllBytes() finally res.close()
    val p = Files.createTempFile("graft-cf-packed", ".h5")
    Files.write(p, bytes)
    def decoded(ds: String): Seq[Option[Double]] =
      CfDecode.hdf5(spark, p.toString, ds).orderBy("idx").select("value")
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    // raw int8 [-1,5,-128,0,7,-2] -> unsigned [255,5,128,0,7,254];
    // fill -1 reinterprets to 255 and masks idx 0; then *0.5 + 2
    val u8 = decoded("packed_u8")
    assert(u8.head.isEmpty)
    val wantU8 = Seq(4.5, 66.0, 2.0, 5.5, 129.0)
    u8.tail.zip(wantU8).foreach { case (got, want) =>
      assert(got.exists(g => math.abs(g - want) < 1e-9), s"$got vs $want") }
    // int16 [-9999,120,-5,0,2500,-9999] * 0.01 + 300, fills masked
    val i16 = decoded("packed_i16")
    assert(i16(0).isEmpty && i16(5).isEmpty)
    Seq(1 -> 301.2, 2 -> 299.95, 3 -> 300.0, 4 -> 325.0).foreach { case (i, want) =>
      assert(i16(i).exists(g => math.abs(g - want) < 1e-9), s"${i16(i)} vs $want") }
  }

  test("zarr GROUP-PATH datasets read their own node's attrs (nested hierarchy)") {
    // copy the mixed v2/v3 nested golden and give the nested array CF attrs
    val src = java.nio.file.Paths.get("src/test/resources/fixtures/golden_nested.zarr")
    val dst = Files.createTempDirectory("graft-cf-nested").resolve("s.zarr")
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    }
    val za = dst.resolve("model/lwp/.zattrs")
    java.nio.file.Files.write(za,
      """{"scale_factor":2.0,"add_offset":1.0}""".getBytes("UTF-8"))
    assert(CfDecode.zarrCfAttrs(dst.toString, "model/lwp") ==
      CfDecode.CfAttrs(2.0, 1.0, None))
    val vals = CfDecode.zarr(spark, dst.toString, "model/lwp")
      .orderBy("idx").select("value").collect().map(_.getDouble(0))
    assert(vals.toSeq == Seq(1.0, 3.0, 5.0, 21.0, 23.0, 25.0))
    // a sibling node without attrs stays identity through the same store
    assert(CfDecode.zarrCfAttrs(dst.toString, "xc") == CfDecode.CfAttrs(1.0, 0.0, None))
  }

  test("zarr v3: pack attrs decode from zarr.json attributes") {
    val dir = Files.createTempDirectory("graft-cf-z3").toString
    val grid = spark.range(8).select(
      lit("s0").as("scene_id"),
      expr("timestamp_seconds(1577836800)").as("time"),
      (expr("id % 4") * 1.0).as("x"), (expr("id div 4") * 1.0).as("y"),
      (col("id") * 2.0).as("value"))
    Zarr3.writeScenes(grid, dir, "lwp").count()
    val store = s"$dir/s0.zarr"
    val zj = Paths.get(store, "lwp", "zarr.json")
    val json = new String(Files.readAllBytes(zj), "UTF-8").trim.stripSuffix("}")
    Files.write(zj, (json +
      ""","attributes":{"scale_factor":0.25,"add_offset":-1.0}}""").getBytes("UTF-8"))
    assert(CfDecode.zarrCfAttrs(store, "lwp") ==
      CfDecode.CfAttrs(0.25, -1.0, None))
    val vals = CfDecode.zarr(spark, store, "lwp")
      .orderBy("idx").select("value").collect().map(_.getDouble(0))
    assert(vals.toSeq == (0 until 8).map(_ * 2.0 * 0.25 - 1.0))
    // a store without attributes decodes as identity
    val dir2 = Files.createTempDirectory("graft-cf-z3b").toString
    Zarr3.writeScenes(grid, dir2, "lwp").count()
    assert(CfDecode.zarrCfAttrs(s"$dir2/s0.zarr", "lwp") ==
      CfDecode.CfAttrs(1.0, 0.0, None))
  }
}
