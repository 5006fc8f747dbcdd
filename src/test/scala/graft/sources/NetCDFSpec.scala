package graft.sources

import graft.SparkSpec
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** NetCDF-3 classic codec + Spark ingest/export (S8/S9/S12).
  *
  * The reader is proven against a HAND-CRAFTED byte fixture (laid out
  * from the public format spec, not via our own writer) so reader and
  * writer cannot share a mirrored bug; the writer is then proven by
  * round-trip through the independently-proven reader. */
class NetCDFSpec extends SparkSpec {

  test("reader parses a hand-crafted classic file") {
    // CDF-1: 1 dim "x"(3), no gatts, 1 int var "v" = [7,8,9]
    // header: magic(4) numrecs(4) dims(8+12) gatts(8) vars(8+36) = 80
    val buf = ByteBuffer.allocate(92)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    buf.putInt(0)                              // numrecs
    buf.putInt(0x0A).putInt(1)                 // dim_list
    buf.putInt(1).put('x'.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt(3)                              // dim length
    buf.putInt(0).putInt(0)                    // gatt_list ABSENT
    buf.putInt(0x0B).putInt(1)                 // var_list
    buf.putInt(1).put('v'.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putInt(1).putInt(0)                    // ndims, dimid 0
    buf.putInt(0).putInt(0)                    // vatt_list ABSENT
    buf.putInt(NetCDF3.NcInt).putInt(12).putInt(80) // type, vsize, begin
    buf.putInt(7).putInt(8).putInt(9)
    val bytes = buf.array()
    val h = NetCDF3.readHeader(bytes)
    assert(h.dims == Seq(NetCDF3.Dim("x", 3)))
    assert(h.vars.head.name == "v" && h.vars.head.begin == 80)
    val (dims, shape, vals) = NetCDF3.readValues(bytes, "v")
    assert(dims == Seq("x") && shape == Seq(3))
    assert(vals.toSeq == Seq(7.0, 8.0, 9.0))
  }

  test("writer round-trips through the reader: fixed + record vars, attrs, types") {
    val ny = 2; val nx = 3; val nT = 3
    val field = Array.tabulate(nT * ny * nx)(i => i * 0.5f - 1f).map(_.toDouble)
    val bytes = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("y", ny), NetCDF3.Dim("x", nx)),
      gattrs = Seq(
        NetCDF3.Attr("title", NetCDF3.NcChar, "les fixture"),
        NetCDF3.Attr("levels", NetCDF3.NcInt, Array(1, 2, 3))),
      vars = Seq(
        NetCDF3.VarSpec("time", Seq("time"), NetCDF3.NcDouble,
          Seq(NetCDF3.Attr("units", NetCDF3.NcChar, "hours since 2020-01-01")),
          Array(0.0, 1.0, 2.0)),
        NetCDF3.VarSpec("y", Seq("y"), NetCDF3.NcDouble, Nil, Array(10.0, 20.0)),
        NetCDF3.VarSpec("x", Seq("x"), NetCDF3.NcShort, Nil, Array(1.0, 2.0, 3.0)),
        NetCDF3.VarSpec("lwp", Seq("time", "y", "x"), NetCDF3.NcFloat, Nil, field)),
      numRecs = nT)
    val h = NetCDF3.readHeader(bytes)
    assert(h.numRecs == nT)
    assert(h.gattrs.find(_.name == "title").get.value == "les fixture")
    assert(h.gattrs.find(_.name == "levels").get.value.asInstanceOf[Array[Int]].toSeq == Seq(1, 2, 3))
    val tv = h.vars.find(_.name == "time").get
    assert(tv.attrs.find(_.name == "units").get.value == "hours since 2020-01-01")
    assert(NetCDF3.readValues(bytes, "x")._3.toSeq == Seq(1.0, 2.0, 3.0))
    val (dims, shape, vals) = NetCDF3.readValues(bytes, "lwp")
    assert(dims == Seq("time", "y", "x") && shape == Seq(nT, ny, nx))
    assert(vals.toSeq == field.map(_.toFloat.toDouble).toSeq)
  }

  test("CDF-5 writer round-trips: 8-byte NON_NEG fields + extended types") {
    val bytes = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("x", 3)),
      gattrs = Seq(NetCDF3.Attr("big_attr", NetCDF3.NcInt64, Array(1L << 40))),
      vars = Seq(
        NetCDF3.VarSpec("time", Seq("time"), NetCDF3.NcInt64, Nil,
          Array(1.0e12, 1.0e12 + 60)),
        NetCDF3.VarSpec("counts", Seq("time", "x"), NetCDF3.NcUInt, Nil,
          Array.tabulate(6)(i => 4.0e9 + i)),
        NetCDF3.VarSpec("flags", Seq("x"), NetCDF3.NcUByte, Nil,
          Array(0.0, 200.0, 255.0))),
      numRecs = 2, version = 5)
    val h = NetCDF3.readHeader(bytes)
    assert(h.version == 5 && h.numRecs == 2)
    assert(h.gattrs.find(_.name == "big_attr").get.value
      .asInstanceOf[Array[Long]].toSeq == Seq(1L << 40))
    assert(NetCDF3.readValues(bytes, "time")._3.toSeq == Seq(1.0e12, 1.0e12 + 60))
    assert(NetCDF3.readValues(bytes, "counts")._3.toSeq ==
      (0 until 6).map(i => 4.0e9 + i))
    assert(NetCDF3.readValues(bytes, "flags")._3.toSeq == Seq(0.0, 200.0, 255.0))
    // CDF-2 keeps narrow NON_NEGs with 64-bit begins
    val v2 = NetCDF3.write(Seq(NetCDF3.Dim("x", 2)), Nil,
      Seq(NetCDF3.VarSpec("v", Seq("x"), NetCDF3.NcDouble, Nil, Array(1.0, 2.0))),
      version = 2)
    assert(NetCDF3.readHeader(v2).version == 2)
    assert(NetCDF3.readValues(v2, "v")._3.toSeq == Seq(1.0, 2.0))
    // extended types without version = 5 reject loudly
    val e = intercept[IllegalArgumentException] {
      NetCDF3.write(Seq(NetCDF3.Dim("x", 1)), Nil,
        Seq(NetCDF3.VarSpec("v", Seq("x"), NetCDF3.NcUInt, Nil, Array(1.0))))
    }
    assert(e.getMessage.contains("CDF-5"))
  }

  test("read attrs re-write by ncType: CDF-5 unsigned attr round-trip") {
    // The reader WIDENS unsigned attrs (NcUByte -> Array[Short],
    // NcUShort -> Array[Int], NcUInt -> Array[Long]); the writer must
    // encode by the declared ncType, not the runtime class, or the
    // re-written header's payload length disagrees with
    // nelems * typeSize and the file is unparseable.
    val bytes = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("x", 2)),
      gattrs = Seq(
        NetCDF3.Attr("ub", NetCDF3.NcUByte, Array[Byte](-1, 7)),      // 255, 7
        NetCDF3.Attr("us", NetCDF3.NcUShort, Array[Short](-1, 300)),  // 65535, 300
        NetCDF3.Attr("ui", NetCDF3.NcUInt, Array[Int](-1, 12))),      // 2^32-1, 12
      vars = Seq(NetCDF3.VarSpec("v", Seq("x"), NetCDF3.NcDouble, Nil,
        Array(1.0, 2.0))),
      version = 5)
    val h = NetCDF3.readHeader(bytes)
    // reader widened representations
    assert(h.gattrs.find(_.name == "ub").get.value
      .asInstanceOf[Array[Short]].toSeq == Seq[Short](255, 7))
    assert(h.gattrs.find(_.name == "us").get.value
      .asInstanceOf[Array[Int]].toSeq == Seq(65535, 300))
    assert(h.gattrs.find(_.name == "ui").get.value
      .asInstanceOf[Array[Long]].toSeq == Seq(0xffffffffL, 12L))
    // round-trip: write the READ attrs back verbatim, re-read, compare
    val bytes2 = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("x", 2)),
      gattrs = h.gattrs,
      vars = Seq(NetCDF3.VarSpec("v", Seq("x"), NetCDF3.NcDouble, Nil,
        Array(1.0, 2.0))),
      version = 5)
    val h2 = NetCDF3.readHeader(bytes2)
    assert(h2.gattrs.find(_.name == "ub").get.value
      .asInstanceOf[Array[Short]].toSeq == Seq[Short](255, 7))
    assert(h2.gattrs.find(_.name == "us").get.value
      .asInstanceOf[Array[Int]].toSeq == Seq(65535, 300))
    assert(h2.gattrs.find(_.name == "ui").get.value
      .asInstanceOf[Array[Long]].toSeq == Seq(0xffffffffL, 12L))
    assert(NetCDF3.readValues(bytes2, "v")._3.toSeq == Seq(1.0, 2.0))
  }

  test("two record variables interleave with padded stride") {
    // per-record: a = 3 shorts (6 bytes -> vsize 8), b = 1 int (4 bytes)
    val bytes = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("t", 0), NetCDF3.Dim("x", 3)),
      gattrs = Nil,
      vars = Seq(
        NetCDF3.VarSpec("a", Seq("t", "x"), NetCDF3.NcShort, Nil,
          Array(1, 2, 3, 4, 5, 6).map(_.toDouble)),
        NetCDF3.VarSpec("b", Seq("t"), NetCDF3.NcInt, Nil, Array(100.0, 200.0))),
      numRecs = 2)
    assert(NetCDF3.readValues(bytes, "a")._3.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    assert(NetCDF3.readValues(bytes, "b")._3.toSeq == Seq(100.0, 200.0))
  }

  test("CF time units parse and reference timestep naming") {
    assert(NetCDFIngest.parseTimeUnits(Some("hours since 2020-01-01"))
      == (1577836800000000L, 3600000000L))
    assert(NetCDFIngest.parseTimeUnits(Some("seconds since 1970-01-01 00:00:00"))
      == (0L, 1000000L))
    // python datetime.isoformat().replace(":","")
    assert(NetCDFIngest.timestepString(1577880000000000L) == "2020-01-01T120000")
  }

  test("lesScenes splits multi-timestep files and ingests pixels (S8/S9)") {
    val dir = Files.createTempDirectory("graft-nc").toString
    val ny = 2; val nx = 2
    // file 1: three timesteps
    val f1 = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("y", ny), NetCDF3.Dim("x", nx)),
      gattrs = Nil,
      vars = Seq(
        NetCDF3.VarSpec("time", Seq("time"), NetCDF3.NcDouble,
          Seq(NetCDF3.Attr("units", NetCDF3.NcChar, "hours since 2020-01-01")), Array(0, 1, 2).map(_.toDouble)),
        NetCDF3.VarSpec("y", Seq("y"), NetCDF3.NcDouble, Nil, Array(0.0, 100.0)),
        NetCDF3.VarSpec("x", Seq("x"), NetCDF3.NcDouble, Nil, Array(0.0, 100.0)),
        NetCDF3.VarSpec("lwp", Seq("time", "y", "x"), NetCDF3.NcDouble, Nil,
          Array.tabulate(3 * ny * nx)(_.toDouble))),
      numRecs = 3)
    Files.write(Paths.get(dir, "les_run1.nc"), f1)
    // file 2: single timestep, no time dimension
    val f2 = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("y", ny), NetCDF3.Dim("x", nx)),
      gattrs = Nil,
      vars = Seq(
        NetCDF3.VarSpec("y", Seq("y"), NetCDF3.NcDouble, Nil, Array(0.0, 100.0)),
        NetCDF3.VarSpec("x", Seq("x"), NetCDF3.NcDouble, Nil, Array(0.0, 100.0)),
        NetCDF3.VarSpec("lwp", Seq("y", "x"), NetCDF3.NcDouble, Nil, Array(9.0, 9.0, 9.0, 9.0))))
    Files.write(Paths.get(dir, "les_run2.nc"), f2)

    val df = NetCDFIngest.lesScenes(spark, s"$dir/*.nc", "lwp")
    assert(df.count() == (3 + 1) * ny * nx)
    val scenes = df.select("scene_id").distinct().collect().map(_.getString(0)).sorted
    assert(scenes.toSeq == Seq(
      "les_run1_2020-01-01T000000", "les_run1_2020-01-01T010000",
      "les_run1_2020-01-01T020000", "les_run2_1970-01-01T000000"))
    // pixel value at (t=2h, y=100, x=0): flat index (2*2+1)*2+0 = 10
    val v = df.where(col("scene_id") === "les_run1_2020-01-01T020000"
      && col("y") === 100.0 && col("x") === 0.0).collect()
    assert(v.length == 1 && v.head.getAs[Double]("value") == 10.0)
    // catalog agrees with pixel ingest (header-only read)
    val cat = NetCDFIngest.sceneCatalog(spark, s"$dir/*.nc", "lwp")
    assert(cat.select("scene_id").distinct().count() == 4)
    // missing variable fails loudly like the reference
    val err = intercept[org.apache.spark.SparkException] {
      NetCDFIngest.lesScenes(spark, s"$dir/*.nc", "nope").count()
    }
    assert(err.getMessage != null)
  }

  test("ZarrSink writes spec-conformant v2 stores (S12)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zarr").toString
    val src = Seq(
      ("s1", java.sql.Timestamp.valueOf("2020-06-01 12:00:00"), 0.0, 0.0, 1.5),
      ("s1", java.sql.Timestamp.valueOf("2020-06-01 12:00:00"), 100.0, 0.0, 2.5),
      ("s1", java.sql.Timestamp.valueOf("2020-06-01 12:00:00"), 0.0, 100.0, 3.5),
      ("s1", java.sql.Timestamp.valueOf("2020-06-01 12:00:00"), 100.0, 100.0, 4.5))
      .toDF("scene_id", "time", "x", "y", "value")
    val written = ZarrSink.writeScenes(src, dir, "lwp")
    assert(written.count() == 1)
    val store = Paths.get(dir, "s1.zarr")
    // group + array metadata are valid per the public v2 spec
    assert(Files.readString(store.resolve(".zgroup")).contains("\"zarr_format\": 2"))
    val zarray = Files.readString(store.resolve("lwp/.zarray"))
    assert(zarray.contains("\"shape\": [2, 2]") && zarray.contains("\"dtype\": \"<f8\"")
      && zarray.contains("\"compressor\": null") && zarray.contains("\"order\": \"C\""))
    assert(Files.readString(store.resolve("lwp/.zattrs"))
      .contains("\"_ARRAY_DIMENSIONS\": [\"y\", \"x\"]"))
    // chunk bytes are raw little-endian C-order doubles
    def le(p: java.nio.file.Path, n: Int): Seq[Double] = {
      val b = ByteBuffer.wrap(Files.readAllBytes(p)).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until n).map(_ => b.getDouble())
    }
    assert(le(store.resolve("lwp/0.0"), 4) == Seq(1.5, 2.5, 3.5, 4.5))
    assert(le(store.resolve("x/0"), 2) == Seq(0.0, 100.0))
    assert(le(store.resolve("y/0"), 2) == Seq(0.0, 100.0))
  }

  test("writeScenes exports per-scene netCDF that re-ingests identically (S12)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-nc-out").toString
    val src = Seq(
      ("s1", java.sql.Timestamp.valueOf("2020-06-01 12:00:00"), 0.0, 0.0, 1.5),
      ("s1", java.sql.Timestamp.valueOf("2020-06-01 12:00:00"), 100.0, 0.0, 2.5),
      ("s1", java.sql.Timestamp.valueOf("2020-06-01 12:00:00"), 0.0, 100.0, 3.5),
      ("s1", java.sql.Timestamp.valueOf("2020-06-01 12:00:00"), 100.0, 100.0, 4.5))
      .toDF("scene_id", "time", "x", "y", "value")
    val written = NetCDFIngest.writeScenes(src, dir, "lwp")
    assert(written.count() == 1)
    val back = NetCDFIngest.lesScenes(spark, s"$dir/*.nc", "lwp")
    val got = back.select("time", "x", "y", "value").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    val want = src.select("time", "x", "y", "value").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == want)
  }
}
