package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Decode bytes written by tools/make_fixtures.py — an INDEPENDENT
  * Python-stdlib implementation of each format's write path, sharing no
  * code with the Scala writers. This breaks the shared reader/writer bug
  * class the round-trip specs cannot catch (the HDF5 v4 rank+1 incident:
  * both Scala sides agreed on the same wrong layout). True third-party
  * fixtures (h5py/pyhdf/zarr-python/onnxruntime) are not producible in
  * this container — no such library is installed and there is no network
  * egress — so a second independent implementation is the strongest
  * available check; regenerate with `python3 tools/make_fixtures.py`
  * (deterministic, byte-identical).
  *
  * Every assertion is an EXACT value match against the formulas the
  * Python writer used, not a round-trip. */
class ForeignFixturesSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"fixture $name missing — run tools/make_fixtures.py")
    try in.readAllBytes() finally in.close()
  }

  /** Directory fixtures are read from the source tree: sbt's resource
    * copier drops dot-files, which zarr metadata (.zgroup/.zarray) are. */
  private def fixtureDir(name: String): java.io.File = {
    val f = new java.io.File(s"src/test/resources/fixtures/$name")
    require(f.isDirectory, s"fixture $name missing — run tools/make_fixtures.py")
    f
  }

  test("HDF5: python-written netCDF-4 attribute surface decodes exactly " +
      "(compact v1 + dense fractal-heap + global-heap vlens)") {
    val in = new ArrayInput(fixture("golden_ncattrs.h5"))
    import HDF5.H5AttrValue._
    val attrs = HDF5.attributes(in)
    val root = attrs("").map(a => a.name -> a.value).toMap
    assert(root("Conventions") == Strs(Seq("CF-1.8")))
    assert(root("title") == Strs(Seq("attr golden v1")))
    val tair = attrs("tair").map(a => a.name -> a.value).toMap
    assert(tair("units") == Strs(Seq("degC")))
    assert(tair("scale_factor") == Nums(Seq(0.5)))
    assert(tair("add_offset") == Nums(Seq(2.0)))
    assert(tair("_FillValue") == Nums(Seq(-999.0)))
    assert(tair("flags") == Ints(Seq(1L, 2L, 250L))) // unsigned byte stays 250
    assert(tair("history") == Strs(Seq("reprocessed v3", "by make_fixtures")))
    tair("REFERENCE_LIST") match { // compound: surfaced, not fatal
      case Unsupported(r) => assert(r.contains("class 6"))
      case other => fail(s"REFERENCE_LIST should be Unsupported, got $other")
    }
    assert(HDF5.dimensionNames(in) == Map("tair" -> Seq(Some("y"), Some("x"))))
    val y = attrs("y").map(a => a.name -> a.value).toMap
    assert(y("CLASS") == Strs(Seq("DIMENSION_SCALE")))
    assert(y("NAME") == Strs(Seq("y")))
    assert(y("units") == Strs(Seq("m")))
    // DENSE attribute storage: v3 messages through the fractal heap +
    // the type-8 name-index v2 B-tree
    val dv = attrs("dense_var").map(a => a.name -> a.value).toMap
    assert(dv == Map(
      "method" -> Strs(Seq("mean")),
      "cell_methods" -> Strs(Seq("time: mean")),
      "levels" -> Nums(Seq(1.5, 2.5))))
    // the attribute surface must not disturb data decode; int8/int16
    // datasets (THE CF packed types) decode signed
    val dss = HDF5.read(in).sortBy(_.name)
    assert(dss.map(_.name) ==
      Seq("dense_var", "packed_i16", "packed_u8", "tair", "x", "y"))
    assert(dss.find(_.name == "tair").get.data.toSeq ==
      (0 until 24).map(i => if (i % 7 == 0) -999.0 else i * 0.25 - 2.0))
    assert(dss.find(_.name == "dense_var").get.data.toSeq == Seq(1.0, 2.0, 3.0))
    assert(dss.find(_.name == "packed_i16").get.data.toSeq ==
      Seq(-9999.0, 120.0, -5.0, 0.0, 2500.0, -9999.0))
    assert(dss.find(_.name == "packed_u8").get.data.toSeq ==
      Seq(-1.0, 5.0, -128.0, 0.0, 7.0, -2.0))
    // CF decode of both packed shapes: int16 + scale/offset/fill, and
    // the netCDF-classic _Unsigned reinterpretation (fill -1 -> 255)
    val tmp = java.nio.file.Files.createTempFile("graft-ncattrs", ".h5")
    java.nio.file.Files.write(tmp, fixture("golden_ncattrs.h5"))
    assert(CfDecode.hdf5CfAttrs(tmp.toString, "packed_i16") ==
      CfDecode.CfAttrs(0.01, 300.0, Some(-9999.0), None))
    assert(CfDecode.hdf5CfAttrs(tmp.toString, "packed_u8") ==
      CfDecode.CfAttrs(0.5, 2.0, Some(-1.0), Some(256.0)))
  }

  test("HDF5: python-written NESTED GROUPS decode by path (old-style tree " +
      "with an OHDR compact-links group inside)") {
    val in = new ArrayInput(fixture("golden_groups.h5"))
    val dss = HDF5.read(in).sortBy(_.name)
    assert(dss.map(_.name) == Seq("latest/v", "model/deep/bias", "model/t2m",
      "model/x", "model/y", "surface"))
    assert(dss.find(_.name == "model/t2m").get.data.toSeq ==
      (0 until 6).map(_ * 0.5))
    assert(dss.find(_.name == "model/deep/bias").get.data.toSeq == Seq(0.25, 0.75))
    assert(dss.find(_.name == "latest/v").get.data.toSeq == Seq(7.0, 9.0))
    assert(dss.find(_.name == "surface").get.data.toSeq == Seq(0.0, 2.0, 4.0))
    // DIMENSION_LIST references cross group boundaries
    assert(HDF5.dimensionNames(in) ==
      Map("model/t2m" -> Seq(Some("model/y"), Some("model/x"))))
    val walk = HDF5.walkEntries(in)
    assert(walk.collect { case (p, _, true) => p }.sorted ==
      Seq("latest", "model", "model/deep"))
  }

  test("HDF5: python-written v0 file decodes exactly") {
    val dss = HDF5.read(fixture("golden.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("series", "shuf", "temp"))
    val temp = dss.find(_.name == "temp").get
    assert(temp.dims == Seq(2L, 3L, 4L))
    assert(temp.data.toSeq == (0 until 24).map(_ * 0.25))
    val series = dss.find(_.name == "series").get
    assert(series.dims == Seq(10L))
    assert(series.data.toSeq == (0 until 10).map(_ * 1.5))
    // shuffle THEN deflate write pipeline (nc_def_var_deflate shuffle=1):
    // decode applies the inverses in reverse
    val shuf = dss.find(_.name == "shuf").get
    assert(shuf.dims == Seq(6L))
    assert(shuf.data.toSeq == (0 until 6).map(_ * 0.5 - 1.0))
  }

  test("HDF4: python-written DFSD file decodes exactly (plain + deflate)") {
    val sds = HDF4.readSds(fixture("golden.hdf")).sortBy(_.label)
    assert(sds.map(_.label) == Seq("cloud_fraction", "sea_surface_temperature"))
    val sst = sds.find(_.label == "sea_surface_temperature").get
    assert(sst.dims == Seq(2, 3) && sst.ntType == HDF4.Int16)
    assert(sst.data.toSeq == (0 until 6).map(i => (100 + i).toDouble))
    val cld = sds.find(_.label == "cloud_fraction").get
    assert(cld.dims == Seq(4) && cld.ntType == HDF4.Float32)
    assert(cld.data.toSeq == (0 until 4).map(_ * 0.5))
  }

  test("HDF4: SD-interface Vdata attributes decode from the Var0.0 Vgroup") {
    val sst = HDF4.readSds(fixture("golden.hdf"))
      .find(_.label == "sea_surface_temperature").get
    assert(sst.attrs("units") == HDF4.StrAttr("K"))
    assert(sst.attrs("scale_factor") == HDF4.NumAttr(HDF4.Float64, Seq(0.01)))
    assert(sst.attrs("add_offset") == HDF4.NumAttr(HDF4.Float64, Seq(273.15)))
    assert(sst.attrs("_FillValue") == HDF4.NumAttr(HDF4.Int16, Seq(-9999.0)))
  }

  test("HDF5: python-written v2/OHDR generation decodes (BE data + compact layout)") {
    val dss = HDF5.read(fixture("golden_v2.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("be", "btree2", "ea", "ea2", "tiny", "v4fa"))
    // extensible-array index (the appended-time netCDF-4 series shape),
    // all chunks direct in the index block
    val ea = dss.find(_.name == "ea").get
    assert(ea.dims == Seq(12L))
    assert(ea.data.toSeq == (0 until 12).map(_ * 0.25 + 1.0))
    // extensible array WITH a row-0 data block (chunks beyond iblkElmts)
    val ea2 = dss.find(_.name == "ea2").get
    assert(ea2.dims == Seq(24L))
    assert(ea2.data.toSeq == (0 until 24).map(_ * 0.5))
    // v2 B-tree chunk index, record type 10 (the >1-unlimited-dims index)
    val bt = dss.find(_.name == "btree2").get
    assert(bt.dims == Seq(12L))
    assert(bt.data.toSeq == (0 until 12).map(10.0 - _ * 0.5))
    val be = dss.find(_.name == "be").get
    assert(be.dims == Seq(4L))
    assert(be.data.toSeq == Seq(2.5, -1.25, 0.75, 100.0))
    val tiny = dss.find(_.name == "tiny").get
    assert(tiny.dims == Seq(3L))
    assert(tiny.data.toSeq == Seq(9.5, -0.125, 3.0))
    // layout v4 + Fixed Array index, client 1 (deflate-filtered entries),
    // ragged edge chunk clipped
    val fa = dss.find(_.name == "v4fa").get
    assert(fa.dims == Seq(10L))
    assert(fa.data.toSeq == (0 until 10).map(7.0 - _))
  }

  test("HDF5: python-written DENSE root group (fractal heap + v2 B-tree) decodes") {
    val dss = HDF5.read(fixture("golden_dense.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("alpha", "bravo", "charlie"))
    dss.zipWithIndex.foreach { case (ds, i) =>
      assert(ds.dims == Seq(4L))
      assert(ds.data.toSeq == (0 until 4).map(i * 10.0 + _),
        s"${ds.name}: ${ds.data.toSeq}")
    }
  }

  test("HDF5: python-written DEPTH-2 dense name index decodes (30 variables)") {
    // the B-tree and its pointer widths come from the Python writer's own
    // H5B2 node-info arithmetic — a Scala-side geometry bug cannot pass
    val bytes = fixture("golden_deep.h5")
    // fixture really is depth 2 (BTHD depth field)
    val at = bytes.indices.find(i =>
      bytes(i) == 'B' && bytes(i + 1) == 'T' && bytes(i + 2) == 'H' && bytes(i + 3) == 'D').get
    assert(((bytes(at + 12) & 0xff) | ((bytes(at + 13) & 0xff) << 8)) == 2)
    val dss = HDF5.read(bytes).sortBy(_.name)
    assert(dss.map(_.name) == (0 until 30).map(i => f"v$i%02d"))
    dss.zipWithIndex.foreach { case (ds, i) =>
      assert(ds.dims == Seq(2L))
      assert(ds.data.toSeq == Seq(i * 2.0 + 0.25, i * 2.0 + 0.75),
        s"${ds.name}: ${ds.data.toSeq}")
    }
  }

  test("HDF5: python-written INDIRECT-CHILD fractal heap decodes (80 links)") {
    // small doubling-table geometry (start 64, max direct 128, width 4)
    // built from the Python writer's own spec arithmetic: the 80 link
    // bodies overflow the direct rows, so root row 3 holds CHILD
    // indirect blocks the reader must recurse through
    val bytes = fixture("golden_indirect.h5")
    val nFhib = bytes.indices.count(i =>
      bytes(i) == 'F' && bytes(i + 1) == 'H' && bytes(i + 2) == 'I' && bytes(i + 3) == 'B')
    assert(nFhib >= 2, s"fixture lost its child indirect blocks ($nFhib FHIB)")
    val dss = HDF5.read(bytes).sortBy(_.name)
    assert(dss.map(_.name) == (0 until 80).map(i => f"w$i%02d"))
    dss.zipWithIndex.foreach { case (ds, i) =>
      assert(ds.dims == Seq(2L))
      assert(ds.data.toSeq == Seq(i + 0.125, -i * 0.5), s"${ds.name}: ${ds.data.toSeq}")
    }
  }

  test("netCDF3: python-written CDF-2 record variable decodes exactly") {
    val bytes = fixture("golden_rec.nc")
    val h = NetCDF3.readHeader(bytes)
    assert(h.version == 2 && h.numRecs == 2)
    assert(h.dims.head.isRecord)
    val (dimNames, shape, flux) = NetCDF3.readValues(bytes, "flux")
    assert(dimNames == Seq("time", "x") && shape == Seq(2, 2))
    assert(flux.toSeq == Seq(1.5, 2.5, 3.5, 4.5))
  }

  test("netCDF3: python-written CDF-5 (64-bit data) decodes exactly, " +
      "extended types included") {
    val bytes = fixture("golden_cdf5.nc")
    val h = NetCDF3.readHeader(bytes)
    assert(h.version == 5 && h.numRecs == 3)
    assert(h.dims.map(d => (d.name, d.length)) == Seq(("time", 0), ("x", 4)))
    assert(h.gattrs.exists(a => a.name == "title" && a.value == "cdf5 golden"))
    // int64 record coordinate + its units attr (wide attr fields)
    val (td, ts, time) = NetCDF3.readValues(bytes, "time")
    assert(td == Seq("time") && ts == Seq(3))
    assert(time.toSeq == Seq(100.0, 150.0, 200.0))
    val tv = h.vars.find(_.name == "time").get
    assert(tv.ncType == NetCDF3.NcInt64)
    assert(tv.attrs.exists(a => a.name == "units" &&
      a.value == "seconds since 2024-01-01"))
    // uint record variable above the int32 range (strided records)
    val (_, cs, counts) = NetCDF3.readValues(bytes, "counts")
    assert(cs == Seq(3, 4))
    assert(counts.toSeq == (0 until 12).map(i => 4.0e9 + i))
    // ushort fixed var + an int64 _FillValue attr
    val (_, _, packed) = NetCDF3.readValues(bytes, "packed")
    assert(packed.toSeq == Seq(0.0, 7.0, 65535.0, 42.0))
    assert(h.vars.find(_.name == "packed").get.attrs.exists(a =>
      a.name == "_FillValue" && (a.value match {
        case xs: Array[Long] => xs.toSeq == Seq(-1L)
        case _ => false
      })))
    // uint64 with the top bit set keeps the unsigned magnitude
    val (_, _, big) = NetCDF3.readValues(bytes, "big")
    assert(big.toSeq == Seq(math.pow(2, 63) + 5, 1.0, 0.0, math.pow(2, 64) - 1))
  }

  test("netCDF3: python-written classic file decodes exactly") {
    val bytes = fixture("golden.nc")
    val h = NetCDF3.readHeader(bytes)
    assert(h.dims.map(d => (d.name, d.length)) == Seq(("time", 3), ("x", 2)))
    assert(h.gattrs.exists(a => a.name == "title" &&
      a.value == "golden fixture"))
    val (dimNames, shape, temp) = NetCDF3.readValues(bytes, "temp")
    assert(dimNames == Seq("time", "x") && shape == Seq(3, 2))
    assert(temp.toSeq == (0 until 6).map(20.0 + 0.5 * _))
    val (_, _, time) = NetCDF3.readValues(bytes, "time")
    assert(time.toSeq == Seq(0.0, 6.0, 12.0))
    val tv = h.vars.find(_.name == "temp").get
    assert(tv.attrs.exists(a => a.name == "units" && a.value == "K"))
  }

  test("zarr: python-written v2 store decodes exactly (zlib + missing chunk)") {
    val store = fixtureDir("golden.zarr")
    val (lwpShape, lwp) = Zarr.readArray(store, "lwp")
    assert(lwpShape == Seq(5, 6))
    val expect = for (r <- 0 until 5; c <- 0 until 6) yield r * 10.0 + c
    assert(lwp.toSeq == expect)
    val (cntShape, cnt) = Zarr.readArray(store, "cnt")
    assert(cntShape == Seq(7))
    // chunk 1 is absent on disk: elements 4..6 read as fill_value -1
    assert(cnt.toSeq == Seq(3.0, 1.0, 4.0, 1.0, -1.0, -1.0, -1.0))
    val (windShape, wind) = Zarr.readArray(store, "wind")
    assert(windShape == Seq(3))
    assert(wind.toSeq == Seq(5.5, -2.25, 0.125)) // '>f4' big-endian branch
  }

  test("zarr: python-written blosc(lz4) v2 store decodes exactly") {
    val store = fixtureDir("golden_blosc.zarr")
    // sst: shuffled single-leftover-block frames, 2-D pad regions
    val (sstShape, sst) = Zarr.readArray(store, "sst")
    assert(sstShape == Seq(6, 8))
    val expect = for (r <- 0 until 6; c <- 0 until 8) yield r * 100.0 + c
    assert(sst.toSeq == expect)
    // big: SPLIT frames (typesize 8 streams), values from the manifest
    val manifest = org.json4s.jackson.JsonMethods.parse(
      new String(fixture("golden_blosc_manifest.json"), "UTF-8"))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val (bigShape, big) = Zarr.readArray(store, "big")
    assert(bigShape == Seq(512))
    assert(big.toSeq == (manifest \ "big").extract[Seq[Double]])
    // mask: non-split multi-block i2 frames, chunk-1 pad skipped
    val (maskShape, mask) = Zarr.readArray(store, "mask")
    assert(maskShape == Seq(100))
    val m0 = (0 until 64).map(i => ((i % 7) - 3).toDouble)
    val m1 = (0 until 36).map(i => (i % 5).toDouble)
    assert(mask.toSeq == m0 ++ m1)
    // noise: incompressible -> memcpy-flag frame
    val (noiseShape, noise) = Zarr.readArray(store, "noise")
    assert(noiseShape == Seq(32))
    assert(noise.toSeq == (manifest \ "noise").extract[Seq[Double]])
  }

  test("zarr: python-written blosc(zstd + bitshuffle) v2 store decodes " +
      "exactly (zstd frames from pyarrow's bundled libzstd)") {
    val store = fixtureDir("golden_blosc_zstd.zarr")
    // zs: zstd + BYTE shuffle, two blocks per chunk
    val (zsShape, zs) = Zarr.readArray(store, "zs")
    assert(zsShape == Seq(64))
    assert(zs.toSeq == (0 until 64).map(i => i * 0.5 - 3.0))
    // zn: zstd, no shuffle, single block
    val (znShape, zn) = Zarr.readArray(store, "zn")
    assert(znShape == Seq(48))
    assert(zn.toSeq == (0 until 48).map(i => 1000.0 + i))
    // zb: zstd + BITshuffle (16 f8 elements per block)
    val (zbShape, zb) = Zarr.readArray(store, "zb")
    assert(zbShape == Seq(64))
    assert(zb.toSeq == (0 until 64).map(i => i * 0.25))
    // lb: lz4 + BITshuffle on i4
    val (lbShape, lb) = Zarr.readArray(store, "lb")
    assert(lbShape == Seq(80))
    assert(lb.toSeq == (0 until 80).map(i => (i * 7 - 100).toDouble))
    // lt: bitshuffle RAW TAIL — 20 elements/block, only 16 transform,
    // the last 4 stay raw (c-blosc's size -= size % 8 convention)
    val (ltShape, lt) = Zarr.readArray(store, "lt")
    assert(ltShape == Seq(20))
    assert(lt.toSeq == (0 until 20).map(i => ((i * 3) % 17 - 8).toDouble))
  }

  test("zarr: python-written blosc(lz4) v3 store decodes exactly") {
    val store = fixtureDir("golden_blosc_v3.zarr")
    val (shape, temp) = Zarr3.readArray(store, "temp")
    assert(shape == Seq(5, 6))
    val expect = for (r <- 0 until 5; c <- 0 until 6) yield r * 10.0 + c * 0.5
    assert(temp.toSeq == expect)
  }

  test("zarr: python-written sharding_indexed v3 store decodes exactly") {
    // shard files hold a 2x2 inner-chunk grid + crc32c-checked index;
    // one inner chunk is ABSENT (2^64-1 sentinel) -> fill_value -1
    val store = fixtureDir("golden_sharded_v3.zarr")
    val (shape, temp) = Zarr3.readArray(store, "temp")
    assert(shape == Seq(6, 8))
    // the ABSENT inner chunk is shard 1's inner (0,0) = rows 4-5,
    // cols 0-3: those 8 visible elements read as fill_value -1
    val expect = for (r <- 0 until 6; c <- 0 until 8) yield
      if (r >= 4 && c < 4) -1.0 else r * 10.0 + c
    assert(temp.toSeq == expect)
    // corrupt the index crc -> loud reject
    val shard = new java.io.File(store, "temp/c/0/0")
    val good = java.nio.file.Files.readAllBytes(shard.toPath)
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x7f).toByte
    val tmp = java.nio.file.Files.createTempDirectory("shard-bad")
    val d = tmp.resolve("temp/c/0"); java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.copy(new java.io.File(store, "temp/zarr.json").toPath,
      tmp.resolve("temp/zarr.json"))
    java.nio.file.Files.write(d.resolve("0"), bad)
    val e = intercept[IllegalArgumentException] {
      Zarr3.readArray(tmp.toFile, "temp")
    }
    assert(e.getMessage.contains("crc32c mismatch"))
  }

  test("WARC: python-written .warc.gz decodes exactly") {
    val recs = Warc.readGz(fixture("golden.warc.gz"))
    assert(recs.map(_.warcType) == Seq("warcinfo", "response"))
    val resp = recs(1)
    assert(resp.targetUri == "https://example.org/golden")
    assert(resp.date == "2024-01-15T00:00:01Z")
    val body = new String(Warc.httpBody(resp.payload), "UTF-8").trim
    assert(body == "<html><body>golden warc fixture</body></html>")
  }

  test("HDF5: python-written fletcher32 chunks verify and decode exactly") {
    // 'checked' runs the full netCDF-4 pipeline (fletcher32 -> shuffle
    // -> deflate): the python side computed the checksum from the spec
    // independently, so a wrong Scala fletcher32 fails the verify here
    val dss = HDF5.read(fixture("golden_fletcher.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("checked", "plain"))
    val checked = dss.find(_.name == "checked").get
    assert(checked.dims == Seq(10L))
    assert(checked.data.toSeq == (0 until 10).map(_ * 0.75 - 2.0))
    val plain = dss.find(_.name == "plain").get
    assert(plain.dims == Seq(5L))
    assert(plain.data.toSeq == (0 until 5).map(k => k * k * 0.5))
  }

  test("HDF5: fletcher32 rejects a corrupted chunk loudly") {
    // 'plain' is unfiltered-otherwise, so its chunk bytes sit raw in the
    // file: flip one payload byte and the checksum must catch it
    val bytes = fixture("golden_fletcher.h5")
    val good = HDF5.read(bytes)
    val probe = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(0.5).array()
    val at = (0 until bytes.length - 8).find(i =>
      probe.indices.forall(j => bytes(i + j) == probe(j))).get
    val bad = bytes.clone(); bad(at) = (bad(at) ^ 0x40).toByte
    val ex = intercept[IllegalArgumentException](HDF5.read(bad))
    assert(ex.getMessage.contains("fletcher32 mismatch"))
    assert(good.nonEmpty) // the uncorrupted read stays green
  }

  test("HDF5: huge fractal-heap link (indirect, via the huge-object v2 B-tree)") {
    // a 300-char dataset name overflows the heap's max managed size; its
    // link message lives outside the heap, addressed by record type 1
    val longname = (0 until 300).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val dss = HDF5.read(fixture("golden_huge.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("alpha", "bravo", longname).sorted)
    assert(dss.find(_.name == "alpha").get.data.toSeq == (0 until 4).map(_ * 0.5))
    assert(dss.find(_.name == longname).get.data.toSeq ==
      (0 until 4).map(k => 200.0 + k * 0.5))
  }

  test("HDF5: tiny heap-id link and directly-accessed huge link (18-byte ids)") {
    // tiny: the whole link message rides inside the heap ID; huge direct:
    // the ID carries address + length, no B-tree involved
    val longname = (0 until 280).map(i => ('a' + (i * 11) % 26).toChar).mkString
    val dss = HDF5.read(fixture("golden_tiny.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("m", "t", longname).sorted)
    assert(dss.find(_.name == "m").get.data.toSeq == (0 until 4).map(k => 0.0 - k))
    assert(dss.find(_.name == "t").get.data.toSeq == (0 until 4).map(k => 10.0 - k))
    assert(dss.find(_.name == longname).get.data.toSeq == (0 until 4).map(k => 20.0 - k))
  }

  test("HDF5: python-written szip chunks decode exactly (NN + EC, int32 + float32)") {
    // the python encoder and Scala decoder implement CCSDS 121 from the
    // spec independently; exact equality proves the whole bit-level
    // contract: option IDs, FS codes, zero-block ROS, second extension,
    // k-splitting, NN unmap, LSB sample packing
    val dss = HDF5.read(fixture("golden_szip.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("sze", "szf", "szi", "szp", "szq"))
    val szi = dss.find(_.name == "szi").get
    assert(szi.dims == Seq(48L))
    val expectI = Seq.fill(16)(7) ++ (0 until 16).map(_ * 3) ++
      (0 until 16).map(k => ((k * 2654435761L) % 1000003L).toInt)
    assert(szi.data.toSeq == expectI.map(_.toDouble))
    val szf = dss.find(_.name == "szf").get
    assert(szf.data.toSeq == (0 until 32).map(_ * 0.25 - 2.0))
    val sze = dss.find(_.name == "sze").get
    assert(sze.data.toSeq == (0 until 16).map(k => ((k * 7) % 19).toDouble))
    // padded tails: a short FINAL scanline (szp: 26 samples, ppsl 16)
    // and a ppsl that is NOT a block multiple (szq: ppsl 14, block 8 —
    // every scanline's last block carries repeat-padding to discard)
    val szp = dss.find(_.name == "szp").get
    assert(szp.data.toSeq == (0 until 26).map(k => ((k * 11) % 97).toDouble))
    val szq = dss.find(_.name == "szq").get
    assert(szq.data.toSeq == (0 until 20).map(k => ((k * 13) % 83).toDouble))
  }

  test("HDF5: python-written nbit and scale-offset chunks decode exactly") {
    // both encoders implement the H5Znbit / H5Zscaleoffset bit-level
    // formats independently of the Scala decoder: MSB-first packed
    // significant bits (nbit), 13-byte minbits/minval chunk header +
    // packed offsets (scale-offset), fill sentinels, per-chunk minbits,
    // the minbits==0 constant branch and the minbits==32 raw branch
    val dss = HDF5.read(fixture("golden_nbit_so.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("nbi", "nbu", "soc", "sod", "sof", "soi", "sor"))
    // nbi: signed 12-bit precision — negatives must sign-extend
    assert(dss.find(_.name == "nbi").get.data.toSeq ==
      (0 until 40).map(k => (((k * 37) % 4000) - 2000).toDouble))
    // nbu: UNSIGNED, precision 9 at bit offset 3 — the converted value
    assert(dss.find(_.name == "nbu").get.data.toSeq ==
      (0 until 16).map(k => ((k * 29) % 512).toDouble))
    // soi: defined fill -9999 (all-ones sentinel), per-chunk minbits
    assert(dss.find(_.name == "soi").get.data.toSeq == (0 until 48).map(k =>
      if (k % 11 == 0) -9999.0 else (((k * 53) % 1000) - 500).toDouble))
    // soc: constant chunk, minbits 0, header-only payload
    assert(dss.find(_.name == "soc").get.data.toSeq == Seq.fill(16)(42.0))
    // sor: user minbits 32 -> raw little-endian store
    assert(dss.find(_.name == "sor").get.data.toSeq ==
      (0 until 12).map(k => (k * 1234567 - 6000000).toDouble))
    // sof: float32 D-scale (D=2), values exact multiples of 0.25
    assert(dss.find(_.name == "sof").get.data.toSeq ==
      (0 until 32).map(k => (k * 0.25f - 2.0f).toDouble))
    // sod: float64 D-scale (D=3) with fill 1e30
    assert(dss.find(_.name == "sod").get.data.toSeq == (0 until 24).map(k =>
      if (k % 7 == 0) 1e30 else k * 0.125 - 1.0))
  }

  test("HDF5: filtered fractal-heap blocks and extended tiny ids decode exactly") {
    // deflate-filtered heap: the whole direct-block image is stored
    // compressed (root-direct case carries size+mask in FRHP; the
    // indirect case widens direct-row entries to addr+size+mask), and
    // heap id length 27 forces the EXTENDED tiny-id encoding for 't'
    val hugename = (0 until 80).map(i => ('a' + (i * 5) % 26).toChar).mkString
    val dss = HDF5.read(fixture("golden_filtered_heap.h5")).sortBy(_.name)
    assert(dss.map(_.name) ==
      Seq("alpha", "bravo", "charlie", hugename, "t").sorted)
    for ((nm, i) <- Seq("alpha" -> 0, "bravo" -> 1, "charlie" -> 2,
        hugename -> 3, "t" -> 4))
      assert(dss.find(_.name == nm).get.data.toSeq ==
        (0 until 4).map(k => i * 10.0 + k * 0.5), nm.take(12))
    val ib = HDF5.read(fixture("golden_filtered_heap_ib.h5")).sortBy(_.name)
    assert(ib.map(_.name) == (0 until 8).map(i => f"d$i%02d"))
    for (i <- 0 until 8)
      assert(ib.find(_.name == f"d$i%02d").get.data.toSeq ==
        (0 until 4).map(k => i * 3.0 + k * 0.25), s"d$i")
  }

  test("HDF5: python-written v1-superblock file decodes exactly") {
    val dss = HDF5.read(fixture("golden_v1sb.h5")).sortBy(_.name)
    assert(dss.map(_.name) == Seq("series", "shuf", "temp"))
    assert(dss.find(_.name == "temp").get.data.toSeq == (0 until 24).map(_ * 0.25))
    assert(dss.find(_.name == "series").get.data.toSeq == (0 until 10).map(_ * 1.5))
    assert(dss.find(_.name == "shuf").get.data.toSeq == (0 until 6).map(_ * 0.5 - 1.0))
  }

  test("WAV: python-written PCM16 file (with LIST chunk) decodes exactly") {
    val (sr, samples) = graft.functions.AudioOps.decodeWavPcm16(fixture("golden.wav"))
    assert(sr == 8000)
    assert(samples.toSeq == (0 until 16).map(i => (i * 1000 - 7000).toShort))
  }

  test("ONNX: python-written protobuf model parses and runs the mask path") {
    import graft.embeddings.Onnx
    val in = getClass.getResourceAsStream("/graft/fixtures/pool_encoder.onnx")
    require(in != null, "pool_encoder.onnx missing — run tools/make_fixtures.py")
    val bytes = try in.readAllBytes() finally in.close()
    val g = Onnx.parseModel(bytes)
    assert(g.dataInputs.toSet == Set("input_ids", "attention_mask"))
    // batch of 2: doc A = tokens [3,7,11] (+5 pad), doc B = all 8 positions
    val idsA = Seq(3, 7, 11, 0, 0, 0, 0, 0)
    val idsB = Seq(1, 2, 3, 4, 5, 6, 7, 8)
    val maskA = Seq(1, 1, 1, 0, 0, 0, 0, 0)
    val maskB = Seq(1, 1, 1, 1, 1, 1, 1, 1)
    val out = Onnx.runNd(g, Map(
      "input_ids" -> Onnx.Nd(Seq(2, 8), (idsA ++ idsB).map(_.toDouble).toArray),
      "attention_mask" -> Onnx.Nd(Seq(2, 8), (maskA ++ maskB).map(_.toDouble).toArray)))
    assert(out.dims == Seq(2, 8))
    // independent recomputation from the writer's formula:
    // emb[t][h] = ((t*31 + h*7) % 13 - 6) / 8; masked mean; first 8 dims
    def emb(t: Int, h: Int): Double = (((t * 31 + h * 7) % 13) - 6) / 8.0
    def pooled(ids: Seq[Int], mask: Seq[Int], h: Int): Double = {
      val live = ids.zip(mask).filter(_._2 == 1).map(_._1)
      live.map(emb(_, h)).sum / live.size
    }
    for (h <- 0 until 8) {
      assert(math.abs(out.a(h) - pooled(idsA, maskA, h)) < 1e-12,
        s"doc A dim $h: ${out.a(h)} vs ${pooled(idsA, maskA, h)}")
      assert(math.abs(out.a(8 + h) - pooled(idsB, maskB, h)) < 1e-12,
        s"doc B dim $h: ${out.a(8 + h)} vs ${pooled(idsB, maskB, h)}")
    }
  }
}
