package graft.sources

import graft.SparkSpec

/** Zarr v3: foreign-fixture decode (gzip + missing chunk + BE int32
  * with v2-style keys + uint16), writer round-trips through the
  * reader, scenes-level round-trip, and loud-reject paths. */
class Zarr3Spec extends SparkSpec {

  private def fixture(name: String): java.io.File = {
    val f = new java.io.File(s"src/test/resources/fixtures/$name")
    require(f.isDirectory, s"fixture $name missing — run tools/make_fixtures.py")
    f
  }

  test("foreign v3 store: gzip chunks, missing chunk -> fill, BE int32 " +
    "dotted keys, uint16") {
    val store = fixture("golden_v3.zarr")
    val (shape, lwp) = Zarr3.readArray(store, "lwp")
    assert(shape == Seq(5, 6))
    for (y <- 0 until 5; x <- 0 until 6) {
      val want = if (y >= 3 && x >= 4) -7.5 else y * 10.0 + x // missing c/1/1
      assert(lwp(y * 6 + x) == want, s"lwp($y,$x)")
    }
    val (cs, counts) = Zarr3.readArray(store, "counts")
    assert(cs == Seq(4) && counts.toSeq == Seq(-3.0, 70000.0, 0.0, 12345.0))
    val (xs, xc) = Zarr3.readArray(store, "xc")
    assert(xs == Seq(3) && xc.toSeq == Seq(100.0, 65535.0, 40000.0))
  }

  test("writer round-trips through the reader (gzip + raw, ragged edges)") {
    val s = spark
    import s.implicits._
    val (ny, nx) = (7, 5)
    val px = (for (j <- 0 until ny; i <- 0 until nx)
      yield ("sc1", new java.sql.Timestamp(0L), i * 100.0, j * 100.0,
        (j * nx + i) * 0.25 - 3.0)).toDF("scene_id", "time", "x", "y", "value")
    for (gz <- Seq(Some(6), None)) {
      val dir = java.nio.file.Files.createTempDirectory("zarr3-rt").toString
      Zarr3.writeScenes(px, dir, "lwp", chunkRows = Some(3), gzipLevel = gz).count()
      val back = Zarr3.readScenes(spark, dir, "lwp")
        .collect().map(r => (r.getDouble(1), r.getDouble(2)) -> r.getDouble(3)).toMap
      for (j <- 0 until ny; i <- 0 until nx)
        assert(back((i * 100.0, j * 100.0)) == (j * nx + i) * 0.25 - 3.0,
          s"gz=$gz px($j,$i)")
    }
  }

  test("sharded writer round-trips through the reader") {
    val s = spark
    import s.implicits._
    val (ny, nx) = (11, 6) // ragged: 11 rows over shard chunks of 4
    val px = (for (j <- 0 until ny; i <- 0 until nx)
      yield ("sh1", new java.sql.Timestamp(0L), i * 10.0, j * 10.0,
        (j * nx + i) * 0.5 - 7.0)).toDF("scene_id", "time", "x", "y", "value")
    for (gz <- Seq(Some(6), None)) {
      val dir = java.nio.file.Files.createTempDirectory("zarr3-shard-rt").toString
      Zarr3.writeScenes(px, dir, "lwp", chunkRows = Some(4), gzipLevel = gz,
        shardInnerRows = Some(2)).count()
      // the written metadata must actually declare sharding_indexed
      val metaJson = java.nio.file.Files.readString(
        new java.io.File(dir, "sh1.zarr/lwp/zarr.json").toPath)
      assert(metaJson.contains("sharding_indexed") && metaJson.contains("crc32c"))
      val m = Zarr3.parseMeta(metaJson)
      assert(m.sharding.exists(_.innerChunks == Seq(2, nx)))
      val back = Zarr3.readScenes(spark, dir, "lwp")
        .collect().map(r => (r.getDouble(1), r.getDouble(2)) -> r.getDouble(3)).toMap
      for (j <- 0 until ny; i <- 0 until nx)
        assert(back((i * 10.0, j * 10.0)) == (j * nx + i) * 0.5 - 7.0,
          s"gz=$gz px($j,$i)")
    }
  }

  test("v3 zstd codec decodes (zstd-jni reference frames)") {
    val vals = Array.tabulate(12)(i => i * 1.5 - 4.0)
    val raw = java.nio.ByteBuffer.allocate(96).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(raw.putDouble)
    val comp = com.github.luben.zstd.Zstd.compress(raw.array(), 3)
    val d = java.nio.file.Files.createTempDirectory("zarr3-zstd").toFile
    val a = new java.io.File(d, "v"); a.mkdirs()
    java.nio.file.Files.writeString(a.toPath.resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "array", "shape": [12],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [12]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": 0.0,
        | "codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
        |   {"name": "zstd", "configuration": {"level": 3, "checksum": false}}]}"""
        .stripMargin)
    val cd = new java.io.File(a, "c"); cd.mkdirs()
    java.nio.file.Files.write(new java.io.File(cd, "0").toPath, comp)
    assert(Zarr3.readArray(d, "v")._2.toSeq == vals.toSeq)
  }

  test("unsupported features reject loudly") {
    def metaOf(tweak: String => String): String = tweak(
      """{"zarr_format": 3, "node_type": "array", "shape": [4],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [2]}},
        | "fill_value": 0.0,
        | "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}]}"""
        .stripMargin)
    // baseline parses
    Zarr3.parseMeta(metaOf(identity))
    def rejects(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](Zarr3.parseMeta(json))
      assert(e.getMessage.contains(frag), s"message '${e.getMessage}' lacks '$frag'")
    }
    rejects(metaOf(_.replace("\"float64\"", "\"uint64\"")), "uint64")
    rejects(metaOf(_.replace("\"regular\"", "\"rectilinear\"")), "chunk_grid")
    rejects(metaOf(_.replace("{\"name\": \"bytes\", \"configuration\": {\"endian\": \"little\"}}",
      "{\"name\": \"blosc\", \"configuration\": {}}")), "codec")
    rejects(metaOf(_.replace("3,", "2,")), "v3 only")
    rejects(metaOf(_.replace(" \"fill_value\": 0.0,", "")), "fill_value")
  }

  test("sharding_indexed without index_codecs rejects loudly (spec " +
      "requires it; assuming crc-less [bytes] would shift the window)") {
    val meta =
      """{"zarr_format": 3, "node_type": "array", "shape": [4],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": 0.0,
        | "codecs": [{"name": "sharding_indexed", "configuration": {
        |   "chunk_shape": [2],
        |   "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}]INDEX}}]}"""
        .stripMargin
    val e = intercept[IllegalArgumentException] {
      Zarr3.parseMeta(meta.replace("INDEX", ""))
    }
    assert(e.getMessage.contains("index_codecs"))
    // with index_codecs present the same metadata parses
    Zarr3.parseMeta(meta.replace("INDEX",
      """, "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}]"""))
  }

  test("shard index entry whose offset+length wraps past Long.MaxValue " +
      "rejects loudly (no truncated-window slice)") {
    val meta =
      """{"zarr_format": 3, "node_type": "array", "shape": [4],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": 0.0,
        | "codecs": [{"name": "sharding_indexed", "configuration": {
        |   "chunk_shape": [2],
        |   "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        |   "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}]}}]}"""
        .stripMargin
    val d = java.nio.file.Files.createTempDirectory("zarr3-wrap").toFile
    val a = new java.io.File(d, "v"); a.mkdirs()
    java.nio.file.Files.writeString(a.toPath.resolve("zarr.json"), meta)
    val cd = new java.io.File(a, "c"); cd.mkdirs()
    // 48 junk bytes + 2x16-byte index: entry0 = (16, Long.MaxValue)
    // wraps (16 + MaxValue < 0); entry1 = missing
    val bb = java.nio.ByteBuffer.allocate(48 + 32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(48)
    bb.putLong(16L).putLong(Long.MaxValue)
    bb.putLong(-1L).putLong(-1L)
    java.nio.file.Files.write(new java.io.File(cd, "0").toPath, bb.array())
    val e = intercept[IllegalArgumentException] {
      Zarr3.readArray(d, "v")
    }
    assert(e.getMessage.contains("outside the shard"))
  }
}
