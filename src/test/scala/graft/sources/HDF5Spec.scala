package graft.sources

import graft.SparkSpec

/** Minimal HDF5 codec: lossless round-trip of the netCDF-4-classic-model
  * LES layout (contiguous float64 datasets under the root group), plus the
  * loud-rejection contracts for everything outside the subset. */
class HDF5Spec extends SparkSpec {

  private def lesFixture: Seq[HDF5.DsSpec] = Seq(
    HDF5.DsSpec("time", Seq(3), Array(0.0, 1.0, 2.0)),
    HDF5.DsSpec("y", Seq(4), Array.tabulate(4)(_ * 50.0)),
    HDF5.DsSpec("x", Seq(4), Array.tabulate(4)(_ * 50.0)),
    HDF5.DsSpec("lwp", Seq(3, 4, 4), Array.tabulate(48)(_ * 0.25 - 1.0)))

  test("write/read round-trips the LES dataset layout losslessly") {
    val bytes = HDF5.write(lesFixture)
    val back = HDF5.read(bytes)
    assert(back.map(_.name).sorted == Seq("lwp", "time", "x", "y"))
    val lwp = back.find(_.name == "lwp").get
    assert(lwp.dims == Seq(3L, 4L, 4L))
    assert(lwp.data.toSeq == lesFixture.last.data.toSeq)
    val t = back.find(_.name == "time").get
    assert(t.dims == Seq(3L) && t.data.toSeq == Seq(0.0, 1.0, 2.0))
    // NaN survives (bit-level copy)
    val withNan = HDF5.write(Seq(HDF5.DsSpec("v", Seq(2), Array(1.5, Double.NaN))))
    val v = HDF5.read(withNan).head
    assert(v.data(0) == 1.5 && v.data(1).isNaN)
  }

  test("ingests through the Spark binaryFile path like q56/q61") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "les.h5"), HDF5.write(lesFixture))
    val rows = spark.read.format("binaryFile").load(s"$dir/*.h5")
      .select("content").as[Array[Byte]]
      .flatMap(b => HDF5.read(b).map(d => (d.name, d.dims.mkString("x"), d.data.sum)))
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("lwp", "time", "x", "y"))
    assert(rows.find(_._1 == "lwp").get._2 == "3x4x4")
  }

  test("big-endian data round-trips: contiguous and compact") {
    // legacy big-iron files carry byte order in bit 0 of the datatype
    // class bit field; the raster bytes really are swapped on the wire
    val mixed = lesFixture.map {
      case s if s.name == "time" => s.copy(compact = true)
      case s => s
    }
    val be = HDF5.write(mixed, bigEndian = true)
    val le = HDF5.write(mixed)
    assert(be.length == le.length)
    assert(!(be sameElements le), "BE file must differ from its LE twin")
    val back = HDF5.read(be)
    mixed.foreach { s =>
      assert(back.find(_.name == s.name).get.data.toSeq == s.data.toSeq,
        s"BE decode of ${s.name}")
    }
    // NaN and negatives survive the swap
    val vals = Array(Double.NaN, -0.0, -1.5e-300, 7.25)
    val t = HDF5.read(HDF5.write(
      Seq(HDF5.DsSpec("v", Seq(4), vals)), bigEndian = true)).head.data
    assert(t(0).isNaN && t.drop(1).toSeq == vals.drop(1).toSeq)
    // chunked BE fixtures are out of scope, loudly
    val e = intercept[IllegalArgumentException](HDF5.write(
      Seq(HDF5.DsSpec("c", Seq(4), vals, chunkDims = Some(Seq(2)))), bigEndian = true))
    assert(e.getMessage.contains("bigEndian"))
  }

  test("compact storage round-trips: data inline in the layout message") {
    // mixed file: tiny coordinate vars compact, the raster contiguous —
    // the shape libhdf5 gives small datasets
    val mixed = lesFixture.map {
      case s if s.name != "lwp" => s.copy(compact = true)
      case s => s
    }
    val bytes = HDF5.write(mixed)
    val back = HDF5.read(bytes)
    assert(back.map(_.name).sorted == Seq("lwp", "time", "x", "y"))
    assert(back.find(_.name == "time").get.data.toSeq == Seq(0.0, 1.0, 2.0))
    assert(back.find(_.name == "y").get.data.toSeq == Seq(0.0, 50.0, 100.0, 150.0))
    assert(back.find(_.name == "lwp").get.data.toSeq == lesFixture.last.data.toSeq)
    // compact inlining saves the separate 8-aligned data section: the
    // all-compact file is smaller than its all-contiguous twin
    val compactAll = HDF5.write(lesFixture.map(_.copy(compact = true)))
    assert(compactAll.length < HDF5.write(lesFixture).length)
    assert(HDF5.read(compactAll).find(_.name == "lwp").get.data.toSeq ==
      lesFixture.last.data.toSeq)
    // scalar (rank-0 equivalent: dims Seq(1)) and NaN survive
    val tiny = HDF5.write(Seq(HDF5.DsSpec("s", Seq(1), Array(Double.NaN), compact = true)))
    assert(HDF5.read(tiny).head.data(0).isNaN)
    // > 64 KiB rejects loudly at write (the format caps the u16 size)
    val big = HDF5.DsSpec("b", Seq(9000), new Array[Double](9000), compact = true)
    val e = intercept[IllegalArgumentException](HDF5.write(Seq(big)))
    assert(e.getMessage.contains("64 KiB"))
  }

  test("chunked storage round-trips, including deflate and ragged edge chunks") {
    // chunk (2,3,3) over (3,4,4): ragged in every dimension
    val chunky = lesFixture.map {
      case s if s.name == "lwp" => s.copy(chunkDims = Some(Seq(2, 3, 3)))
      case s => s.copy(chunkDims = Some(Seq(2)))
    }
    for (deflate <- Seq(false, true)) {
      val bytes = HDF5.write(chunky, deflate = deflate)
      val back = HDF5.read(bytes)
      assert(back.map(_.name).sorted == Seq("lwp", "time", "x", "y"), s"deflate=$deflate")
      val lwp = back.find(_.name == "lwp").get
      assert(lwp.dims == Seq(3L, 4L, 4L))
      assert(lwp.data.toSeq == lesFixture.last.data.toSeq, s"deflate=$deflate")
      assert(back.find(_.name == "time").get.data.toSeq == Seq(0.0, 1.0, 2.0))
    }
    // deflate actually compresses: constant field shrinks below raw size
    val big = Seq(HDF5.DsSpec("c", Seq(32, 32), Array.fill(1024)(1.5),
      chunkDims = Some(Seq(16, 16))))
    assert(HDF5.write(big, deflate = true).length < HDF5.write(big, deflate = false).length - 4000)
  }

  test("unsupported filters are rejected loudly, not misread") {
    val chunky = Seq(lesFixture.last.copy(chunkDims = Some(Seq(1, 4, 4))))
    val bytes = HDF5.write(chunky, deflate = true)
    // byte surgery: flip the deflate filter id (1) to an unregistered id
    // (7) in the filter-pipeline message (0x000B, size 24, ver 1, nf 1)
    val pat = Array[Byte](0x0B, 0x00, 24, 0x00, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0)
    val idx = bytes.indices.find(i =>
      i + pat.length <= bytes.length && pat.indices.forall(j => bytes(i + j) == pat(j)))
    assert(idx.isDefined, "filter message not found in written bytes")
    bytes(idx.get + 16) = 7
    val e = intercept[IllegalArgumentException](HDF5.read(bytes))
    assert(e.getMessage.contains("filter id 7"))
  }

  test("future superblock versions are rejected loudly") {
    val v4 = HDF5.write(lesFixture)
    v4(8) = 4 // superblock version (v0/v1/v2/v3 all decode; v4 doesn't exist)
    val e = intercept[IllegalArgumentException](HDF5.read(v4))
    assert(e.getMessage.contains("superblock version 4"))
  }

  test("latest format round-trips: v3 superblock, OHDR, links + OCHK continuation") {
    // 4 datasets: link 1 sits in the root OHDR chunk 0, links 2-4 ride
    // the OCHK continuation block — both paths must decode
    val bytes = HDF5.writeLatest(lesFixture)
    val back = HDF5.read(bytes)
    assert(back.map(_.name).sorted == Seq("lwp", "time", "x", "y"))
    assert(back.find(_.name == "lwp").get.data.toSeq == lesFixture.last.data.toSeq)
    assert(back.find(_.name == "time").get.dims == Seq(3L))
    // single dataset: no continuation block, link inline
    val one = HDF5.writeLatest(Seq(HDF5.DsSpec("v", Seq(2), Array(1.5, -2.5))))
    assert(HDF5.read(one).head.data.toSeq == Seq(1.5, -2.5))
  }

  test("latest format: chunked with shuffle and shuffle+deflate round-trips") {
    val chunky = lesFixture.map {
      case s if s.name == "lwp" => s.copy(chunkDims = Some(Seq(2, 3, 3)))
      case s => s.copy(chunkDims = Some(Seq(2)))
    }
    for ((sh, df) <- Seq((true, false), (false, true), (true, true))) {
      val bytes = HDF5.writeLatest(chunky, deflate = df, shuffle = sh)
      val back = HDF5.read(bytes)
      assert(back.find(_.name == "lwp").get.data.toSeq == lesFixture.last.data.toSeq,
        s"shuffle=$sh deflate=$df")
      assert(back.find(_.name == "y").get.data.toSeq == lesFixture(1).data.toSeq,
        s"shuffle=$sh deflate=$df")
    }
    // shuffle makes smooth float64 fields compress better, which is the
    // whole point of the filter: shuffled+deflate < deflate alone
    val smooth = Seq(HDF5.DsSpec("s", Seq(64, 64),
      Array.tabulate(4096)(i => 1.0 + i * 1e-9), chunkDims = Some(Seq(32, 32))))
    val plainDeflate = HDF5.writeLatest(smooth, deflate = true).length
    val shuffled = HDF5.writeLatest(smooth, deflate = true, shuffle = true).length
    assert(shuffled < plainDeflate, s"shuffle ($shuffled) should beat plain ($plainDeflate)")
  }

  // ------------------------------------------------------- dense groups
  /** A many-variable fixture (the netCDF-4 shape that pushes libhdf5
    * past the compact-group limit into dense storage). */
  private def manyVars(n: Int): Seq[HDF5.DsSpec] =
    (0 until n).map(i =>
      HDF5.DsSpec(f"var$i%02d", Seq(3), Array(i * 1.0, i + 0.5, -i * 0.25)))

  test("dense groups round-trip: root direct block + single-leaf B-tree") {
    val specs = manyVars(12)
    val bytes = HDF5.writeDense(specs)
    val back = HDF5.read(bytes)
    assert(back.map(_.name).sorted == specs.map(_.name).sorted)
    specs.foreach { s =>
      assert(back.find(_.name == s.name).get.data.toSeq == s.data.toSeq, s.name)
    }
    // the root group really is dense: no Link messages decode it; the
    // fractal-heap address in Link Info is defined
    // (indirectly proven: wiping the BTHD signature must break the read)
    val broken = bytes.clone()
    val sigAt = broken.indices.find(i =>
      broken(i) == 'B' && broken(i + 1) == 'T' && broken(i + 2) == 'H' && broken(i + 3) == 'D').get
    broken(sigAt) = 'X'.toByte
    val e = intercept[IllegalArgumentException](HDF5.read(broken))
    assert(e.getMessage.contains("B-tree header signature"))
  }

  test("dense groups round-trip: multi-direct-block indirect root + depth-1 B-tree") {
    val specs = manyVars(17)
    val bytes = HDF5.writeDense(specs, smallBlocks = true)
    // structure really is the deep shape: an FHIB root and >1 leaves
    def count(sig: String): Int = bytes.indices.count(i =>
      i + 4 <= bytes.length && sig.indices.forall(j => bytes(i + j) == sig(j).toByte))
    assert(count("FHIB") == 1, "expected a root indirect block")
    assert(count("FHDB") > 1, "expected several direct blocks")
    assert(count("BTLF") > 1 && count("BTIN") == 1, "expected a depth-1 B-tree")
    val back = HDF5.read(bytes)
    assert(back.map(_.name).sorted == specs.map(_.name).sorted)
    specs.foreach { s =>
      assert(back.find(_.name == s.name).get.data.toSeq == s.data.toSeq, s.name)
    }
  }

  test("dense groups compose with chunked+shuffle+deflate datasets") {
    val specs = manyVars(10).map(_.copy(chunkDims = Some(Seq(2))))
    val bytes = HDF5.writeDense(specs, deflate = true, shuffle = true, smallBlocks = true)
    val back = HDF5.read(bytes)
    specs.foreach { s =>
      assert(back.find(_.name == s.name).get.data.toSeq == s.data.toSeq, s.name)
    }
  }

  // ---------------------------------------------- layout-v4 chunk indexes
  test("layout v4 round-trips: single chunk, implicit, fixed array (both clients)") {
    // one-chunk dataset -> Single Chunk; unfiltered grid -> Implicit;
    // filtered grid -> Fixed Array client 1 — then fixedArrayAlways
    // re-routes everything through Fixed Array incl. client 0
    val specs = Seq(
      HDF5.DsSpec("one", Seq(3, 3), Array.tabulate(9)(_ * 0.5 - 2.0),
        chunkDims = Some(Seq(3, 3))),
      HDF5.DsSpec("grid", Seq(5, 7), Array.tabulate(35)(_ * 0.25),
        chunkDims = Some(Seq(2, 3))), // ragged in both dims
      HDF5.DsSpec("time", Seq(4), Array(0.0, 1.5, 3.0, 4.5),
        chunkDims = Some(Seq(3))))
    for (fixedAlways <- Seq(false, true); (df, sh) <- Seq((false, false), (true, true))) {
      val bytes = HDF5.writeLatestV4(specs, deflate = df, shuffle = sh,
        fixedArrayAlways = fixedAlways)
      val back = HDF5.read(bytes)
      specs.foreach { s =>
        assert(back.find(_.name == s.name).get.data.toSeq == s.data.toSeq,
          s"${s.name} fixedAlways=$fixedAlways deflate=$df shuffle=$sh")
      }
      // structure asserts: the expected index structures are really there
      def has(sig: String): Boolean = bytes.indices.exists(i =>
        i + 4 <= bytes.length && sig.indices.forall(j => bytes(i + j) == sig(j).toByte))
      if (fixedAlways) assert(has("FAHD") && has("FADB"), "expected fixed arrays")
      assert(!has("TREE"), "v4 files must not fall back to the v1 chunk B-tree")
    }
  }

  test("layout v4 chunk dims carry the rank+1 element-size tail on the wire") {
    // libhdf5 encodes v4 chunk dims exactly like v3: rank+1 entries, the
    // last being the datatype size. A shared reader/writer mistake would
    // round-trip invisibly, so pin the bytes: nd = 3 for a rank-2
    // dataset, dims = (2, 2, 8).
    val specs = Seq(HDF5.DsSpec("g", Seq(4, 4), Array.tabulate(16)(_ * 1.0),
      chunkDims = Some(Seq(2, 2))))
    val bytes = HDF5.writeLatestV4(specs)
    val li = bytes.indices.find(i =>
      bytes(i) == 4 && bytes(i + 1) == 2 && bytes(i + 2) == 0).get
    assert(bytes(li + 3) == 3, "nd must be rank+1")
    assert(bytes(li + 4) == 4, "4-byte encoded dims")
    def dim(k: Int): Int =
      java.nio.ByteBuffer.wrap(bytes, li + 5 + 4 * k, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(dim(0) == 2 && dim(1) == 2, "spatial chunk dims")
    assert(dim(2) == 8, "trailing entry is the element size, not a dim")
    // and the reader strips the tail rather than treating it as spatial
    val back = HDF5.read(bytes)
    assert(back.head.data.toSeq == specs.head.data.toSeq)
  }

  test("layout v4 extensible array round-trips: default params (index block + direct data blocks)") {
    // 10-chunk 1-D appended series and a 35-chunk 2-D grid: with libhdf5
    // defaults (4 iblock elements, 16-element min data blocks) both stay
    // inside the index block + directly-addressed data blocks
    val specs = Seq(
      HDF5.DsSpec("time_series", Seq(40), Array.tabulate(40)(_ * 0.25),
        chunkDims = Some(Seq(4))),
      HDF5.DsSpec("grid", Seq(10, 14), Array.tabulate(140)(_ * 0.5 - 30.0),
        chunkDims = Some(Seq(2, 2))))
    for ((df, sh) <- Seq((false, false), (true, false), (true, true))) {
      val bytes = HDF5.writeUnlimited(specs, deflate = df, shuffle = sh)
      val back = HDF5.read(bytes)
      specs.foreach { s =>
        assert(back.find(_.name == s.name).get.data.toSeq == s.data.toSeq,
          s"${s.name} deflate=$df shuffle=$sh")
      }
      def has(sig: String): Boolean = bytes.indices.exists(i =>
        i + 4 <= bytes.length && sig.indices.forall(j => bytes(i + j) == sig(j).toByte))
      assert(has("EAHD") && has("EAIB") && has("EADB"), "expected extensible-array blocks")
      assert(!has("EASB"), "defaults must not need super blocks at this scale")
      assert(!has("TREE") && !has("FAHD"), "no other chunk index may appear")
    }
  }

  test("layout v4 extensible array round-trips through on-disk super blocks") {
    // small creation parameters (1 iblock element, 2-element min blocks,
    // 2 min pointers) push a 35-chunk grid into EASB super-block rows
    val ea = HDF5.EaParams(maxBits = 16, iblkElmts = 1, minPtrs = 2,
      minElmts = 2, pageBits = 10)
    val specs = Seq(HDF5.DsSpec("grid", Seq(10, 14),
      Array.tabulate(140)(i => math.sin(i * 0.1) * 10), chunkDims = Some(Seq(2, 2))))
    for ((df, sh) <- Seq((false, false), (true, true))) {
      val bytes = HDF5.writeUnlimited(specs, deflate = df, shuffle = sh, ea = ea)
      val back = HDF5.read(bytes)
      assert(back.head.data.toSeq == specs.head.data.toSeq, s"deflate=$df shuffle=$sh")
      def count(sig: String): Int = bytes.indices.count(i =>
        i + 4 <= bytes.length && sig.indices.forall(j => bytes(i + j) == sig(j).toByte))
      assert(count("EASB") >= 2, "expected several super blocks")
      assert(count("EADB") >= 4, "expected several data blocks")
    }
  }

  test("layout v4 extensible array round-trips with PAGED data blocks") {
    // pageBits=2 (4-element pages) with 2-element min blocks: row 3's
    // 8-element data blocks split into 2 checksummed pages, and row 3's
    // super block carries the page-init bitmap — while rows 0-2 stay
    // unpaged, so the mixed geometry is exercised in ONE file. 36 chunks
    // reach one data block into paged row 4 as well.
    val ea = HDF5.EaParams(maxBits = 16, iblkElmts = 4, minPtrs = 2,
      minElmts = 2, pageBits = 2)
    assert(!ea.dblkPaged(2) && ea.dblkPaged(3) && ea.dblkPaged(4))
    val specs = Seq(HDF5.DsSpec("t", Seq(72), Array.tabulate(72)(_ * 0.125 - 4.5),
      chunkDims = Some(Seq(2))))
    for ((df, sh) <- Seq((false, false), (true, true))) {
      val bytes = HDF5.writeUnlimited(specs, deflate = df, shuffle = sh, ea = ea)
      val back = HDF5.read(bytes)
      assert(back.head.data.toSeq == specs.head.data.toSeq, s"deflate=$df shuffle=$sh")
      def count(sig: String): Int = bytes.indices.count(i =>
        i + 4 <= bytes.length && sig.indices.forall(j => bytes(i + j) == sig(j).toByte))
      assert(count("EASB") >= 2 && count("EADB") >= 5,
        "expected super blocks and data blocks")
    }
  }

  test("PAGED extensible array at libhdf5-DEFAULT geometry (the real appended-series shape)") {
    // with the library defaults (16-element min blocks, 1024-element
    // pages) paging first occurs in row 13 — past 131,060 chunks, i.e. a
    // genuinely long appended time series. Write one: 131,600 single-
    // element chunks; the tail data block holds 2048 elements = 2 pages.
    val p = HDF5.EaParams()
    assert(!p.dblkPaged(12) && p.dblkPaged(13), "defaults page first in row 13")
    val n = 131600
    val specs = Seq(HDF5.DsSpec("t", Seq(n),
      Array.tabulate(n)(i => (i % 977).toDouble), chunkDims = Some(Seq(1))))
    val bytes = HDF5.writeUnlimited(specs)
    val back = HDF5.read(bytes)
    assert(back.head.dims == Seq(n.toLong))
    assert((0 until n).forall(i => back.head.data(i) == (i % 977).toDouble),
      "paged tail row must decode value-exact")
  }

  test("extensible array rejects loudly: unallocated chunks") {
    val specs = Seq(HDF5.DsSpec("t", Seq(40), Array.tabulate(40)(_ * 1.0),
      chunkDims = Some(Seq(2))))
    val bytes = HDF5.writeUnlimited(specs)
    // zap a data-block address slot in the index block -> unallocated chunk
    val ib = bytes.indices.find(i =>
      bytes(i) == 'E' && bytes(i + 1) == 'A' && bytes(i + 2) == 'I' && bytes(i + 3) == 'B').get
    val unalloc = bytes.clone()
    // sig4 ver1 client1 hdr8 + 4 elements x 8 -> first direct dblk addr
    val slot = ib + 6 + 8 + 4 * 8
    (0 until 8).foreach(j => unalloc(slot + j) = 0xff.toByte)
    val e2 = intercept[IllegalArgumentException](HDF5.read(unalloc))
    assert(e2.getMessage.contains("unallocated"))
  }

  test("layout v4 version-2 B-tree chunk index round-trips (>1 unlimited dims)") {
    // the index libhdf5 picks when more than one dimension is unlimited:
    // record type 10 (plain) / 11 (filtered), single-leaf tree at the
    // default node size
    val specs = Seq(
      HDF5.DsSpec("grid", Seq(10, 14), Array.tabulate(140)(_ * 0.5 - 30.0),
        chunkDims = Some(Seq(2, 2))),
      HDF5.DsSpec("cube", Seq(4, 6, 6), Array.tabulate(144)(i => math.cos(i * 0.2)),
        chunkDims = Some(Seq(2, 3, 2))),
      HDF5.DsSpec("plain", Seq(6), Array.tabulate(6)(_ * 2.0)))
    for ((df, sh) <- Seq((false, false), (true, false), (true, true))) {
      val bytes = HDF5.writeBtree2(specs, deflate = df, shuffle = sh)
      val back = HDF5.read(bytes)
      specs.foreach { s =>
        assert(back.find(_.name == s.name).get.data.toSeq == s.data.toSeq,
          s"${s.name} deflate=$df shuffle=$sh")
      }
      def has(sig: String): Boolean = bytes.indices.exists(i =>
        i + 4 <= bytes.length && sig.indices.forall(j => bytes(i + j) == sig(j).toByte))
      assert(has("BTHD") && has("BTLF"), "expected v2 B-tree blocks")
      assert(!has("BTIN"), "default node size must fit one leaf")
      assert(!has("TREE") && !has("FAHD") && !has("EAHD"),
        "no other chunk index may appear")
    }
  }

  test("v2 B-tree chunk index round-trips at depth 1 (BTIN root + leaves)") {
    // a 256-byte node caps a 24-byte rank-2 record at 10 per leaf: the
    // 35-chunk grid forces an internal root with interleaved separator
    // records — the reader walks children and root records
    val specs = Seq(HDF5.DsSpec("grid", Seq(10, 14),
      Array.tabulate(140)(i => math.sin(i * 0.1) * 10), chunkDims = Some(Seq(2, 2))))
    for ((df, sh) <- Seq((false, false), (true, true))) {
      val bytes = HDF5.writeBtree2(specs, deflate = df, shuffle = sh, nodeSize = 256)
      val back = HDF5.read(bytes)
      assert(back.head.data.toSeq == specs.head.data.toSeq, s"deflate=$df shuffle=$sh")
      def count(sig: String): Int = bytes.indices.count(i =>
        i + 4 <= bytes.length && sig.indices.forall(j => bytes(i + j) == sig(j).toByte))
      assert(count("BTIN") == 1, "expected an internal root")
      assert(count("BTLF") >= 4, "expected several leaves")
    }
  }

  test("v2 B-tree chunk index rejects loudly: bad record type, missing chunks") {
    val specs = Seq(HDF5.DsSpec("g", Seq(4, 4), Array.tabulate(16)(_ * 1.0),
      chunkDims = Some(Seq(2, 2))))
    val bytes = HDF5.writeBtree2(specs)
    def bthdAt(bs: Array[Byte]): Int = bs.indices.find(i =>
      bs(i) == 'B' && bs(i + 1) == 'T' && bs(i + 2) == 'H' && bs(i + 3) == 'D').get
    // record type 10 on a filtered pipeline (or anything unexpected) rejects
    val wrongType = bytes.clone(); wrongType(bthdAt(bytes) + 5) = 7
    val e1 = intercept[IllegalArgumentException](HDF5.read(wrongType))
    assert(e1.getMessage.contains("record type"))
    // total-record count below the chunk grid rejects (fill-value read)
    // BTHD: sig4 ver1 type1 nodeSize4 recSize2 depth2 split1 merge1 addr8 rootN2 -> total8
    val short = bytes.clone()
    val totOff = bthdAt(bytes) + 4 + 1 + 1 + 4 + 2 + 2 + 1 + 1 + 8 + 2
    short(totOff) = 1 // 4 chunks -> 1
    val e2 = intercept[IllegalArgumentException](HDF5.read(short))
    assert(e2.getMessage.contains("grid has"))
  }

  test("v1 chunk B-tree round-trips at depth 2 (root + internals + leaves)") {
    // 35 chunks with a 4-entry node cap: 9 leaves, 3 internal nodes, one
    // level-2 root — the many-chunk raster shape; reader recursion is
    // exercised beyond the single-node tree
    val specs = Seq(
      HDF5.DsSpec("raster", Seq(10, 14), Array.tabulate(140)(_ * 0.125),
        chunkDims = Some(Seq(2, 2))),
      HDF5.DsSpec("plain", Seq(6), Array.tabulate(6)(_ * 2.0)))
    for ((df, sh) <- Seq((false, false), (true, true))) {
      val bytes = HDF5.writeLatest(specs, deflate = df, shuffle = sh, btreeLeafCap = 4)
      val back = HDF5.read(bytes)
      specs.foreach { s =>
        assert(back.find(_.name == s.name).get.data.toSeq == s.data.toSeq,
          s"${s.name} deflate=$df shuffle=$sh")
      }
      def sigsAt(sig: String): Seq[Int] = bytes.indices.filter(i =>
        i + 4 <= bytes.length && sig.indices.forall(j => bytes(i + j) == sig(j).toByte))
      val trees = sigsAt("TREE")
      assert(trees.size == 13, s"expected 13 B-tree nodes, found ${trees.size}")
      // node level bytes: one root at level 2, three internals, nine leaves
      val levels = trees.map(a => bytes(a + 5).toInt).groupBy(identity)
        .view.mapValues(_.size).toMap
      assert(levels == Map(2 -> 1, 1 -> 3, 0 -> 9), s"levels: $levels")
    }
  }

  test("layout v4 rejects loudly: unknown index types") {
    val specs = Seq(HDF5.DsSpec("g", Seq(4, 4), Array.tabulate(16)(_ * 1.0),
      chunkDims = Some(Seq(2, 2))))
    val bytes = HDF5.writeLatestV4(specs, fixedArrayAlways = true)
    // index type 4 (extensible array) — the byte right before the page
    // bits; find it via the layout message: version 4, class 2 marker
    // (nd = rank+1 = 3: the dims carry the v3-style element-size tail)
    val li = bytes.indices.find(i =>
      bytes(i) == 4 && bytes(i + 1) == 2 && bytes(i + 2) == 0 && bytes(i + 3) == 3
        && bytes(i + 4) == 4).get
    // msg body: ver(4) cls(2) flags(0) nd(3) encLen(4) dims(3x4B) idxType
    val idxTypeAt = li + 5 + 12
    assert(bytes(idxTypeAt) == 3, "fixture sanity: expected the fixed-array type byte")
    val ext = bytes.clone(); ext(idxTypeAt) = 6
    val e1 = intercept[IllegalArgumentException](HDF5.read(ext))
    assert(e1.getMessage.contains("index type 6"))
  }

  test("paged fixed array round-trips; unallocated pages reject loudly") {
    // pageBits=3 over 35 chunks: 5 pages (8+8+8+8+3), page bitmap + one
    // checksum per page on the wire
    val specs = Seq(HDF5.DsSpec("grid", Seq(10, 14),
      Array.tabulate(140)(i => (i * 11 % 37) * 0.5 - 9.0), chunkDims = Some(Seq(2, 2))))
    for ((df, sh) <- Seq((false, false), (true, true))) {
      val bytes = HDF5.writeLatestV4(specs, deflate = df, shuffle = sh,
        fixedArrayAlways = true, faPageBits = 3)
      val back = HDF5.read(bytes)
      assert(back.head.data.toSeq == specs.head.data.toSeq, s"deflate=$df shuffle=$sh")
    }
    // clear page-bitmap bit 2 -> a clean unallocated-page reject, not a
    // silent fill-value misread
    val bytes = HDF5.writeLatestV4(specs, fixedArrayAlways = true, faPageBits = 3)
    val db = bytes.indices.find(i =>
      bytes(i) == 'F' && bytes(i + 1) == 'A' && bytes(i + 2) == 'D' && bytes(i + 3) == 'B').get
    val holed = bytes.clone()
    holed(db + 14) = (holed(db + 14) & ~(1 << 2)).toByte // sig4 ver1 client1 hdr8 -> bitmap
    val e = intercept[IllegalArgumentException](HDF5.read(holed))
    assert(e.getMessage.contains("page 2 unallocated"))
  }

  test("dense-group leftovers are rejected loudly: huge ids, lying depth fields") {
    val bytes = HDF5.writeDense(manyVars(12))
    // huge-object heap id: set the type bits (4-5) of the first record's
    // heap id flags byte inside the BTLF leaf
    val leafAt = bytes.indices.find(i =>
      bytes(i) == 'B' && bytes(i + 1) == 'T' && bytes(i + 2) == 'L' && bytes(i + 3) == 'F').get
    val huge = bytes.clone()
    huge(leafAt + 6 + 4) = 0x10.toByte // skip sig+ver+type, then 4-byte hash
    // a huge id in a heap that declares no huge-object B-tree is corrupt
    val e1 = intercept[IllegalArgumentException](HDF5.read(huge))
    assert(e1.getMessage.contains("no huge-object B-tree"))
    // a LYING depth field (any depth now decodes, but the node kinds must
    // match it): depth=2 over a leaf root walks into BTLF expecting BTIN
    val bthdAt = bytes.indices.find(i =>
      bytes(i) == 'B' && bytes(i + 1) == 'T' && bytes(i + 2) == 'H' && bytes(i + 3) == 'D').get
    val deep = bytes.clone()
    deep(bthdAt + 12) = 2 // BTHD depth field (sig4+ver1+type1+nodeSize4+recSize2)
    val e2 = intercept[IllegalArgumentException](HDF5.read(deep))
    assert(e2.getMessage.contains("BTIN"))
  }

  /** BTHD depth field of the FIRST v2 B-tree in the file. */
  private def bthdDepth(bytes: Array[Byte]): Int = {
    val at = bytes.indices.find(i =>
      bytes(i) == 'B' && bytes(i + 1) == 'T' && bytes(i + 2) == 'H' && bytes(i + 3) == 'D').get
    (bytes(at + 12) & 0xff) | ((bytes(at + 13) & 0xff) << 8)
  }

  test("dense groups round-trip at link B-tree DEPTH 2 (BTIN over BTIN over leaves)") {
    // smallBlocks: 76-byte nodes (leaf cap 6, depth-1 capacity 20) —
    // 30 links force a depth-2 tree while the heap stays within the
    // direct rows
    val specs = manyVars(30)
    val bytes = HDF5.writeDense(specs, smallBlocks = true)
    assert(bthdDepth(bytes) == 2, "fixture did not force a depth-2 link B-tree")
    val back = HDF5.read(bytes).map(d => d.name -> d.data.toSeq).toMap
    assert(back == specs.map(s => s.name -> s.data.toSeq).toMap)
  }

  test("v2 B-tree chunk index round-trips at depth 2 and depth 3") {
    // nodeSize 128, unfiltered rank-2 records (24 B): leaf cap 4,
    // depth-1 capacity 19, depth-2 capacity 79, depth-3 capacity 319
    val d2 = HDF5.DsSpec("z", Seq(12, 8),
      Array.tabulate(96)(i => i * 0.25 - 5.0), chunkDims = Some(Seq(2, 2)))
    val b2 = HDF5.writeBtree2(Seq(d2), nodeSize = 128) // 24 chunks
    assert(bthdDepth(b2) == 2, "24 chunks at nodeSize 128 must need depth 2")
    assert(HDF5.read(b2).head.data.toSeq == d2.data.toSeq)
    // filtered variant (records 29 B: +size+mask): depth-1 capacity 14
    val b2f = HDF5.writeBtree2(Seq(d2), deflate = true, shuffle = true, nodeSize = 128)
    assert(bthdDepth(b2f) == 2)
    assert(HDF5.read(b2f).head.data.toSeq == d2.data.toSeq)
    val d3 = HDF5.DsSpec("w", Seq(20, 20),
      Array.tabulate(400)(i => (i * 7 % 101) * 0.125), chunkDims = Some(Seq(2, 2)))
    val b3 = HDF5.writeBtree2(Seq(d3), nodeSize = 128) // 100 chunks
    assert(bthdDepth(b3) == 3, "100 chunks at nodeSize 128 must need depth 3")
    assert(HDF5.read(b3).head.data.toSeq == d3.data.toSeq)
  }

  test("fractal heap INDIRECT CHILD blocks round-trip (80 links past the direct rows)") {
    // smallBlocks geometry: start 64, maxDirect 128, W 4 -> the direct
    // rows hold 1,024 heap bytes; 80 links (~14 B bodies each) spill
    // into root row 3, whose entries are CHILD indirect blocks of four
    // 64-byte direct blocks each. 80 links also push the name index to
    // B-tree depth 3 — both deep shapes in one file.
    val specs = manyVars(80)
    val bytes = HDF5.writeDense(specs, smallBlocks = true)
    assert(bthdDepth(bytes) == 3, "80 links at 76-byte nodes must need depth 3")
    // more FHIB signatures than the root alone = child indirect blocks
    val nFhib = bytes.indices.count(i =>
      bytes(i) == 'F' && bytes(i + 1) == 'H' && bytes(i + 2) == 'I' && bytes(i + 3) == 'B')
    assert(nFhib >= 2, s"expected child indirect blocks, found $nFhib FHIB")
    val back = HDF5.read(bytes).map(d => d.name -> d.data.toSeq).toMap
    assert(back == specs.map(s => s.name -> s.data.toSeq).toMap)
  }

  test("fletcher32 round-trips through every writer generation and pipeline") {
    val ds = HDF5.DsSpec("q", Seq(11), Array.tabulate(11)(_ * 1.25 - 3.0),
      chunkDims = Some(Seq(4)))
    for {
      (df, sh) <- Seq((false, false), (true, false), (true, true))
      bytes <- Seq(
        HDF5.writeLatest(Seq(ds), deflate = df, shuffle = sh, fletcher = true),
        HDF5.writeLatestV4(Seq(ds), deflate = df, shuffle = sh, fletcher = true))
    } {
      val back = HDF5.read(bytes).head
      assert(back.data.toSeq == ds.data.toSeq, s"deflate=$df shuffle=$sh")
    }
  }

  test("fletcher32 catches a flipped chunk byte loudly (unfiltered-otherwise)") {
    val ds = HDF5.DsSpec("q", Seq(6), Array.tabulate(6)(_ + 0.5),
      chunkDims = Some(Seq(3)))
    val bytes = HDF5.writeLatest(Seq(ds), fletcher = true)
    assert(HDF5.read(bytes).head.data.toSeq == ds.data.toSeq)
    // locate the LE double 0.5 (first chunk payload, stored raw) and flip a bit
    val probe = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(0.5).array()
    val at = (0 until bytes.length - 8).find(i =>
      probe.indices.forall(j => bytes(i + j) == probe(j))).get
    val bad = bytes.clone(); bad(at + 2) = (bad(at + 2) ^ 0x01).toByte
    val ex = intercept[IllegalArgumentException](HDF5.read(bad))
    assert(ex.getMessage.contains("fletcher32 mismatch"))
  }

  test("fletcher32 chunks decode through the chunk-parallel manifest too") {
    val ds = HDF5.DsSpec("q", Seq(9), Array.tabulate(9)(_ * 2.0),
      chunkDims = Some(Seq(4)))
    val bytes = HDF5.writeLatest(Seq(ds), deflate = true, shuffle = true, fletcher = true)
    val (v, refs) = HDF5.manifest(new ArrayInput(bytes)).head
    assert(v.filters.map(_.id) == Seq(3, 2, 1))
    val got = refs.flatMap { r =>
      val raw = java.util.Arrays.copyOfRange(bytes, r.offset.toInt, (r.offset + r.nbytes).toInt)
      HDF5.decodeChunk(raw, v, r.origin)
    }.toMap
    assert((0 until 9).map(i => got(i.toLong)) == ds.data.toSeq)
  }

  test("nbit and scale-offset chunks decode through the chunk-parallel manifest too") {
    // same golden as ForeignFixturesSpec, but via manifest + decodeChunk —
    // the executor-side path that threads signedInt through ChunkTask
    val in = getClass.getResourceAsStream("/fixtures/golden_nbit_so.h5")
    require(in != null, "golden_nbit_so.h5 missing — run tools/make_fixtures.py")
    val bytes = try in.readAllBytes() finally in.close()
    val vars = HDF5.manifest(new ArrayInput(bytes)).toMap
    def decode(name: String): Seq[Double] = {
      val v = vars.keys.find(_.name == name).get
      val got = vars(v).flatMap { r =>
        val raw = java.util.Arrays.copyOfRange(bytes, r.offset.toInt, (r.offset + r.nbytes).toInt)
        HDF5.decodeChunk(raw, v, r.origin)
      }.toMap
      (0 until v.dims.head.toInt).map(i => got(i.toLong))
    }
    assert(!vars.keys.find(_.name == "nbu").get.signedInt)
    assert(decode("nbi") == (0 until 40).map(k => (((k * 37) % 4000) - 2000).toDouble))
    assert(decode("nbu") == (0 until 16).map(k => ((k * 29) % 512).toDouble))
    assert(decode("soi") == (0 until 48).map(k =>
      if (k % 11 == 0) -9999.0 else (((k * 53) % 1000) - 500).toDouble))
    assert(decode("sod") == (0 until 24).map(k =>
      if (k % 7 == 0) 1e30 else k * 0.125 - 1.0))
  }

  test("scale-offset D-scale write round-trips: quantized, ragged, constant, raw fallback, +deflate") {
    // quantized at D=3 -> lossless; ragged chunk pads ride as 0.0 and clip
    val q = HDF5.DsSpec("q", Seq(4, 6), Array.tabulate(24)(_ * 0.125 - 1.0),
      chunkDims = Some(Seq(2, 3)))
    val r = HDF5.DsSpec("r", Seq(5), Array.tabulate(5)(_ * 0.25 + 1.0),
      chunkDims = Some(Seq(3)))
    val c = HDF5.DsSpec("c", Seq(10), Array.fill(10)(2.5), chunkDims = Some(Seq(5)))
    // span * 10^3 needs > 53 bits -> lossless raw full-precision fallback
    val w = HDF5.DsSpec("w", Seq(4), Array(0.0, 1e15, -1e15, 0.1234567),
      chunkDims = Some(Seq(4)))
    val bytes = HDF5.write(Seq(q, c, r, w), scaleOffsetD = Some(3))
    val back = HDF5.read(bytes).map(d => d.name -> d.data.toSeq).toMap
    assert(back("q") == q.data.toSeq)
    assert(back("r") == r.data.toSeq)
    assert(back("c") == c.data.toSeq)
    assert(back("w") == w.data.toSeq)
    // scale-offset THEN deflate (the libhdf5 plist order), manifest too
    val bytes2 = HDF5.write(Seq(q), deflate = true, scaleOffsetD = Some(3))
    assert(HDF5.read(bytes2).head.data.toSeq == q.data.toSeq)
    val (v, refs) = HDF5.manifest(new ArrayInput(bytes2)).head
    assert(v.filters.map(_.id) == Seq(6, 1))
    val got = refs.flatMap { ref =>
      val raw = java.util.Arrays.copyOfRange(bytes2, ref.offset.toInt,
        (ref.offset + ref.nbytes).toInt)
      HDF5.decodeChunk(raw, v, ref.origin)
    }.toMap
    assert((0 until 24).map(i => got(i.toLong)) == q.data.toSeq)
    // the documented LOSSY behavior: unquantized values round to D decimals
    val l = HDF5.DsSpec("l", Seq(2), Array(0.1234567, 0.7654321),
      chunkDims = Some(Seq(2)))
    val lv = HDF5.read(HDF5.write(Seq(l), scaleOffsetD = Some(3))).head.data
    val mn = 0.1234567
    assert(lv(0) == mn)
    assert(lv(1) == math.round(0.7654321 * 1e3 - mn * 1e3) / 1e3 + mn)
  }

  test("unsigned 64-bit values above 2^63 keep their unsigned magnitude") {
    // a signed read would flip these negative; magnitude above 2^53 is
    // lossy in Double either way, but the sign must survive
    val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(7L).putLong(java.lang.Long.MIN_VALUE + 5)
    val v = HDF5.H5Var("u", Seq(2L), Seq(2), dtClass = 0, dtSize = 8,
      bigEndian = false, filters = Nil, signedInt = false)
    val got = HDF5.decodeChunk(bb.array(), v, Seq(0L)).toMap
    assert(got(0L) == 7.0)
    assert(got(1L) == 9.223372036854775808e18)
    val signed = v.copy(signedInt = true)
    assert(HDF5.decodeChunk(bb.array(), signed, Seq(0L)).toMap.apply(1L) < 0)
  }

  test("lying nelmts in nbit/scale-offset client data rejects before allocating") {
    val in = getClass.getResourceAsStream("/fixtures/golden_nbit_so.h5")
    require(in != null, "golden_nbit_so.h5 missing — run tools/make_fixtures.py")
    val orig = try in.readAllBytes() finally in.close()
    def find(pat: Array[Byte], bytes: Array[Byte]): Int =
      bytes.indices.find(i => i + pat.length <= bytes.length &&
        pat.indices.forall(j => bytes(i + j) == pat(j)))
        .getOrElse(fail("filter record not found"))
    // nbi's nbit record: id 5, nvals 8, cd = [8, 0, 20, 1, ...]; bump
    // nelmts (cd word 2) to 2^31-1 — must fail on the stream bound,
    // not attempt an 8 GB array
    val b1 = orig.clone()
    val p1 = find(Array[Byte](5, 0, 0, 0, 1, 0, 8, 0, 8, 0, 0, 0, 0, 0, 0, 0,
      20, 0, 0, 0), b1)
    b1(p1 + 16) = 0xff.toByte; b1(p1 + 17) = 0xff.toByte
    b1(p1 + 18) = 0xff.toByte; b1(p1 + 19) = 0x7f.toByte
    val e1 = intercept[IllegalArgumentException](HDF5.read(b1))
    assert(e1.getMessage.contains("nbit stream holds fewer"))
    // soc's scale-offset record: id 6, nvals 10, cd = [2, 0, 16, ...];
    // its chunk is header-only (minbits 0), so only the sane-cap guard
    // can stop a lying count
    val b2 = orig.clone()
    val p2 = find(Array[Byte](6, 0, 0, 0, 1, 0, 10, 0, 2, 0, 0, 0, 0, 0, 0, 0,
      16, 0, 0, 0), b2)
    b2(p2 + 16) = 0xff.toByte; b2(p2 + 17) = 0xff.toByte
    b2(p2 + 18) = 0xff.toByte; b2(p2 + 19) = 0x7f.toByte
    val e2 = intercept[IllegalArgumentException](HDF5.read(b2))
    assert(e2.getMessage.contains("cannot hold"))
  }

  test("scale-offset chunks with an unexpected minval width are rejected loudly") {
    val in = getClass.getResourceAsStream("/fixtures/golden_nbit_so.h5")
    require(in != null, "golden_nbit_so.h5 missing — run tools/make_fixtures.py")
    val bytes = try in.readAllBytes() finally in.close()
    // soc's chunk is its 13-byte header alone: minbits=0 u32, width 8,
    // minval 42 u64 LE — a unique byte pattern; flip the width to 4
    val pat = Array[Byte](0, 0, 0, 0, 8, 42, 0, 0, 0, 0, 0, 0, 0)
    val idx = bytes.indices.find(i =>
      i + pat.length <= bytes.length && pat.indices.forall(j => bytes(i + j) == pat(j)))
    assert(idx.isDefined, "soc scale-offset header not found in fixture bytes")
    bytes(idx.get + 4) = 4
    val e = intercept[IllegalArgumentException](HDF5.read(bytes))
    assert(e.getMessage.contains("minval width 4"))
  }

  test("depth-2 chunk index decodes through the chunk-parallel manifest too") {
    val d2 = HDF5.DsSpec("z", Seq(12, 8),
      Array.tabulate(96)(i => i * 0.25 - 5.0), chunkDims = Some(Seq(2, 2)))
    val bytes = HDF5.writeBtree2(Seq(d2), deflate = true, shuffle = true, nodeSize = 128)
    val (v, refs) = HDF5.manifest(new ArrayInput(bytes)).head
    assert(refs.size == 24)
    val got = refs.flatMap { r =>
      val raw = java.util.Arrays.copyOfRange(bytes, r.offset.toInt, (r.offset + r.nbytes).toInt)
      HDF5.decodeChunk(raw, v, r.origin)
    }.toMap
    assert((0 until 96).map(i => got(i.toLong)) == d2.data.toSeq)
  }
}
