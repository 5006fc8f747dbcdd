package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Randomized foreign-fixture sweep: 36 seeded python-written HDF5 files
  * (tools/make_fixtures.py `write_hdf5_fuzz`) covering the v0-generation
  * parameter space — rank 1-3, both byte orders, f32/f64/i32/i64,
  * compact/contiguous/chunked layouts, random chunk geometry including
  * edge chunks, and every filter pipeline combination (deflate,
  * shuffle+deflate, fletcher32 alone, fletcher32+shuffle+deflate —
  * including the esize-4 case where the checksum divides the element
  * size and rides the shuffle as one more element).
  *
  * Expected values come from `manifest.txt`, written by the generator
  * alongside the files — the Scala side shares no generation code, so a
  * decode bug can't be mirrored into the expectation. */
class HDF5FuzzSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/fuzz/$name")
    require(in != null, s"fixture fuzz/$name missing — run tools/make_fixtures.py")
    try in.readAllBytes() finally in.close()
  }

  private case class Case(name: String, gen: String, dt: String,
      order: String, layout: String, filt: String, dims: Seq[Long],
      vals: Seq[Double])

  private lazy val cases: Seq[Case] =
    new String(resource("manifest.txt"), "UTF-8").linesIterator.map { line =>
      val f = line.split(";", -1)
      val vals =
        if (f(2).startsWith("f")) f(8).split(",").toSeq.map(_.toDouble)
        // integers parse as Long first: the reader widens i64 to double
        // with the same nearest rounding, so equality stays exact
        else f(8).split(",").toSeq.map(_.toLong.toDouble)
      Case(f(0), f(1), f(2), f(3), f(4), f(5),
        f(6).split(",").toSeq.map(_.toLong), vals)
    }.toSeq

  test("manifest covers the intended parameter space") {
    assert(cases.size == 60)
    assert(cases.map(_.gen).distinct.sorted == Seq("v0", "v2"))
    assert(cases.map(_.dt).distinct.size == 4)
    assert(cases.map(_.order).distinct.sorted == Seq("be", "le"))
    assert(cases.map(_.layout).distinct.sorted ==
      Seq("chunked", "compact", "contig"))
    assert(Set("deflate", "shufdef", "flet", "fletshufdef")
      .subsetOf(cases.map(_.filt).toSet))
    // the OHDR generation must exercise filtered chunked storage too
    assert(cases.exists(c => c.gen == "v2" && c.filt != "none"))
    // nbit / scale-offset ride the sweep under both generations
    assert(cases.exists(c => c.gen == "v0" && c.filt.startsWith("nbit:")))
    assert(cases.exists(c => c.gen == "v2" && c.filt.startsWith("nbit:")))
    assert(cases.exists(c => c.gen == "v2" && c.filt == "soint"))
    assert(cases.count(c => c.filt == "soint" || c.filt.startsWith("sofd:")) >= 5)
    assert(cases.map(_.dims.size).distinct.sorted == Seq(1, 2, 3))
  }

  for (c <- cases) {
    test(s"${c.name}: ${c.gen}/${c.dt}/${c.order}/${c.layout}/${c.filt} " +
        s"dims=${c.dims.mkString("x")} decodes exactly") {
      val dss = HDF5.read(resource(s"${c.name}.h5"))
      assert(dss.map(_.name) == Seq("data"))
      val ds = dss.head
      assert(ds.dims == c.dims)
      assert(ds.data.toSeq == c.vals)
    }
  }

  test("chunk-parallel manifest path reassembles every chunked fuzz file") {
    // The q129 two-phase shape against FOREIGN bytes: enumerate chunks
    // from metadata only, decode each independently from its byte range,
    // and reassemble — must equal the whole-file read on all 24 chunked
    // cases (every filter pipeline, both byte orders, all dtypes).
    val chunked = cases.filter(_.layout == "chunked")
    assert(chunked.size >= 20)
    for (c <- chunked) {
      val path = s"src/test/resources/fixtures/fuzz/${c.name}.h5"
      val in = new PagedFileInput(path)
      val out = try {
        val ms = HDF5.manifest(in)
        assert(ms.map(_._1.name) == Seq("data"))
        val (v, refs) = ms.head
        val raf = new java.io.RandomAccessFile(path, "r")
        try refs.flatMap { r =>
          val raw = new Array[Byte](r.nbytes.toInt)
          raf.seek(r.offset)
          raf.readFully(raw)
          HDF5.decodeChunk(raw, v, r.origin)
        } finally raf.close()
      } finally in.close()
      val got = out.sortBy(_._1).map(_._2)
      assert(got == c.vals, s"${c.name}: chunk-parallel != manifest values")
    }
  }
}
