package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pure arithmetic of the shared DSv2 shell: idx-range folding, box
  * bounds, and the read-request coalescing plan (the plan IS the
  * request count, so asserting it here pins the object-store GET
  * arithmetic without runtime instrumentation). */
class MountDsv2Spec extends AnyFunSuite {

  import MountDsv2._

  test("coalesceWindows merges back-to-back windows into one span") {
    // 10 contiguous 1 KiB windows -> ONE read
    val w = IndexedSeq.tabulate(10)(i => (i * 1024L, 1024L))
    assert(coalesceWindows(w) == Seq(0 until 10))
  }

  test("coalesceWindows splits on gap, span cap, and regression") {
    // gap: 2 windows 1 MiB apart with a 64 KiB gap cap
    val gapped = IndexedSeq((0L, 100L), (1L << 20, 100L))
    assert(coalesceWindows(gapped) == Seq(0 until 1, 1 until 2))
    // a small gap (<= cap) still merges, reading the junk between
    val small = IndexedSeq((0L, 100L), (100L + 1024, 100L))
    assert(coalesceWindows(small) == Seq(0 until 2))
    // span cap: 3 x 4 MiB adjacent windows under an 8 MiB cap -> 2+1
    val m4 = 4L << 20
    val big = IndexedSeq((0L, m4), (m4, m4), (2 * m4, m4))
    assert(coalesceWindows(big) == Seq(0 until 2, 2 until 3))
    // regression/overlap starts a new group (defensive)
    val regress = IndexedSeq((1000L, 100L), (500L, 100L), (600L, 100L))
    assert(coalesceWindows(regress) == Seq(0 until 1, 1 until 3))
    val overlap = IndexedSeq((0L, 100L), (50L, 100L))
    assert(coalesceWindows(overlap) == Seq(0 until 1, 1 until 2))
  }

  test("coalesceWindows edges: empty, single, zero-length, negatives reject") {
    assert(coalesceWindows(IndexedSeq.empty) == Seq.empty)
    assert(coalesceWindows(IndexedSeq((7L, 3L))) == Seq(0 until 1))
    assert(coalesceWindows(IndexedSeq((0L, 0L), (0L, 5L))) == Seq(0 until 2))
    intercept[IllegalArgumentException](coalesceWindows(IndexedSeq((-1L, 5L))))
    intercept[IllegalArgumentException](coalesceWindows(IndexedSeq((0L, -5L))))
  }

  test("coalesceWindows at the production scale: one shard of inner chunks " +
      "is ONE request") {
    // 512 back-to-back gzip'd inner chunks of ~2 KiB (a 1 MiB shard)
    // -> 1 span; with per-chunk reads that is 512 GETs on s3a
    var off = 0L
    val w = IndexedSeq.fill(512) { val x = (off, 2048L); off += 2048; x }
    assert(coalesceWindows(w).size == 1)
  }

  test("coalesceWindows properties: partition cover, caps, exact slicing " +
      "(200 random window sets)") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(40)
      // sorted-but-sometimes-regressing windows, sizes 0..64 KiB
      var off = 0L
      val w = IndexedSeq.fill(n) {
        off += rnd.nextInt(200000).toLong - 20000 // occasional regression
        if (off < 0) off = 0
        val x = (off, rnd.nextInt(1 << 16).toLong)
        off += x._2
        x
      }
      val maxGap = 1L << (10 + rnd.nextInt(8))
      val maxSpan = 1L << (16 + rnd.nextInt(8))
      val gs = MountDsv2.coalesceWindows(w, maxGap, maxSpan)
      // exact partition of the input indices, in order
      assert(gs.flatten == (0 until n), s"$gs is not a partition of 0..$n")
      gs.foreach { g =>
        val gStart = w(g.start)._1
        val gEnd = g.map(i => w(i)._1 + w(i)._2).max
        // every window sits inside its group's span (sliceable)
        g.foreach { i =>
          assert(w(i)._1 >= gStart && w(i)._1 + w(i)._2 <= gEnd,
            s"window $i outside span ($gStart, $gEnd)")
        }
        // the span cap holds for every MERGED group (a single window
        // larger than the cap is its own group by construction)
        if (g.size > 1) assert(gEnd - gStart <= maxSpan,
          s"merged span ${gEnd - gStart} > cap $maxSpan")
        // within a group, windows are monotone, non-overlapping, and
        // gaps respect the cap
        g.sliding(2).foreach {
          case Seq(a, b) =>
            val aEnd = w(a)._1 + w(a)._2
            assert(w(b)._1 >= aEnd && w(b)._1 - aEnd <= maxGap)
          case _ => ()
        }
      }
    }
  }

  test("runs segments consecutive equal keys in order") {
    assert(runs(Seq("a", "a", "b", "a"))(identity).map(_.toList) ==
      Seq(List("a", "a"), List("b"), List("a")))
    assert(runs(Seq.empty[String])(identity) == Seq.empty)
  }

  test("idxRange folds bounds with saturating arithmetic") {
    import org.apache.spark.sql.sources._
    val r = idxRange(Array[Filter](GreaterThan("idx", 4L), LessThanOrEqual("idx", 10L)))
    assert(r == IdxRange(5L, 10L) && r.intersects(10, 20) && !r.intersects(11, 20))
    assert(idxRange(Array[Filter](GreaterThan("idx", Long.MaxValue))).isEmpty)
    assert(idxRange(Array[Filter](LessThan("idx", Long.MinValue))).isEmpty)
    assert(idxRange(Array[Filter](In("idx", Array(7L, 3L, 9L)))) == IdxRange(3L, 9L))
    assert(idxRange(Array.empty).isFull)
    // an empty range intersects NOTHING, even a window that brackets it
    assert(!IdxRange(5L, 3L).intersects(0L, 10L))
  }

  test("boxBounds: corner bounds of a row-major box, shape-clipped") {
    // 2x3 chunk at origin (3, 4) in a (5, 6) grid: clipped to rows 3-4,
    // cols 4-5 -> lo = 3*6+4 = 22, hi = 4*6+5 = 29
    assert(boxBounds(Seq(3L, 4L), Seq(2L, 3L), Seq(5L, 6L)) == (22L, 29L))
    // fully interior box
    assert(boxBounds(Seq(0L, 0L), Seq(3L, 4L), Seq(5L, 6L)) == (0L, 15L))
    // 1-D exact
    assert(boxBounds(Seq(8L), Seq(4L), Seq(30L)) == (8L, 11L))
  }

  test("dimRanges + boxKeep: per-dimension box intersection, exact where the linear span is not") {
    import org.apache.spark.sql.sources._
    val rs = dimRanges(Array[Filter](
      GreaterThanOrEqual("d1", 4L), LessThanOrEqual("d1", 5L)))
    assert(rs(0).isFull && rs(2).isFull && rs(3).isFull)
    // (5, 6) grid in (3, 4) chunks: d1 in [4, 5] keeps only chunk col 1
    val shape = Seq(5L, 6L)
    assert(!boxKeep(Seq(0L, 0L), Seq(3L, 4L), shape, rs)) // col 0: d1 0-3
    assert(boxKeep(Seq(0L, 4L), Seq(3L, 4L), shape, rs)) // col 1: d1 4-5 (clipped)
    assert(!boxKeep(Seq(3L, 0L), Seq(3L, 4L), shape, rs))
    assert(boxKeep(Seq(3L, 4L), Seq(3L, 4L), shape, rs))
    // the LINEAR span of the col-0 chunk at rows 0-2 is [0, 15], which
    // CONTAINS idx values with d1 in [4, 5] — the per-dim test prunes
    // where an idx window cannot
    assert(boxBounds(Seq(0L, 0L), Seq(3L, 4L), shape)._2 >= 4L)
    // a range on a dimension past the rank keeps only coordinate 0
    val rs3 = dimRanges(Array[Filter](EqualTo("d3", 0L)))
    assert(boxKeep(Seq(0L, 0L), Seq(3L, 4L), shape, rs3))
    assert(!boxKeep(Seq(0L, 0L), Seq(3L, 4L), shape,
      dimRanges(Array[Filter](EqualTo("d3", 1L)))))
    // no pushed dK predicates = keep everything, cheaply
    assert(allFull(dimRanges(Array.empty)) &&
      boxKeep(Seq(0L, 0L), Seq(3L, 4L), shape, dimRanges(Array.empty)))
  }

  test("hulls serialization round-trips and intersects per dimension (randomized)") {
    import MountDsv2._
    val rnd = new scala.util.Random(20260819)
    (1 to 200).foreach { _ =>
      val surviving = (0 until 1 + rnd.nextInt(20)).map { i =>
        val ks = rnd.shuffle((0 until DimCols.length).toList)
          .take(rnd.nextInt(DimCols.length + 1)).sorted
        (s"/cat/st$i.zarr", ks.map { k =>
          val lo = rnd.nextInt(2000) - 1000
          (k, (lo, lo + rnd.nextInt(500)))
        })
      }
      val parsed = parseHulls(serializeHulls(surviving))
      assert(parsed.size == surviving.size)
      surviving.foreach { case (p0, rs) =>
        val got = parsed(p0)
        (0 until DimCols.length).foreach { k =>
          rs.find(_._1 == k) match {
            case Some((_, (lo, hi))) =>
              assert(got(k) == IdxRange(lo.toLong, hi.toLong))
            case None => assert(got(k).isFull, s"dim $k should be full")
          }
        }
        // effDimRanges = per-dim intersection with the pushed globals
        val global = IndexedSeq(IdxRange(-100L, 100L), FullRange,
          IdxRange(0L, 50L), FullRange)
        val eff = effDimRanges(Some(parsed), p0, global)
        (0 until DimCols.length).foreach { k =>
          assert(eff(k).lo == math.max(global(k).lo, got(k).lo) &&
            eff(k).hi == math.min(global(k).hi, got(k).hi))
        }
      }
      // unknown store: conservative-full (the pushed globals unchanged)
      assert(effDimRanges(Some(parsed), "/not/there", IndexedSeq.fill(4)(FullRange))
        .forall(_.isFull))
    }
    // malformed inputs fail with the domain error, never an index
    // crash OR a leaked NumberFormatException — and an out-of-range
    // dimension index is REJECTED, not silently ignored (ignoring it
    // would be sound pruning-wise but would hide serializer/
    // deserializer skew behind correct-but-unpruned reads)
    intercept[IllegalArgumentException](parseHulls("no-tab-here"))
    intercept[IllegalArgumentException](parseHulls("p\t-1:0:5"))
    intercept[IllegalArgumentException](parseHulls("p\t0:1"))
    Seq("p\tx:0:5", "p\t0:x:5", "p\t0:0:x", "p\t2147483648:0:5").foreach { s =>
      val e = intercept[IllegalArgumentException](parseHulls(s))
      assert(e.getMessage.contains("malformed hull range"), s"$s: $e")
    }
    val oob = intercept[IllegalArgumentException](
      parseHulls(s"p\t${DimCols.length}:0:5"))
    assert(oob.getMessage.contains("outside"), oob.getMessage)
  }

  test("rowStrides/coordOf: row-major coordinate arithmetic") {
    val dims = Seq(5L, 6L, 7L)
    val st = rowStrides(dims)
    assert(st.toSeq == Seq(42L, 7L, 1L))
    // idx 100 = (2, 2, 2): 2*42 + 2*7 + 2
    assert(coordOf(100L, st, dims, 0) == 2L)
    assert(coordOf(100L, st, dims, 1) == 2L)
    assert(coordOf(100L, st, dims, 2) == 2L)
    assert(coordOf(100L, st, dims, 3) == 0L) // past the rank
    // round-trip: every idx reassembles from its coordinates
    (0L until 210L by 13L).foreach { gi =>
      val c = (0 until 3).map(coordOf(gi, st, dims, _))
      assert(c.zip(st).map { case (x, s) => x * s }.sum == gi)
    }
  }
}
