package graft

import graft.core.Projection
import graft.operators.{AsOfJoin, SceneAssembly, Tiler, Triplets}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests per SURVEY §5: codec round-trips (C1), as-of join
  * semantics vs a brute-force reference (J1/J2), Tiler index math (W1),
  * projection round-trips (P1), hash-RNG range (T3).
  *
  * Generators run driver-side (ScalaCheck), each property batched into a
  * single Spark job so the suite stays fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(30)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("C1: scene-id codec round-trips any minute-grain timestamp") {
    // one batched job over many generated instants
    val gen = Gen.choose(631152000L, 1893456000L).map(_ / 60 * 60) // 1990..2030, minute grain
    val ts = Gen.listOfN(300, gen).sample.get
    val df = ts.toDF("epoch").select(timestamp_seconds(col("epoch")).as("t"))
      .withColumn("id", SceneAssembly.makeSceneId("src", col("t")))
      .withColumn("t2", SceneAssembly.parseSceneTime(col("id")))
    assert(df.where(col("t2") =!= col("t")).count() == 0)
  }

  test("W1: Tiler origin count, bounds and id bijection") {
    val gen = for {
      tileN <- Gen.choose(4, 64)
      step <- Gen.choose(1, tileN)
      nx <- Gen.choose(tileN, 4 * tileN)
      ny <- Gen.choose(tileN, 4 * tileN)
    } yield (nx, ny, tileN, step)
    check(Prop.forAll(gen) { case (nx, ny, tileN, step) =>
      val specs = Tiler.tileSpecs(Seq(("s", nx, ny)).toDF("scene_id", "nx", "ny"),
        col("nx"), col("ny"), tileN, step)
        .select("i0", "j0", "tile_id").as[(Int, Int, Long)].collect()
      val nI = (nx - tileN) / step + 1
      val nJ = (ny - tileN) / step + 1
      specs.length == nI * nJ &&
        specs.forall { case (i0, j0, _) => i0 >= 0 && i0 <= nx - tileN && j0 >= 0 && j0 <= ny - tileN } &&
        specs.map(_._3).distinct.length == specs.length
    })
  }

  test("P1: projection round-trip within the domain disc") {
    val gen = for {
      dlat <- Gen.choose(-10.0, 10.0)
      dlon <- Gen.choose(-10.0, 10.0)
    } yield (13.3 + dlat, -57.5 + dlon)
    val pts = Gen.listOfN(300, gen).sample.get
    val df = pts.toDF("lat", "lon")
      .withColumn("x", Projection.projX(col("lat"), col("lon"), 13.3, -57.5))
      .withColumn("y", Projection.projY(col("lat"), col("lon"), 13.3, -57.5))
      .withColumn("rlat", Projection.invLat(col("x"), col("y"), 13.3, -57.5))
      .withColumn("rlon", Projection.invLon(col("x"), col("y"), 13.3, -57.5))
    val bad = df.where(abs(col("rlat") - col("lat")) > 1e-8 || abs(col("rlon") - col("lon")) > 1e-8)
    assert(bad.count() == 0)
  }

  test("J1: nearestWithin matches a brute-force reference") {
    val timeGen = Gen.choose(0L, 100000L)
    val gen = for {
      probes <- Gen.listOfN(25, timeGen)
      builds <- Gen.nonEmptyListOf(timeGen).map(_.take(25))
      half <- Gen.choose(1L, 20000L)
    } yield (probes.distinct, builds.distinct, half)
    check(Prop.forAll(gen) { case (probes, builds, half) =>
      val p = probes.zipWithIndex.map { case (us, i) => (i.toLong, us) }
        .toDF("p_id", "us").select(col("p_id"), timestamp_micros(col("us")).as("p_ts"))
      val b = builds.zipWithIndex.map { case (us, i) => (i.toLong + 1000, us) }
        .toDF("b_id", "us").select(col("b_id"), timestamp_micros(col("us")).as("b_ts"))
      val got = AsOfJoin.nearestWithin(p, b, "p_ts", "b_ts", half, Seq("p_id"))
        .select(unix_micros(col("p_ts")), unix_micros(col("b_ts")))
        .as[(Long, Long)].collect().toMap
      // brute force: nearest build within half window, ties -> earlier
      val want = probes.flatMap { pu =>
        val c = builds.map(bu => (math.abs(pu - bu), bu)).filter(_._1 <= half)
        if (c.isEmpty) None else Some(pu -> c.minBy(t => (t._1, t._2))._2)
      }.toMap
      got == want
    })
  }

  test("range join matches brute-force containment") {
    val gen = for {
      pts <- Gen.listOfN(40, Gen.choose(0L, 5000L))
      ivs <- Gen.listOfN(15, Gen.zip(Gen.choose(0L, 4500L), Gen.choose(1L, 800L)))
      width <- Gen.choose(50L, 2000L)
    } yield (pts.distinct, ivs.map { case (lo, len) => (lo, lo + len) }.distinct, width)
    check(Prop.forAll(gen) { case (pts, ivs, width) =>
      val p = pts.toDF("pt")
      val iv = ivs.toDF("lo", "hi")
      val got = graft.operators.RangeJoin.pointInInterval(p, iv, "pt", "lo", "hi", width)
        .select("pt", "lo").as[(Long, Long)].collect().toSet
      val want = (for { pt <- pts; (lo, hi) <- ivs if pt >= lo && pt <= hi } yield (pt, lo)).toSet
      got == want
    })
  }

  test("R1: curvilinear inverse-bilinear recovers the generating (quad, s, t) for random warps") {
    // the warp x(i,j) = a·i + b·j + c·i·j + x0 is itself bilinear in
    // (i, j), so a point placed at real grid coords (u, v) must solve to
    // quad (floor u, floor v) with (s, t) = (frac u, frac v) — for ANY
    // warp coefficients that keep the mesh unfolded
    val n = 10
    val warpGen = for {
      a <- Gen.choose(50.0, 150.0); b <- Gen.choose(-10.0, 10.0)
      c <- Gen.choose(-0.5, 0.5); e <- Gen.choose(50.0, 150.0)
      f <- Gen.choose(-10.0, 10.0); g <- Gen.choose(-0.5, 0.5)
      u <- Gen.choose(1.05, n - 2.05); v <- Gen.choose(1.05, n - 2.05)
    } yield (a, b, c, e, f, g, u, v)
    check(Prop.forAll(warpGen) { case (a, b, c, e, f, g, u, v) =>
      def wx(i: Double, j: Double) = a * i + b * j + c * i * j
      def wy(i: Double, j: Double) = e * j + f * i + g * i * j
      val src = (for { i <- 0 until n; j <- 0 until n }
        yield (i.toLong, j.toLong, wx(i, j), wy(i, j))).toDF("src_i", "src_j", "x", "y")
      val dst = Seq((0L, 0L, wx(u, v), wy(u, v))).toDF("dst_i", "dst_j", "x", "y")
      val rows = graft.operators.Regrid
        .curvilinearBilinearWeights(src, dst, binSize = 2048.0)
        .collect()
      val wsum = rows.map(_.getDouble(4)).sum
      // reconstruct (s, t) from the four corner weights
      val wmap = rows.map(r => (r.getLong(2) - u.floor.toLong,
        r.getLong(3) - v.floor.toLong) -> r.getDouble(4)).toMap
      val s = wmap.getOrElse((1L, 0L), 0.0) + wmap.getOrElse((1L, 1L), 0.0)
      val t = wmap.getOrElse((0L, 1L), 0.0) + wmap.getOrElse((1L, 1L), 0.0)
      rows.length == 4 &&
        math.abs(wsum - 1.0) < 1e-9 &&
        rows.forall(r => math.abs(r.getLong(2) - u) <= 1 && math.abs(r.getLong(3) - v) <= 1) &&
        math.abs(s - (u - u.floor)) < 1e-6 && math.abs(t - (v - v.floor)) < 1e-6
    })
  }

  test("WARC codec round-trips arbitrary records through both compressions") {
    import graft.sources.Warc
    // payloads include raw binary — gzip magic, CRLFCRLF, NULs — so the
    // property pins the length-framing, not any delimiter luck
    val recGen = for {
      uri <- Gen.alphaNumStr.map(s => s"http://ex.org/${s.take(40)}")
      date <- Gen.choose(0L, 4102444800L).map(t =>
        java.time.Instant.ofEpochSecond(t).toString)
      wtype <- Gen.oneOf("response", "request", "metadata", "warcinfo")
      payload <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
      hdrVal <- Gen.alphaNumStr.map(_.take(30))
    } yield Warc.WarcRecord(wtype, uri, date, Map("X-Graft-Check" -> hdrVal), payload)
    val gen = Gen.nonEmptyListOf(recGen).map(_.take(12))
    check(Prop.forAll(gen) { recs =>
      def same(got: Seq[Warc.WarcRecord]): Boolean =
        got.size == recs.size && got.zip(recs).forall { case (g, e) =>
          g.warcType == e.warcType && g.targetUri == e.targetUri &&
            g.date == e.date && g.payload.toSeq == e.payload.toSeq &&
            g.headers.get("x-graft-check").contains(e.headers("X-Graft-Check"))
        }
      same(Warc.read(Warc.write(recs))) && same(Warc.readGz(Warc.writeGz(recs)))
    })
  }

  test("resize kernels match a naive reference on random images and sizes") {
    import graft.functions.ImageOps
    val gen = for {
      ny <- Gen.choose(1, 6); nx <- Gen.choose(1, 6)
      oy <- Gen.choose(1, 7); ox <- Gen.choose(1, 7)
      vals <- Gen.listOfN(ny * nx * 3, Gen.choose(-100, 100).map(_ / 8.0))
    } yield (ny, nx, oy, ox, vals)
    check(Prop.forAll(gen) { case (ny, nx, oy, ox, vals) =>
      val df = Seq(Tuple1(vals)).toDF("a")
      val near = df.select(ImageOps.resizeRgbNearest(col("a"), ny, nx, oy, ox))
        .as[Seq[Double]].head()
      val bi = df.select(ImageOps.resizeRgbBilinear(col("a"), ny, nx, oy, ox))
        .as[Seq[Double]].head()
      def src(j: Int, i: Int, c: Int) = vals((j * nx + i) * 3 + c)
      val wantNear = for (j <- 0 until oy; i <- 0 until ox; c <- 0 until 3)
        yield src(j * ny / oy, i * nx / ox, c)
      val wantBi = for (j <- 0 until oy; i <- 0 until ox; c <- 0 until 3) yield {
        val fy = math.max(0.0, (j + 0.5) * ny / oy - 0.5)
        val fx = math.max(0.0, (i + 0.5) * nx / ox - 0.5)
        val y0 = math.min(math.floor(fy), ny - 1.0); val y1 = math.min(y0 + 1, ny - 1.0)
        val x0 = math.min(math.floor(fx), nx - 1.0); val x1 = math.min(x0 + 1, nx - 1.0)
        val wy = fy - math.floor(fy); val wx = fx - math.floor(fx)
        (1 - wy) * (1 - wx) * src(y0.toInt, x0.toInt, c) +
          (1 - wy) * wx * src(y0.toInt, x1.toInt, c) +
          wy * (1 - wx) * src(y1.toInt, x0.toInt, c) +
          wy * wx * src(y1.toInt, x1.toInt, c)
      }
      near == wantNear &&
        bi.zip(wantBi).forall { case (g, w) => math.abs(g - w) < 1e-9 }
    })
  }

  test("Avro: random rows of every supported type round-trip write -> read") {
    // generator-driven sweep (beyond the fixed Python fuzz fixtures):
    // random nullable rows over all seven primitives, one batched
    // write+read per codec
    val rnd = new scala.util.Random(4242)
    def randString(): String = {
      val chars = "abc XYZ09_é中"
      (0 until rnd.nextInt(12)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    val rows = (0 until 200).map { i =>
      (i.toLong,
        if (rnd.nextBoolean()) null else randString(),
        if (rnd.nextInt(4) == 0) null
        else java.lang.Double.valueOf(rnd.nextInt(1000000) * 0.25),
        rnd.nextBoolean(),
        if (rnd.nextInt(4) == 0) null
        else java.lang.Integer.valueOf(rnd.nextInt()),
        if (rnd.nextInt(4) == 0) null
        else java.lang.Float.valueOf(rnd.nextInt(8192) * 0.5f),
        if (rnd.nextBoolean()) null
        else Array.fill(rnd.nextInt(8))(rnd.nextInt(256).toByte))
    }
    val df = rows.toDF("id", "s", "d", "ok", "i", "f", "b")
    for (codec <- Seq("deflate", "null")) {
      val dir = java.nio.file.Files.createTempDirectory(s"avro-prop-$codec").toString
      graft.sources.Avro.write(df, dir, codec)
      val back = graft.sources.Avro.read(spark, dir)
      assert(back.schema == df.schema, s"$codec schema")
      def canon(r: org.apache.spark.sql.Row) = r.toSeq.map {
        case a: Array[Byte] => a.toSeq
        case v => v
      }
      assert(back.collect().map(canon).toSet == df.collect().map(canon).toSet,
        s"$codec values")
    }
  }

  test("CDC chunking: random mixed-script text agrees with the reference " +
    "loop and reassembles") {
    val rnd = new scala.util.Random(777)
    // draw whole CODE POINTS (the emoji is a surrogate pair — indexing
    // chars would generate lone surrogates, which are not valid strings:
    // Spark's UTF-8 encoder replaces them with '?' while a JVM regex
    // sees the raw char, an out-of-domain divergence this test must not
    // manufacture)
    val alphabet: IndexedSeq[String] =
      "abcdefgh ijklmnop .,!?\n\téü中文".map(_.toString) :+
        new String(Character.toChars(0x1f309))
    // Spark's trim strips ONLY 0x20 spaces (Java String.trim would also
    // strip the \n/\t this alphabet generates at the ends)
    def sparkTrim(s: String): String =
      s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    def refChunks(text: String): Seq[String] = {
      val s = sparkTrim(text).toLowerCase.replaceAll("[^\\x20-\\x7e]", " ")
      val pows = (7 to 0 by -1).map(k => math.pow(31, k).toLong)
      val cuts = (8 to s.length).filter { i =>
        (0 until 8).map(k => s.charAt(i - 8 + k).toLong * pows(k)).sum % 64 == 0
      }
      (0 +: cuts :+ s.length).sliding(2)
        .map { case Seq(a, b) => s.substring(a, b) }.filter(_.nonEmpty).toSeq
    }
    val docs = (0L until 60L).map { i =>
      val n = 20 + rnd.nextInt(300)
      (i, (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = graft.operators.Dedup.cdcChunkStats(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, text) =>
      val ref = refChunks(text)
      // surrogate-pair alphabet entries land as two chars in the Scala
      // string; the regex collapses the code POINT to one space in both
      // engines, so the reference and operator agree by construction
      assert(got.getOrElse(id, 0L) == ref.length.toLong,
        s"doc $id: ${got.get(id)} chunks vs ref ${ref.length}")
      assert(ref.mkString ==
        sparkTrim(text).toLowerCase.replaceAll("[^\\x20-\\x7e]", " "),
        s"doc $id does not reassemble")
    }
  }

  test("T3: hashUnit stays in [0,1) and is key-deterministic") {
    val df = spark.range(0, 2000).select(col("id"))
      .withColumn("u", Triplets.hashUnit(7, col("id")))
    val (lo, hi) = df.agg(min(col("u")), max(col("u"))).as[(Double, Double)].head()
    assert(lo >= 0.0 && hi < 1.0)
    val a = df.orderBy("id").as[(Long, Double)].collect().toSeq
    val b = spark.range(0, 2000).repartition(13).select(col("id"))
      .withColumn("u", Triplets.hashUnit(7, col("id")))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(a == b)
  }
}
