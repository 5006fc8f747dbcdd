package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executed-path I/O asserts through the counting ByteStore: the
  * object-store request-count claims (coalesced spans = one read,
  * pruned shards = zero opens) verified on ACTUAL reads, not plan
  * arithmetic. Local mode runs executors in this JVM, so the recorder
  * sees executor-side positioned reads too; any future reader that
  * bypasses the coalesced windows or touches a pruned shard's tail
  * fails these counts. */
class IoCountingSpec extends SparkSpec {

  private val ShardStore = "src/test/resources/fixtures/golden_sharded_v3.zarr"

  private def recording[T](f: => T): (T, ByteStore.IoRecorder) = {
    val r = ByteStore.startRecording()
    try (f, r) finally ByteStore.stopRecording()
  }

  test("a bbox-pruned shard is NEVER read — not even its index tail") {
    // temp (6,8), shards (4,8): d0 <= 3 needs shard 0 only. The
    // corrupt-tail test proves this indirectly; this is the direct
    // claim: zero opens, zero reads, zero bytes on shard 1.
    val shard0 = new java.io.File(s"$ShardStore/temp/c/0/0").getAbsolutePath
    val shard1 = new java.io.File(s"$ShardStore/temp/c/1/0").getAbsolutePath
    val (rows, r) = recording {
      spark.read.format("graft.sources.ZarrDataSource")
        .option("path", ShardStore).load()
        .where(col("d0") <= 3).select("idx", "value").collect()
    }
    assert(rows.length == 32)
    assert(r.opens(shard1) == 0 && r.reads(shard1) == 0 && r.bytes(shard1) == 0,
      s"pruned shard was touched: opens=${r.opens(shard1)} reads=${r.reads(shard1)}")
    assert(r.opens(shard0) > 0 && r.reads(shard0) > 0)
  }

  test("back-to-back shard-inner chunks collapse to ONE span read per shard") {
    // one scene, one shard, 32 single-row inner chunks written
    // back-to-back: an uncoalesced reader would issue >= 32 positioned
    // reads on the shard; the span coalescer issues ONE for the data
    // (plus the planning tail read)
    val dir = Files.createTempDirectory("graft-iocount-z3").toString
    val (ny, nx) = (32, 4)
    val grid = spark.range(ny.toLong * nx).select(
      lit("s0").as("scene_id"),
      expr("timestamp_seconds(1577836800)").as("time"),
      (expr(s"id % $nx") * 10.0).as("x"),
      (expr(s"id div $nx") * 10.0).as("y"),
      (col("id") * 0.5 - 7.0).as("value"))
    Zarr3.writeScenes(grid, dir, "lwp", chunkRows = Some(ny),
      gzipLevel = Some(6), shardInnerRows = Some(1)).count()
    val store = new java.io.File(s"$dir/s0.zarr").getAbsolutePath
    assert(ZarrChunkIngest.shardInnerTasks(store, "lwp").size == ny)
    val shardFile = Option(new java.io.File(s"$store/lwp/c").listFiles())
      .getOrElse(Array.empty).flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
      .head.getAbsolutePath
    val (sum, r) = recording {
      spark.read.format("graft.sources.ZarrDataSource")
        .option("path", store).option("partitions", "1").load()
        .where(col("dataset") === "lwp")
        .agg(org.apache.spark.sql.functions.sum("value")).head.getDouble(0)
    }
    assert(math.abs(sum - (0 until ny * nx).map(_ * 0.5 - 7.0).sum) < 1e-9)
    // planning: exists + index-tail read; execution: one coalesced span.
    // 32 un-coalesced inner reads would blow straight through this.
    assert(r.reads(shardFile) <= 4,
      s"expected ~2 reads (tail + one span) on the shard, got ${r.reads(shardFile)}")
    assert(r.opens(shardFile) <= 3)
  }

  test("a dominant netCDF-3 record variable reads as ONE span; a minority variable stays per-record") {
    // sst owns 240 of the 248-byte record stride -> the usefulness
    // guard (>= 1/2) takes the span path: 40 records = ONE ranged read
    // per task. tiny (8 of 248) would span-read 97% junk, so it keeps
    // per-record reads. Executed counts, not plan arithmetic.
    val dir = Files.createTempDirectory("graft-iocount-nc3").toString
    val (nrec, ny, nx) = (40, 6, 5)
    val bytes = NetCDF3.write(
      dims = Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("y", ny), NetCDF3.Dim("x", nx)),
      gattrs = Nil,
      vars = Seq(
        NetCDF3.VarSpec("sst", Seq("time", "y", "x"), NetCDF3.NcDouble, Nil,
          Array.tabulate(nrec * ny * nx)(_ * 0.5)),
        NetCDF3.VarSpec("tiny", Seq("time"), NetCDF3.NcDouble, Nil,
          Array.tabulate(nrec)(_ * 7.0))),
      numRecs = nrec)
    val f = new java.io.File(dir, "c.nc")
    java.nio.file.Files.write(f.toPath, bytes)
    val p = f.getAbsolutePath
    def readSum(ds: String): (Double, ByteStore.IoRecorder) = recording {
      spark.read.format("graft.sources.NetCDF3DataSource")
        .option("path", p).option("partitions", "1").load()
        .where(col("dataset") === ds)
        .agg(org.apache.spark.sql.functions.sum("value")).head.getDouble(0)
    }
    val (sstSum, rs) = readSum("sst")
    assert(math.abs(sstSum - (0 until nrec * ny * nx).map(_ * 0.5).sum) < 1e-6)
    // a few planning header parses (Spark re-plans the scan across
    // phases) + ONE span read; un-guarded per-record = 40+ reads
    // blows through this
    assert(rs.reads(p) <= 8, s"expected header reads + one span, got ${rs.reads(p)}")
    val (tinySum, rt) = readSum("tiny")
    assert(math.abs(tinySum - (0 until nrec).map(_ * 7.0).sum) < 1e-9)
    assert(rt.reads(p) >= nrec,
      s"minority variable must keep per-record reads (junk-bounded), got ${rt.reads(p)}")
  }

  test("a catalog record crop narrows the read window through the tree hull") {
    // the per-store disjunction (path = f AND d0 BETWEEN lo hi) OR ...
    // must narrow each surviving file's RECORD window, not just prune
    // whole batches: a 4-of-64-record crop reads ~4 records' bytes,
    // never the batch's 64-record span (colHull through the tree).
    val dir = Files.createTempDirectory("graft-iocount-cat").toString
    val (nrec, nx) = (64, 1024) // 512 KB of data per file
    def nc(name: String, day: Int): String = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.write(f.toPath, NetCDF3.write(
        dims = Seq(NetCDF3.Dim("time", 0), NetCDF3.Dim("x", nx)),
        gattrs = Nil,
        vars = Seq(
          NetCDF3.VarSpec("time", Seq("time"), NetCDF3.NcDouble,
            Seq(NetCDF3.Attr("units", NetCDF3.NcChar,
              s"hours since 2022-05-0$day")), Array.tabulate(nrec)(_.toDouble)),
          NetCDF3.VarSpec("v", Seq("time", "x"), NetCDF3.NcDouble, Nil,
            Array.tabulate(nrec * nx)(_.toDouble))),
        numRecs = nrec))
      f.getAbsolutePath
    }
    // TWO survivors with disjoint epochs, so the pushed filter is the
    // genuine Or TREE — (path = a AND d0 48-51) OR (path = b AND
    // d0 0-3) — and each file's window comes from ITS branch's hull
    val pa = nc("a.nc", 1) // hours 0-63 since 05-01
    val pb = nc("b.nc", 3) // hours 0-63 since 05-03
    val fileLen = new java.io.File(pa).length()
    val manifest = s"$dir/_manifest"
    CatalogManifest.build(spark, "netcdf3", s"$dir/*.nc", Seq("v"), manifest)
    val (got, rec) = recording {
      GridOpen.netcdf3CatalogFromManifest(spark, manifest, "v",
          timeBounds = Map("time" ->
            ("2022-05-03 00:00:00", "2022-05-03 03:00:00")))
        .agg(sum(col("value"))).head.getDouble(0)
    }
    // a keeps records 48-51 (hours 48-51 of day 1 = day 3's 0-3h),
    // b keeps records 0-3
    def sumTo(n: Long): Double = n.toDouble * (n - 1) / 2.0
    val want = (sumTo(52L * nx) - sumTo(48L * nx)) + sumTo(4L * nx)
    assert(got == want, s"got $got, want $want")
    // each surviving file: header + time coords + ~4 records of v — a
    // 64-record span (the pre-narrowing behavior) would read ~8x this
    for (p0 <- Seq(pa, pb))
      assert(rec.bytes(p0) < fileLen / 4,
        s"read ${rec.bytes(p0)} of $fileLen bytes for a 4/64-record crop of $p0")
  }

  test("colHull: interval algebra over filter trees is sound per identity") {
    import org.apache.spark.sql.sources._
    import MountDsv2.{colHull, FullRange, IdxRange}
    val or = Or(
      And(EqualTo("path", "/a"), And(GreaterThanOrEqual("d0", 48L),
        LessThanOrEqual("d0", 51L))),
      And(EqualTo("path", "/b"), And(GreaterThanOrEqual("d0", 0L),
        LessThanOrEqual("d0", 3L))))
    // each identity gets exactly ITS branch's range
    assert(colHull(or, "d0", "/a", "v").contains(IdxRange(48, 51)))
    assert(colHull(or, "d0", "/b", "v").contains(IdxRange(0, 3)))
    // an identity in NO branch is unsatisfiable
    assert(colHull(or, "d0", "/c", "v").isEmpty)
    // a branch with no d0 constraint makes the hull FULL for its store
    val mixed = Or(EqualTo("path", "/a"),
      And(EqualTo("path", "/b"), EqualTo("d0", 7L)))
    assert(colHull(mixed, "d0", "/a", "v").contains(FullRange))
    assert(colHull(mixed, "d0", "/b", "v").contains(IdxRange(7, 7)))
    // And-unsatisfiable intersects to None; other columns don't constrain
    assert(colHull(And(EqualTo("d0", 1L), EqualTo("d0", 5L)),
      "d0", "/a", "v").isEmpty)
    assert(colHull(EqualTo("d1", 9L), "d0", "/a", "v").contains(FullRange))
    // unknown shapes (Not) stay conservative-FULL
    assert(colHull(Not(EqualTo("d0", 2L)), "d0", "/a", "v").contains(FullRange))
  }

  test("byte-adjacent HDF5 chunks collapse to one span read per run") {
    // (32, 4) in (2, 4) chunks = 16 deflate chunks written back-to-back:
    // execution must read them as ONE coalesced span (16 per-chunk reads
    // fail the bound); planning's paged metadata walk adds only its
    // page-cache misses (the file is smaller than one 64 KiB page)
    val dir = Files.createTempDirectory("graft-iocount-h5").toString
    val bytes = HDF5.write(Seq(
      HDF5.DsSpec("v", Seq(32, 4), Array.tabulate(128)(_ * 0.25 - 3.0),
        chunkDims = Some(Seq(2, 4)))), deflate = true)
    val f = new java.io.File(dir, "b.h5")
    java.nio.file.Files.write(f.toPath, bytes)
    val (got, r) = recording {
      spark.read.format("graft.sources.Hdf5DataSource")
        .option("path", f.getAbsolutePath).option("partitions", "1").load()
        .select("idx", "value").collect()
    }
    assert(got.length == 128)
    assert(r.reads(f.getAbsolutePath) <= 6,
      s"expected ~2-3 reads (metadata pages + one span), got ${r.reads(f.getAbsolutePath)}")
    assert(r.opens(f.getAbsolutePath) <= 3)
  }
}
