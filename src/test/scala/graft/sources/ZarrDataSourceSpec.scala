package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DSv2 mount of the zarr chunk-parallel reader: format(...) read
  * semantics vs the library path (v2 whole-chunk AND v3 shard-inner
  * granularity), plan-phase pruning from pushed dataset/path filters,
  * and column pruning that provably never opens chunk files. */
class ZarrDataSourceSpec extends SparkSpec {

  private val Fmt = "graft.sources.ZarrDataSource"
  private val V2Store = "src/test/resources/fixtures/golden.zarr"
  private val ShardStore = "src/test/resources/fixtures/golden_sharded_v3.zarr"

  private def copyStore(src: String, into: Path, name: String): Path = {
    val dst = into.resolve(name)
    val srcPath = Paths.get(src)
    Files.walk(srcPath).forEach { p =>
      val t = dst.resolve(srcPath.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
    dst
  }

  test("v2 store reads match the ZarrChunkIngest library path exactly") {
    val df = spark.read.format(Fmt).option("path", V2Store).load()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(1), r.getLong(2), r.getDouble(3))
    val got = df.collect().map(key).sorted.toSeq
    val lib = Seq("cnt", "lwp", "wind").flatMap(a =>
      ZarrChunkIngest.readValues(spark, V2Store, a).collect().map(key)).sorted
    assert(got == lib)
    assert(df.schema.fieldNames.toSeq == Seq("path", "dataset", "idx", "value"))
    // the absent cnt chunk reads as fill -1 through the mount too
    val cnt = df.where(col("dataset") === "cnt").orderBy("idx")
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(cnt == Seq(3.0, 1.0, 4.0, 1.0, -1.0, -1.0, -1.0))
  }

  test("dataset equality filter prunes chunks at PLAN time") {
    // partitions=64 > task count, so partition count == planned task count
    val all = spark.read.format(Fmt)
      .option("path", V2Store).option("partitions", "64").load()
    assert(all.rdd.getNumPartitions == 7) // lwp 4 + cnt 2 + wind 1
    val pruned = all.where(col("dataset") === "lwp")
    assert(pruned.rdd.getNumPartitions == 4) // cnt/wind chunks never planned
    assert(pruned.count() == 30)
    assert(pruned.queryExecution.executedPlan.toString.contains("pushed=EqualTo"))
    // IN pushes too; the residual filter still applies (semantics intact)
    val in = all.where(col("dataset").isin("wind", "nope"))
    assert(in.rdd.getNumPartitions == 1)
    assert(in.orderBy("idx").collect().map(_.getDouble(3)).toSeq ==
      Seq(5.5, -2.25, 0.125))
  }

  test("SHARDED v3 arrays plan one task per INNER chunk") {
    val df = spark.read.format(Fmt)
      .option("path", ShardStore).option("partitions", "64").load()
    // temp: 2 shards x (2x2) inner grid = 8 inner tasks
    assert(df.rdd.getNumPartitions == 8)
    val got = df.orderBy("idx").collect().map(_.getDouble(3)).toSeq
    val expect = for (r <- 0 until 6; c <- 0 until 8)
      yield if (r >= 4 && c < 4) -1.0 else r * 10.0 + c // absent inner chunk
    assert(got == expect)
    // matches the library shard-inner path exactly
    val lib = ZarrChunkIngest.readValuesShardInner(spark, ShardStore, "temp")
      .orderBy("idx").collect().map(_.getDouble(3)).toSeq
    assert(got == lib)
  }

  test("index-only projection never opens chunk files") {
    val tmp = Files.createTempDirectory("zarr-dsv2-corrupt")
    val store = copyStore(V2Store, tmp, "s.zarr")
    // corrupt every lwp chunk payload (zlib streams -> loud decode fail)
    Option(store.resolve("lwp").toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName != ".zarray").foreach { f =>
        val b = Files.readAllBytes(f.toPath)
        b(b.length / 2) = (b(b.length / 2) ^ 0x5a).toByte
        Files.write(f.toPath, b)
      }
    val df = spark.read.format(Fmt).option("path", store.toString).load()
      .where(col("dataset") === "lwp")
    // value projection must fail loudly (corrupt zlib)
    intercept[org.apache.spark.SparkException](df.select("value").collect())
    // idx/dataset projection succeeds: chunk files are never opened
    val idx = df.select("idx").collect().map(_.getLong(0)).sorted.toSeq
    assert(idx == (0L until 30L))
  }

  test("a directory of MIXED v2 + sharded-v3 stores discovers both and " +
      "plans each at its own granularity") {
    val tmp = Files.createTempDirectory("zarr-dsv2-mixed")
    copyStore(V2Store, tmp, "v2.zarr")
    copyStore(ShardStore, tmp, "v3.zarr")
    val all = spark.read.format(Fmt)
      .option("path", tmp.toString).option("partitions", "64").load()
    // v2: 7 whole-chunk tasks; sharded v3: 8 inner-chunk tasks
    assert(all.rdd.getNumPartitions == 15)
    assert(all.select("dataset").distinct().count() == 4) // cnt/lwp/wind/temp
    val temp = all.where(col("dataset") === "temp")
    assert(temp.rdd.getNumPartitions == 8)
    assert(temp.count() == 48)
  }

  test("a directory of stores discovers all of them; path filter prunes") {
    val tmp = Files.createTempDirectory("zarr-dsv2-multi")
    val s1 = copyStore(V2Store, tmp, "a.zarr")
    copyStore(V2Store, tmp, "b.zarr")
    val all = spark.read.format(Fmt)
      .option("path", tmp.toString).option("partitions", "64").load()
    assert(all.select("path").distinct().count() == 2)
    assert(all.rdd.getNumPartitions == 14)
    val one = all.where(col("path") === s1.toString)
    assert(one.rdd.getNumPartitions == 7)
    assert(one.where(col("dataset") === "wind").count() == 3)
    // dataset option narrows discovery like the library path
    val ds = spark.read.format(Fmt).option("path", tmp.toString)
      .option("dataset", "wind").load()
    assert(ds.select("dataset").distinct().collect().map(_.getString(0)).toSeq
      == Seq("wind"))
    assert(ds.count() == 6)
  }
}
