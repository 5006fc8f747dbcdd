package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DSv2 mount of the consolidated-.npy row reader: format(...)
  * semantics vs Npy.readRows, closed-form range planning, path
  * pruning, and column pruning that provably never reads payload. */
class NpyDataSourceSpec extends SparkSpec {

  private val Fmt = "graft.sources.NpyDataSource"

  private def writeArray(dir: String, name: String, nRows: Int, dim: Int,
      f: Int => Float): String = {
    val path = s"$dir/$name"
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    out.write(Npy.header("<f4", Seq(nRows.toLong, dim.toLong)))
    val bb = java.nio.ByteBuffer.allocate(4 * nRows * dim)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until nRows * dim).foreach(i => bb.putFloat(f(i)))
    out.write(bb.array()); out.close()
    path
  }

  test("reads match Npy.readRows exactly; rowsPerTask is the partition grain") {
    val dir = Files.createTempDirectory("graft-npydsv2").toString
    val path = writeArray(dir, "emb.npy", 640, 8, i => i * 0.25f - 50.0f)
    val df = spark.read.format(Fmt).option("path", path)
      .option("rowsPerTask", "100").load()
    assert(df.rdd.getNumPartitions == 7) // ceil(640/100)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(1), r.getSeq[Float](2).toSeq)
    val lib = Npy.readRows(spark, path, rowsPerTask = 100)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      .sortBy(_._1).toSeq
    assert(df.collect().map(key).sortBy(_._1).toSeq == lib)
    assert(df.schema.fieldNames.toSeq == Seq("path", "row", "embedding"))
  }

  test("wide-matrix byte counts never overflow an Int: plan-time clamp + " +
      "loud reader guard") {
    val dir = Files.createTempDirectory("graft-npydsv2-wide").toString
    val path = writeArray(dir, "emb.npy", 8, 4, _.toFloat)
    // a hand-built partition past the clamp (4096 rows x dim 131072 x 4 B
    // = 2^31) must reject with the descriptive guard, never a
    // NegativeArraySizeException from a truncated Int
    val p = NpyRowPartition(path, dim = 131072, dataOffset = 128L,
      rowStart = 0L, rowEnd = 4096L)
    val e = intercept[IllegalArgumentException](
      new NpyReaderFactory(NpyDataSource.schema, Map.empty).createReader(p).next())
    assert(e.getMessage.contains("exceeds one buffer"))
    // the planner itself never emits such a partition: a huge
    // rowsPerTask is clamped from dim, and reads stay correct
    val df = spark.read.format(Fmt).option("path", path)
      .option("rowsPerTask", Int.MaxValue.toString).load()
    assert(df.select("row").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 8L))
  }

  test("row range predicates prune row batches at PLAN time") {
    val dir = Files.createTempDirectory("graft-npydsv2-range").toString
    val path = writeArray(dir, "emb.npy", 640, 8, i => i * 0.25f - 50.0f)
    val df = spark.read.format(Fmt).option("path", path)
      .option("rowsPerTask", "100").load()
    val slice = df.where(col("row").between(250, 349))
    assert(slice.rdd.getNumPartitions == 2) // ranges [200,300) + [300,400)
    assert(slice.count() == 100)
    assert(slice.agg(min("row"), max("row")).head() ==
      org.apache.spark.sql.Row(250L, 349L))
    assert(df.where(col("row") >= 640).rdd.getNumPartitions == 0)
  }

  test("row-only projection never reads payload bytes (truncated file)") {
    val dir = Files.createTempDirectory("graft-npydsv2-trunc").toString
    val path = writeArray(dir, "emb.npy", 200, 4, _.toFloat)
    val bytes = Files.readAllBytes(Paths.get(path))
    // keep the header + the first few rows only
    val in = ByteStore.open(path)
    val off = try Npy.readMeta(in).dataOffset finally in.close()
    Files.write(Paths.get(path), java.util.Arrays.copyOf(bytes, off.toInt + 64))
    val df = spark.read.format(Fmt).option("path", path).load()
    intercept[org.apache.spark.SparkException](df.select("embedding").collect())
    val rows = df.select("row").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == (0L until 200L))
  }

  test("glob + path filter prune files at plan time; non-f4 rejects loudly") {
    val dir = Files.createTempDirectory("graft-npydsv2-glob").toString
    val p1 = writeArray(dir, "a.npy", 50, 4, _.toFloat)
    writeArray(dir, "b.npy", 30, 4, i => -i.toFloat)
    val all = spark.read.format(Fmt).option("path", s"$dir/*.npy")
      .option("rowsPerTask", "10").load()
    assert(all.select("path").distinct().count() == 2)
    assert(all.rdd.getNumPartitions == 8) // 5 + 3 ranges
    val one = all.where(col("path") === p1)
    assert(one.rdd.getNumPartitions == 5) // b.npy's header never read
    assert(one.count() == 50)
    // a 1-D int64 array is not the embedding shape -> loud reject
    val ids = s"$dir/ids.npy"
    val out = new java.io.FileOutputStream(ids)
    out.write(Npy.header("<i8", Seq(3L)))
    out.write(new Array[Byte](24)); out.close()
    val e = intercept[IllegalArgumentException] {
      spark.read.format(Fmt).option("path", ids).load().count()
    }
    assert(e.getMessage.contains("2-D <f4"))
  }
}
