package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: grids smaller than the tile, empty shingle
  * sets, empty build sides. Spark's `sequence(a, b)` generates DESCENDING
  * sequences when a > b, so every sequence-based enumeration needs an
  * explicit emptiness guard — this suite pins that contract. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("Tiler yields no tiles when the grid is smaller than the tile") {
    val out = Tiler.tileSpecs(Seq(("s", 10, 40)).toDF("scene_id", "nx", "ny"),
      col("nx"), col("ny"), tileN = 16, step = 8).collect()
    assert(out.isEmpty, s"grid 10 wide cannot host a 16-wide tile, got ${out.length} rows")
  }

  test("minhash on a text shorter than the shingle width is null-safe") {
    val sig = Dedup.minhashSignatures(Seq((1L, "ab")).toDF("doc_id", "text"),
      "doc_id", "text", k = 4).collect().head
    // no shingles -> no signature; all mh columns null (and LSH banding
    // of a null signature joins nothing rather than corrupting buckets)
    assert((1 to 4).forall(sig.isNullAt), s"expected null signature, got ${sig.toSeq}")
    val pairs = Dedup.lshNearDupPairs(
      Seq((1L, "ab"), (2L, "ab")).toDF("doc_id", "text"), "doc_id", "text", 8, 4, 0.1)
    assert(pairs.count() == 0)
  }

  test("as-of join with an empty build side yields no rows") {
    val probe = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("p_id", "p_ts")
    val build = probe.where(lit(false)).select(col("p_id").as("b_id"), col("p_ts").as("b_ts"))
    assert(AsOfJoin.nearestWithin(probe, build, "p_ts", "b_ts", 1000L, Seq("p_id")).count() == 0)
  }

  test("curvilinear weights: destination points outside the mesh produce no rows") {
    val src = spark.range(16).select(
      expr("id div 4").as("src_i"), (col("id") % 4).as("src_j"))
      .withColumn("x", col("src_i") * 10.0).withColumn("y", col("src_j") * 10.0)
    // one inside the 0..30 mesh, one far outside
    val dst = Seq((0L, 0L, 15.0, 15.0), (1L, 1L, 500.0, 500.0))
      .toDF("dst_i", "dst_j", "x", "y")
    val w = Regrid.curvilinearBilinearWeights(src, dst, binSize = 64.0)
    val dstIds = w.select("dst_i").distinct().collect().map(_.getLong(0)).toSet
    assert(dstIds == Set(0L), "only the in-mesh point matches")
  }

  test("file codecs reject foreign bytes loudly") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val e1 = intercept[IllegalArgumentException](graft.sources.NetCDF3.readHeader(garbage))
    assert(e1.getMessage.contains("not a NetCDF classic file"))
    val e2 = intercept[IllegalArgumentException](graft.sources.HDF4.readDDs(garbage))
    assert(e2.getMessage.contains("not an HDF4 file"))
    // an HDF5-era file (netCDF-4) starts with \x89HDF — neither codec takes it
    val hdf5ish = Array[Byte](0x89.toByte, 'H', 'D', 'F') ++ Array.fill[Byte](32)(0)
    intercept[IllegalArgumentException](graft.sources.NetCDF3.readHeader(hdf5ish))
    intercept[IllegalArgumentException](graft.sources.HDF4.readDDs(hdf5ish))
  }

  test("LK tracking a structureless (constant) frame rejects the point") {
    val flat = Array.fill(32 * 32)(5.0)
    val res = LucasKanade.track(32, 32, flat, flat, Array((16.0, 16.0)))
    assert(res.head.isEmpty, "no gradient structure -> status false")
  }
}
