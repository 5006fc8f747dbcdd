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
}
