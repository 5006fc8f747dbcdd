package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantifies the LSH-vs-brute-force tradeoff on the real embedding
  * table: recall@k of the bucketed ANN against exact top-k, at probe
  * radius 0 (single bucket), 1 (1-bit flips) and 2. Multi-probe is the
  * production setting — radius 1 must clear 0.5 recall and radius must
  * increase recall monotonically, at a candidate cost bounded by the
  * Hamming-ball size (measured and reported). */
class AnnRecallSpec extends SparkSpec {

  test("multi-probe lshTopK recall against brute-force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.where(col("vec_id") < 20)
    val k = 10
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("probe_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(probes, emb, k))
    val byRadius = (0 to 2).map { rad =>
      val approx = pairs(Similarity.lshTopK(probes, emb, k, nPlanes = 4, dim = 64,
        probeRadius = rad))
      val recall = (exact intersect approx).size.toDouble / exact.size
      info(f"radius=$rad recall@$k = $recall%.3f (|approx|=${approx.size})")
      approx.foreach { case (p, n) => assert(p != n) }
      recall
    }
    // monotone in radius, and the production setting (radius 1) is a real
    // ANN: at least half the true neighbors survive bucketing
    assert(byRadius(0) <= byRadius(1) && byRadius(1) <= byRadius(2))
    assert(byRadius(1) >= 0.5, s"radius-1 recall ${byRadius(1)} < 0.5")

    // IVF path: data-adaptive cells, nProbe=4 of 8 cells must beat the
    // single-bucket LSH recall and clear 0.5 as well
    val ivf = pairs(Similarity.ivfTopK(probes, emb, k, nCells = 8, nProbe = 4))
    val ivfRecall = (exact intersect ivf).size.toDouble / exact.size
    info(f"ivf nCells=8 nProbe=4 recall@$k = $ivfRecall%.3f")
    assert(ivfRecall >= 0.5, s"IVF recall $ivfRecall < 0.5")

    // IVF over the FROM-SCRATCH KMeansLloyd fit (the self-contained
    // index-training path, no Spark ML): data-adaptive cells from 3
    // Lloyd rounds must clear the same floor
    val (model, _) = KMeansLloyd.fit(emb, "vec_id", "embedding",
      k = 8, dim = 64, seed = 42, rounds = 3)
    val lloyd = pairs(Similarity.ivfTopKWithCentroids(probes, emb, k,
      model.cents, nProbe = 4))
    val lloydRecall = (exact intersect lloyd).size.toDouble / exact.size
    info(f"ivf (KMeansLloyd fit) recall@$k = $lloydRecall%.3f")
    assert(lloydRecall >= 0.5, s"KMeansLloyd IVF recall $lloydRecall < 0.5")

    // IVF-SQ8 (coarse cells + u8 codes, L2 metric): recall vs EXACT L2
    // top-k — quantization noise rides on top of cell truncation, so
    // the compressed composed index must still clear the 0.5 floor
    val exactL2 = {
      val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val d2 = Similarity.dot(col("pv"), col("pv")) -
        lit(2.0) * Similarity.dot(col("pv"), col("cv")) +
        Similarity.dot(col("cv"), col("cv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id")).orderBy(d2, col("neighbor_id"))
      pairs(c.crossJoin(broadcast(p))
        .where(col("neighbor_id") =!= col("probe_id"))
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k))
    }
    val m = Sq8.fitMinMax(emb, "embedding", 64)
    val cents = KMeansLloyd.fit(emb, "vec_id", "embedding",
      k = 8, dim = 64, seed = 42, rounds = 3)._1.cents
    val ivfSq8 = pairs(Sq8.ivfAdcTopK(emb, probes, m, cents, nProbe = 4, k = k))
    val sqRecall = (exactL2 intersect ivfSq8).size.toDouble / exactL2.size
    info(f"ivf-sq8 (KMeansLloyd cells, u8 codes) recall@$k = $sqRecall%.3f")
    assert(sqRecall >= 0.5, s"IVF-SQ8 recall $sqRecall < 0.5")
  }
}
