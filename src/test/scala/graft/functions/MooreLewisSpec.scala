package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Moore-Lewis cross-entropy-difference selection (Moore & Lewis 2010):
  * hand-computed smoothed scores, OOV handling, and the selection cut. */
class MooreLewisSpec extends SparkSpec {

  // gen: x=3 y=2 z=3 (N=8, V=3); in-domain (src0): x=2 y=1 (N_in=3).
  // Token z never appears in-domain — it scores through Laplace smoothing
  // (count 0 + 1), the OOV case the shared-vocabulary design exists for.
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "x x y", "src0"),
      (2L, "x y z", "src1"),
      (3L, "z z", "src1")
    ).toDF("doc_id", "text", "source")
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def tIn(cIn: Int) = math.log(3 + 3.0) - math.log(cIn + 1.0)
  private def tGen(c: Int) = math.log(8 + 3.0) - math.log(c + 1.0)

  test("hand corpus: smoothed cross-entropies and delta selection") {
    val got = TextAnalysis
      .mooreLewisScores(corpus, "doc_id", "text", col("source") === "src0")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))

    val in1 = (2 * tIn(2) + tIn(1)) / 3
    val gen1 = (2 * tGen(3) + tGen(2)) / 3
    assert(got(1L) == ((3L, r6(in1), r6(gen1), r6(in1 - gen1), 1L)))

    val in2 = (tIn(2) + tIn(1) + tIn(0)) / 3 // z: the smoothed-OOV branch
    val gen2 = (tGen(3) + tGen(2) + tGen(3)) / 3
    assert(got(2L) == ((3L, r6(in2), r6(gen2), r6(in2 - gen2), 0L)))

    val in3 = tIn(0)
    val gen3 = tGen(3)
    assert(got(3L) == ((2L, r6(in3), r6(gen3), r6(in3 - gen3), 0L)))
  }

  test("in-domain documents score below out-of-domain ones on average") {
    // The selection property the operator exists for: scoring the corpus
    // it was split from, the in-domain half must rank first.
    val s = spark
    import s.implicits._
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "alpha beta gamma alpha beta", "src0")
      else (i, "delta epsilon zeta delta epsilon", "src1")
    }.toDF("doc_id", "text", "source")
    val scored = TextAnalysis
      .mooreLewisScores(docs, "doc_id", "text", col("source") === "src0")
      .select("doc_id", "delta", "selected")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val (inD, outD) = scored.partition(_._1 % 2 == 0)
    assert(inD.forall(_._2 < 0) && inD.forall(_._3 == 1L))
    assert(outD.forall(_._2 > 0) && outD.forall(_._3 == 0L))
  }
}
