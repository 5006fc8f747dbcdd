package graft.operators

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("group minhash sketch is mergeable and matches per-doc mins") {
    val docs = Seq(
      ("a", Seq(10L, 20L, 30L)),
      ("a", Seq(20L, 40L)),
      ("b", Seq(100L))).toDS()
    def run(parts: Int) = docs.repartition(parts)
      .groupByKey(_._1).mapValues(_._2)
      .agg(Sketches.minhashSketch(4).toColumn)
      .collect().toMap
    val (r1, r7) = (run(1), run(7))
    assert(r1 == r7) // partial-agg merge path gives the same sketch
    // group sketch == fold over the union of member hashes
    val expected = (0 until 4).map { i =>
      Seq(10L, 20L, 30L, 40L).map(x => (Dedup.aCoef(i) * x + Dedup.bCoef(i)) % Dedup.P).min
    }
    assert(r1("a") == expected)
    // identical groups sketch-jaccard to 1.0
    assert(Sketches.sketchJaccard(r1("a"), r1("a")) == 1.0)
  }

  test("native TypedImperativeAggregate equals the typed Aggregator") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      ("a", Seq(10L, 20L, 30L)), ("a", Seq(20L, 40L)), ("b", Seq(100L, 7L)))
      .toDF("g", "xs")
    def native(parts: Int) = docs.repartition(parts).groupBy(col("g"))
      .agg(graft.plans.MinHashSketchAgg.minhashSketchCol(col("xs"), 4).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val typed = docs.as[(String, Seq[Long])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(Sketches.minhashSketch(4).toColumn)
      .collect().map { case (g, s) => g -> s.toSeq }.toMap
    assert(native(1) == typed && native(5) == typed)
  }
}
