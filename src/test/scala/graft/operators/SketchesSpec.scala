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

  test("count-min: estimates upper-bound true counts, exact when unsaturated, shard-mergeable") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7L)
    // zipfish key stream: key k appears ~ 200/k times
    val occurrences = (1 to 40).flatMap(k => Seq.fill(200 / k)(k.toLong * 7919 % 1000003))
    val items = rnd.shuffle(occurrences).toDF("khash")
    val sketch = Sketches.countMinSketch(items, "khash", depth = 4, width = 256)
    val keys = items.select("khash").distinct()
    val est = Sketches.cmsEstimate(sketch, keys, "khash", depth = 4, width = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = occurrences.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"CMS estimate ${est(k)} below true count $t for $k")
    }
    // 40 keys into 256 slots x 4 rows: the heaviest key should estimate
    // exactly (collisions on all 4 rows for the top key are vanishingly
    // unlikely at this load factor)
    val top = truth.maxBy(_._2)
    assert(est(top._1) == top._2)
    // mergeability: sum of shard sketches == whole-corpus sketch
    val parts = occurrences.splitAt(occurrences.size / 2)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cells(sketch)
    val merged = cells(
      Sketches.countMinSketch(parts._1.toDF("khash"), "khash", 4, 256)
        .union(Sketches.countMinSketch(parts._2.toDF("khash"), "khash", 4, 256))
        .groupBy(col("row"), col("slot")).agg(sum(col("cnt")).as("cnt")))
    assert(merged == whole)
  }

  test("HLL: small-range linear counting, sane estimates, max-mergeable registers") {
    import org.apache.spark.sql.functions._
    // 6 distinct keys, heavy duplication -> v0 > 0 -> linear-counting path
    val small = Seq.fill(50)(Seq(3L, 999L, 120007L, 88L, 40123L, 777777L)).flatten
      .map(k => ("g", k)).toDF("g", "khash")
    val regsS = Sketches.hllRegisters(small, "khash", Seq("g"), p = 6)
    val estS = Sketches.hllEstimate(regsS, Seq("g"), p = 6).head()
    assert(estS.getAs[Long]("v0") > 0)
    val e = estS.getAs[Double]("hll_est")
    assert(e > 2.0 && e < 12.0, s"linear-counting estimate $e far from 6")
    // larger cardinality: estimate within +-35% of 500 (m=64 -> ~13% rse)
    val big = (0 until 500).map(i => ("g", (i * 2654435761L + 12345) % 1000000007L))
      .toDF("g", "khash")
    val estB = Sketches.hllEstimate(
      Sketches.hllRegisters(big, "khash", Seq("g"), p = 6), Seq("g"), p = 6).head()
    val eb = estB.getAs[Double]("hll_est")
    assert(eb > 325 && eb < 675, s"estimate $eb far from 500")
    // mergeability: cell-wise max of shard registers == whole registers
    def regCells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val (s1, s2) = (0 until 500).map(i => ("g", (i * 2654435761L + 12345) % 1000000007L)).splitAt(250)
    val merged = Sketches.hllRegisters(s1.toDF("g", "khash"), "khash", Seq("g"), 6)
      .union(Sketches.hllRegisters(s2.toDF("g", "khash"), "khash", Seq("g"), 6))
      .groupBy(col("g"), col("reg")).agg(max(col("maxrho")).as("maxrho"))
    assert(regCells(merged) == regCells(
      Sketches.hllRegisters(big, "khash", Seq("g"), 6)))
  }

  test("bloom filter: no false negatives, absent keys mostly miss, shards merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val keys = (0 until 300).map(i => (i * 2654435761L + 99) % 1000000007L)
    val items = keys.map(Tuple1(_)).toDF("khash")
    val bits = Sketches.bloomBits(items, "khash", k = 4, m = 8192)
    // every inserted key MUST hit (the defining guarantee)
    val hits = Sketches.bloomMightContain(bits, items, "khash", k = 4, m = 8192)
    assert(hits.where(col("might_contain") === 0).count() == 0)
    // absent keys: at kn/m = 0.15 the FP rate is ~ (1-e^-0.15)^4 ~ 4e-4,
    // so 300 fresh keys should nearly all miss (allow a generous few)
    val absent = (0 until 300).map(i => (i * 40503L * 65537L + 7) % 1000000007L)
      .filterNot(keys.toSet).map(Tuple1(_)).toDF("khash")
    val fp = Sketches.bloomMightContain(bits, absent, "khash", k = 4, m = 8192)
      .where(col("might_contain") === 1).count()
    assert(fp <= 5, s"false-positive count $fp implausibly high")
    // mergeability: union of shard bit sets == whole-corpus bit set
    val (s1, s2) = keys.splitAt(150)
    val merged = Sketches.bloomBits(s1.map(Tuple1(_)).toDF("khash"), "khash", 4, 8192)
      .union(Sketches.bloomBits(s2.map(Tuple1(_)).toDF("khash"), "khash", 4, 8192))
      .distinct()
    def bitSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    assert(bitSet(merged) == bitSet(bits))
  }

  test("HDR quantile sketch: relative error bound, shard mergeability, negative reject") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    // magnitudes spread over 6 decades so many (shift, sub) cells engage
    val vals = (0 until 5000).map(_ => math.abs(rnd.nextLong()) % (1L << (3 + rnd.nextInt(40))))
    val df = vals.map(Tuple1(_)).toDF("v")
    val s = 7
    val qs = Seq(0.1, 0.5, 0.9, 0.99, 1.0)
    val est = Sketches.hdrQuantiles(Sketches.hdrCells(df, "v", s), qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val exact = sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)
      val e = est(q)
      // lower bound of the containing cell: e <= exact, off by < 2^(1-s) rel
      assert(e <= exact, s"q=$q est $e above exact $exact")
      assert(exact - e <= math.max(1L, (exact * math.pow(2.0, 1 - s)).toLong + 1),
        s"q=$q est $e too far below exact $exact")
    }
    // shard mergeability: union of per-shard cells -> same estimates
    val (s1, s2) = vals.splitAt(2500)
    val merged = Sketches.hdrCells(s1.map(Tuple1(_)).toDF("v"), "v", s)
      .union(Sketches.hdrCells(s2.map(Tuple1(_)).toDF("v"), "v", s))
    val est2 = Sketches.hdrQuantiles(merged, qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(est2 == est)
    val e = intercept[Exception] {
      Sketches.hdrCells(Seq(Tuple1(-5L)).toDF("v"), "v", s).collect()
    }
    assert(e.getMessage.contains("negative value")
      || e.getCause != null && e.getCause.getMessage.contains("negative value"))
  }
}
