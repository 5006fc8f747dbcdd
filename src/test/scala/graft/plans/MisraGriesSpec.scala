package graft.plans

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries summary: size bound, the freq-N/k estimate guarantee and
  * heavy-hitter containment under real partitioned aggregation, and the
  * candidates+recount pipeline's partitioning invariance. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** Adversarial stream: 3 heavy items (well above N/k), a mid band,
    * and a long singleton tail that forces constant decrements. */
  private def stream: Seq[String] = {
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(350)("beta") ++ Seq.fill(300)("gamma")
    val mid = (0 until 10).flatMap(i => Seq.fill(40)(s"mid$i"))
    val tail = (0 until 600).map(i => s"rare$i")
    // deterministic interleave
    (heavy ++ mid ++ tail).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
  }

  private def summarize(k: Int, parts: Int): Map[String, Long] = {
    val df = stream.toDF("item").repartition(parts)
    df.agg(MisraGriesAgg.misraGriesCol(col("item"), k).as("mg"))
      .select(explode(col("mg")).as("c")).select("c.item", "c.est")
      .collect().map { case Row(it: String, est: Long) => it -> est }.toMap
  }

  test("summary holds at most k-1 counters and obeys the MG guarantee") {
    val xs = stream
    val n = xs.length
    val exact = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    Seq(1, 4, 13).foreach { parts =>
      Seq(5, 10, 30).foreach { k =>
        val mg = summarize(k, parts)
        assert(mg.size <= k - 1, s"k=$k parts=$parts size ${mg.size}")
        mg.foreach { case (it, est) =>
          val f = exact(it)
          assert(est <= f && est >= f - n / k,
            s"k=$k parts=$parts item $it est $est freq $f n/k ${n / k}")
        }
        // containment: every item with freq > N/k is present
        exact.filter { case (_, f) => f * k > n }.keys.foreach { it =>
          assert(mg.contains(it), s"k=$k parts=$parts lost heavy hitter $it")
        }
      }
    }
  }

  test("heavyHitters output is exact and invariant to partitioning") {
    val xs = stream
    val n = xs.length
    val exact = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = exact.filter { case (_, f) => f * 10 > n }
      .map { case (it, f) => (it, f, n.toLong) }.toSet
    Seq(1, 4, 13).foreach { parts =>
      val got = Sketches.heavyHitters(
        stream.toDF("item").repartition(parts), "item", k = 10)
        .as[(String, Long, Long)].collect().toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  test("merge re-bounds an oversized union and keeps totals sane") {
    val a = collection.mutable.HashMap("x" -> 10L, "y" -> 6L, "z" -> 3L)
    val b = collection.mutable.HashMap("y" -> 5L, "w" -> 4L, "v" -> 2L)
    val agg = MisraGriesAgg(org.apache.spark.sql.catalyst.expressions.Literal("d"), 4)
    val m = agg.merge(a, b)
    // union had 5 entries {x 10, y 11, z 3, w 4, v 2}; subtracting the
    // 4th-largest (3) leaves x 7, y 8, w 1 — z and v drop to <= 0
    assert(m.toMap === Map("x" -> 7L, "y" -> 8L, "w" -> 1L))
    assert(m.size <= 3)
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = MisraGriesAgg(org.apache.spark.sql.catalyst.expressions.Literal("d"), 8)
    val buf = collection.mutable.HashMap("κλμ 漢字" -> 7L, "plain" -> 2L)
    assert(agg.deserialize(agg.serialize(buf)) === buf)
  }
}
