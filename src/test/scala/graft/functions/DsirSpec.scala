package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR hashed importance weights: exact equality with a plain-Scala
  * reference on a hand corpus, selection behavior on a planted
  * two-population corpus, and the fixed-B model-size property. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 16

  /** Plain-Scala replay: hashed unigram+bigram buckets, Laplace ratio. */
  private def ref(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Double, Long)] = {
    def polyHash(s: String): Long =
      s.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def feats(text: String): Seq[Long] = {
      val toks = text.toLowerCase.trim.split("\\s+").toSeq
      val uni = toks.map(polyHash)
      val bi = toks.sliding(2).filter(_.size == 2).map(g => polyHash(g.mkString(" "))).toSeq
      (uni ++ bi).map(h => h % B)
    }
    val all = docs.flatMap { case (id, t, d) => feats(t).map(b => (id, d, b)) }
    val nT = all.count(_._2).toLong
    val nS = all.count(!_._2).toLong
    val tcnt = all.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val scnt = all.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    docs.map { case (id, t, _) =>
      val fs = feats(t)
      val w = fs.groupBy(identity).map { case (b, xs) =>
        val term = (math.log(tcnt.getOrElse(b, 0L) + 1.0) - math.log(nT + B.toDouble)) -
          (math.log(scnt.getOrElse(b, 0L) + 1.0) - math.log(nS + B.toDouble))
        xs.size * term
      }.sum
      val r6 = BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((fs.size.toLong, r6, if (r6 > 0.0) 1L else 0L))
    }.toMap
  }

  private def run(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Double, Long)] =
    TextAnalysis.dsirWeights(docs.toDF("doc_id", "text", "in_dom"),
      "doc_id", "text", col("in_dom"), nBuckets = B)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("matches the plain-Scala reference on a hand corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha", true),
      (2L, "delta epsilon", true),
      (3L, "alpha beta", false),
      (4L, "zeta eta theta iota kappa", false),
      (5L, "alpha alpha alpha", false))
    val got = run(docs)
    val want = ref(docs)
    docs.foreach { case (id, _, _) =>
      val (gn, gw, gs) = got(id)
      val (wn, ww, ws) = want(id)
      assert(gn === wn, s"doc $id n_feat")
      assert(math.abs(gw - ww) <= 1e-6 + 1e-12, s"doc $id logw $gw vs $ww")
      assert(gs === ws, s"doc $id selected")
    }
  }

  test("planted two-population corpus: target-vocab docs select, source-vocab docs do not") {
    // disjoint vocabularies -> every target doc's buckets lean target
    val tgtDocs = (0 until 10).map(i => (i.toLong, s"amber bronze copper t$i", true))
    val srcDocs = (10 until 30).map(i => (i.toLong, s"iron nickel zinc s$i", false))
    // probes: unseen docs from each vocabulary, scored but out-of-domain
    val probeT = Seq((100L, "amber bronze copper", false))
    val got = run(tgtDocs ++ srcDocs ++ probeT)
    tgtDocs.foreach { case (id, _, _) =>
      assert(got(id)._3 === 1L, s"target doc $id not selected (${got(id)._2})")
    }
    srcDocs.foreach { case (id, _, _) =>
      assert(got(id)._3 === 0L, s"source doc $id selected (${got(id)._2})")
    }
    assert(got(100L)._3 === 1L, "target-vocab probe should select")
  }

  test("n_feat counts unigrams + bigrams") {
    val got = run(Seq((1L, "a b c", true), (2L, "solo", false)))
    assert(got(1L)._1 === 5L) // 3 unigrams + 2 bigrams
    assert(got(2L)._1 === 1L) // 1 unigram, no bigram
  }
}
