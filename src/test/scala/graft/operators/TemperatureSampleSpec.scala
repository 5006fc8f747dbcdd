package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col => cCol}
import org.apache.spark.sql.functions._

/** Temperature (alpha=0.5) stratum rebalancing: target arithmetic,
  * exact smallest-hash selection, and the two-phase bucketed rank's
  * equivalence to a global per-stratum rank. */
class TemperatureSampleSpec extends SparkSpec {

  // en:100 fr:9 de:1 -> sqrt weights 10/3/1 (Σ=14); frac=0.5 -> S=55;
  // targets floor(55·round(w/14,6)+0.5) = 39 / 12 / 4 — fr and de are
  // up-weighted far beyond their natural share (fr natural: 55·9/110≈4.5)
  private def corpus = {
    val s = spark
    import s.implicits._
    val rows = (0L until 100L).map(i => (i, "en")) ++
      (100L until 109L).map(i => (i, "fr")) ++ Seq((109L, "de"))
    rows.toDF("doc_id", "lang")
  }

  private def hash(id: Long): Long = (id * 2654435761L) % 1000003L

  test("targets, selection counts, and exact smallest-hash winners") {
    val got = Mixing.temperatureSample(corpus, "doc_id", "lang", 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == 110)
    val byLang = got.groupBy(_._2)
    assert(byLang("en").head._5 == 39L)
    assert(byLang("fr").head._5 == 12L)
    assert(byLang("de").head._5 == 4L)
    // selected = min(n_target, n_docs) per stratum
    assert(byLang("en").count(_._4 == 1L) == 39)
    assert(byLang("fr").count(_._4 == 1L) == 9) // only 9 fr docs exist
    assert(byLang("de").count(_._4 == 1L) == 1)
    // ranks are a permutation of 1..n_l ordered by (hash, id)
    for ((lang, rows) <- byLang) {
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, lang)
      val expected = rows.map(_._1).sortBy(id => (hash(id), id))
      val byRank = rows.sortBy(_._3).map(_._1)
      assert(byRank.toSeq == expected.toSeq, s"rank order mismatch for $lang")
    }
    // winners are exactly the n_target smallest hashes
    val enSel = byLang("en").filter(_._4 == 1L).map(_._1).toSet
    val enExp = byLang("en").map(_._1).sortBy(id => (hash(id), id)).take(39).toSet
    assert(enSel == enExp)
  }

  test("two-phase bucketed rank equals the single-bucket global rank") {
    val one = Mixing.temperatureSample(corpus, "doc_id", "lang", 0.5, nBuckets = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    for (b <- Seq(4, 64, 1024)) {
      val multi = Mixing.temperatureSample(corpus, "doc_id", "lang", 0.5, nBuckets = b)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
      assert(multi.toSeq == one.toSeq, s"nBuckets=$b")
    }
  }

  test("invalid sampleFrac rejects") {
    intercept[IllegalArgumentException] {
      Mixing.temperatureSample(corpus, "doc_id", "lang", 0.0)
    }
    intercept[IllegalArgumentException] {
      Mixing.temperatureSample(corpus, "doc_id", "lang", 1.5)
    }
  }

  test("epochShuffle: complete per epoch, contiguous shard positions, epochs differ") {
    val s = spark
    import s.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val got = Mixing.epochShuffle(docs, "doc_id", nShards = 4, nEpochs = 2)
      .as[(Long, Long, Long, Long)].collect()
    // every doc exactly once per epoch
    assert(got.length === 400)
    (0L to 1L).foreach { e =>
      val ep = got.filter(_._1 == e)
      assert(ep.map(_._2).sorted.toSeq === (0L until 200L))
      // positions within each shard are 1..n contiguous
      ep.groupBy(_._3).foreach { case (shard, rs) =>
        assert(rs.map(_._4).sorted.toSeq === (1L to rs.length.toLong),
          s"epoch $e shard $shard")
      }
      // shards in range
      assert(ep.forall(r => r._3 >= 0 && r._3 < 4))
    }
    // the two epochs are different permutations (shard or pos moves)
    val e0 = got.filter(_._1 == 0L).map(r => r._2 -> ((r._3, r._4))).toMap
    val e1 = got.filter(_._1 == 1L).map(r => r._2 -> ((r._3, r._4))).toMap
    assert((0L until 200L).count(d => e0(d) != e1(d)) > 150,
      "epochs should be near-independent permutations")
    // partitioning invariance
    val re = Mixing.epochShuffle(docs.repartition(13), "doc_id",
      nShards = 4, nEpochs = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(re.toSeq === got.sortBy(r => (r._1, r._2)).toSeq)
  }
}
