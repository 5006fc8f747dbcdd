package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

class SequencePrepSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(25)
    .withInitialSeed(org.scalacheck.rng.Seed(52L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  test("chunkTokens == naive stride windows; chunks cover the doc exactly") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val gen = for {
      n <- Gen.choose(1, 120)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
      size <- Gen.choose(1, 20)
      overlap <- Gen.choose(0, size - 1)
    } yield (toks, size, overlap)
    check(Prop.forAll(gen) { case (toks, size, overlap) =>
      val stride = size - overlap
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = SequencePrep.chunkTokens(df, "doc_id", "text", size, overlap)
        .select("chunk_id", "start_tok", "chunk_text")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      val expect = (0 until math.ceil(toks.size.toDouble / stride).toInt).map { c =>
        (c.toLong, (c * stride).toLong,
          toks.slice(c * stride, math.min(c * stride + size, toks.size)).mkString(" "))
      }
      got == expect
    })
  }

  test("packSequences == a naive sequential packer per stratum") {
    val gen = for {
      n <- Gen.choose(1, 60)
      lens <- Gen.listOfN(n, Gen.choose(1, 300))
      budget <- Gen.choose(16, 512)
    } yield (lens, budget)
    check(Prop.forAll(gen) { case (lens, budget) =>
      val rows = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, if (i % 2 == 0) "a" else "b", n.toLong)
      }
      val got = SequencePrep.packSequences(rows.toDF("id", "s", "n_tok"),
          "id", "s", "n_tok", budget)
        .select("id", "bin", "offset", "n_bins")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      // naive: walk each stratum in id order, advancing a token cursor
      val expect = rows.groupBy(_._2).flatMap { case (_, docs) =>
        var cursor = 0L
        docs.sortBy(_._1).map { case (id, _, n) =>
          val bin = cursor / budget; val off = cursor % budget
          val nBins = (cursor + n - 1) / budget - bin + 1
          cursor += n
          id -> ((bin, off, nBins))
        }
      }
      got == expect
    })
  }

  test("packing invariants: offsets in [0, budget), bins gapless, spans consistent") {
    val rows = (0L until 100L).map(i => (i, "s", (i * 37 % 95 + 1)))
    val out = SequencePrep.packSequences(rows.toDF("id", "s", "n_tok"),
      "id", "s", "n_tok", budget = 128).collect()
    out.foreach { r =>
      val (off, nBins, n) = (r.getAs[Long]("offset"), r.getAs[Long]("n_bins"), r.getAs[Long]("n_tok"))
      assert(off >= 0 && off < 128)
      // a doc starting at in-bin offset off with n tokens spans this many bins
      assert(nBins == (off + n - 1) / 128 + 1)
    }
    val lastBin = out.map(r => r.getAs[Long]("bin") + r.getAs[Long]("n_bins") - 1).max
    val total = rows.map(_._3).sum
    assert(lastBin == (total - 1) / 128)
  }

  test("sentencePack: greedy boundaries, oversized sentence isolated, edges") {
    val s = spark
    import s.implicits._
    def sent(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      // 3+4 fit an 8-budget together; 5 forces a flush; 2 joins 5? no:
      // 5+2=7 <= 8 joins -> chunks [7, 7]
      (1L, s"${sent(3)}. ${sent(4)}! ${sent(5)}? ${sent(2)}."),
      // a 12-token sentence alone exceeds the budget -> its own chunk
      (2L, s"${sent(12)}. ${sent(3)}."),
      (3L, ""), // empty -> 0 sentences, 0 chunks
      (4L, sent(8))) // no terminal punctuation: one sentence, one chunk
      .toDF("doc_id", "text")
    val got = SequencePrep.sentencePack(docs, "doc_id", "text", budget = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def fp(xs: Seq[Long]) = xs.foldLeft(7L)((a, x) => (a * 31 + x) % 1000000007L)
    // doc 1: sentences (4,4,5,3 tokens — terminal '.' rides the last
    // word of each sentence except where the split consumed it)... the
    // splitter consumes '[.!?]+ +', so tokens are bare words except the
    // final sentence's trailing '.': [3, 4, 5, 2] -> chunks [7, 7]
    assert(got(1L) == ((4L, 2L, 7L, fp(Seq(7L, 7L)))), s"doc1 ${got(1L)}")
    // doc 2: [12, 3] -> oversized 12 isolated, then 3
    assert(got(2L) == ((2L, 2L, 12L, fp(Seq(12L, 3L)))), s"doc2 ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, 7L)), s"doc3 ${got(3L)}")
    assert(got(4L) == ((1L, 1L, 8L, fp(Seq(8L)))), s"doc4 ${got(4L)}")
  }

  test("lengthBucketBatches: reference batching, waste bound, full cover") {
    val s = spark
    import s.implicits._
    // doc i has (i % 37) + 1 tokens — spans several width-4 buckets
    val docs = (0 until 100).map { i =>
      (i.toLong, (1 to (i % 37) + 1).map(j => s"t$j").mkString(" "))
    }
    val width = 4; val batch = 3; val shards = 2
    val got = SequencePrep.lengthBucketBatches(
      docs.toDF("doc_id", "text"), "doc_id", "text", width, batch, shards)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // plain-Scala reference
    val ref = docs.map { case (id, t) => (id, t.split("\\s+").length.toLong) }
      .groupBy { case (id, n) => ((math.max(n, 1) - 1) / width, id % shards) }
      .flatMap { case ((bucket, shard), rows) =>
        rows.sortBy { case (id, n) => (-n, id) }
          .grouped(batch).zipWithIndex.map { case (g, bi) =>
            val ns = g.map(_._2)
            (bucket, shard, bi.toLong, g.length.toLong, ns.max, ns.sum,
              g.length * ns.max - ns.sum)
          }
      }.toSeq
    assert(got.sortBy(r => (r._1, r._2, r._3)) ===
      ref.sortBy(r => (r._1, r._2, r._3)))
    // every doc appears in exactly one batch, and waste < width per row
    assert(got.map(_._4).sum === 100L)
    got.foreach { r =>
      assert(r._7 <= r._4 * (width - 1), s"waste bound violated: $r")
      assert(r._4 <= batch, s"oversized batch: $r")
    }
  }

  test("lengthBucketBatches: empty doc lands in bucket 0") {
    val s = spark
    import s.implicits._
    val got = SequencePrep.lengthBucketBatches(
      Seq((1L, ""), (2L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", width = 4, batchSize = 8, nShards = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1)
    // split of "" yields one empty token in both engines: n_tok = 1
    assert(got.head === ((0L, 0L, 0L, 2L, 2L, 3L, 1L)))
  }
}
