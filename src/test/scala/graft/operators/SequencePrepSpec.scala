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
}
