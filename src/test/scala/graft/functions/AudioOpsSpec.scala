package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class AudioOpsSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(40)
    .withInitialSeed(org.scalacheck.rng.Seed(46L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------- WAV codec

  test("WAV round-trip: arbitrary int16 samples and rates survive bit-exact") {
    val gen = for {
      n <- Gen.choose(0, 500)
      samples <- Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
      rate <- Gen.choose(1, 192000)
    } yield (samples.map(_.toShort).toArray, rate)
    check(Prop.forAll(gen) { case (samples, rate) =>
      val (gotRate, gotSamples) =
        AudioOps.decodeWavPcm16(AudioOps.encodeWavPcm16(samples, rate))
      gotRate == rate && gotSamples.toSeq == samples.toSeq
    })
  }

  test("WAV decode skips unknown chunks (incl. odd-size padding)") {
    val base = AudioOps.encodeWavPcm16(Array[Short](1, -2, 300), 8000)
    // splice a LIST chunk with an odd payload size between fmt and data
    val (head, tail) = base.splitAt(36) // 12 RIFF header + 24 fmt chunk
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](7, 8, 9) ++ Array[Byte](0) // pad
    val spliced = head ++ extra ++ tail
    // patch RIFF size (bytes 4..7, little-endian)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (rate, samples) = AudioOps.decodeWavPcm16(spliced)
    assert(rate == 8000 && samples.toSeq == Seq[Short](1, -2, 300))
  }

  test("WAV decode rejects malformed files loudly") {
    val good = AudioOps.encodeWavPcm16(Array[Short](5, 6, 7), 44100)
    def mutated(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())
    val cases: Seq[(String, Array[Byte])] = Seq(
      "bad magic" -> mutated { b => b(0) = 'X'.toByte; b },
      "bad form type" -> mutated { b => b(8) = 'X'.toByte; b },
      "truncated data" -> good.dropRight(3),
      "short file" -> good.take(8),
      "stereo" -> mutated { b => b(22) = 2; b },
      "not PCM" -> mutated { b => b(20) = 3; b },
      "8-bit" -> mutated { b => b(34) = 8; b })
    cases.foreach { case (label, bytes) =>
      val e = intercept[IllegalArgumentException](AudioOps.decodeWavPcm16(bytes))
      assert(e.getMessage.startsWith("WAV decode:"), s"$label: ${e.getMessage}")
    }
  }

  test("encode->decode through the UDF binary column") {
    val df = Seq((1, Seq(100, -200, 32767, -32768))).toDF("id", "samples")
      .withColumn("wav", AudioOps.encodeWav(col("samples"), lit(22050)))
      .withColumn("dec", AudioOps.decodeWav(col("wav")))
    val row = df.select(col("dec.sample_rate"), col("dec.samples")).head()
    assert(row.getInt(0) == 22050)
    assert(row.getSeq[Int](1) == Seq(100, -200, 32767, -32768))
  }

  // ------------------------------------------------------ waveform analysis

  test("peak / energy / zero crossings on a hand fixture") {
    val df = Seq(Tuple1(Seq(3, -1, 0, 2, -5))).toDF("s")
    // |.|: 3 1 0 2 5 -> peak 5; energy 9+1+0+4+25=39
    // sign products: 3*-1<0, -1*0, 0*2, 2*-5<0 -> 2 crossings
    val row = df.select(AudioOps.peakAbs(col("s")), AudioOps.energy(col("s")),
      AudioOps.zeroCrossings(col("s"))).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((5L, 39L, 2L)))
    val empty = Seq(Tuple1(Seq.empty[Int])).toDF("s")
    val r2 = empty.select(AudioOps.peakAbs(col("s")), AudioOps.energy(col("s")),
      AudioOps.zeroCrossings(col("s"))).head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("frameEnergy == naive framing on random inputs") {
    val gen = for {
      n <- Gen.choose(0, 120)
      s <- Gen.listOfN(n, Gen.choose(-1000, 1000))
      frameLen <- Gen.choose(1, 20)
      hop <- Gen.choose(1, 20)
    } yield (s, frameLen, hop)
    check(Prop.forAll(gen) { case (s, frameLen, hop) =>
      val got = Seq(Tuple1(s)).toDF("s")
        .select(AudioOps.frameEnergy(col("s"), frameLen, hop)).as[Seq[Long]].head()
      val expect =
        if (s.size < frameLen) Seq.empty[Long]
        else (0 to (s.size - frameLen) / hop).map { f =>
          s.slice(f * hop, f * hop + frameLen).map(v => v.toLong * v).sum
        }
      got == expect
    })
  }

  test("resampleLinearScaled == naive rational interpolation; identity at equal rates") {
    val gen = for {
      n <- Gen.choose(1, 80)
      s <- Gen.listOfN(n, Gen.choose(-32768, 32767))
      inRate <- Gen.choose(1, 48)
      outRate <- Gen.choose(1, 48)
    } yield (s, inRate, outRate)
    check(Prop.forAll(gen) { case (s, inRate, outRate) =>
      val got = Seq(Tuple1(s)).toDF("s")
        .select(AudioOps.resampleLinearScaled(col("s"), inRate, outRate))
        .as[Seq[Long]].head()
      val nOut = (s.size - 1).toLong * outRate / inRate + 1
      val expect = (0L until nOut).map { i =>
        val num = i * inRate
        val p0 = (num / outRate).toInt
        val rem = num % outRate
        val s1 = s(math.min(p0 + 1, s.size - 1))
        s(p0).toLong * (outRate - rem) + s1.toLong * rem
      }
      got == expect
    })
    // equal rates: pure pass-through scaled by outRate
    val s = Seq(7, -9, 11)
    val id = Seq(Tuple1(s)).toDF("s")
      .select(AudioOps.resampleLinearScaled(col("s"), 5, 5)).as[Seq[Long]].head()
    assert(id == s.map(_.toLong * 5))
  }

  test("quantizeI16 covers the full int16 range with floor semantics") {
    val df = Seq(Tuple1(Seq(-1.5, -1.0, 0.0, 1.0, 2.0))).toDF("v")
    val got = df.select(AudioOps.quantizeI16(col("v"))).as[Seq[Int]].head()
    // clip to [0,1] then floor(x * 65535) - 32768:
    // -1.5 -> 0 -> -32768; -1 -> -32768; 0 -> floor(32767.5)-32768 = -1;
    // 1 -> 65535-32768 = 32767; 2 (clipped) -> 32767
    assert(got == Seq(-32768, -32768, -1, 32767, 32767))
  }
}
