package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Audio multimodal columns: a pure-JVM WAV (RIFF PCM16) codec plus
  * codegen'd waveform analysis over int16 sample tensors.
  *
  * Completes the image (PNG, `ImageOps.encodePng`) / video
  * (`ImageOps.frameSample`) / audio triad of the multimodal-column
  * contract: audio travels as an opaque BinaryType column with typed
  * metadata, only the stages that need samples pay the decode, and the
  * codec is the swappable stub point where a real audio library (ffmpeg
  * bindings etc.) would plug in — the Spark-side plumbing (schema,
  * batch shape, lossless quantized round-trip) is real and oracle-proven.
  *
  * Analysis ops are higher-order Column functions over int16 samples —
  * exact integer arithmetic end-to-end (sums of squares, crossings,
  * rational-weight resampling), so a SQL oracle replays every value
  * bit-for-bit. All are per-row and shuffle-free.
  */
object AudioOps {

  /** Quantize a [-1,1] double tensor to int16 samples with the same
    * floor-based rule as the image path (`ImageOps.quantizeU8` family):
    * floor(clip01((v+1)/2) * 65535) - 32768 — ties impossible, so any
    * engine reproduces it. */
  def quantizeI16(a: Column): Column =
    transform(a, v => (floor(greatest(lit(0.0), least(lit(1.0),
      (v.cast("double") + 1.0) / 2.0)) * 65535) - 32768).cast("int"))

  // ---------------------------------------------------------------- codec

  /** Encode mono int16 samples as a canonical 44-byte-header WAV file. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decode a mono PCM16 WAV. Walks the RIFF chunk list (unknown chunks
    * skipped, odd sizes padded per spec); anything not mono/PCM/16-bit,
    * or truncated, rejects LOUDLY — never a silent misread. */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WAV decode: $msg")
    if (bytes.length < 12) fail(s"file too short (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    if (new String(magic, "US-ASCII") != "RIFF") fail("missing RIFF magic")
    val riffSize = bb.getInt
    if (riffSize < 4 || riffSize.toLong + 8 > bytes.length)
      fail(s"RIFF size $riffSize inconsistent with file length ${bytes.length}")
    bb.get(magic)
    if (new String(magic, "US-ASCII") != "WAVE") fail("missing WAVE form type")

    var sampleRate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8) {
      bb.get(magic)
      val id = new String(magic, "US-ASCII")
      val size = bb.getInt
      if (size < 0 || size > bb.remaining()) fail(s"chunk '$id' size $size overruns file")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too short ($size bytes)")
          val fmtEnd = bb.position() + size
          val audioFormat = bb.getShort
          if (audioFormat != 1) fail(s"audio format $audioFormat unsupported (PCM=1 only)")
          val channels = bb.getShort
          if (channels != 1) fail(s"$channels channels unsupported (mono only)")
          sampleRate = bb.getInt
          if (sampleRate <= 0) fail(s"non-positive sample rate $sampleRate")
          bb.getInt // byte rate (informational)
          bb.getShort // block align (informational)
          val bits = bb.getShort
          if (bits != 16) fail(s"$bits bits/sample unsupported (16 only)")
          bb.position(fmtEnd)
        case "data" =>
          if (sampleRate < 0) fail("data chunk before fmt chunk")
          if (size % 2 != 0) fail(s"odd PCM16 data size $size")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
        case _ =>
          bb.position(bb.position() + size) // unknown chunk: skip
      }
      if (size % 2 == 1 && bb.remaining() > 0) bb.get() // RIFF pad byte
    }
    if (samples == null) fail("no data chunk")
    (sampleRate, samples)
  }

  /** UDF: int samples + rate -> WAV bytes (binary multimodal column). */
  val encodeWav = udf { (samples: Seq[Int], sampleRate: Int) =>
    encodeWavPcm16(samples.map { s =>
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s out of int16 range")
      s.toShort
    }.toArray, sampleRate)
  }

  /** UDF: WAV bytes -> (sample_rate, samples) struct. */
  val decodeWav = udf { (bytes: Array[Byte]) =>
    val (rate, samples) = decodeWavPcm16(bytes)
    WavAudio(rate, samples.map(_.toInt).toSeq)
  }

  // ------------------------------------------------------- waveform analysis

  /** Peak absolute amplitude (long). */
  def peakAbs(a: Column): Column =
    coalesce(array_max(transform(a, v => abs(v.cast("long")))), lit(0L))

  /** Total energy: sum of squared samples, exact in Long. */
  def energy(a: Column): Column =
    aggregate(a, lit(0L), (acc, v) => acc + v.cast("long") * v.cast("long"))

  /** Count of sign changes s(i)*s(i+1) < 0 — the classic zero-crossing
    * voicing / noisiness signal. */
  def zeroCrossings(a: Column): Column =
    when(size(a) <= 1, lit(0L)).otherwise(
      size(filter(sequence(lit(1), size(a) - 1),
        i => element_at(a, i).cast("long") * element_at(a, i + 1).cast("long") < 0))
        .cast("long"))

  /** Per-frame energy over hop-strided frames of `frameLen` samples
    * (the STFT framing grid): array of exact Long sums of squares, one
    * per fully-contained frame. */
  def frameEnergy(a: Column, frameLen: Int, hop: Int): Column = {
    require(frameLen > 0 && hop > 0, "frameLen and hop must be positive")
    val nFrames = (floor((size(a) - frameLen).cast("double") / hop) + 1).cast("int")
    when(size(a) < frameLen, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(0), nFrames - 1), f =>
        aggregate(sequence(lit(1), lit(frameLen)), lit(0L), { (acc, j) =>
          val v = element_at(a, f * hop + j)
          acc + v.cast("long") * v.cast("long")
        })))
  }

  /** Linear resample from `inRate` to `outRate` Hz, emitted scaled by
    * `outRate` so every value is an exact integer: output index i sits at
    * source position i·inRate/outRate, and
    * v·outRate = s(p0)·(outRate−rem) + s(p0+1)·rem with p0 = (i·inRate)
    * div outRate, rem = (i·inRate) mod outRate — integer arithmetic only,
    * no floating point anywhere. Output length floor((n−1)·outRate/inRate)+1
    * (the last exactly-representable source position). */
  def resampleLinearScaled(a: Column, inRate: Int, outRate: Int): Column = {
    require(inRate > 0 && outRate > 0, "rates must be positive")
    val n = size(a)
    val nOut = (floor(((n - 1) * outRate).cast("double") / inRate) + 1).cast("int")
    when(n === 0, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(0), nOut - 1), { i =>
        val num = i.cast("long") * inRate
        // Column `/` is double division; floor recovers the integral
        // quotient exactly at these magnitudes, and rem re-derives from it
        // in pure integer arithmetic.
        val p0 = floor(num / lit(outRate)).cast("int")
        val rem = num - p0.cast("long") * outRate
        val s0 = element_at(a, p0 + 1).cast("long")
        val s1 = element_at(a, least(p0 + 2, n)).cast("long")
        s0 * (lit(outRate.toLong) - rem) + s1 * rem
      }))
  }
}

/** Decoded WAV payload (typed metadata + samples). */
final case class WavAudio(sample_rate: Int, samples: Seq[Int])
