package graft.sources

import java.io.{BufferedOutputStream, ByteArrayOutputStream, DataInputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** TFRecord source/sink — the TensorFlow training-data container
  * (length-framed records with masked-CRC32C checksums, payloads as
  * `tf.train.Example` protobufs), written from the public format notes
  * (tensorflow/core/lib/io/record_writer.h framing; example.proto /
  * feature.proto wire schema). Everything is hand-encoded protobuf wire
  * format, the OnnxWriter discipline — no TensorFlow dependency.
  *
  * Framing per record:
  *   uint64 LE length | uint32 LE masked_crc(length bytes)
  *   | payload | uint32 LE masked_crc(payload)
  * with masked_crc(x) = rotr15(crc32c(x)) + 0xa282ead8 — both CRCs are
  * VERIFIED on read and mismatches reject loudly (silent corruption in
  * a training shard is the failure mode the format exists to catch).
  *
  * Example payloads: features { map<string, Feature> } where Feature is
  * one of bytes_list / float_list / int64_list. The writer emits packed
  * numeric lists (the canonical proto3 layout); the reader accepts
  * packed AND unpacked. Spark columns map long→int64_list,
  * string/binary→bytes_list, float→float_list; anything else rejects
  * loudly (tf.train.Example has no double/bool list — cast first).
  *
  * Scale: write is one shard file per partition (no shuffle — exactly
  * how training pipelines shard TFRecords); read parallelism is
  * per-file, the format's unit (records have no sync markers, so a
  * single consolidated file is NOT splittable — the format pushes you
  * to many shards, and so does this source).
  *
  * Independence: tools/make_fixtures.py writes golden.tfrecord with a
  * table-driven software CRC32C and its own proto encoder
  * (ForeignFixturesSpec proves exact decode).
  */
object TfRecord {

  // ---- masked CRC32C framing -------------------------------------------

  private val MaskDelta = 0xa282ead8L

  def maskedCrc32c(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes)
    val crc = c.getValue // unsigned 32-bit in a Long
    val rot = ((crc >>> 15) | (crc << 17)) & 0xFFFFFFFFL
    (rot + MaskDelta) & 0xFFFFFFFFL
  }

  def frameRecord(payload: Array[Byte]): Array[Byte] = {
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(payload.length.toLong).array()
    val bb = ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(lenBytes)
    bb.putInt(maskedCrc32c(lenBytes).toInt)
    bb.put(payload)
    bb.putInt(maskedCrc32c(payload).toInt)
    bb.array()
  }

  /** Streaming record parse with CRC verification; truncation and
    * checksum mismatches reject loudly with the byte offset. */
  def readFramed(in: DataInputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = _
      private var offset = 0L
      private def advance(): Unit = {
        val head = new Array[Byte](8)
        val first = in.read(head, 0, 1)
        if (first < 0) { nextRec = null; in.close(); return } // clean EOF
        try {
          in.readFully(head, 1, 7)
          val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
          val len = bb.getLong(0)
          require(len >= 0 && len < Int.MaxValue,
            s"tfrecord: absurd record length $len at offset $offset")
          val lenCrc = readLeInt()
          require((lenCrc & 0xFFFFFFFFL) == maskedCrc32c(head),
            s"tfrecord: length CRC mismatch at offset $offset")
          val payload = new Array[Byte](len.toInt)
          in.readFully(payload)
          val payCrc = readLeInt()
          require((payCrc & 0xFFFFFFFFL) == maskedCrc32c(payload),
            s"tfrecord: payload CRC mismatch at offset $offset")
          offset += 8 + 4 + len + 4
          nextRec = payload
        } catch {
          case _: EOFException => throw new IllegalArgumentException(
            s"tfrecord: truncated record at offset $offset")
        }
      }
      private def readLeInt(): Long = {
        val b = new Array[Byte](4)
        in.readFully(b)
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong
      }
      advance()
      def hasNext: Boolean = nextRec != null
      def next(): Array[Byte] = {
        val r = nextRec; advance(); r
      }
    }

  // ---- tf.train.Example wire codec -------------------------------------

  sealed trait FeatureVal
  final case class I64s(v: Seq[Long]) extends FeatureVal
  final case class Bs(v: Seq[Array[Byte]]) extends FeatureVal
  final case class F32s(v: Seq[Float]) extends FeatureVal

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v = v >>> 7
    }
    out.write(v.toInt)
  }

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
      bytes: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes)
  }

  private def encodeFeature(fv: FeatureVal): Array[Byte] = {
    val inner = new ByteArrayOutputStream()
    fv match {
      case Bs(vs) => // BytesList: repeated bytes value = 1
        vs.foreach(b => writeLenDelim(inner, 1, b))
      case F32s(vs) => // FloatList: packed repeated float value = 1
        val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(bb.putFloat)
        if (vs.nonEmpty) writeLenDelim(inner, 1, bb.array())
      case I64s(vs) => // Int64List: packed repeated int64 value = 1
        val pk = new ByteArrayOutputStream()
        vs.foreach(v => writeVarint(pk, v))
        if (vs.nonEmpty) writeLenDelim(inner, 1, pk.toByteArray)
    }
    val listBytes = inner.toByteArray
    val out = new ByteArrayOutputStream()
    val fieldNo = fv match {
      case _: Bs => 1; case _: F32s => 2; case _: I64s => 3
    }
    writeLenDelim(out, fieldNo, listBytes)
    out.toByteArray
  }

  /** Example bytes from features IN THE GIVEN ORDER (deterministic —
    * proto map layout is writer-defined). */
  def encodeExample(features: Seq[(String, FeatureVal)]): Array[Byte] = {
    val feats = new ByteArrayOutputStream()
    features.foreach { case (name, fv) =>
      val entry = new ByteArrayOutputStream()
      writeLenDelim(entry, 1, name.getBytes("UTF-8"))
      writeLenDelim(entry, 2, encodeFeature(fv))
      writeLenDelim(feats, 1, entry.toByteArray) // map entry
    }
    val out = new ByteArrayOutputStream()
    writeLenDelim(out, 1, feats.toByteArray) // Example.features = 1
    out.toByteArray
  }

  private final class ProtoReader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        require(pos < end, "tfrecord: truncated varint")
        val x = b(pos) & 0xFF; pos += 1
        acc |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return acc
        shift += 7
        require(shift < 64, "tfrecord: varint overflow")
      }
      acc
    }
    def lenDelim(): (Int, Int) = { // (start, end)
      val len = varint()
      require(len >= 0 && pos + len <= end, "tfrecord: truncated field")
      val s = pos; pos += len.toInt; (s, pos)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end); pos += 8
      case 2 => lenDelim(); ()
      case 5 => require(pos + 4 <= end); pos += 4
      case w => throw new IllegalArgumentException(s"tfrecord: wire type $w")
    }
  }

  private def decodeList(b: Array[Byte], s: Int, e: Int, fieldNo: Int): FeatureVal = {
    val r = new ProtoReader(b, s, e)
    fieldNo match {
      case 1 =>
        val vs = Seq.newBuilder[Array[Byte]]
        while (r.hasMore) {
          val tag = r.varint()
          require((tag >> 3) == 1 && (tag & 7) == 2, s"BytesList tag $tag")
          val (bs, be) = r.lenDelim()
          vs += java.util.Arrays.copyOfRange(b, bs, be)
        }
        Bs(vs.result())
      case 2 =>
        val vs = Seq.newBuilder[Float]
        while (r.hasMore) {
          val tag = r.varint()
          require((tag >> 3) == 1, s"FloatList tag $tag")
          (tag & 7) match {
            case 2 => // packed
              val (ps, pe) = r.lenDelim()
              require((pe - ps) % 4 == 0, "FloatList packed length")
              val bb = ByteBuffer.wrap(b, ps, pe - ps).order(ByteOrder.LITTLE_ENDIAN)
              (0 until (pe - ps) / 4).foreach(_ => vs += bb.getFloat())
            case 5 => // unpacked fixed32
              require(r.pos + 4 <= r.end, "tfrecord: truncated fixed32")
              val bb = ByteBuffer.wrap(b, r.pos, 4).order(ByteOrder.LITTLE_ENDIAN)
              vs += bb.getFloat(); r.pos += 4
            case w => throw new IllegalArgumentException(s"FloatList wire $w")
          }
        }
        F32s(vs.result())
      case 3 =>
        val vs = Seq.newBuilder[Long]
        while (r.hasMore) {
          val tag = r.varint()
          require((tag >> 3) == 1, s"Int64List tag $tag")
          (tag & 7) match {
            case 2 => // packed
              val (ps, pe) = r.lenDelim()
              val pr = new ProtoReader(b, ps, pe)
              while (pr.hasMore) vs += pr.varint()
            case 0 => vs += r.varint() // unpacked
            case w => throw new IllegalArgumentException(s"Int64List wire $w")
          }
        }
        I64s(vs.result())
      case f => throw new IllegalArgumentException(s"Feature field $f")
    }
  }

  def decodeExample(bytes: Array[Byte]): Map[String, FeatureVal] = {
    val top = new ProtoReader(bytes, 0, bytes.length)
    var out = Map.empty[String, FeatureVal]
    while (top.hasMore) {
      val tag = top.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) { // Example.features
        val (fs, fe) = top.lenDelim()
        val feats = new ProtoReader(bytes, fs, fe)
        while (feats.hasMore) {
          val ftag = feats.varint()
          require((ftag >> 3) == 1 && (ftag & 7) == 2, s"Features tag $ftag")
          val (es, ee) = feats.lenDelim()
          val entry = new ProtoReader(bytes, es, ee)
          var key: String = null
          var value: FeatureVal = null
          while (entry.hasMore) {
            val etag = entry.varint()
            (etag >> 3, etag & 7) match {
              case (1, 2) =>
                val (ks, ke) = entry.lenDelim()
                key = new String(bytes, ks, ke - ks, "UTF-8")
              case (2, 2) =>
                val (vs, ve) = entry.lenDelim()
                val fr = new ProtoReader(bytes, vs, ve)
                while (fr.hasMore) {
                  val vtag = fr.varint()
                  require((vtag & 7) == 2, s"Feature wire ${vtag & 7}")
                  val (ls, le) = fr.lenDelim()
                  value = decodeList(bytes, ls, le, (vtag >> 3).toInt)
                }
              case _ => entry.skip((etag & 7).toInt)
            }
          }
          require(key != null, "tfrecord: map entry without key")
          if (value != null) out += key -> value
        }
      } else top.skip((tag & 7).toInt)
    }
    out
  }

  // ---- DataFrame bridge -------------------------------------------------

  private def supported(dt: DataType): Boolean = dt match {
    case LongType | StringType | BinaryType | FloatType => true
    case _ => false
  }

  /** One .tfrecord shard per partition; columns map long→int64_list,
    * string/binary→bytes_list, float→float_list. */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    schema.fields.foreach(f => require(supported(f.dataType),
      s"tfrecord: unsupported column type ${f.dataType} for '${f.name}' " +
        "(tf.train.Example has long/string/binary/float lists — cast first)"))
    ByteStore.mkdirs(dir)
    ByteStore.list(dir).filter(e => !e.isDir && e.name.endsWith(".tfrecord"))
      .foreach(e => ByteStore.deleteFile(e.path))
    val names = schema.fields.map(_.name)
    val types = schema.fields.map(_.dataType)
    val hconf = ByteStore.confSnapshot(df.sparkSession)
    df.rdd.mapPartitionsWithIndex { (pi, it) =>
      ByteStore.install(hconf) // executor JVMs have no session
      val out = new BufferedOutputStream(ByteStore.create(
        ByteStore.join(dir, f"part-$pi%05d.tfrecord")))
      var n = 0L
      it.foreach { row =>
        val feats = names.indices.map { i =>
          val fv: FeatureVal =
            if (row.isNullAt(i)) types(i) match {
              case LongType => I64s(Seq.empty)
              case FloatType => F32s(Seq.empty)
              case _ => Bs(Seq.empty)
            }
            else types(i) match {
              case LongType => I64s(Seq(row.getLong(i)))
              case FloatType => F32s(Seq(row.getFloat(i)))
              case StringType => Bs(Seq(row.getString(i).getBytes("UTF-8")))
              case BinaryType => Bs(Seq(row.getAs[Array[Byte]](i)))
              case t => throw new IllegalStateException(t.toString)
            }
          names(i) -> fv
        }
        out.write(frameRecord(encodeExample(feats)))
        n += 1
      }
      out.close()
      Iterator.single(n)
    }.count()
    ()
  }

  /** Read every shard in `dir` with a caller-provided schema (the
    * format carries none); singleton lists decode to scalars, an empty
    * list to null. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    schema.fields.foreach(f => require(supported(f.dataType),
      s"tfrecord: unsupported column type ${f.dataType} for '${f.name}'"))
    val paths = ByteStore.list(dir)
      .filter(e => !e.isDir && e.name.endsWith(".tfrecord"))
      .map(_.path).sorted
    require(paths.nonEmpty, s"no .tfrecord files in $dir")
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(schema))
    val fields = schema.fields
    import spark.implicits._
    spark.createDataset(paths).flatMap { p =>
      val in = new DataInputStream(new java.io.BufferedInputStream(
        ByteStore.openStream(p)))
      readFramed(in).map { payload =>
        val m = decodeExample(payload)
        Row.fromSeq(fields.toIndexedSeq.map { f =>
          m.get(f.name) match {
            case None => null
            case Some(I64s(Seq())) | Some(Bs(Seq())) | Some(F32s(Seq())) => null
            case Some(I64s(Seq(v))) if f.dataType == LongType => v
            case Some(F32s(Seq(v))) if f.dataType == FloatType => v
            case Some(Bs(Seq(v))) if f.dataType == StringType => new String(v, "UTF-8")
            case Some(Bs(Seq(v))) if f.dataType == BinaryType => v
            case Some(other) => throw new IllegalArgumentException(
              s"tfrecord: feature '${f.name}' ($other) does not decode as ${f.dataType}")
          }
        })
      }
    }(enc)
  }
}
