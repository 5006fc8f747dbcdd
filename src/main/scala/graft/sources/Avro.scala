package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro Object Container File source/sink — the one mainstream
  * data-interchange format the suite lacked next to parquet/ORC/JSONL/
  * WARC/zarr/netCDF/HDF4/HDF5/WAV/PNG/ONNX. Spark ships the Avro CORE
  * jars but not the spark-avro DataSource module, so the bridge is
  * mapPartitions over the container codec (Avro 1.12 spec: magic
  * `Obj\1`, metadata map with avro.schema/avro.codec, 16-byte sync
  * marker, deflate-compressed blocks) — one container file per
  * partition on write, per-file streaming decode on read.
  *
  * Schema resolution for the testdata tables' types: long/int/double/
  * float/boolean/string/binary map to their Avro primitives, timestamps
  * to long + timestamp-micros logical type, and every nullable Spark
  * field to the canonical ["null", T] union. The independence check is
  * a Python-stdlib container writer in tools/make_fixtures.py
  * (ForeignFixturesSpec reads its golden.avro).
  *
  * Scale: write is embarrassingly parallel (one file per partition, no
  * shuffle); [[read]] parallelism is per-file, the Avro-idiomatic unit
  * (pipelines shard into many container files by convention). For a
  * CONSOLIDATED single container bigger than one task, [[readSplit]]
  * applies the suite's two-phase pattern via the format's own split
  * design: byte ranges fan out, each task syncs forward to the next
  * 16-byte block marker and decodes blocks whose start lies inside its
  * range — the Hadoop input-split contract, so no driver block scan is
  * needed at all.
  */
object Avro {

  /** Spark -> Avro schema (record of nullable unions). */
  def avroSchema(schema: StructType, name: String = "topLevelRecord"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType | TimestampNTZType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other =>
          throw new IllegalArgumentException(s"unsupported Avro export type $other")
      }
      val t = if (f.nullable) Schema.createUnion(
        java.util.List.of(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** Avro -> Spark schema (recognizing the nullable-union and
    * timestamp-micros conventions). */
  def sparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, "top level must be a record")
    StructType(schema.getFields.asScala.map { f =>
      val (base, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val ts = f.schema().getTypes.asScala
          require(ts.size == 2 && ts.head.getType == Schema.Type.NULL,
            s"only [null, T] unions supported, got ${f.schema()}")
          (ts(1), true)
        case _ => (f.schema(), false)
      }
      val dt = base.getType match {
        case Schema.Type.LONG =>
          if (base.getLogicalType != null
            && base.getLogicalType.getName == "timestamp-micros") TimestampType
          else LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
      }
      StructField(f.name, dt, nullable)
    }.toArray)
  }

  /** Write `df` to `dir` as one container file per partition. */
  def write(df: DataFrame, dir: String, codec: String = "deflate"): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    ByteStore.mkdirs(dir)
    // overwrite semantics: a prior run with more partitions must not
    // leave stale part files behind
    ByteStore.list(dir).filter(e => !e.isDir && e.name.endsWith(".avro"))
      .foreach(e => ByteStore.deleteFile(e.path))
    val hconf = ByteStore.confSnapshot(df.sparkSession)
    df.rdd.mapPartitionsWithIndex { (pi, it) =>
      ByteStore.install(hconf) // executor JVMs have no session
      val sch = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      codec match {
        case "deflate" => w.setCodec(CodecFactory.deflateCodec(6))
        case "null" => ()
        case other => throw new IllegalArgumentException(s"unsupported codec $other")
      }
      w.create(sch, ByteStore.create(ByteStore.join(dir, f"part-$pi%05d.avro")))
      var n = 0L
      it.foreach { row =>
        val rec = new GenericData.Record(sch)
        schema.fields.zipWithIndex.foreach { case (fld, i) =>
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else fld.dataType match {
              case TimestampType => java.lang.Long.valueOf(
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .fromJavaTimestamp(row.getAs[java.sql.Timestamp](i)))
              case TimestampNTZType => java.lang.Long.valueOf(
                org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .localDateTimeToMicros(row.getAs[java.time.LocalDateTime](i)))
              case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
          rec.put(fld.name, v)
        }
        w.append(rec); n += 1
      }
      w.close()
      Iterator.single(n)
    }.count()
    ()
  }

  /** Read every container file matching `pathGlob` (schema taken from
    * the first file; all files must agree). */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    val paths = HDF5ChunkIngest.resolvePaths(pathGlob) match {
      case Seq() if ByteStore.isDirectory(pathGlob) =>
        ByteStore.list(pathGlob)
          .filter(e => !e.isDir && e.name.endsWith(".avro"))
          .map(_.path).sorted
      case ps => ps
    }
    require(paths.nonEmpty, s"no avro files matched $pathGlob")
    val first = {
      val in = ByteStore.openStream(paths.head)
      val s = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try s.getSchema finally { s.close(); in.close() }
    }
    val sparkSch = sparkSchema(first)
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(sparkSch))
    import spark.implicits._
    val rows = spark.createDataset(paths).flatMap { p =>
      val in = ByteStore.openStream(p)
      val stream = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      val fields = sparkSch.fields
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = stream.hasNext
          if (!h) { stream.close(); in.close() }
          h
        }
        def next(): Row = toRow(stream.next(), fields)
      }
    }(enc)
    rows
  }

  /** Two-phase read of ONE consolidated container file: `splitBytes`
    * byte ranges fan out (range-partitioned), each task seeks to its
    * range start, syncs forward to the next block marker and decodes
    * blocks starting inside its range (`pastSync` excludes the rest) —
    * the Hadoop split contract, each block decoded exactly once. */
  /** avro's SeekableInput over the [[ByteStore]] seam, so the ranged
    * split read works on URI stores too (sync + pastSync need seeks). */
  private final class SeekableReadAt(path: String)
      extends org.apache.avro.file.SeekableInput {
    private val in = ByteStore.open(path)
    private var pos = 0L
    override def length(): Long = in.length
    override def seek(p: Long): Unit = { pos = p }
    override def tell(): Long = pos
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = math.min(len.toLong, in.length - pos).toInt
      if (n <= 0) -1
      else { in.readFully(pos, b, off, n); pos += n; n }
    }
    override def close(): Unit = in.close()
  }

  def readSplit(spark: SparkSession, path: String,
      splitBytes: Long = 4L << 20): DataFrame = {
    require(ByteStore.isFile(path), s"$path is not a file")
    val len = ByteStore.length(path)
    val sparkSch = {
      val in = ByteStore.openStream(path)
      val s = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try sparkSchema(s.getSchema) finally { s.close(); in.close() }
    }
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(sparkSch))
    val ranges = (0L until len by splitBytes)
      .map(start => (path, start, math.min(start + splitBytes, len)))
    import spark.implicits._
    spark.createDataset(ranges).toDF("path", "start", "end")
      .repartitionByRange(math.min(ranges.size,
        math.max(1, spark.sparkContext.defaultParallelism)),
        org.apache.spark.sql.functions.col("start"))
      .as[(String, Long, Long)]
      .flatMap { t: (String, Long, Long) =>
        val (p, start, end) = t
        val reader = org.apache.avro.file.DataFileReader.openReader(
          new SeekableReadAt(p): org.apache.avro.file.SeekableInput,
          new GenericDatumReader[GenericRecord]())
        reader.sync(start) // forward to the first block at/after start
        val fields = sparkSch.fields
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext && !reader.pastSync(end)
            if (!h) reader.close()
            h
          }
          def next(): Row = toRow(reader.next(), fields)
        }
      }(enc)
  }

  private def toRow(rec: GenericRecord, fields: Array[StructField]): Row =
    Row.fromSeq(fields.map { f =>
      val v = rec.get(f.name)
      if (v == null) null
      else f.dataType match {
        case StringType => v.toString
        case TimestampType =>
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .toJavaTimestamp(v.asInstanceOf[java.lang.Long].longValue())
        case BinaryType =>
          val bb = v.asInstanceOf[java.nio.ByteBuffer]
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case _ => v
      }
    }.toSeq)
}
