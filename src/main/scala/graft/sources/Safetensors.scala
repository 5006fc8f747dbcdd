package graft.sources

import java.io.BufferedOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** safetensors source/sink (huggingface/safetensors public format):
  * u64 LE header length, a JSON header mapping tensor name ->
  * {dtype, shape, data_offsets} (offsets relative to the data section),
  * then the concatenated raw little-endian buffers — the now-standard
  * checkpoint/embedding interchange, designed to be exactly this easy
  * to parse (no pickle, no seeking surprises).
  *
  * Write: one shard per partition carrying two aligned tensors
  * (`ids` I64 [n], `emb` F32 [n, dim]), rows id-sorted within the
  * shard. Read: per-file parallel. Header JSON parses with Jackson
  * (already on the Spark classpath); dtypes F32/F64/I64, anything else
  * loud-rejects. Offsets are validated against the file length.
  * Independence: tools/make_fixtures.py writes golden.safetensors via
  * python json+struct (SafetensorsSpec proves exact decode). */
object Safetensors {

  final case class TensorMeta(dtype: String, shape: Seq[Long],
      start: Long, end: Long)

  def itemSize(dtype: String): Int = dtype match {
    case "F32" => 4; case "F64" => 8; case "I64" => 8
    case d => sys.error(s"safetensors: unsupported dtype $d")
  }

  /** Serialize (name, dtype, shape, bytes) tensors; insertion order is
    * the buffer order. */
  def encode(tensors: Seq[(String, String, Seq[Long], Array[Byte])]): Array[Byte] = {
    var off = 0L
    val entries = tensors.map { case (nm, dt, sh, b) =>
      val nEl = sh.product
      require(nEl * itemSize(dt) == b.length,
        s"safetensors: $nm shape ${sh.mkString("x")} != ${b.length} bytes")
      val s = off; off += b.length
      s""""$nm":{"dtype":"$dt","shape":[${sh.mkString(",")}],"data_offsets":[$s,$off]}"""
    }
    val json = entries.mkString("{", ",", "}").getBytes(StandardCharsets.UTF_8)
    val bb = ByteBuffer.allocate(8 + json.length + off.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(json.length.toLong)
    bb.put(json)
    tensors.foreach { case (_, _, _, b) => bb.put(b) }
    bb.array()
  }

  /** Parse one file into name -> (meta, bytes); offsets validated.
    * Positioned reads through [[ByteStore]] (URI stores read too). */
  def decode(path: String): Map[String, (TensorMeta, Array[Byte])] = {
    val raf = ByteStore.open(path)
    try {
      require(raf.length >= 8, s"safetensors: ${raf.length}-byte file has no header")
      val lenB = raf.readFully(0L, 8)
      val hlen = ByteBuffer.wrap(lenB).order(ByteOrder.LITTLE_ENDIAN).getLong
      require(hlen > 0 && hlen <= Int.MaxValue && 8 + hlen <= raf.length,
        s"safetensors: absurd header length $hlen for file of ${raf.length} bytes")
      val hb = raf.readFully(8L, hlen.toInt)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(new String(hb, StandardCharsets.UTF_8))
      val dataStart = 8 + hlen
      val dataLen = raf.length - dataStart
      val out = Map.newBuilder[String, (TensorMeta, Array[Byte])]
      val it = root.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nm = e.getKey
        if (nm != "__metadata__") {
          val t = e.getValue
          val dt = t.get("dtype").asText()
          require(Set("F32", "F64", "I64")(dt),
            s"safetensors: unsupported dtype $dt for $nm")
          val sh = (0 until t.get("shape").size())
            .map(i => t.get("shape").get(i).asLong())
          val s = t.get("data_offsets").get(0).asLong()
          val en = t.get("data_offsets").get(1).asLong()
          require(s >= 0 && en >= s && en <= dataLen,
            s"safetensors: offsets [$s,$en) outside data section for $nm")
          require(en - s == sh.product * itemSize(dt),
            s"safetensors: $nm shape/byte mismatch")
          val b = raf.readFully(dataStart + s, (en - s).toInt)
          out += nm -> ((TensorMeta(dt, sh, s, en), b))
        }
      }
      out.result()
    } finally raf.close()
  }

  /** One (ids, emb) shard per partition. Materializes the partition in
    * memory (offsets in the header precede the data) — size partitions
    * so a shard fits an executor, the whole-file-writer contract. */
  def write(df: DataFrame, dir: String, idCol: String, vecCol: String,
      dim: Int): Unit = {
    ByteStore.mkdirs(dir)
    ByteStore.list(dir).filter(e => !e.isDir && e.name.endsWith(".safetensors"))
      .foreach(e => ByteStore.deleteFile(e.path))
    val hconf = ByteStore.confSnapshot(df.sparkSession)
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .rdd.mapPartitionsWithIndex { (pi, it) =>
        ByteStore.install(hconf) // executor JVMs have no session
        val rows = it.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          .toArray.sortBy(_._1)
        rows.foreach(r => require(r._2.length == dim,
          s"safetensors: row ${r._1} has ${r._2.length} dims, expected $dim"))
        val ib = ByteBuffer.allocate(8 * rows.length).order(ByteOrder.LITTLE_ENDIAN)
        rows.foreach(r => ib.putLong(r._1))
        val vb = ByteBuffer.allocate(4 * dim * rows.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        rows.foreach(_._2.foreach(vb.putFloat))
        val bytes = encode(Seq(
          ("ids", "I64", Seq(rows.length.toLong), ib.array()),
          ("emb", "F32", Seq(rows.length.toLong, dim.toLong), vb.array())))
        val out = new BufferedOutputStream(ByteStore.create(
          ByteStore.join(dir, f"part-$pi%05d.safetensors")))
        out.write(bytes); out.close()
        Iterator.single(rows.length)
      }.count()
    ()
  }

  /** Read every shard in `dir`: (vec_id, embedding), per-file parallel. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val paths = ByteStore.list(dir)
      .filter(e => !e.isDir && e.name.endsWith(".safetensors"))
      .map(_.path).sorted
    require(paths.nonEmpty, s"no .safetensors shards in $dir")
    import spark.implicits._
    spark.createDataset(paths).flatMap { p =>
      val m = decode(p)
      val (im, ib) = m.getOrElse("ids", sys.error(s"$p: no ids tensor"))
      val (vm, vb) = m.getOrElse("emb", sys.error(s"$p: no emb tensor"))
      require(im.dtype == "I64" && im.shape.size == 1, s"$p: bad ids tensor")
      require(vm.dtype == "F32" && vm.shape.size == 2 &&
        vm.shape.head == im.shape.head, s"$p: misaligned pair")
      val dim = vm.shape(1).toInt
      val ibb = ByteBuffer.wrap(ib).order(ByteOrder.LITTLE_ENDIAN)
      val vbb = ByteBuffer.wrap(vb).order(ByteOrder.LITTLE_ENDIAN)
      (0 until im.shape.head.toInt).iterator.map { r =>
        (ibb.getLong(r * 8),
          Array.tabulate(dim)(j => vbb.getFloat((r * dim + j) * 4)))
      }
    }.toDF("vec_id", "embedding")
  }
}
