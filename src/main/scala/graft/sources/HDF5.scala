package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM HDF5 codec — the netCDF-4 seam-narrower.
  *
  * The reference opens netCDF-4 (HDF5-backed) files through xarray
  * (convml_data/utils/luigi.py:29-47); NetCDF3.scala covers classic CDF-1/2
  * only. This reader implements the PUBLIC HDF5 file-format spec (HDF Group,
  * "HDF5 File Format Specification v1.0", the layout libhdf5 writes by
  * default for netCDF-4 files): version-0 superblock, version-1 object
  * headers, symbol-table groups (local heap + v1 B-tree + SNOD nodes), and
  * CONTIGUOUS dataset storage for fixed-point/IEEE-float types.
  *
  * Out of scope — rejected LOUDLY, never silently misread: chunked layouts
  * (layout class 2), filter pipelines (deflate/shuffle), compact storage,
  * object-header continuation blocks, v2+ superblocks. The seam is now "no
  * COMPRESSED HDF5", not "no HDF5".
  *
  * The writer emits the same subset (one root group, N contiguous
  * datasets) so the decode path is provable without external fixtures, the
  * same strategy as NetCDF3/HDF4.
  */
object HDF5 {

  val Undef: Long = -1L // 0xFFFFFFFFFFFFFFFF

  final case class H5Dataset(name: String, dims: Seq[Long], data: Array[Double])

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

  // ---------------------------------------------------------------- reader

  private def buf(bytes: Array[Byte], off: Int): ByteBuffer = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.position(off)
    b
  }

  /** Read every dataset reachable from the root group. */
  def read(bytes: Array[Byte]): Seq[H5Dataset] = {
    require(bytes.length >= 96 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not an HDF5 file (bad signature)")
    val sb = buf(bytes, 8)
    val sbVersion = sb.get()
    require(sbVersion == 0, s"only version-0 superblocks supported (got $sbVersion — " +
      "v2/v3 superblocks come from libhdf5 'latest' format settings)")
    sb.get(); sb.get(); sb.get() // freespace, root symtab, reserved
    sb.get() // shared header version
    val sizeOffsets = sb.get()
    val sizeLengths = sb.get()
    require(sizeOffsets == 8 && sizeLengths == 8,
      s"only 8-byte offsets/lengths supported (got $sizeOffsets/$sizeLengths)")
    sb.get() // reserved
    sb.getShort(); sb.getShort(); sb.getInt() // group k's, flags
    val baseAddr = sb.getLong()
    require(baseAddr == 0, s"nonzero base address $baseAddr unsupported")
    sb.getLong(); sb.getLong(); sb.getLong() // freespace, eof, driver
    // root group symbol table entry
    sb.getLong() // link name offset
    val rootHeaderAddr = sb.getLong()
    val (btreeAddr, heapAddr) = parseGroupHeader(bytes, rootHeaderAddr)
    val heapDataAddr = parseHeapDataAddr(bytes, heapAddr)
    val snods = collectSnods(bytes, btreeAddr)
    snods.flatMap(parseSnod(bytes, _, heapDataAddr)).map { case (name, addr) =>
      parseDataset(bytes, name, addr)
    }
  }

  /** Root group object header -> (btree addr, heap addr) from its symbol
    * table message. */
  private def parseGroupHeader(bytes: Array[Byte], addr: Long): (Long, Long) = {
    foldMessages(bytes, addr).collectFirst {
      case (0x0011, data) =>
        val b = buf(bytes, data)
        (b.getLong(), b.getLong())
    }.getOrElse(throw new IllegalArgumentException(
      "root object header has no symbol table message (new-style groups unsupported)"))
  }

  /** Parse a v1 object header; returns (msgType, absolute data offset). */
  private def foldMessages(bytes: Array[Byte], addr: Long): Seq[(Int, Int)] = {
    val b = buf(bytes, addr.toInt)
    val version = b.get()
    require(version == 1, s"only v1 object headers supported (got $version)")
    b.get() // reserved
    val nMsg = b.getShort() & 0xffff
    b.getInt() // ref count
    b.getInt() // header size
    b.getInt() // padding to 8-byte alignment
    var out = List.empty[(Int, Int)]
    var i = 0
    var pos = b.position()
    while (i < nMsg) {
      val mb = buf(bytes, pos)
      val mtype = mb.getShort() & 0xffff
      val msize = mb.getShort() & 0xffff
      mb.get(); mb.get(); mb.get(); mb.get() // flags + reserved
      val dataOff = mb.position()
      require(mtype != 0x0010,
        "object-header continuation blocks unsupported (header too large)")
      out = (mtype, dataOff) :: out
      pos = dataOff + msize
      i += 1
    }
    out.reverse
  }

  private def parseHeapDataAddr(bytes: Array[Byte], addr: Long): Long = {
    val b = buf(bytes, addr.toInt)
    val sig = Array.fill(4)(b.get())
    require(new String(sig.map(_.toChar)) == "HEAP", "bad local heap signature")
    b.get(); b.get(); b.get(); b.get() // version + reserved
    b.getLong(); b.getLong() // data segment size, free list head
    b.getLong() // data segment address
  }

  /** Walk the v1 B-tree (group node type 0); leaves point at SNODs. */
  private def collectSnods(bytes: Array[Byte], addr: Long): Seq[Long] = {
    val b = buf(bytes, addr.toInt)
    val sig = Array.fill(4)(b.get())
    require(new String(sig.map(_.toChar)) == "TREE", "bad B-tree signature")
    val nodeType = b.get()
    require(nodeType == 0, s"B-tree node type $nodeType (expected group node)")
    val level = b.get()
    val used = b.getShort() & 0xffff
    b.getLong(); b.getLong() // siblings
    val children = (0 until used).map { _ =>
      b.getLong() // key i (heap offset)
      b.getLong() // child i
    }
    b.getLong() // final key
    if (level == 0) children else children.flatMap(collectSnods(bytes, _))
  }

  private def parseSnod(bytes: Array[Byte], addr: Long, heapData: Long): Seq[(String, Long)] = {
    val b = buf(bytes, addr.toInt)
    val sig = Array.fill(4)(b.get())
    require(new String(sig.map(_.toChar)) == "SNOD", "bad symbol node signature")
    b.get(); b.get() // version, reserved
    val n = b.getShort() & 0xffff
    (0 until n).map { _ =>
      val nameOff = b.getLong()
      val headerAddr = b.getLong()
      b.getInt(); b.getInt() // cache type, reserved
      (0 until 16).foreach(_ => b.get()) // scratch
      (readCString(bytes, (heapData + nameOff).toInt), headerAddr)
    }
  }

  private def readCString(bytes: Array[Byte], off: Int): String = {
    var end = off
    while (bytes(end) != 0) end += 1
    new String(bytes, off, end - off, "UTF-8")
  }

  private def parseDataset(bytes: Array[Byte], name: String, addr: Long): H5Dataset = {
    var dims: Seq[Long] = Nil
    var dtClass = -1
    var dtSize = -1
    var dataAddr = Undef
    var dataSize = 0L
    foldMessages(bytes, addr).foreach { case (mtype, off) =>
      mtype match {
        case 0x0001 => // dataspace
          val b = buf(bytes, off)
          val v = b.get()
          require(v == 1, s"dataset $name: only v1 dataspace supported (got $v)")
          val ndims = b.get()
          b.get() // flags (maxdims may follow the dims; not needed)
          b.get(); b.getInt() // reserved
          dims = (0 until ndims).map(_ => b.getLong())
        case 0x0003 => // datatype
          val b = buf(bytes, off)
          val classVer = b.get()
          dtClass = classVer & 0x0f
          val bits0 = b.get(); b.get(); b.get()
          dtSize = b.getInt()
          require((bits0 & 1) == 0, s"dataset $name: big-endian data unsupported")
          require(dtClass == 0 || dtClass == 1,
            s"dataset $name: datatype class $dtClass unsupported (fixed/float only)")
        case 0x0008 => // data layout
          val b = buf(bytes, off)
          val v = b.get()
          require(v == 3, s"dataset $name: only v3 layout messages supported (got $v)")
          val cls = b.get()
          require(cls == 1, s"dataset $name: layout class $cls unsupported — " +
            "chunked (class 2) / compact (class 0) storage needs libhdf5; " +
            "rewrite the file with contiguous layout")
          dataAddr = b.getLong()
          dataSize = b.getLong()
        case 0x000B =>
          throw new IllegalArgumentException(s"dataset $name: filter pipeline present " +
            "(deflate/shuffle) — compressed HDF5 unsupported, decompress the file first")
        case _ => () // NIL, attributes, mod-time, fill value: skipped
      }
    }
    require(dtClass >= 0 && dataAddr != Undef, s"dataset $name: incomplete object header")
    val n = dims.product.toInt // empty dims = scalar (product 1)
    val b = buf(bytes, dataAddr.toInt)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = (dtClass, dtSize) match {
        case (1, 8) => b.getDouble()
        case (1, 4) => b.getFloat().toDouble
        case (0, 4) => b.getInt().toDouble
        case (0, 8) => b.getLong().toDouble
        case other => throw new IllegalArgumentException(
          s"dataset $name: unsupported type class/size $other")
      }
      i += 1
    }
    H5Dataset(name, dims, out)
  }

  // ---------------------------------------------------------------- writer

  final case class DsSpec(name: String, dims: Seq[Long], data: Array[Double])

  /** Write a minimal HDF5 file: one root group, contiguous float64
    * datasets — the netCDF-4-classic-model shape for an uncompressed LES
    * file. Layout: superblock / root header / heap / btree / snod /
    * per-dataset (header, data). */
  def write(specs: Seq[DsSpec]): Array[Byte] = {
    require(specs.nonEmpty, "at least one dataset")
    val sorted = specs.sortBy(_.name) // SNOD entries must be name-ordered
    // ---- layout computation (all sections 8-aligned)
    val superblockLen = 96
    val rootHeaderLen = 16 + 8 + 16 // prefix + msg header + symtab msg
    def align8(x: Long): Long = (x + 7) & ~7L
    val heapAddr = superblockLen + rootHeaderLen
    // heap data: 8 reserved bytes (offset 0 = empty name), then names
    val nameOffsets = scala.collection.mutable.Map[String, Long]()
    var heapCursor = 8L
    sorted.foreach { s =>
      nameOffsets(s.name) = heapCursor
      heapCursor = align8(heapCursor + s.name.length + 1)
    }
    val heapDataLen = heapCursor
    val heapHeaderLen = 32
    val heapDataAddr = heapAddr + heapHeaderLen
    val btreeAddr = heapDataAddr + heapDataLen
    val btreeLen = align8(24 + 2 * 8 + 8) // header + 1 (key,child) + final key
    val snodAddr = btreeAddr + btreeLen
    val snodLen = align8(8 + 40L * sorted.size)
    // per-dataset: object header then data
    var cursor = snodAddr + snodLen
    val headerAddrs = scala.collection.mutable.Map[String, Long]()
    val dataAddrs = scala.collection.mutable.Map[String, Long]()
    sorted.foreach { s =>
      val spaceMsg = align8(8 + 8L * s.dims.size)
      val headerLen = 16 + (8 + spaceMsg) + (8 + 24) + (8 + 24)
      headerAddrs(s.name) = cursor
      dataAddrs(s.name) = cursor + headerLen
      cursor = dataAddrs(s.name) + align8(8L * s.data.length)
    }
    val total = cursor
    require(total <= Int.MaxValue, s"HDF5 export of $total bytes exceeds builder limit")
    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)

    // ---- superblock
    out.put(Signature)
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.put(0.toByte) // shared header version
    out.put(8.toByte); out.put(8.toByte); out.put(0.toByte)
    out.putShort(4); out.putShort(16) // group leaf/internal k
    out.putInt(0) // flags
    out.putLong(0L) // base
    out.putLong(Undef) // freespace
    out.putLong(total) // eof
    out.putLong(Undef) // driver info
    // root symbol table entry
    out.putLong(0L) // link name offset
    out.putLong(superblockLen.toLong) // root object header addr
    out.putInt(0); out.putInt(0)
    (0 until 16).foreach(_ => out.put(0.toByte))

    // ---- root group object header (1 message: symbol table)
    out.put(1.toByte); out.put(0.toByte)
    out.putShort(1)
    out.putInt(1)
    out.putInt(8 + 16) // header size
    out.putInt(0) // alignment pad
    out.putShort(0x0011); out.putShort(16)
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.putLong(btreeAddr); out.putLong(heapAddr)

    // ---- local heap
    out.put('H'.toByte); out.put('E'.toByte); out.put('A'.toByte); out.put('P'.toByte)
    out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
    out.putLong(heapDataLen)
    out.putLong(Undef) // free list: none
    out.putLong(heapDataAddr)
    sorted.foreach { s =>
      out.position((heapDataAddr + nameOffsets(s.name)).toInt)
      out.put(s.name.getBytes("UTF-8")); out.put(0.toByte)
    }

    // ---- B-tree (one leaf with one SNOD child)
    out.position(btreeAddr.toInt)
    out.put('T'.toByte); out.put('R'.toByte); out.put('E'.toByte); out.put('E'.toByte)
    out.put(0.toByte) // node type: group
    out.put(0.toByte) // level: leaf
    out.putShort(1) // entries used
    out.putLong(Undef); out.putLong(Undef) // siblings
    out.putLong(0L) // key 0: empty name (offset 0)
    out.putLong(snodAddr) // child 0
    out.putLong(nameOffsets(sorted.last.name)) // key 1: largest name

    // ---- SNOD
    out.position(snodAddr.toInt)
    out.put('S'.toByte); out.put('N'.toByte); out.put('O'.toByte); out.put('D'.toByte)
    out.put(1.toByte); out.put(0.toByte)
    out.putShort(sorted.size.toShort)
    sorted.foreach { s =>
      out.putLong(nameOffsets(s.name))
      out.putLong(headerAddrs(s.name))
      out.putInt(0); out.putInt(0)
      (0 until 16).foreach(_ => out.put(0.toByte))
    }

    // ---- datasets
    sorted.foreach { s =>
      require(s.data.length.toLong == s.dims.product,
        s"dataset ${s.name}: data length ${s.data.length} != ${s.dims.product}")
      out.position(headerAddrs(s.name).toInt)
      val spaceMsg = align8(8 + 8L * s.dims.size).toInt
      out.put(1.toByte); out.put(0.toByte)
      out.putShort(3)
      out.putInt(1)
      out.putInt((8 + spaceMsg) + (8 + 24) + (8 + 24))
      out.putInt(0)
      // dataspace v1
      out.putShort(0x0001); out.putShort(spaceMsg.toShort)
      out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
      out.put(1.toByte) // version
      out.put(s.dims.size.toByte)
      out.put(0.toByte) // flags: no maxdims
      out.put(0.toByte); out.putInt(0)
      s.dims.foreach(out.putLong)
      out.position((headerAddrs(s.name) + 16 + 8 + spaceMsg).toInt)
      // datatype: IEEE float64 LE
      out.putShort(0x0003); out.putShort(24)
      out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
      out.put(((1 << 4) | 1).toByte) // version 1, class 1 (float)
      out.put(0x20.toByte) // LE, msb-implied normalization
      out.put(63.toByte) // sign bit location
      out.put(0.toByte)
      out.putInt(8) // size
      out.putShort(0) // bit offset
      out.putShort(64) // precision
      out.put(52.toByte); out.put(11.toByte) // exponent loc/size
      out.put(0.toByte); out.put(52.toByte) // mantissa loc/size
      out.putInt(1023) // exponent bias
      out.putInt(0) // pad to 24
      // layout v3 contiguous
      out.putShort(0x0008); out.putShort(24)
      out.put(0.toByte); out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
      out.put(3.toByte); out.put(1.toByte)
      out.putLong(dataAddrs(s.name))
      out.putLong(8L * s.data.length)
      out.put(0.toByte); out.put(0.toByte); out.put(0.toByte);
      out.put(0.toByte); out.put(0.toByte); out.put(0.toByte)
      // data
      out.position(dataAddrs(s.name).toInt)
      s.data.foreach(out.putDouble)
    }
    out.array()
  }
}
