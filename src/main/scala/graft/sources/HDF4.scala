package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Pure-JVM codec for the HDF4 scientific-dataset (DFSD) subset — the
  * S10 decode path for CERES syn1deg MODIS files
  * (sources/ceres_syn1deg_modis/extract.py:7-69) without any HDF jars.
  *
  * Scope (public HDF 4.x spec): the DD-list container plus the numeric
  * data-group tags —
  *   DFTAG_NDG(720) group -> DFTAG_SDD(701) rank/dims + number type,
  *   DFTAG_NT(106), DFTAG_SD(702) raw big-endian array,
  *   DFTAG_SDL(704) label (the `long_name` the reference renames by) —
  * plus DEFLATE-compressed SDs via the spec's special-element encoding:
  * an extended-tag DD (0x4000 | DFTAG_SD) whose payload is the
  * compression header (SPECIAL_COMP=3, version, uncompressed length,
  * ref of the DFTAG_COMPRESSED(40) element, model, COMP_CODE_DEFLATE=4,
  * level), with the zlib-wrapped bytes in the DFTAG_COMPRESSED element —
  * the layout real CERES SYN1deg granules ship. Other special-element
  * kinds (linked blocks, external, chunked) and other comp codes are
  * rejected loudly, never silently misread.
  *
  * Files written through the newer multi-file SD/Vgroup interface (all
  * modern CERES granules) store per-variable attributes — units,
  * scale_factor, add_offset, long_name, _FillValue (extract.py:7-69
  * renames by long_name and asserts units) — as class-"Attr0.0" Vdata
  * records (DFTAG_VH/VS pairs) inside the variable's class-"Var0.0"
  * Vgroup (DFTAG_VG). Those are decoded here too, and
  * [[syn1degRows]] applies the CF unpacking `value*scale_factor +
  * add_offset` (fill values to NaN) the reference gets from xarray.
  *
  * As with [[NetCDF3]], the decode unit is the whole file: Spark-side
  * use is per-file parallelism over a `binaryFile` scan.
  */
object HDF4 {

  val Magic = 0x0e031301
  val TagNT = 106; val TagSDD = 701; val TagSD = 702; val TagSDL = 704; val TagNDG = 720
  val TagCompressed = 40      // DFTAG_COMPRESSED: the deflated bytes
  val TagVH = 1962; val TagVS = 1963; val TagVG = 1965 // Vdata/Vgroup tags
  val ExtendedMask = 0x4000   // SPECIAL_MASK: DD tag bit for special elements
  val SpecialComp = 3         // SPECIAL_COMP special-element kind
  val CompDeflate = 4         // COMP_CODE_DEFLATE

  // DFNT number-type codes
  val Char8 = 4
  val Float32 = 5; val Float64 = 6
  val Int8 = 20; val UInt8 = 21; val Int16 = 22; val UInt16 = 23
  val Int32 = 24; val UInt32 = 25

  def typeWidth(t: Int): Int = t match {
    case Char8 | Int8 | UInt8 => 1
    case Int16 | UInt16 => 2
    case Float32 | Int32 | UInt32 => 4
    case Float64 => 8
    case other => throw new IllegalArgumentException(s"unsupported DFNT type $other")
  }

  /** SD-interface attribute value: character string or typed numbers. */
  sealed trait AttrValue
  final case class StrAttr(value: String) extends AttrValue
  final case class NumAttr(ntType: Int, values: Seq[Double]) extends AttrValue

  final case class DD(tag: Int, ref: Int, offset: Int, length: Int)
  final case class Sds(ref: Int, label: String, dims: Seq[Int], ntType: Int,
    data: Array[Double], attrs: Map[String, AttrValue] = Map.empty)

  /** All DDs across chained DD blocks. */
  def readDDs(bytes: Array[Byte]): Seq[DD] = {
    val b = ByteBuffer.wrap(bytes)
    require(b.getInt() == Magic, "not an HDF4 file")
    val out = Seq.newBuilder[DD]
    var blockOff = 4
    while (blockOff != 0) {
      b.position(blockOff)
      val ndds = b.getShort().toInt
      val next = b.getInt()
      (0 until ndds).foreach { _ =>
        val tag = b.getShort() & 0xffff
        val ref = b.getShort() & 0xffff
        val off = b.getInt(); val len = b.getInt()
        if (tag != 0) out += DD(tag, ref, off, len) // skip DFTAG_NULL
      }
      blockOff = next
    }
    out.result()
  }

  private def readValues(b: ByteBuffer, off: Int, n: Int, t: Int): Array[Double] = {
    b.position(off)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = t match {
        case Int8 => b.get().toDouble
        case UInt8 => (b.get() & 0xff).toDouble
        case Int16 => b.getShort().toDouble
        case UInt16 => (b.getShort() & 0xffff).toDouble
        case Int32 => b.getInt().toDouble
        case UInt32 => (b.getInt().toLong & 0xffffffffL).toDouble
        case Float32 => b.getFloat().toDouble
        case Float64 => b.getDouble()
      }
      i += 1
    }
    out
  }

  /** Attr0.0 Vdata (a VH/VS pair sharing one ref): attribute name from
    * the Vdata name, values from the VS records. Non-attribute Vdatas
    * (dimension records etc.) return None. */
  private def parseAttrVdata(bytes: Array[Byte], dds: Seq[DD],
      ref: Int): Option[(String, AttrValue)] = {
    val b = ByteBuffer.wrap(bytes)
    def str(): String = {
      val len = b.getShort() & 0xffff
      val raw = new Array[Byte](len)
      b.get(raw)
      new String(raw, StandardCharsets.UTF_8)
    }
    for {
      vh <- dds.find(d => d.tag == TagVH && d.ref == ref)
      vs <- dds.find(d => d.tag == TagVS && d.ref == ref)
      attr <- {
        b.position(vh.offset)
        val interlace = b.getShort().toInt
        val nvert = b.getInt()
        b.getShort() // ivsize (record width; implied by type x order)
        val nfields = b.getShort().toInt
        val types = (0 until nfields).map(_ => b.getShort().toInt)
        (0 until nfields).foreach(_ => b.getShort()) // isizes
        (0 until nfields).foreach(_ => b.getShort()) // offsets
        val orders = (0 until nfields).map(_ => b.getShort() & 0xffff)
        (0 until nfields).foreach(_ => str()) // field names
        val vsname = str()
        val vsclass = str()
        if (vsclass != "Attr0.0") None
        else {
          require(nfields == 1 && interlace == 0,
            s"attribute Vdata `$vsname`: expected one FULL_INTERLACE field " +
              s"(got $nfields fields, interlace $interlace)")
          val n = nvert * orders.head
          if (types.head == Char8) {
            val raw = new Array[Byte](n)
            b.position(vs.offset); b.get(raw)
            Some(vsname -> StrAttr(
              new String(raw.takeWhile(_ != 0), StandardCharsets.UTF_8)))
          } else
            Some(vsname -> NumAttr(types.head, readValues(b, vs.offset, n, types.head).toSeq))
        }
      }
    } yield attr
  }

  /** Per-NDG attribute maps from the SD interface's Var0.0 Vgroups. */
  private def varAttrs(bytes: Array[Byte], dds: Seq[DD]): Map[Int, Map[String, AttrValue]] = {
    val b = ByteBuffer.wrap(bytes)
    dds.filter(_.tag == TagVG).flatMap { vg =>
      b.position(vg.offset)
      val nelt = b.getShort() & 0xffff
      val tags = (0 until nelt).map(_ => b.getShort() & 0xffff)
      val refs = (0 until nelt).map(_ => b.getShort() & 0xffff)
      val nameLen = b.getShort() & 0xffff
      b.position(b.position() + nameLen)
      val classLen = b.getShort() & 0xffff
      val classRaw = new Array[Byte](classLen)
      b.get(classRaw)
      val clazz = new String(classRaw, StandardCharsets.UTF_8)
      val members = tags.zip(refs)
      if (clazz != "Var0.0") None
      else members.collectFirst { case (TagNDG, r) => r }.map { ndgRef =>
        ndgRef -> members.collect { case (TagVH, r) => r }
          .flatMap(parseAttrVdata(bytes, dds, _)).toMap
      }
    }.toMap
  }

  /** Every scientific dataset in the file (one per NDG), values promoted
    * to Double, with its label (empty when absent) and its SD-interface
    * Vdata attributes (empty for plain DFSD files). */
  def readSds(bytes: Array[Byte]): Seq[Sds] = {
    val b = ByteBuffer.wrap(bytes)
    val dds = readDDs(bytes)
    val attrsByNdg = varAttrs(bytes, dds)
    def find(tag: Int, ref: Int): Option[DD] = dds.find(d => d.tag == tag && d.ref == ref)
    dds.filter(_.tag == TagNDG).map { g =>
      b.position(g.offset)
      val members = (0 until g.length / 4).map(_ => ((b.getShort() & 0xffff), (b.getShort() & 0xffff)))
      def member(tag: Int): Option[Int] = members.collectFirst { case (t, r) if t == tag => r }
      val sddRef = member(TagSDD).getOrElse(throw new IllegalArgumentException("NDG without SDD"))
      val sdd = find(TagSDD, sddRef).get
      b.position(sdd.offset)
      val rank = b.getShort().toInt
      val dims = (0 until rank).map(_ => b.getInt())
      val ntRef = { b.getShort(); b.getShort() & 0xffff } // (tag, ref) of data NT
      val nt = find(TagNT, ntRef).getOrElse(throw new IllegalArgumentException("SDD without NT"))
      b.position(nt.offset)
      b.get() // version
      val ntType = b.get().toInt
      val sdRef = member(TagSD).getOrElse(throw new IllegalArgumentException("NDG without SD"))
      val n = dims.product
      val width = typeWidth(ntType)
      // plain SD: the DD payload is the raw big-endian array. Compressed
      // SD: the DD carries the EXTENDED tag and its payload is the
      // special-element compression header pointing at DFTAG_COMPRESSED.
      val (dataBuf, dataOff) = find(TagSD, sdRef) match {
        case Some(sd) =>
          require(sd.length == n.toLong * width,
            s"SD length ${sd.length} != expected ${n.toLong * width}")
          (b, sd.offset)
        case None =>
          val ext = find(ExtendedMask | TagSD, sdRef).getOrElse(
            throw new IllegalArgumentException("NDG without SD (plain or extended)"))
          b.position(ext.offset)
          val special = b.getShort().toInt
          require(special == SpecialComp,
            s"special element kind $special unsupported (only SPECIAL_COMP=$SpecialComp; " +
              "linked-block/external/chunked elements are out of scope)")
          b.getShort() // compression header version
          val uncompLen = b.getInt()
          val compRef = b.getShort() & 0xffff
          b.getShort() // model type (COMP_MODEL_STDIO)
          val compType = b.getShort().toInt
          require(compType == CompDeflate,
            s"compression code $compType unsupported (only DEFLATE=$CompDeflate)")
          require(uncompLen == n.toLong * width,
            s"compressed SD declares $uncompLen bytes, expected ${n.toLong * width}")
          val cdd = find(TagCompressed, compRef).getOrElse(
            throw new IllegalArgumentException(
              s"compressed SD: no DFTAG_COMPRESSED element with ref $compRef"))
          val inflater = new java.util.zip.Inflater()
          inflater.setInput(bytes, cdd.offset, cdd.length)
          val out = new Array[Byte](uncompLen)
          val got = inflater.inflate(out)
          require(got == uncompLen && inflater.finished(),
            s"compressed SD: inflated $got of $uncompLen bytes")
          inflater.end()
          (ByteBuffer.wrap(out), 0)
      }
      val label = member(TagSDL).flatMap(r => find(TagSDL, r)).map { dd =>
        val raw = new Array[Byte](dd.length)
        b.position(dd.offset); b.get(raw)
        new String(raw.takeWhile(_ != 0), StandardCharsets.UTF_8)
      }.getOrElse("")
      Sds(g.ref, label, dims, ntType, readValues(dataBuf, dataOff, n, ntType),
        attrsByNdg.getOrElse(g.ref, Map.empty))
    }
  }

  /** In-memory dataset for writing (data row-major doubles, cast on
    * write); `deflate = true` stores the SD through the special-element
    * compression encoding real CERES granules use; `attrs` are written
    * as SD-interface Vdata attributes inside a Var0.0 Vgroup. */
  final case class SdsSpec(label: String, dims: Seq[Int], ntType: Int,
      data: Array[Double], deflate: Boolean = false,
      attrs: Seq[(String, AttrValue)] = Nil)

  /** Write a DFSD-style HDF4 file: one DD block, then per dataset the
    * NT + SDD + SDL + SD objects and their NDG group (SD optionally as
    * an extended-tag compression header + DFTAG_COMPRESSED element),
    * plus — when the spec carries attributes — the SD-interface shape:
    * one Attr0.0 Vdata (VH description + VS values) per attribute,
    * membered with the NDG in a Var0.0 Vgroup. */
  def write(datasets: Seq[SdsSpec]): Array[Byte] = {
    final case class Obj(tag: Int, ref: Int, payload: Array[Byte])
    val objs = Seq.newBuilder[Obj]
    var nextVdataRef = 1001 // attr Vdata refs, clear of the dataset refs
    def str16(bb: ByteBuffer, s: String): Unit = {
      val raw = s.getBytes(StandardCharsets.UTF_8)
      bb.putShort(raw.length.toShort); bb.put(raw)
    }
    datasets.zipWithIndex.foreach { case (ds, i) =>
      val ref = i + 1
      require(ds.data.length == ds.dims.product, s"${ds.label}: data/dims mismatch")
      objs += Obj(TagNT, ref, Array[Byte](1, ds.ntType.toByte, (typeWidth(ds.ntType) * 8).toByte, 0))
      val sdd = ByteBuffer.allocate(2 + 4 * ds.dims.size + 4 + 4 * ds.dims.size)
      sdd.putShort(ds.dims.size.toShort)
      ds.dims.foreach(sdd.putInt)
      sdd.putShort(TagNT.toShort); sdd.putShort(ref.toShort)
      ds.dims.foreach { _ => sdd.putShort(TagNT.toShort); sdd.putShort(ref.toShort) }
      objs += Obj(TagSDD, ref, sdd.array())
      objs += Obj(TagSDL, ref, ds.label.getBytes(StandardCharsets.UTF_8) :+ 0.toByte)
      val sd = ByteBuffer.allocate(ds.data.length * typeWidth(ds.ntType))
      ds.data.foreach { v =>
        ds.ntType match {
          case Int8 | UInt8 => sd.put(v.toByte)
          case Int16 | UInt16 => sd.putShort(v.toShort)
          case Int32 | UInt32 => sd.putInt(v.toInt)
          case Float32 => sd.putFloat(v.toFloat)
          case Float64 => sd.putDouble(v)
        }
      }
      if (ds.deflate) {
        val deflater = new java.util.zip.Deflater(6)
        deflater.setInput(sd.array()); deflater.finish()
        val tmp = new Array[Byte](sd.array().length + 64)
        val clen = deflater.deflate(tmp)
        require(deflater.finished(), s"${ds.label}: deflate did not finish in one pass")
        deflater.end()
        objs += Obj(TagCompressed, ref, java.util.Arrays.copyOf(tmp, clen))
        val hdr = ByteBuffer.allocate(16)
        hdr.putShort(SpecialComp.toShort)
        hdr.putShort(0)                        // compression header version
        hdr.putInt(sd.array().length)          // uncompressed length
        hdr.putShort(ref.toShort)              // DFTAG_COMPRESSED ref
        hdr.putShort(0)                        // model: COMP_MODEL_STDIO
        hdr.putShort(CompDeflate.toShort)
        hdr.putShort(6)                        // deflate level
        objs += Obj(ExtendedMask | TagSD, ref, hdr.array())
      } else objs += Obj(TagSD, ref, sd.array())
      val ndg = ByteBuffer.allocate(16)
      Seq(TagSDD, TagNT, TagSDL, TagSD).foreach { t =>
        ndg.putShort(t.toShort); ndg.putShort(ref.toShort)
      }
      objs += Obj(TagNDG, ref, ndg.array())
      if (ds.attrs.nonEmpty) {
        val attrRefs = ds.attrs.map { case (name, value) =>
          val r = nextVdataRef; nextVdataRef += 1
          val (t, order, payload) = value match {
            case StrAttr(sv) =>
              val raw = sv.getBytes(StandardCharsets.UTF_8)
              (Char8, raw.length, raw)
            case NumAttr(tt, vs) =>
              val bb = ByteBuffer.allocate(vs.size * typeWidth(tt))
              vs.foreach { v =>
                tt match {
                  case Int8 | UInt8 => bb.put(v.toByte)
                  case Int16 | UInt16 => bb.putShort(v.toShort)
                  case Int32 | UInt32 => bb.putInt(v.toInt)
                  case Float32 => bb.putFloat(v.toFloat)
                  case Float64 => bb.putDouble(v)
                }
              }
              (tt, vs.size, bb.array())
          }
          val fld = "VALUES".getBytes(StandardCharsets.UTF_8)
          val nameRaw = name.getBytes(StandardCharsets.UTF_8)
          val clsRaw = "Attr0.0".getBytes(StandardCharsets.UTF_8)
          val vh = ByteBuffer.allocate(2 + 4 + 2 + 2 + 4 * 2 +
            2 + fld.length + 2 + nameRaw.length + 2 + clsRaw.length + 8)
          vh.putShort(0) // FULL_INTERLACE
          vh.putInt(1)   // one record
          vh.putShort((order * typeWidth(t)).toShort) // record size
          vh.putShort(1) // one field
          vh.putShort(t.toShort)                       // field type
          vh.putShort((order * typeWidth(t)).toShort)  // field size
          vh.putShort(0)                               // field offset
          vh.putShort(order.toShort)                   // field order
          str16(vh, "VALUES")
          str16(vh, name)
          str16(vh, "Attr0.0")
          vh.putShort(0); vh.putShort(0) // extag, exref
          vh.putShort(3); vh.putShort(0) // version, more
          objs += Obj(TagVH, r, vh.array())
          objs += Obj(TagVS, r, payload)
          r
        }
        val nameRaw = ds.label.getBytes(StandardCharsets.UTF_8)
        val vg = ByteBuffer.allocate(2 + 4 * (1 + attrRefs.size) +
          2 + nameRaw.length + 2 + "Var0.0".length + 8)
        vg.putShort((1 + attrRefs.size).toShort)
        vg.putShort(TagNDG.toShort); attrRefs.foreach(_ => vg.putShort(TagVH.toShort))
        vg.putShort(ref.toShort); attrRefs.foreach(r => vg.putShort(r.toShort))
        str16(vg, ds.label)
        str16(vg, "Var0.0")
        vg.putShort(0); vg.putShort(0) // extag, exref
        vg.putShort(3); vg.putShort(0) // version, more
        objs += Obj(TagVG, ref, vg.array())
      }
    }
    val all = objs.result()
    val headerLen = 4 + 2 + 4 + all.size * 12
    var off = headerLen
    val buf = ByteBuffer.allocate(headerLen + all.map(_.payload.length).sum)
    buf.putInt(Magic)
    buf.putShort(all.size.toShort)
    buf.putInt(0) // single DD block
    all.foreach { o =>
      buf.putShort(o.tag.toShort); buf.putShort(o.ref.toShort)
      buf.putInt(off); buf.putInt(o.payload.length)
      off += o.payload.length
    }
    all.foreach(o => buf.put(o.payload))
    buf.array()
  }

  /** syn1deg ingest semantics (extract.py:18-43): a (band, y, x) SDS on
    * the 1-degree grid becomes long rows with lat = 90 - (j + 0.5),
    * lon = (i + 0.5) - 180, time = rangeBeginningDate + band hours. The
    * variable is selected by its label (`long_name` lowercased with
    * spaces/dashes as underscores, as the reference renames). Packed
    * variables are unpacked the CF way xarray does for the reference:
    * `value * scale_factor + add_offset`, with `_FillValue` matches
    * becoming NaN BEFORE scaling. */
  def syn1degRows(bytes: Array[Byte], varLabel: String, rangeBeginningDate: String)
      : Iterator[(java.sql.Timestamp, Double, Double, Double)] = {
    val sds = readSds(bytes).find(_.label == varLabel).getOrElse(
      throw new IllegalArgumentException(
        s"Variable `$varLabel` not found in MODIS SYN1Deg dataset. " +
          s"Available variables are: ${readSds(bytes).map(_.label).mkString(", ")}"))
    val Seq(nBand, ny, nx) = sds.dims
    def num(name: String): Option[Double] = sds.attrs.get(name).collect {
      case NumAttr(_, scala.collection.Seq(v)) => v
    }
    val scale = num("scale_factor").getOrElse(1.0)
    val offset = num("add_offset").getOrElse(0.0)
    val fill = num("_FillValue")
    def unpack(raw: Double): Double =
      if (fill.contains(raw)) Double.NaN else raw * scale + offset
    val t0 = java.time.LocalDate.parse(rangeBeginningDate).atStartOfDay()
    for {
      band <- (0 until nBand).iterator
      j <- (0 until ny).iterator
      i <- (0 until nx).iterator
    } yield {
      val ts = java.sql.Timestamp.valueOf(t0.plusHours(band))
      (ts, 90.0 - (j + 0.5), (i + 0.5) - 180.0,
        unpack(sds.data((band * ny + j) * nx + i)))
    }
  }
}
