package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal FlatBuffers wire-format layer, written from the public
  * FlatBuffers internals specification (google.github.io/flatbuffers/
  * flatbuffers_internals.html) — just enough of the encoding for Arrow
  * IPC metadata (Schema / RecordBatch / Footer tables): little-endian
  * scalars, vtable-indirected tables, uoffset-referenced strings,
  * vectors of scalars / structs / tables, and unions (type byte +
  * value offset as two adjacent vtable slots).
  *
  * No code generation: Arrow's .fbs field slots are small and stable
  * (Schema.fbs / Message.fbs / File.fbs in the Arrow spec), so
  * [[ArrowIpc]] addresses them by slot index directly.
  *
  * Reader side ([[FbTable]]) wraps a ByteBuffer without copying.
  * Builder side ([[FbBuilder]]) is the canonical back-to-front
  * construction: data is written from the end of a growing buffer, an
  * item's identity is its distance from the buffer end ("offset"), and
  * uoffset/soffset arithmetic mirrors the reference Java builder.
  */
object FlatBuf {

  /** A table (or the root) inside a finished flatbuffer. `pos` is the
    * absolute position of the table's soffset word. */
  final class FbTable(val bb: ByteBuffer, val pos: Int) {
    private val vt = pos - bb.getInt(pos) // soffset: vtable position
    private val vtSize = bb.getShort(vt) & 0xffff

    /** Inline position offset of field `slot`, 0 when absent. */
    def fieldOff(slot: Int): Int = {
      val o = 4 + slot * 2
      if (o < vtSize) bb.getShort(vt + o) & 0xffff else 0
    }
    def getBool(slot: Int, dflt: Boolean): Boolean = {
      val o = fieldOff(slot); if (o == 0) dflt else bb.get(pos + o) != 0
    }
    def getByte(slot: Int, dflt: Byte): Byte = {
      val o = fieldOff(slot); if (o == 0) dflt else bb.get(pos + o)
    }
    def getShort(slot: Int, dflt: Short): Short = {
      val o = fieldOff(slot); if (o == 0) dflt else bb.getShort(pos + o)
    }
    def getInt(slot: Int, dflt: Int): Int = {
      val o = fieldOff(slot); if (o == 0) dflt else bb.getInt(pos + o)
    }
    def getLong(slot: Int, dflt: Long): Long = {
      val o = fieldOff(slot); if (o == 0) dflt else bb.getLong(pos + o)
    }
    /** Absolute position of a referenced table/vector/string, -1 if absent. */
    def indirect(slot: Int): Int = {
      val o = fieldOff(slot)
      if (o == 0) -1 else { val p = pos + o; p + bb.getInt(p) }
    }
    def table(slot: Int): Option[FbTable] = {
      val p = indirect(slot); if (p < 0) None else Some(new FbTable(bb, p))
    }
    def string(slot: Int): Option[String] = {
      val p = indirect(slot)
      if (p < 0) None
      else {
        val n = bb.getInt(p)
        val a = new Array[Byte](n)
        val d = bb.duplicate(); d.position(p + 4); d.get(a)
        Some(new String(a, java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    /** Vector: (absolute element-0 position, length); (-1, 0) if absent. */
    def vector(slot: Int): (Int, Int) = {
      val p = indirect(slot)
      if (p < 0) (-1, 0) else (p + 4, bb.getInt(p))
    }
    /** Element i of a vector of tables (uoffset elements). */
    def vectorTable(slot: Int, i: Int): FbTable = {
      val (base, n) = vector(slot)
      require(i >= 0 && i < n, s"vector index $i out of $n")
      val ep = base + i * 4
      new FbTable(bb, ep + bb.getInt(ep))
    }
    def vectorLen(slot: Int): Int = vector(slot)._2
  }

  /** Root table of a finished buffer starting at `off` within `bytes`. */
  def root(bytes: Array[Byte], off: Int, len: Int): FbTable = {
    val bb = ByteBuffer.wrap(bytes, off, len).slice().order(ByteOrder.LITTLE_ENDIAN)
    new FbTable(bb, bb.getInt(0))
  }

  /** Back-to-front builder (mirrors the reference Java implementation's
    * offset arithmetic; no vtable dedup — Arrow metadata is KB-scale). */
  final class FbBuilder(initial: Int = 1024) {
    private var buf = new Array[Byte](math.max(initial, 64))
    private var space = buf.length // index of the FIRST used byte
    private var minalign = 1
    private var vtable: Array[Int] = _
    private var vtableSlots = 0
    private var objectStart = 0

    def offset: Int = buf.length - space

    private def grow(needed: Int): Unit = {
      if (space >= needed) return
      val used = buf.length - space
      var n = buf.length
      while (n - used < needed) n <<= 1
      val nb = new Array[Byte](n)
      System.arraycopy(buf, space, nb, n - used, used)
      buf = nb
      space = n - used
    }

    /** Align so that after writing `additional` bytes the position is
      * `size`-aligned; zero-pads. */
    def prep(size: Int, additional: Int): Unit = {
      if (size > minalign) minalign = size
      val alignSize = ((~(offset + additional)) + 1) & (size - 1)
      grow(alignSize + size + additional)
      var i = 0
      while (i < alignSize) { space -= 1; buf(space) = 0; i += 1 }
    }

    def putByte(v: Byte): Unit = { grow(1); space -= 1; buf(space) = v }
    def putShort(v: Short): Unit = {
      grow(2); space -= 2
      buf(space) = v.toByte; buf(space + 1) = (v >> 8).toByte
    }
    def putInt(v: Int): Unit = {
      grow(4); space -= 4
      buf(space) = v.toByte; buf(space + 1) = (v >> 8).toByte
      buf(space + 2) = (v >> 16).toByte; buf(space + 3) = (v >> 24).toByte
    }
    def putLong(v: Long): Unit = {
      grow(8); space -= 8
      var i = 0
      while (i < 8) { buf(space + i) = (v >> (8 * i)).toByte; i += 1 }
    }

    def addByte(v: Byte): Unit = { prep(1, 0); putByte(v) }
    def addShort(v: Short): Unit = { prep(2, 0); putShort(v) }
    def addInt(v: Int): Unit = { prep(4, 0); putInt(v) }
    def addLong(v: Long): Unit = { prep(8, 0); putLong(v) }
    /** Reference to an earlier-built item. */
    def addOffset(off: Int): Unit = {
      prep(4, 0)
      require(off <= offset, "flatbuf: forward reference")
      putInt(offset - off + 4)
    }

    def createString(s: String): Int = {
      val utf8 = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      addByte(0) // null terminator (not counted in length)
      startVector(1, utf8.length, 1)
      grow(utf8.length)
      space -= utf8.length
      System.arraycopy(utf8, 0, buf, space, utf8.length)
      endVector(utf8.length)
    }

    def startVector(elemSize: Int, count: Int, alignment: Int): Unit = {
      prep(4, elemSize * count)
      prep(alignment, elemSize * count)
    }
    def endVector(count: Int): Int = { putInt(count); offset }

    /** Vector of references: offsets in ELEMENT order (written reversed
      * internally, as the buffer grows downward). */
    def createOffsetVector(offs: Seq[Int]): Int = {
      startVector(4, offs.size, 4)
      offs.reverse.foreach(addOffset)
      endVector(offs.size)
    }

    def startTable(numSlots: Int): Unit = {
      vtable = new Array[Int](numSlots)
      vtableSlots = numSlots
      objectStart = offset
    }
    def slotByte(slot: Int, v: Byte, dflt: Byte): Unit =
      if (v != dflt) { addByte(v); vtable(slot) = offset }
    def slotBool(slot: Int, v: Boolean, dflt: Boolean): Unit =
      if (v != dflt) { addByte(if (v) 1 else 0); vtable(slot) = offset }
    def slotShort(slot: Int, v: Short, dflt: Short): Unit =
      if (v != dflt) { addShort(v); vtable(slot) = offset }
    def slotInt(slot: Int, v: Int, dflt: Int): Unit =
      if (v != dflt) { addInt(v); vtable(slot) = offset }
    def slotLong(slot: Int, v: Long, dflt: Long): Unit =
      if (v != dflt) { addLong(v); vtable(slot) = offset }
    def slotOffset(slot: Int, off: Int): Unit =
      if (off != 0) { addOffset(off); vtable(slot) = offset }
    /** For vectors of structs built in place: record the slot at the
      * current offset (the struct vector already written). */
    def slotStructVector(slot: Int, off: Int): Unit = slotOffset(slot, off)

    def endTable(): Int = {
      addInt(0) // placeholder for the vtable soffset
      val tableLoc = offset
      // trim trailing absent slots
      var trimmed = vtableSlots
      while (trimmed > 0 && vtable(trimmed - 1) == 0) trimmed -= 1
      var i = trimmed - 1
      while (i >= 0) {
        val fieldOff = if (vtable(i) != 0) (tableLoc - vtable(i)).toShort else 0.toShort
        addShort(fieldOff)
        i -= 1
      }
      addShort((tableLoc - objectStart).toShort) // inline table byte size
      addShort(((trimmed + 2) * 2).toShort)      // vtable byte size
      val vtLoc = offset
      // patch the placeholder: soffset = vtLoc - tableLoc (offset space)
      val tablePos = buf.length - tableLoc
      val v = vtLoc - tableLoc
      buf(tablePos) = v.toByte
      buf(tablePos + 1) = (v >> 8).toByte
      buf(tablePos + 2) = (v >> 16).toByte
      buf(tablePos + 3) = (v >> 24).toByte
      vtable = null
      tableLoc
    }

    /** Finish with root `off`; returns the completed bytes. */
    def finish(off: Int): Array[Byte] = {
      prep(minalign, 4)
      addOffset(off)
      java.util.Arrays.copyOfRange(buf, space, buf.length)
    }
  }
}
