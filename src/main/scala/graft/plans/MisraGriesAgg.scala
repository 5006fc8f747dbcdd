package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary (Misra & Gries 1982) as a mergeable
  * TypedImperativeAggregate: at most k-1 (item, est) counters over a
  * string stream, with the mergeable-summaries merge of Agarwal et al.
  * 2013 (add counts, then subtract the k-th largest and drop <= 0) —
  * so partial aggregation, shuffle, and arbitrary merge trees all
  * preserve the guarantee:
  *
  *   freq(x) - N/k  <=  est(x)  <=  freq(x)   for every item, and
  *   every item with freq(x) > N/k is present in the summary.
  *
  * The ESTIMATES depend on stream/merge order (only the guarantee is
  * deterministic), so the production pattern — and the oracle-facing
  * one (`Sketches.heavyHitters`) — is candidates -> exact recount ->
  * threshold: the summary bounds state at k-1 counters per task where
  * a full group-by would hold one counter per DISTINCT item (unbounded
  * on open vocabularies), and the recount touches only the bounded
  * candidate set.
  *
  * Buffer: mutable map, serialized as length-prefixed UTF-8 + varless
  * longs for shuffle. Decrement-on-miss walks the map (O(k)); the
  * amortized bound is O(1) per update for the classic algorithm.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"misra_gries needs string, got $t")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null)
      MisraGriesAgg.mgUpdate(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGriesAgg.mgMerge(a, b, k)

  /** Counters sorted (est desc, item) for a deterministic ARRAY layout —
    * the VALUES remain order-dependent by nature; see class doc. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (it, c) => (-c, it) }
      .map { case (it, c) =>
        InternalRow(UTF8String.fromString(it), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (it, c) =>
      val bytes = it.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column form: `df.agg(misraGriesCol(col("tok"), k))` — an
    * array<struct<item,est>> of at most k-1 counters. */
  def misraGriesCol(item: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAgg(GraftColumnBridge.expression(item), k).toAggregateExpression())

  /** One MG stream step (shared by the aggregate and the streaming
    * operator): count if present, insert while under k-1 counters, else
    * decrement-all (snapshot first — mutating a HashMap mid-iteration
    * is undefined). */
  def mgUpdate(buf: mutable.HashMap[String, Long], item: String, k: Int): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k - 1 => buf.update(item, 1L)
      case None =>
        buf.toArray.foreach { case (it, c) =>
          if (c == 1L) buf.remove(it) else buf.update(it, c - 1)
        }
    }

  /** Mergeable-summaries merge (Agarwal et al. 2013): add counts, then
    * subtract the k-th largest and drop <= 0. Mutates and returns `a`. */
  def mgMerge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long], k: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (it, c) => a.update(it, a.getOrElse(it, 0L) + c) }
    if (a.size > k - 1) {
      val kth = a.values.toArray.sortBy(-_).apply(k - 1)
      a.toArray.foreach { case (it, c) =>
        if (c - kth <= 0L) a.remove(it) else a.update(it, c - kth)
      }
    }
    a
  }
}
