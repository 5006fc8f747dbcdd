package graft.plans

import java.nio.ByteBuffer
import graft.operators.Dedup
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-MinHash sketch aggregate over rows of hashed-shingle arrays.
  *
  * The TypedImperativeAggregate tier of the same sketch as
  * `operators.Sketches.minhashSketch`: the buffer is a bare Array[Long]
  * (serialized as k*8 bytes for shuffle — no kryo), update folds every
  * element through the k affine hashes, merge is elementwise min. Used
  * where the typed Dataset API isn't (plain DataFrame group-bys, SQL via
  * registration), and avoids the Encoder/serialization overhead of the
  * Aggregator form on wide shuffles. Coefficients are Dedup.aCoef/bCoef,
  * so results are identical to the typed form and the DuckDB oracle.
  */
case class MinHashSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val as = Array.tabulate(k)(Dedup.aCoef)
  private lazy val bs = Array.tabulate(k)(Dedup.bCoef)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sketch needs array<bigint>, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val xs = v.asInstanceOf[ArrayData]
      val n = xs.numElements()
      var i = 0
      while (i < k) {
        var m = buf(i)
        var j = 0
        while (j < n) {
          val h = (as(i) * xs.getLong(j) + bs(i)) % Dedup.P
          if (h < m) m = h
          j += 1
        }
        buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashSketchAgg {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** DataFrame-facing aggregate column. */
  def minhashSketchCol(xs: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSketchAgg(GraftColumnBridge.expression(xs), k).toAggregateExpression())
}
