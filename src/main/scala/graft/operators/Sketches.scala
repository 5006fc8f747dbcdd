package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketch aggregators for corpus-level statistics.
  *
  * A group-level MinHash signature (min over every member's hashed
  * shingles, per hash function) estimates the Jaccard similarity between
  * whole *groups* of documents (e.g. per-source or per-shard content
  * overlap at 100 TB) from one pass: the buffer is k longs, `reduce`
  * folds each element, `merge` is elementwise min — associative and
  * commutative, so map-side partial aggregation applies and the shuffle
  * carries only k values per group. Coefficients match Dedup.aCoef/bCoef,
  * so sketches are comparable with per-document signatures (q27) and the
  * DuckDB oracle can recompute them exactly.
  */
object Sketches {

  /** Aggregator over rows of hashed-shingle arrays -> k-minhash sketch. */
  def minhashSketch(k: Int): Aggregator[Seq[Long], Array[Long], Seq[Long]] =
    new Aggregator[Seq[Long], Array[Long], Seq[Long]] {
      private val as = Array.tabulate(k)(Dedup.aCoef)
      private val bs = Array.tabulate(k)(Dedup.bCoef)
      def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
      def reduce(buf: Array[Long], xs: Seq[Long]): Array[Long] = {
        var i = 0
        while (i < k) {
          var m = buf(i)
          val it = xs.iterator
          while (it.hasNext) {
            val h = (as(i) * it.next() + bs(i)) % Dedup.P
            if (h < m) m = h
          }
          buf(i) = m
          i += 1
        }
        buf
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
        a
      }
      def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Estimated Jaccard between two k-signatures: matching fraction. */
  def sketchJaccard(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
}
