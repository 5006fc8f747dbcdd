package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** M5: the cloudmetrics-style per-tile metric plugin registry.
  *
  * Reference: convml_data/pipeline/embeddings/aux_fields/data.py:67-110 —
  * `tile_reduction_op` accepts any numpy reduction or a dynamically
  * imported `cloudmetrics` metric (e.g. `cloud_metrics__mask__iorg_objects`)
  * applied to the tile's pixel values.
  *
  * Spark shape (SURVEY §7.3): a registry of typed `Aggregator[Double,_,_]`
  * keyed by name — each metric is a single-pass mergeable aggregation, so
  * per-tile reduction is one `groupBy(tile_id).agg(metric)` with map-side
  * partial aggregation, never a collect of pixels to the driver.
  */
object TileMetrics {

  type Metric = TypedColumn[Double, Double]

  /** Mask fraction: share of pixels above a threshold (the cloud-mask
    * metric family). */
  def maskFraction(threshold: Double): Aggregator[Double, (Long, Long), Double] =
    new Aggregator[Double, (Long, Long), Double] {
      def zero: (Long, Long) = (0L, 0L)
      def reduce(b: (Long, Long), v: Double): (Long, Long) =
        (b._1 + (if (v > threshold) 1L else 0L), b._2 + 1L)
      def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = (a._1 + b._1, a._2 + b._2)
      def finish(b: (Long, Long)): Double = if (b._2 == 0) Double.NaN else b._1.toDouble / b._2
      def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Root-mean-square via mergeable (sum, sumsq, n) moments. */
  val rms: Aggregator[Double, (Double, Double, Long), Double] =
    new Aggregator[Double, (Double, Double, Long), Double] {
      def zero: (Double, Double, Long) = (0.0, 0.0, 0L)
      def reduce(b: (Double, Double, Long), v: Double): (Double, Double, Long) =
        (b._1 + v, b._2 + v * v, b._3 + 1)
      def merge(a: (Double, Double, Long), b: (Double, Double, Long)): (Double, Double, Long) =
        (a._1 + b._1, a._2 + b._2, a._3 + b._3)
      def finish(b: (Double, Double, Long)): Double =
        if (b._3 == 0) Double.NaN else math.sqrt(b._2 / b._3)
      def bufferEncoder: Encoder[(Double, Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Dynamic-range metric (max - min), mergeable. */
  val valueRange: Aggregator[Double, (Double, Double), Double] =
    new Aggregator[Double, (Double, Double), Double] {
      def zero: (Double, Double) = (Double.PositiveInfinity, Double.NegativeInfinity)
      def reduce(b: (Double, Double), v: Double): (Double, Double) =
        (math.min(b._1, v), math.max(b._2, v))
      def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
        (math.min(a._1, b._1), math.max(a._2, b._2))
      def finish(b: (Double, Double)): Double =
        if (b._1 > b._2) Double.NaN else b._2 - b._1
      def bufferEncoder: Encoder[(Double, Double)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Name -> metric registry, the `a__b__c` dynamic-import analog
    * (aux_fields/data.py:82-108). */
  def registry(name: String): TypedColumn[Double, Double] = name match {
    case "mask__fraction" => maskFraction(0.5).toColumn.name(name)
    case "value__rms" => rms.toColumn.name(name)
    case "value__range" => valueRange.toColumn.name(name)
    case other => throw new IllegalArgumentException(
      s"unknown tile metric '$other'; known: mask__fraction, value__rms, value__range")
  }
}
