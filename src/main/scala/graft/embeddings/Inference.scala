package graft.embeddings

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tile-embedding model inference (M1).
  *
  * Reference: convml_data/pipeline/embeddings/sampling.py:46-66 and
  * embeddings/rect/sampling.py:37-72 — load a trained triplet CNN, batch
  * tiles (batch 32, embeddings/defaults.py:1), emit one float vector per
  * tile.
  *
  * Spark shape: `mapPartitions` with per-partition model init and explicit
  * micro-batching — the canonical heavyweight-model UDF pattern (stateful
  * init amortized across a partition; NOT a Catalyst expression). The
  * `TileModel` interface is where an ONNX Runtime session would plug in;
  * this container has no ONNX jars, so the default model is a deterministic
  * linear stub (emb_k = mean(tile) * w_k with fixed weights) that keeps the
  * plumbing — schema, batching, partition lifecycle — real and testable
  * (FIXTURES.md §5 prescribes exactly this stub).
  */
object Inference {

  /** Pluggable model: given a batch of tiles (each a flat pixel array),
    * return one embedding per tile. Implementations must be
    * driver-serializable; heavyweight state belongs in `init()`. */
  trait TileModel extends Serializable {
    def embDim: Int
    /** Called once per partition before any batch. */
    def init(): Unit = ()
    def embedBatch(tiles: Seq[Array[Double]]): Seq[Array[Float]]
  }

  /** Deterministic linear stub: emb_k = mean(tile) * (k+1) / embDim. */
  final class LinearStubModel(val embDim: Int) extends TileModel {
    def embedBatch(tiles: Seq[Array[Double]]): Seq[Array[Float]] =
      tiles.map { px =>
        val m = if (px.isEmpty) 0.0 else px.sum / px.length
        Array.tabulate(embDim)(k => (m * (k + 1) / embDim).toFloat)
      }
  }

  /** Run per-tile inference. Input: (tileIdCol, valuesCol: Array[Double]);
    * output: (tile_id, emb: Array[Float]). */
  def embedTiles(tiles: DataFrame, tileIdCol: String, valuesCol: String,
      model: TileModel, batchSize: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("tile_id", tiles.schema(tileIdCol).dataType),
      StructField("emb", ArrayType(FloatType, containsNull = false))))
    // Dataset-level mapPartitions (NOT .rdd + createDataFrame): the logical
    // plan stays connected, so Catalyst still prunes/pushes into the
    // upstream scan and plan-regression tests can see the whole pipeline.
    tiles.select(col(tileIdCol), col(valuesCol)).mapPartitions { it =>
      model.init()
      it.grouped(batchSize).flatMap { batch =>
        val ids = batch.map(_.get(0))
        val px = batch.map(_.getSeq[Double](1).toArray)
        val embs = model.embedBatch(px)
        ids.zip(embs).map { case (id, e) => Row(id, e.toSeq) }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
