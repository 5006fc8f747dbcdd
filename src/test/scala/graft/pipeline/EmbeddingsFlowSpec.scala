package graft.pipeline

import graft.SparkSpec
import graft.embeddings.Inference
import org.apache.spark.sql.functions._

/** §3.3 flow on a hand-checkable fixture: the stub model emits
  * emb_k = mean(tile)*(k+1)/dim, so per-tile embeddings are exactly the
  * tile means and every downstream stage is verifiable. */
class EmbeddingsFlowSpec extends SparkSpec {
  import spark.implicits._

  test("sliding-window -> inference -> PCA -> aux colocate -> binning") {
    val (nx, ny) = (16, 16)
    // two scenes; value = dst_i (a gradient), aux = 10*dst_i
    val regridded = (for {
      (sid, t) <- Seq(("s1", "2024-01-01 00:00:00"), ("s2", "2024-01-01 01:00:00"))
      i <- 0 until nx; j <- 0 until ny
    } yield (sid, java.sql.Timestamp.valueOf(t), i, j, i.toDouble))
      .toDF("scene_id", "time", "dst_i", "dst_j", "value")
    val auxPx = regridded.withColumn("value", col("value") * 10.0)

    val (joined, binned) = EndToEnd.embeddingsFlow(
      spark, regridded, auxPx, nx, ny, tileN = 8, step = 8,
      model = new Inference.LinearStubModel(4), pcaComponents = 2)

    val rows = joined
      .select("tile_id", "emb", "aux_mean")
      .as[(String, Seq[Float], Double)].collect()
    // 2 scenes x 2x2 tiles
    assert(rows.length == 8)
    rows.foreach { case (tid, emb, auxMean) =>
      // stub: emb(3) = mean(tile); tile means are 3.5 or 11.5 (gradient)
      val m = emb(3).toDouble
      assert(math.abs(m - 3.5) < 1e-5 || math.abs(m - 11.5) < 1e-5, s"$tid mean $m")
      // aux field = 10x the value field over the same cells
      assert(math.abs(auxMean - 10 * m) < 1e-4, s"$tid aux $auxMean vs ${10 * m}")
    }
    // PCA reduced to 2 components, binning non-empty and counts sum to 8
    assert(joined.select(size(col("emb_pca"))).as[Int].head() == 2)
    assert(binned.agg(sum("n")).as[Long].head() == 8)
  }
}
