package graft.embeddings

import org.apache.spark.ml.feature.{PCA, PCAModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding transforms (M3).
  *
  * Reference: convml_data/pipeline/embeddings/transforms.py:17-139 —
  * `apply_transform(da, "pca", ...)` with optional pretrained model
  * persistence, plus the transform-name manifest
  * (embeddings/sampling.py:270-289).
  *
  * Spark shape: Spark ML `PCA` over the Array[Float] embedding column
  * (array<->Vector bridged with ml.functions). Fit produces a model
  * artifact (the joblib analog — `PCAModel.save/load`), transform is a
  * distributed matrix multiply. KMeans etc. slot into the same pattern.
  */
object Transforms {

  /** Fit PCA on `vecCol` (Array[Float/Double]) and return the model. */
  def fitPca(df: DataFrame, vecCol: String, nComponents: Int): PCAModel =
    new PCA()
      .setInputCol("__features")
      .setOutputCol("__pca")
      .setK(nComponents)
      .fit(df.withColumn("__features", array_to_vector(col(vecCol))))

  /** Apply a fitted PCA: replaces `vecCol` with the reduced Array[Double]
    * in column `outCol`. */
  def applyPca(df: DataFrame, model: PCAModel, vecCol: String, outCol: String): DataFrame =
    model
      .transform(df.withColumn("__features", array_to_vector(col(vecCol))))
      .withColumn(outCol, vector_to_array(col("__pca")))
      .drop("__features", "__pca")

  /** Transform-name manifest (embeddings/sampling.py:270-289). */
  def transformName(base: String, kind: String, args: Map[String, String]): String = {
    val argStr = args.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("__")
    if (argStr.isEmpty) s"$base.$kind" else s"$base.$kind.$argStr"
  }
}
