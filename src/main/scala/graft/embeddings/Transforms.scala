package graft.embeddings

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
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

  /** M3 clustering: seeded KMeans over the embedding column — the
    * HDBSCAN-slot model of transforms.py (`min_cluster_size`-style extra
    * args parse through [[parseTransformExtraArgs]]). Deterministic for a
    * fixed (data, k, seed): k-means|| init and Lloyd iterations are
    * seed-driven. Model persists via `KMeansModel.save/load` (the joblib
    * analog). */
  def fitKmeans(df: DataFrame, vecCol: String, k: Int, seed: Long): KMeansModel =
    new KMeans()
      .setFeaturesCol("__features")
      .setPredictionCol("__cluster")
      .setK(k)
      .setSeed(seed)
      .fit(df.withColumn("__features", array_to_vector(col(vecCol))))

  /** Apply a fitted KMeans: adds `outCol` = long cluster id. */
  def applyKmeans(df: DataFrame, model: KMeansModel, vecCol: String, outCol: String): DataFrame =
    model
      .transform(df.withColumn("__features", array_to_vector(col(vecCol))))
      .withColumn(outCol, col("__cluster").cast("long"))
      .drop("__features", "__cluster")

  /** Transform identifier exactly as the reference builds it for the
    * model/output filenames and manifest
    * (transforms.py:120-139 `_build_transform_identifier`):
    * `{type}_transform[__{k1}_{v1}__{k2}_{v2}...]`. */
  def transformIdentifier(transformType: String, extraArgs: String = ""): String =
    if (extraArgs.isEmpty) s"${transformType}_transform"
    else s"${transformType}_transform__" +
      extraArgs.replace(",", "__").replace("=", "_")

  /** Extra-args parser mirroring transforms.py:103-118: the named count
    * parameters parse as Int, everything else as Double. */
  def parseTransformExtraArgs(s: String): Map[String, Any] =
    if (s.isEmpty) Map.empty
    else s.split(",").map { kv =>
      val Array(k, v) = kv.split("=")
      val parsed: Any =
        if (Set("min_cluster_size", "min_samples", "pca__n_components", "n_components")(k))
          v.toInt
        else v.toDouble
      k -> parsed
    }.toMap
}
