package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental, idempotent, scene-partition-grained execution — the luigi
  * memoization contract re-expressed for Spark (SURVEY §2.12).
  *
  * Reference semantics: every task skips if its file target exists (luigi
  * core; explicit re-check convml_data/pipeline/regridding.py:93-117,
  * `_ensure_task_run` dataset/fetch_source_data.py:7-14).
  *
  * Spark analog: outputs are parquet tables partitioned by a scene-grained
  * key; a run (1) lists already-materialized partition values from the
  * filesystem (the manifest IS the directory listing — no side database),
  * (2) anti-filters the input plan down to missing partitions, (3) writes
  * only those with dynamic partition overwrite, which makes retries
  * idempotent at partition granularity. At 100 TB this is the difference
  * between "re-run the world" and "append yesterday's scenes".
  */
object Incremental {

  /** Partition values already present under `path` (empty if no output). */
  def completedPartitions(spark: SparkSession, path: String, partCol: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      // Spark escapes partition values with its OWN %XX scheme
      // (escapePathName) — URLDecoder is the wrong inverse: it turns
      // '+' into a space, so a value like 'a+b.nc' would never match
      // its own partition and be re-materialized forever
      .map(n => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(n.stripPrefix(s"$partCol=")))
      .toSet
  }

  /** Run `stage` incrementally: compute only rows whose `partCol` value has
    * no materialized partition yet, and overwrite exactly those partitions.
    * Returns the number of new partition values written. */
  def runStage(spark: SparkSession, input: DataFrame, partCol: String, path: String)(
      stage: DataFrame => DataFrame): Int = {
    val done = completedPartitions(spark, path, partCol)
    val pending = if (done.isEmpty) input
      else input.where(!col(partCol).isin(done.toSeq: _*))
    val newVals = pending.select(partCol).distinct().collect().map(_.get(0)).map(String.valueOf)
    if (newVals.nonEmpty) {
      // per-writer dynamic overwrite: mutating the SESSION conf would
      // silently change the semantics of the caller's own later
      // static-mode overwrite writes
      stage(pending).write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(path)
    }
    newVals.length
  }
}
