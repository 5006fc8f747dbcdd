package org.apache.spark.sql

/** Bridge into the private[sql] Dataset.ofRows so an ITERATIVE operator
  * can run its loop under a sibling session (same SparkContext, own
  * SQLConf) and hand frames across the session boundary: the loop
  * session fixes its shuffle partitioning once from the measured loop
  * frame size instead of re-deriving it adaptively at every exchange of
  * every round, without mutating the caller session's conf (which other
  * threads may be planning against concurrently).
  *
  * Only ever used on lineage-truncated frames (LogicalRDD leaves), so
  * the re-analysis under the target session is a no-op walk of a leaf
  * plan — no resolution against catalogs or session state.
  */
object GraftSessionBridge {
  def rebind(df: Dataset[Row], to: SparkSession): Dataset[Row] =
    org.apache.spark.sql.classic.Dataset.ofRows(
      to.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution.logical)
}
