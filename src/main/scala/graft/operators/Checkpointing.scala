package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative operators (connected components,
  * DBSCAN): every round's plan references the previous round's output
  * several times, so without truncation the logical plan doubles per
  * round.
  *
  * Two modes:
  *  - default (`checkpointDir = None`): eager `localCheckpoint` — blocks
  *    live on executors and die with them. Correct and fast single-node /
  *    dev setting; an executor loss mid-loop fails the job.
  *  - `checkpointDir = Some(dir)`: eager RELIABLE `checkpoint()` into
  *    `dir` (HDFS/S3/posix path) — survives executor loss, the setting a
  *    1000-executor cluster run wants. Costs a write+read of each round's
  *    frame to shared storage.
  */
private[graft] object Checkpointing {

  def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir creates a fresh UUID subdirectory under `dir`
        // each call — only (re)set when the current dir isn't already
        // under the requested root, so one loop shares one subdirectory
        if (!sc.getCheckpointDir.exists(_.startsWith(dir))) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
}
