package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Measurement harness (optimization guide §1): run one registered query
  * under the BENCH session config and print per-stage wall time, task
  * counts and shuffle bytes, so the expensive stage — not the expensive
  * query — is what gets optimized. Jobs are labeled; repeated runs show
  * the steady-state (cache-warm) stage profile the bench medians report.
  *
  * Usage: runMain graft.ProfileQuery <queryName> [runs] [sfDir]
  */
object ProfileQuery {
  private case class StageRow(id: Int, name: String, tasks: Int,
      ms: Long, shufRead: Long, shufWrite: Long, input: Long, records: Long)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName> [runs] [sfDir]")
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer.empty[StageRow]
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks,
          wall, m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead, m.outputMetrics.recordsWritten)
      }
    })

    def once(tag: String): Double = {
      spark.sparkContext.setJobDescription(s"$name $tag")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val warm = once("warmup")
    graft.operators.Dedup.releaseCaches()
    println(f"[profile] $name warmup ${warm}%.3f s; measuring $runs runs")
    (1 to runs).foreach { i =>
      stages.clear(); jobs = 0
      val t = once(s"run$i")
      graft.operators.Dedup.releaseCaches()
      // stage completion events are posted asynchronously; drain the bus
      Thread.sleep(300)
      println(f"\n[profile] $name run$i%d total ${t}%.3f s, $jobs%d jobs, ${stages.size}%d stages, stage-ms sum ${stages.map(_.ms).sum}%d")
      stages.sortBy(-_.ms).take(20).foreach { s =>
        println(f"  stage ${s.id}%4d ${s.ms}%6d ms tasks=${s.tasks}%3d shufR=${s.shufRead / 1024}%8d KB shufW=${s.shufWrite / 1024}%8d KB in=${s.input / 1024}%8d KB  ${s.name.take(90)}%s")
      }
    }
    spark.stop()
  }
}
