package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Loop-shape probe for the alternating-star components operator: runs
  * q75's pair graph through altStar and reports rounds, job count and
  * wall time per phase — the measurement behind the round-20 CC loop
  * work (the bench showed >50% of q75 wall time between stages).
  *
  * Usage: runMain graft.CcProbe [sfDir]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })

    val pairs = graft.operators.Similarity.cosineNearDupPairs(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", "label", 0.3)
      .select(col("id_a"), col("id_b"))
    pairs.persist()
    val nPairs = pairs.count()
    println(s"[ccprobe] pairs=$nPairs")

    val reps = if (args.length > 1) args(1).toInt else 3
    (1 to reps).foreach { i =>
      val j0 = jobs
      val t0 = System.nanoTime()
      val (labels, rounds) = graft.operators.Dedup.probeAltStar(pairs, "id_a", "id_b")
      val n = labels.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] run$i rounds=$rounds labels=$n jobs=${jobs - j0} wall=$dt%.2f s")
    }
    spark.stop()
  }
}
