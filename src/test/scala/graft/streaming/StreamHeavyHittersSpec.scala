package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Misra-Gries: the final per-shard state equals a sequential
  * MG fold of the same per-shard stream regardless of micro-batch
  * boundaries, state stays bounded at k-1 counters, and the guarantee
  * (containment + freq-N/k estimate band) holds on the full stream. */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private val K = 6

  /** (shard, seq, item): 2 shards, heavy items + singleton tail. */
  private def stream: Seq[(Long, Long, String)] = {
    val rnd = new scala.util.Random(20260814L)
    val items = Seq.fill(300)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 400).map(i => s"cold$i")
    val shuffled = items.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003L }.map(_._1)
    shuffled.zipWithIndex.map { case (it, i) =>
      ((rnd.nextInt(2)).toLong, i.toLong, it)
    }
  }

  private def refFold(rows: Seq[(Long, Long, String)]): Map[Long, Map[String, Long]] =
    rows.groupBy(_._1).view.mapValues { rs =>
      val buf = scala.collection.mutable.HashMap.empty[String, Long]
      rs.sortBy(_._2).foreach(r => graft.plans.MisraGriesAgg.mgUpdate(buf, r._3, K))
      buf.toMap
    }.toMap

  test("final state == sequential MG fold across any batch split") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = stream
    Seq(900, 137, 50).foreach { batchSize =>
      val ms = MemoryStream[(Long, Long, String)]
      val df = ms.toDF().select(col("_1").as("shard"), col("_2").as("seq"),
        col("_3").as("item"))
      val hh = StreamOps.streamingHeavyHitters(df, K)
      val sink = s"shh_$batchSize"
      val q = hh.writeStream.outputMode("update").format("memory")
        .queryName(sink).start()
      try {
        rows.grouped(batchSize).foreach { chunk =>
          ms.addData(chunk); q.processAllAvailable()
        }
      } finally q.stop()
      // last emitted row per shard is the final state
      val fin = spark.table(sink)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("shard")
            .orderBy(col("n_seen").desc)))
        .where(col("rn") === 1)
        .select("shard", "n_seen", "counters")
        .collect().map { r =>
          r.getLong(0) -> (r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2)
            .map(c => c.getString(0) -> c.getLong(1)).toMap)
        }.toMap
      val ref = refFold(rows)
      val perShardN = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      fin.foreach { case (shard, (nSeen, counters)) =>
        assert(nSeen === perShardN(shard), s"batch $batchSize shard $shard n")
        assert(counters === ref(shard), s"batch $batchSize shard $shard state")
        assert(counters.size <= K - 1, s"batch $batchSize shard $shard size")
      }
      // guarantee on the true per-shard stream
      rows.groupBy(_._1).foreach { case (shard, rs) =>
        val exact = rs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
        val n = rs.size
        fin(shard)._2.foreach { case (it, est) =>
          val f = exact(it)
          assert(est <= f && est >= f - n / K, s"shard $shard item $it")
        }
        exact.filter { case (_, f) => f * K > n }.keys.foreach { it =>
          assert(fin(shard)._2.contains(it), s"shard $shard lost $it")
        }
      }
    }
  }
}
