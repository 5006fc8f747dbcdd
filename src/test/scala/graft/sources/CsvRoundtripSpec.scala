package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CSV sink -> source (the q164 options): RFC-4180 quoting fidelity on
  * hostile text (quotes, commas, CR/LF, unicode), typed columns, null
  * round-trip, and partition-directory pruning. */
class CsvRoundtripSpec extends SparkSpec {

  private def opts(r: org.apache.spark.sql.DataFrameReader) =
    r.option("header", true).option("escape", "\"")
      .option("multiLine", true)
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)

  test("hostile text round-trips exactly: quotes, commas, newlines, unicode") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csv-rt").toString
    val rows = Seq(
      (1L, "plain words", 3L),
      (2L, "comma, inside", -7L),
      (3L, "a \"quoted\" phrase, with both", 0L),
      (4L, "line one\nline two\r\nline three", 42L),
      (5L, "κλμ — ünïcode 漢字 🌍", 9L),
      (6L, "trailing spaces   ", 1L),
      (7L, "   leading spaces", 2L),
      (8L, "quote at end\"", 5L),
      (9L, null.asInstanceOf[String], 6L))
    val df = rows.toDF("id", "text", "v")
    df.write.mode("overwrite")
      .option("header", true).option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .csv(dir)
    val back = opts(s.read).schema("id LONG, text STRING, v LONG").csv(dir)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back.toSeq === rows.sortBy(_._1))
  }

  test("partition filter prunes CSV directories and values survive") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csv-pp").toString
    (0L until 40L).map(i => (i, s"t,\"${i}\"\n", s"p${i % 4}"))
      .toDF("id", "text", "part")
      .write.mode("overwrite").partitionBy("part")
      .option("header", true).option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .csv(dir)
    val q = opts(s.read).schema("id LONG, text STRING").csv(dir)
      .where(col("part") === "p1")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part#"),
      s"partition filter missing:\n${plan.take(1200)}")
    val got = q.select("id", "text").as[(Long, String)].collect().sortBy(_._1)
    val exp = (0L until 40L).filter(_ % 4 == 1)
      .map(i => (i, s"t,\"${i}\"\n"))
    assert(got.toSeq === exp)
  }
}
