package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DSv2 mount of the Arrow reader: spark.read.format(...) semantics,
  * block-level split planning, column pruning reaching the decode, and
  * the dictionary/compressed/uint goldens through the DSv2 path. */
class ArrowDataSourceSpec extends SparkSpec {

  private val Fmt = "graft.sources.ArrowDataSource"
  private def fixture(name: String): String = {
    val f = new File(s"src/test/resources/fixtures/$name")
    require(f.isFile, s"fixture $name missing")
    f.getAbsolutePath
  }

  test("golden file reads with full schema and matches the library reader") {
    val df = spark.read.format(Fmt).option("path", fixture("golden.arrow")).load()
    assert(df.schema.fieldNames.toSeq == Seq("id", "small", "name", "score",
      "ratio", "ok", "blob", "ts", "ts_local", "emb", "tags"))
    val lib = ArrowIpc.readBlocks(spark, fixture("golden.arrow"))
    def normRow(r: org.apache.spark.sql.Row): String =
      r.toSeq.map {
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case v => String.valueOf(v)
      }.mkString("|")
    assert(df.collect().map(normRow).sorted.toSeq ==
      lib.collect().map(normRow).sorted.toSeq)
  }

  test("one partition per record-batch block") {
    val df = spark.read.format(Fmt).option("path", fixture("golden.arrow")).load()
    assert(df.rdd.getNumPartitions == 3) // golden has 3 batches
  }

  test("column pruning reaches the scan (readSchema + values)") {
    val df = spark.read.format(Fmt).option("path", fixture("golden.arrow")).load()
      .select("id", "name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=id,name"), plan.take(800))
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toMap
      .apply(1L) == "alpha")
  }

  test("dictionary, compressed and uint goldens read through DSv2") {
    val dict = spark.read.format(Fmt)
      .option("path", fixture("golden_dict.arrow")).load()
    assert(dict.where(col("cat") === "apple").count() == 3)
    val lz4 = spark.read.format(Fmt)
      .option("path", fixture("golden_lz4.arrow")).load()
      .select("id", "name")
    assert(lz4.count() == 7)
    val uint = spark.read.format(Fmt)
      .option("path", fixture("golden_uint.arrow")).load()
      .select("id", "u32")
    assert(uint.where(col("u32") === 4294967295L).count() == 1)
  }

  test("struct/map/time/duration columns SKIP positionally under " +
      "projection (round-13 skip paths)") {
    // project AWAY the nested columns: the skip path must consume their
    // FieldNodes + buffers exactly or every later column misaligns
    val st = spark.read.format(Fmt)
      .option("path", fixture("golden_struct.arrow")).load()
      .select("id") // skips struct, nested struct<struct,list>, list<struct>
    assert(st.collect().map(_.getLong(0)).sorted.toSeq == (1L to 5L))
    val mp = spark.read.format(Fmt)
      .option("path", fixture("golden_map.arrow")).load()
      .select("id", "day64") // skips map + three ts-unit columns
    assert(mp.where(col("day64") === java.sql.Date.valueOf("2020-02-02"))
      .count() == 1)
    val td = spark.read.format(Fmt)
      .option("path", fixture("golden_timedur.arrow")).load()
      .select("id", "t64us") // skips three durations + two time columns
    assert(td.collect().map(r => (r.getLong(0),
      Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(-1L))).toMap
      .apply(1L) == 86399999999L)
  }

  test("a directory of .arrow parts mounts as one table") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(3)
    val dir = Files.createTempDirectory("arrow-dsv2").toString
    ArrowIpc.write(docs, dir, batchRows = 256, compression = Some("lz4"))
    val df = spark.read.format(Fmt).option("path", dir).load()
    assert(df.count() == docs.count())
    // pruned aggregate equals the parquet-side truth
    val got = df.groupBy("lang").agg(sum("n_chars").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = docs.groupBy("lang").agg(sum("n_chars").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
