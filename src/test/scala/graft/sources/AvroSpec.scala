package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Avro container source/sink: foreign-fixture decode (Python-stdlib
  * writer, raw-deflate blocks), table round-trips including timestamp
  * micros and nulls, and schema mapping edges. */
class AvroSpec extends SparkSpec {

  private def fixturePath(name: String): String = {
    val f = new java.io.File(s"src/test/resources/fixtures/$name")
    require(f.isFile, s"fixture $name missing — run tools/make_fixtures.py")
    f.getAbsolutePath
  }

  test("foreign fixture: deflate blocks, nullable unions, both blocks decode") {
    val got = Avro.read(spark, fixturePath("golden.avro"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq
    assert(got == Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -2.25, false),
      (3L, null, null, true),
      (4L, "delta", 0.125, false),
      (5L, "epsilon", 1e300, true),
      (6L, "", 0.0, false)))
    val sch = Avro.read(spark, fixturePath("golden.avro")).schema
    assert(sch.fields.map(f => (f.name, f.nullable)).toSeq ==
      Seq(("id", false), ("name", true), ("score", true), ("ok", false)))
  }

  test("documents table round-trips through write -> read") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("avro-rt").toString
    Avro.write(docs, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.collect().map(_.toSeq).toSet == docs.collect().map(_.toSeq).toSet)
  }

  test("timestamps survive as micros (events table)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") < 100)
    val dir = java.nio.file.Files.createTempDirectory("avro-ts").toString
    Avro.write(ev, dir)
    val back = Avro.read(spark, dir)
    assert(back.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(back.collect().map(_.toSeq).toSet == ev.collect().map(_.toSeq).toSet)
  }

  test("fuzz sweep: random schemas/codecs/blocks decode to the manifest") {
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixturePath("fuzz/avro_manifest.txt"))), "UTF-8")
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def parse(tok: String): Any = tok.head match {
      case '~' => null
      case 'l' => tok.tail.toLong
      case 'i' => tok.tail.toInt
      case 'd' => tok.tail.toDouble
      case 'f' => tok.tail.toFloat
      case 't' => true
      case 'u' => false
      case 's' => new String(unhex(tok.tail), "UTF-8")
      case 'b' => unhex(tok.tail).toSeq // compare as Seq, not array identity
    }
    var cases = 0
    manifest.linesIterator.filter(_.nonEmpty).foreach { line =>
      val parts = line.split(";", -1)
      val (name, fieldSpec, rowSpec) = (parts(0), parts(2), parts(3))
      val want: Seq[Seq[Any]] =
        if (rowSpec.isEmpty) Seq.empty
        else rowSpec.split("\\|", -1).toSeq.map(r =>
          r.split(",", -1).toSeq.map(parse))
      val df = Avro.read(spark, fixturePath(s"fuzz/$name.avro"))
      // schema: names + nullability from the spec
      val specFields = fieldSpec.split(",", -1).map(_.split(":"))
      assert(df.schema.fields.map(f => (f.name, f.nullable)).toSeq ==
        specFields.map(a => (a(0), a(2) == "n")).toSeq, s"$name schema")
      val got = df.collect().toSeq.map(_.toSeq.map {
        case a: Array[Byte] => a.toSeq
        case v => v
      })
      assert(got == want, s"$name rows: ${got.take(2)} vs ${want.take(2)}")
      cases += 1
    }
    assert(cases >= 10, s"manifest should carry >= 10 cases, got $cases")
  }

  test("split-on-sync read of one consolidated container equals the " +
    "sequential read, each block decoded exactly once") {
    val s = spark
    import s.implicits._
    // one big container file (coalesce(1)) with many small blocks
    val df = (0L until 5000L).map(i => (i, s"row-$i-" + ("x" * (i % 97).toInt)))
      .toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("avro-split").toString
    Avro.write(df.coalesce(1), dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head.getAbsolutePath
    for (split <- Seq(512L, 4096L, 1L << 20)) {
      val got = Avro.readSplit(spark, file, splitBytes = split)
        .collect().map(_.toSeq).toSeq
      assert(got.size == 5000, s"split=$split size ${got.size}")
      assert(got.toSet == df.collect().map(_.toSeq).toSet, s"split=$split values")
    }
    // tiny splits genuinely fan out: more than one range carries blocks
    val perRange = Avro.readSplit(spark, file, splitBytes = 4096L)
      .groupBy(org.apache.spark.sql.functions.spark_partition_id())
      .count().collect()
    assert(perRange.count(_.getLong(1) > 0) > 1,
      s"expected multiple productive ranges: ${perRange.mkString(",")}")
  }

  test("null codec writes uncompressed and reads back") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val dir = java.nio.file.Files.createTempDirectory("avro-null").toString
    Avro.write(df, dir, codec = "null")
    assert(Avro.read(spark, dir).collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
  }
}
