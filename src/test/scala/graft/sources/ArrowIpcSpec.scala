package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Arrow IPC source/sink, proven against TWO independent reference
  * implementations:
  *   - pyarrow (Arrow C++): golden.arrow / golden.arrows fixtures from
  *     tools/make_arrow_fixtures.py, decoded here and compared against
  *     the plain-text manifest;
  *   - arrow-java (bundled with Spark): our writer's bytes are read
  *     back by ArrowFileReader/ArrowStreamReader, and arrow-java's
  *     writer output is decoded by our reader.
  * Neither direction shares a single line of code with ArrowIpc.
  */
class ArrowIpcSpec extends SparkSpec {

  private def fixturePath(name: String): String = {
    val f = new File(s"src/test/resources/fixtures/$name")
    require(f.isFile, s"fixture $name missing — run tools/make_arrow_fixtures.py")
    f.getAbsolutePath
  }

  // ---- manifest parsing -------------------------------------------------

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parseTok(tok: String): Any = tok.head match {
    case '~' => null
    case 'i' => tok.tail.toLong
    case 'd' => tok.tail match {
      case "inf" => Double.PositiveInfinity
      case "-inf" => Double.NegativeInfinity
      case "nan" => Double.NaN
      case x => x.toDouble
    }
    case 't' => true
    case 'u' => false
    case 's' => new String(unhex(tok.tail), StandardCharsets.UTF_8)
    case 'b' => unhex(tok.tail).toSeq
    case 'T' => tok.tail // timestamp as ISO string; compared formatted
    case 'D' => tok.tail // date32 as ISO yyyy-MM-dd
    case 'c' => tok.tail // decimal as plain string (scale preserved)
    case '[' =>
      val inner = tok.substring(1, tok.length - 1).trim
      if (inner.isEmpty) Seq.empty[Any]
      else inner.split(" ").toSeq.map(parseTok)
  }

  /** Split one manifest line on ';' but not inside [...] (no nesting). */
  private def splitLine(line: String): Seq[String] =
    line.split(";", -1).toSeq

  private lazy val manifestRows: Seq[Seq[Any]] =
    new String(Files.readAllBytes(Paths.get(fixturePath("golden_arrow_manifest.txt"))),
      StandardCharsets.UTF_8).linesIterator.filter(_.nonEmpty)
      .map(l => splitLine(l).map(parseTok)).toSeq

  /** Normalize a decoded Spark row for manifest comparison. */
  private def norm(v: Any): Any = v match {
    case null => null
    case t: java.sql.Timestamp =>
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime.format(fmt)
    case ldt: java.time.LocalDateTime =>
      ldt.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    case b: Array[Byte] => b.toSeq
    case d: java.sql.Date => d.toString // ISO yyyy-MM-dd
    case bd: java.math.BigDecimal => bd.toPlainString
    case f: Float => f.toDouble
    case i: Int => i.toLong
    case s: scala.collection.Seq[_] => s.toSeq.map(norm)
    case other => other
  }

  private def assertMatchesManifest(rows: Seq[Row]): Unit = {
    assert(rows.length == manifestRows.length)
    rows.sortBy(_.getLong(0)).zip(manifestRows).foreach { case (got, want) =>
      val g = got.toSeq.map(norm)
      // float64 'inf' and -0.0 compare via toString-insensitive equality
      g.zip(want).zipWithIndex.foreach { case ((gv, wv), i) =>
        (gv, wv) match {
          case (a: Double, b: Double) =>
            assert(java.lang.Double.compare(a, b) == 0 ||
              math.abs(a - b) <= math.abs(b) * 1e-6, s"col $i: $a vs $b")
          case (a: Seq[_], b: Seq[_]) =>
            assert(a.length == b.length, s"col $i len")
            a.zip(b).foreach {
              case (x: Double, y: Double) =>
                assert(java.lang.Double.compare(x, y) == 0 ||
                  math.abs(x - y) <= math.abs(y) * 1e-6 ||
                  (x.isInfinite && y.isInfinite), s"col $i elem: $x vs $y")
              case (x, y) => assert(norm(x) == norm(y), s"col $i elem: $x vs $y")
            }
          case _ => assert(gv == wv, s"col $i: $gv vs $wv (row ${got.getLong(0)})")
        }
      }
    }
  }

  // ---- pyarrow golden fixtures ------------------------------------------

  test("pyarrow golden FILE format decodes (schema + 3 batches)") {
    val (schema, blocks) = ArrowIpc.readFooter(new File(fixturePath("golden.arrow")))
    assert(blocks.length == 3)
    assert(schema.fieldNames.toSeq == Seq("id", "small", "name", "score",
      "ratio", "ok", "blob", "ts", "ts_local", "emb", "tags"))
    assert(schema("id").dataType == LongType && !schema("id").nullable)
    assert(schema("ts").dataType == TimestampType)
    assert(schema("ts_local").dataType == TimestampNTZType)
    assert(schema("emb").dataType == ArrayType(FloatType, containsNull = true))
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden.arrow")))
    val (sch2, rows) = ArrowIpc.readStreamBytes(bytes)
    assert(sch2 == schema)
    assertMatchesManifest(rows.toSeq)
  }

  test("pyarrow golden STREAM format decodes to the same rows") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden.arrows")))
    val (_, rows) = ArrowIpc.readStreamBytes(bytes)
    assertMatchesManifest(rows.toSeq)
  }

  test("readBlocks (two-phase parallel file read) equals the stream read") {
    val df = ArrowIpc.readBlocks(spark, fixturePath("golden.arrow"))
    assertMatchesManifest(df.collect().toSeq)
  }

  // ---- pyarrow extended types (date32/large/fixed-size-list/decimal) -----

  private lazy val extManifest: Seq[Seq[Any]] =
    new String(Files.readAllBytes(Paths.get(fixturePath("golden_ext_manifest.txt"))),
      StandardCharsets.UTF_8).linesIterator.filter(_.nonEmpty)
      .map(l => splitLine(l).map(parseTok)).toSeq

  private def assertExtRows(rows: Seq[Row]): Unit = {
    assert(rows.length == extManifest.length)
    rows.sortBy(_.getLong(0)).zip(extManifest).foreach { case (got, want) =>
      got.toSeq.map(norm).zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"row ${got.getLong(0)} col $i: $g vs $w")
      }
    }
  }

  test("pyarrow date32/large_utf8/large_binary/large_list/fixed_size_list/" +
      "decimal128 golden decodes exactly") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_ext.arrow")))
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    assert(schema("day").dataType == DateType)
    assert(schema("big_s").dataType == StringType)
    assert(schema("big_s").metadata.getBoolean("arrow_large_offsets"))
    assert(schema("big_l").dataType == ArrayType(LongType, containsNull = true))
    assert(schema("big_l").metadata.getBoolean("arrow_large_offsets"))
    assert(schema("emb4").dataType == ArrayType(FloatType, containsNull = true))
    assert(schema("emb4").metadata.getLong("arrow_fsl_size") == 4L)
    assert(schema("amount").dataType == DecimalType(12, 3))
    assertExtRows(rows.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_ext.arrows")))
    assertExtRows(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
    assertExtRows(ArrowIpc.readBlocks(spark, fixturePath("golden_ext.arrow"))
      .collect().toSeq)
  }

  test("date + decimal columns round-trip through our writer and arrow-java") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, DATE'2020-02-02', CAST(123.456 AS DECIMAL(12,3))),
        |  (2L, DATE'1969-12-31', CAST(-0.001 AS DECIMAL(12,3))),
        |  (3L, CAST(NULL AS DATE), CAST(NULL AS DECIMAL(12,3))),
        |  (4L, DATE'2038-01-19', CAST(999999999.999 AS DECIMAL(12,3)))
        |  AS t(id, day, amt)""".stripMargin).coalesce(1)
    val dir = Files.createTempDirectory("arrow-ext-rt").toString
    ArrowIpc.write(df, dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema("day").dataType == DateType)
    assert(back.schema("amt").dataType == DecimalType(12, 3))
    def key(r: Row) = (r.getLong(0),
      Option(r.getDate(1)).map(_.toString),
      Option(r.getDecimal(2)).map(_.toPlainString))
    assert(back.collect().map(key).toSet == df.collect().map(key).toSet)
    // foreign reader: arrow-java sees date32 + decimal128 values
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowFileReader
    import org.apache.arrow.vector.{DateDayVector, DecimalVector}
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new ArrowFileReader(ch, alloc)
    try {
      val root = rd.getVectorSchemaRoot
      assert(rd.loadNextBatch())
      val ids = root.getVector("id")
      val i1 = (0 until root.getRowCount).find(i => ids.getObject(i) == 1L).get
      assert(root.getVector("day").asInstanceOf[DateDayVector].get(i1) ==
        java.time.LocalDate.of(2020, 2, 2).toEpochDay.toInt)
      assert(root.getVector("amt").asInstanceOf[DecimalVector].getObject(i1)
        .toPlainString == "123.456")
      val i2 = (0 until root.getRowCount).find(i => ids.getObject(i) == 2L).get
      assert(root.getVector("amt").asInstanceOf[DecimalVector].getObject(i2)
        .toPlainString == "-0.001")
    } finally { rd.close(); ch.close(); alloc.close() }
  }

  // ---- pyarrow uint goldens (physical-stride proof) ----------------------

  private lazy val uintManifest: Seq[Seq[Any]] =
    new String(Files.readAllBytes(Paths.get(fixturePath("golden_uint_manifest.txt"))),
      StandardCharsets.UTF_8).linesIterator.filter(_.nonEmpty)
      .map(l => splitLine(l).map(parseTok)).toSeq

  private def assertUintRows(rows: Seq[Row]): Unit = {
    assert(rows.length == uintManifest.length)
    rows.sortBy(_.getLong(0)).zip(uintManifest).foreach { case (got, want) =>
      val g = got.toSeq.map {
        case null => null
        case s: Short => s.toLong
        case i: Int => i.toLong
        case l: Long => l
        case seq: scala.collection.Seq[_] =>
          seq.toSeq.map { case null => null; case s: Short => s.toLong }
        case other => other
      }
      assert(g == want, s"row ${got.getLong(0)}: $g vs $want")
    }
  }

  test("pyarrow uint8/16/32 golden decodes at the PHYSICAL stride") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_uint.arrow")))
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    // widened Spark types, physical width in metadata
    assert(schema("u8").dataType == ShortType)
    assert(schema("u8").metadata.getLong("arrow_uint_bits") == 8L)
    assert(schema("u16").dataType == IntegerType)
    assert(schema("u16").metadata.getLong("arrow_uint_bits") == 16L)
    assert(schema("u32").dataType == LongType)
    assert(schema("u32").metadata.getLong("arrow_uint_bits") == 32L)
    assert(schema("pix").dataType == ArrayType(ShortType, containsNull = true))
    assert(schema("pix").metadata.getLong("arrow_item_uint_bits") == 8L)
    assertUintRows(rows.toSeq)
  }

  test("pyarrow uint STREAM format + readBlocks agree with the manifest") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_uint.arrows")))
    assertUintRows(ArrowIpc.readStreamBytes(bytes)._2.toSeq)
    val df = ArrowIpc.readBlocks(spark, fixturePath("golden_uint.arrow"))
    assertUintRows(df.collect().toSeq)
  }

  test("pyarrow uint64 golden widens to Decimal(20,0) with exact magnitude") {
    val want = Seq(
      1L -> "0", 2L -> "1", 3L -> "9223372036854775808",
      4L -> "18446744073709551615", 5L -> null,
      6L -> "123456789012345678")
    def check(rows: Seq[Row], schema: StructType): Unit = {
      assert(schema("u").dataType == DecimalType(20, 0))
      assert(schema("u").metadata.getLong("arrow_uint_bits") == 64L)
      val got = rows.sortBy(_.getLong(0)).map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[java.math.BigDecimal]
          .toBigInteger.toString).orNull))
      assert(got == want)
    }
    val fBytes = Files.readAllBytes(Paths.get(fixturePath("golden_uint64.arrow")))
    val (fs, fr) = ArrowIpc.readStreamBytes(fBytes)
    check(fr.toSeq, fs)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_uint64.arrows")))
    val (ss, sr) = ArrowIpc.readStreamBytes(sBytes)
    check(sr.toSeq, ss)
    // the manifest is the generator's own statement of the same values
    val manifest = new String(Files.readAllBytes(Paths.get(
      fixturePath("golden_uint64_manifest.txt"))), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { l =>
        val Array(a, b) = l.split(";")
        (a.tail.toLong, if (b == "~") null else b.tail)
      }.toSeq
    assert(manifest == want)
  }

  test("asUint(64) writes true uint64 that pyarrow-shaped readers and our " +
      "reader round-trip") {
    import spark.implicits._
    val df = Seq(
      (1L, BigDecimal(0)),
      (2L, BigDecimal("18446744073709551615")),
      (3L, BigDecimal("9223372036854775808"))).toDF("id", "u")
      .select(col("id"), col("u").cast(DecimalType(20, 0)).as("u"))
    val tagged = ArrowIpc.asUint(df.coalesce(1), Map("u" -> 64))
    val dir = Files.createTempDirectory("arrow-uint64-rt").toString
    ArrowIpc.write(tagged, dir)
    val back = ArrowIpc.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDecimal(1).toBigInteger.toString)).toSet
    assert(back == Set((1L, "0"), (2L, "18446744073709551615"),
      (3L, "9223372036854775808")))
    // foreign reader: arrow-java sees a true uint64 column
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.UInt8Vector
    import org.apache.arrow.vector.ipc.ArrowFileReader
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new ArrowFileReader(ch, alloc)
    try {
      val root = rd.getVectorSchemaRoot
      assert(rd.loadNextBatch())
      val ids = root.getVector("id")
      val i2 = (0 until root.getRowCount).find(i => ids.getObject(i) == 2L).get
      assert(root.getVector("u").asInstanceOf[UInt8Vector]
        .getObjectNoOverflow(i2).toString == "18446744073709551615")
    } finally { rd.close(); ch.close(); alloc.close() }
    // out-of-range rejects loudly at encode time
    val neg = Seq((1L, BigDecimal(-1))).toDF("id", "u")
      .select(col("id"), col("u").cast(DecimalType(20, 0)).as("u"))
    val dir2 = Files.createTempDirectory("arrow-uint64-bad").toString
    val e = intercept[org.apache.spark.SparkException] {
      ArrowIpc.write(ArrowIpc.asUint(neg.coalesce(1), Map("u" -> 64)), dir2)
    }
    assert(e.getMessage.contains("uint64 range") ||
      Option(e.getCause).exists(_.getMessage.contains("uint64 range")))
  }

  test("asUint writer round-trips and is readable by arrow-java") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.toShort, 0, 0L),
      (2L, 255.toShort, 65535, 4294967295L),
      (3L, 128.toShort, 32768, 2147483648L)).toDF("id", "u8", "u16", "u32")
    val tagged = ArrowIpc.asUint(df.coalesce(1),
      Map("u8" -> 8, "u16" -> 16, "u32" -> 32))
    val dir = Files.createTempDirectory("arrow-uint-rt").toString
    ArrowIpc.write(tagged, dir)
    val back = ArrowIpc.read(spark, dir)
    // footer schema carries the physical width (the DataFrame's encoder
    // strips field metadata, but decode happened at the right stride)
    val fSchema = ArrowIpc.readFooter(new File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow")).head)._1
    assert(fSchema("u8").metadata.getLong("arrow_uint_bits") == 8L)
    assert(fSchema("u16").metadata.getLong("arrow_uint_bits") == 16L)
    assert(fSchema("u32").metadata.getLong("arrow_uint_bits") == 32L)
    assert(back.collect().map(r => (r.getLong(0), r.getShort(1).toInt,
      r.getInt(2), r.getLong(3))).toSet ==
      Set((1L, 0, 0, 0L), (2L, 255, 65535, 4294967295L),
        (3L, 128, 32768, 2147483648L)))
    // foreign reader: arrow-java must see true uint types and values
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{UInt1Vector, UInt2Vector, UInt4Vector}
    import org.apache.arrow.vector.ipc.ArrowFileReader
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new ArrowFileReader(ch, alloc)
    try {
      val root = rd.getVectorSchemaRoot
      assert(rd.loadNextBatch())
      val ids = root.getVector("id")
      val i2 = (0 until root.getRowCount)
        .find(i => ids.getObject(i) == 2L).get
      assert(root.getVector("u8").asInstanceOf[UInt1Vector]
        .getObjectNoOverflow(i2) == 255.toShort)
      assert(root.getVector("u16").asInstanceOf[UInt2Vector]
        .getObject(i2).toInt == 65535)
      assert(root.getVector("u32").asInstanceOf[UInt4Vector]
        .getObjectNoOverflow(i2) == 4294967295L)
    } finally { rd.close(); ch.close(); alloc.close() }
  }

  test("asUint rejects out-of-range values loudly at encode time") {
    import spark.implicits._
    val df = Seq((1L, (-3).toShort)).toDF("id", "u8")
    val tagged = ArrowIpc.asUint(df.coalesce(1), Map("u8" -> 8))
    val dir = Files.createTempDirectory("arrow-uint-bad").toString
    val e = intercept[org.apache.spark.SparkException] {
      ArrowIpc.write(tagged, dir)
    }
    assert(e.getMessage.contains("out of uint8 range") ||
      Option(e.getCause).exists(_.getMessage.contains("out of uint8 range")))
  }

  // ---- pyarrow compressed bodies (LZ4_FRAME / ZSTD) ----------------------

  test("pyarrow LZ4_FRAME compressed batches decode to the golden rows") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_lz4.arrow")))
    assertMatchesManifest(ArrowIpc.readStreamBytes(bytes)._2.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_lz4.arrows")))
    assertMatchesManifest(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
    // two-phase block path decompresses per-task too
    val df = ArrowIpc.readBlocks(spark, fixturePath("golden_lz4.arrow"))
    assertMatchesManifest(df.collect().toSeq)
  }

  test("pyarrow ZSTD compressed batches decode to the golden rows") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_zstd.arrow")))
    assertMatchesManifest(ArrowIpc.readStreamBytes(bytes)._2.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_zstd.arrows")))
    assertMatchesManifest(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
  }

  test("our LZ4/ZSTD-compressed writer output reads back and is readable " +
      "by arrow-java (foreign reader with compression factory)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .where(col("doc_id") < 60)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .coalesce(1)
    val want = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    for (codec <- Seq("lz4", "zstd")) {
      val dir = Files.createTempDirectory(s"arrow-wc-$codec").toString
      ArrowIpc.write(docs, dir, batchRows = 16, compression = Some(codec))
      // our own reader round-trips the compressed bodies
      val back = ArrowIpc.read(spark, dir)
      assert(back.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getString(3))).toSet == want, s"$codec self-read")
      // foreign reader: arrow-java with its compression factory
      import org.apache.arrow.memory.RootAllocator
      import org.apache.arrow.vector.ipc.ArrowFileReader
      import org.apache.arrow.compression.CommonsCompressionFactory
      val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
      val alloc = new RootAllocator()
      val ch = java.nio.channels.FileChannel.open(f.toPath)
      val rd = new ArrowFileReader(ch, alloc, CommonsCompressionFactory.INSTANCE)
      try {
        val root = rd.getVectorSchemaRoot
        val got = scala.collection.mutable.Set[(Long, String, Long, String)]()
        while (rd.loadNextBatch()) {
          (0 until root.getRowCount).foreach { i =>
            got += ((root.getVector("doc_id").getObject(i).asInstanceOf[Long],
              String.valueOf(root.getVector("lang").getObject(i)),
              root.getVector("n_chars").getObject(i).asInstanceOf[Long],
              String.valueOf(root.getVector("text").getObject(i))))
          }
        }
        assert(got.toSet == want, s"$codec arrow-java read")
      } finally { rd.close(); ch.close(); alloc.close() }
    }
  }

  // ---- pyarrow dictionary-encoded columns --------------------------------

  private lazy val dictManifest: Seq[Seq[Any]] =
    new String(Files.readAllBytes(Paths.get(fixturePath("golden_dict_manifest.txt"))),
      StandardCharsets.UTF_8).linesIterator.filter(_.nonEmpty)
      .map(l => splitLine(l).map(parseTok)).toSeq

  private def assertDictRows(rows: Seq[Row]): Unit = {
    assert(rows.length == dictManifest.length)
    rows.sortBy(_.getLong(0)).zip(dictManifest).foreach { case (got, want) =>
      val g = got.toSeq.map {
        case null => null
        case i: Int => i.toLong
        case other => other
      }
      assert(g == want, s"row ${got.getLong(0)}: $g vs $want")
    }
  }

  test("pyarrow dictionary-encoded columns substitute to VALUES") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_dict.arrow")))
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    // Spark-facing type is the VALUE type; encoding detail in metadata
    assert(schema("cat").dataType == StringType)
    assert(schema("cat").metadata.contains("arrow_dict_id"))
    assert(schema("cat").metadata.getLong("arrow_dict_index_bits") == 8L)
    assert(schema("code").dataType == IntegerType)
    assert(schema("code").metadata.getLong("arrow_dict_index_bits") == 32L)
    assertDictRows(rows.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_dict.arrows")))
    assertDictRows(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
  }

  test("dictionary FILE format: footer dict blocks feed the block reader") {
    val df = ArrowIpc.readBlocks(spark, fixturePath("golden_dict.arrow"))
    assertDictRows(df.collect().toSeq)
  }

  test("pyarrow DELTA dictionary stream appends to the captured base") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_deltadict.arrows")))
    // the fixture must really exercise delta semantics: two dictionary
    // messages for one id, the second flagged delta and carrying ONLY
    // the 2 appended values (a full replacement would also decode to
    // the same rows, proving nothing)
    val msgs = ArrowIpc.scanDictMessages(bytes)
    assert(msgs.length == 2 && msgs.map(_._1).distinct.length == 1)
    assert(msgs.head._3 == false && msgs.head._2 == 2L)
    assert(msgs(1)._3 == true && msgs(1)._2 == 2L)
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    assert(schema("cat").dataType == StringType)
    val got = rows.toSeq.sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getString(1)))
    assert(got == Seq(1L -> "apple", 2L -> "banana", 3L -> "apple",
      4L -> "cherry", 5L -> "date", 6L -> "banana"))
    // a delta with no base rejects loudly: drop the first dict message
    // by splicing schema envelope + everything from the delta onward
  }

  test("delta dictionary without a base batch rejects loudly") {
    // synthesize: take the golden stream and remove the FIRST dictionary
    // message (schema envelope | dict1 | batch1 | dict2(delta) | ...)
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_deltadict.arrows")))
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def msgEnd(start: Int): Int = {
      bb.position(start)
      assert(bb.getInt() == 0xffffffff)
      val len = bb.getInt()
      val msg = FlatBuf.root(bytes, start + 8, len)
      start + 8 + len + msg.getLong(3, 0L).toInt
    }
    val schemaEnd = msgEnd(0)
    val dict1End = msgEnd(schemaEnd)
    val batch1End = msgEnd(dict1End)
    // drop dict1 AND batch1 so the DELTA batch is the first dictionary
    // message the reader sees
    val spliced = bytes.slice(0, schemaEnd) ++ bytes.slice(batch1End, bytes.length)
    val e = intercept[IllegalArgumentException] {
      ArrowIpc.readStreamBytes(spliced)._2.toSeq
    }
    assert(e.getMessage.contains("before its base"))
  }

  // ---- struct columns (round 13) ----------------------------------------

  private def assertStructRows(rows: Seq[Row]): Unit = {
    assert(rows.length == 5)
    val byId = rows.sortBy(_.getLong(0))
    def info(r: Row): Option[(Option[String], Option[Double], Option[Int])] =
      Option(r.getStruct(1)).map(s => (Option(s.get(0)).map(_.toString),
        Option(s.get(1)).map(_.asInstanceOf[Double]),
        Option(s.get(2)).map(_.asInstanceOf[Int])))
    assert(info(byId(0)) == Some((Some("alpha"), Some(1.5), Some(10))))
    assert(info(byId(1)) == None)
    assert(info(byId(2)) == Some((None, None, Some(3))))
    assert(info(byId(3)) == Some((Some("δ"), Some(-2.25), None)))
    assert(info(byId(4)) == Some((Some(""), Some(0.0), Some(0))))
    // nested struct<struct, list>
    def nested(r: Row): Option[(Option[Long], Option[Seq[Long]])] =
      Option(r.getStruct(2)).map { s =>
        (Option(s.getStruct(0)).map(_.getLong(0)),
          Option(s.get(1)).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq))
      }
    assert(nested(byId(0)) == Some((Some(7L), Some(Seq(1L, 2L)))))
    assert(nested(byId(1)) == Some((None, Some(Seq.empty))))
    assert(nested(byId(2)) == None)
    assert(nested(byId(3)) == Some((Some(-1L), None)))
    assert(nested(byId(4)) == Some((Some(0L), Some(Seq(0L)))))
    // list<struct<x, y>>
    def points(r: Row): Option[Seq[Option[(Option[Double], Option[Double])]]] =
      Option(r.get(3)).map(_.asInstanceOf[scala.collection.Seq[Row]].toSeq
        .map(Option(_).map(p => (Option(p.get(0)).map(_.asInstanceOf[Double]),
          Option(p.get(1)).map(_.asInstanceOf[Double])))))
    assert(points(byId(0)) == Some(Seq(Some((Some(0.5), Some(-1.0))))))
    assert(points(byId(1)) == Some(Seq.empty))
    assert(points(byId(2)) == None)
    assert(points(byId(3)) == Some(Seq(Some((None, Some(2.0))), None)))
    assert(points(byId(4)) == Some(Seq(Some((Some(1.25), Some(2.5))),
      Some((Some(-0.5), Some(3.5))))))
  }

  test("pyarrow struct golden decodes: nulls at struct AND child level, " +
      "nested struct, struct<list>, list<struct>") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_struct.arrow")))
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    assert(schema("info").dataType == StructType(Seq(
      StructField("name", StringType), StructField("score", DoubleType),
      StructField("n", IntegerType))))
    assert(schema("points").dataType.isInstanceOf[ArrayType])
    assertStructRows(rows.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_struct.arrows")))
    assertStructRows(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
    // two-phase block path + column pruning skip structs positionally
    assertStructRows(ArrowIpc.readBlocks(spark, fixturePath("golden_struct.arrow"))
      .collect().toSeq)
  }

  test("struct columns round-trip through our writer and arrow-java " +
      "reads the bytes back") {
    import org.apache.spark.sql.functions.{struct => fstruct}
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 1.5, Seq(1L, 2L)),
      (2L, null, -2.0, Seq.empty[Long]),
      (3L, "gamma", 0.25, Seq(9L))).toDF("id", "nm", "sc", "tags")
      .select(col("id"),
        fstruct(col("nm"), col("sc")).as("info"),
        fstruct(col("tags"), fstruct(col("id").as("x")).as("inner")).as("nest"))
    val dir = Files.createTempDirectory("arrow-struct-rt").toString
    ArrowIpc.write(df.coalesce(1), dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema("info").dataType == df.schema("info").dataType)
    def key(r: Row) = (r.getLong(0),
      Option(r.getStruct(1)).map(s => (Option(s.get(0)).map(_.toString), s.getDouble(1))),
      Option(r.getStruct(2)).map(s => (s.getSeq[Long](0).toSeq, s.getStruct(1).getLong(0))))
    assert(back.collect().map(key).toSet == df.collect().map(key).toSet)
    // foreign reader: arrow-java decodes our struct file
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.complex.StructVector
    import org.apache.arrow.vector.ipc.ArrowFileReader
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new ArrowFileReader(ch, alloc)
    try {
      val root = rd.getVectorSchemaRoot
      assert(rd.loadNextBatch())
      val ids = root.getVector("id")
      val i1 = (0 until root.getRowCount).find(i => ids.getObject(i) == 1L).get
      val info = root.getVector("info").asInstanceOf[StructVector]
      val obj = info.getObject(i1)
      assert(obj.get("nm").toString == "alpha")
      assert(obj.get("sc") == 1.5)
    } finally { rd.close(); ch.close(); alloc.close() }
  }

  // ---- map columns + timestamp units + date64 (round 13) ----------------

  private def assertMapRows(rows: Seq[Row]): Unit = {
    assert(rows.length == 4)
    val byId = rows.sortBy(_.getLong(0))
    def attrs(r: Row): Option[Map[String, Any]] =
      Option(r.get(1)).map(_.asInstanceOf[scala.collection.Map[String, Any]].toMap)
    assert(attrs(byId(0)) == Some(Map("len" -> 10L, "w" -> 3L)))
    assert(attrs(byId(1)) == Some(Map.empty))
    assert(attrs(byId(2)) == None)
    assert(attrs(byId(3)) == Some(Map("a" -> -1L, "b" -> null, "c" -> 7L)))
    def ts(r: Row, i: Int): Any = norm(r.get(i))
    // ts_s widened x1e6, ts_ms x1e3, ts_ns divided exactly by 1e3
    assert(ts(byId(0), 2) == "2020-02-02T10:00:00.000000")
    assert(ts(byId(0), 3) == "2020-02-02T10:00:00.123000")
    assert(ts(byId(0), 4) == "2020-02-02T10:00:00.123456")
    assert(norm(byId(0).get(5)) == "2020-02-02")
    assert(ts(byId(1), 2) == "1970-01-01T00:00:00.000000")
    assert(ts(byId(1), 3) == "1970-01-01T00:00:01.000000")
    assert(ts(byId(1), 4) == "1969-12-31T23:59:59.000000")
    assert(norm(byId(1).get(5)) == "1969-12-31")
    assert((2 to 5).forall(byId(2).isNullAt))
    assert(ts(byId(3), 2) == "2038-01-19T03:14:07.000000")
    assert(ts(byId(3), 3) == "2038-01-19T03:14:07.999000")
    assert(ts(byId(3), 4) == "2038-01-19T03:14:07.999999")
    assert(norm(byId(3).get(5)) == "2038-01-19")
  }

  test("pyarrow map + timestamp[s|ms|ns] + date64 golden decodes exactly") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_map.arrow")))
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    assert(schema("attrs").dataType ==
      MapType(StringType, LongType, valueContainsNull = true))
    assert(schema("ts_s").dataType == TimestampType &&
      schema("ts_s").metadata.getLong("arrow_ts_unit") == 0L)
    assert(schema("ts_ms").dataType == TimestampNTZType &&
      schema("ts_ms").metadata.getLong("arrow_ts_unit") == 1L)
    assert(schema("ts_ns").dataType == TimestampType &&
      schema("ts_ns").metadata.getLong("arrow_ts_unit") == 3L)
    assert(schema("day64").dataType == DateType &&
      schema("day64").metadata.getBoolean("arrow_date64"))
    assertMapRows(rows.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_map.arrows")))
    assertMapRows(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
    assertMapRows(ArrowIpc.readBlocks(spark, fixturePath("golden_map.arrow"))
      .collect().toSeq)
  }

  test("sub-microsecond timestamp[ns] rejects loudly (no silent truncation)") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("bad_ns.arrows")))
    val e = intercept[IllegalArgumentException] {
      ArrowIpc.readStreamBytes(bytes)._2.toSeq
    }
    assert(e.getMessage.contains("not microsecond-aligned"))
  }

  // ---- NESTED layout markers on map/list children (round 14) ------------
  // map<utf8,ts[ns]> / map<uint8,_> / map<_,date64> / list<ts[ns]> /
  // list<large_utf8> / list<date64>: the children's physical markers
  // must survive the MapType/ArrayType hop (hoisted child metadata) —
  // dropping them decodes ts[ns] 1000x off or strides uint8 keys wrong.

  private def assertNestmarkRows(rows: Seq[Row]): Unit = {
    assert(rows.length == 3)
    val byId = rows.sortBy(_.getLong(0))
    def m(r: Row, i: Int): Option[Map[Any, Any]] =
      Option(r.get(i)).map(_.asInstanceOf[scala.collection.Map[Any, Any]]
        .toMap.map { case (k, v) => (norm(k), norm(v)) })
    def l(r: Row, i: Int): Option[Seq[Any]] =
      Option(r.get(i)).map(_.asInstanceOf[scala.collection.Seq[Any]].toSeq.map(norm))
    val r1 = byId(0)
    assert(m(r1, 1) == Some(Map(
      "a" -> "2020-02-02T10:00:00.123456", // ns -> us exact, NOT x1000 off
      "b" -> "1970-01-01T00:00:01.000000")))
    // uint8 keys widen: 255 must read as 255, not a signed-byte -1
    assert(m(r1, 2) == Some(Map(7L -> 70L, 255L -> -1L)))
    assert(m(r1, 3) == Some(Map("d" -> "2020-02-02")))
    assert(l(r1, 4) == Some(Seq("2020-02-02T10:00:00.123456", null)))
    assert(l(r1, 5) == Some(Seq("alpha", "beta-beta")))
    assert(l(r1, 6) == Some(Seq("1969-12-31", "2038-01-19")))
    // list<map>: the map's hoisted keys ride inside the ITEM metadata
    def lm(r: Row): Option[Seq[Map[Any, Any]]] =
      Option(r.get(7)).map(_.asInstanceOf[scala.collection.Seq[Any]].toSeq
        .map(_.asInstanceOf[scala.collection.Map[Any, Any]].toMap))
    assert(lm(r1) == Some(Seq(Map("k" -> 1L), Map.empty, Map("m" -> -2L, "n" -> 3L))))
    val r2 = byId(1)
    assert(m(r2, 1) == Some(Map.empty) && m(r2, 3) == Some(Map.empty))
    assert(m(r2, 2) == Some(Map(0L -> 0L)))
    assert(l(r2, 4) == Some(Seq.empty) && l(r2, 5) == Some(Seq.empty) &&
      l(r2, 6) == Some(Seq.empty))
    assert(lm(r2) == Some(Seq.empty))
    assert((1 to 7).forall(byId(2).isNullAt))
  }

  test("pyarrow map/list children with ts[ns]/uint8/date64/large_utf8 " +
      "markers decode exactly") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_nestmark.arrow")))
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    // Spark-facing types are the widened/unit-normalized ones...
    assert(schema("mts").dataType ==
      MapType(StringType, TimestampType, valueContainsNull = true))
    assert(schema("mu8").dataType ==
      MapType(ShortType, LongType, valueContainsNull = true))
    assert(schema("lts").dataType.asInstanceOf[ArrayType].elementType == TimestampType)
    assert(schema("llu").dataType.asInstanceOf[ArrayType].elementType == StringType)
    // ...and the physical markers ride hoisted on the PARENT field
    assert(schema("mts").metadata.getMetadata("arrow_map_value_meta")
      .getLong("arrow_ts_unit") == 3L)
    assert(schema("mu8").metadata.getMetadata("arrow_map_key_meta")
      .getLong("arrow_uint_bits") == 8L)
    assert(schema("mdate").metadata.getMetadata("arrow_map_value_meta")
      .getBoolean("arrow_date64"))
    assert(schema("lts").metadata.getMetadata("arrow_item_meta")
      .getLong("arrow_ts_unit") == 3L)
    assert(schema("llu").metadata.getMetadata("arrow_item_meta")
      .getBoolean("arrow_large_offsets"))
    assert(schema("ld64").metadata.getMetadata("arrow_item_meta")
      .getBoolean("arrow_date64"))
    assertNestmarkRows(rows.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_nestmark.arrows")))
    assertNestmarkRows(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
    assertNestmarkRows(ArrowIpc.readBlocks(spark, fixturePath("golden_nestmark.arrow"))
      .collect().toSeq)
  }

  test("column pruning SKIPS marker-carrying map/list columns byte-exactly") {
    // project a late column so skipColumn walks the marker-carrying
    // map/list buffers positionally — a skip/decode mismatch would
    // misalign every later column
    val df = spark.read.format("graft.sources.ArrowDataSource")
      .option("path", fixturePath("golden_nestmark.arrow")).load()
      .select("id", "llu")
    val got = df.collect().map(r =>
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Any]].toSeq)))
      .toSet
    assert(got == Set(
      (1L, Some(Seq("alpha", "beta-beta"))),
      (2L, Some(Seq.empty)),
      (3L, None)))
  }

  test("map columns round-trip through our writer and arrow-java reads " +
      "the bytes back") {
    import spark.implicits._
    val df = Seq(
      (1L, Map("x" -> 1L, "y" -> 2L)),
      (2L, Map.empty[String, Long]),
      (3L, Map("z" -> -5L))).toDF("id", "attrs")
    val dir = Files.createTempDirectory("arrow-map-rt").toString
    ArrowIpc.write(df.coalesce(1), dir)
    val back = ArrowIpc.read(spark, dir)
    // valueContainsNull round-trips through the entries-field nullability
    assert(back.schema("attrs").dataType == df.schema("attrs").dataType)
    def key(r: Row) = (r.getLong(0),
      r.getAs[scala.collection.Map[String, Long]](1).toMap)
    assert(back.collect().map(key).toSet ==
      Set((1L, Map("x" -> 1L, "y" -> 2L)), (2L, Map.empty[String, Long]),
        (3L, Map("z" -> -5L))))
    // foreign reader: arrow-java decodes our map file
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.complex.MapVector
    import org.apache.arrow.vector.ipc.ArrowFileReader
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new ArrowFileReader(ch, alloc)
    try {
      val root = rd.getVectorSchemaRoot
      assert(rd.loadNextBatch())
      val ids = root.getVector("id")
      val i1 = (0 until root.getRowCount).find(i => ids.getObject(i) == 1L).get
      val mv = root.getVector("attrs").asInstanceOf[MapVector]
      val entries = mv.getObject(i1).asInstanceOf[java.util.List[_]]
      assert(entries.size() == 2)
    } finally { rd.close(); ch.close(); alloc.close() }
  }

  // ---- durations + time-of-day (round 13) --------------------------------

  private def durMicros(v: Any): Option[Long] = Option(v).map {
    case d: java.time.Duration => d.getSeconds * 1000000L + d.getNano / 1000L
  }
  private def todMicros(v: Any): Option[Long] = Option(v).map(_.asInstanceOf[Long])

  private def assertTimeDurRows(rows: Seq[Row]): Unit = {
    assert(rows.length == 3)
    val byId = rows.sortBy(_.getLong(0))
    assert(durMicros(byId(0).get(1)) == Some(86402000003L)) // 1d 2s 3us
    assert(durMicros(byId(0).get(2)) == Some(-1500000L))
    assert(durMicros(byId(0).get(3)) == Some(42L))
    assert(todMicros(byId(0).get(4)) == Some(0L))
    assert(todMicros(byId(0).get(5)) == Some(37800500000L)) // 10:30:00.500
    assert(todMicros(byId(0).get(6)) == Some(86399999999L)) // 23:59:59.999999
    assert(todMicros(byId(0).get(7)) == Some(43200123456L)) // 12:00:00.123456
    assert(durMicros(byId(1).get(1)) == Some(-1L))
    assert(durMicros(byId(1).get(2)) == Some(0L))
    assert(durMicros(byId(1).get(3)) == Some(-172800000000L)) // -2 days
    assert(todMicros(byId(1).get(4)) == Some(86399000000L)) // 23:59:59
    assert(todMicros(byId(1).get(5)) == Some(1000L))
    assert(todMicros(byId(1).get(6)) == Some(1L))
    assert(todMicros(byId(1).get(7)) == Some(23400000000L)) // 06:30
    assert((1 to 7).forall(byId(2).isNullAt))
  }

  test("pyarrow duration[us|ms|ns] + time32/time64 golden decodes exactly") {
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_timedur.arrow")))
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    assert(schema("d_us").dataType == DayTimeIntervalType())
    assert(schema("d_ns").metadata.getLong("arrow_ts_unit") == 3L)
    // time-of-day lands as micros-of-day Long (Spark 4.1's TIME type
    // exists but its encoders reject it), unit marker in metadata
    assert(schema("t32s").dataType == LongType)
    assert(schema("t32s").metadata.getLong("arrow_time_unit") == 0L)
    assert(schema("t64ns").metadata.getLong("arrow_time_unit") == 3L)
    assertTimeDurRows(rows.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_timedur.arrows")))
    assertTimeDurRows(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
    assertTimeDurRows(ArrowIpc.readBlocks(spark, fixturePath("golden_timedur.arrow"))
      .collect().toSeq)
  }

  test("sub-microsecond time64[ns] and union columns reject loudly") {
    val tb = Files.readAllBytes(Paths.get(fixturePath("bad_time_ns.arrows")))
    val e1 = intercept[IllegalArgumentException] {
      ArrowIpc.readStreamBytes(tb)._2.toSeq
    }
    assert(e1.getMessage.contains("not microsecond-aligned"))
    val ub = Files.readAllBytes(Paths.get(fixturePath("bad_union.arrows")))
    val e2 = intercept[IllegalArgumentException] {
      ArrowIpc.readStreamBytes(ub)._2.toSeq
    }
    assert(e2.getMessage.contains("type tag"))
  }

  test("duration columns round-trip through our writer and arrow-java") {
    import spark.implicits._
    val df = Seq(
      (1L, java.time.Duration.ofSeconds(90061, 123456000)),
      (2L, java.time.Duration.ofMillis(-2500)),
      (3L, java.time.Duration.ZERO)).toDF("id", "dur")
    assert(df.schema("dur").dataType == DayTimeIntervalType())
    val dir = Files.createTempDirectory("arrow-dur-rt").toString
    ArrowIpc.write(df.coalesce(1), dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema("dur").dataType == DayTimeIntervalType())
    def key(r: Row) = (r.getLong(0), durMicros(r.get(1)).get)
    assert(back.collect().map(key).toSet ==
      Set((1L, 90061123456L), (2L, -2500000L), (3L, 0L)))
    // foreign reader: arrow-java sees a true duration[us] column
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.DurationVector
    import org.apache.arrow.vector.ipc.ArrowFileReader
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(f.toPath)
    val rd = new ArrowFileReader(ch, alloc)
    try {
      val root = rd.getVectorSchemaRoot
      assert(rd.loadNextBatch())
      val ids = root.getVector("id")
      val i1 = (0 until root.getRowCount).find(i => ids.getObject(i) == 1L).get
      val dv = root.getVector("dur").asInstanceOf[DurationVector]
      assert(dv.getObject(i1) == java.time.Duration.ofSeconds(90061, 123456000))
    } finally { rd.close(); ch.close(); alloc.close() }
  }

  test("pyarrow block-LINKED LZ4 bodies over 64KB decode (the lz4frame " +
      "default pyarrow writes)") {
    val expect = (0 until 4000).map(i =>
      (i.toLong, f"$i%06d:" + "the-quick-brown-fox-jumps-over-the-lazy-dog|" * 3))
    def check(rows: Seq[Row]): Unit =
      assert(rows.sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getString(1))) == expect)
    val bytes = Files.readAllBytes(Paths.get(fixturePath("golden_lz4_linked.arrow")))
    check(ArrowIpc.readStreamBytes(bytes)._2.toSeq)
    val sBytes = Files.readAllBytes(Paths.get(fixturePath("golden_lz4_linked.arrows")))
    check(ArrowIpc.readStreamBytes(sBytes)._2.toSeq)
    check(ArrowIpc.readBlocks(spark, fixturePath("golden_lz4_linked.arrow"))
      .collect().toSeq)
  }

  // ---- round-trips over the testdata tables ----------------------------

  test("documents table round-trips (file format)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("arrow-rt-docs").toString
    ArrowIpc.write(docs, dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema == docs.schema)
    assert(back.collect().map(_.toSeq).toSet == docs.collect().map(_.toSeq).toSet)
  }

  test("embeddings list<float> round-trips (stream format)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("vec_id") < 200)
    val dir = Files.createTempDirectory("arrow-rt-emb").toString
    ArrowIpc.write(emb, dir, fileFormat = false)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema == emb.schema)
    def key(r: Row) = (r.getLong(0), r.getSeq[Float](1).toSeq, r.getInt(2))
    assert(back.collect().map(key).toSet == emb.collect().map(key).toSet)
  }

  test("events timestamps survive as micros") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") < 100)
    val dir = Files.createTempDirectory("arrow-rt-ev").toString
    ArrowIpc.write(ev, dir)
    val back = ArrowIpc.read(spark, dir)
    assert(back.schema("ts").dataType == TimestampType)
    assert(back.collect().map(_.toSeq).toSet == ev.collect().map(_.toSeq).toSet)
  }

  test("multi-batch write: batchRows smaller than the table still exact") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
      .coalesce(1)
    val dir = Files.createTempDirectory("arrow-rt-mb").toString
    ArrowIpc.write(docs, dir, batchRows = 7)
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
    val (_, blocks) = ArrowIpc.readFooter(f)
    assert(blocks.length == 8) // ceil(50/7)
    assert(ArrowIpc.read(spark, dir).count() == 50)
  }

  // ---- arrow-java cross-checks ------------------------------------------

  private def arrowJavaReadFile(path: File): (Seq[String], Seq[Seq[Any]]) = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowFileReader
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(path.toPath)
    val rd = new ArrowFileReader(ch, alloc)
    try {
      val root = rd.getVectorSchemaRoot
      val names = root.getSchema.getFields
      val out = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      while (rd.loadNextBatch()) {
        val n = root.getRowCount
        (0 until n).foreach { i =>
          out += (0 until names.size()).map { c =>
            val v = root.getVector(c)
            if (v.isNull(i)) null else v.getObject(i)
          }
        }
      }
      (((0 until names.size()).map(c => names.get(c).getName)), out.toSeq)
    } finally { rd.close(); ch.close(); alloc.close() }
  }

  test("our FILE bytes are readable by arrow-java (foreign reader)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .where(col("doc_id") < 40)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .coalesce(1)
    val dir = Files.createTempDirectory("arrow-xj").toString
    ArrowIpc.write(docs, dir, batchRows = 16)
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".arrow")).head
    val (names, rows) = arrowJavaReadFile(f)
    assert(names == Seq("doc_id", "lang", "n_chars", "text"))
    val want = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    val got = rows.map(r => (r(0).asInstanceOf[Long],
      String.valueOf(r(1)), r(2).asInstanceOf[Long], String.valueOf(r(3)))).toSet
    assert(got == want)
  }

  test("arrow-java writer output decodes through our reader") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => AjSchema}
    import org.apache.arrow.vector.VectorSchemaRoot
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    import scala.jdk.CollectionConverters._

    val alloc = new RootAllocator()
    val fields = Seq(
      new Field("k", FieldType.notNullable(new ArrowType.Int(64, true)), null),
      new Field("v", FieldType.nullable(new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)), null),
      new Field("s", FieldType.nullable(ArrowType.Utf8.INSTANCE), null)).asJava
    val root = VectorSchemaRoot.create(new AjSchema(fields), alloc)
    val tmp = Files.createTempFile("aj-out", ".arrow").toFile
    val out = new java.io.FileOutputStream(tmp)
    val w = new ArrowFileWriter(root, null, out.getChannel)
    w.start()
    val k = root.getVector("k").asInstanceOf[BigIntVector]
    val v = root.getVector("v").asInstanceOf[Float8Vector]
    val s = root.getVector("s").asInstanceOf[VarCharVector]
    val data = Seq((1L, Some(0.5), Some("one")), (2L, None, Some("twö")),
      (3L, Some(-1.25), None), (4L, Some(1e18), Some("")))
    data.zipWithIndex.foreach { case ((kk, vv, ss), i) =>
      k.setSafe(i, kk)
      vv.fold(v.setNull(i))(d => v.setSafe(i, d))
      ss.fold(s.setNull(i))(x => s.setSafe(i, x.getBytes(StandardCharsets.UTF_8)))
    }
    root.setRowCount(data.length)
    w.writeBatch()
    w.end(); w.close(); out.close(); root.close(); alloc.close()

    val bytes = Files.readAllBytes(tmp.toPath)
    val (schema, rows) = ArrowIpc.readStreamBytes(bytes)
    assert(schema == StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true))))
    val got = rows.map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      if (r.isNullAt(2)) None else Some(r.getString(2)))).toSeq
    assert(got == data)
    tmp.delete()
  }

  // ---- loud rejections ---------------------------------------------------

  test("legacy (pre-continuation) framing rejects loudly") {
    val bogus = Array[Byte](12, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8)
    val e = intercept[IllegalArgumentException] {
      ArrowIpc.readStreamBytes(bogus)
    }
    assert(e.getMessage.contains("continuation"))
  }

  test("footer block whose offset+lengths wrap past Long.MaxValue rejects " +
      "loudly (no truncated-window read)") {
    val path = fixturePath("golden.arrow")
    val (schema, _) = ArrowIpc.readFooter(new File(path))
    val e = intercept[IllegalArgumentException] {
      ArrowIpc.readBlock(path, schema,
        ArrowIpc.Block(Long.MaxValue - 4, 100, Long.MaxValue - 8)).toSeq
    }
    assert(e.getMessage.contains("outside the"))
  }

  test("unsupported Spark type rejects at write time") {
    import spark.implicits._
    // list<string> is outside the supported list-element set (maps are
    // supported as of round 13, so a nested map is the reject case now)
    val df = Seq((1, Seq("a", "b"))).toDF("k", "xs")
    val dir = Files.createTempDirectory("arrow-bad").toString
    val e = intercept[IllegalArgumentException] {
      ArrowIpc.write(df, dir)
    }
    assert(e.getMessage.contains("unsupported"))
    // nested map<_, map<...>> rejects too
    val df2 = Seq((1, Map("a" -> Map("b" -> 1L)))).toDF("k", "m")
    val e2 = intercept[IllegalArgumentException] {
      ArrowIpc.write(df2, Files.createTempDirectory("arrow-bad2").toString)
    }
    assert(e2.getMessage.contains("unsupported"))
  }
}
