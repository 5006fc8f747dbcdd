package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Randomized foreign Arrow IPC sweep: 24 seeded pyarrow-written stream
  * files (tools/make_arrow_fixtures.py `fuzz_cases`) covering random
  * schema mixes of every supported type — signed/unsigned ints (the
  * physical-stride path) incl. uint64's Decimal(20,0) widening, floats,
  * bool, utf8/binary, timestamps at ALL four units (s/ms/us/ns),
  * date32/date64, list<i64/f32/u8>, struct<i64,f64>, map<utf8,i64>,
  * string and int dictionaries — with random
  * null patterns, batch sizes 1-17, and none/lz4/zstd body compression.
  * Values are exactly-representable numbers, so every compare is
  * equality. Expectations come from arrow_fuzz_manifest.json, written
  * by the generator alongside the files.
  *
  * A second sweep corrupts the golden files (seeded truncations + byte
  * flips in the metadata region) and asserts the decoder FAILS LOUDLY
  * with an Exception — never an Error (OOM from a lying length field)
  * and never a hang. */
class ArrowIpcFuzzSpec extends AnyFunSuite {

  private val fuzzDir = "src/test/resources/fixtures/fuzz"

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parseTok(tok: String): Any = tok.head match {
    case '~' => null
    case 'i' => tok.tail.toLong
    case 'd' => tok.tail.toDouble
    case 't' => true
    case 'u' => false
    case 's' => new String(unhex(tok.tail), StandardCharsets.UTF_8)
    case 'b' => unhex(tok.tail).toSeq
    case 'T' => tok.tail
    case 'D' => tok.tail // date32/date64 ISO
    case 'c' => tok.tail // decimal / uint64 plain string
    case 'S' => // struct<x,y>: member tokens joined by ';'
      tok.tail.split(";", -1).toSeq.map(parseTok)
    case 'M' => // map<utf8,int64>: sorted "key=tok" pairs joined by ';'
      if (tok.tail.isEmpty) Map.empty[String, Any]
      else tok.tail.split(";", -1).toSeq.map { p =>
        val i = p.indexOf('=')
        p.substring(0, i) -> parseTok(p.substring(i + 1))
      }.toMap
    case '[' =>
      val inner = tok.substring(1, tok.length - 1).trim
      if (inner.isEmpty) Seq.empty[Any]
      else inner.split(" ").toSeq.map(parseTok)
  }

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  private def norm(v: Any): Any = v match {
    case null => null
    case t: java.sql.Timestamp =>
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDateTime.format(tsFmt)
    case ldt: java.time.LocalDateTime => ldt.format(tsFmt)
    case b: Array[Byte] => b.toSeq
    case d: java.sql.Date => d.toString
    case bd: java.math.BigDecimal => bd.toPlainString
    case f: Float => f.toDouble
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case r: org.apache.spark.sql.Row => r.toSeq.map(norm) // struct
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, v) => k.toString -> norm(v) }.toMap
    case d: java.time.Duration => // duration[us] -> exact micros
      d.getSeconds * 1000000L + d.getNano / 1000L
    case s: scala.collection.Seq[_] => s.toSeq.map(norm)
    case other => other
  }

  private lazy val manifest: Map[String, (String, Seq[Seq[Any]])] = {
    val f = Paths.get(s"$fuzzDir/arrow_fuzz_manifest.json")
    require(Files.isRegularFile(f),
      "arrow_fuzz_manifest.json missing — run tools/make_arrow_fixtures.py")
    val j = org.json4s.jackson.JsonMethods.parse(
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    j.asInstanceOf[org.json4s.JObject].obj.map { case (name, v) =>
      val comp = (v \ "compression").extract[String]
      val rows = (v \ "rows").extract[Seq[Seq[String]]].map(_.map(parseTok))
      name -> (comp, rows)
    }.toMap
  }

  test("manifest covers the intended parameter space") {
    assert(manifest.size == 24)
    val comps = manifest.values.map(_._1).toSeq
    assert(Set("none", "lz4", "zstd").forall(comps.contains))
    assert(manifest.values.map(_._2.length).sum > 200)
  }

  for (case_ <- (0 until 24).map(i => f"arrowfuzz_$i%02d")) {
    test(s"$case_ decodes exactly (${manifest(case_)._1})") {
      val bytes = Files.readAllBytes(Paths.get(s"$fuzzDir/$case_.arrows"))
      val (_, rowIt) = ArrowIpc.readStreamBytes(bytes)
      val got = rowIt.toSeq.map(_.toSeq.map(norm)).sortBy(_.head.asInstanceOf[Long])
      val want = manifest(case_)._2
      assert(got.length == want.length, "row count")
      got.zip(want).foreach { case (g, w) =>
        assert(g == w, s"row ${g.head}")
      }
    }
  }

  test("corrupted inputs fail loudly — no Errors, no silent truncation-accepts") {
    val rng = new scala.util.Random(1234)
    val goldens = Seq("golden.arrow", "golden_uint.arrow", "golden_lz4.arrow",
      "golden_dict.arrow", "golden_zstd.arrows")
    for (g <- goldens) {
      val orig = Files.readAllBytes(Paths.get(s"src/test/resources/fixtures/$g"))
      val baseline = ArrowIpc.readStreamBytes(orig)._2.length // sanity: decodes
      assert(baseline >= 0)
      var loudRejects = 0
      for (_ <- 0 until 60) {
        val mutated =
          if (rng.nextBoolean()) { // truncate: strictly less data
            val at = 8 + rng.nextInt(orig.length - 8)
            java.util.Arrays.copyOf(orig, at)
          } else { // flip a metadata-region byte
            val m = orig.clone()
            val at = rng.nextInt(math.min(400, m.length))
            m(at) = (m(at) ^ (1 << rng.nextInt(8))).toByte
            m
          }
        try {
          ArrowIpc.readStreamBytes(mutated)._2.length
          ()
        } catch {
          case _: Exception => loudRejects += 1 // loud is the contract
          case e: Error => fail(s"$g: corruption escalated to ${e.getClass}: $e")
        }
      }
      // most mutations must be detected (framing/length checks), and
      // none may take down the JVM
      assert(loudRejects > 20, s"$g: only $loudRejects/60 mutations rejected")
    }
  }
}
