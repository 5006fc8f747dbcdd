package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import Warc.WarcRecord

class WarcSpec extends AnyFunSuite {

  private def rec(i: Int, body: String) = WarcRecord(
    warcType = "response",
    targetUri = s"http://example.org/doc$i",
    date = "2024-01-02T03:04:05Z",
    headers = Map("WARC-Record-ID" -> s"<urn:uuid:rec-$i>"),
    payload = Warc.httpResponsePayload(body.getBytes("UTF-8"), "text/plain"))

  test("uncompressed round-trip: types, uris, headers, payload bytes") {
    val recs = Seq(rec(1, "hello warc"), rec(2, "second\r\nrecord"),
      WarcRecord("warcinfo", "", "2024-01-01T00:00:00Z", Map.empty,
        "software: graft\r\n".getBytes("US-ASCII")))
    val got = Warc.read(Warc.write(recs))
    assert(got.size == 3)
    assert(got.map(_.warcType) == Seq("response", "response", "warcinfo"))
    assert(got(0).targetUri == "http://example.org/doc1")
    assert(got(0).headers("warc-record-id") == "<urn:uuid:rec-1>")
    got.zip(recs).foreach { case (g, e) =>
      assert(g.payload.toSeq == e.payload.toSeq)
    }
  }

  test("warc.gz round-trip: one gzip member per record (Common Crawl layout)") {
    val recs = (0 until 20).map(i => rec(i, s"body $i " + ("x" * i * 37)))
    val gz = Warc.writeGz(recs)
    // multiple members: more than one gzip magic in the stream
    val magics = gz.sliding(2).count(w => (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b)
    assert(magics >= 20, s"expected per-record gzip members, saw $magics magics")
    val got = Warc.readGz(gz)
    assert(got.size == 20)
    got.zip(recs).foreach { case (g, e) =>
      assert(g.targetUri == e.targetUri && g.payload.toSeq == e.payload.toSeq)
    }
  }

  test("httpBody strips the HTTP header block; non-HTTP passes through") {
    val body = "the actual page é中".getBytes("UTF-8")
    assert(Warc.httpBody(Warc.httpResponsePayload(body, "text/html")).toSeq == body.toSeq)
    assert(Warc.httpBody(body).toSeq == body.toSeq)
  }

  test("malformed input rejects loudly") {
    // not WARC
    val e1 = intercept[IllegalArgumentException] {
      Warc.read("HTTP/1.1 200 OK\r\n\r\nnope\r\n\r\n".getBytes("US-ASCII"))
    }
    assert(e1.getMessage.contains("WARC/1.0"))
    // truncated payload: Content-Length overruns the buffer
    val good = Warc.write(Seq(rec(1, "hello")))
    val e2 = intercept[IllegalArgumentException] {
      Warc.read(good.take(good.length - 30))
    }
    assert(e2.getMessage.contains("truncated") || e2.getMessage.contains("terminating"))
    // header line without a colon (the date line keeps colons in its
    // VALUE, so break the type line instead)
    val broken = new String(good, "ISO-8859-1")
      .replace("WARC-Type: response", "WARC-Type response")
    val e3 = intercept[IllegalArgumentException] {
      Warc.read(broken.getBytes("ISO-8859-1"))
    }
    assert(e3.getMessage.contains("malformed"))
  }

  test("payloads containing CRLFCRLF do not split records (length-framed)") {
    val tricky = "a\r\n\r\nb\r\n\r\nWARC/1.0\r\n\r\nc"
    val got = Warc.read(Warc.write(Seq(
      rec(1, tricky), rec(2, "after"))))
    assert(got.size == 2)
    assert(new String(Warc.httpBody(got(0).payload), "UTF-8") == tricky)
    assert(got(1).targetUri == "http://example.org/doc2")
  }
}
