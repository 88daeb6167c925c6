package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  import Warc._

  private def rec(id: Int, body: String, status: Option[Int] = Some(200)) =
    formatRecord("response", s"http://t/doc/$id", "2024-01-01T00:00:00Z",
      s"<urn:t:$id>", body.getBytes("UTF-8"), status,
      status.map(_ => "text/plain"))

  test("round-trip: parse(format) recovers headers, status, and bare body") {
    val archive = rec(1, "hello world") ++ rec(2, "a\r\nb") ++ rec(3, "")
    val got = parseRecords(archive)
    assert(got.length == 3)
    assert(got.map(_.targetUri) ==
      Seq("http://t/doc/1", "http://t/doc/2", "http://t/doc/3"))
    assert(got.forall(r => r.warcType == "response" &&
      r.httpStatus.contains(200) && r.httpContentType.contains("text/plain")))
    assert(got.map(r => new String(r.body, "UTF-8")) ==
      Seq("hello world", "a\r\nb", ""))
    // Content-Length covers the HTTP block: 45 header bytes + body
    assert(got.map(_.contentLength) ==
      Seq(45L + 11, 45L + 4, 45L))
  }

  test("non-response records pass their payload through unsplit") {
    val raw = formatRecord("warcinfo", "", "2024-01-01T00:00:00Z",
      "<urn:t:info>", "software: graft".getBytes("UTF-8"))
    val got = parseRecords(raw)
    assert(got.length == 1 && got.head.warcType == "warcinfo")
    assert(got.head.httpStatus.isEmpty && got.head.httpContentType.isEmpty)
    assert(new String(got.head.body, "UTF-8") == "software: graft")
  }

  test("malformed tail declines at record granularity, prefix kept") {
    val good = rec(1, "keep me")
    // truncated second record: header promises more bytes than exist
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999" +
      "\r\n\r\nshort").getBytes("ISO-8859-1")
    val got = parseRecords(good ++ bad)
    assert(got.length == 1 && new String(got.head.body, "UTF-8") == "keep me")
    // garbage that never opens a record parses to nothing, no throw
    assert(parseRecords("not a warc at all".getBytes("UTF-8")).isEmpty)
    assert(parseRecords(Array.emptyByteArray).isEmpty)
    // every truncation prefix of a valid archive declines or parses
    for (len <- 0 to good.length) parseRecords(good.take(len))
  }

  test("gunzip handles whole-file and concatenated per-record members") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.util.zip.GZIPOutputStream(bos)
      o.write(b); o.close(); bos.toByteArray
    }
    val r1 = rec(1, "first"); val r2 = rec(2, "second")
    // whole-archive compression
    assert(parseRecords(Warc.gunzip(gz(r1 ++ r2))).map(_.targetUri) ==
      Seq("http://t/doc/1", "http://t/doc/2"))
    // per-record gzip members concatenated (the Common Crawl layout)
    assert(parseRecords(Warc.gunzip(gz(r1) ++ gz(r2))).map(_.targetUri) ==
      Seq("http://t/doc/1", "http://t/doc/2"))
    // corrupt gzip declines to empty, no throw
    assert(Warc.gunzip("not gzip".getBytes("UTF-8")).isEmpty)
  }

  test("bodies containing WARC/1.0 or CRLF-CRLF do not break framing") {
    // Content-Length framing means record-like bytes INSIDE a body must
    // not start a new record or end the current one early
    val tricky = "WARC/1.0\r\n\r\nfake inner record\r\n\r\n"
    val archive = rec(1, tricky) ++ rec(2, "after")
    val got = parseRecords(archive)
    assert(got.length == 2)
    assert(new String(got.head.body, "UTF-8") == tricky)
    assert(new String(got(1).body, "UTF-8") == "after")
  }
}
