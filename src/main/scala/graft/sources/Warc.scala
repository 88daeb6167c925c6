package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) reader/writer — the web-archive record format
  * pretraining corpora ingest from (Common Crawl ships `.warc` /
  * `.warc.gz`). Pure byte machinery, no external libraries:
  *
  *  - record split: each record is `WARC/1.0\r\n`, CRLF-separated
  *    `Name: value` headers, `\r\n\r\n`, exactly `Content-Length`
  *    payload bytes, `\r\n\r\n`;
  *  - header parse: WARC-Type, WARC-Target-URI, WARC-Date,
  *    WARC-Record-ID, Content-Type, Content-Length;
  *  - HTTP payload split: a `response` record's payload is an HTTP/1.x
  *    status line + headers + `\r\n\r\n` + body — status code, HTTP
  *    Content-Type, and the bare body come out separately, which is
  *    what a text pipeline actually wants.
  *
  * Malformed input DECLINES at record granularity: a record whose
  * header block or length field doesn't parse ends the scan of that
  * payload (everything before it is kept), mirroring the
  * parse-as-far-as-it-goes contract of the other binary scanners
  * (Mp4Codec.boxes, EbmlCodec.elements).
  *
  * Scale shape: WARC members are self-delimiting, so parsing is
  * per-payload map-only work — one archive file per task via
  * `binaryFile` (Common Crawl's ~1 GB segment files are the unit of
  * parallelism; gzip members make the files themselves non-splittable,
  * the same constraint the K8 gzip sink documents). Bodies stay out of
  * any shuffle: project metadata first, carry `body` only as far as
  * the first narrow transform that consumes it.
  *
  * Reference analog: the reference has no web-archive path (its inputs
  * are GFF3/OBO/GenBank flat files); this implements the builder
  * brief's training-data ingest surface the same way S1-S8 wrap the
  * reference's own formats.
  */
object Warc {

  case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      recordId: String,
      contentType: String,
      contentLength: Long,
      httpStatus: Option[Int],
      httpContentType: Option[String],
      body: Array[Byte])

  private val Crlf = "\r\n"
  private val HeaderEnd = "\r\n\r\n".getBytes("ISO-8859-1")

  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = from
    val last = b.length - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Parse every well-formed record from a concatenated WARC payload;
    * stops (keeping the prefix) at the first malformed record. */
  def parseRecords(payload: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    var done = false
    while (!done && p < payload.length) {
      val he = indexOf(payload, HeaderEnd, p)
      if (he < 0) done = true
      else {
        val head = new String(payload, p, he - p, "ISO-8859-1")
        val lines = head.split(Crlf, -1)
        if (lines.isEmpty || !lines(0).startsWith("WARC/")) done = true
        else {
          val hdrs = lines.drop(1).flatMap { l =>
            val c = l.indexOf(':')
            if (c < 0) None else Some(l.take(c).trim.toLowerCase -> l.drop(c + 1).trim)
          }.toMap
          hdrs.get("content-length").flatMap(_.toLongOption) match {
            case Some(len) if len >= 0 && he + HeaderEnd.length + len <= payload.length =>
              val bs = he + HeaderEnd.length
              val body = java.util.Arrays.copyOfRange(payload, bs, (bs + len).toInt)
              val warcType = hdrs.getOrElse("warc-type", "")
              val (status, httpCt, httpBody) =
                if (warcType == "response") splitHttp(body)
                else (None, None, body)
              out += WarcRecord(
                warcType,
                hdrs.getOrElse("warc-target-uri", ""),
                hdrs.getOrElse("warc-date", ""),
                hdrs.getOrElse("warc-record-id", ""),
                hdrs.getOrElse("content-type", ""),
                len, status, httpCt, httpBody)
              // skip the record terminator (two CRLFs) when present
              var q = (bs + len).toInt
              if (q + HeaderEnd.length <= payload.length &&
                  indexOf(payload, HeaderEnd, q) == q) q += HeaderEnd.length
              p = q
            case _ => done = true
          }
        }
      }
    }
    out.result()
  }

  /** (status, contentType, bareBody) of an HTTP/1.x response payload;
    * a payload with no HTTP header block passes through whole. */
  private[sources] def splitHttp(body: Array[Byte])
      : (Option[Int], Option[String], Array[Byte]) = {
    val he = indexOf(body, HeaderEnd, 0)
    val head = new String(body, 0, if (he < 0) 0 else he, "ISO-8859-1")
    if (he < 0 || !head.startsWith("HTTP/")) (None, None, body)
    else {
      val lines = head.split(Crlf, -1)
      val status = lines(0).split(" ").lift(1).flatMap(_.toIntOption)
      val ct = lines.drop(1).collectFirst {
        case l if l.toLowerCase.startsWith("content-type:") =>
          l.drop("content-type:".length).trim
      }
      (status, ct,
        java.util.Arrays.copyOfRange(body, he + HeaderEnd.length, body.length))
    }
  }

  /** Serialize one record (the writer half, and the round-trip oracle's
    * fixture builder): deterministic header order, exact
    * Content-Length, CRLF record terminator. `httpStatus` wraps the
    * body in an HTTP/1.1 response block (the Common Crawl `response`
    * shape). */
  def formatRecord(warcType: String, targetUri: String, date: String,
                   recordId: String, body: Array[Byte],
                   httpStatus: Option[Int] = None,
                   httpContentType: Option[String] = None): Array[Byte] = {
    val payload = httpStatus match {
      case Some(code) =>
        val head = s"HTTP/1.1 $code OK$Crlf" +
          httpContentType.fold("")(ct => s"Content-Type: $ct$Crlf") + Crlf
        head.getBytes("ISO-8859-1") ++ body
      case None => body
    }
    val contentType =
      if (httpStatus.isDefined) "application/http;msgtype=response"
      else "text/plain"
    val head = Seq(
      "WARC/1.0",
      s"WARC-Type: $warcType",
      s"WARC-Target-URI: $targetUri",
      s"WARC-Date: $date",
      s"WARC-Record-ID: $recordId",
      s"Content-Type: $contentType",
      s"Content-Length: ${payload.length}").mkString(Crlf) + Crlf + Crlf
    head.getBytes("ISO-8859-1") ++ payload ++ (Crlf + Crlf).getBytes("ISO-8859-1")
  }

  /** Distributed scan of a directory of `.warc` / `.warc.gz` archive
    * files — one file per task (`binaryFile`; gzip members make the
    * files non-splittable anyway, so the file IS the parallelism unit,
    * exactly Common Crawl's ~1 GB segment layout), per-payload map-only
    * parse. `.gz` payloads are decompressed streaming in-task;
    * `GZIPInputStream` reads concatenated gzip members, which covers
    * both whole-file and per-record-member compression. */
  def records(spark: SparkSession, dir: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        parseRecords(if (path.endsWith(".gz")) gunzip(content) else content)
      }
  }

  private[sources] def gunzip(b: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      try in.readAllBytes() finally in.close()
    } catch { case _: java.io.IOException => Array.emptyByteArray }

  /** Parse a binary archive column in place — the multimodal-table
    * entry point (archives already staged as rows). */
  def fromDataFrame(df: DataFrame, payloadCol: String): Dataset[WarcRecord] = {
    import df.sparkSession.implicits._
    df.select(col(payloadCol)).as[Array[Byte]].flatMap(parseRecords _)
  }
}
