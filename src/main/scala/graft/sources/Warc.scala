package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) source — the container Common Crawl
  * and every serious web-scale training corpus ships in, and the one
  * ingestion format a 100 TB pipeline cannot be without. The reference
  * crawls live sites (doc2vec.ts website source); at training scale
  * the same HTML arrives pre-crawled as WARC, so this source feeds the
  * SAME downstream pipeline (HTML→Markdown→chunk→embed) from archive
  * files instead of HTTP.
  *
  * Format, from the public spec: records are `WARC/1.x` version lines
  * + named headers + CRLFCRLF + a `Content-Length`-delimited block +
  * CRLFCRLF. `response` records' block is an HTTP/1.x message (status
  * line, headers, CRLFCRLF, payload). Common Crawl stores each record
  * as its own gzip member in one concatenated `.warc.gz` stream — the
  * JDK's GZIPInputStream reads multi-member streams natively, so the
  * gunzip path is dependency-free too.
  *
  * Scale shape: one input row per WARC file (or file split), one
  * output row per record — a pure per-row flatMap, zero shuffle; the
  * downstream markdown/chunk stages batch per partition exactly as
  * they do for crawled pages.
  */
object Warc {

  /** One parsed WARC record. `httpStatus`/`httpContentType` are -1/""
    * for non-response records; `body` is the HTTP payload for
    * response records and the raw block otherwise. */
  final case class WarcRecord(idx: Int, warcType: String,
      targetUri: String, date: String, recordId: String,
      httpStatus: Int, httpContentType: String, body: Array[Byte])

  /** Transparently gunzip a (possibly multi-member) gzip buffer;
    * plain buffers pass through. */
  def gunzipIfNeeded(b: Array[Byte]): Array[Byte] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } else b

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Index of the CRLFCRLF terminator starting the search at `from`,
    * or -1. */
  private def headerEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def parseHeaders(s: String): Map[String, String] =
    s.split("\r\n").iterator.drop(1).flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase ->
        line.substring(c + 1).trim)
    }.toMap

  /** Parse every record of a WARC buffer (gunzipped transparently).
    * Tolerant of trailing garbage; a record with a missing or
    * unparsable Content-Length ends the walk (never guesses at
    * record boundaries). */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val b = try gunzipIfNeeded(bytes) catch {
      case _: Exception => return Seq.empty
    }
    val out = Vector.newBuilder[WarcRecord]
    var i = 0
    var idx = 0
    var ok = true
    while (ok && i + 8 < b.length) {
      // seek the next version line (skips inter-record CRLFs)
      while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
      if (i + 8 >= b.length || ascii(b, i, i + 5) != "WARC/") ok = false
      else {
        val he = headerEnd(b, i)
        if (he < 0) ok = false
        else {
          val headers = parseHeaders(ascii(b, i, he))
          val len = headers.get("content-length")
            .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(-1L)
          val blockStart = he + 4
          if (len < 0 || blockStart + len > b.length) ok = false
          else {
            val blockEnd = (blockStart + len).toInt
            val wtype = headers.getOrElse("warc-type", "")
            val uri = headers.getOrElse("warc-target-uri", "")
            val date = headers.getOrElse("warc-date", "")
            val rid = headers.getOrElse("warc-record-id", "")
            val isHttp = wtype == "response" &&
              headers.getOrElse("content-type", "")
                .startsWith("application/http")
            if (isHttp) {
              val hhe = headerEnd(b, blockStart)
              if (hhe >= 0 && hhe + 4 <= blockEnd) {
                val httpHead = ascii(b, blockStart, hhe)
                val statusLine = httpHead.takeWhile(_ != '\r')
                val status = statusLine.split(" ") match {
                  case a if a.length >= 2 =>
                    scala.util.Try(a(1).toInt).getOrElse(-1)
                  case _ => -1
                }
                val hh = parseHeaders("x\r\n" + httpHead
                  .split("\r\n").drop(1).mkString("\r\n"))
                out += WarcRecord(idx, wtype, uri, date, rid, status,
                  hh.getOrElse("content-type", ""),
                  java.util.Arrays.copyOfRange(b, hhe + 4, blockEnd))
              } else {
                out += WarcRecord(idx, wtype, uri, date, rid, -1, "",
                  java.util.Arrays.copyOfRange(b, blockStart, blockEnd))
              }
            } else {
              out += WarcRecord(idx, wtype, uri, date, rid, -1, "",
                java.util.Arrays.copyOfRange(b, blockStart, blockEnd))
            }
            idx += 1
            i = blockEnd
          }
        }
      }
    }
    out.result()
  }

  /** WARC ENCODER (fixture-builder twin): writes spec-conforming
    * records — version line, WARC headers with exact Content-Length,
    * CRLFCRLF framing — so the parser is exercised against real
    * framing, not a round-trip of its own assumptions. */
  def warcEncode(records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    // records: (warcType, targetUri, block)
    val out = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((wtype, uri, block), k) =>
      val head = new StringBuilder()
      head.append("WARC/1.0\r\n")
      head.append(s"WARC-Type: $wtype\r\n")
      head.append(s"WARC-Record-ID: <urn:uuid:rec-$k>\r\n")
      head.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      if (uri.nonEmpty) head.append(s"WARC-Target-URI: $uri\r\n")
      if (wtype == "response")
        head.append("Content-Type: application/http; msgtype=response\r\n")
      head.append(s"Content-Length: ${block.length}\r\n\r\n")
      out.write(head.toString
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.write(block)
      out.write("\r\n\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }
    out.toByteArray
  }

  /** Gzip a buffer as ONE member (Common Crawl uses one member per
    * record; the multi-member read path is exercised by
    * concatenating these). */
  def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(b); gz.close()
    out.toByteArray
  }

  /** WARC corpus → one row per record: a pure per-row flatMap (zero
    * shuffle); gzip is transparent. The body surfaces as a checksum +
    * length rather than raw bytes so the row stays narrow — the
    * markdown pipeline consumes bodies via [[warcHtmlBodies]]. */
  def warcRecords(s: SparkSession, warcs: DataFrame): DataFrame = {
    import s.implicits._
    warcs.select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseWarc(bytes).iterator.map { r =>
          var sum = 0L
          var i = 0
          while (i < r.body.length) {
            sum += (r.body(i) & 0xff).toLong * (1 + i % 97)
            i += 1
          }
          (path, r.idx, r.warcType, r.targetUri, r.httpStatus,
            r.httpContentType, r.body.length.toLong, sum)
        }
      }
      .toDF("path", "record_idx", "warc_type", "url", "http_status",
        "content_type", "n_body_bytes", "body_checksum")
  }

  /** The ingest hookup: 200-status text/html response records as
    * (url, html) rows — exactly the shape the crawler hands to
    * HtmlToMarkdown, so archives and live crawls share one pipeline
    * from here down. */
  def warcHtmlBodies(s: SparkSession, warcs: DataFrame): DataFrame = {
    import s.implicits._
    warcs.select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        parseWarc(bytes).iterator
          .filter(r => r.warcType == "response" && r.httpStatus == 200 &&
            r.httpContentType.startsWith("text/html"))
          .map(r => (r.targetUri, new String(r.body,
            java.nio.charset.StandardCharsets.UTF_8)))
      }
      .toDF("url", "html")
  }

  /** Deterministic per-doc WARC fixture: a `warcinfo` record plus one
    * HTTP response (200 text/html, or 404 text/plain every 13th id),
    * gzipped for odd ids — the compression must be invisible in the
    * output, which the oracle checks by construction. */
  def fixtureWarc(id: Long): Array[Byte] = {
    val html = s"<html><body><h1>Doc $id</h1><p>" +
      ("ab" * (5 + (id % 7)).toInt) + "</p></body></html>"
    val notFound = "Not Found"
    val is404 = id % 13 == 0
    val body = if (is404) notFound else html
    val ctype = if (is404) "text/plain" else "text/html"
    val status = if (is404) "404 Not Found" else "200 OK"
    val http = s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n\r\n$body"
    val raw = warcEncode(Seq(
      ("warcinfo", "", "software: graft\r\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
      ("response", s"https://archive.example.com/doc/$id",
        http.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))))
    if (id % 2 == 1) gzip(raw) else raw
  }
}
