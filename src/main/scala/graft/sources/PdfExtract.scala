package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal dependency-free PDF text extraction — the byte-level decode
  * step in front of `DocumentConverters.pdfPageText`/`pdfMarkdown`
  * (the reference delegates this to PDF.js, content-processor.ts:
  * 1489-1520; this build extracts the same (str, width, y) text runs
  * directly from the PDF object graph).
  *
  * Supported: the format core that text-bearing PDFs actually use —
  * object scanning (`N G obj … endobj`), page-tree ordering via
  * /Pages /Kids with a document-order fallback, /Contents streams
  * (direct or array), FlateDecode via java.util.zip (the JVM ships the
  * codec), LZWDecode (the spec's TIFF-flavored variant, implemented in
  * [[lzwDecode]]), and the BT…ET text operators (Tf, Td, TD, Tm,
  * T-star, TL, Tj, TJ, quote forms). Out of scope (falls back to the
  * labeled stub upstream): encrypted documents, JBIG2/JPX image
  * filters, CID font remapping — the run text for those is the font's
  * raw bytes.
  *
  * Runs inside per-row kernels: no state, no I/O, executor-safe.
  */
object PdfExtract {

  import DocumentConverters.PdfRun

  /** One parsed indirect object: number, raw dictionary/body text
    * (ISO-8859-1 so offsets == byte offsets), optional stream bytes. */
  private final case class PdfObj(num: Int, body: String,
      stream: Option[Array[Byte]])

  private def latin1(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

  private val ObjRe =
    """(?s)(\d+)\s+\d+\s+obj\b(.*?)endobj""".r
  private val StreamRe =
    """(?s)stream\r?\n(.*?)\r?\nendstream""".r
  private val KidsRe = """/Kids\s*\[([^\]]*)\]""".r
  private val RefRe = """(\d+)\s+\d+\s+R""".r
  private val ContentsRefRe = """/Contents\s+(\d+)\s+\d+\s+R""".r
  private val ContentsArrRe = """/Contents\s*\[([^\]]*)\]""".r

  private def parseObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val text = latin1(bytes)
    ObjRe.findAllMatchIn(text).map { m =>
      val body = m.group(2)
      val stream = StreamRe.findFirstMatchIn(body).map { sm =>
        body.substring(sm.start(1), sm.end(1))
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      }
      val num = m.group(1).toInt
      num -> PdfObj(num, body, stream)
    }.toMap
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) return None
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** PDF LZWDecode ([PDF 32000-1:2008 §7.4.4] — the TIFF-flavored LZW
    * variant): MSB-first variable-width codes starting at 9 bits,
    * growing to 12; code 256 clears the table, 257 is EOD; with the
    * default EarlyChange=1 the width bumps one code EARLY (when the
    * next assignment would be 2^w - 1). The KwKwK case (a code equal
    * to the next unassigned entry) resolves to prev + prev.head. */
  private[graft] def lzwDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val extras = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var width = 9
      var prev: Array[Byte] = null
      var bitPos = 0
      val nBits = data.length * 8
      def next(): Int = {
        if (bitPos + width > nBits) return 257 // truncated stream: EOD
        var v = 0
        var i = 0
        while (i < width) {
          v = (v << 1) | ((data(bitPos >> 3) >> (7 - (bitPos & 7))) & 1)
          bitPos += 1; i += 1
        }
        v
      }
      var done = false
      while (!done) {
        val code = next()
        if (code == 257) done = true
        else if (code == 256) {
          extras.clear(); width = 9; prev = null
        } else {
          val entry: Array[Byte] =
            if (code < 256) Array(code.toByte)
            else if (code >= 258 && code - 258 < extras.length)
              extras(code - 258)
            else if (prev != null && code == 258 + extras.length)
              prev :+ prev(0) // KwKwK
            else return None // corrupt code
          out.write(entry)
          // table full at the 12-bit cap: no more additions until a
          // Clear (matching encoders, which cannot emit codes > 4095)
          if (prev != null && 258 + extras.length <= 4095)
            extras += (prev :+ entry(0))
          prev = entry
          // EarlyChange=1: bump when the NEXT assignment would need it
          if (258 + extras.length >= (1 << width) - 1 && width < 12)
            width += 1
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  private def contentBytes(obj: PdfObj): Option[Array[Byte]] =
    obj.stream.map { raw =>
      if (obj.body.contains("/FlateDecode")) inflate(raw).getOrElse(raw)
      else if (obj.body.contains("/LZWDecode")) lzwDecode(raw).getOrElse(raw)
      else raw
    }

  /** Page content streams in page order: the /Pages /Kids walk when the
    * tree parses, otherwise every /Type /Page object in document
    * order. */
  private def pageContents(objs: Map[Int, PdfObj]): Seq[Array[Byte]] = {
    def isPage(o: PdfObj) =
      """/Type\s*/Page\b""".r.findFirstIn(o.body).isDefined
    val ordered: Seq[PdfObj] = {
      val fromKids = for {
        pages <- objs.values.find(o =>
          """/Type\s*/Pages\b""".r.findFirstIn(o.body).isDefined)
        kids <- KidsRe.findFirstMatchIn(pages.body)
      } yield RefRe.findAllMatchIn(kids.group(1))
        .map(_.group(1).toInt).toSeq
        .flatMap(objs.get).filter(isPage)
      fromKids.filter(_.nonEmpty).getOrElse(
        objs.values.toSeq.sortBy(_.num).filter(isPage))
    }
    ordered.flatMap { page =>
      val refs = ContentsArrRe.findFirstMatchIn(page.body) match {
        case Some(arr) =>
          RefRe.findAllMatchIn(arr.group(1)).map(_.group(1).toInt).toSeq
        case None =>
          ContentsRefRe.findFirstMatchIn(page.body)
            .map(_.group(1).toInt).toSeq
      }
      val parts = refs.flatMap(objs.get).flatMap(contentBytes)
      if (parts.isEmpty) None
      else Some(parts.reduce(_ ++ _))
    }
  }

  // ── Content-stream text interpreter ───────────────────────────────────

  /** Decode a literal string body: \-escapes incl. octal. */
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < s.length && j < i + 4 &&
              s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb.append(v.toChar); i = j
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def hexString(s: String): String = {
    val hex = s.filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
  }

  /** Extract text runs from one page's content stream: walks the token
    * stream tracking the text-positioning state the Y-delta line
    * reconstruction needs (ty from Tm, Td, TD, T-star, TL), emitting
    * one run per show-text operator. Width is the character-count
    * advance proxy (positive ⇒ the reconstruction appends the
    * inter-word space, like PDF.js's computed advance). */
  private[sources] def pageRuns(content: Array[Byte]): Seq[PdfRun] = {
    val src = latin1(content)
    val out = ArrayBuffer[PdfRun]()
    // operand stack: numbers, strings, names; arrays collected inline
    val operands = ArrayBuffer[Any]()
    var ty = 0.0
    var tl = 0.0
    var i = 0
    val n = src.length

    def emit(s: String): Unit =
      if (s.nonEmpty) out += PdfRun(s, s.length.toDouble, ty)

    def readString(from: Int): (String, Int) = {
      // literal ( … ) with nesting and escapes
      var depth = 0
      var j = from
      val sb = new StringBuilder
      var done = false
      while (j < n && !done) {
        val c = src.charAt(j)
        if (c == '\\' && j + 1 < n) { sb.append(c).append(src.charAt(j + 1)); j += 2 }
        else if (c == '(') { if (depth > 0) sb.append(c); depth += 1; j += 1 }
        else if (c == ')') {
          depth -= 1
          if (depth == 0) { done = true; j += 1 } else { sb.append(c); j += 1 }
        } else { sb.append(c); j += 1 }
      }
      (unescape(sb.toString), j)
    }

    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '%') { while (i < n && src.charAt(i) != '\n') i += 1 }
      else if (c == '(') {
        val (s, j) = readString(i); operands += s; i = j
      } else if (c == '<' && i + 1 < n && src.charAt(i + 1) == '<') {
        operands.clear(); i += 2 // inline dict: irrelevant to text state
      } else if (c == '<') {
        val end = src.indexOf('>', i + 1)
        if (end < 0) i = n
        else { operands += hexString(src.substring(i + 1, end)); i = end + 1 }
      } else if (c == '[' || c == ']' || c == '{' || c == '}' ||
        c == '>') {
        i += 1 // array markers: TJ just consumes accumulated strings
      } else if (c == '/') {
        var j = i + 1
        while (j < n && !src.charAt(j).isWhitespace &&
          !"()<>[]{}/%".contains(src.charAt(j))) j += 1
        operands += ("/" + src.substring(i + 1, j)); i = j
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        var j = i + 1
        while (j < n && (src.charAt(j).isDigit || src.charAt(j) == '.')) j += 1
        operands += src.substring(i, j).toDouble; i = j
      } else {
        var j = i + 1
        while (j < n && !src.charAt(j).isWhitespace &&
          !"()<>[]{}/%".contains(src.charAt(j))) j += 1
        val op = src.substring(i, j)
        val nums = operands.collect { case d: Double => d }.toSeq
        val strs = operands.collect { case s: String => s }.toSeq
        op match {
          case "BT" => ty = 0.0; tl = 0.0
          case "Tm" => if (nums.length >= 6) ty = nums(5)
          case "Td" => if (nums.length >= 2) ty += nums(1)
          case "TD" => if (nums.length >= 2) { tl = -nums(1); ty += nums(1) }
          case "TL" => if (nums.nonEmpty) tl = nums.head
          case "T*" => ty -= tl
          case "Tj" => strs.lastOption.foreach(emit)
          case "'" => ty -= tl; strs.lastOption.foreach(emit)
          case "\"" => ty -= tl; strs.lastOption.foreach(emit)
          case "TJ" => emit(strs.mkString)
          case _ => () // Tf, colors, graphics: no effect on runs
        }
        operands.clear()
        i = j
      }
    }
    out.toSeq
  }

  /** (page, runs) for every content-bearing page; empty when nothing
    * parseable (callers fall back to the stub). */
  def extractRuns(bytes: Array[Byte]): Seq[(Int, Seq[PdfRun])] =
    try {
      pageContents(parseObjects(bytes)).zipWithIndex.map {
        case (content, idx) => (idx + 1, pageRuns(content))
      }.filter(_._2.nonEmpty)
    } catch { case _: Exception => Seq.empty }

  /** Real PDF → markdown through the reference reconstruction; None
    * when the document yields no text runs. */
  def pdfToMarkdown(fileName: String, bytes: Array[Byte]): Option[String] = {
    val pages = extractRuns(bytes)
    if (pages.isEmpty) None
    else {
      val base = fileName.substring(fileName.lastIndexOf('/') + 1)
      val dot = base.lastIndexOf('.')
      val title = if (dot > 0) base.substring(0, dot) else base
      Some(DocumentConverters.pdfMarkdown(title, pages))
    }
  }
}
