package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DocumentConverters, PdfExtract}

/** Real PDF text extraction on hand-built documents: object graph +
  * page tree + content-stream interpretation, uncompressed and
  * FlateDecode, through the reference's Y-delta markdown
  * reconstruction. */
class PdfExtractSpec extends AnyFunSuite {

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    val in = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Assemble a minimal PDF: catalog, page tree, one page per content
    * stream; `flate` compresses the streams. */
  private def buildPdf(contents: Seq[String], flate: Boolean): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    val nPages = contents.length
    val kidRefs = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w(s"2 0 obj << /Type /Pages /Kids [$kidRefs] /Count $nPages >> endobj\n")
    contents.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 3 + 2 * i
      val streamNum = pageNum + 1
      w(s"$pageNum 0 obj << /Type /Page /Parent 2 0 R " +
        s"/Contents $streamNum 0 R >> endobj\n")
      val data =
        if (flate) deflate(content)
        else content.getBytes(latin1)
      val filter = if (flate) " /Filter /FlateDecode" else ""
      w(s"$streamNum 0 obj << /Length ${data.length}$filter >> stream\n")
      out.write(data)
      w("\nendstream endobj\n")
    }
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  private val page1 =
    """BT /F1 12 Tf 72 720 Td (Installation Guide) Tj
      |0 -20 Td (Follow these steps to install.) Tj
      |0 -20 Td (Then restart the service.) Tj ET""".stripMargin
  private val page2 =
    """BT 1 0 0 1 72 700 Tm (Second page content here.) Tj
      |T* (Line after T-star.) Tj ET""".stripMargin

  test("uncompressed two-page PDF extracts real text with page headings") {
    val pdf = buildPdf(Seq(page1, page2), flate = false)
    val md = DocumentConverters.convertFileToMarkdown("docs/guide.pdf", pdf)
    assert(md.isDefined)
    val m = md.get
    assert(m.startsWith("# guide"))
    assert(m.contains("## Page 1") && m.contains("## Page 2"))
    assert(m.contains("Installation Guide"))
    assert(m.contains("Follow these steps to install."))
    assert(m.contains("Second page content here."))
    assert(!m.contains("stub-extracted")) // the real path, not the stub
  }

  test("FlateDecode streams inflate via the JVM codec") {
    val pdf = buildPdf(Seq(page1), flate = true)
    val md = DocumentConverters.convertFileToMarkdown("a/b/x.pdf", pdf)
    assert(md.isDefined && md.get.contains("Installation Guide"))
    assert(!md.get.contains("## Page")) // single page: no page headings
  }

  test("Y-delta reconstruction separates lines; same-y runs join") {
    // two runs at the same y (|dy|<=5) then one 20 below
    val content =
      "BT 72 700 Td (Hello) Tj 0 -2 Td (world) Tj 0 -20 Td (Next line) Tj ET"
    val pdf = buildPdf(Seq(content), flate = false)
    val runs = PdfExtract.extractRuns(pdf)
    assert(runs.length == 1)
    val text = DocumentConverters.pdfPageText(runs.head._2)
    // pdfPageText collapses \s+ to ' ' after inserting breaks
    assert(text == "Hello world Next line")
  }

  test("TJ arrays, escapes, and hex strings decode") {
    val content =
      """BT 72 700 Td [(Kerned ) -120 (pair)] TJ
        |0 -20 Td (Escaped \(parens\) and \134 backslash) Tj
        |0 -20 Td <48657821> Tj ET""".stripMargin
    val pdf = buildPdf(Seq(content), flate = false)
    val md = PdfExtract.pdfToMarkdown("t.pdf", pdf).get
    assert(md.contains("Kerned pair"))
    assert(md.contains("Escaped (parens) and \\ backslash"))
    assert(md.contains("Hex!"))
  }

  /** Independent TIFF-LZW encoder (PDF §7.4.4 semantics, EarlyChange=1)
    * so the round-trip below cross-checks the decoder rather than
    * replaying it. Width grows when the DECODER's table view crosses
    * 2^w - 1 — the encoder's dictionary runs one entry ahead, hence the
    * `>= (1 << width)` form here vs the decoder's `>= (1 << width)-1`. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap[Vector[Byte], Int]()
    var nextCode = 258
    def codeOf(w: Vector[Byte]): Int =
      if (w.length == 1) w(0) & 0xff else dict(w)
    put(256)
    var w = Vector.empty[Byte]
    data.foreach { c =>
      val wc = w :+ c
      if (wc.length == 1 || dict.contains(wc)) w = wc
      else {
        put(codeOf(w))
        if (nextCode <= 4095) { // table full: stop assigning (no Clear)
          dict(wc) = nextCode; nextCode += 1
          if (nextCode >= (1 << width) && width < 12) width += 1
        }
        w = Vector(c)
      }
    }
    if (w.nonEmpty) put(codeOf(w))
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZWDecode: the PDF-spec example vector decodes exactly") {
    // [PDF 32000-1:2008 §7.4.4.2]: 45 45 45 45 45 65 45 45 45 66
    // encodes (with the 9-bit start, clear, KwKwK on the second code)
    // to 80 0B 60 50 22 0C 0C 85 01
    val enc = Array(0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01)
      .map(_.toByte)
    val dec = PdfExtract.lzwDecode(enc)
    assert(dec.isDefined)
    assert(dec.get.toSeq ==
      Seq(45, 45, 45, 45, 45, 65, 45, 45, 45, 66).map(_.toByte))
    // garbage that hits an unassigned code is rejected, not mis-decoded
    assert(PdfExtract.lzwDecode(Array(0x80.toByte, 0x7F.toByte,
      0xFF.toByte, 0xFF.toByte)).isEmpty)
  }

  test("LZWDecode round-trips across the 10/11-bit width boundaries") {
    // deterministic pseudo-random bytes: enough distinct phrases to
    // push the dictionary past 512/1024/2048 AND through the 12-bit
    // full-table point (both sides must stop assigning at 4095)
    var seed = 12345L
    val data = Array.fill(12000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >> 33) & 0xff).toByte
    }
    val dec = PdfExtract.lzwDecode(lzwEncode(data))
    assert(dec.isDefined && dec.get.toSeq == data.toSeq)
    // and a text-like payload with heavy repetition (deep phrases)
    val text = ("the quick brown fox jumps over the lazy dog. " * 200)
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val dec2 = PdfExtract.lzwDecode(lzwEncode(text))
    assert(dec2.isDefined && dec2.get.toSeq == text.toSeq)
  }

  test("a /LZWDecode PDF extracts real text end to end") {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    val data = lzwEncode(page1.getBytes(latin1))
    w(s"4 0 obj << /Length ${data.length} /Filter /LZWDecode >> stream\n")
    out.write(data)
    w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    val md = PdfExtract.pdfToMarkdown("lzw.pdf", out.toByteArray)
    assert(md.isDefined && md.get.contains("Installation Guide") &&
      md.get.contains("Then restart the service."))
  }

  test("ASCIIHexDecode: pairs, whitespace, EOD, odd-digit padding") {
    assert(PdfExtract.asciiHexDecode("48656C6C6F>".getBytes(latin1)).get
      .sameElements("Hello".getBytes(latin1)))
    assert(PdfExtract.asciiHexDecode("48 65\n6C6c 6F".getBytes(latin1)).get
      .sameElements("Hello".getBytes(latin1)))
    assert(PdfExtract.asciiHexDecode("486>".getBytes(latin1)).get
      .sameElements(Array[Byte](0x48, 0x60)))
  }

  /** Minimal ASCII85 encoder for chain round-trips (independent of the
    * decoder's arithmetic: builds from the 4-byte big-endian value). */
  private def a85Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    data.grouped(4).foreach { g =>
      var v = 0L
      g.foreach(b => v = (v << 8) | (b & 0xff))
      var pad = 4 - g.length
      v = v << (8 * pad)
      val cs = new Array[Char](5)
      var t = v
      (4 to 0 by -1).foreach { i => cs(i) = ('!' + (t % 85)).toChar; t /= 85 }
      if (g.length == 4 && v == 0) sb.append('z')
      else sb.append(new String(cs, 0, 5 - pad))
    }
    sb.append("~>").toString
  }

  test("ASCII85Decode: the classic KAT, z-shorthand, partial groups") {
    // Leviathan: "Man " encodes to 9jqo^
    assert(PdfExtract.ascii85Decode("9jqo^~>".getBytes(latin1)).get
      .sameElements("Man ".getBytes(latin1)))
    assert(PdfExtract.ascii85Decode("z~>".getBytes(latin1)).get
      .sameElements(Array[Byte](0, 0, 0, 0)))
    // encoder round trip across lengths incl. partial final groups
    (1 to 17).foreach { n =>
      val data = Array.tabulate[Byte](n)(i => (i * 37 + 11).toByte)
      assert(PdfExtract.ascii85Decode(a85Encode(data).getBytes(latin1)).get
        .sameElements(data), s"n=$n")
    }
    // corrupt character rejects
    assert(PdfExtract.ascii85Decode("9jq{^~>".getBytes(latin1)).isEmpty)
  }

  test("a /Filter array chain [ASCII85 -> Flate] decodes end to end") {
    val content = "BT /F1 12 Tf 72 200 Td (chained filters) Tj ET"
    val enc = a85Encode(deflate(content))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${enc.length} " +
      "/Filter [/ASCII85Decode /FlateDecode] >> stream\n")
    w(enc)
    w("\nendstream endobj\ntrailer << /Size 5 /Root 1 0 R >>\n")
    val runs = PdfExtract.extractRuns(out.toByteArray)
    assert(runs.nonEmpty && runs.head._2.head.str == "chained filters")
  }

  test("inline images (BI..ID..EI) are skipped, not walked as tokens") {
    // the image data contains a fake show-string: it must NOT emit;
    // real text before and after the image must survive
    val content = "BT /F1 12 Tf 72 200 Td (before) Tj ET\n" +
      "BI /W 2 /H 2 /BPC 8 /CS /RGB ID  ÿ(fake) Tj  EI\n" +
      "BT /F1 12 Tf 72 100 Td (after) Tj ET"
    val pdf = buildPdf(Seq(content), flate = false)
    val runs = PdfExtract.extractRuns(pdf)
    val strs = runs.flatMap(_._2).map(_.str)
    assert(strs.contains("before") && strs.contains("after"))
    assert(!strs.exists(_.contains("fake")))
  }

  test("PNG predictor unfiltering: Sub, Up, Paeth hand vectors") {
    // Sub: each byte adds the left neighbor
    assert(PdfExtract.pngUnpredict(
      Array[Byte](1, 10, 10, 10, 10), 4, 1).get
      .sameElements(Array[Byte](10, 20, 30, 40)))
    // Up: second row adds the first
    assert(PdfExtract.pngUnpredict(
      Array[Byte](0, 1, 2, 3, 2, 1, 1, 1), 3, 1).get
      .sameElements(Array[Byte](1, 2, 3, 2, 3, 4)))
    // Paeth: left=0, up=5, upLeft=0 -> predictor picks up
    assert(PdfExtract.pngUnpredict(
      Array[Byte](0, 5, 4, 3), 1, 1).get
      .sameElements(Array[Byte](5, 8)))
    // misaligned length and unknown filter types reject
    assert(PdfExtract.pngUnpredict(Array[Byte](0, 1, 2), 4, 1).isEmpty)
    assert(PdfExtract.pngUnpredict(Array[Byte](9, 1), 1, 1).isEmpty)
  }

  test("a /Predictor 12 (PNG Up) Flate content stream decodes") {
    val content = "BT /F1 12 Tf 72 200 Td (predicted text) Tj ET"
    val cols = 16
    val padded = content + " " * ((cols - content.length % cols) % cols)
    val rows = padded.getBytes(latin1).grouped(cols).toSeq
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](cols)
    rows.foreach { row =>
      filtered.write(2) // PNG Up
      row.indices.foreach(i => filtered.write((row(i) - prev(i)) & 0xff))
      prev = row
    }
    val enc = graft.sources.PdfFixture.deflate(filtered.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${enc.length} /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $cols >> >> stream\n")
    out.write(enc)
    w("\nendstream endobj\ntrailer << /Size 5 /Root 1 0 R >>\n")
    val runs = PdfExtract.extractRuns(out.toByteArray)
    assert(runs.nonEmpty && runs.head._2.head.str == "predicted text")
  }

  test("non-PDF and textless payloads fall back to the stub") {
    val junk = "not a pdf at all".getBytes
    assert(PdfExtract.pdfToMarkdown("x.pdf", junk).isEmpty)
    val md = DocumentConverters.convertFileToMarkdown("x.pdf", junk)
    assert(md.isDefined && md.get.contains("stub-extracted"))
    // structurally a PDF but no text operators -> stub path too
    val empty = buildPdf(Seq("0 0 m 100 100 l S"), flate = false)
    assert(PdfExtract.pdfToMarkdown("y.pdf", empty).isEmpty)
  }
}
