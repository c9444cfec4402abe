package graft.sources

import graft.functions.{HtmlToMarkdown, TextUtil}

/** File-format → Markdown conversion dispatcher (SURVEY.md §2.2,
  * reference convertFileToMarkdown content-processor.ts:1569-1597).
  *
  * Text-borne formats (md/txt/html) convert for real, and so does every
  * piece of the binary formats' DEFINING logic: the PDF text-item →
  * line reconstruction (`pdfPageText`/`pdfMarkdown`, the reference's
  * Y-delta heuristic over a text-run table) and the DOC/DOCX body
  * normalization (`docBodyMarkdown`/`docxHtmlMarkdown`). PDF byte
  * decode is real for the format core (`PdfExtract`: object graph,
  * FlateDecode, BT…ET text operators), so is DOCX (`DocxExtract`:
  * ZIP + word/document.xml through the mammoth-core tag mapping), and
  * so is legacy binary .doc (`DocExtract`: [MS-CFB] compound file +
  * [MS-DOC] piece table, word-extractor's getBody() scope) — each with
  * the labeled stub as fallback for undecodable payloads
  * (encrypted/corrupt containers). */
object DocumentConverters {

  private def titleOf(fileName: String): String = {
    val base = fileName.substring(fileName.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** One extracted PDF text item: the subset of PDF.js's `TextItem` the
    * reconstruction reads (str, width, transform[5]=y). */
  final case class PdfRun(str: String, width: Double, y: Double)

  /** Page text from ordered text runs — the reference's Y-delta
    * line-break reconstruction (content-processor.ts:1521-1549),
    * byte-faithful including its cleanup order: a line break is inserted
    * when |Δy| > 5, a space after any run with width > 0, and the final
    * `\s+`→' ' collapse turns those breaks into separators — so the
    * Y-delta logic is what keeps two width-0 runs on different lines
    * from concatenating. */
  def pdfPageText(items: Seq[PdfRun]): String = {
    val sb = new StringBuilder
    var currentY = -1.0
    items.foreach { it =>
      if (currentY != -1 && math.abs(it.y - currentY) > 5) sb.append('\n')
      sb.append(it.str)
      if (it.width > 0) sb.append(' ')
      currentY = it.y
    }
    sb.toString
      .replaceAll("\\s+", " ")
      .replaceAll("\n\\s+", "\n") // (dead after the collapse — kept to match the reference)
      .trim
  }

  /** Whole-document markdown from per-page runs (reference
    * content-processor.ts:1489-1567): `# title`, `## Page N` headings
    * only for multi-page documents, empty pages skipped, `\n{3,}`
    * collapsed, trimmed. */
  def pdfMarkdown(title: String, pages: Seq[(Int, Seq[PdfRun])]): String = {
    val numPages = if (pages.isEmpty) 0 else pages.map(_._1).max
    val sb = new StringBuilder(s"# $title\n\n")
    pages.sortBy(_._1).foreach { case (p, items) =>
      val pageText = pdfPageText(items)
      if (pageText.nonEmpty) {
        if (numPages > 1) sb.append(s"## Page $p\n\n")
        sb.append(pageText).append("\n\n")
      }
    }
    sb.toString.replaceAll("\n{3,}", "\n\n").trim
  }

  /** DOC body → markdown (reference content-processor.ts:1411-1440):
    * filename title + body with line endings normalized and excessive
    * breaks collapsed. Everything after word-extractor's `getBody()`. */
  def docBodyMarkdown(fileName: String, body: String): String = {
    val cleaned = body.replace("\r\n", "\n")
      .replaceAll("\n{3,}", "\n\n").trim
    s"# ${titleOf(fileName)}\n\n$cleaned"
  }

  /** DOCX (mammoth-emitted HTML) → markdown (reference
    * content-processor.ts:1442-1487): filename title + sanitize/turndown
    * conversion + break collapse. Everything after mammoth's
    * convertToHtml. */
  def docxHtmlMarkdown(fileName: String, html: String): String =
    (s"# ${titleOf(fileName)}\n\n" + HtmlToMarkdown.convert(html))
      .replaceAll("\n{3,}", "\n\n").trim

  /** STUB PDF text extraction — the fallback when `PdfExtract` finds no
    * text runs (encrypted/imagelike documents): deterministic page
    * content derived from the payload hash, one `## Page N` section per
    * simulated page (reference page headings:
    * content-processor.ts:1489-1567). */
  def pdfToMarkdownStub(fileName: String, bytes: Array[Byte]): String = {
    val sha = TextUtil.sha256HexBytes(bytes)
    val pages = 1 + (bytes.length / 1024).min(4)
    val body = (1 to pages).map { p =>
      s"## Page $p\n\n[stub-extracted text ${sha.substring(0, 8)}-$p]"
    }.mkString("\n\n")
    s"# ${titleOf(fileName)}\n\n$body"
  }

  /** STUB DOC/DOCX extraction (reference: word-extractor/mammoth,
    * content-processor.ts:1411-1487): filename title + hash-derived
    * placeholder body. */
  def docToMarkdownStub(fileName: String, bytes: Array[Byte]): String = {
    val sha = TextUtil.sha256HexBytes(bytes)
    s"# ${titleOf(fileName)}\n\n[stub-extracted document text ${sha.substring(0, 8)}]"
  }

  /** Dispatcher: bytes + filename → Markdown (or None for formats that
    * should be skipped). `docPasswords` are tried against RC4-encrypted
    * legacy .doc payloads (the per-source password config a curation
    * pipeline carries); the no-password overload keeps reference parity
    * (encrypted docs → labeled stub). */
  def convertFileToMarkdown(fileName: String,
      bytes: Array[Byte]): Option[String] =
    convertFileToMarkdown(fileName, bytes, Nil)

  def convertFileToMarkdown(fileName: String, bytes: Array[Byte],
      docPasswords: Seq[String]): Option[String] = {
    val lower = fileName.toLowerCase
    val text = () => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (lower.endsWith(".md") || lower.endsWith(".markdown") ||
      lower.endsWith(".txt")) Some(text())
    else if (lower.endsWith(".html") || lower.endsWith(".htm"))
      Some(HtmlToMarkdown.convert(text()))
    else if (lower.endsWith(".pdf"))
      Some(PdfExtract.pdfToMarkdown(fileName, bytes)
        .getOrElse(pdfToMarkdownStub(fileName, bytes)))
    else if (lower.endsWith(".docx"))
      Some(DocxExtract.docxToMarkdown(fileName, bytes)
        .getOrElse(docToMarkdownStub(fileName, bytes)))
    else if (lower.endsWith(".doc"))
      Some(DocExtract.docToMarkdown(fileName, bytes, docPasswords)
        .getOrElse(docToMarkdownStub(fileName, bytes)))
    else None
  }
}
