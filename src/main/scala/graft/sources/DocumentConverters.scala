package graft.sources

import graft.functions.{HtmlToMarkdown, TextUtil}

/** File-format → Markdown conversion dispatcher (SURVEY.md §2.2,
  * reference convertFileToMarkdown content-processor.ts:1569-1597).
  *
  * Text-borne formats (md/txt/html) convert for real. The binary
  * formats (pdf/doc/docx) are STUBS — the JVM decode libraries
  * (PDFBox/POI) are not in this build — but they preserve the
  * reference's output *shape*: the filename becomes the `# title`
  * heading, PDF pages appear as `## Page N` sections (the reference's
  * Y-delta line-break extraction reduced to a deterministic page split).
  * Swapping a real extractor in changes no downstream plumbing: the
  * dispatcher's contract is bytes → markdown.
  */
object DocumentConverters {

  private def titleOf(fileName: String): String = {
    val base = fileName.substring(fileName.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** STUB PDF text extraction: deterministic page content derived from
    * the payload hash, one `## Page N` section per simulated page
    * (reference page headings: content-processor.ts:1489-1567). */
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
    * should be skipped). */
  def convertFileToMarkdown(fileName: String,
      bytes: Array[Byte]): Option[String] = {
    val lower = fileName.toLowerCase
    val text = () => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (lower.endsWith(".md") || lower.endsWith(".markdown") ||
      lower.endsWith(".txt")) Some(text())
    else if (lower.endsWith(".html") || lower.endsWith(".htm"))
      Some(HtmlToMarkdown.convert(text()))
    else if (lower.endsWith(".pdf")) Some(pdfToMarkdownStub(fileName, bytes))
    else if (lower.endsWith(".doc") || lower.endsWith(".docx"))
      Some(docToMarkdownStub(fileName, bytes))
    else None
  }
}
