package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DocumentConverters, DocxExtract}

/** Real DOCX extraction on hand-built OOXML fixtures: ZIP container,
  * document.xml heading/paragraph/run/list/table mapping, and the
  * markdown post-processing shared with the reference. */
class DocxExtractSpec extends AnyFunSuite {

  private def docx(documentXml: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(out)
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("[Content_Types].xml", "<Types/>")
    put("word/document.xml", documentXml)
    zip.close()
    out.toByteArray
  }

  private def wrap(body: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
       |<w:body>$body</w:body></w:document>""".stripMargin

  private def p(runs: String, style: Option[String] = None,
      list: Boolean = false): String = {
    val pr =
      if (style.isEmpty && !list) ""
      else "<w:pPr>" +
        style.map(s => s"""<w:pStyle w:val="$s"/>""").getOrElse("") +
        (if (list) """<w:numPr><w:ilvl w:val="0"/></w:numPr>""" else "") +
        "</w:pPr>"
    s"<w:p>$pr$runs</w:p>"
  }
  private def r(text: String, bold: Boolean = false,
      italic: Boolean = false): String = {
    val pr =
      if (!bold && !italic) ""
      else "<w:rPr>" + (if (bold) "<w:b/>" else "") +
        (if (italic) "<w:i/>" else "") + "</w:rPr>"
    s"""<w:r>$pr<w:t xml:space="preserve">$text</w:t></w:r>"""
  }

  test("headings, paragraphs, and formatting map to markdown") {
    val xml = wrap(
      p(r("User Guide"), style = Some("Heading1")) +
        p(r("Getting Started"), style = Some("Heading2")) +
        p(r("Install the ") + r("package", bold = true) +
          r(" now", italic = true)))
    val md = DocumentConverters
      .convertFileToMarkdown("docs/manual.docx", docx(xml)).get
    assert(md.startsWith("# manual"))           // filename title
    assert(md.contains("# User Guide"))
    assert(md.contains("## Getting Started"))
    assert(md.contains("**package**"))
    assert(md.contains("*now*") || md.contains("_now_"))
    assert(!md.contains("stub-extracted"))
  }

  test("numbered paragraphs group into one list") {
    val xml = wrap(
      p(r("Steps"), style = Some("Heading2")) +
        p(r("first step"), list = true) +
        p(r("second step"), list = true) +
        p(r("after the list")))
    val md = DocumentConverters
      .convertFileToMarkdown("steps.docx", docx(xml)).get
    assert(md.contains("- first step"))
    assert(md.contains("- second step"))
    assert(md.contains("after the list"))
  }

  test("tables render through the markdown table path") {
    val xml = wrap(
      "<w:tbl>" +
        "<w:tr><w:tc>" + p(r("Name")) + "</w:tc><w:tc>" + p(r("Value")) +
        "</w:tc></w:tr>" +
        "<w:tr><w:tc>" + p(r("timeout")) + "</w:tc><w:tc>" + p(r("30")) +
        "</w:tc></w:tr>" +
        "</w:tbl>")
    val md = DocumentConverters
      .convertFileToMarkdown("t.docx", docx(xml)).get
    assert(md.contains("Name") && md.contains("timeout") &&
      md.contains("30"))
    assert(md.contains("|")) // rendered as a markdown table
  }

  test("escaped characters round-trip") {
    val xml = wrap(p(r("a &lt; b &amp; c &gt; d")))
    val md = DocxExtract.docxToMarkdown("esc.docx", docx(xml)).get
    assert(md.contains("a < b & c > d"))
  }

  test("non-zip and zip-without-document fall back to the stub") {
    assert(DocxExtract.docxToMarkdown("x.docx", "junk".getBytes).isEmpty)
    val md = DocumentConverters.convertFileToMarkdown("x.docx", "junk".getBytes)
    assert(md.isDefined && md.get.contains("stub-extracted"))
    // a real zip missing word/document.xml
    val out = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(out)
    zip.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    zip.write("x".getBytes); zip.closeEntry(); zip.close()
    assert(DocxExtract.docxToMarkdown("y.docx", out.toByteArray).isEmpty)
    // legacy .doc keeps the stub
    val doc = DocumentConverters.convertFileToMarkdown("z.doc", "junk".getBytes)
    assert(doc.isDefined && doc.get.contains("stub-extracted"))
  }
}
