package graft.sources

import scala.collection.mutable.ArrayBuffer
import org.w3c.dom.{Element, Node}

/** Minimal dependency-free DOCX text extraction — the byte-level decode
  * step in front of `DocumentConverters.docxHtmlMarkdown` (the
  * reference delegates this to mammoth's convertToHtml,
  * content-processor.ts:1442-1487; this build reads the OOXML parts
  * directly: a .docx is a ZIP, java.util.zip opens it, and the JDK DOM
  * parser reads word/document.xml).
  *
  * Emitted HTML covers mammoth's core mapping — Heading styles →
  * h1..h6, paragraphs → p, bold/italic runs → strong/em, numbering →
  * ul/li, tables → table/tr/td, tabs and breaks — which is exactly the
  * tag set `HtmlToMarkdown.convert` renders. Legacy binary .doc (OLE2
  * compound files) stays stubbed upstream.
  *
  * Runs inside per-row kernels: no state, no I/O, executor-safe.
  */
object DocxExtract {

  /** Bytes of one ZIP entry, or None (not a ZIP / entry absent). */
  private def zipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] =
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == name) {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return Some(out.toByteArray)
        }
        entry = zin.getNextEntry
      }
      None
    } catch { case _: Exception => None }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def children(n: Node): Seq[Node] = {
    val list = n.getChildNodes
    (0 until list.getLength).map(list.item)
  }

  private def localName(n: Node): String = {
    val name = n.getNodeName
    val colon = name.indexOf(':')
    if (colon >= 0) name.substring(colon + 1) else name
  }

  private def firstDescendant(e: Element, local: String): Option[Element] = {
    val it = children(e).iterator
    while (it.hasNext) {
      it.next() match {
        case el: Element =>
          if (localName(el) == local) return Some(el)
          val deeper = firstDescendant(el, local)
          if (deeper.isDefined) return deeper
        case _ => ()
      }
    }
    None
  }

  private def attrVal(e: Element): Option[String] = {
    val attrs = e.getAttributes
    (0 until attrs.getLength).map(attrs.item)
      .find(a => localName(a) == "val").map(_.getNodeValue)
  }

  /** Inline HTML of one run (w:r): its texts/tabs/breaks, wrapped in
    * strong/em per the run properties. */
  private def runHtml(r: Element): String = {
    val rPr = children(r).collectFirst {
      case e: Element if localName(e) == "rPr" => e }
    val bold = rPr.exists(p => children(p).exists {
      case e: Element => localName(e) == "b" &&
        !attrVal(e).contains("false") && !attrVal(e).contains("0")
      case _ => false })
    val italic = rPr.exists(p => children(p).exists {
      case e: Element => localName(e) == "i" &&
        !attrVal(e).contains("false") && !attrVal(e).contains("0")
      case _ => false })
    val sb = new StringBuilder
    def walk(n: Node): Unit = n match {
      case e: Element => localName(e) match {
        case "t" => sb.append(esc(e.getTextContent))
        case "tab" => sb.append('\t')
        case "br" | "cr" => sb.append("<br/>")
        case "rPr" => () // properties, not content
        case _ => children(e).foreach(walk)
      }
      case _ => ()
    }
    children(r).foreach(walk)
    val text = sb.toString
    if (text.isEmpty) text
    else if (bold && italic) s"<strong><em>$text</em></strong>"
    else if (bold) s"<strong>$text</strong>"
    else if (italic) s"<em>$text</em>"
    else text
  }

  /** Inline HTML of a paragraph's runs (hyperlinks unwrap to their
    * runs; the reference keeps link text too). */
  private def paragraphInline(p: Element): String = {
    val sb = new StringBuilder
    def walk(n: Node): Unit = n match {
      case e: Element => localName(e) match {
        case "r" => sb.append(runHtml(e))
        case "pPr" => ()
        case _ => children(e).foreach(walk)
      }
      case _ => ()
    }
    children(p).foreach(walk)
    sb.toString
  }

  private val HeadingStyle = """[Hh]eading(\d)""".r

  /** One block-level element of body HTML, or None for empty content.
    * isListItem rides along so consecutive items group into one ul. */
  private def paragraphHtml(p: Element): Option[(String, Boolean)] = {
    val pPr = children(p).collectFirst {
      case e: Element if localName(e) == "pPr" => e }
    val style = pPr.flatMap(firstDescendant(_, "pStyle")).flatMap(attrVal)
    val isList = pPr.exists(firstDescendant(_, "numPr").isDefined)
    val inline = paragraphInline(p).trim
    if (inline.isEmpty) None
    else style match {
      case Some(HeadingStyle(level)) =>
        val h = math.min(level.toInt, 6)
        Some((s"<h$h>$inline</h$h>", false))
      case Some("Title") => Some((s"<h1>$inline</h1>", false))
      case _ if isList => Some((s"<li>$inline</li>", true))
      case _ => Some((s"<p>$inline</p>", false))
    }
  }

  private def tableHtml(tbl: Element): String = {
    val rows = children(tbl).collect {
      case e: Element if localName(e) == "tr" => e }
    val body = rows.map { tr =>
      val cells = children(tr).collect {
        case e: Element if localName(e) == "tc" => e }
      val tds = cells.map { tc =>
        val ps = ArrayBuffer[String]()
        def collect(n: Node): Unit = n match {
          case e: Element if localName(e) == "p" =>
            ps += paragraphInline(e).trim
          case e: Element => children(e).foreach(collect)
          case _ => ()
        }
        children(tc).foreach(collect)
        s"<td>${ps.filter(_.nonEmpty).mkString(" ")}</td>"
      }.mkString
      s"<tr>$tds</tr>"
    }.mkString
    s"<table>$body</table>"
  }

  /** word/document.xml → the HTML fragment docxHtmlMarkdown consumes. */
  private[sources] def documentXmlToHtml(xml: String): Option[String] =
    try {
      val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      // hermetic parse: no DTD/entity fetching on untrusted input
      factory.setFeature(
        "http://apache.org/xml/features/disallow-doctype-decl", true)
      val doc = factory.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(
          xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val body = firstDescendant(doc.getDocumentElement, "body")
        .getOrElse(return None)
      val blocks = ArrayBuffer[String]()
      var listOpen = false
      def flushList(): Unit = if (listOpen) { blocks += "</ul>"; listOpen = false }
      children(body).foreach {
        case e: Element if localName(e) == "p" =>
          paragraphHtml(e).foreach { case (html, isItem) =>
            if (isItem && !listOpen) { blocks += "<ul>"; listOpen = true }
            if (!isItem) flushList()
            blocks += html
          }
        case e: Element if localName(e) == "tbl" =>
          flushList(); blocks += tableHtml(e)
        case _ => ()
      }
      flushList()
      if (blocks.isEmpty) None else Some(blocks.mkString("\n"))
    } catch { case _: Exception => None }

  /** Real DOCX → markdown through the reference post-processing; None
    * when the payload is not a parseable OOXML document. */
  def docxToMarkdown(fileName: String, bytes: Array[Byte]): Option[String] =
    for {
      xmlBytes <- zipEntry(bytes, "word/document.xml")
      html <- documentXmlToHtml(new String(xmlBytes,
        java.nio.charset.StandardCharsets.UTF_8))
    } yield DocumentConverters.docxHtmlMarkdown(fileName, html)
}
