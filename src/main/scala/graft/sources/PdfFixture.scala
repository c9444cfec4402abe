package graft.sources

/** Deterministic encrypted-PDF BUILDER — staging only, the input side
  * of the `doc_pdf_crypt` oracle row (the decode side is the real
  * [[PdfExtract]] path). Emits RC4-encrypted one-page PDFs under the
  * standard security handler ([PDF 32000-1:2008 §7.6.3]): /O from the
  * owner password (Algorithm 3), /U from the file key (Algorithms 4/5),
  * per-object stream keys (Algorithm 1), content deflated BEFORE
  * encryption (the writer-side compress-then-encrypt order the decoder
  * must invert). RC4/MD5 primitives are shared with the decoder — the
  * cipher is symmetric — so what the row proves is the full
  * key-derivation and authentication round trip plus the
  * decrypt→inflate→interpret pipeline, not a byte replay.
  *
  * The reference never decrypts PDFs itself (it inherits whatever
  * PDF.js handles, content-processor.ts:1489-1520); this builder exists
  * so the Spark-side decode of the dominant real-world case — RC4,
  * owner-password-only, empty user password — is oracle-checked.
  */
object PdfFixture {

  import PdfExtract.{rc4, padPassword, fileKey, objKey, md5, PwPad}

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Algorithm 3: the /O entry. R3 re-digests the first n bytes 50
    * times and applies the 19 XOR-keyed RC4 rounds. */
  def computeO(ownerPw: String, userPw: String, r: Int,
      n: Int): Array[Byte] = {
    var h = md5(padPassword(ownerPw))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(n)); i += 1 }
    }
    val key = h.take(n)
    var o = rc4(key, padPassword(userPw))
    if (r >= 3)
      for (i <- 1 to 19) o = rc4(key.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithms 4 (R2) / 5 (R3): the /U entry for a given file key —
    * R3 appends the spec's 16 bytes of arbitrary padding (zeros). */
  def computeU(fk: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fk, PwPad)
    else {
      var enc = rc4(fk, md5(PwPad, id0))
      for (i <- 1 to 19) enc = rc4(fk.map(b => (b ^ i).toByte), enc)
      enc ++ new Array[Byte](16)
    }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def esc(s: String): String = s.flatMap {
    case '(' => "\\("
    case ')' => "\\)"
    case '\\' => "\\\\"
    case c => c.toString
  }

  /** A one-page encrypted PDF whose content stream shows `words` as two
    * Tj lines (3 + rest), deflated then RC4-encrypted. A non-empty
    * `userPw` makes the empty-password authentication fail — the
    * decoder must fall back to the labeled stub, never emit garbage.
    * `literalOU = true` writes /O and /U as escaped literal strings
    * instead of hex (both spellings occur in the wild). */
  def encryptedPdf(words: Seq[String], r: Int, id0: Array[Byte],
      userPw: String = "", ownerPw: String = "owner",
      literalOU: Boolean = false): Array[Byte] = {
    require(r == 2 || r == 3, s"unsupported revision $r")
    val (l1, l2) = words.splitAt(3)
    val content =
      s"BT /F1 12 Tf 72 200 Td (${esc(l1.mkString(" "))}) Tj " +
        s"0 -20 Td (${esc(l2.mkString(" "))}) Tj ET"
    val p = -44
    val lenBits = if (r == 2) 40 else 128
    val o = computeO(ownerPw, userPw, r, lenBits / 8)
    val fk = fileKey(userPw, o, p, id0, r, lenBits)
    val u = computeU(fk, id0, r)
    val encStream = rc4(objKey(fk, 4, 0), deflate(content.getBytes(Latin1)))
    def str(b: Array[Byte]): String =
      if (literalOU)
        "(" + b.map(x => (x & 0xff).toChar).mkString
          .flatMap {
            case '(' => "\\("
            case ')' => "\\)"
            case '\\' => "\\\\"
            case '\r' => "\\r" // a raw CR would be EOL-normalized
            case c => c.toString
          } + ")"
      else s"<${hex(b)}>"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(Latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${encStream.length} /Filter /FlateDecode >> stream\n")
    out.write(encStream)
    w("\nendstream endobj\n")
    w(s"5 0 obj << /Filter /Standard /V ${if (r == 2) 1 else 2} /R $r " +
      s"/Length $lenBits /O ${str(o)} /U ${str(u)} /P $p >> endobj\n")
    w(s"trailer << /Size 6 /Root 1 0 R /Encrypt 5 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF\n")
    out.toByteArray
  }
}
