package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DocExtract, DocumentConverters}

/** Byte-level tests for the legacy .doc extractor over handcrafted
  * [MS-CFB]/[MS-DOC] fixtures: a piece-table document (compressed
  * CP1252 + UTF-16 pieces behind a Prc block), the fcMin/fcMac legacy
  * fallback, and the stub fallback for non-CFB payloads. */
class DocExtractSpec extends AnyFunSuite {

  private val Utf16 = java.nio.charset.StandardCharsets.UTF_16LE
  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Minimal CFB container: 512-byte sectors, one FAT sector, one
    * directory sector, streams stored in the regular FAT (each padded
    * to >= 4096 bytes so the mini-stream cutoff doesn't apply). */
  private def buildCfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val padded = streams.map { case (n, c) =>
      val size = math.max(c.length, 4096)
      val buf = java.util.Arrays.copyOf(c, ((size + 511) / 512) * 512)
      (n, buf, size)
    }
    val dirSector = 1
    var nextSector = 2
    val starts = padded.map { case (_, buf, _) =>
      val s = nextSector; nextSector += buf.length / 512; s
    }
    val out = new Array[Byte](512 * (nextSector + 1))
    // header
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).zipWithIndex
      .foreach { case (v, i) => out(i) = v.toByte }
    putU16(out, 30, 9)  // 512-byte sectors
    putU16(out, 32, 6)  // 64-byte mini sectors
    putU32(out, 44, 1)  // one FAT sector
    putU32(out, 48, dirSector)
    putU32(out, 56, 4096)         // mini cutoff
    putU32(out, 60, 0xFFFFFFFEL)  // no mini FAT
    putU32(out, 68, 0xFFFFFFFEL)  // no DIFAT chain
    putU32(out, 72, 0)
    putU32(out, 76, 0)            // DIFAT[0]: FAT at sector 0
    (1 until 109).foreach(i => putU32(out, 76 + 4 * i, 0xFFFFFFFFL))
    // FAT (sector 0)
    val fatOff = 512
    (0 until 128).foreach(k => putU32(out, fatOff + 4 * k, 0xFFFFFFFFL))
    putU32(out, fatOff, 0xFFFFFFFDL)                  // FAT marks itself
    putU32(out, fatOff + 4 * dirSector, 0xFFFFFFFEL)  // one dir sector
    padded.zip(starts).foreach { case ((_, buf, _), s) =>
      val n = buf.length / 512
      (0 until n).foreach { k =>
        putU32(out, fatOff + 4 * (s + k),
          if (k == n - 1) 0xFFFFFFFEL else (s + k + 1).toLong)
      }
    }
    // directory (sector 1)
    def dirEntry(idx: Int, name: String, typ: Int, start: Long,
        size: Long): Unit = {
      val off = 512 * (dirSector + 1) + 128 * idx
      val nb = name.getBytes(Utf16)
      System.arraycopy(nb, 0, out, off, nb.length)
      putU16(out, off + 64, nb.length + 2)
      out(off + 66) = typ.toByte
      putU32(out, off + 116, start)
      putU32(out, off + 120, size)
    }
    dirEntry(0, "Root Entry", 5, 0xFFFFFFFEL, 0)
    padded.zip(starts).zipWithIndex.foreach {
      case (((name, _, size), s), i) => dirEntry(i + 1, name, 2, s, size) }
    // stream payloads
    padded.zip(starts).foreach { case ((_, buf, _), s) =>
      System.arraycopy(buf, 0, out, 512 * (s + 1), buf.length) }
    out
  }

  /** WordDocument stream skeleton: wIdent + table-stream flag. */
  private def fibSkeleton(): Array[Byte] = {
    val wd = new Array[Byte](4096)
    putU16(wd, 0, 0xA5EC)
    putU16(wd, 0x0A, 0) // fWhichTblStm = 0 → "0Table"
    wd
  }

  test("piece-table doc: CP1252 + UTF-16 pieces, Prc skip, control-char cleanup") {
    val wd = fibSkeleton()
    // piece 1: compressed CP1252 at byte offset 1024 — includes the
    // 0x99 high byte (™) and two paragraph marks
    val t1 = "Hello legacy Word.".getBytes(Ascii) ++
      Array(0x99.toByte, '\r'.toByte, '\r'.toByte)
    System.arraycopy(t1, 0, wd, 1024, t1.length)
    // piece 2: UTF-16LE at byte offset 2048 with non-Latin characters
    val s2 = "Ünïcode – pièce"
    val t2 = s2.getBytes(Utf16)
    System.arraycopy(t2, 0, wd, 2048, t2.length)
    // Clx in the 0Table stream at offset 64: a 4-byte Prc property
    // block first (the parser must skip it), then the Pcdt
    val tbl = new Array[Byte](4096)
    var p = 64
    tbl(p) = 0x01
    putU16(tbl, p + 1, 4) // grpprl size
    p += 3 + 4
    tbl(p) = 0x02
    val n = 2
    val lcbPlc = 4 * (n + 1) + 8 * n
    putU32(tbl, p + 1, lcbPlc)
    val plc = p + 5
    putU32(tbl, plc, 0)
    putU32(tbl, plc + 4, t1.length.toLong)
    putU32(tbl, plc + 8, (t1.length + s2.length).toLong)
    val pcds = plc + 4 * (n + 1)
    putU32(tbl, pcds + 2, (1024L * 2) | (1L << 30)) // compressed: fc = 2*off
    putU32(tbl, pcds + 8 + 2, 2048L)                // utf-16: fc = off
    val clxLen = (p + 5 + lcbPlc) - 64
    putU32(wd, 0x01A2, 64)
    putU32(wd, 0x01A6, clxLen.toLong)
    val doc = buildCfb(Seq("WordDocument" -> wd, "0Table" -> tbl))
    val md = DocExtract.docToMarkdown("docs/report.doc", doc)
    assert(md.contains(
      "# report\n\nHello legacy Word.™\n\nÜnïcode – pièce"))
  }

  test("legacy fcMin/fcMac doc without a piece table") {
    val wd = fibSkeleton()
    val body = "Plain old body text.\rSecond paragraph.".getBytes(Ascii)
    System.arraycopy(body, 0, wd, 1024, body.length)
    putU32(wd, 24, 1024L)                  // fcMin
    putU32(wd, 28, 1024L + body.length)    // fcMac
    val doc = buildCfb(Seq("WordDocument" -> wd)) // no table stream at all
    val md = DocExtract.docToMarkdown("memo.doc", doc)
    assert(md.contains(
      "# memo\n\nPlain old body text.\nSecond paragraph."))
  }

  test("non-CFB and truncated payloads fall back to the labeled stub") {
    assert(DocExtract.docToMarkdown("x.doc", "not a doc".getBytes).isEmpty)
    assert(DocExtract.docToMarkdown("x.doc", Array.empty[Byte]).isEmpty)
    val viaDispatcher = DocumentConverters
      .convertFileToMarkdown("x.doc", "garbage".getBytes).get
    assert(viaDispatcher.contains("stub-extracted"))
  }

  test("fEncrypted doc bails to the stub even with a valid piece table") {
    import graft.sources.DocFixture
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    val clear = DocFixture.pieceTableDoc(words.take(6), words.drop(6))
    assert(DocExtract.docToMarkdown("f.doc", clear).get ==
      "# f\n\nalpha beta gamma delta epsilon zeta\neta theta")
    // same container, fEncrypted set: the piece table is still present
    // and would decode — the flag alone must force the stub route
    val enc = DocFixture.pieceTableDoc(words.take(6), words.drop(6),
      encrypted = true)
    assert(DocExtract.docToMarkdown("f.doc", enc).isEmpty)
    assert(DocumentConverters.convertFileToMarkdown("f.doc", enc).get
      .contains("stub-extracted"))
    // single-piece shape (few words) and the legacy builder round-trip
    val one = DocFixture.pieceTableDoc(Seq("solo", "words"), Seq.empty)
    assert(DocExtract.docToMarkdown("s.doc", one).get ==
      "# s\n\nsolo words")
    val legacy = DocFixture.legacyDoc(words)
    assert(DocExtract.docToMarkdown("l.doc", legacy).get ==
      "# l\n\nalpha beta gamma delta epsilon zeta eta theta")
  }

  test("fast-saved doc: fComplex, out-of-order pieces, Prc blocks, " +
      "ccpText excludes the header section") {
    import graft.sources.DocFixture
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    // 12 words: two paragraphs (first 8 / last 4); the middle third of
    // the text physically lives at offset 3072 — AFTER the tail at
    // ~1024 — and the trailing header piece must not leak into the body
    val md = DocExtract.docToMarkdown("fs.doc", DocFixture.fastSavedDoc(words))
    assert(md.contains("# fs\n\nalpha beta gamma delta epsilon zeta " +
      "eta theta\niota kappa lambda mu"))
    assert(!md.get.contains("Running header"))
    // short doc: single paragraph through the same scattered layout
    val short = DocExtract.docToMarkdown("s.doc",
      DocFixture.fastSavedDoc(words.take(5)))
    assert(short.contains("# s\n\nalpha beta gamma delta epsilon"))
    assert(!short.get.contains("Running header"))
    // the dispatcher route is the production path
    val via = DocumentConverters.convertFileToMarkdown("d/fs.doc",
      DocFixture.fastSavedDoc(words)).get
    assert(via.startsWith("# fs\n\nalpha beta"))
  }

  test("ccpText truncation only applies when recorded (>0)") {
    import graft.sources.DocFixture
    // pieceTableDoc leaves ccpText = 0: the full piece-table text stays
    val full = DocExtract.docToMarkdown("p.doc",
      DocFixture.pieceTableDoc(Seq("one", "two"), Seq("three")))
    assert(full.contains("# p\n\none two\nthree"))
  }

  test("dispatcher routes a real .doc through the byte decoder") {
    val wd = fibSkeleton()
    val body = "Dispatcher path works.".getBytes(Ascii)
    System.arraycopy(body, 0, wd, 1024, body.length)
    putU32(wd, 24, 1024L)
    putU32(wd, 28, 1024L + body.length)
    val doc = buildCfb(Seq("WordDocument" -> wd))
    val md = DocumentConverters.convertFileToMarkdown("a/b/note.doc", doc).get
    assert(md == "# note\n\nDispatcher path works.")
  }

  test("RC4-encrypted doc: the right password decrypts to the clear-" +
      "text markdown; wrong/no password and tampering stay stubbed") {
    import graft.sources.DocFixture
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    val clearMd = DocExtract.docToMarkdown("e.doc",
      DocFixture.pieceTableDoc(words.take(6), words.drop(6))).get
    val enc = DocFixture.rc4EncryptedDoc(words.take(6), words.drop(6),
      "open sesame")
    // ciphertext really differs from plaintext where the body lives
    assert(DocExtract.docToMarkdown("e.doc", enc,
      Seq("open sesame")).contains(clearMd))
    // password list semantics: tried in order, wrong ones don't open
    assert(DocExtract.docToMarkdown("e.doc", enc,
      Seq("nope", "open sesame")).contains(clearMd))
    assert(DocExtract.docToMarkdown("e.doc", enc, Seq("nope")).isEmpty)
    assert(DocExtract.docToMarkdown("e.doc", enc).isEmpty)
    // dispatcher overload threads the password through
    assert(DocumentConverters.convertFileToMarkdown("e.doc", enc,
      Seq("open sesame")).get == clearMd)
    assert(DocumentConverters.convertFileToMarkdown("e.doc", enc).get
      .contains("stub-extracted"))
    // a flipped bit in the verifier hash must fail authentication
    // (tbl stream: header bytes live at sector offsets; flip inside
    // the encrypted container copy of encVerifierHash)
    val tampered = enc.clone()
    // locate the 0Table stream content: find its salt by scanning for
    // the version (1,1) header start in the container
    val salt = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-doc-salt:${words.mkString(" ")}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hdrAt = tampered.indices.find(i =>
      i + 20 <= tampered.length && tampered(i) == 1 && tampered(i + 1) == 0 &&
        tampered(i + 2) == 1 && tampered(i + 3) == 0 &&
        (0 until 16).forall(k => tampered(i + 4 + k) == salt(k))).get
    tampered(hdrAt + 36) = (tampered(hdrAt + 36) ^ 0x01).toByte
    assert(DocExtract.docToMarkdown("e.doc", tampered,
      Seq("open sesame")).isEmpty)
  }

  test("fObfuscated (legacy XOR) doc: verifier-matched password " +
      "de-obfuscates to the clear-text markdown") {
    import graft.sources.{DocFixture, OfficeCrypto}
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    val clearMd = DocExtract.docToMarkdown("o.doc",
      DocFixture.pieceTableDoc(words.take(6), words.drop(6))).get
    val obf = DocFixture.xorObfuscatedDoc(words.take(6), words.drop(6),
      "open sesame")
    // the body bytes really are obfuscated in the container
    assert(!new String(obf, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("alpha beta"))
    assert(DocExtract.docToMarkdown("o.doc", obf,
      Seq("open sesame")).contains(clearMd))
    // password list semantics: tried in order, wrong ones don't match
    assert(DocExtract.docToMarkdown("o.doc", obf,
      Seq("nope", "open sesame")).contains(clearMd))
    assert(DocExtract.docToMarkdown("o.doc", obf, Seq("nope")).isEmpty)
    assert(DocExtract.docToMarkdown("o.doc", obf).isEmpty)
    // dispatcher overload threads the password through
    assert(DocumentConverters.convertFileToMarkdown("o.doc", obf,
      Seq("open sesame")).get == clearMd)
    assert(DocumentConverters.convertFileToMarkdown("o.doc", obf).get
      .contains("stub-extracted"))
    // tamper: flip one bit in the stored verifier (lKey at FibBase
    // offset 0x0E, located via the stream's 0xA5EC magic) —
    // authentication must fail though the streams would still decode
    val tampered = obf.clone()
    val at = tampered.indices.find(i =>
      i + 2 <= tampered.length &&
        (tampered(i) & 0xff) == 0xEC && (tampered(i + 1) & 0xff) == 0xA5).get
    tampered(at + 0x0E) = (tampered(at + 0x0E) ^ 0x01).toByte
    assert(DocExtract.docToMarkdown("o.doc", tampered,
      Seq("open sesame")).isEmpty)
  }

  test("XOR derivation kernels: spec tables and verifier invariants") {
    import graft.sources.OfficeCrypto
    // verifier is 16-bit, deterministic, and password-sensitive
    val v = OfficeCrypto.xorVerifier("open sesame")
    assert(v == OfficeCrypto.xorVerifier("open sesame"))
    assert((v & 0xFFFF) == v)
    assert(v != OfficeCrypto.xorVerifier("open sesamf"))
    assert(OfficeCrypto.xorVerifier("") == 0)
    // the obfuscation array is 16 bytes and password-dependent
    val a1 = OfficeCrypto.xorArray("open sesame")
    val a2 = OfficeCrypto.xorArray("different")
    assert(a1.length == 16 && !a1.sameElements(a2))
    // xorCrypt round-trips at arbitrary prefixes and across the
    // 512-byte block boundary where the index rotation kicks in
    val rnd = new scala.util.Random(3)
    val data = Array.fill(1500)(rnd.nextInt().toByte)
    val enc = OfficeCrypto.xorCrypt(data, a1, 0x44, decode = false)
    assert(!enc.sameElements(data))
    assert(enc.take(0x44).sameElements(data.take(0x44))) // clear prefix
    val dec = OfficeCrypto.xorCrypt(enc, a1, 0x44, decode = true)
    assert(dec.sameElements(data))
    // bytes in different 512-blocks at the same offset-mod-16 get
    // different array elements (the per-block rotation)
    val zeros = new Array[Byte](1024)
    val ez = OfficeCrypto.xorCrypt(zeros, a1, 0, decode = false)
    assert((0 until 16).exists(i => ez(i) != ez(512 + i)))
  }
}
