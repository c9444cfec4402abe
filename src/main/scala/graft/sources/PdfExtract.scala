package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal dependency-free PDF text extraction — the byte-level decode
  * step in front of `DocumentConverters.pdfPageText`/`pdfMarkdown`
  * (the reference delegates this to PDF.js, content-processor.ts:
  * 1489-1520; this build extracts the same (str, width, y) text runs
  * directly from the PDF object graph).
  *
  * Supported: the format core that text-bearing PDFs actually use —
  * object scanning (`N G obj … endobj`) plus /ObjStm object-stream
  * expansion (PDF 1.5+ packed dictionaries), page-tree ordering via
  * /Pages /Kids with a document-order fallback, /Contents streams
  * (direct or array), FlateDecode via java.util.zip (the JVM ships the
  * codec), LZWDecode (the spec's TIFF-flavored variant, implemented in
  * [[lzwDecode]]), the FULL standard-security-handler encryption
  * matrix with an empty user password — RC4 (V 1-2 / R 2-3, Algorithm
  * 2 key derivation + Algorithm 4/5 /U authentication + Algorithm 1
  * per-object keys), AES-128-CBC (V 4 / R 4, /AESV2), and AES-256
  * (V 5 / R 5-6, /AESV3: the R6 hardened hash, /UE file-key unwrap) —
  * the owner-password-only protection that dominates real doc corpora;
  * /ToUnicode CMap remapping for subset/CID fonts (bfchar + bfrange,
  * 1- and 2-byte codespaces, tracked per Tf font — the raw
  * show-string bytes of a subsetted font are gibberish without it);
  * and the BT…ET text operators (Tf, Td, TD, Tm, T-star, TL, Tj, TJ,
  * quote forms). Out of scope (falls back to the labeled stub
  * upstream): non-empty user passwords (never guessed —
  * authentication failure gates to the stub rather than emitting
  * decrypt garbage), JBIG2/JPX image filters, CID fonts WITHOUT a
  * /ToUnicode table — the run text for those is the font's raw
  * bytes.
  *
  * Runs inside per-row kernels: no state, no I/O, executor-safe.
  */
object PdfExtract {

  import DocumentConverters.PdfRun

  /** One parsed indirect object: number, generation, raw
    * dictionary/body text (ISO-8859-1 so offsets == byte offsets),
    * optional stream bytes. */
  private final case class PdfObj(num: Int, gen: Int, body: String,
      stream: Option[Array[Byte]])

  private def latin1(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

  private val ObjRe =
    """(?s)(\d+)\s+(\d+)\s+obj\b(.*?)endobj""".r
  private val StreamRe =
    """(?s)stream\r?\n(.*?)\r?\nendstream""".r
  private val StreamStartRe = """stream\r?\n""".r
  private val KidsRe = """/Kids\s*\[([^\]]*)\]""".r
  private val RefRe = """(\d+)\s+\d+\s+R""".r
  private val ContentsRefRe = """/Contents\s+(\d+)\s+\d+\s+R""".r
  private val ContentsArrRe = """/Contents\s*\[([^\]]*)\]""".r

  /** Stream bytes of one object body. Primary: slice exactly /Length
    * bytes after the `stream` keyword and confirm `endstream` follows —
    * the delimiter scan alone silently EATS a trailing 0x0D byte (the
    * `\r?\n` before endstream), which corrupts any binary stream whose
    * ciphertext happens to end in CR (1/256 of AES streams). Fallback
    * (no /Length, an indirect /Length ref, or a fixture whose claimed
    * length is wrong): the non-greedy endstream scan. */
  private def streamBytes(body: String): Option[Array[Byte]] =
    StreamStartRe.findFirstMatchIn(body).flatMap { sm =>
      val start = sm.end
      // (?![0-9]...) pins the full digit run: without it, backtracking
      // on '/Length 15 0 R' shrinks the group to '1' so the indirect-
      // ref rejection lookahead vacuously passes
      val sliced = for {
        lm <- """/Length\s+(\d+)(?![0-9]|\s+\d+\s+R)""".r
          .findFirstMatchIn(body.substring(0, sm.start))
        n = lm.group(1).toInt
        if start + n <= body.length
        rest = body.substring(start + n,
          math.min(body.length, start + n + 16))
        if rest.dropWhile(c => c == '\r' || c == '\n' || c == ' ')
          .startsWith("endstream")
      } yield body.substring(start, start + n)
      sliced.orElse(StreamRe.findFirstMatchIn(body)
        .map(m => body.substring(m.start(1), m.end(1))))
        .map(_.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }

  private def parseObjects(text: String): Map[Int, PdfObj] = {
    ObjRe.findAllMatchIn(text).map { m =>
      val body = m.group(3)
      val num = m.group(1).toInt
      num -> PdfObj(num, m.group(2).toInt, body, streamBytes(body))
    }.toMap
  }

  /** Expand /Type /ObjStm object streams (PDF 1.5+): modern writers
    * pack page/font/resource DICTIONARIES inside compressed object
    * streams, invisible to the top-level `N G obj` scan. Layout: after
    * filter decode, /N pairs of "objnum offset" integers, then the
    * object bodies starting at /First. Embedded objects carry no
    * streams and generation 0; a top-level object with the same number
    * wins (the scanner's equivalent of xref precedence). Runs AFTER
    * decryption — an encrypted document encrypts the ObjStm container
    * itself, and its embedded strings are NOT separately encrypted. */
  private def expandObjStm(objs: Map[Int, PdfObj]): Map[Int, PdfObj] = {
    val embedded = objs.values
      .filter(o => """/Type\s*/ObjStm\b""".r.findFirstIn(o.body).isDefined)
      .flatMap { o =>
        // per-container guard: ONE corrupt ObjStm (negative /First, a
        // garbage-decoded header with an unparseable digit run) must
        // skip only itself — reaching extractRuns' blanket catch would
        // collapse the whole document, losing top-level pages that
        // decode fine
        try expandOne(o) catch { case _: Exception => Seq.empty }
      }.toMap
    embedded ++ objs // top-level wins on number collision
  }

  private def expandOne(o: PdfObj): Seq[(Int, PdfObj)] =
    (for {
      n <- intEntry(o.body, "N")
      first <- intEntry(o.body, "First")
      bytes <- contentBytes(o)
      text = latin1(bytes)
      if first >= 0 && first <= text.length
    } yield {
      val pairs = """\d+""".r.findAllIn(text.substring(0, first))
        .map(_.toInt).grouped(2)
        .collect { case Seq(num, off) => (num, off) }
        .take(n).toSeq
      pairs.zipWithIndex.map { case ((num, off), i) =>
        val start = math.min(text.length, first + off)
        val end =
          if (i + 1 < pairs.length)
            math.min(text.length, math.max(start, first + pairs(i + 1)._2))
          else text.length
        num -> PdfObj(num, 0, text.substring(start, end), None)
      }
    }).getOrElse(Seq.empty)

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

  /** ASCIIHexDecode: hex pairs, whitespace ignored, `>` is EOD, an odd
    * trailing digit is padded with 0. */
  private[graft] def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val s = latin1(data)
      val end = s.indexOf('>')
      val hex = (if (end < 0) s else s.substring(0, end))
        .filter(c => Character.digit(c, 16) >= 0)
      val padded = if (hex.length % 2 == 1) hex + "0" else hex
      Some(padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
    } catch { case _: Exception => None }

  /** ASCII85Decode: 5 chars ('!'..'u') → 4 bytes base-85, 'z' = four
    * zero bytes, `~>` is EOD, partial final group keeps n-1 bytes. */
  private[graft] def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val s = latin1(data)
      val end = s.indexOf("~>")
      val body = if (end < 0) s else s.substring(0, end)
      val out = new java.io.ByteArrayOutputStream(body.length)
      var tuple = 0L
      var count = 0
      var i = 0
      var bad = false
      while (i < body.length && !bad) {
        val c = body.charAt(i)
        if (c == 'z' && count == 0) out.write(Array[Byte](0, 0, 0, 0))
        else if (c >= '!' && c <= 'u') {
          tuple = tuple * 85 + (c - '!')
          count += 1
          if (count == 5) {
            out.write(Array(
              (tuple >> 24).toByte, (tuple >> 16).toByte,
              (tuple >> 8).toByte, tuple.toByte))
            tuple = 0; count = 0
          }
        } else if (!c.isWhitespace) bad = true // corrupt char
        i += 1
      }
      if (bad) return None
      if (count > 0) {
        // pad with 'u' (84) and keep count-1 bytes
        var t = tuple
        var k = count
        while (k < 5) { t = t * 85 + 84; k += 1 }
        val bytes = Array(
          (t >> 24).toByte, (t >> 16).toByte, (t >> 8).toByte, t.toByte)
        out.write(bytes, 0, count - 1)
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** PNG predictor unfiltering ([PDF 32000-1:2008 §7.4.4.4] /Predictor
    * >= 10, the layout real writers use for ObjStm and XRef Flate
    * streams): each row is one filter-type byte + rowBytes data bytes;
    * types None/Sub/Up/Average/Paeth reconstruct against the previous
    * byte/row exactly as in PNG. `bpp` is the byte distance of the
    * "left" neighbor (1 for the 8-bit single-component streams PDF
    * uses predictors on). */
  private[graft] def pngUnpredict(data: Array[Byte], rowBytes: Int,
      bpp: Int): Option[Array[Byte]] =
    try {
      if (rowBytes <= 0 || data.length % (rowBytes + 1) != 0) return None
      val rows = data.length / (rowBytes + 1)
      val out = new Array[Byte](rows * rowBytes)
      var r = 0
      while (r < rows) {
        val ft = data(r * (rowBytes + 1)) & 0xff
        val src = r * (rowBytes + 1) + 1
        val dst = r * rowBytes
        var i = 0
        while (i < rowBytes) {
          val raw = data(src + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = if (r > 0) out(dst - rowBytes + i) & 0xff else 0
          val upLeft =
            if (r > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xff
            else 0
          val v = ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + (left + up) / 2
            case 4 =>
              val p = left + up - upLeft
              val pa = math.abs(p - left)
              val pb = math.abs(p - up)
              val pc = math.abs(p - upLeft)
              raw + (if (pa <= pb && pa <= pc) left
                     else if (pb <= pc) up else upLeft)
            case _ => return None // unknown filter type
          }
          out(dst + i) = v.toByte
          i += 1
        }
        r += 1
      }
      Some(out)
    } catch { case _: Exception => None }

  /** Decode a stream through its FULL filter chain — /Filter may be a
    * single name or an array applied in order (e.g.
    * `[/ASCII85Decode /FlateDecode]`: 85-decode first, then inflate).
    * An unknown or failing filter STOPS the chain and returns what has
    * been decoded so far — later filters must not run on undecoded
    * bytes (ASCIIHex in particular "succeeds" on nearly any input and
    * would mangle them irreversibly). A /DecodeParms PNG predictor
    * (>= 10) unfilters after its Flate/LZW stage; TIFF predictor 2 and
    * a failing unpredict stop the chain (never emit half-decoded
    * rows). */
  private def contentBytes(obj: PdfObj): Option[Array[Byte]] =
    obj.stream.map { raw =>
      val filters: Seq[String] =
        """/Filter\s*\[([^\]]*)\]""".r.findFirstMatchIn(obj.body) match {
          case Some(arr) =>
            """/(\w+)""".r.findAllMatchIn(arr.group(1))
              .map(_.group(1)).toSeq
          case None =>
            """/Filter\s*/(\w+)""".r.findFirstMatchIn(obj.body)
              .map(_.group(1)).toSeq
        }
      val predictor = intEntry(obj.body, "Predictor").getOrElse(1)
      val columns = intEntry(obj.body, "Columns").getOrElse(1)
      val colors = intEntry(obj.body, "Colors").getOrElse(1)
      val bpc = intEntry(obj.body, "BitsPerComponent").getOrElse(8)
      val bpp = math.max(1, colors * bpc / 8)
      val rowBytes = math.max(1, columns * colors * bpc / 8)
      def unpredict(d: Array[Byte]): Option[Array[Byte]] =
        if (predictor >= 10) pngUnpredict(d, rowBytes, bpp)
        else if (predictor == 1) Some(d)
        else None // TIFF predictor 2: not emitted by PDF writers we target
      var data = raw
      var stopped = false
      filters.foreach { f =>
        if (!stopped) (f match {
          case "FlateDecode"    => inflate(data).flatMap(unpredict)
          case "LZWDecode"      => lzwDecode(data).flatMap(unpredict)
          case "ASCIIHexDecode" => asciiHexDecode(data)
          case "ASCII85Decode"  => ascii85Decode(data)
          case _                => None // JBIG2/JPX/DCT: not text-bearing
        }) match {
          case Some(d) => data = d
          case None    => stopped = true
        }
      }
      data
    }

  // ── Standard security handler (RC4, [PDF 32000-1:2008 §7.6.3]) ───────

  /** The spec's 32-byte password pad ([PDF 32000-1:2008] Table 21 /
    * Algorithm 2 step a). */
  private[graft] val PwPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private[graft] def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  /** Plain RC4 (both directions — the cipher is symmetric). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + (s(i) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s(((s(i) & 0xff) + (s(j) & 0xff)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** Password truncated/padded to exactly 32 bytes with [[PwPad]]. */
  private[graft] def padPassword(pw: String): Array[Byte] = {
    val pb = pw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      .take(32)
    pb ++ PwPad.take(32 - pb.length)
  }

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2: the file encryption key from the (padded) user
    * password, /O, /P (as signed little-endian 32-bit), and the first
    * document ID; R3+ re-digests the first n bytes 50 times; R4 with
    * /EncryptMetadata false appends FFFFFFFF to the first digest. */
  private[graft] def fileKey(userPw: String, o: Array[Byte], p: Int,
      id0: Array[Byte], r: Int, lenBits: Int,
      encryptMetadata: Boolean = true): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, lenBits / 8))
    val noMeta: Array[Byte] =
      if (r >= 4 && !encryptMetadata) Array(-1, -1, -1, -1)
      else Array.emptyByteArray
    var h = md5(padPassword(userPw), o.take(32), le32(p), id0, noMeta)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(n)); i += 1 }
    }
    h.take(n)
  }

  /** Algorithm 1: the per-object key — MD5(file key ++ objNum low 3
    * bytes LE ++ gen low 2 bytes LE [++ "sAlT" for AESV2]), first
    * min(n+5, 16) bytes. */
  private[graft] def objKey(fk: Array[Byte], num: Int, gen: Int,
      aes: Boolean = false): Array[Byte] =
    md5(fk, Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte),
      if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
      else Array.emptyByteArray)
      .take(math.min(fk.length + 5, 16))

  /** Raw AES-CBC, no padding added or stripped — the building block
    * for stream decrypt, /UE key unwrap, and the R6 hardened hash. */
  private[graft] def aesCbc(key: Array[Byte], iv: Array[Byte],
      data: Array[Byte], encrypt: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** AESV2/V3 stream layout: a 16-byte IV prefix, then AES-CBC
    * ciphertext with PKCS#7 padding (javax.crypto ships in the JDK;
    * the key length selects AES-128 vs AES-256). */
  private[graft] def aesDecrypt(key: Array[Byte],
      data: Array[Byte]): Option[Array[Byte]] =
    try {
      if (data.length < 32 || data.length % 16 != 0) return None
      val plain = aesCbc(key, data.take(16), data.drop(16), encrypt = false)
      val pad = plain.last & 0xff
      if (pad < 1 || pad > 16 || pad > plain.length) None
      else Some(plain.dropRight(pad))
    } catch { case _: Exception => None }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance(alg)
    parts.foreach(md.update)
    md.digest()
  }

  /** AES-256 password hash ([PDF 32000-2] Algorithms 2.A/2.B): R5 is a
    * plain SHA-256(pw ++ salt ++ udata); R6 iterates the hardened
    * loop — 64 repetitions of (pw ++ K ++ udata) AES-CBC-encrypted
    * under K's halves, the digest algorithm chosen by the ciphertext
    * mod 3, until round >= 64 and the last ciphertext byte permits
    * exit. Always 32 bytes. */
  private[graft] def hash256(pw: Array[Byte], salt: Array[Byte],
      udata: Array[Byte], r: Int): Array[Byte] = {
    var k = sha("SHA-256", pw, salt, udata)
    if (r <= 5) return k
    var round = 0
    var done = false
    while (!done) {
      val k1 = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < 64) { k1.write(pw); k1.write(k); k1.write(udata); i += 1 }
      val e = aesCbc(k.take(16), k.slice(16, 32), k1.toByteArray,
        encrypt = true)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = sha(
        if (mod == 0) "SHA-256" else if (mod == 1) "SHA-384" else "SHA-512",
        e)
      round += 1
      done = round >= 64 && (e.last & 0xff) <= round - 32
    }
    k.take(32)
  }

  /** Algorithms 4 (R2) / 5 (R3): does the /U entry authenticate this
    * file key? R3 compares the meaningful first 16 bytes. */
  private[graft] def userPwAuthenticates(fk: Array[Byte], u: Array[Byte],
      id0: Array[Byte], r: Int): Boolean =
    if (r == 2) java.util.Arrays.equals(rc4(fk, PwPad), u.take(32))
    else {
      var enc = rc4(fk, md5(PwPad, id0))
      var i = 1
      while (i <= 19) {
        enc = rc4(fk.map(b => (b ^ i).toByte), enc); i += 1
      }
      java.util.Arrays.equals(enc, u.take(16))
    }

  private def hexBytes(s: String): Array[Byte] = {
    val hex = s.filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  /** Integer entry of a parsed dictionary body (`/V 2`, `/P -44`). The
    * lookahead keeps `/V` from matching inside longer names. */
  private def intEntry(body: String, name: String): Option[Int] =
    ("/" + name + """(?![A-Za-z])\s*(-?\d+)""").r
      .findFirstMatchIn(body).map(_.group(1).toInt)

  /** String entry as exact bytes: hex `<…>` or escaped literal `(…)`
    * (byte-exact through the latin1 mapping). */
  private def stringEntry(body: String, name: String): Option[Array[Byte]] =
    ("/" + name + """(?![A-Za-z])\s*""").r.findFirstMatchIn(body)
      .flatMap { m =>
        val i = m.end
        if (i >= body.length) None
        else if (body.charAt(i) == '<') {
          val end = body.indexOf('>', i + 1)
          if (end < 0) None
          else Some(hexBytes(body.substring(i + 1, end)))
        } else if (body.charAt(i) == '(') {
          var depth = 0
          var j = i
          val sb = new StringBuilder
          var done = false
          while (j < body.length && !done) {
            val c = body.charAt(j)
            if (c == '\\' && j + 1 < body.length) {
              sb.append(c).append(body.charAt(j + 1)); j += 2
            } else if (c == '(') {
              if (depth > 0) sb.append(c); depth += 1; j += 1
            } else if (c == ')') {
              depth -= 1
              if (depth == 0) done = true else sb.append(c)
              j += 1
            } else { sb.append(c); j += 1 }
          }
          if (!done) None
          else Some(unescape(sb.toString)
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        } else None
      }

  private sealed trait CryptState
  private case object Plain extends CryptState
  private case object Undecryptable extends CryptState
  /** `aes`: AES-CBC streams (else RC4); `perObject`: Algorithm-1
    * object keys (V≤4) vs the file key used directly (V5). */
  private final case class Keyed(fk: Array[Byte], aes: Boolean,
      perObject: Boolean) extends CryptState

  /** V5 (AES-256) empty-user-password authentication + key unwrap
    * ([PDF 32000-2] Algorithm 2.A): /U = hash(32) ++ validation
    * salt(8) ++ key salt(8); validate SHA-based hash against the
    * leading 32 bytes, then unwrap the 32-byte file key from /UE with
    * AES-256-CBC under the intermediate key (zero IV, no padding). */
  private def v5Key(body: String, r: Int): Option[Array[Byte]] =
    for {
      u <- stringEntry(body, "U") if u.length >= 48
      ue <- stringEntry(body, "UE") if ue.length >= 32
      hash = hash256(Array.emptyByteArray, u.slice(32, 40),
        Array.emptyByteArray, r)
      if java.util.Arrays.equals(hash, u.take(32))
      ikey = hash256(Array.emptyByteArray, u.slice(40, 48),
        Array.emptyByteArray, r)
      fk <- (try Some(aesCbc(ikey, new Array[Byte](16), ue.take(32),
        encrypt = false))
      catch { case _: Exception => None })
    } yield fk

  /** /Encrypt detection + empty-user-password authentication.
    * Supported: the standard handler — V 1-2 / R 2-3 (RC4), V 4 / R 4
    * with an /AESV2 crypt filter (AES-128-CBC, the PDF-1.6 default),
    * V 4 / R 4 with an /Identity STREAM filter (streams stored in the
    * clear — authenticated, then read as plaintext), and V 5 / R 5-6
    * with /AESV3 (AES-256, PDF 2.0: hardened hash, /UE key unwrap).
    * Everything else — a real user password, custom/public-key crypt
    * filters, malformed entries — is Undecryptable: the caller falls
    * back to the labeled stub instead of emitting garbage. */
  private def cryptState(text: String, objs: Map[Int, PdfObj]): CryptState = {
    val ref = """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(text)
    if (ref.isEmpty) return Plain
    val id0 = """/ID\s*\[\s*<([0-9A-Fa-f\s]*)>""".r.findFirstMatchIn(text)
      .map(m => hexBytes(m.group(1))).getOrElse(Array.emptyByteArray)
    val state = for {
      enc <- objs.get(ref.get.group(1).toInt)
      if """/Filter\s*/Standard\b""".r.findFirstIn(enc.body).isDefined
      r <- intEntry(enc.body, "R")
      v = intEntry(enc.body, "V").getOrElse(0)
      keyed <-
        if (v == 5 && (r == 5 || r == 6) &&
          """/CFM\s*/AESV3\b""".r.findFirstIn(enc.body).isDefined &&
          """/StmF\s*/StdCF\b""".r.findFirstIn(enc.body).isDefined)
          v5Key(enc.body, r).map(Keyed(_, aes = true, perObject = false))
        else if (v == 4 && r == 4 &&
          """/StmF\s*/Identity\b""".r.findFirstIn(enc.body).isDefined)
          // Identity stream crypt filter ([PDF 32000-1] §7.6.5, Table
          // 25): stream data passes through UNdecrypted even though the
          // document carries an /Encrypt dictionary (only strings /
          // embedded files use the named filter). The extractor
          // consumes stream content exclusively, so after the usual
          // empty-user-password authentication the file reads as
          // plaintext — without the auth gate a user-password-locked
          // Identity file would leak past the stub contract.
          for {
            o <- stringEntry(enc.body, "O") if o.length >= 32
            u <- stringEntry(enc.body, "U") if u.length >= 16
            p <- intEntry(enc.body, "P")
            fk = fileKey("", o, p, id0, r, 128,
              !"""/EncryptMetadata\s+false\b""".r
                .findFirstIn(enc.body).isDefined)
            if userPwAuthenticates(fk, u, id0, r)
          } yield Plain
        else if ((v <= 2 && (r == 2 || r == 3)) ||
          (v == 4 && r == 4 &&
            """/CFM\s*/AESV2\b""".r.findFirstIn(enc.body).isDefined &&
            """/StmF\s*/StdCF\b""".r.findFirstIn(enc.body).isDefined))
          for {
            o <- stringEntry(enc.body, "O") if o.length >= 32
            u <- stringEntry(enc.body, "U")
            if u.length >= (if (r == 2) 32 else 16)
            p <- intEntry(enc.body, "P")
            encryptMetadata = !"""/EncryptMetadata\s+false\b""".r
              .findFirstIn(enc.body).isDefined
            // R4 keys are always 128-bit; parsing /Length would be
            // ambiguous anyway (the nested /CF dict carries /Length 16)
            lenBits = if (r == 4) 128
              else intEntry(enc.body, "Length").getOrElse(40)
            fk = fileKey("", o, p, id0, r, lenBits, encryptMetadata)
            if userPwAuthenticates(fk, u, id0, r)
          } yield Keyed(fk, aes = r == 4, perObject = true)
        else None
    } yield keyed
    state.getOrElse(Undecryptable)
  }

  /** Decrypt every object's stream (decrypt happens BEFORE filter
    * decode, matching the writer's compress-then-encrypt order); AES
    * streams carry their IV prefix and PKCS#7 padding; V5 uses the
    * file key for every stream, V≤4 the Algorithm-1 object key.
    * Strings inside content streams come decrypted for free; top-level
    * strings are not consumed by the extractor. */
  private def decryptStreams(objs: Map[Int, PdfObj],
      fk: Array[Byte], aes: Boolean, perObject: Boolean): Map[Int, PdfObj] =
    objs.map { case (n, o) =>
      n -> o.copy(stream = o.stream.map { s =>
        val k = if (perObject) objKey(fk, o.num, o.gen, aes) else fk
        if (aes) aesDecrypt(k, s).getOrElse(Array.emptyByteArray)
        else rc4(k, s)
      })
    }

  // ── /ToUnicode CMaps (CID / subset-font remapping) ───────────────────

  /** A parsed /ToUnicode CMap: show-string bytes group into
    * `codeBytes`-wide codes, each mapped to its Unicode expansion
    * (UTF-16 code units — ligature multi-char targets included).
    * Unmapped codes fall back to the code point itself, like PDF.js. */
  private[graft] final case class CMap(codeBytes: Int, map: Map[Int, String]) {
    def decode(raw: String): String =
      if (codeBytes <= 1)
        raw.map(c => map.getOrElse(c.toInt, c.toString)).mkString
      else {
        val sb = new StringBuilder
        var i = 0
        while (i + 1 < raw.length) {
          val code = (raw.charAt(i).toInt << 8) | raw.charAt(i + 1).toInt
          sb.append(map.getOrElse(code, code.toChar.toString))
          i += 2
        }
        if (i < raw.length) sb.append(raw.charAt(i)) // trailing odd byte
        sb.toString
      }
  }

  /** Destination hex → string: 4-hex groups are UTF-16BE code units
    * (surrogate pairs concatenate correctly as Java chars); a bare
    * 2-hex destination (some writers emit these) is a single byte. */
  private def hexTarget(h: String): String =
    if (h.length % 4 == 0 && h.nonEmpty)
      h.grouped(4).map(g => Integer.parseInt(g, 16).toChar).mkString
    else Integer.parseInt(h, 16).toChar.toString

  /** Parse a /ToUnicode CMap stream ([PDF 32000-1:2008 §9.10.3]):
    * code width from the first codespacerange, bfchar singles, and
    * bfrange in both increment (`<lo> <hi> <dst>`, last UTF-16 unit
    * increments) and array (`<lo> <hi> [<d0> <d1> …]`) forms. The
    * bfrange body is tokenized sequentially — a naive triple-regex
    * would misread array elements as new ranges. */
  private[graft] def parseToUnicode(bytes: Array[Byte]): CMap = {
    val text = latin1(bytes)
    // clamped to the 1-2 byte widths CID text actually uses (a 3-4
    // byte codespace would otherwise silently mis-pair in decode)
    val codeBytes = """begincodespacerange\s*<([0-9A-Fa-f]+)>""".r
      .findFirstMatchIn(text)
      .map(m => math.min(2, math.max(1, m.group(1).length / 2)))
      .getOrElse(1)
    val m = scala.collection.mutable.Map[Int, String]()
    for {
      sec <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(text)
      pair <- """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
        .findAllMatchIn(sec.group(1))
    } m(Integer.parseInt(pair.group(1), 16)) = hexTarget(pair.group(2))
    for (sec <- """(?s)beginbfrange(.*?)endbfrange""".r
        .findAllMatchIn(text)) {
      val toks = """<([0-9A-Fa-f]+)>|(\[)|(\])""".r
        .findAllMatchIn(sec.group(1)).toIndexedSeq
      var i = 0
      def hexOf(k: Int): Option[String] = Option(toks(k).group(1))
      while (i + 2 < toks.length) {
        (hexOf(i), hexOf(i + 1)) match {
          case (Some(loH), Some(hiH)) =>
            val lo = Integer.parseInt(loH, 16)
            val hi = Integer.parseInt(hiH, 16)
            if (toks(i + 2).group(2) != null) { // array form
              var j = i + 3
              var code = lo
              while (j < toks.length && toks(j).group(3) == null) {
                hexOf(j).foreach { d => m(code) = hexTarget(d); code += 1 }
                j += 1
              }
              i = j + 1
            } else hexOf(i + 2) match { // increment form
              case Some(dH) =>
                val base = hexTarget(dH)
                var k = 0
                while (k <= hi - lo && k < 65536) {
                  m(lo + k) = base.init + (base.last + k).toChar
                  k += 1
                }
                i += 3
              case None => i += 3
            }
          case _ => i += 1
        }
      }
    }
    CMap(codeBytes, m.toMap)
  }

  /** /ToUnicode CMaps of a page's fonts, keyed by resource name
    * (`F1`). /Resources and /Font may each be inline or indirect. */
  private def pageFonts(page: PdfObj,
      objs: Map[Int, PdfObj]): Map[String, CMap] = {
    def indirect(body: String, name: String): Option[String] =
      ("/" + name + """\s+(\d+)\s+\d+\s+R""").r.findFirstMatchIn(body)
        .flatMap(m => objs.get(m.group(1).toInt).map(_.body))
    val resources = indirect(page.body, "Resources").getOrElse(page.body)
    val fontDict = indirect(resources, "Font").getOrElse {
      """/Font\s*<<""".r.findFirstMatchIn(resources).map { m =>
        val end = resources.indexOf(">>", m.end)
        if (end < 0) "" else resources.substring(m.end, end)
      }.getOrElse("")
    }
    """/([A-Za-z0-9._+-]+)\s+(\d+)\s+\d+\s+R""".r
      .findAllMatchIn(fontDict).flatMap { fm =>
        for {
          font <- objs.get(fm.group(2).toInt)
          tu <- """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
            .findFirstMatchIn(font.body)
          cmapObj <- objs.get(tu.group(1).toInt)
          bytes <- contentBytes(cmapObj)
        } yield fm.group(1) -> parseToUnicode(bytes)
      }.toMap
  }

  /** Page content streams in page order (with each page's font CMaps):
    * the /Pages /Kids walk when the tree parses, otherwise every
    * /Type /Page object in document order. */
  private def pageContents(
      objs: Map[Int, PdfObj]): Seq[(Array[Byte], Map[String, CMap])] = {
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
      else Some((parts.reduce(_ ++ _), pageFonts(page, objs)))
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
    * inter-word space, like PDF.js's computed advance). `fonts` carries
    * the page's /ToUnicode CMaps: Tf tracks the current font and
    * show-strings decode through its CMap (subset/CID fonts whose raw
    * bytes are gibberish); fonts without one pass through raw. */
  private[sources] def pageRuns(content: Array[Byte],
      fonts: Map[String, CMap] = Map.empty): Seq[PdfRun] = {
    val src = latin1(content)
    val out = ArrayBuffer[PdfRun]()
    // operand stack: numbers, strings, names; arrays collected inline
    val operands = ArrayBuffer[Any]()
    var ty = 0.0
    var tl = 0.0
    var curMap: Option[CMap] = None
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
        def mapped(s: String): String =
          curMap.map(_.decode(s)).getOrElse(s)
        op match {
          case "BI" =>
            // inline image: advance the cursor past the EI that
            // follows the ID marker — walking the raw image bytes as
            // tokens could otherwise emit garbage "text" if the data
            // happens to contain a show-string shape (j is the token
            // cursor the epilogue assigns back to i)
            val idAt = src.indexOf("ID", j)
            var k = if (idAt < 0) n else idAt + 2
            var found = -1
            while (found < 0 && k < n - 1) {
              if (src.charAt(k) == 'E' && src.charAt(k + 1) == 'I' &&
                k > 0 && src.charAt(k - 1).isWhitespace &&
                (k + 2 >= n || src.charAt(k + 2).isWhitespace))
                found = k + 2
              k += 1
            }
            j = if (found < 0) n else found
          case "BT" => ty = 0.0; tl = 0.0
          case "Tm" => if (nums.length >= 6) ty = nums(5)
          case "Td" => if (nums.length >= 2) ty += nums(1)
          case "TD" => if (nums.length >= 2) { tl = -nums(1); ty += nums(1) }
          case "TL" => if (nums.nonEmpty) tl = nums.head
          case "Tf" => curMap = operands.collect {
            case s: String if s.startsWith("/") => s
          }.lastOption.flatMap(f => fonts.get(f.substring(1)))
          case "Tj" => strs.lastOption.foreach(s => emit(mapped(s)))
          case "'" => ty -= tl; strs.lastOption.foreach(s => emit(mapped(s)))
          case "\"" => ty -= tl; strs.lastOption.foreach(s => emit(mapped(s)))
          case "TJ" => emit(strs.map(mapped).mkString)
          case _ => () // colors, graphics: no effect on runs
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
      val text = latin1(bytes)
      val objs = parseObjects(text)
      val usable = cryptState(text, objs) match {
        case Plain         => Some(objs)
        case Undecryptable => None
        case Keyed(fk, aes, perObj) =>
          Some(decryptStreams(objs, fk, aes, perObj))
      }
      usable.toSeq.flatMap { m =>
        pageContents(expandObjStm(m)).zipWithIndex.map {
          case ((content, fonts), idx) => (idx + 1, pageRuns(content, fonts))
        }.filter(_._2.nonEmpty)
      }
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
