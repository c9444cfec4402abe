package graft.sources

/** Office Binary Document RC4 encryption — the [MS-OFFCRYPTO] 2.3.6
  * scheme Word 97–2003 applies when a legacy `.doc` is saved with a
  * password ("Office 97/2000 Compatible" encryption). The reference's
  * word-extractor THROWS on these files (content-processor.ts:1411-1427
  * surfaces the converter stub); decrypting them with a caller-supplied
  * password is a beyond-reference capability of this engine's document
  * pipeline.
  *
  * Scheme (public spec):
  *   - EncryptionHeader at the head of the Table stream, 52 bytes:
  *     u16 major=1, u16 minor=1, Salt(16), EncryptedVerifier(16),
  *     EncryptedVerifierHash(16). The FIB's `lKey` field records the
  *     header size.
  *   - Key derivation: H0 = MD5(UTF-16LE(password[0,15))); the 5-byte
  *     truncation of H0 concatenated with the salt, repeated 16 times
  *     (336 bytes), is MD5'd again; the first 5 bytes of that digest
  *     are the key base.
  *   - Per-block key: MD5(keyBase ∥ LE32(blockNo)) — 16 bytes, one RC4
  *     key per 512-byte block of a stream, blockNo = offset / 512.
  *   - Verification: RC4(blockKey(0)) over EncryptedVerifier then
  *     (continuing the same keystream) EncryptedVerifierHash; the
  *     password is correct iff MD5(verifier) equals verifierHash.
  *   - Streams are encrypted at their natural offsets with the FIRST
  *     `plainPrefix` bytes stored in the clear (0x44 bytes of
  *     WordDocument — the FibBase block a reader must parse to learn
  *     the file is encrypted at all — and the EncryptionHeader itself
  *     in the Table stream); the keystream position for a ciphertext
  *     byte is always its stream offset (block offset/512, position
  *     offset mod 512), so the clear prefix consumes keystream without
  *     using it.
  *
  * RC4 is hand-rolled (30 lines) rather than pulled from a provider:
  * the transform must be restartable per 512-byte block and advanced
  * to mid-block positions, which the JCE stream API makes awkward, and
  * a from-spec implementation keeps this file self-contained for
  * executor-side per-row kernels. Decrypt-only in production; the
  * encrypt direction (RC4 is symmetric) exists for fixture builders.
  */
object OfficeCrypto {

  /** RC4 keystream ([Schneier, Applied Cryptography §17.1]): KSA then
    * PRGA; `xor` applies the next `len` keystream bytes in place. */
  final class Rc4(key: Array[Byte]) {
    private val s = new Array[Int](256)
    private var i = 0
    private var j = 0
    locally {
      var k = 0
      while (k < 256) { s(k) = k; k += 1 }
      var jj = 0
      k = 0
      while (k < 256) {
        jj = (jj + s(k) + (key(k % key.length) & 0xff)) & 0xff
        val t = s(k); s(k) = s(jj); s(jj) = t
        k += 1
      }
    }
    private def next(): Int = {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      s((s(i) + s(j)) & 0xff)
    }
    def skip(n: Int): Unit = { var k = 0; while (k < n) { next(); k += 1 } }
    def xor(buf: Array[Byte], off: Int, len: Int): Unit = {
      var k = 0
      while (k < len) {
        buf(off + k) = (buf(off + k) ^ next()).toByte
        k += 1
      }
    }
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  val HeaderSize = 52
  val BlockSize = 512

  final case class Rc4Header(salt: Array[Byte], encVerifier: Array[Byte],
      encVerifierHash: Array[Byte])

  /** Header at the head of the Table stream; None unless it carries
    * the version-1.1 Binary RC4 shape `lKey` promised. */
  def parseHeader(table: Array[Byte], lKey: Long): Option[Rc4Header] =
    if (lKey != HeaderSize || table.length < HeaderSize ||
      ((table(0) & 0xff) | ((table(1) & 0xff) << 8)) != 1 ||
      ((table(2) & 0xff) | ((table(3) & 0xff) << 8)) != 1) None
    else Some(Rc4Header(
      java.util.Arrays.copyOfRange(table, 4, 20),
      java.util.Arrays.copyOfRange(table, 20, 36),
      java.util.Arrays.copyOfRange(table, 36, 52)))

  /** 5-byte key base from password + salt (the per-block keys hang off
    * this; deriving it once per document amortizes the 17 MD5s). */
  def keyBase(password: String, salt: Array[Byte]): Array[Byte] = {
    val h0 = md5(password.substring(0, math.min(15, password.length))
      .getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    val seg = java.util.Arrays.copyOf(h0, 5) ++ salt // 21 bytes
    val inter = Array.fill(16)(seg).flatten // 336 bytes
    java.util.Arrays.copyOf(md5(inter), 5)
  }

  def blockKey(base: Array[Byte], block: Int): Array[Byte] =
    md5(base, le32(block))

  /** True iff this key base opens the document: decrypt the verifier
    * pair with block 0's key (ONE keystream across both fields) and
    * compare MD5(verifier) to the decrypted hash. */
  def verify(base: Array[Byte], hdr: Rc4Header): Boolean = {
    val rc4 = new Rc4(blockKey(base, 0))
    val v = hdr.encVerifier.clone()
    rc4.xor(v, 0, v.length)
    val h = hdr.encVerifierHash.clone()
    rc4.xor(h, 0, h.length)
    java.security.MessageDigest.isEqual(md5(v), h)
  }

  // ── XOR obfuscation ([MS-OFFCRYPTO] 2.3.7) ───────────────────────────
  // The pre-RC4 legacy scheme ("password to open" in Word 6/95 format
  // saves): a 16-byte obfuscation array derived from the password via
  // fixed public tables, XOR/rotated over the document streams, with a
  // 16-bit verifier stored in the FIB's lKey field. The reference's
  // word-extractor throws on ALL encrypted/obfuscated documents, so
  // this decode is beyond-reference capability. The derivation
  // constants below are the public [MS-OFFCRYPTO] 2.3.7.1/2.3.7.2
  // tables (also mirrored in Apache POI's CryptoFunctions and
  // LibreOffice's msfilter codec); XorMatrix is an LFSR family — each
  // row doubles its seed modulo the CRC polynomial 0x1021 — which the
  // spec spells out as 105 literals.

  /** 2.3.7.1 CreatePasswordVerifier_Method1: 15-bit rotate-accumulate
    * over the ANSI password bytes (last char first) then the length,
    * finally XOR 0xCE4B. Word stores this 16-bit value in lKey when
    * fObfuscated is set; password checking is comparing verifiers. */
  def xorVerifier(password: String): Int = {
    if (password.isEmpty) return 0
    val bytes = ansi(password)
    def rol15(v: Int): Int = ((v << 1) & 0x7FFF) | ((v & 0x4000) >> 14)
    var verifier = 0
    var i = bytes.length - 1
    while (i >= 0) {
      verifier = rol15(verifier) ^ (bytes(i) & 0xff)
      i -= 1
    }
    (rol15(verifier) ^ bytes.length ^ 0xCE4B) & 0xFFFF
  }

  /** Passwords are truncated to 15 chars and mapped to their ANSI
    * (cp1252) bytes for both the verifier and the key tables. */
  private def ansi(password: String): Array[Byte] =
    password.substring(0, math.min(15, password.length))
      .getBytes(java.nio.charset.Charset.forName("windows-1252"))

  /** 2.3.7.2 tables: the 15-byte pad completing short passwords, the
    * per-length initial code, and the 15×7 bit matrix (flattened
    * row-major; consumed from element 104 downward, 7 bits/char). */
  private val PadArray = Array(
    0xBB, 0xFF, 0xFF, 0xBA, 0xFF, 0xFF, 0xB9, 0x80, 0x00, 0xBE, 0x0F,
    0x00, 0xBF, 0x0F, 0x00).map(_.toByte)

  private val InitialCode = Array(
    0xE1F0, 0x1D0F, 0xCC9C, 0x84C0, 0x110C, 0x0E10, 0xF1CE, 0x313E,
    0x1872, 0xE139, 0xD40F, 0x84F9, 0x280C, 0xA96A, 0x4EC3)

  private val XorMatrix: Array[Int] = {
    // 15 rows × 7 cols; col j+1 = col j doubled mod the 0x1021 CRC
    // polynomial — generating them from the row seeds keeps the table
    // honest (a transcription slip would break the doubling chain,
    // which XorSpec asserts against the spec's literal values)
    val seeds = Array(
      0xAEFC, 0x7B61, 0x4563, 0x0375, 0xD849, 0x6F45, 0xEB23, 0x47D3,
      0xB861, 0x45A0, 0xAA51, 0x76B4, 0x3730, 0x3331, 0x1021)
    seeds.flatMap { s =>
      Iterator.iterate(s) { v =>
        val d = v << 1
        if ((d & 0x10000) != 0) (d & 0xFFFF) ^ 0x1021 else d
      }.take(7)
    }
  }

  /** 2.3.7.2 CreateXorKey_Method1: start from the length's initial
    * code, then walk the password last-char-first, folding in a matrix
    * row per character — one element per bit, high bit (0x40) first,
    * element index descending from 104. */
  def xorKey(password: String): Int = {
    val bytes = ansi(password)
    if (bytes.isEmpty) return 0
    var key = InitialCode(bytes.length - 1)
    var current = 0x68
    var i = bytes.length - 1
    while (i >= 0) {
      var c = bytes(i) & 0xff
      var j = 0
      while (j < 7) {
        if ((c & 0x40) != 0) key ^= XorMatrix(current)
        c <<= 1
        current -= 1
        j += 1
      }
      i -= 1
    }
    key & 0xFFFF
  }

  private def ror8(b: Int, n: Int): Int =
    (((b & 0xff) >>> n) | ((b & 0xff) << (8 - n))) & 0xff
  private def rol8(b: Int, n: Int): Int = ror8(b, 8 - n)

  /** 2.3.7.2 CreateXorArray_Method1: the 16-byte obfuscation array —
    * password bytes then pad bytes, each XORed with the alternating
    * low/high byte of the xor key and rotated right 1 (the spec's
    * XorRor step). */
  def xorArray(password: String): Array[Byte] = {
    val bytes = ansi(password)
    val key = xorKey(password)
    val keyHi = (key >>> 8) & 0xff
    val keyLo = key & 0xff
    val arr = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      val src =
        if (i < bytes.length) bytes(i) & 0xff
        else PadArray(i - bytes.length) & 0xff
      val k = if ((i & 1) == 0) keyLo else keyHi
      arr(i) = ror8(src ^ k, 1).toByte
      i += 1
    }
    arr
  }

  /** XOR data transform over a stream at natural offsets: byte `o` is
    * combined with array element `(o + o/512) mod 16` — the array
    * index gains one rotation step at each 512-byte block boundary,
    * the obfuscation analog of the RC4 path's per-block re-key — via
    * the XorRor step (encode `Ror(plain ^ k, 1)`, decode
    * `Rol(cipher,1) ^ k`). Bytes before `plainPrefix` pass through
    * (the FibBase a reader must parse to learn the file is obfuscated
    * at all stays clear, mirroring the RC4 layout). Symmetric pair, so
    * fixtures built by the encode direction round-trip exactly. */
  def xorCrypt(data: Array[Byte], arr: Array[Byte], plainPrefix: Int,
      decode: Boolean): Array[Byte] = {
    val out = data.clone()
    var o = plainPrefix
    while (o < out.length) {
      val k = arr((o + o / BlockSize) & 0xF) & 0xff
      out(o) =
        (if (decode) rol8(out(o), 1) ^ k
         else ror8((out(o) & 0xff) ^ k, 1)).toByte
      o += 1
    }
    out
  }

  /** Stream transform at natural offsets: bytes before `plainPrefix`
    * pass through untouched (their keystream is still consumed — the
    * cipher position is the stream offset); every 512-byte boundary
    * re-keys. RC4 is symmetric, so this is both decrypt and encrypt. */
  def cryptStream(data: Array[Byte], base: Array[Byte],
      plainPrefix: Int): Array[Byte] = {
    val out = data.clone()
    var off = 0
    var block = 0
    while (off < out.length) {
      val len = math.min(BlockSize, out.length - off)
      val skip = math.max(0, math.min(len, plainPrefix - off))
      if (skip < len) {
        val rc4 = new Rc4(blockKey(base, block))
        rc4.skip(skip)
        rc4.xor(out, off + skip, len - skip)
      }
      off += len
      block += 1
    }
    out
  }
}
