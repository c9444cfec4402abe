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
