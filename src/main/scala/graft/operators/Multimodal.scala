package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextUtil

/** Multimodal columns (builder-prompt requirement): image/audio/video as
  * opaque binary columns with typed metadata, processed by batched
  * per-partition operators.
  *
  * Image metadata (width/height/channels) is decoded for real from the
  * container headers — PNG, GIF, BMP, JPEG — with zero dependencies;
  * payloads without a recognizable header (audio/video containers,
  * arbitrary blobs) fall back to a clearly-marked deterministic stub.
  * Pixel decode and resampling are REAL for PNG (zlib ships in the
  * JVM: IDAT inflate + per-row defilter), GIF (from-spec LZW +
  * palette + interlace), BMP (BI_RGB stride + bottom-up flip +
  * palette/BGR swizzle), and JPEG — baseline grayscale AND
  * 3-component YCbCr color with 1–2× sampling factors AND
  * progressive/SOF2 (canonical Huffman, DC prediction, spectral
  * selection + successive approximation, zigzag dequant, IDCT,
  * fixed-point color conversion) — then integer nearest-neighbor
  * resampled. VIDEO frame pixels decode for real across three codec
  * families: MJPEG (AVI RIFF demux with the video stream index
  * resolved from strh order + the JPEG path per frame), DIB streams
  * (BI_RGB 24/8-bit through [[decodeDibPixels]]), and Microsoft RLE
  * — a real INTER-FRAME codec: delta frames paint onto a canvas
  * persisted across the stream and inherit every untouched pixel
  * from the previous frame. Only motion-compensated codecs (H.264
  * etc., patent/complexity-bound) remain a codec-bound stub, with
  * the Spark-side plumbing — binary schema, partition-local batching
  * (the JVM analog of a Pandas-UDF batch), deterministic feature
  * extraction, metadata projection — identical on both paths.
  * Swapping that stub for a real codec (javacv behind mapInPandas on
  * PySpark) changes no plan shape.
  */
object Multimodal {

  /** Typed metadata extracted from a binary payload. */
  case class MediaMeta(path: String, mime: String, n_bytes: Long,
      sha: String, width: Int, height: Int, channels: Int)

  val FeatureDim = 32
  private val BatchSize = 64

  // ── Image header decode (dependency-free) ─────────────────────────────
  // Real width/height/channels from the container header bytes for the
  // formats whose headers are trivially parseable without a codec:
  // PNG (IHDR), GIF (logical screen descriptor), BMP (BITMAPINFOHEADER
  // family), JPEG (SOF frame marker). Pixel decode stays out of scope —
  // metadata extraction never needs it.

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def i32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def i32le(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  /** (width, height, channels) from a PNG/GIF/BMP/JPEG header, or None
    * for payloads with no recognizable image container. */
  def decodeImageHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    // PNG: 8-byte signature, then the IHDR chunk — width/height are
    // big-endian u32 at offsets 16/20, color type at 25
    if (b.length >= 26 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G' && b(12) == 'I' && b(13) == 'H' &&
      b(14) == 'D' && b(15) == 'R') {
      val channels = b(25) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette-indexed
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => 3
      }
      return Some((i32be(b, 16), i32be(b, 20), channels))
    }
    // GIF87a/89a: logical screen width/height, little-endian u16 at 6/8
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      return Some((u16le(b, 6), u16le(b, 8), 3))
    // BMP: "BM", DIB header at 14. BITMAPCOREHEADER (size 12) has u16
    // dims; the BITMAPINFOHEADER family (40/52/56/108/124) has i32 dims
    // (height may be negative = top-down) and a u16 bit count
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dib = i32le(b, 14)
      if (dib == 12)
        return Some((u16le(b, 18), u16le(b, 20), 3))
      if (dib >= 40 && b.length >= 30) {
        val bits = u16le(b, 28)
        val channels = math.max(1, bits / 8)
        return Some((i32le(b, 18), math.abs(i32le(b, 22)), channels))
      }
    }
    // JPEG: walk the marker stream to the first SOFn frame header
    // (height/width big-endian u16 at +5/+7, component count at +9)
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // corrupt marker stream
        val marker = b(i + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone marker, no length field
        } else {
          val len = u16be(b, i + 2)
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof)
            return Some((u16be(b, i + 7), u16be(b, i + 5), b(i + 9) & 0xff))
          if (len < 2) return None
          i += 2 + len
        }
      }
      return None
    }
    None
  }

  // ── PNG pixel decode (dependency-free: zlib ships in the JVM) ────────
  // The one raster format fully decodable with nothing but
  // java.util.zip: chunk walk → IDAT concat → Inflater → per-row
  // defilter (all five PNG filter types). Same pattern as PdfExtract's
  // Flate path. 8-bit depth, color types gray/truecolor/gray+alpha/
  // RGBA/palette; 16-bit and Adam7 interlace decline to the metadata-
  // only path (None) — a decode must be right or absent, never
  // approximate.

  /** Decoded raster: `pixels` is row-major, `channels` bytes/pixel. */
  final case class PngImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Full PNG pixel decode, or None for payloads outside the supported
    * core (non-PNG, 16-bit, interlaced, truncated). Palette images
    * expand through PLTE to 3-channel RGB. */
  def decodePngPixels(b: Array[Byte]): Option[PngImage] =
    try {
      if (b.length < 33 || (b(0) & 0xff) != 0x89 || b(1) != 'P' ||
        b(2) != 'N' || b(3) != 'G') return None
      var w = 0; var h = 0; var colorType = -1; var bitDepth = 0
      var palette: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      var i = 8
      var done = false
      while (!done && i + 8 <= b.length) {
        val len = i32be(b, i)
        if (len < 0 || i + 12 + len > b.length) return None
        val typ = new String(b, i + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            w = i32be(b, i + 8); h = i32be(b, i + 12)
            bitDepth = b(i + 16) & 0xff
            colorType = b(i + 17) & 0xff
            if (b(i + 20) != 0) return None // Adam7 interlace
            if (bitDepth != 8) return None
          case "PLTE" =>
            palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
          case "IDAT" => idat.write(b, i + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunk
        }
        i += 12 + len
      }
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      if (w <= 0 || h <= 0 || w.toLong * h * channels > (1L << 28))
        return None
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val stride = w * channels
      val raw = new Array[Byte]((stride + 1) * h)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated
        got += n
      }
      inf.end()
      if (got < raw.length) return None
      // defilter in place into the output raster
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val filter = raw(y * (stride + 1)) & 0xff
        val rowIn = y * (stride + 1) + 1
        val rowOut = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(rowIn + x) & 0xff
          val left = if (x >= channels) out(rowOut + x - channels) & 0xff
            else 0
          val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= channels)
            out(rowOut - stride + x - channels) & 0xff else 0
          val v = filter match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + (left + up) / 2
            case 4 => cur + paeth(left, up, ul)
            case _ => return None
          }
          out(rowOut + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      if (colorType == 3) {
        if (palette == null) return None
        val rgb = new Array[Byte](w * h * 3)
        var p = 0
        while (p < w * h) {
          val idx = (out(p) & 0xff) * 3
          if (idx + 2 >= palette.length) return None
          rgb(p * 3) = palette(idx)
          rgb(p * 3 + 1) = palette(idx + 1)
          rgb(p * 3 + 2) = palette(idx + 2)
          p += 1
        }
        Some(PngImage(w, h, 3, rgb))
      } else Some(PngImage(w, h, channels, out))
    } catch { case _: Exception => None }

  /** PNG encode (fixture-builder twin of [[decodePngPixels]], also the
    * re-encode half a real resize pipeline needs): 8-bit, gray /
    * truecolor / gray+alpha / RGBA, one IDAT, and the row filter type
    * CYCLING through all five PNG filters (`y mod 5`) so every decoder
    * filter branch is exercised by any multi-row image — a defilter
    * bug cannot hide behind an all-None encode. */
  def pngEncode(w: Int, h: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * channels, "bad raster size")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case _ => throw new IllegalArgumentException("channels")
    }
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val filter = y % 5
      raw(y * (stride + 1)) = filter.toByte
      val rowIn = y * stride
      val rowOut = y * (stride + 1) + 1
      var x = 0
      while (x < stride) {
        val cur = pixels(rowIn + x) & 0xff
        val left = if (x >= channels) pixels(rowIn + x - channels) & 0xff
          else 0
        val up = if (y > 0) pixels(rowIn - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels)
          pixels(rowIn - stride + x - channels) & 0xff else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(rowOut + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      val lenB = Array((body.length >> 24).toByte,
        (body.length >> 16).toByte, (body.length >> 8).toByte,
        body.length.toByte)
      out.write(lenB, 0, 4)
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb, 0, 4)
      out.write(body, 0, body.length)
      val c = crc.getValue
      out.write(Array((c >> 24).toByte, (c >> 16).toByte,
        (c >> 8).toByte, c.toByte), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >> 24).toByte; ihdr(1) = (w >> 16).toByte
    ihdr(2) = (w >> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >> 24).toByte; ihdr(5) = (h >> 16).toByte
    ihdr(6) = (h >> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    chunk("IHDR", ihdr)
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  // ── GIF pixel decode (dependency-free LZW) ───────────────────────────
  // GIF's LZW differs from the TIFF/PDF flavor PdfExtract implements:
  // LSB-first bit packing, a per-image minimum code size, clear = 2^n,
  // EOD = 2^n+1, and the code width bumps (up to 12) with NO early
  // change. Palette expansion through the global/local color table
  // yields an RGB raster — the same [[PngImage]] shape the resize path
  // consumes; interlaced images are de-scrambled from the 4-pass row
  // order (ImageIO's own writer emits interlaced GIFs, so the
  // cross-validation covers it).

  /** GIF-flavor LZW: `minCode` from the image data's first byte. */
  private def gifLzwDecode(data: Array[Byte], minCode: Int,
      maxPixels: Int): Option[Array[Byte]] =
    try {
      if (minCode < 2 || minCode > 8) return None
      val clear = 1 << minCode
      val eod = clear + 1
      val out = new java.io.ByteArrayOutputStream(maxPixels)
      val extras = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var width = minCode + 1
      var prev: Array[Byte] = null
      var bitPos = 0
      val nBits = data.length * 8
      def next(): Int = {
        if (bitPos + width > nBits) return eod // truncated: EOD
        var v = 0
        var i = 0
        while (i < width) { // LSB-first
          v |= ((data(bitPos >> 3) >> (bitPos & 7)) & 1) << i
          bitPos += 1; i += 1
        }
        v
      }
      var done = false
      while (!done && out.size < maxPixels) {
        val code = next()
        if (code == eod) done = true
        else if (code == clear) {
          extras.clear(); width = minCode + 1; prev = null
        } else {
          val entry: Array[Byte] =
            if (code < clear) Array(code.toByte)
            else if (code >= eod + 1 && code - eod - 1 < extras.length)
              extras(code - eod - 1)
            else if (prev != null && code == eod + 1 + extras.length)
              prev :+ prev(0) // KwKwK
            else return None
          out.write(entry)
          if (prev != null && eod + 1 + extras.length <= 4095)
            extras += (prev :+ entry(0))
          prev = entry
          // GIF: bump when the next code no longer fits — no early
          // change (the TIFF flavor's off-by-one twin)
          if (eod + 1 + extras.length >= (1 << width) && width < 12)
            width += 1
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Full GIF pixel decode of the FIRST image: LSD + color tables +
    * sub-block concat + GIF-LZW + interlace de-scramble + palette
    * expansion to RGB. None for palette-less or structurally corrupt
    * payloads. */
  def decodeGifPixels(b: Array[Byte]): Option[PngImage] =
    try {
      if (b.length < 14 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F')
        return None
      val packed = b(10) & 0xff
      var palette: Array[Byte] = null
      var i = 13
      if ((packed & 0x80) != 0) {
        val gctLen = 3 * (1 << ((packed & 7) + 1))
        if (i + gctLen > b.length) return None
        palette = java.util.Arrays.copyOfRange(b, i, i + gctLen)
        i += gctLen
      }
      while (i < b.length) {
        (b(i) & 0xff) match {
          case 0x21 => // extension: label + sub-blocks
            i += 2
            while (i < b.length && b(i) != 0) i += 1 + (b(i) & 0xff)
            i += 1 // block terminator
          case 0x2c => // image descriptor
            if (i + 10 > b.length) return None
            val w = u16le(b, i + 5)
            val h = u16le(b, i + 7)
            val ipacked = b(i + 9) & 0xff
            val interlaced = (ipacked & 0x40) != 0
            i += 10
            if ((ipacked & 0x80) != 0) { // local color table wins
              val lctLen = 3 * (1 << ((ipacked & 7) + 1))
              if (i + lctLen > b.length) return None
              palette = java.util.Arrays.copyOfRange(b, i, i + lctLen)
              i += lctLen
            }
            if (palette == null || i >= b.length) return None
            val minCode = b(i) & 0xff
            i += 1
            val lzw = new java.io.ByteArrayOutputStream()
            while (i < b.length && b(i) != 0) {
              val len = b(i) & 0xff
              if (i + 1 + len > b.length) return None
              lzw.write(b, i + 1, len)
              i += 1 + len
            }
            if (w <= 0 || h <= 0 || w.toLong * h > (1 << 26)) return None
            val idx0 = gifLzwDecode(lzw.toByteArray, minCode, w * h)
              .getOrElse(return None)
            if (idx0.length < w * h) return None
            // interlaced images store rows in the 4-pass order
            // (8k, 8k+4, 4k+2, 2k+1) — de-scramble to raster order
            val idx = if (!interlaced) idx0 else {
              val order = (0 until h by 8) ++ (4 until h by 8) ++
                (2 until h by 4) ++ (1 until h by 2)
              val re = new Array[Byte](w * h)
              order.zipWithIndex.foreach { case (destRow, srcRow) =>
                System.arraycopy(idx0, srcRow * w, re, destRow * w, w)
              }
              re
            }
            val rgb = new Array[Byte](w * h * 3)
            var p = 0
            while (p < w * h) {
              val pi = (idx(p) & 0xff) * 3
              if (pi + 2 >= palette.length) return None
              rgb(p * 3) = palette(pi)
              rgb(p * 3 + 1) = palette(pi + 1)
              rgb(p * 3 + 2) = palette(pi + 2)
              p += 1
            }
            return Some(PngImage(w, h, 3, rgb))
          case 0x3b => return None // trailer before any image
          case _ => return None
        }
      }
      None
    } catch { case _: Exception => None }

  /** GIF encode (fixture-builder twin): global color table from
    * `palette` (padded to a power of two), one non-interlaced image,
    * and a from-spec LZW compressor that mirrors the decoder's table
    * growth exactly — literal codes only (valid, if uncompressed), a
    * Clear emitted whenever the table would overflow. */
  def gifEncode(w: Int, h: Int, palette: Array[Byte],
      indices: Array[Byte]): Array[Byte] = {
    require(indices.length == w * h && palette.length % 3 == 0)
    val nColors = palette.length / 3
    var bits = 2
    while ((1 << bits) < nColors) bits += 1
    if (bits > 8) throw new IllegalArgumentException("palette too big")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | (bits - 1)) // GCT present, 2^bits entries
    out.write(0); out.write(0)
    out.write(palette, 0, palette.length)
    out.write(new Array[Byte](3 * ((1 << bits) - nColors)), 0,
      3 * ((1 << bits) - nColors)) // pad table to 2^bits
    out.write(0x2c) // image descriptor
    out.write(Array[Byte](0, 0, 0, 0), 0, 4)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0) // no LCT, not interlaced
    val minCode = math.max(2, bits)
    out.write(minCode)
    val clear = 1 << minCode
    val eod = clear + 1
    // LSB-first bit writer
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0
    var accBits = 0
    var width = minCode + 1
    var tableNext = eod + 1
    def put(code: Int): Unit = {
      acc |= code << accBits
      accBits += width
      while (accBits >= 8) {
        data.write(acc & 0xff); acc >>= 8; accBits -= 8
      }
    }
    put(clear)
    var k = 0
    var emitted = 0 // literals since the last clear
    while (k < indices.length) {
      put(indices(k) & 0xff)
      emitted += 1
      // the decoder adds an entry per code after the first; track its
      // width bumps and clear before its table could overflow
      if (emitted >= 2) {
        tableNext += 1
        if (tableNext >= (1 << width) && width < 12) width += 1
        if (tableNext > 4090) { // headroom before 4096
          put(clear); width = minCode + 1; tableNext = eod + 1
          emitted = 0
        }
      }
      k += 1
    }
    put(eod)
    if (accBits > 0) data.write(acc & 0xff)
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) { // 255-byte sub-blocks
      val len = math.min(255, bytes.length - off)
      out.write(len)
      out.write(bytes, off, len)
      off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ── BMP pixel codec ──────────────────────────────────────────────────

  /** Uncompressed BMP (BITMAPINFOHEADER family, BI_RGB) → raster.
    * 8-bit palette rows expand through the BGRA color table to RGB;
    * 24-bit BGR and 32-bit BGRA swap to the PNG-convention RGB(A)
    * channel order the resampler expects. Bottom-up rows (positive
    * height) flip; negative height is top-down. Rows pad to 4-byte
    * stride. RLE/16-bit/1-bit/4-bit decline — right or absent. */
  def decodeBmpPixels(b: Array[Byte]): Option[PngImage] =
    try {
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
      val dataOff = i32le(b, 10)
      val dib = i32le(b, 14)
      if (dib < 40) return None // BITMAPCOREHEADER: out of scope
      val w = i32le(b, 18)
      val rawH = i32le(b, 22)
      val h = math.abs(rawH)
      val topDown = rawH < 0
      val bits = u16le(b, 28)
      val compression = i32le(b, 30)
      if (compression != 0) return None // BI_RGB only
      if (w <= 0 || h <= 0 || w.toLong * h > (1 << 26)) return None
      val stride = ((bits * w + 31) / 32) * 4
      if (dataOff < 0 || dataOff.toLong + stride.toLong * h > b.length)
        return None
      val channels = bits match {
        case 8 => 3 // palette-expanded
        case 24 => 3
        case 32 => 4
        case _ => return None
      }
      // 8-bit: color table of RGBQUAD (B,G,R,reserved) after the DIB
      // header; clrUsed 0 means the full 256 entries
      val clrUsed = if (bits == 8) {
        val n = i32le(b, 46)
        if (n == 0) 256 else n
      } else 0
      val palOff = 14 + dib
      if (bits == 8 && palOff + clrUsed * 4 > dataOff) return None
      val out = new Array[Byte](w * h * channels)
      var row = 0
      while (row < h) {
        val srcRow = if (topDown) row else h - 1 - row
        val rowOff = dataOff + srcRow * stride
        var x = 0
        while (x < w) {
          val o = (row * w + x) * channels
          if (bits == 8) {
            val idx = b(rowOff + x) & 0xff
            if (idx >= clrUsed) return None
            val p = palOff + idx * 4
            out(o) = b(p + 2); out(o + 1) = b(p + 1); out(o + 2) = b(p)
          } else {
            val p = rowOff + x * (bits / 8)
            out(o) = b(p + 2); out(o + 1) = b(p + 1); out(o + 2) = b(p)
            if (channels == 4) out(o + 3) = b(p + 3)
          }
          x += 1
        }
        row += 1
      }
      Some(PngImage(w, h, channels, out))
    } catch { case _: Exception => None }

  /** 24-bit bottom-up BI_RGB BMP encoder (fixture-builder twin):
    * pixels in RGB order, written as padded BGR rows — the stride
    * padding and bottom-up flip are exactly what the decoder must
    * invert, which is what makes the round-trip a real check. */
  def bmpEncode24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val stride = ((24 * w + 31) / 32) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    def put16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(i: Int, v: Int): Unit = {
      put16(i, v & 0xffff); put16(i + 2, (v >> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, size); put32(10, 54)
    put32(14, 40); put32(18, w); put32(22, h) // positive = bottom-up
    put16(26, 1); put16(28, 24); put32(30, 0) // planes, bits, BI_RGB
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val d = rowOff + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  // ── JPEG baseline decode (dependency-free) ───────────────────────────
  // The entropy layer everyone assumes needs libjpeg is, for baseline
  // sequential JPEG, ~300 lines of public spec [ITU T.81]: canonical
  // Huffman tables from DHT, the 0xFF00-unstuffed bit stream, DC
  // prediction + AC run-length per 8×8 block, zigzag dequantization,
  // the type-II inverse DCT, and for color the interleaved-MCU walk +
  // replicate chroma upsampling + JFIF fixed-point YCbCr→RGB.
  // Progressive JPEGs decline to the stub.

  private lazy val jpegZigzag: Array[Int] = {
    // generate the zigzag order (no memorized table to mistype):
    // walk diagonals, alternating direction
    val order = new Array[Int](64)
    var x = 0; var y = 0
    var i = 0
    var up = true
    while (i < 64) {
      order(i) = y * 8 + x
      i += 1
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
    }
    order
  }

  private lazy val idctCos: Array[Double] =
    Array.tabulate(8 * 8)(i =>
      StrictMath.cos((2 * (i / 8) + 1) * (i % 8) * StrictMath.PI / 16))

  /** Type-II 8×8 inverse DCT (double precision, StrictMath table —
    * bit-reproducible), +128 level shift, clamp. For DC-only blocks
    * the result is exactly flat at 128 + dc/8 (1/8 is exact in
    * binary), which is what makes the oracle fixtures replayable. */
  private def idctBlock(coef: Array[Double], out: Array[Int]): Unit = {
    val c = idctCos
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) 0.7071067811865476 else 1.0
            val cv = if (v == 0) 0.7071067811865476 else 1.0
            sum += cu * cv * coef(v * 8 + u) * c(x * 8 + u) * c(y * 8 + v)
            u += 1
          }
          v += 1
        }
        val p = math.round(sum / 4.0 + 128.0).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  private final class JpegHuff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code → symbol, decoded bit by bit (max 16)
    private val maxcode = new Array[Int](17)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxcode(l) = code - 1
        if (counts(l - 1) == 0) maxcode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def decode(nextBit: () => Int): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (maxcode(l) >= 0 && code <= maxcode(l))
          return symbols(valptr(l) + code - mincode(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      throw new IllegalStateException("bad huffman code")
    }
  }

  /** Fixed-point JFIF YCbCr→RGB (libjpeg's 16-bit constants:
    * FIX(1.40200)=91881, FIX(0.34414)=22554, FIX(0.71414)=46802,
    * FIX(1.77200)=116130), round-half-up at the fixed point, clamp.
    * Pure integer arithmetic — bit-reproducible across JVMs AND
    * replayable in SQL (the `doc_jpeg_color` oracle recomputes it
    * with `//`-division on provably-non-negative numerators). */
  def ycbcrToRgb(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val y16 = yv << 16
    val cbd = cb - 128
    val crd = cr - 128
    def c8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    (c8((y16 + 91881 * crd + 32768) >> 16),
      c8((y16 - 22554 * cbd - 46802 * crd + 32768) >> 16),
      c8((y16 + 116130 * cbd + 32768) >> 16))
  }

  /** Baseline sequential JPEG → raster. GRAYSCALE (1 component) gives
    * a 1-channel raster; COLOR (3-component YCbCr, one interleaved
    * scan, sampling factors 1–2 per axis: 4:4:4 / 4:2:2 / 4:4:0 /
    * 4:2:0) decodes per-component planes MCU by MCU, upsamples chroma
    * by sample replication, and converts through the fixed-point
    * [[ycbcrToRgb]] to a 3-channel raster. PROGRESSIVE (SOF2) frames
    * route to [[decodeJpegProgressive]]'s multi-scan path. None for
    * 12-bit, 4-component (CMYK), baseline-multi-scan, or corrupt
    * payloads. DRI / RSTn restart markers are honored per MCU
    * (predictor reset + byte realign). */
  def decodeJpegPixels(b: Array[Byte]): Option[PngImage] =
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
        return None
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[JpegHuff](4)
      val acTabs = new Array[JpegHuff](4)
      var w = 0; var h = 0
      var nComp = 0
      val compH = new Array[Int](3); val compV = new Array[Int](3)
      val compQ = new Array[Int](3)
      val compDc = new Array[Int](3); val compAc = new Array[Int](3)
      var restartInterval = 0
      var i = 2
      var sos = -1
      while (sos < 0 && i + 4 <= b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        val marker = b(i + 1) & 0xff
        val len = u16be(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < i + 2 + len) {
              val pq = (b(p) >> 4) & 0xf
              val tq = b(p) & 0xf
              if (pq != 0) return None // 16-bit tables: out of scope
              quant(tq) = Array.tabulate(64)(k => b(p + 1 + k) & 0xff)
              p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < i + 2 + len) {
              val tc = (b(p) >> 4) & 0xf
              val th = b(p) & 0xf
              val counts = Array.tabulate(16)(k => b(p + 1 + k) & 0xff)
              val n = counts.sum
              val symbols = Array.tabulate(n)(k => b(p + 17 + k) & 0xff)
              val t = new JpegHuff(counts, symbols)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            if ((b(seg) & 0xff) != 8) return None // 12-bit
            h = u16be(b, seg + 1)
            w = u16be(b, seg + 3)
            nComp = b(seg + 5) & 0xff
            if (nComp != 1 && nComp != 3) return None // CMYK etc.
            var c = 0
            while (c < nComp) {
              val sf = b(seg + 7 + c * 3) & 0xff
              compH(c) = (sf >> 4) & 0xf
              compV(c) = sf & 0xf
              if (compH(c) < 1 || compH(c) > 2 ||
                compV(c) < 1 || compV(c) > 2) return None
              compQ(c) = b(seg + 8 + c * 3) & 0xf
              c += 1
            }
            if (nComp == 1) {
              // single-component scans are non-interleaved: the data
              // units walk ceil(w/8)×ceil(h/8) regardless of declared
              // sampling factors
              compH(0) = 1; compV(0) = 1
            }
          case 0xc2 => // progressive: its own multi-scan decode path
            return decodeJpegProgressive(b)
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
              0xcb | 0xcd | 0xce | 0xcf =>
            return None // other non-baseline frame types
          case 0xdd => restartInterval = u16be(b, seg)
          case 0xda => // SOS — must cover every frame component
            if ((b(seg) & 0xff) != nComp) return None // multi-scan
            var c = 0
            while (c < nComp) {
              compDc(c) = (b(seg + 2 + c * 2) >> 4) & 0xf
              compAc(c) = b(seg + 2 + c * 2) & 0xf
              c += 1
            }
            sos = i + 2 + len
          case _ => () // APPn, COM, ...
        }
        i += 2 + len
      }
      if (sos < 0 || w <= 0 || h <= 0 || nComp == 0) return None
      if (w.toLong * h * nComp > (1 << 27)) return None
      var cchk = 0
      while (cchk < nComp) {
        if (quant(compQ(cchk)) == null || dcTabs(compDc(cchk)) == null ||
          acTabs(compAc(cchk)) == null) return None
        cchk += 1
      }

      // entropy-coded bit reader with byte unstuffing
      var pos = sos
      var acc = 0
      var bits = 0
      def nextBit(): Int = {
        if (bits == 0) {
          if (pos >= b.length) throw new IllegalStateException("eof")
          var byteV = b(pos) & 0xff
          pos += 1
          if (byteV == 0xff) {
            val m = if (pos < b.length) b(pos) & 0xff else 0xd9
            if (m == 0x00) pos += 1
            else throw new IllegalStateException("marker in stream")
          }
          acc = byteV
          bits = 8
        }
        bits -= 1
        (acc >> bits) & 1
      }
      def receive(n: Int): Int = {
        var v = 0
        var k = 0
        while (k < n) { v = (v << 1) | nextBit(); k += 1 }
        v
      }
      def extend(v: Int, t: Int): Int =
        if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

      val hMax = (0 until nComp).map(compH).max
      val vMax = (0 until nComp).map(compV).max
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      // MCU-padded per-component planes at each component's own
      // sampled resolution
      val planeW = Array.tabulate(nComp)(c => mcusX * compH(c) * 8)
      val planes = Array.tabulate(nComp)(c =>
        new Array[Byte](planeW(c) * mcusY * compV(c) * 8))
      val coef = new Array[Double](64)
      val px = new Array[Int](64)
      val pred = new Array[Int](3)
      var mcusDone = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcusDone > 0 &&
            mcusDone % restartInterval == 0) {
            // RST marker: byte-align, consume FF D0-D7, reset predictors
            bits = 0
            while (pos + 1 < b.length && !((b(pos) & 0xff) == 0xff &&
              (b(pos + 1) & 0xff) >= 0xd0 && (b(pos + 1) & 0xff) <= 0xd7))
              pos += 1
            pos += 2
            java.util.Arrays.fill(pred, 0)
          }
          var c = 0
          while (c < nComp) {
            val dcT = dcTabs(compDc(c))
            val acT = acTabs(compAc(c))
            val q = quant(compQ(c))
            var sv = 0
            while (sv < compV(c)) {
              var sh = 0
              while (sh < compH(c)) {
                java.util.Arrays.fill(coef, 0.0)
                val t = dcT.decode(() => nextBit())
                val diff = extend(receive(t), t)
                pred(c) += diff
                coef(0) = pred(c).toDouble * q(0)
                var k = 1
                var eob = false
                while (k < 64 && !eob) {
                  val rs = acT.decode(() => nextBit())
                  val r = rs >> 4
                  val s = rs & 15
                  if (s == 0) {
                    if (r == 15) k += 16 else eob = true // ZRL / EOB
                  } else {
                    k += r
                    if (k > 63) return None
                    coef(jpegZigzag(k)) = extend(receive(s), s).toDouble *
                      q(k)
                    k += 1
                  }
                }
                idctBlock(coef, px)
                val plane = planes(c)
                val pw = planeW(c)
                val ox = (mx * compH(c) + sh) * 8
                val oy = (my * compV(c) + sv) * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    plane((oy + yy) * pw + ox + xx) =
                      px(yy * 8 + xx).toByte
                    xx += 1
                  }
                  yy += 1
                }
                sh += 1
              }
              sv += 1
            }
            c += 1
          }
          mcusDone += 1
          mx += 1
        }
        my += 1
      }
      Some(jpegPlanesToImage(nComp, planes, planeW, compH, compV,
        hMax, vMax, w, h))
    } catch { case _: Exception => None }

  /** MCU-padded per-component sample planes → final raster: crop the
    * luma plane (grayscale) or replicate-upsample chroma to frame
    * resolution and convert through [[ycbcrToRgb]] (color). Shared by
    * the baseline and progressive decode paths. */
  private def jpegPlanesToImage(nComp: Int, planes: Array[Array[Byte]],
      planeW: Array[Int], compH: Array[Int], compV: Array[Int],
      hMax: Int, vMax: Int, w: Int, h: Int): PngImage =
    if (nComp == 1) {
      // crop the MCU-padded luma plane to the frame geometry
      val out = new Array[Byte](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * pw, out, y * w, w)
        y += 1
      }
      PngImage(w, h, 1, out)
    } else {
      // replicate-upsample chroma to frame resolution, convert
      val out = new Array[Byte](w * h * 3)
      val pY = planes(0); val pCb = planes(1); val pCr = planes(2)
      val wY = planeW(0); val wCb = planeW(1); val wCr = planeW(2)
      val hy0 = compH(0); val vy0 = compV(0)
      val hc1 = compH(1); val vc1 = compV(1)
      val hc2 = compH(2); val vc2 = compV(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = pY((y * vy0 / vMax) * wY + x * hy0 / hMax) & 0xff
          val cb = pCb((y * vc1 / vMax) * wCb + x * hc1 / hMax) & 0xff
          val cr = pCr((y * vc2 / vMax) * wCr + x * hc2 / hMax) & 0xff
          val (r, g, bl) = ycbcrToRgb(yv, cb, cr)
          val o = (y * w + x) * 3
          out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = bl.toByte
          x += 1
        }
        y += 1
      }
      PngImage(w, h, 3, out)
    }

  /** PROGRESSIVE JPEG (SOF2) decode [ITU T.81 §G]. Progressive files
    * deliver the DCT coefficients over MULTIPLE scans — spectral
    * selection (a scan carries one frequency band Ss..Se of one or
    * all components) crossed with successive approximation (a first
    * scan delivers each coefficient's high bits at point transform
    * Al, refinement scans append one bit each) — so unlike the
    * baseline path the whole coefficient field is buffered (Short per
    * coefficient) and dequantize+IDCT runs once at EOI. The
    * refinement-scan algorithms (DC: one bit per block; AC: the
    * correction-bit walk with EOB runs, §G.1.2.3) follow the spec's
    * flowcharts. Restart markers reset DC predictors AND the EOB run.
    * Most web JPEGs are progressive, which is why the training-data
    * decode path can't leave this to a stub. */
  private def decodeJpegProgressive(b: Array[Byte]): Option[PngImage] =
    try {
      val n = b.length
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[JpegHuff](4)
      val acTabs = new Array[JpegHuff](4)
      var w = 0; var h = 0; var nComp = 0
      val compId = new Array[Int](3)
      val compH = new Array[Int](3); val compV = new Array[Int](3)
      val compQ = new Array[Int](3)
      var restartInterval = 0
      var hMax = 1; var vMax = 1
      var mcusX = 0; var mcusY = 0
      var coefs: Array[Array[Short]] = null
      var blocksPerRow: Array[Int] = null
      var blockRows: Array[Int] = null

      /** Decode one scan's entropy data; returns the offset of the
        * next marker. Closes over the table/frame state above. */
      def decodeScan(dataStart: Int, scanComps: Array[Int],
          dcSel: Array[Int], acSel: Array[Int],
          ss: Int, se: Int, ah: Int, al: Int): Int = {
        var pos = dataStart
        var acc = 0
        var bits = 0
        var eobrun = 0
        val pred = new Array[Int](3)
        def nextBit(): Int = {
          if (bits == 0) {
            if (pos >= n) throw new IllegalStateException("eof")
            var byteV = b(pos) & 0xff
            pos += 1
            if (byteV == 0xff) {
              val m = if (pos < n) b(pos) & 0xff else 0xd9
              if (m == 0x00) pos += 1
              else throw new IllegalStateException("marker in stream")
            }
            acc = byteV
            bits = 8
          }
          bits -= 1
          (acc >> bits) & 1
        }
        def receive(nb: Int): Int = {
          var v = 0
          var k = 0
          while (k < nb) { v = (v << 1) | nextBit(); k += 1 }
          v
        }
        def extend(v: Int, t: Int): Int =
          if (t == 0) 0
          else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v
        val p1 = 1 << al
        val m1 = -(1 << al)
        def correctionBit(arr: Array[Short], z: Int): Unit =
          if (nextBit() == 1 && (arr(z) & p1) == 0)
            arr(z) = (arr(z) + (if (arr(z) >= 0) p1 else m1)).toShort

        def dcFirst(c: Int, off: Int): Unit = {
          val t = dcTabs(dcSel(c)).decode(() => nextBit())
          pred(c) += extend(receive(t), t)
          coefs(c)(off) = (pred(c) << al).toShort
        }
        def dcRefine(c: Int, off: Int): Unit =
          if (nextBit() == 1)
            coefs(c)(off) = (coefs(c)(off) | p1).toShort
        def acFirst(c: Int, off: Int): Unit = {
          if (eobrun > 0) { eobrun -= 1; return }
          val acT = acTabs(acSel(c))
          val arr = coefs(c)
          var k = ss
          var brk = false
          while (k <= se && !brk) {
            val rs = acT.decode(() => nextBit())
            val r = rs >> 4
            val s = rs & 15
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else { // EOBn: this block is run member 0
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += receive(r)
                brk = true
              }
            } else {
              k += r
              if (k > 63) throw new IllegalStateException("band overrun")
              arr(off + jpegZigzag(k)) =
                (extend(receive(s), s) << al).toShort
              k += 1
            }
          }
        }
        def acRefine(c: Int, off: Int): Unit = {
          val acT = acTabs(acSel(c))
          val arr = coefs(c)
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (k <= se && !brk) {
              val rs = acT.decode(() => nextBit())
              var r = rs >> 4
              val s = rs & 15
              var newval = 0
              if (s == 0) {
                if (r < 15) { // EOBn: corrections continue below, then
                  eobrun = 1 << r //  this block counts as run member 0
                  if (r > 0) eobrun += receive(r)
                  brk = true
                } // r == 15 (ZRL): advance 16 zero-history coefficients
              } else { // s is 1 in a refinement scan: a newly-nonzero
                newval = if (nextBit() == 1) p1 else m1
              }
              if (!brk) {
                var placed = false
                while (k <= se && !placed) {
                  val z = off + jpegZigzag(k)
                  if (arr(z) != 0) correctionBit(arr, z)
                  else if (r == 0) {
                    if (newval != 0) arr(z) = newval.toShort
                    placed = true
                  } else r -= 1
                  k += 1
                }
              }
            }
          }
          if (eobrun > 0) {
            // correction bits across the rest of the band, then this
            // block is consumed from the run
            while (k <= se) {
              val z = off + jpegZigzag(k)
              if (arr(z) != 0) correctionBit(arr, z)
              k += 1
            }
            eobrun -= 1
          }
        }
        def restart(): Unit = {
          bits = 0
          while (pos + 1 < n && !((b(pos) & 0xff) == 0xff &&
            (b(pos + 1) & 0xff) >= 0xd0 && (b(pos + 1) & 0xff) <= 0xd7))
            pos += 1
          pos += 2
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }

        if (ss == 0 && se != 0) throw new IllegalStateException("bad band")
        if (ss > 0 && scanComps.length != 1)
          throw new IllegalStateException("interleaved AC scan")
        var unitsDone = 0
        if (scanComps.length == 1) {
          // non-interleaved: walk the component's own block grid
          val c = scanComps(0)
          val bWide = ((w * compH(c) + hMax - 1) / hMax + 7) / 8
          val bHigh = ((h * compV(c) + vMax - 1) / vMax + 7) / 8
          var by = 0
          while (by < bHigh) {
            var bx = 0
            while (bx < bWide) {
              if (restartInterval > 0 && unitsDone > 0 &&
                unitsDone % restartInterval == 0) restart()
              val off = (by * blocksPerRow(c) + bx) * 64
              if (ss == 0) { if (ah == 0) dcFirst(c, off) else dcRefine(c, off) }
              else { if (ah == 0) acFirst(c, off) else acRefine(c, off) }
              unitsDone += 1
              bx += 1
            }
            by += 1
          }
        } else {
          // interleaved (DC scans only): frame MCU walk
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              if (restartInterval > 0 && unitsDone > 0 &&
                unitsDone % restartInterval == 0) restart()
              var ci = 0
              while (ci < scanComps.length) {
                val c = scanComps(ci)
                var sv = 0
                while (sv < compV(c)) {
                  var sh = 0
                  while (sh < compH(c)) {
                    val off = ((my * compV(c) + sv) * blocksPerRow(c) +
                      mx * compH(c) + sh) * 64
                    if (ah == 0) dcFirst(c, off) else dcRefine(c, off)
                    sh += 1
                  }
                  sv += 1
                }
                ci += 1
              }
              unitsDone += 1
              mx += 1
            }
            my += 1
          }
        }
        // byte-align and report where the next marker starts
        while (pos + 1 < n && !((b(pos) & 0xff) == 0xff &&
          (b(pos + 1) & 0xff) != 0x00)) pos += 1
        pos
      }

      var i = 2
      var sawEoi = false
      while (!sawEoi && i + 2 <= n) {
        if ((b(i) & 0xff) != 0xff) return None
        val marker = b(i + 1) & 0xff
        if (marker == 0xd9) sawEoi = true // EOI
        else if (marker == 0xff) i += 1 // fill byte before a marker
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7))
          i += 2 // standalone markers
        else {
          if (i + 4 > n) return None
          val len = u16be(b, i + 2)
          if (len < 2 || i + 2 + len > n) return None
          val seg = i + 4
          var advanced = false
          marker match {
            case 0xdb =>
              var p = seg
              while (p < i + 2 + len) {
                val pq = (b(p) >> 4) & 0xf
                val tq = b(p) & 0xf
                if (pq != 0) return None
                quant(tq) = Array.tabulate(64)(k => b(p + 1 + k) & 0xff)
                p += 65
              }
            case 0xc4 =>
              var p = seg
              while (p < i + 2 + len) {
                val tc = (b(p) >> 4) & 0xf
                val th = b(p) & 0xf
                val counts = Array.tabulate(16)(k => b(p + 1 + k) & 0xff)
                val nsym = counts.sum
                val symbols = Array.tabulate(nsym)(k => b(p + 17 + k) & 0xff)
                val t = new JpegHuff(counts, symbols)
                if (tc == 0) dcTabs(th) = t else acTabs(th) = t
                p += 17 + nsym
              }
            case 0xc2 =>
              if ((b(seg) & 0xff) != 8) return None // 12-bit
              h = u16be(b, seg + 1)
              w = u16be(b, seg + 3)
              nComp = b(seg + 5) & 0xff
              if (nComp != 1 && nComp != 3) return None
              if (w <= 0 || h <= 0) return None
              if (w.toLong * h * nComp > (1 << 26)) return None
              var c = 0
              while (c < nComp) {
                compId(c) = b(seg + 6 + c * 3) & 0xff
                val sf = b(seg + 7 + c * 3) & 0xff
                compH(c) = (sf >> 4) & 0xf
                compV(c) = sf & 0xf
                if (compH(c) < 1 || compH(c) > 2 ||
                  compV(c) < 1 || compV(c) > 2) return None
                compQ(c) = b(seg + 8 + c * 3) & 0xf
                c += 1
              }
              if (nComp == 1) { compH(0) = 1; compV(0) = 1 }
              hMax = (0 until nComp).map(compH).max
              vMax = (0 until nComp).map(compV).max
              mcusX = (w + 8 * hMax - 1) / (8 * hMax)
              mcusY = (h + 8 * vMax - 1) / (8 * vMax)
              blocksPerRow = Array.tabulate(nComp)(k => mcusX * compH(k))
              blockRows = Array.tabulate(nComp)(k => mcusY * compV(k))
              coefs = Array.tabulate(nComp)(k =>
                new Array[Short](blocksPerRow(k) * blockRows(k) * 64))
            case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                0xcb | 0xcd | 0xce | 0xcf =>
              return None // a second, non-progressive frame
            case 0xdd => restartInterval = u16be(b, seg)
            case 0xda =>
              if (coefs == null) return None // scan before frame
              val ns = b(seg) & 0xff
              if (ns < 1 || ns > nComp) return None
              val scanComps = new Array[Int](ns)
              val dcSel = new Array[Int](3)
              val acSel = new Array[Int](3)
              var sc = 0
              while (sc < ns) {
                val id = b(seg + 1 + sc * 2) & 0xff
                val idx = (0 until nComp).indexWhere(compId(_) == id)
                if (idx < 0) return None
                scanComps(sc) = idx
                dcSel(idx) = (b(seg + 2 + sc * 2) >> 4) & 0xf
                acSel(idx) = b(seg + 2 + sc * 2) & 0xf
                sc += 1
              }
              val ss = b(seg + 1 + 2 * ns) & 0xff
              val se = b(seg + 2 + 2 * ns) & 0xff
              val a = b(seg + 3 + 2 * ns) & 0xff
              i = decodeScan(i + 2 + len, scanComps, dcSel, acSel,
                ss, se, (a >> 4) & 0xf, a & 0xf)
              advanced = true
            case _ => () // APPn, COM, DNL, ...
          }
          if (!advanced) i += 2 + len
        }
      }
      if (coefs == null) return None
      // all scans absorbed: dequantize + IDCT each block into planes
      val planeW = Array.tabulate(nComp)(c => blocksPerRow(c) * 8)
      val planes = Array.tabulate(nComp)(c =>
        new Array[Byte](planeW(c) * blockRows(c) * 8))
      val coefD = new Array[Double](64)
      val px = new Array[Int](64)
      var c = 0
      while (c < nComp) {
        val q = quant(compQ(c))
        if (q == null) return None
        // dequant table in NATURAL order (coefficients are stored at
        // their natural positions; q is in zigzag order)
        val qNat = new Array[Int](64)
        var k = 0
        while (k < 64) { qNat(jpegZigzag(k)) = q(k); k += 1 }
        val arr = coefs(c)
        val pw = planeW(c)
        val plane = planes(c)
        var by = 0
        while (by < blockRows(c)) {
          var bx = 0
          while (bx < blocksPerRow(c)) {
            val off = (by * blocksPerRow(c) + bx) * 64
            var j = 0
            while (j < 64) {
              coefD(j) = arr(off + j).toDouble * qNat(j)
              j += 1
            }
            idctBlock(coefD, px)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                plane((by * 8 + yy) * pw + bx * 8 + xx) =
                  px(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      Some(jpegPlanesToImage(nComp, planes, planeW, compH, compV,
        hMax, vMax, w, h))
    } catch { case _: Exception => None }

  /** Minimal baseline grayscale JPEG ENCODER for DC-only fixtures:
    * every 8×8 block is flat (`dcBlocks`, raster order, the QUANTIZED
    * DC values), custom canonical Huffman tables (12 four-bit DC
    * category codes; a one-bit EOB-only AC table), quant table all
    * `qdc`. A decoded block is exactly flat at
    * `clamp(128 + dc*qdc/8)` — integer whenever dc*qdc ≡ 0 (mod 8),
    * which is what the oracle replays. */
  def jpegEncodeGrayDcOnly(w: Int, h: Int, dcBlocks: Array[Int],
      qdc: Int = 16): Array[Byte] = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    require(dcBlocks.length == bw * bh)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8) // SOI
    u16(0xffdb); u16(2 + 65); u8(0) // DQT table 0, 8-bit
    (0 until 64).foreach(_ => u8(qdc))
    u16(0xffc0); u16(8 + 3); u8(8); u16(h); u16(w); u8(1) // SOF0
    u8(1); u8(0x11); u8(0) // comp 1, 1x1, qtable 0
    // DHT: DC table 0 — 12 codes, all 4 bits, symbol k -> code k
    u16(0xffc4); u16(2 + 17 + 12 + 17 + 1)
    u8(0x00)
    val dcCounts = new Array[Int](16); dcCounts(3) = 12 // length 4
    dcCounts.foreach(u8)
    (0 until 12).foreach(u8)
    // AC table 0 — one 1-bit code for EOB (0x00)
    u8(0x10)
    val acCounts = new Array[Int](16); acCounts(0) = 1
    acCounts.foreach(u8)
    u8(0x00)
    u16(0xffda); u16(6 + 2); u8(1); u8(1); u8(0x00) // SOS
    u8(0); u8(63); u8(0)
    // entropy data
    var acc = 0
    var nbits = 0
    val data = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1)
        nbits += 1
        if (nbits == 8) {
          data.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) data.write(0x00) // stuffing
          acc = 0; nbits = 0
        }
        k -= 1
      }
    }
    var pred = 0
    dcBlocks.foreach { dc =>
      val diff = dc - pred
      pred = dc
      val mag = math.abs(diff)
      var cat = 0
      while ((1 << cat) <= mag) cat += 1
      putBits(cat, 4) // DC category (code == symbol by construction)
      if (cat > 0)
        putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      putBits(0, 1) // EOB
    }
    if (nbits > 0) putBits(0xff, 8 - nbits) // pad with 1s
    out.write(data.toByteArray)
    u16(0xffd9) // EOI
    out.toByteArray
  }

  /** Baseline COLOR (YCbCr 4:4:4) JPEG ENCODER for DC-only fixtures —
    * the 3-component twin of [[jpegEncodeGrayDcOnly]]: all three
    * components at 1×1 sampling share quant table 0 (flat `qdc`) and
    * the same DC/AC Huffman tables; each MCU interleaves one flat
    * block per component (quantized DCs from `dcY`/`dcCb`/`dcCr`,
    * raster block order). A decoded block is exactly flat at
    * `clamp(128 + dc*qdc/8)` per component BEFORE color conversion,
    * so the RGB raster is replayable through [[ycbcrToRgb]]'s integer
    * formula — which is what the `doc_jpeg_color` oracle does. */
  def jpegEncodeColorDcOnly(w: Int, h: Int, dcY: Array[Int],
      dcCb: Array[Int], dcCr: Array[Int], qdc: Int = 16): Array[Byte] = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    require(dcY.length == bw * bh && dcCb.length == bw * bh &&
      dcCr.length == bw * bh)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8) // SOI
    u16(0xffdb); u16(2 + 65); u8(0) // DQT table 0, 8-bit
    (0 until 64).foreach(_ => u8(qdc))
    u16(0xffc0); u16(8 + 9); u8(8); u16(h); u16(w); u8(3) // SOF0
    u8(1); u8(0x11); u8(0) // Y,  1x1, qtable 0
    u8(2); u8(0x11); u8(0) // Cb, 1x1, qtable 0
    u8(3); u8(0x11); u8(0) // Cr, 1x1, qtable 0
    // DHT: DC table 0 — 12 codes, all 4 bits, symbol k -> code k
    u16(0xffc4); u16(2 + 17 + 12 + 17 + 1)
    u8(0x00)
    val dcCounts = new Array[Int](16); dcCounts(3) = 12 // length 4
    dcCounts.foreach(u8)
    (0 until 12).foreach(u8)
    // AC table 0 — one 1-bit code for EOB (0x00)
    u8(0x10)
    val acCounts = new Array[Int](16); acCounts(0) = 1
    acCounts.foreach(u8)
    u8(0x00)
    u16(0xffda); u16(6 + 6) // SOS: 3 components, all DC0/AC0
    u8(3); u8(1); u8(0x00); u8(2); u8(0x00); u8(3); u8(0x00)
    u8(0); u8(63); u8(0)
    var acc = 0
    var nbits = 0
    val data = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1)
        nbits += 1
        if (nbits == 8) {
          data.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) data.write(0x00) // stuffing
          acc = 0; nbits = 0
        }
        k -= 1
      }
    }
    val preds = new Array[Int](3)
    def putBlock(c: Int, dc: Int): Unit = {
      val diff = dc - preds(c)
      preds(c) = dc
      val mag = math.abs(diff)
      var cat = 0
      while ((1 << cat) <= mag) cat += 1
      putBits(cat, 4)
      if (cat > 0)
        putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      putBits(0, 1) // EOB
    }
    var p = 0
    while (p < bw * bh) { // MCU order == block raster order at 4:4:4
      putBlock(0, dcY(p)); putBlock(1, dcCb(p)); putBlock(2, dcCr(p))
      p += 1
    }
    if (nbits > 0) putBits(0xff, 8 - nbits) // pad with 1s
    out.write(data.toByteArray)
    u16(0xffd9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE (SOF2) color JPEG ENCODER for DC-only fixtures — the
    * multi-scan twin of [[jpegEncodeColorDcOnly]]: a YCbCr 4:4:4
    * frame delivered as four scans — one interleaved DC-first scan
    * (Al=0, identical DC entropy coding to baseline) followed by one
    * AC scan per component whose entire block grid is covered by a
    * single EOB RUN (EOBn symbol r = ⌊log2 nBlocks⌋ + r appended
    * bits), so the decoder's EOB-run bookkeeping, non-interleaved
    * per-component block walks, and coefficient buffering all execute
    * while the decoded raster stays exactly flat at
    * `clamp(128 + dc*qdc/8)` per component — the same SQL-replayable
    * contract as the baseline fixtures. */
  def jpegEncodeProgDcOnly(w: Int, h: Int, dcY: Array[Int],
      dcCb: Array[Int], dcCr: Array[Int], qdc: Int = 16): Array[Byte] = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    require(dcY.length == bw * bh && dcCb.length == bw * bh &&
      dcCr.length == bw * bh)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    u16(0xffd8) // SOI
    u16(0xffdb); u16(2 + 65); u8(0) // DQT table 0, 8-bit
    (0 until 64).foreach(_ => u8(qdc))
    u16(0xffc2); u16(8 + 9); u8(8); u16(h); u16(w); u8(3) // SOF2
    u8(1); u8(0x11); u8(0) // Y,  1x1, qtable 0
    u8(2); u8(0x11); u8(0) // Cb, 1x1, qtable 0
    u8(3); u8(0x11); u8(0) // Cr, 1x1, qtable 0
    // DHT: DC table 0 — 12 codes, all 4 bits, symbol k -> code k;
    // AC table 0 — 15 codes, all 4 bits, symbol r<<4 (EOBn) -> code r
    u16(0xffc4); u16(2 + 17 + 12 + 17 + 15)
    u8(0x00)
    val dcCounts = new Array[Int](16); dcCounts(3) = 12 // length 4
    dcCounts.foreach(u8)
    (0 until 12).foreach(u8)
    u8(0x10)
    val acCounts = new Array[Int](16); acCounts(3) = 15 // length 4
    acCounts.foreach(u8)
    (0 until 15).foreach(r => u8(r << 4))

    var acc = 0
    var nbits = 0
    var data = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, nb: Int): Unit = {
      var k = nb - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1)
        nbits += 1
        if (nbits == 8) {
          data.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) data.write(0x00) // stuffing
          acc = 0; nbits = 0
        }
        k -= 1
      }
    }
    def flushScan(): Unit = {
      if (nbits > 0) putBits(0xff, 8 - nbits) // pad with 1s
      out.write(data.toByteArray)
      data = new java.io.ByteArrayOutputStream()
    }

    // scan 1: DC first, all three components, interleaved, Ah=0 Al=0
    u16(0xffda); u16(6 + 6)
    u8(3); u8(1); u8(0x00); u8(2); u8(0x00); u8(3); u8(0x00)
    u8(0); u8(0); u8(0) // Ss=0 Se=0 AhAl=0
    val preds = new Array[Int](3)
    def putDc(c: Int, dc: Int): Unit = {
      val diff = dc - preds(c)
      preds(c) = dc
      val mag = math.abs(diff)
      var cat = 0
      while ((1 << cat) <= mag) cat += 1
      putBits(cat, 4)
      if (cat > 0)
        putBits(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
    }
    var p = 0
    while (p < bw * bh) {
      putDc(0, dcY(p)); putDc(1, dcCb(p)); putDc(2, dcCr(p))
      p += 1
    }
    flushScan()

    // scans 2-4: AC band 1..63 per component, one EOB run covering
    // the whole block grid (run = nBlocks: EOBn r = floor(log2 run),
    // then r bits of run - 2^r)
    var comp = 1
    while (comp <= 3) {
      u16(0xffda); u16(6 + 2)
      u8(1); u8(comp); u8(0x00)
      u8(1); u8(63); u8(0) // Ss=1 Se=63 AhAl=0
      val nBlocks = bw * bh
      var r = 0
      while ((1 << (r + 1)) <= nBlocks) r += 1
      putBits(r, 4) // EOBn symbol r<<4 has canonical code r
      if (r > 0) putBits(nBlocks - (1 << r), r)
      flushScan()
      comp += 1
    }
    u16(0xffd9) // EOI
    out.toByteArray
  }

  /** Nearest-neighbor resample — the deterministic integer kernel
    * (source coord = floor(target * src / dst), the standard
    * box-corner mapping): bit-exact across JVMs and replayable in SQL,
    * which a convolution kernel's float rounding would not be. */
  def resampleNearest(img: PngImage, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * img.channels)
    var ty = 0
    while (ty < th) {
      val sy = ty * img.height / th
      var tx = 0
      while (tx < tw) {
        val sx = tx * img.width / tw
        var c = 0
        while (c < img.channels) {
          out((ty * tw + tx) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    out
  }

  // ── Audio / video container headers (dependency-free) ────────────────
  // Same philosophy as the image headers: the metadata a pipeline
  // catalogs (sample rate, channel count, duration) lives in trivially
  // parseable container structures — WAV's RIFF chunks and MP4's
  // ISO-BMFF box tree — and never needs a codec.

  /** (channels, sampleRate, bitsPerSample, durationMs) from a WAV/RIFF
    * header: chunk-walks to 'fmt ' and 'data' (chunks are word-aligned,
    * so odd sizes skip a pad byte). Duration = data bytes / byte rate. */
  def decodeWavHeader(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    // Long offset: a corrupt chunk size just under 2^31 would wrap an
    // Int offset negative and index out of bounds instead of ending
    // the walk
    var i = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // ch, rate, byteRate, bits
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val o = i.toInt
      val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = i32le(b, o + 4).toLong & 0xffffffffL
      if (id == "fmt " && i + 24 <= b.length)
        fmt = Some((u16le(b, o + 10), i32le(b, o + 12), i32le(b, o + 16),
          u16le(b, o + 22)))
      if (id == "data") dataLen = size
      i += 8 + size + (size & 1)
    }
    fmt.collect {
      case (ch, rate, byteRate, bits)
          if dataLen >= 0 && byteRate > 0 && ch > 0 && rate > 0 =>
        (ch, rate, bits, dataLen * 1000L / byteRate)
    }
  }

  /** Duration in ms from an MP4 (ISO BMFF) moov/mvhd box, version 0 or
    * 1. Top-level box walk to moov, child walk to mvhd; 64-bit
    * largesize boxes are out of scope (None). */
  def decodeMp4Header(b: Array[Byte]): Option[Long] = {
    def boxWalk(from: Int, to: Int, name: String): Option[Int] = {
      var i = from
      while (i + 8 <= to) {
        val size = i32be(b, i).toLong & 0xffffffffL
        val typ = new String(b, i + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        if (typ == name) return Some(i)
        if (size < 8 || size > to - i) return None // largesize / corrupt
        i += size.toInt
      }
      None
    }
    // a plausible file starts with a well-formed box of known type
    if (b.length < 16) return None
    val firstType = new String(b, 4, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    if (!Set("ftyp", "moov", "mdat", "free", "wide", "styp")
      .contains(firstType)) return None
    for {
      moov <- boxWalk(0, b.length, "moov")
      moovEnd = moov + (i32be(b, moov).toLong & 0xffffffffL).toInt
      mvhd <- boxWalk(moov + 8, math.min(moovEnd, b.length), "mvhd")
      // boxWalk only guarantees mvhd+8 bytes exist — guard BEFORE
      // reading the version byte (a truncated mvhd must yield None,
      // not an index error that kills the task)
      if mvhd + 9 <= b.length
      ver = b(mvhd + 8) & 0xff
      if mvhd + (if (ver == 1) 40 else 32) <= b.length
      timescale = (if (ver == 1) i32be(b, mvhd + 28)
                   else i32be(b, mvhd + 20)).toLong & 0xffffffffL
      duration = if (ver == 1)
        ((i32be(b, mvhd + 32).toLong & 0xffffffffL) << 32) |
          (i32be(b, mvhd + 36).toLong & 0xffffffffL)
      else i32be(b, mvhd + 24).toLong & 0xffffffffL
      if timescale > 0
    } yield duration * 1000L / timescale
  }

  /** One demuxed MP4 sample: index, absolute byte offset into the
    * file, size in bytes, presentation time in ms. */
  final case class Mp4Sample(idx: Int, offset: Long, size: Long,
      tsMs: Long)

  /** REAL MP4 (ISO-BMFF) sample-table demux — no codec needed: frame
    * LOCATIONS and TIMING live entirely in the `stbl` box family.
    * Walks moov → trak → mdia → (mdhd timescale) → minf → stbl, then
    * derives per-sample (offset, size, ts) from stsz (sizes), stco
    * (chunk offsets), stsc (sample→chunk runs) and stts (time
    * deltas) — the standard quadruple every demuxer resolves. First
    * track only (the fixture corpus is single-track; a multi-track
    * variant is one more loop); co64/largesize out of scope → None.
    * Decoding the frame BYTES would need a codec — but a training
    * pipeline's frame SAMPLER only needs these offsets to slice
    * `mdat`, which is exactly what this returns. */
  def demuxMp4Samples(b: Array[Byte]): Option[Seq[Mp4Sample]] =
    try {
      def walk(from: Int, to: Int, name: String): Option[Int] = {
        var i = from
        while (i + 8 <= to) {
          val size = i32be(b, i).toLong & 0xffffffffL
          val typ = new String(b, i + 4, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          if (typ == name) return Some(i)
          if (size < 8 || size > to - i) return None
          i += size.toInt
        }
        None
      }
      def boxEnd(at: Int): Int =
        at + (i32be(b, at).toLong & 0xffffffffL).toInt
      if (b.length < 16) return None
      val moov = walk(0, b.length, "moov").getOrElse(return None)
      val trak = walk(moov + 8, math.min(boxEnd(moov), b.length), "trak")
        .getOrElse(return None)
      val trakEnd = math.min(boxEnd(trak), b.length)
      val mdia = walk(trak + 8, trakEnd, "mdia").getOrElse(return None)
      val mdiaEnd = math.min(boxEnd(mdia), b.length)
      val mdhd = walk(mdia + 8, mdiaEnd, "mdhd").getOrElse(return None)
      if (mdhd + 24 > b.length) return None
      val mdhdVer = b(mdhd + 8) & 0xff
      val timescale = (if (mdhdVer == 1) i32be(b, mdhd + 28)
        else i32be(b, mdhd + 20)).toLong & 0xffffffffL
      if (timescale <= 0) return None
      val minf = walk(mdia + 8, mdiaEnd, "minf").getOrElse(return None)
      val minfEnd = math.min(boxEnd(minf), b.length)
      val stbl = walk(minf + 8, minfEnd, "stbl").getOrElse(return None)
      val stblEnd = math.min(boxEnd(stbl), b.length)

      // stsz: uniform size or per-sample table
      val stsz = walk(stbl + 8, stblEnd, "stsz").getOrElse(return None)
      val uniform = i32be(b, stsz + 12).toLong & 0xffffffffL
      val nSamples = i32be(b, stsz + 16)
      if (nSamples < 0 || nSamples > 100000) return None
      val sizes = Array.tabulate(nSamples)(k =>
        if (uniform != 0) uniform
        else i32be(b, stsz + 20 + 4 * k).toLong & 0xffffffffL)

      // stco: chunk offsets (u32 form)
      val stco = walk(stbl + 8, stblEnd, "stco").getOrElse(return None)
      val nChunks = i32be(b, stco + 12)
      if (nChunks <= 0 || nChunks > 100000) return None
      val chunkOff = Array.tabulate(nChunks)(c =>
        i32be(b, stco + 16 + 4 * c).toLong & 0xffffffffL)

      // stsc: (firstChunk, samplesPerChunk) runs → per-chunk counts
      val stsc = walk(stbl + 8, stblEnd, "stsc").getOrElse(return None)
      val nRuns = i32be(b, stsc + 12)
      if (nRuns <= 0 || nRuns > 100000) return None
      val runs = Array.tabulate(nRuns)(r =>
        (i32be(b, stsc + 16 + 12 * r), i32be(b, stsc + 20 + 12 * r)))
      val perChunk = Array.tabulate(nChunks) { c =>
        // the run governing chunk c+1 (1-based) is the last run whose
        // firstChunk <= c+1
        var spc = runs(0)._2
        var r = 0
        while (r < nRuns && runs(r)._1 <= c + 1) { spc = runs(r)._2; r += 1 }
        spc
      }

      // stts: (count, delta) runs → per-sample decode timestamps
      val stts = walk(stbl + 8, stblEnd, "stts").getOrElse(return None)
      val nTts = i32be(b, stts + 12)
      if (nTts < 0 || nTts > 100000) return None

      val out = Vector.newBuilder[Mp4Sample]
      var sample = 0
      var chunk = 0
      var inChunk = 0
      var off = if (nChunks > 0) chunkOff(0) else 0L
      var ts = 0L
      var ttsRun = 0
      var ttsLeft = if (nTts > 0) i32be(b, stts + 16) else 0
      var ttsDelta = if (nTts > 0) i32be(b, stts + 20).toLong else 0L
      while (sample < nSamples && chunk < nChunks) {
        out += Mp4Sample(sample, off, sizes(sample),
          ts * 1000L / timescale)
        off += sizes(sample)
        ts += ttsDelta
        ttsLeft -= 1
        if (ttsLeft == 0 && ttsRun + 1 < nTts) {
          ttsRun += 1
          ttsLeft = i32be(b, stts + 16 + 8 * ttsRun)
          ttsDelta = i32be(b, stts + 20 + 8 * ttsRun).toLong
        }
        inChunk += 1
        if (inChunk >= perChunk(chunk)) {
          chunk += 1
          inChunk = 0
          if (chunk < nChunks) off = chunkOff(chunk)
        }
        sample += 1
      }
      val samples = out.result()
      if (samples.size != nSamples) return None // tables disagree
      Some(samples)
    } catch { case _: Exception => None }

  /** Minimal single-track ISO-BMFF fixture with REAL sample tables:
    * ftyp, then `mdat` (payload FIRST so stco offsets are known
    * before moov is assembled — a legal and common layout), then
    * moov(mvhd, trak(mdia(mdhd, minf(stbl(stts, stsc, stsz,
    * stco))))). The mdat payload starts at byte 24 (16-byte ftyp +
    * 8-byte mdat header) — the constant the demux oracle replays.
    * Single chunk; `deltas` in timescale units. */
  def mp4Fixture(sizes: Seq[Long], deltas: Seq[Long],
      timescale: Int = 1000): Array[Byte] = {
    require(sizes.length == deltas.length)
    def be(v: Int): Array[Byte] = Array((v >> 24).toByte,
      (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be(body.length + 8) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be(0)) // 16 bytes
    val payload = new Array[Byte](sizes.map(_.toInt).sum)
    java.util.Arrays.fill(payload, 0x5a.toByte)
    val mdat = box("mdat", payload)
    val dataStart = ftyp.length + 8 // 24
    val full = 0 // version+flags
    val stts = box("stts", be(full) ++ be(deltas.length) ++
      deltas.toArray.flatMap(d => be(1) ++ be(d.toInt)))
    val stsc = box("stsc", be(full) ++ be(1) ++
      be(1) ++ be(sizes.length) ++ be(1))
    val stsz = box("stsz", be(full) ++ be(0) ++ be(sizes.length) ++
      sizes.toArray.flatMap(sz => be(sz.toInt)))
    val stco = box("stco", be(full) ++ be(1) ++ be(dataStart))
    val stbl = box("stbl", stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val mdhd = box("mdhd", be(full) ++ be(0) ++ be(0) ++
      be(timescale) ++ be(deltas.map(_.toInt).sum))
    val mdia = box("mdia", mdhd ++ minf)
    val trak = box("trak", mdia)
    val mvhd = box("mvhd", be(full) ++ be(0) ++ be(0) ++
      be(timescale) ++ be(deltas.map(_.toInt).sum))
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  // ── AVI / MJPEG: real video FRAME decode ─────────────────────────────
  // Motion-JPEG needs no inter-frame codec — every '00dc' chunk in the
  // RIFF 'movi' list IS a complete JPEG, so the from-spec RIFF walk
  // (the same container family as WAV) plus [[decodeJpegPixels]]
  // yields REAL video pixel decode with zero dependencies. H.264 etc.
  // remain codec-bound; MJPEG is the codec a dependency-free engine
  // CAN own, and it is a real archival/capture format.

  /** One demuxed AVI video frame: index, absolute byte offset into
    * the file, size in bytes, presentation time in ms. */
  final case class AviFrame(idx: Int, offset: Long, size: Long,
      tsMs: Long)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "ISO-8859-1")

  /** Parsed AVI video stream: frame period, geometry, codec identity
    * (strh fccHandler + strf biCompression/biBitCount), the strf
    * palette (BGRA quads, 8-bit streams), and the demuxed frame
    * locations. `vidStream` is the RESOLVED video stream index — the
    * position of the 'vids' strh in strl declaration order, NOT an
    * assumed stream 0 (an AVI that declares audio first carries its
    * video as '01dc'/'01db'). */
  final case class AviVideo(usPerFrame: Long, w: Int, h: Int,
      vidStream: Int, handler: String, bitCount: Int, compression: Int,
      palette: Array[Byte], frames: Seq[AviFrame],
      topDown: Boolean = false)

  /** REAL AVI (RIFF) demux: walks LIST 'hdrl' for the `avih` frame
    * period and the strl sequence (strh 'vids' resolves WHICH stream
    * index is video; its strf BITMAPINFOHEADER gives geometry, bit
    * depth, biCompression, and the palette), then LIST 'movi' for
    * that stream's 'NNdc'/'NNdb' chunks, honoring RIFF word
    * alignment. Returns None when the container isn't an AVI or holds
    * no video chunks. Files with no hdrl at all fall back to stream
    * 00 — demux-tolerant, decode still declines. */
  def demuxAvi(b: Array[Byte]): Option[AviVideo] =
    try {
      if (b.length < 24 || fourcc(b, 0) != "RIFF" ||
        fourcc(b, 8) != "AVI ") return None
      var usPerFrame = 0L
      var streamCount = 0
      var vidStream = -1
      var handler = ""
      var captureStrf = false
      var w = 0
      var h = 0
      var topDown = false
      var bitCount = 0
      var compression = -1
      var palette: Array[Byte] = Array.emptyByteArray
      val frames = Vector.newBuilder[(Long, Long)]
      def framePrefix: String =
        if (vidStream < 0) "00" else f"$vidStream%02d"
      def walkChunks(from: Int, to: Int): Unit = {
        var i = from
        var ok = true
        while (ok && i + 8 <= to) {
          val id = fourcc(b, i)
          val size = i32le(b, i + 4).toLong & 0xffffffffL
          val body = i + 8
          if (body + size > to) ok = false
          else {
            if (id == "LIST" && size >= 4) {
              val ltype = fourcc(b, body)
              if (ltype == "hdrl" || ltype == "movi" || ltype == "strl" ||
                ltype == "rec ")
                walkChunks(body + 4, body + size.toInt)
            } else if (id == "avih" && size >= 4) {
              usPerFrame = i32le(b, body).toLong & 0xffffffffL
            } else if (id == "strh" && size >= 8) {
              val isVids = fourcc(b, body) == "vids" && vidStream < 0
              if (isVids) {
                vidStream = streamCount
                handler = fourcc(b, body + 4)
              }
              captureStrf = isVids
              streamCount += 1
            } else if (id == "strf" && captureStrf && size >= 20) {
              val biSize = i32le(b, body)
              w = i32le(b, body + 4)
              val rawH = i32le(b, body + 8)
              // negative biHeight = TOP-DOWN DIB (legal for BI_RGB per
              // BITMAPINFOHEADER); the row flip must be skipped or the
              // stream decodes vertically mirrored (r19 ADVICE)
              h = math.abs(rawH)
              topDown = rawH < 0
              bitCount = u16le(b, body + 14)
              compression = i32le(b, body + 16)
              if (bitCount == 8 && biSize >= 36 && size > biSize) {
                val clrUsed = {
                  val n = i32le(b, body + 32)
                  if (n == 0) 256 else n
                }
                val palLen = math.min(clrUsed * 4L,
                  size - biSize).toInt
                palette = java.util.Arrays.copyOfRange(b, body + biSize,
                  body + biSize + palLen)
              }
              captureStrf = false
            } else if (id.length == 4 && id.startsWith(framePrefix) &&
              (id.endsWith("dc") || id.endsWith("db"))) {
              frames += ((body.toLong, size))
            }
            i = body + size.toInt + (size.toInt & 1) // word alignment
          }
        }
      }
      walkChunks(12, b.length)
      val fs = frames.result()
      if (fs.isEmpty) None
      else Some(AviVideo(usPerFrame, w, h, math.max(0, vidStream),
        handler, bitCount, compression, palette, topDown = topDown,
        frames =
        fs.zipWithIndex.map { case ((off, sz), k) =>
          AviFrame(k, off, sz, k * usPerFrame / 1000L)
        }))
    } catch { case _: Exception => None }

  /** Frame-location compat view of [[demuxAvi]]. */
  def demuxAviFrames(b: Array[Byte]): Option[Seq[AviFrame]] =
    demuxAvi(b).map(_.frames)

  /** Raw DIB frame (the pixel block of a BMP without its file
    * header, as AVI '00db'/'00dc' chunks carry for BI_RGB/BI_RLE8
    * streams) → raster. 24-bit BGR bottom-up padded rows; 8-bit
    * palette rows; RLE8 run decoding (end-of-line / end-of-bitmap /
    * delta escapes per the public BMP spec). Anything else declines —
    * right or absent. */
  def decodeDibPixels(w: Int, h: Int, bitCount: Int, compression: Int,
      palette: Array[Byte], data: Array[Byte],
      topDown: Boolean = false): Option[PngImage] =
    try {
      if (w <= 0 || h <= 0 || w.toLong * h > (1 << 26)) return None
      // top-down (negative biHeight) is legal ONLY for uncompressed
      // DIBs per the BMP spec; a top-down RLE8 stream is malformed
      if (topDown && compression != 0) return None
      def palRgb(out: Array[Byte], o: Int, idx: Int): Boolean = {
        val p = idx * 4
        if (p + 3 > palette.length) return false
        out(o) = palette(p + 2); out(o + 1) = palette(p + 1)
        out(o + 2) = palette(p)
        true
      }
      if (compression == 0 && bitCount == 24) {
        val stride = ((24 * w + 31) / 32) * 4
        if (stride.toLong * h > data.length) return None
        val out = new Array[Byte](w * h * 3)
        var row = 0
        while (row < h) {
          val rowOff =
            (if (topDown) row else h - 1 - row) * stride
          var x = 0
          while (x < w) {
            val o = (row * w + x) * 3
            val p = rowOff + x * 3
            out(o) = data(p + 2); out(o + 1) = data(p + 1)
            out(o + 2) = data(p)
            x += 1
          }
          row += 1
        }
        Some(PngImage(w, h, 3, out))
      } else if (compression == 0 && bitCount == 8) {
        val stride = ((8 * w + 31) / 32) * 4
        if (stride.toLong * h > data.length) return None
        val out = new Array[Byte](w * h * 3)
        var row = 0
        while (row < h) {
          val rowOff =
            (if (topDown) row else h - 1 - row) * stride
          var x = 0
          while (x < w) {
            if (!palRgb(out, (row * w + x) * 3, data(rowOff + x) & 0xff))
              return None
            x += 1
          }
          row += 1
        }
        Some(PngImage(w, h, 3, out))
      } else if (compression == 1 && bitCount == 8) { // BI_RLE8
        val idxRaster = new Array[Int](w * h)
        java.util.Arrays.fill(idxRaster, -1)
        if (!decodeRle8Into(idxRaster, w, h, data)) return None
        val out = new Array[Byte](w * h * 3)
        var j = 0
        while (j < idxRaster.length) {
          val v = idxRaster(j)
          if (v >= 0 && !palRgb(out, j * 3, v)) return None
          j += 1
        }
        Some(PngImage(w, h, 3, out))
      } else None
    } catch { case _: Exception => None }

  /** One RLE8 frame decoded ONTO an existing index canvas (top-down
    * row-major, -1 = never painted). Pixels the frame's runs and
    * escapes never touch KEEP their canvas value — which is exactly
    * what makes RLE8 an INTER-FRAME codec (Microsoft RLE): a delta
    * frame encodes only the changed pixels via delta-jumps + runs and
    * inherits the rest from the previous frame. False on malformed
    * framing (cursor overrun, missing end-of-bitmap). */
  private def decodeRle8Into(canvas: Array[Int], w: Int, h: Int,
      data: Array[Byte]): Boolean = {
    var x = 0
    var y = 0 // bottom-up row cursor
    var i = 0
    var eob = false
    def put(v: Int): Boolean = {
      if (y >= h || x >= w) return false
      canvas((h - 1 - y) * w + x) = v // flip to top-down
      x += 1
      true
    }
    while (!eob && i + 1 < data.length) {
      val n = data(i) & 0xff
      val v = data(i + 1) & 0xff
      i += 2
      if (n > 0) { // run
        var k = 0
        while (k < n) { if (!put(v)) return false; k += 1 }
      } else v match {
        case 0 => x = 0; y += 1 // end of line
        case 1 => eob = true // end of bitmap
        case 2 => // delta: cursor jump, underlying pixels untouched
          if (i + 1 >= data.length) return false
          x += data(i) & 0xff; y += data(i + 1) & 0xff
          i += 2
        case m => // absolute mode, word-aligned
          var k = 0
          while (k < m) {
            if (i >= data.length || !put(data(i) & 0xff)) return false
            i += 1; k += 1
          }
          if ((m & 1) == 1) i += 1
      }
    }
    eob
  }

  /** REAL video frame PIXEL decode across the AVI codecs a
    * dependency-free engine can own: MJPEG ('MJPG' chunks are whole
    * JPEGs → the full JPEG path), BI_RGB 24/8-bit DIB frames, and
    * BI_RLE8 — decoded as the INTER-FRAME codec it is (Microsoft
    * RLE): one index canvas persists across the stream, each frame's
    * runs paint onto it, and delta frames that encode only changed
    * pixels inherit everything else from the previous frame. Frames
    * must therefore decode in stream order. All-or-nothing — a frame
    * that fails to decode declines the whole payload (right or
    * absent). */
  def decodeAviVideoFrames(b: Array[Byte]): Option[Seq[PngImage]] =
    demuxAvi(b).flatMap { v =>
      // persistent canvas for the RLE8 inter-frame path
      val canvas =
        // top-down RLE8 is out-of-spec (negative biHeight is legal
        // only for uncompressed DIBs) — decline rather than mirror
        if (v.compression == 1 && v.bitCount == 8 && !v.topDown &&
          v.w > 0 && v.h > 0 &&
          v.w.toLong * v.h <= (1 << 26)) {
          val c = new Array[Int](v.w * v.h)
          java.util.Arrays.fill(c, -1)
          c
        } else null
      def canvasSnapshot(): Option[PngImage] = {
        val out = new Array[Byte](v.w * v.h * 3)
        var j = 0
        while (j < canvas.length) {
          val idx = canvas(j)
          if (idx >= 0) {
            val p = idx * 4
            if (p + 3 > v.palette.length) return None
            out(j * 3) = v.palette(p + 2)
            out(j * 3 + 1) = v.palette(p + 1)
            out(j * 3 + 2) = v.palette(p)
          }
          j += 1
        }
        Some(PngImage(v.w, v.h, 3, out))
      }
      val imgs = v.frames.map { f =>
        if (f.offset + f.size > b.length || f.size <= 0) None
        else {
          val chunk = java.util.Arrays.copyOfRange(b, f.offset.toInt,
            (f.offset + f.size).toInt)
          // strf metadata decides the codec; the JPEG-magic sniff is
          // only for header-less containers (a DIB frame's first two
          // bytes can collide with the JPEG SOI by chance)
          if (v.handler == "MJPG") decodeJpegPixels(chunk)
          else if (canvas != null) {
            if (decodeRle8Into(canvas, v.w, v.h, chunk)) canvasSnapshot()
            else None
          } else if (v.compression == 0)
            decodeDibPixels(v.w, v.h, v.bitCount, v.compression,
              v.palette, chunk, v.topDown)
          else if (chunk.length >= 2 && (chunk(0) & 0xff) == 0xff &&
            (chunk(1) & 0xff) == 0xd8) decodeJpegPixels(chunk)
          else None
        }
      }
      if (imgs.nonEmpty && imgs.forall(_.isDefined)) Some(imgs.map(_.get))
      else None
    }

  /** MJPEG compat view of [[decodeAviVideoFrames]] (same decline
    * contract; DIB streams now also decode rather than declining). */
  def decodeMjpegFrames(b: Array[Byte]): Option[Seq[PngImage]] =
    decodeAviVideoFrames(b)

  /** Minimal MJPEG AVI encoder (fixture-builder twin): RIFF('AVI ')
    * with LIST hdrl (avih carrying µs/frame and geometry; strl with a
    * 'vids'/'MJPG' strh and a BITMAPINFOHEADER strf) and LIST movi of
    * '00dc' JPEG chunks, word-aligned. Enough structure that any
    * spec-conforming demuxer — ours included — resolves the frames. */
  def aviEncodeMjpeg(w: Int, h: Int, usPerFrame: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 24) & 0xff).toInt)
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(id.getBytes("ISO-8859-1"))
      val sz = body.length
      o.write(sz & 0xff); o.write((sz >> 8) & 0xff)
      o.write((sz >> 16) & 0xff); o.write((sz >> 24) & 0xff)
      o.write(body)
      if ((sz & 1) == 1) o.write(0) // word alignment
      o.toByteArray
    }
    def list(ltype: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", ltype.getBytes("ISO-8859-1") ++ body)
    def le32(vs: Long*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      vs.foreach { v =>
        o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt)
        o.write(((v >> 24) & 0xff).toInt)
      }
      o.toByteArray
    }
    val n = jpegFrames.length
    val maxSz = if (n == 0) 0 else jpegFrames.map(_.length).max
    val avih = chunk("avih", le32(usPerFrame, 0, 0, 0x10, n, 0, 1,
      maxSz, w, h, 0, 0, 0, 0))
    val strh = chunk("strh",
      "vids".getBytes("ISO-8859-1") ++ "MJPG".getBytes("ISO-8859-1") ++
        le32(0, 0, 0, 1000000L / math.max(1, usPerFrame), /* rate/scale */
          0, n, maxSz, -1L & 0xffffffffL, 0, 0) ++ le32(0))
    val strf = chunk("strf", le32(40, w, h, (24 << 16) | 1,
      0x47504A4DL /* 'MJPG' */, w.toLong * h * 3, 0, 0, 0, 0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    tag("RIFF"); u32(body.length.toLong); out.write(body)
    out.toByteArray
  }

  /** Top-down RGB raster → raw DIB frame bytes (bottom-up padded BGR
    * rows) — the inverse of [[decodeDibPixels]]'s 24-bit path, which
    * is what makes the round-trip a real check. */
  def dibFromRgb24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val stride = ((24 * w + 31) / 32) * 4
    val out = new Array[Byte](stride * h)
    var row = 0
    while (row < h) {
      val dstOff = (h - 1 - row) * stride
      var x = 0
      while (x < w) {
        val s = (row * w + x) * 3
        val d = dstOff + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      row += 1
    }
    out
  }

  /** Top-down palette-index raster → BI_RLE8 frame bytes: per
    * bottom-up row, maximal runs as (count, index) pairs, an
    * end-of-line escape after each row, end-of-bitmap at the end. */
  def rle8FromIndices(w: Int, h: Int, idx: Array[Byte]): Array[Byte] = {
    require(idx.length == w * h)
    val out = new java.io.ByteArrayOutputStream()
    var row = h - 1 // bottom-up emission order
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val v = idx(row * w + x) & 0xff
        var run = 1
        while (x + run < w && run < 255 &&
          (idx(row * w + x + run) & 0xff) == v) run += 1
        out.write(run); out.write(v)
        x += run
      }
      out.write(0); out.write(0) // end of line
      row -= 1
    }
    out.write(0); out.write(1) // end of bitmap
    out.toByteArray
  }

  /** Sparse RLE8 DELTA frame (fixture-builder twin of the Microsoft
    * RLE inter-frame form): encodes ONLY `updates` — (top-down pixel
    * index → palette index) — via EOL/delta cursor jumps plus
    * single-pixel runs, so every untouched pixel inherits the
    * previous frame's canvas. */
  def rle8DeltaFrame(w: Int, h: Int,
      updates: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // bottom-up row order, ascending column — the only direction the
    // cursor escapes can move
    val ordered = updates.map { case (p, v) =>
      (h - 1 - p / w, p % w, v)
    }.sortBy(t => (t._1, t._2))
    var cy = 0
    var cx = 0
    ordered.foreach { case (y, c, v) =>
      while (cy < y) { out.write(0); out.write(0); cy += 1; cx = 0 } // EOL
      if (c > cx) { // delta: jump right, pixels underneath untouched
        out.write(0); out.write(2); out.write(c - cx); out.write(0)
      }
      out.write(1); out.write(v) // single-pixel run
      cx = c + 1
    }
    out.write(0); out.write(1) // end of bitmap
    out.toByteArray
  }

  /** DIB-stream AVI encoder (fixture-builder twin of
    * [[aviEncodeMjpeg]] for the uncompressed/RLE8 codecs): RIFF
    * ('AVI ') with avih + one strl per stream — and, when
    * `audioFirst`, a minimal 'auds' strl DECLARED BEFORE the video
    * one, so the video chunks are '01db'/'01dc' and only a demuxer
    * that resolves the stream index from strh order finds them. strf
    * is a real BITMAPINFOHEADER (biBitCount/biCompression/biClrUsed +
    * appended BGRA palette for 8-bit). `frameData` are raw DIB frame
    * bytes ([[dibFromRgb24]] / [[rle8FromIndices]] output). */
  def aviEncodeDib(w: Int, h: Int, usPerFrame: Int,
      frameData: Seq[Array[Byte]], bitCount: Int, compression: Int,
      palette: Array[Byte] = Array.emptyByteArray,
      audioFirst: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 24) & 0xff).toInt)
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(id.getBytes("ISO-8859-1"))
      val sz = body.length
      o.write(sz & 0xff); o.write((sz >> 8) & 0xff)
      o.write((sz >> 16) & 0xff); o.write((sz >> 24) & 0xff)
      o.write(body)
      if ((sz & 1) == 1) o.write(0)
      o.toByteArray
    }
    def list(ltype: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", ltype.getBytes("ISO-8859-1") ++ body)
    def le32(vs: Long*): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      vs.foreach { v =>
        o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
        o.write(((v >> 16) & 0xff).toInt)
        o.write(((v >> 24) & 0xff).toInt)
      }
      o.toByteArray
    }
    val n = frameData.length
    val maxSz = if (n == 0) 0 else frameData.map(_.length).max
    val avih = chunk("avih", le32(usPerFrame, 0, 0, 0x10, n, 0,
      if (audioFirst) 2 else 1, maxSz, w, h, 0, 0, 0, 0))
    val audioStrl = list("strl",
      chunk("strh", "auds".getBytes("ISO-8859-1") ++ le32(0) ++
        le32(0, 0, 0, 8000, 0, 0, 0, 0, 0) ++ le32(0)) ++
        chunk("strf", le32(1 | (1L << 16), 8000, 8000, 1 | (8L << 16))))
    val videoStrl = list("strl",
      chunk("strh",
        "vids".getBytes("ISO-8859-1") ++ "DIB ".getBytes("ISO-8859-1") ++
          le32(0, 0, 0, 1000000L / math.max(1, usPerFrame),
            0, n, maxSz, -1L & 0xffffffffL, 0, 0) ++ le32(0)) ++
        chunk("strf", le32(40, w, h, (bitCount.toLong << 16) | 1,
          compression, 0, 0, 0, palette.length / 4, 0) ++ palette))
    val hdrl = list("hdrl", avih ++
      (if (audioFirst) audioStrl ++ videoStrl else videoStrl))
    val prefix = if (audioFirst) "01" else "00"
    val fid = prefix + (if (compression == 1) "dc" else "db")
    val movi = list("movi",
      frameData.flatMap(f => chunk(fid, f)).toArray)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    tag("RIFF"); u32(body.length.toLong); out.write(body)
    out.toByteArray
  }

  /** Binary corpus → one typed-metadata row per payload, dispatching on
    * the real container headers: images get dimensions, WAV audio gets
    * channel/rate/duration, MP4 video gets duration; unrecognized
    * payloads are cataloged as opaque (no fabricated values). Pure
    * per-row map, zero shuffle. */
  def mediaMeta(s: SparkSession, binaries: DataFrame): DataFrame = {
    import s.implicits._
    binaries.select("path", "mime", "content")
      .as[(String, String, Array[Byte])]
      .map { case (path, mime, bytes) =>
        val sha = TextUtil.sha256HexBytes(bytes)
        decodeImageHeader(bytes) match {
          case Some((w, h, c)) =>
            (path, mime, bytes.length.toLong, sha, "image",
              Some(w), Some(h), Some(c), None: Option[Int], None: Option[Long])
          case None => decodeWavHeader(bytes) match {
            case Some((ch, rate, _, durMs)) =>
              (path, mime, bytes.length.toLong, sha, "audio",
                None, None, Some(ch), Some(rate), Some(durMs))
            case None => decodeMp4Header(bytes) match {
              case Some(durMs) =>
                (path, mime, bytes.length.toLong, sha, "video",
                  None, None, None, None, Some(durMs))
              case None =>
                (path, mime, bytes.length.toLong, sha, "opaque",
                  None, None, None, None, None)
            }
          }
        }
      }
      .toDF("path", "mime", "n_bytes", "sha", "kind", "width", "height",
        "channels", "sample_rate", "duration_ms")
  }

  /** Fallback for payloads without a recognizable image header:
    * deterministic fake dimensions from the payload hash, so non-image
    * media (audio, video containers) still flow through the metadata
    * pipeline with stable values. */
  def decodeStub(bytes: Array[Byte], sha: String): (Int, Int, Int) = {
    val w = 64 + (java.lang.Long.parseLong(sha.substring(0, 4), 16) % 1024).toInt
    val h = 64 + (java.lang.Long.parseLong(sha.substring(4, 8), 16) % 1024).toInt
    (w, h, 3)
  }

  /** Integer accumulator behind the stub feature extractor: signed
    * counts of 16-byte-strided bytes hashed into `FeatureDim` slots.
    * Shared by [[featuresStub]] (which L2-normalizes it) and
    * [[featureDiagnostics]] (which emits integer summaries an external
    * oracle can recompute exactly — floats never leave the engine). */
  def featureAccum(bytes: Array[Byte]): Array[Long] = {
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      val slot = ((bytes(i) & 0xff) * 31 + (i & 0xf)) % FeatureDim
      acc(slot) += (if ((bytes(i) & 1) == 1) 1 else -1)
      i += 16
    }
    acc
  }

  /** STUB feature extractor over raw bytes: a hashing projection of
    * 16-byte blocks (stands in for a CNN embedding; deterministic). */
  def featuresStub(bytes: Array[Byte]): Array[Float] = {
    val acc = featureAccum(bytes)
    val norm = math.sqrt(acc.map(v => v.toDouble * v).sum)
    if (norm == 0) new Array[Float](FeatureDim)
    else acc.map(v => (v / norm).toFloat)
  }

  /** STUB resize kernel for payloads with no dependency-free decode
    * path (JPEG/GIF entropy coding needs a codec): records the target
    * geometry and a deterministic content hash of the "resized"
    * payload. PNG payloads never reach this — they take the REAL
    * decode → resample path in [[resizeImages]]. */
  def resizeStub(bytes: Array[Byte], sha: String, targetW: Int,
      targetH: Int): String =
    TextUtil.sha256Hex(s"$sha:${targetW}x$targetH:${bytes.length}")

  /** Image resize over a binary corpus: output keeps the original path
    * plus target geometry and the resized payload hash. PNG, GIF, BMP
    * and JPEG (baseline grayscale, YCbCr color, AND progressive)
    * payloads are REALLY decoded (IDAT inflate + defilter / GIF-LZW +
    * palette / BI_RGB stride+flip / Huffman + IDCT + fixed-point
    * color conversion) and
    * nearest-neighbor resampled — the hash is of the actual resized
    * raster bytes; unrecognized payloads fall back to the labeled
    * stub. A pure per-row map, zero shuffle — widening the real path
    * to more formats changes no plan shape. */
  def resizeImages(s: SparkSession, binaries: DataFrame,
      targetW: Int = 224, targetH: Int = 224): DataFrame = {
    import s.implicits._
    binaries.select("path", "mime", "content")
      .as[(String, String, Array[Byte])]
      .map { case (path, mime, bytes) =>
        val resizedSha =
          decodePngPixels(bytes).orElse(decodeGifPixels(bytes))
            .orElse(decodeBmpPixels(bytes))
            .orElse(decodeJpegPixels(bytes)) match {
            case Some(img) => TextUtil.sha256HexBytes(
              resampleNearest(img, targetW, targetH))
            case None => resizeStub(bytes,
              TextUtil.sha256HexBytes(bytes), targetW, targetH)
          }
        (path, mime, targetW, targetH, resizedSha)
      }.toDF("path", "mime", "width", "height", "resized_sha")
  }

  /** Video frame sampling: one output row per sampled frame. MP4
    * payloads are REALLY demuxed — [[demuxMp4Samples]] resolves each
    * sample's timestamp from the stbl tables — and AVI payloads walk
    * the RIFF movi list ([[demuxAviFrames]]), so the sampled rows
    * carry true container timing; payloads without a parseable
    * container use the labeled stub count (size/`bytesPerFrame` at
    * `fps`). The one-to-many explode is the shape that matters — at
    * scale each video row fans out to its sampled frames with no
    * shuffle, and downstream feature extraction batches them. */
  def sampleFrames(s: SparkSession, binaries: DataFrame,
      everyN: Int = 30, fps: Int = 30, bytesPerFrame: Int = 256): DataFrame = {
    import s.implicits._
    binaries.select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        demuxMp4Samples(bytes)
          .map(_.iterator.map(sm => (sm.idx, sm.tsMs)))
          .orElse(demuxAviFrames(bytes)
            .map(_.iterator.map(f => (f.idx, f.tsMs)))) match {
          case Some(frames) =>
            frames.filter(_._1 % everyN == 0)
              .map { case (idx, ts) => (path, idx.toLong, ts) }
          case None =>
            val nFrames = math.max(1, bytes.length / bytesPerFrame) // STUB
            (0 until nFrames by everyN).iterator.map { f =>
              (path, f.toLong, f * 1000L / fps)
            }
        }
      }
      .toDF("path", "frame_idx", "ts_ms")
  }

  /** Binary corpus → typed metadata + feature vectors, batched per
    * partition (batch boundaries never cross partitions — same contract
    * as mapInPandas batches). Decodable images (PNG/GIF/BMP/JPEG) are
    * REALLY decoded and the feature projection runs over the RASTER,
    * making the features ENCODING-INVARIANT — the same image stored as
    * PNG and BMP yields the identical vector, which no projection over
    * container bytes can do (the projection itself remains the
    * deterministic CNN stand-in). Undecodable payloads keep the
    * byte-level stub path. */
  def extractFeatures(s: SparkSession,
      binaries: DataFrame /* (path, mime, content: binary) */): DataFrame = {
    import s.implicits._
    val rows = binaries.select("path", "mime", "content")
      .as[(String, String, Array[Byte])]
    rows.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // one "batch" = the unit a real decoder would vectorize over
        batch.iterator.map { case (path, mime, bytes) =>
          val sha = TextUtil.sha256HexBytes(bytes)
          val (w, h, c) = decodeImageHeader(bytes)
            .getOrElse(decodeStub(bytes, sha))
          val feat =
            decodePngPixels(bytes).orElse(decodeGifPixels(bytes))
              .orElse(decodeBmpPixels(bytes))
              .orElse(decodeJpegPixels(bytes)) match {
              case Some(img) => featuresStub(img.pixels)
              case None => featuresStub(bytes)
            }
          (path, mime, bytes.length.toLong, sha, w, h, c, feat)
        }
      }
    }.toDF("path", "mime", "n_bytes", "sha", "width", "height",
      "channels", "features")
  }

  /** Integer-exact summary of the feature kernel, per payload: sample
    * count (16-byte stride), non-zero slot count, and a slot-weighted
    * checksum of the signed accumulator. Pins the same [[featureAccum]]
    * the float path normalizes, without ever hashing floats. Pure
    * per-row map, zero shuffle. */
  def featureDiagnostics(s: SparkSession, binaries: DataFrame): DataFrame = {
    import s.implicits._
    binaries.select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val acc = featureAccum(bytes)
        val nSamples = (bytes.length + 15L) / 16L
        val nnz = acc.count(_ != 0).toLong
        var checksum = 0L
        var i = 0
        while (i < acc.length) { checksum += acc(i) * (i + 1); i += 1 }
        (path, nSamples, nnz, checksum)
      }
      .toDF("path", "n_samples", "nnz", "checksum")
  }

  // ── PCM sample decode (dependency-free) ──────────────────────────────
  // The step past header cataloging: real 16-bit PCM sample extraction
  // from the WAV data chunk — the level/clipping audit an audio-corpus
  // curation pass runs (silence gating, clipping rejection) needs the
  // SAMPLES, not just the container metadata. No codec required: PCM in
  // a RIFF container is the one audio format whose payload is raw.

  /** Near-full-scale threshold of [[decodePcmLevels]]'s clip count. */
  val NearClipAbs = 32700

  /** Mono 16-bit little-endian PCM WAV at `rate` Hz around the given
    * samples — the canonical 44-byte header + data chunk (pad byte on
    * odd sizes, per RIFF word alignment). */
  def encodeWavPcm16(samples: Array[Int], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen + (dataLen & 1))
    def put4(i: Int, v: Long): Unit = { out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte
      out(i + 3) = ((v >> 24) & 0xff).toByte }
    def put2(i: Int, v: Int): Unit = { out(i) = (v & 0xff).toByte
      out(i + 1) = ((v >> 8) & 0xff).toByte }
    def putTag(i: Int, s: String): Unit =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .copyToArray(out, i)
    putTag(0, "RIFF"); put4(4, 36L + dataLen + (dataLen & 1))
    putTag(8, "WAVE"); putTag(12, "fmt "); put4(16, 16L)
    put2(20, 1); put2(22, 1); put4(24, rate); put4(28, rate * 2L)
    put2(32, 2); put2(34, 16); putTag(36, "data"); put4(40, dataLen)
    var i = 0
    while (i < samples.length) {
      put2(44 + i * 2, samples(i) & 0xffff); i += 1
    }
    out
  }

  /** Real PCM level audit over a WAV payload: chunk-walks to 'fmt ' and
    * 'data' (same walk as [[decodeWavHeader]]), then reads every 16-bit
    * LE sample — (n_samples, peak |amplitude|, sum of |amplitudes|,
    * count at/above [[NearClipAbs]]). None for non-PCM / non-16-bit /
    * truncated payloads (an audit must never fabricate levels). */
  def decodePcmLevels(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var i = 12L
    var fmtSeen = false
    var fmtOk = false
    var dataOff = -1L
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val o = i.toInt
      val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = i32le(b, o + 4).toLong & 0xffffffffL
      // first-wins on both chunks, and the fmt fields are only read
      // when the chunk DECLARES them (size >= 16) — a short fmt chunk
      // must not have the next chunk's bytes decoded as format fields,
      // and a duplicate data chunk must not silently replace the
      // payload being audited
      if (id == "fmt " && !fmtSeen && size >= 16 && i + 24 <= b.length) {
        fmtSeen = true
        // PCM (tag 1), mono, 16-bit — the only payload shape whose
        // samples are raw bytes
        fmtOk = u16le(b, o + 8) == 1 && u16le(b, o + 10) == 1 &&
          u16le(b, o + 22) == 16
      }
      if (id == "data" && dataOff < 0) { dataOff = i + 8; dataLen = size }
      i += 8 + size + (size & 1)
    }
    if (!fmtOk || dataOff < 0 || dataOff + dataLen > b.length ||
      dataLen % 2 != 0) return None
    var (n, peak, sumAbs, clip) = (0L, 0L, 0L, 0L)
    var p = dataOff.toInt
    val end = (dataOff + dataLen).toInt
    while (p + 1 < end) {
      val v = (u16le(b, p) << 16) >> 16 // sign-extend
      val a = math.abs(v.toLong)
      n += 1; sumAbs += a
      if (a > peak) peak = a
      if (a >= NearClipAbs) clip += 1
      p += 2
    }
    Some((n, peak, sumAbs, clip))
  }

  /** (sampleRate, samples) from a mono 16-bit PCM WAV — the same
    * chunk walk as [[decodePcmLevels]] but returning the decoded
    * sample array (sign-extended) and the declared rate, for
    * operators that transform audio rather than audit it. None for
    * non-PCM / non-16-bit / truncated payloads. */
  def decodePcmSamples(b: Array[Byte]): Option[(Int, Array[Int])] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var i = 12L
    var fmtSeen = false
    var fmtOk = false
    var rate = 0
    var dataOff = -1L
    var dataLen = -1L
    while (i + 8 <= b.length) {
      val o = i.toInt
      val id = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = i32le(b, o + 4).toLong & 0xffffffffL
      if (id == "fmt " && !fmtSeen && size >= 16 && i + 24 <= b.length) {
        fmtSeen = true
        fmtOk = u16le(b, o + 8) == 1 && u16le(b, o + 10) == 1 &&
          u16le(b, o + 22) == 16
        rate = i32le(b, o + 12)
      }
      if (id == "data" && dataOff < 0) { dataOff = i + 8; dataLen = size }
      i += 8 + size + (size & 1)
    }
    if (!fmtOk || rate <= 0 || dataOff < 0 ||
      dataOff + dataLen > b.length || dataLen % 2 != 0) return None
    val n = (dataLen / 2).toInt
    val out = new Array[Int](n)
    var k = 0
    var p = dataOff.toInt
    while (k < n) {
      out(k) = (u16le(b, p) << 16) >> 16 // sign-extend
      k += 1; p += 2
    }
    Some((rate, out))
  }

  /** Linear-interpolation sample-rate conversion, INTEGER EXACT (and
    * therefore SQL-replayable): output sample j sits at source
    * position j·src/dst — pos = ⌊j·src/dst⌋, frac = j·src mod dst —
    * and interpolates ⌊(s[pos]·(dst−frac) + s[pos+1]·frac) / dst⌋
    * (floor division; the last source sample clamps). The standard
    * training-pipeline normalization (everything to 16 kHz mono)
    * without a float resampler's platform-dependent rounding. */
  def resamplePcmLinear(samples: Array[Int], srcRate: Int,
      dstRate: Int): Array[Int] = {
    require(srcRate > 0 && dstRate > 0)
    if (samples.isEmpty) return Array.empty
    val outLen = (samples.length.toLong * dstRate / srcRate).toInt
    val out = new Array[Int](outLen)
    var j = 0
    while (j < outLen) {
      val num = j.toLong * srcRate
      val pos = (num / dstRate).toInt
      val frac = (num % dstRate).toInt
      val s0 = samples(pos).toLong
      val s1 = samples(math.min(pos + 1, samples.length - 1)).toLong
      out(j) = Math.floorDiv(s0 * (dstRate - frac) + s1 * frac,
        dstRate.toLong).toInt
      j += 1
    }
    out
  }

  /** Audio resample over a binary corpus: mono 16-bit PCM WAVs are
    * REALLY decoded ([[decodePcmSamples]]) and rate-converted through
    * the integer-exact [[resamplePcmLinear]]; undecodable payloads
    * surface with src_rate = -1 (quarantined, never fabricated). Pure
    * per-row kernel, zero shuffle. */
  def resampleAudio(s: SparkSession, binaries: DataFrame,
      dstRate: Int = 16000): DataFrame = {
    import s.implicits._
    binaries.select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        decodePcmSamples(bytes) match {
          case Some((rate, samples)) =>
            val rs = resamplePcmLinear(samples, rate, dstRate)
            val sha = TextUtil.sha256Hex(rs.mkString(","))
            (path, rate, samples.length.toLong, rs.length.toLong, sha)
          case None => (path, -1, 0L, 0L, "")
        }
      }
      .toDF("path", "src_rate", "n_in", "n_out", "resampled_sha")
  }

  /** Per-payload PCM level report over an audio binary corpus: decode
    * is a pure per-row kernel (zero shuffle); payloads the decoder
    * rejects surface with n_samples = -1 (quarantined, never dropped
    * or fabricated). */
  def audioLevels(s: SparkSession, binaries: DataFrame): DataFrame = {
    import s.implicits._
    binaries.select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        decodePcmLevels(bytes) match {
          case Some((n, peak, sumAbs, clip)) => (path, n, peak, sumAbs, clip)
          case None => (path, -1L, 0L, 0L, 0L)
        }
      }
      .toDF("path", "n_samples", "peak", "sum_abs", "n_clip")
  }
}
