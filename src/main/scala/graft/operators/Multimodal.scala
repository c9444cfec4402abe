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
  * Pixel decode / resampling stays stubbed (no media codecs ship in
  * this build), but the Spark-side plumbing is real and tested: binary
  * schema, partition-local batching (the JVM analog of a Pandas-UDF
  * batch), deterministic feature extraction, and metadata projection.
  * Swapping the stubs for a real codec (javacv / soundfile behind
  * mapInPandas on PySpark) changes no plan shape.
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

  /** STUB resize kernel: records the target geometry and a
    * deterministic content hash of the "resized" payload (real impl:
    * decode → resample → re-encode inside the same batch). */
  def resizeStub(bytes: Array[Byte], sha: String, targetW: Int,
      targetH: Int): String =
    TextUtil.sha256Hex(s"$sha:${targetW}x$targetH:${bytes.length}")

  /** Image resize over a binary corpus: output keeps the original path
    * plus target geometry and the resized payload hash. A pure per-row
    * map, zero shuffle — a real decoder swaps into `resizeStub` with no
    * plan change (and would batch internally if its library wants
    * vectorized input; nothing here consumes a batch as a unit, so no
    * grouped buffering). */
  def resizeImages(s: SparkSession, binaries: DataFrame,
      targetW: Int = 224, targetH: Int = 224): DataFrame = {
    import s.implicits._
    binaries.select("path", "mime", "content")
      .as[(String, String, Array[Byte])]
      .map { case (path, mime, bytes) =>
        val sha = TextUtil.sha256HexBytes(bytes)
        (path, mime, targetW, targetH, resizeStub(bytes, sha, targetW, targetH))
      }.toDF("path", "mime", "width", "height", "resized_sha")
  }

  /** Video frame sampling: one output row per sampled frame (every
    * `everyN`-th of a stub frame count derived from payload size; real
    * impl: container demux). The one-to-many explode is the shape that
    * matters — at scale each video row fans out to its sampled frames
    * with no shuffle, and downstream feature extraction batches them. */
  def sampleFrames(s: SparkSession, binaries: DataFrame,
      everyN: Int = 30, fps: Int = 30, bytesPerFrame: Int = 256): DataFrame = {
    import s.implicits._
    binaries.select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val nFrames = math.max(1, bytes.length / bytesPerFrame) // STUB count
        (0 until nFrames by everyN).iterator.map { f =>
          (path, f.toLong, f * 1000L / fps)
        }
      }
      .toDF("path", "frame_idx", "ts_ms")
  }

  /** Binary corpus → typed metadata + feature vectors, batched per
    * partition (batch boundaries never cross partitions — same contract
    * as mapInPandas batches). */
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
          (path, mime, bytes.length.toLong, sha, w, h, c,
            featuresStub(bytes))
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
