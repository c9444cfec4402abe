package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextUtil

/** Multimodal columns (builder-prompt requirement): image/audio/video as
  * opaque binary columns with typed metadata, processed by batched
  * per-partition operators.
  *
  * The decode step is a clearly-marked STUB — no media libraries ship in
  * this build — but the Spark-side plumbing is real and tested: binary
  * schema, partition-local batching (the JVM analog of a Pandas-UDF
  * batch), deterministic feature extraction, and metadata projection.
  * Swapping `decodeStub` for a real decoder (javacv / pdfbox / soundfile
  * behind mapInPandas on PySpark) changes no plan shape.
  */
object Multimodal {

  /** Typed metadata extracted from a binary payload. */
  case class MediaMeta(path: String, mime: String, n_bytes: Long,
      sha: String, width: Int, height: Int, channels: Int)

  val FeatureDim = 32
  private val BatchSize = 64

  /** STUB decoder: derives deterministic fake dimensions from the
    * payload hash. A real implementation would decode the image header
    * here; everything downstream is agnostic to the difference. */
  def decodeStub(bytes: Array[Byte], sha: String): (Int, Int, Int) = {
    val w = 64 + (java.lang.Long.parseLong(sha.substring(0, 4), 16) % 1024).toInt
    val h = 64 + (java.lang.Long.parseLong(sha.substring(4, 8), 16) % 1024).toInt
    (w, h, 3)
  }

  /** STUB feature extractor over raw bytes: a hashing projection of
    * 16-byte blocks (stands in for a CNN embedding; deterministic). */
  def featuresStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      val slot = ((bytes(i) & 0xff) * 31 + (i & 0xf)) % FeatureDim
      acc(slot) += (if ((bytes(i) & 1) == 1) 1 else -1)
      i += 16
    }
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
      everyN: Int = 30, fps: Int = 30): DataFrame = {
    import s.implicits._
    binaries.select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val nFrames = math.max(1, bytes.length / 256) // STUB frame count
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
          val (w, h, c) = decodeStub(bytes, sha)
          (path, mime, bytes.length.toLong, sha, w, h, c,
            featuresStub(bytes))
        }
      }
    }.toDF("path", "mime", "n_bytes", "sha", "width", "height",
      "channels", "features")
  }
}
