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
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val fs = hadoopPath.getFileSystem(conf)
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    fs.listStatus(hadoopPath).filter(_.isFile).map(_.getPath)
      .sortBy(_.toString)
      .map(p => WarcInputPartition(p.toString, typeFilters,
        required.fieldNames, serConf): InputPartition)
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
    fs.listStatus(hadoopPath).filter(_.isFile).map(_.getPath.toString)
      .sorted
  }

  // Trigger.AvailableNow freezes the listing at query start so the
  // run drains exactly the files present then and terminates
  private var frozen: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    frozen = Some(listing().length)

  private def latest(): Offset =
    WarcStreamOffset(frozen.getOrElse(listing().length))
  override def initialOffset(): Offset = WarcStreamOffset(0)
  override def latestOffset(): Offset = latest()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    latest()
  override def deserializeOffset(json: String): Offset =
    WarcStreamOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WarcStreamOffset].n
    val e = end.asInstanceOf[WarcStreamOffset].n
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    listing().slice(s, e)
      .map(f => WarcInputPartition(f, typeFilters,
        required.fieldNames, serConf): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory
}

/** Prefix length of the name-sorted archive listing. */
case class WarcStreamOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

case class WarcInputPartition(file: String, typeFilters: Seq[String],
    columns: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends InputPartition

class WarcReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcInputPartition]
    new WarcPartitionReader(p.file, p.typeFilters, p.columns, p.conf)
  }
}

class WarcPartitionReader(file: String, typeFilters: Seq[String],
    columns: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration)
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
  private val fileUtf8 = UTF8String.fromString(file)
  private def field(name: String, r: Warc.WarcRecord): Any = name match {
    case "path" => fileUtf8
    case "record_idx" => r.idx
    case "warc_type" => UTF8String.fromString(r.warcType)
    case "url" => UTF8String.fromString(r.targetUri)
    case "http_status" => r.httpStatus
    case "content_type" => UTF8String.fromString(r.httpContentType)
    case "n_body_bytes" => r.body.length.toLong
    case "body_checksum" =>
      var sum = 0L
      var i = 0
      while (i < r.body.length) {
        sum += (r.body(i) & 0xff).toLong * (1 + i % 97)
        i += 1
      }
      sum
    case "body" => r.body
    case other =>
      throw new IllegalArgumentException(s"unknown WARC column $other")
  }
  private val rows: Iterator[InternalRow] =
    Warc.parseWarcEvents(in).collect {
      case Right(r) if typeFilters.forall(_ == r.warcType) =>
        InternalRow.fromSeq(columns.toIndexedSeq.map(c => field(c, r)))
    }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = scala.util.Try(in.close())
}
