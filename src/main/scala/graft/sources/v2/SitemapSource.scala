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
import graft.sources.Sitemap

/** DataSource V2 connector for staged sitemap XML directories —
  * `spark.read.format("graft.sources.v2.SitemapSource").load(dir)`
  * yields one row per `<url>` entry / `<sitemap>` index link across the
  * directory's files:
  *
  *   (sitemap_url string, kind string['url'|'nested'],
  *    loc string, lastmod string?)
  *
  * The full connector surface, minimally: TableProvider → Table →
  * ScanBuilder (with FILE-LEVEL FILTER PUSHDOWN: an `EqualTo` on
  * sitemap_url prunes input partitions before any IO — the connector's
  * analog of partition pruning) → Batch (one InputPartition per file →
  * parallelism scales with the file listing) → PartitionReader (reads
  * and regex-parses one file, reference parseSitemap semantics via
  * graft.sources.Sitemap).
  */
class SitemapSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SitemapSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SitemapTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object SitemapSource {
  val schema: StructType = StructType(Seq(
    StructField("sitemap_url", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true)))
}

class SitemapTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sitemaps(`$path`)"
  override def schema(): StructType = SitemapSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new SitemapScanBuilder(path)
}

class SitemapScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters {
  private var urlFilters: Seq[String] = Seq.empty
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushed, rest) = filters.partition {
      case EqualTo("sitemap_url", _: String) => true
      case _ => false
    }
    urlFilters = pushed.toIndexedSeq.collect { case EqualTo(_, v: String) => v }
    rest // everything else evaluates above the scan
  }
  override def pushedFilters(): Array[Filter] =
    urlFilters.map(v => EqualTo("sitemap_url", v)).toArray
  override def build(): Scan = new SitemapScan(path, urlFilters)
}

class SitemapScan(path: String, urlFilters: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = SitemapSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"SitemapScan(path=$path, pushedUrls=${urlFilters.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val hadoopPath = new Path(path)
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val fs = hadoopPath.getFileSystem(conf)
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val files = fs.listStatus(hadoopPath).filter(_.isFile)
      .map(_.getPath)
    // file name (minus extension) is the sitemap_url key — the pushed
    // equality filters prune files HERE, before any read. The filters
    // arrive as a CONJUNCTION, so a file must match EVERY pushed value
    // (two different equalities ⇒ empty scan, not a union)
    files
      .map(p => (p.toString, sitemapUrlOf(p)))
      .filter { case (_, u) => urlFilters.forall(_ == u) }
      .map { case (p, u) =>
        SitemapInputPartition(p, u, serConf): InputPartition
      }
  }
  private def sitemapUrlOf(p: Path): String = {
    val n = p.getName
    val dot = n.lastIndexOf('.')
    if (dot > 0) n.substring(0, dot) else n
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SitemapReaderFactory
}

case class SitemapInputPartition(file: String, sitemapUrl: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends InputPartition

class SitemapReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SitemapInputPartition]
    new SitemapPartitionReader(p.file, p.sitemapUrl, p.conf)
  }
}

class SitemapPartitionReader(file: String, sitemapUrl: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = {
    val path = new Path(file)
    // the session's Hadoop conf travels with the partition — a bare
    // Configuration() would lose credentials/filesystem settings on
    // executors for non-local roots
    val fs = path.getFileSystem(conf.value)
    val in = fs.open(path)
    val xml = try {
      new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val su = UTF8String.fromString(sitemapUrl)
    val urlRows = Sitemap.parseUrls(xml).iterator.map { case (loc, lm) =>
      InternalRow(su, UTF8String.fromString("url"),
        UTF8String.fromString(loc),
        lm.map(UTF8String.fromString).orNull)
    }
    val nestedRows = Sitemap.parseNested(xml).iterator.map { n =>
      InternalRow(su, UTF8String.fromString("nested"),
        UTF8String.fromString(n), null)
    }
    urlRows ++ nestedRows
  }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
