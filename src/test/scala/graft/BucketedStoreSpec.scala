package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Chunker
import graft.sources.ChunkStore

/** Bucketed chunk store: url-bucketed layout lets the url-keyed diff
  * joins of §2.5 run shuffle-free between two bucketed tables. */
class BucketedStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed write round-trips and the bucket spec is recorded") {
    import spark.implicits._
    val chunks = Seq("doc://a", "doc://b", "doc://c")
      .map(u => u -> ("# T\n\n" + s"content for $u. " * 60))
      .toDF("url", "md").as[(String, String)]
      .flatMap { case (u, md) =>
        Chunker.chunkMarkdown(md, "P", "1.0", u)
      }
    ChunkStore.writeBucketed(chunks.toDF(), "chunks_bucketed")
    val back = spark.table("chunks_bucketed")
    assert(back.count() == chunks.count())
    val ddl = spark.sql("SHOW CREATE TABLE chunks_bucketed")
      .head().getString(0)
    assert(ddl.contains("CLUSTERED BY (url)"))
    assert(ddl.contains("8 BUCKETS"))

    // a self-join on the bucketed key plans without an exchange on the
    // bucketed side (the point of the layout)
    val joined = back.as("x").join(back.as("y"), Seq("url"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(url"),
      s"unexpected shuffle on bucketed join:\n$plan")
  }
}
