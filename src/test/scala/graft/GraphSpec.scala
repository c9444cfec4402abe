package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Graph

/** Integer PageRank invariants at sf0.001. */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("pageRank: top-20 is positive, non-increasing, differentiated, deterministic") {
    val a = Graph.pageRank(spark, dir).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Long]("r")))
    assert(a.length == 20)
    assert(a.forall(_._2 > 0))
    assert(a.sliding(2).forall {
      case Array((_, r1), (_, r2)) => r1 >= r2
      case _ => true
    }, "ranks must be non-increasing")
    // the hub overlay must actually differentiate authority
    assert(a.map(_._2).distinct.length > 5, s"ranks look uniform: ${a.toSeq}")
    val b = Graph.pageRank(spark, dir).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Long]("r")))
    assert(a.toSeq == b.toSeq, "pageRank must be deterministic")
  }

  test("pageRank top-20 mass is sane (bounded by total, above uniform floor)") {
    // integer division only ever LOSES mass, so the top-20 sum must
    // stay below Scale; and top pages can't fall below half the
    // uniform share (they are by definition above-average)
    val n = graft.Tables.documents(spark, dir).count()
    val top = Graph.pageRank(spark, dir, iters = 3)
      .collect().map(_.getAs[Long]("r")).sum
    assert(top <= Graph.Scale, "top-20 mass cannot exceed total mass")
    assert(top >= 20L * (Graph.Scale / n) / 2,
      "top-20 mass implausibly small")
  }
}
