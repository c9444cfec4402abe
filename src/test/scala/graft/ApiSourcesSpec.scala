package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sources.ApiSources

class ApiSourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val jsonPath: String = {
    val d = Files.createTempDirectory("issues")
    val lines = Seq(
      """{"number":1,"title":"Crash on start","user_login":"alice","state":"open","created_at":"2024-01-10T00:00:00Z","updated_at":"2024-02-01T00:00:00Z","labels":["bug"],"body":"It crashes hard.","is_pull_request":false,"html_url":"https://gh.io/r/issues/1"}""",
      """{"number":2,"title":"Add dark mode","user_login":"bob","state":"open","created_at":"2024-01-15T00:00:00Z","updated_at":"2024-03-01T00:00:00Z","labels":[],"body":null,"is_pull_request":true,"html_url":"https://gh.io/r/pull/2"}""",
      """{"number":3,"title":"Old one","user_login":"eve","state":"closed","created_at":"2023-01-01T00:00:00Z","updated_at":"2023-06-01T00:00:00Z","labels":["stale"],"body":"Ancient.","is_pull_request":false,"html_url":"https://gh.io/r/issues/3"}""")
    Files.writeString(d.resolve("issues.jsonl"), lines.mkString("\n"))
    d.resolve("issues.jsonl").toString
  }

  test("renders staged issues into chunked markdown pages") {
    val chunks = ApiSources.ingestIssues(spark, jsonPath, "Repo", "1.0")
      .collect()
    assert(chunks.map(_.url).distinct.length == 3)
    val c1 = chunks.find(_.url.endsWith("/issues/1")).get
    assert(c1.content.contains("# Issue #1: Crash on start"))
    assert(c1.content.contains("- **Labels:** `bug`"))
    assert(c1.content.contains("It crashes hard."))
    val c2 = chunks.find(_.url.endsWith("/pull/2")).get
    assert(c2.content.contains("# PR #2: Add dark mode"))
    assert(c2.content.contains("_No description._"))
  }

  test("watermark filter drops already-seen issues") {
    val fresh = ApiSources.ingestIssues(spark, jsonPath, "Repo", "1.0",
      updatedAfter = Some("2024-01-01T00:00:00Z")).collect()
    assert(fresh.map(_.url).distinct.length == 2) // issue 3 skipped
  }

  test("watermark advances on success and holds on failure") {
    val batch = spark.read.json(jsonPath)
    assert(ApiSources.nextWatermark(batch, "2024-01-01T00:00:00Z", 0) ==
      "2024-03-01T00:00:00Z")
    assert(ApiSources.nextWatermark(batch, "2024-01-01T00:00:00Z", 2) ==
      "2024-01-01T00:00:00Z")
    val empty = batch.filter("number > 99")
    assert(ApiSources.nextWatermark(empty, "prev", 0) == "prev")
  }
}
