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

  private lazy val ticketsPath: String = {
    val d = Files.createTempDirectory("tickets")
    val lines = Seq(
      """{"id":10,"subject":"Login broken","status":"open","priority":"high","type":"incident","requester_id":101,"assignee_id":7,"created_at":"2024-02-01T00:00:00Z","updated_at":"2024-02-02T00:00:00Z","tags":["auth"],"description":"Cannot log in.","comments":[{"author_id":5,"created_at":"2024-02-01T01:00:00Z","public":true,"body":"Looking into it."},{"author_id":6,"created_at":"2024-02-01T02:00:00Z","public":false,"body":"Internal escalation"}]}""",
      """{"id":11,"subject":"Gone","status":"deleted","priority":null,"type":null,"requester_id":102,"assignee_id":null,"created_at":"2024-02-01T00:00:00Z","updated_at":"2024-02-03T00:00:00Z","tags":[],"description":null,"comments":[]}""",
      """{"id":12,"subject":"Spam","status":"spam","priority":null,"type":null,"requester_id":103,"assignee_id":null,"created_at":"2024-02-01T00:00:00Z","updated_at":"2024-02-03T00:00:00Z","tags":[],"description":"buy now","comments":[]}""")
    Files.writeString(d.resolve("tickets.jsonl"), lines.mkString("\n"))
    d.resolve("tickets.jsonl").toString
  }

  test("tickets: status filter, internal-comment skip, deleted purge list") {
    val (chunks, deleted) = ApiSources.ingestTickets(spark, ticketsPath,
      "Support", "1.0")
    val rows = chunks.collect()
    assert(rows.map(_.url).distinct.toSeq == Seq("zendesk://ticket/10"))
    val md = rows.head.content
    assert(md.contains("# Ticket #10: Login broken"))
    assert(md.contains("Looking into it."))
    assert(!md.contains("Internal escalation"))
    assert(deleted.collect().map(_.getString(0)).toSeq ==
      Seq("zendesk://ticket/11"))
    val (withInternal, _) = ApiSources.ingestTickets(spark, ticketsPath,
      "Support", "1.0", includeInternal = true)
    assert(withInternal.collect().head.content.contains("Internal escalation"))
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
