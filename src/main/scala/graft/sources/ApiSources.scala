package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Chunk
import graft.operators.Chunker

/** API-shaped sources (SURVEY.md §2.1): GitHub issues / Zendesk tickets
  * land as JSON-lines, are filtered by the `updated_at > watermark`
  * incremental predicate, rendered to Markdown with the reference
  * templates, and chunked. The HTTP pagination/retry machinery of the
  * reference is a client concern (it fills the JSON staging area); the
  * engine's semantics start at the staged records — which is also where
  * a 100 TB backfill starts.
  */
object ApiSources {

  /** Staged GitHub issues (one JSON object per line) → chunk table.
    * Incremental: only issues updated after the watermark are
    * re-rendered (doc2vec.ts:258-597's `since` parameter as a filter).
    */
  def ingestIssues(spark: SparkSession, jsonPath: String,
      productName: String, version: String,
      updatedAfter: Option[String] = None): Dataset[Chunk] = {
    import spark.implicits._
    var df = spark.read.json(jsonPath)
    updatedAfter.foreach(w => df = df.filter(col("updated_at") > lit(w)))
    df.select(
        col("number").cast("long"), col("title"), col("user_login"),
        col("state"), col("created_at"), col("updated_at"),
        coalesce(col("labels"), array()).as("labels"),
        col("body"), coalesce(col("is_pull_request"), lit(false)),
        col("html_url"))
      .as[(Long, String, String, String, String, String,
        Seq[String], Option[String], Boolean, String)]
      .flatMap { case (num, title, author, state, created, updated,
          labels, body, isPr, url) =>
        val md = Renderers.renderIssue(Renderers.Issue(num, title, author,
          state, created, updated, labels, body, isPr, Seq.empty))
        Chunker.chunkMarkdown(md, productName, version, url)
      }
  }

  /** Watermark for the next run: max(updated_at) of the batch, held at
    * the previous value when failures occurred (doc2vec.ts:584-591). */
  def nextWatermark(batch: DataFrame, previous: String,
      failures: Long): String =
    if (failures > 0) previous
    else batch.agg(max(col("updated_at"))).head().getString(0) match {
      case null => previous
      case w => w
    }
}
