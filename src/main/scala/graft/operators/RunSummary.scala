package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Structured run-summary event channel (reference `logger.event
  * ('run-summary', {sources})`, logger.ts:244-256 + SourceRunStats,
  * types.ts:180-190): each sync run emits one machine-parseable JSON
  * event carrying per-source outcome + counters.
  *
  * Spark-native shape: the per-source stats are a DataFrame row (built
  * from the Sync counters aggregate), the event is one JSON line, and
  * the durable channel is an append-only JSONL directory — readable
  * back as a table (`spark.read.json`) for the controller-style queries
  * (daily stats, latest-run) that consume it.
  */
object RunSummary {

  /** Attach run identity + outcome to a counters row (the output of
    * `Sync.runCounters`), producing the SourceRunStats shape. */
  def sourceStats(counters: DataFrame, productName: String,
      sourceType: String, version: String, durationMs: Long,
      ok: Boolean, error: Option[String] = None): DataFrame =
    counters.select(
      lit(productName).as("product_name"),
      lit(sourceType).as("source_type"),
      lit(version).as("version"),
      lit(durationMs).as("duration_ms"),
      lit(ok).as("ok"),
      lit(error.orNull).cast("string").as("error"),
      struct(col("items_new"), col("items_updated"),
        col("items_unchanged"), col("items_deleted"),
        col("chunks_added"), col("chunks_deleted")).as("counters"))

  /** The `run-summary` structured event as one JSON line (the
    * reference's STRUCTURED-mode output). `tsIso` is a parameter, not a
    * clock read, for determinism. */
  def eventJson(runs: DataFrame, tsIso: String): String = {
    val sources = runs.toJSON.collect() // summary rows: one per source
    s"""{"event":"run-summary","ts":"$tsIso","sources":[${sources.mkString(",")}]}"""
  }

  /** Durable JSONL channel: append per-source rows; consumers read the
    * directory back as a table. */
  def appendJsonl(runs: DataFrame, path: String): Unit =
    runs.write.mode(SaveMode.Append).json(path)

  /** Orphaned-run fail-over (reference controller/store.ts:85-94): on
    * controller restart, every run still marked `running` belongs to a
    * dead process — flip it to `failed` with the marker error. */
  def failOrphans(runs: DataFrame): DataFrame =
    runs
      .withColumn("error",
        when(col("status") === "running", lit("orphaned by restart"))
          .otherwise(col("error")))
      .withColumn("status",
        when(col("status") === "running", lit("failed"))
          .otherwise(col("status")))
}
