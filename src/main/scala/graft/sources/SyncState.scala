package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted sync metadata (reference DatabaseManager
  * get/setMetadataValue, used for the interrupted-sync recovery flag
  * `sync_complete:{urlPrefix}`, doc2vec.ts:675-770): an append-only
  * parquet KV log where the highest run_id wins.
  *
  * The reference's contract: forceFullSync is true until a run has
  * completed a full sync once — if the process dies mid-crawl the flag
  * is never written, and the next run bypasses every lastmod/ETag skip
  * so pages half-processed under stale cache state are revisited.
  * Appending a new row per write (instead of rewriting the store)
  * keeps the write O(1) and crash-safe: a torn run leaves the log
  * exactly as it was.
  */
object SyncState {

  def setMetadata(s: SparkSession, path: String, key: String,
      value: String, runId: Long): Unit = {
    import s.implicits._
    Seq((key, value, runId)).toDF("key", "value", "run_id")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Latest-write-wins resolution of an append-only KV log: one row
    * per key carrying the value of its highest run_id. The set-based
    * kernel behind [[getMetadata]], shared with the resume-decision
    * query so the oracle checks the production resolution rule. */
  def latestByKey(log: DataFrame): DataFrame =
    log.groupBy("key").agg(
      expr("max_by(value, run_id)").as("value"),
      max(col("run_id")).as("run_id"))

  /** Latest value for a key (highest run_id), if any. */
  def getMetadata(s: SparkSession, path: String,
      key: String): Option[String] = {
    // existence pre-check: a first sync has no log yet, and letting
    // spark.read throw (even caught) logs a full stack per call. The
    // java.io.File check only understands LOCAL paths, so it is only a
    // fast-path for scheme-less paths — URI-schemed locations (s3a://,
    // hdfs://, file:/) fall through to the read-and-catch, preserving
    // behavior for any Spark-readable filesystem.
    val local = !path.contains(":/")
    val log = if (local && !new java.io.File(path).exists()) None else try {
      Some(s.read.parquet(path))
    } catch { case _: org.apache.spark.sql.AnalysisException => None }
    log.flatMap(l => latestByKey(l.filter(col("key") === key))
      .collect().headOption.map(_.getAs[String]("value")))
  }

  /** True until a full sync has ever completed for this prefix
    * (reference: `syncCompleteValue !== 'true'`). */
  def forceFullSync(s: SparkSession, path: String,
      urlPrefix: String): Boolean =
    !getMetadata(s, path, s"sync_complete:$urlPrefix").contains("true")

  /** Mark the source fully synced — only on a clean run (the reference
    * skips the write when the crawl saw network errors, so the next run
    * still force-processes). */
  def markSyncComplete(s: SparkSession, path: String, urlPrefix: String,
      runId: Long, hasNetworkErrors: Boolean): Unit =
    if (!hasNetworkErrors)
      setMetadata(s, path, s"sync_complete:$urlPrefix", "true", runId)
}
