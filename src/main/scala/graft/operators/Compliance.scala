package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Subject-erasure sweep ("right to be forgotten") across EVERY derived
  * surface a pipeline persists — the compliance job a 100 TB deployment
  * must run on a deadline, and the one place where a surface silently
  * missed by the sweep is a legal defect, not a freshness bug. The
  * engine maintains three state families (document store, materialized
  * aggregate, vector index); one purge request must land consistently
  * on all three WITHOUT a base rescan on any of them:
  *
  *   - document store — merge-on-read: the purge keys append to the
  *     tombstone log (O(request) write IO), reads reconstruct live
  *     state with the tombstone side broadcast (the `stream_mv_parity`
  *     store strategy; physical file rewrite is compaction's job,
  *     `store_compaction`).
  *   - materialized view — signed delta maintenance: the purged docs'
  *     contributions aggregate per group and merge into the persisted
  *     MV (O(request + touched groups), the `mv_incremental` kernel
  *     with a delete-only delta).
  *   - IVF index — partition-pruned rewrite: only the CELLS holding a
  *     purged code are rewritten (dynamic partition overwrite); every
  *     untouched cell's files survive byte-identical. Purge removes
  *     CODES; a quantizer whose trained seed derives from an erased
  *     subject is a retraining event ([[Similarity.ivfRebalanceReport]]
  *     territory), out of this sweep's scope by design.
  *
  * The report reconciles the three surfaces in one result whose
  * cross-surface identities are part of the contract (live store rows
  * == MV's total docs) — so a seam bug (a tombstone the MV never heard
  * about) is both an internal inconsistency and a DuckDB hash mismatch.
  * ComplianceSpec additionally pins purge == rebuild-from-scratch on
  * every surface and that no live row satisfies the purge predicate. */
object Compliance {

  /** Purge-subject rule of the fixture: every id ≡ 4 (mod 10). */
  val PurgeMod = 10L
  val PurgeRes = 4L

  private def tok = expr("CAST((length(text) + 3) div 4 AS BIGINT)")

  private def purged(c: org.apache.spark.sql.Column) =
    pmod(c, lit(PurgeMod)) === PurgeRes

  /** Build the three persisted surfaces under `base`, apply the purge
    * through each surface's own incremental maintenance path, and
    * return the per-surface reconciliation. */
  def purgeSweep(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("purge")
    try {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), tok.as("tok"))

      // ── build: document store (adds log) + MV + cell-partitioned index
      docs.write.parquet(s"$base/store/adds")
      docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tok"))
        .write.parquet(s"$base/mv")
      Similarity.ivfAssign(s, dir)
        .write.partitionBy("cell").parquet(s"$base/index")

      // ── the purge request: subject keys only (never the base tables)
      val purgeKeys = docs.filter(purged(col("doc_id")))
        .select("doc_id", "source", "tok")
        .localCheckpoint(true)

      // store: tombstone append, merge-on-read reconstruction
      purgeKeys.select("doc_id").write.parquet(s"$base/store/tombstones")
      val live = s.read.parquet(s"$base/store/adds")
        .join(broadcast(s.read.parquet(s"$base/store/tombstones")),
          Seq("doc_id"), "left_anti")

      // mv: delete-only signed delta merged into the persisted view
      val delta = purgeKeys.groupBy("source")
        .agg(count(lit(1)).as("d_docs"), sum(col("tok")).as("d_tok"))
      val mv2 = s.read.parquet(s"$base/mv")
        .join(broadcast(delta), Seq("source"), "left_outer")
        .select(col("source"),
          (col("n_docs") - coalesce(col("d_docs"), lit(0L))).as("n_docs"),
          (col("sum_tok") - coalesce(col("d_tok"), lit(0L))).as("sum_tok"))
        .filter(col("n_docs") > 0)
        .localCheckpoint(true)
      mv2.write.mode("overwrite").parquet(s"$base/mv")

      // index: rewrite ONLY the cells holding a purged code
      val idx = s.read.parquet(s"$base/index")
      val affected = idx.filter(purged(col("vec_id")))
        .select("cell").distinct().localCheckpoint(true)
      val nCells = affected.count()
      val survivors = idx.join(broadcast(affected), Seq("cell"))
        .filter(!purged(col("vec_id")))
        .select("vec_id", "cell")
        .localCheckpoint(true)
      survivors.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(s"$base/index")
      // dynamic overwrite never touches a partition it writes no rows
      // for — a cell whose EVERY code was purged must be deleted
      // explicitly (bounded by nlist: a metadata-scale driver loop)
      val emptied = affected.except(survivors.select("cell").distinct())
        .collect().map(_.get(0))
      emptied.foreach { c =>
        Sync.deleteTree(new java.io.File(s"$base/index/cell=$c"))
      }

      // ── reconciliation across the three surfaces
      val storeRow = live.agg(
        lit("store").as("surface"),
        count(lit(1)).as("n_rows"),
        coalesce(sum(col("doc_id")), lit(0L)).as("checksum"),
        lit(0L).as("n_groups")).withColumn("n_purged",
        lit(purgeKeys.count()))
      val mvRow = s.read.parquet(s"$base/mv").agg(
        lit("mv").as("surface"),
        coalesce(sum(col("n_docs")), lit(0L)).as("n_rows"),
        coalesce(sum(col("sum_tok")), lit(0L)).as("checksum"),
        count(lit(1)).as("n_groups")).withColumn("n_purged",
        lit(purgeKeys.count()))
      val idx2 = s.read.parquet(s"$base/index")
      val idxRow = idx2.agg(
        lit("index").as("surface"),
        count(lit(1)).as("n_rows"),
        coalesce(sum(col("vec_id")), lit(0L)).as("checksum"),
        lit(nCells).as("n_groups")).withColumn("n_purged",
        lit(Tables.embeddings(s, dir).filter(purged(col("vec_id"))).count()))
      storeRow.unionByName(mvRow).unionByName(idxRow)
        .select(col("surface"), col("n_rows").cast("long"),
          col("checksum").cast("long"), col("n_groups").cast("long"),
          col("n_purged").cast("long"))
        .orderBy("surface")
        .localCheckpoint(true)
    } finally Sync.deleteTree(base.toFile)
  }
}
