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
  * Purge counts are read back from PERSISTED state (distinct tombstone
  * keys; index occupancy drop), not from the request, so a lost or
  * double-applied batch shifts the report. ComplianceSpec additionally
  * pins purge == rebuild-from-scratch on every surface and a planted
  * fully-purged-cell fixture; the streaming twin
  * ([[purgeSweepStream]]) shares this oracle, so requests lost or
  * replayed across micro-batch boundaries land as a hash mismatch. */
object Compliance {

  /** Purge-subject rule of the fixture: every id ≡ 4 (mod 10). */
  val PurgeMod = 10L
  val PurgeRes = 4L

  private def tok = expr("CAST((length(text) + 3) div 4 AS BIGINT)")

  private def purged(c: org.apache.spark.sql.Column) =
    pmod(c, lit(PurgeMod)) === PurgeRes

  // explicit read schemas: an EMPTY corpus writes surface directories
  // with no data files (a partitioned write of zero rows emits only
  // _SUCCESS), and schema inference would fail there — the sweep must
  // degrade to an all-zero report, not an AnalysisException
  private val StoreSchema = "doc_id LONG, source STRING, tok LONG"
  private val MvSchema = "source STRING, n_docs LONG, sum_tok LONG"
  private val IndexSchema = "vec_id LONG, cell INT"

  /** Build the three persisted surfaces under `base` (plus the empty
    * tombstone log, so a run with zero purge batches still reports). */
  private def buildSurfaces(s: SparkSession, dir: String,
      base: String): Unit = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), tok.as("tok"))
    docs.write.parquet(s"$base/store/adds")
    docs.select("doc_id").limit(0)
      .write.parquet(s"$base/store/tombstones")
    docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tok"))
      .write.parquet(s"$base/mv/binit")
    val assigned = Similarity.ivfAssign(s, dir).localCheckpoint(true)
    assigned.write.partitionBy("cell").parquet(s"$base/index")
    // build-time manifest (index size) + the touched-cell log the
    // report reads — so reconciliation never rescans the base tables
    assigned.agg(count(lit(1)).as("n_base")).write.parquet(s"$base/meta")
    assigned.select("cell").limit(0).write.parquet(s"$base/index_touched")
  }

  /** Pointer to the last COMMITTED MV version; flipping it is the
    * batch's commit point. */
  private def mvPointer(base: String) = new java.io.File(s"$base/mv/LATEST")

  /** Last batch id the MV pointer has committed (-1 before any). */
  private def lastApplied(base: String): Long = {
    val f = mvPointer(base)
    if (f.exists())
      java.nio.file.Files.readString(f.toPath).trim.toLong
    else -1L
  }

  /** Directory of the committed MV state. */
  private def mvCurrent(base: String): String = {
    val last = lastApplied(base)
    if (last < 0) s"$base/mv/binit" else s"$base/mv/b$last"
  }

  /** Apply ONE purge request batch (columns doc_id, source, tok)
    * through each surface's incremental path, EXACTLY-ONCE-EFFECTIVE
    * under foreachBatch's at-least-once replay. Tombstone appends and
    * the index rewrite are naturally idempotent/convergent (distinct
    * keys; a re-rewrite of already-purged cells is a no-op), but the
    * MV's SIGNED DELTA is not — a replayed batch would subtract
    * twice. So the MV runs the versioned-MERGE discipline
    * (ChunkStore's pattern with DETERMINISTIC version names): the new
    * state is computed from the last COMMITTED version and written to
    * a directory named by this batch id, and the pointer flip is the
    * commit. Replay before the flip recomputes the identical version
    * from the identical committed base; replay after the flip is
    * skipped outright at the top. */
  private def applyPurgeBatch(s: SparkSession, base: String,
      keys: DataFrame, batchId: Long = 0L): Unit = {
    if (lastApplied(base) >= batchId) return // replayed after commit
    val k = keys.localCheckpoint(true)
    // store: tombstone append — O(request) write IO
    k.select("doc_id").write.mode("append")
      .parquet(s"$base/store/tombstones")
    // mv: delete-only signed delta, committed-version in, b<id> out
    val delta = k.groupBy("source")
      .agg(count(lit(1)).as("d_docs"), sum(col("tok")).as("d_tok"))
    val mv2 = s.read.schema(MvSchema).parquet(mvCurrent(base))
      .join(broadcast(delta), Seq("source"), "left_outer")
      .select(col("source"),
        (col("n_docs") - coalesce(col("d_docs"), lit(0L))).as("n_docs"),
        (col("sum_tok") - coalesce(col("d_tok"), lit(0L))).as("sum_tok"))
      .filter(col("n_docs") > 0)
      .localCheckpoint(true)
    mv2.write.mode("overwrite").parquet(s"$base/mv/b$batchId")
    // index: rewrite ONLY the cells holding one of this batch's codes
    val idx = s.read.schema(IndexSchema).parquet(s"$base/index")
    val batchIds = k.select(col("doc_id").as("vec_id"))
    val affected = idx.join(broadcast(batchIds), Seq("vec_id"))
      .select("cell").distinct().localCheckpoint(true)
    affected.write.mode("append").parquet(s"$base/index_touched")
    val survivors = idx.join(broadcast(affected), Seq("cell"))
      .join(broadcast(batchIds), Seq("vec_id"), "left_anti")
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
    // commit: atomic pointer flip AFTER every surface landed
    val ptr = mvPointer(base)
    ptr.getParentFile.mkdirs()
    val tmp = new java.io.File(s"$base/mv", s"LATEST.tmp$batchId")
    java.nio.file.Files.writeString(tmp.toPath, batchId.toString)
    java.nio.file.Files.move(tmp.toPath, ptr.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Reconciliation across the three PERSISTED surfaces. */
  private def report(s: SparkSession, dir: String,
      base: String): DataFrame = {
    val nTomb = s.read.schema("doc_id LONG")
      .parquet(s"$base/store/tombstones")
      .select("doc_id").distinct().count()
    val live = s.read.schema(StoreSchema).parquet(s"$base/store/adds")
      .join(broadcast(s.read.schema("doc_id LONG")
        .parquet(s"$base/store/tombstones")), Seq("doc_id"), "left_anti")
    val storeRow = live.agg(
      lit("store").as("surface"),
      count(lit(1)).as("n_rows"),
      coalesce(sum(col("doc_id")), lit(0L)).as("checksum"),
      lit(0L).as("n_groups")).withColumn("n_purged", lit(nTomb))
    val mvRow = s.read.schema(MvSchema).parquet(mvCurrent(base)).agg(
      lit("mv").as("surface"),
      coalesce(sum(col("n_docs")), lit(0L)).as("n_rows"),
      coalesce(sum(col("sum_tok")), lit(0L)).as("checksum"),
      count(lit(1)).as("n_groups")).withColumn("n_purged", lit(nTomb))
    // affected cells and the index baseline come from PERSISTED state
    // (the touched-cell log and the build-time manifest) — the report
    // never rescans the base tables; occupancy drop is read from the
    // index itself
    val nCells = s.read.schema("cell INT")
      .parquet(s"$base/index_touched").distinct().count()
    val nBase = s.read.schema("n_base LONG").parquet(s"$base/meta")
      .agg(coalesce(sum(col("n_base")), lit(0L))).head().getLong(0)
    val idxRow = s.read.schema(IndexSchema)
      .parquet(s"$base/index").agg(
      lit("index").as("surface"),
      count(lit(1)).as("n_rows"),
      coalesce(sum(col("vec_id")), lit(0L)).as("checksum"),
      lit(nCells).as("n_groups"),
      (lit(nBase) - count(lit(1))).as("n_purged"))
    storeRow.unionByName(mvRow).unionByName(idxRow)
      .select(col("surface"), col("n_rows").cast("long"),
        col("checksum").cast("long"), col("n_groups").cast("long"),
        col("n_purged").cast("long"))
      .orderBy("surface")
      .localCheckpoint(true)
  }

  /** Batch sweep: build, apply the whole request in one pass,
    * reconcile. */
  def purgeSweep(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("purge")
    try {
      // bench sessions stage the pristine surfaces once and copy them
      // in (the run mutates all three); Verify builds per run
      graft.streaming.StageCache.materialize(
        s"purge_surfaces_${graft.streaming.StageCache.dirKey(dir)}",
        base)(d => buildSurfaces(s, dir, d.toString))
      val keys = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), tok.as("tok"))
        .filter(purged(col("doc_id")))
      applyPurgeBatch(s, base.toString, keys)
      report(s, dir, base.toString)
    } finally Sync.deleteTree(base.toFile)
  }

  /** Streaming sweep: the SAME purge request arrives as a stream of
    * key files (two ascending id-range slices), each micro-batch
    * applied through [[applyPurgeBatch]] via foreachBatch. The final
    * report must be IDENTICAL to the batch sweep's — the two rows
    * share one DuckDB oracle, so a request lost or replayed across
    * micro-batch boundaries, or maintenance reading stale state
    * between triggers, lands as a hash mismatch. */
  def purgeSweepStream(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("purgestream")
    try {
      // surfaces AND the staged request slices are pure functions of
      // the corpus — one cached tree covers both; mtime-preserving
      // copy keeps the replay order
      graft.streaming.StageCache.materialize(
        s"purge_stream_${graft.streaming.StageCache.dirKey(dir)}",
        base) { d =>
        buildSurfaces(s, dir, d.toString)
        val keys = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), tok.as("tok"))
          .filter(purged(col("doc_id")))
        keys.repartitionByRange(2, col("doc_id"))
          .write.parquet(s"$d/requests")
        val t0 = System.currentTimeMillis() - 3600 * 1000L
        new java.io.File(s"$d/requests").listFiles()
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
          .zipWithIndex
          .foreach { case (f, i) => f.setLastModified(t0 + i * 60000L) }
      }
      val stream = s.readStream
        .schema(StoreSchema) // requests carry exactly the store shape
        .option("maxFilesPerTrigger", 1).parquet(s"$base/requests")
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          if (!b.isEmpty) applyPurgeBatch(s, base.toString, b, id)
          ()
        }
        .option("checkpointLocation", s"$base/ckpt").start()
      try q.processAllAvailable() finally q.stop()
      report(s, dir, base.toString)
    } finally Sync.deleteTree(base.toFile)
  }
}
