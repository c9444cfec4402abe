package graft.streaming

/** Session-scoped staging cache for the streaming parity rows' INPUT
  * corpora (round-13 verdict #7: 13 `stream_*` rows spent ~30% of the
  * clean bench total, much of it re-writing identical fixture parquet
  * per invocation).
  *
  * The bench main points [[Prop]] at a per-process temp dir; each
  * parity row then stages its read-only input files ONCE per (row,
  * sf-dir) key and replays them on every subsequent invocation —
  * exactly the reuse a pipeline owner gets from persisted stage
  * outputs (the `curation_funnel` cache pattern). Mutable surfaces
  * (output stores, checkpoints, staged MVs) are NEVER cached: every
  * run gets a fresh work dir, so results stay bit-identical to the
  * uncached path. Verify leaves the prop unset and keeps today's
  * build-per-run behavior — the oracle rows don't depend on the cache.
  *
  * A build is valid only once its `_STAGED` marker lands (written
  * after the build completes); a crashed half-build is wiped and
  * rebuilt rather than consumed. */
object StageCache {
  val Prop = "graft.stream.cache"

  /** Sanitized cache-key fragment for a testdata dir, INCLUDING a
    * corpus fingerprint (round-14 verdict #5): the path alone would
    * replay stale fixtures if the corpus at that path were regenerated
    * within one bench process. The fingerprint folds every FILE's
    * (root-relative path, length, mtime) with full directory recursion
    * — so a file rewritten anywhere in a nested layout (e.g. a
    * partitioned table's leaf) changes the key and forces a rebuild;
    * hashing only leaf names or capping the depth would let a
    * regenerated nested corpus keep its stale key. A handful of stat
    * calls per invocation; no file contents are read. */
  def dirKey(dir: String): String =
    dir.replaceAll("[^a-zA-Z0-9]+", "_") + "_" +
      java.lang.Long.toHexString(fingerprint(new java.io.File(dir)))

  private[graft] def fingerprint(root: java.io.File): Long = {
    def entries(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName)
          .flatMap(entries)
      else Seq(f)
    val rootPath = root.toPath.toAbsolutePath
    entries(root).foldLeft(1125899906842597L) { (h, f) =>
      val rel =
        try rootPath.relativize(f.toPath.toAbsolutePath).toString
        catch { case _: IllegalArgumentException => f.getPath }
      val s = s"$rel:${f.length}:${f.lastModified}"
      s.foldLeft(h * 31 + 17)((a, c) => a * 31 + c)
    }
  }

  /** For fixtures the run MUTATES in place (a purge sweep's surfaces,
    * a merge-on-read store): stage the pristine tree once under the
    * cache, then COPY it into the per-run work dir — a sub-second file
    * copy (the staged surfaces are fixture-sized) replacing seconds of
    * Spark fixture-build jobs per invocation. mtimes are preserved so
    * staged replay order survives the copy. Uncached (Verify), builds
    * directly into `into` — today's behavior, no extra IO. */
  def materialize(key: String, into: java.nio.file.Path)(
      build: java.nio.file.Path => Unit): Unit =
    sys.props.get(Prop) match {
      case Some(_) =>
        val (staged, _) = resolve(key)(build)
        copyTree(staged, into)
      case None => build(into)
    }

  private def copyTree(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val walk = Files.walk(src)
    try walk.forEach { p =>
      val rel = src.relativize(p)
      if (rel.toString != "_STAGED") {
        val target = dst.resolve(rel)
        if (Files.isDirectory(p)) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.COPY_ATTRIBUTES)
        }
      }
    } finally walk.close()
  }

  // Per-key build locks: two threads sharing a key must not race the
  // marker check-then-wipe-then-build — one's deleteTree could destroy
  // the other's half-built tree and the marker would then bless a
  // corrupt cache (r14 ADVICE). Bench runs rows serially today, but
  // nothing enforced that contract until this lock did.
  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Resolve the staging dir for `key`: under the cache root when the
    * prop is set (building at most once; concurrent callers of the
    * same key serialize on a per-key lock), else a fresh temp dir
    * built unconditionally. Returns (path, cached) — a cached dir must
    * NOT be deleted by the caller's teardown. */
  def resolve(key: String)(
      build: java.nio.file.Path => Unit): (java.nio.file.Path, Boolean) =
    sys.props.get(Prop) match {
      case Some(root) =>
        keyLocks.computeIfAbsent(key, _ => new Object).synchronized {
          val dir = java.nio.file.Paths.get(root, key)
          val marker = dir.resolve("_STAGED")
          if (!java.nio.file.Files.exists(marker)) {
            graft.operators.Sync.deleteTree(dir.toFile)
            java.nio.file.Files.createDirectories(dir)
            build(dir)
            java.nio.file.Files.writeString(marker, "ok")
          }
          (dir, true)
        }
      case None =>
        val dir = java.nio.file.Files.createTempDirectory("graftstage")
        build(dir)
        (dir, false)
    }
}
