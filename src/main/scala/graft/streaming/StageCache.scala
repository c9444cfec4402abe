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

  /** Sanitized cache-key fragment for a testdata dir. */
  def dirKey(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]+", "_")

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

  /** Resolve the staging dir for `key`: under the cache root when the
    * prop is set (building at most once), else a fresh temp dir built
    * unconditionally. Returns (path, cached) — a cached dir must NOT
    * be deleted by the caller's teardown. */
  def resolve(key: String)(
      build: java.nio.file.Path => Unit): (java.nio.file.Path, Boolean) =
    sys.props.get(Prop) match {
      case Some(root) =>
        val dir = java.nio.file.Paths.get(root, key)
        val marker = dir.resolve("_STAGED")
        if (!java.nio.file.Files.exists(marker)) {
          graft.operators.Sync.deleteTree(dir.toFile)
          java.nio.file.Files.createDirectories(dir)
          build(dir)
          java.nio.file.Files.writeString(marker, "ok")
        }
        (dir, true)
      case None =>
        val dir = java.nio.file.Files.createTempDirectory("graftstage")
        build(dir)
        (dir, false)
    }
}
