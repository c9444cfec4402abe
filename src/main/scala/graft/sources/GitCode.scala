package graft.sources

/** Pure semantics of the GitHub code source's incremental layer
  * (reference doc2vec.ts:1347-1464): the SHA watermark key, the
  * `git diff --name-status` parser that drives the allowed/deleted
  * sets, and code file-URL construction. The git shell-outs themselves
  * stay driver-side by design (SURVEY §2.1); everything DETERMINISTIC
  * about them lives here, testable and reusable by a Spark job that
  * consumes staged diff output — `parseNameStatus(...).changed` feeds
  * [[LocalDirectory.restrictToAllowed]], `deleted` maps through
  * [[codeFileUrl]] into the per-URL delete set. */
object GitCode {

  /** `code_last_sha_<repo>_<branch>` with runs of non-alphanumerics
    * collapsed to single underscores (doc2vec.ts:1347-1351) — the KV
    * watermark key the HEAD-SHA comparison reads and writes. */
  def shaMetadataKey(repo: String, branch: String): String = {
    def norm(s: String) = s.replaceAll("[^a-zA-Z0-9]+", "_")
    s"code_last_sha_${norm(repo)}_${norm(branch)}"
  }

  /** Parsed `--name-status` diff: `changed` are absolute paths under
    * the repo (the allowedFiles semi-join side), `deleted` are
    * repo-relative paths in diff order (the per-URL purge side). */
  final case class DiffSets(changed: Set[String], deleted: Seq[String])

  /** Parse `git diff --name-status <sha>..HEAD` output
    * (doc2vec.ts:1413-1435): `A`/`M` → changed, `D` → deleted,
    * `R<score> old new` → deleted(old) + changed(new) — a rename purges
    * the old URL's chunks and re-ingests under the new one. Blank
    * lines are skipped; fields are tab-separated. */
  def parseNameStatus(diffOutput: String, repoPath: String): DiffSets = {
    val changed = scala.collection.mutable.LinkedHashSet.empty[String]
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    def abs(rel: String): String =
      new java.io.File(repoPath, rel).getPath
    for (line <- Option(diffOutput).getOrElse("").split("\n", -1)) {
      val t = line.trim
      if (t.nonEmpty) {
        val parts = t.split("\t")
        val status = parts(0)
        if (status.startsWith("R")) {
          if (parts.length > 1 && parts(1).nonEmpty) deleted += parts(1)
          if (parts.length > 2 && parts(2).nonEmpty) changed += abs(parts(2))
        } else if (status == "D") {
          if (parts.length > 1 && parts(1).nonEmpty) deleted += parts(1)
        } else if (status == "A" || status == "M") {
          if (parts.length > 1 && parts(1).nonEmpty) changed += abs(parts(1))
        }
      }
    }
    DiffSets(changed.toSet, deleted.toSeq)
  }

  /** Code file URL (doc2vec.ts:1439-1464). Priority: `repoUrlPrefix`
    * (GitHub blob URL — applied unconditionally), then
    * `urlRewritePrefix` (trailing slash trimmed; files OUTSIDE the base
    * path fall back to `file://`), else `file://`. Relative paths use
    * forward slashes. */
  def codeFileUrl(filePath: String, basePath: String,
      urlRewritePrefix: Option[String] = None,
      repoUrlPrefix: Option[String] = None): String = {
    val rel = java.nio.file.Paths.get(basePath)
      .relativize(java.nio.file.Paths.get(filePath))
      .toString.replace('\\', '/')
    repoUrlPrefix match {
      case Some(p) => s"$p/$rel"
      case None => urlRewritePrefix match {
        case Some(p) if !rel.startsWith("..") =>
          val trimmed = if (p.endsWith("/")) p.dropRight(1) else p
          s"$trimmed/$rel"
        case _ => s"file://$filePath"
      }
    }
  }
}
