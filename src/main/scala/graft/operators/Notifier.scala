package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Run-completion notification semantics (SURVEY.md §2.9, reference
  * controller/notifier.ts:32-116) — the last control-plane sub-surface:
  * which run-status transitions notify, and the deterministic webhook
  * payload built for each (headline with status decor and an optional
  * run link, per-source failure listing capped at five, duration
  * formatting, metadata footer). The webhook POST itself is transport
  * (driver-side, like the crawler's HTTP fetch); everything
  * DETERMINISTIC lives here as a pure kernel the oracle row replays
  * over a run corpus derived from documents arithmetic.
  *
  * Scale: notification is per-run (metadata-sized); the oracle row maps
  * the kernel over a bounded run fixture with zero shuffles. */
object Notifier {

  /** Per-source outcome inside a run's stats (reference
    * RunRecord.stats.sources). */
  final case class SourceStat(productName: String, ok: Boolean,
      error: Option[String])

  /** The slice of the reference's RunRecord the notifier consumes. */
  final case class RunRecord(id: Long, status: String, configName: String,
      trigger: String, startedAtMs: Option[Long],
      finishedAtMs: Option[Long], warnCount: Long, errorCount: Long,
      error: Option[String], sources: Seq[SourceStat])

  /** Terminal statuses worth a notification — 'skipped' (overlapping
    * schedule) deliberately excluded (notifier.ts:12-14). */
  val NotifiedStatuses: Set[String] = Set("succeeded", "failed", "canceled")

  /** Channel routing: notify='failures' also covers canceled runs —
    * only a SUCCESS is suppressed (notifier.ts:101-102). */
  def shouldNotify(status: String, notifyMode: String): Boolean =
    NotifiedStatuses.contains(status) &&
      !(notifyMode == "failures" && status == "succeeded")

  /** Status decor (notifier.ts:16-20); unknown statuses fall back to
    * the info emoji with the raw status as verb. */
  def decor(status: String): (String, String) = status match {
    case "succeeded" => ("✅", "succeeded")
    case "failed"    => ("❌", "failed")
    case "canceled"  => ("⚠️", "was canceled")
    case other       => ("ℹ️", other)
  }

  /** Duration rendering (notifier.ts:22-29): seconds under a minute,
    * `Mm Ss` under an hour, `Hh Mm` beyond; None when either timestamp
    * is missing. */
  def formatDuration(startedAtMs: Option[Long],
      finishedAtMs: Option[Long]): Option[String] =
    for (s <- startedAtMs; f <- finishedAtMs) yield {
      val seconds = (f - s) / 1000.0
      if (seconds < 60) s"${math.round(seconds)}s"
      else {
        val minutes = math.floor(seconds / 60).toLong
        if (minutes < 60) s"${minutes}m ${math.round(seconds % 60)}s"
        else s"${minutes / 60}h ${minutes % 60}m"
      }
    }

  /** The webhook payload's deterministic content (notifier.ts:32-77)
    * as (fallback text, section body, context meta):
    *
    *   - headline: decor emoji + `doc2vec sync *name* verb`, plus a
    *     `view run` link when a public url is configured (trailing
    *     slash trimmed) or `(run #id)` otherwise;
    *   - `ok/total sources ok` when the run carried source stats;
    *   - failed sources listed `• *product*: error` (missing error →
    *     'failed'), capped at five with an `…and N more` overflow line;
    *   - the run-level error only when NO per-source failure explains
    *     it;
    *   - meta: trigger, duration when both timestamps exist, and
    *     warning/error counts only when nonzero, joined ` · `. */
  def buildRunMessage(run: RunRecord,
      publicUrl: Option[String]): (String, String, String) = {
    val (emoji, verb) = decor(run.status)
    val failed = run.sources.filterNot(_.ok)

    val headline = s"$emoji doc2vec sync *${run.configName}* $verb" +
      (publicUrl match {
        case Some(u) =>
          val base = u.replaceAll("/$", "")
          s" — <$base/runs/${run.id}|view run #${run.id}>"
        case None => s" (run #${run.id})"
      })

    val lines = Seq.newBuilder[String]
    if (run.sources.nonEmpty)
      lines += s"${run.sources.size - failed.size}/${run.sources.size} sources ok"
    if (failed.nonEmpty) {
      val shown = failed.take(5)
        .map(s => s"• *${s.productName}*: ${s.error.getOrElse("failed")}")
      val overflow =
        if (failed.size > 5) Seq(s"• …and ${failed.size - 5} more")
        else Seq.empty
      lines += (shown ++ overflow).mkString("\n")
    }
    run.error.foreach(e => if (failed.isEmpty) lines += e)

    val meta = Seq(s"trigger: ${run.trigger}") ++
      formatDuration(run.startedAtMs, run.finishedAtMs)
        .map(d => s"duration: $d") ++
      (if (run.warnCount > 0) Seq(s"warnings: ${run.warnCount}") else Nil) ++
      (if (run.errorCount > 0) Seq(s"errors: ${run.errorCount}") else Nil)

    (s"doc2vec sync ${run.configName} $verb",
      (headline +: lines.result()).mkString("\n"),
      meta.mkString(" · "))
  }

  /** The ctl_notify oracle row: a run corpus derived from documents
    * arithmetic — statuses across all five classes (terminal,
    * 'skipped', 'running'), 0-19 sources per run with planted failures
    * — every-3rd-source failure over up to 19 sources yields runs with
    * 6-7 failed sources, so the five-entry cap and the '…and N more'
    * overflow line both occur IN THE ORACLE (r14 ADVICE: at 0-7
    * sources the cap was pinned only by NotifierSpec) — missing
    * timestamps, run-level errors that per-source failures shadow, and
    * both notify modes — replayed through [[shouldNotify]] and
    * [[buildRunMessage]]. Suppressed runs emit empty payloads, so the
    * hash pins the routing decision AND the message content. */
  def notifyReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val publicBase = "https://ctl.example.com/"
    val out = Tables.documents(s, dir).filter(col("doc_id") < 60)
      .select("doc_id").as[Long]
      .map { id =>
        val status = (id % 5) match {
          case 0 => "succeeded"
          case 1 => "failed"
          case 2 => "canceled"
          case 3 => "skipped"
          case _ => "running"
        }
        val nSrc = (id % 20).toInt
        val sources = (0 until nSrc).map { j =>
          SourceStat(s"prod_$j", ok = (id + j) % 3 != 0,
            error = if ((id + j) % 2 == 0) Some(s"boom_$j") else None)
        }
        val run = RunRecord(
          id = id, status = status,
          configName = s"cfg_${id % 7}",
          trigger = if (id % 2 == 0) "schedule" else "manual",
          startedAtMs = if (id % 9 != 0) Some(0L) else None,
          finishedAtMs =
            if (id % 9 != 0) Some((id * 7919 % 8000) * 1000L) else None,
          warnCount = id % 3, errorCount = id % 2,
          error = if ((status == "failed" || status == "canceled") &&
            id % 4 == 0) Some(s"exit code ${id % 3}") else None,
          sources = sources)
        val mode = if (id % 2 == 0) "all" else "failures"
        val notified = shouldNotify(status, mode)
        val (fallback, body, meta) =
          if (notified)
            buildRunMessage(run,
              if (id % 6 < 3) Some(publicBase) else None)
          else ("", "", "")
        (id, mode, status, notified.toString, fallback, body, meta)
      }
      .toDF("run_id", "notify_mode", "status", "notified", "fallback",
        "body", "meta")
    out.orderBy("run_id")
  }
}
