package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Notifier
import graft.operators.Notifier.{RunRecord, SourceStat}

/** Golden payloads for the run-completion notifier kernel (reference
  * controller/notifier.ts:32-116): status routing, headline decor and
  * link forms, the five-entry failure cap, error shadowing, and
  * duration formatting across all three granularity buckets. */
class NotifierSpec extends AnyFunSuite {

  private def run(status: String = "succeeded",
      sources: Seq[SourceStat] = Seq.empty,
      error: Option[String] = None,
      started: Option[Long] = Some(0L),
      finished: Option[Long] = Some(42000L),
      warn: Long = 0, err: Long = 0): RunRecord =
    RunRecord(7L, status, "docs site", "schedule", started, finished,
      warn, err, error, sources)

  test("routing: terminal statuses only; failures mode drops successes") {
    for (st <- Seq("succeeded", "failed", "canceled"))
      assert(Notifier.shouldNotify(st, "all"), st)
    for (st <- Seq("skipped", "running", "queued"))
      assert(!Notifier.shouldNotify(st, "all"), st)
    assert(!Notifier.shouldNotify("succeeded", "failures"))
    // 'failures' also covers canceled runs (notifier.ts:8)
    assert(Notifier.shouldNotify("canceled", "failures"))
    assert(Notifier.shouldNotify("failed", "failures"))
  }

  test("golden: success headline with view-run link and meta") {
    val (fallback, body, meta) = Notifier.buildRunMessage(
      run(sources = Seq(SourceStat("a", ok = true, None),
        SourceStat("b", ok = true, None))),
      Some("https://d2v.example.com/"))
    assert(fallback == "doc2vec sync docs site succeeded")
    assert(body ==
      "✅ doc2vec sync *docs site* succeeded — " +
        "<https://d2v.example.com/runs/7|view run #7>\n" +
        "2/2 sources ok")
    assert(meta == "trigger: schedule · duration: 42s")
  }

  test("golden: failure without public url lists sources, caps at five") {
    val srcs = (0 until 7).map(j =>
      SourceStat(s"p$j", ok = false,
        if (j % 2 == 0) Some(s"e$j") else None))
    val (_, body, _) = Notifier.buildRunMessage(
      run(status = "failed", sources = srcs,
        error = Some("shadowed by per-source failures")), None)
    assert(body ==
      "❌ doc2vec sync *docs site* failed (run #7)\n" +
        "0/7 sources ok\n" +
        "• *p0*: e0\n• *p1*: failed\n• *p2*: e2\n• *p3*: failed\n" +
        "• *p4*: e4\n• …and 2 more")
    // the run-level error is NOT appended — the source list explains it
    assert(!body.contains("shadowed"))
  }

  test("golden: run-level error surfaces when no source failed") {
    val (_, body, meta) = Notifier.buildRunMessage(
      run(status = "canceled", error = Some("operator canceled"),
        started = None, finished = None, warn = 3, err = 1), None)
    assert(body ==
      "⚠️ doc2vec sync *docs site* was canceled (run #7)\n" +
        "operator canceled")
    // no timestamps → no duration; nonzero counts appear
    assert(meta == "trigger: schedule · warnings: 3 · errors: 1")
  }

  test("duration buckets: s / m+s / h+m; missing timestamps → none") {
    def d(ms: Long) = Notifier.formatDuration(Some(0L), Some(ms)).get
    assert(d(59400) == "59s")
    assert(d(61000) == "1m 1s")
    assert(d(3599000) == "59m 59s")
    assert(d(3600000) == "1h 0m")
    assert(d(8019000) == "2h 13m")
    assert(Notifier.formatDuration(None, Some(1L)).isEmpty)
    assert(Notifier.formatDuration(Some(1L), None).isEmpty)
  }

  test("unknown status falls back to info decor with the raw verb") {
    assert(Notifier.decor("archived") == ("ℹ️", "archived"))
  }
}
