package graft.sources

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Locale

/** Deterministic document renderers (SURVEY.md §2.2): API records →
  * Markdown pages, matching the reference's templates byte-for-byte
  * (GitHub issues doc2vec.ts:441-465; Zendesk tickets doc2vec.ts:
  * 1586-1627; articles doc2vec.ts:1825-1854). Pure string builders —
  * they run as per-row transforms inside the ingest flatMap.
  */
object Renderers {

  case class IssueComment(author: String, createdAt: String, body: String)
  case class Issue(number: Long, title: String, author: String,
      state: String, createdAt: String, updatedAt: String,
      labels: Seq[String], body: Option[String], isPullRequest: Boolean,
      comments: Seq[IssueComment])

  case class Article(id: Long, title: String, authorId: Long,
      sectionId: Long, createdAt: String, updatedAt: String,
      voteSum: Long, voteCount: Long, labelNames: Seq[String],
      body: Option[String])

  case class TicketComment(authorId: Long, createdAt: String,
      isPublic: Boolean, body: String)
  case class Ticket(id: Long, subject: String, status: String,
      priority: Option[String], ticketType: Option[String],
      requesterId: Long, assigneeId: Option[Long], createdAt: String,
      updatedAt: String, tags: Seq[String], description: Option[String],
      comments: Seq[TicketComment])

  /** JS `Date#toDateString()` format ("Mon Jan 01 2024") for an ISO
    * timestamp — the reference renders all dates this way. */
  def toDateString(iso: String): String = {
    val fmt = DateTimeFormatter.ofPattern("EEE MMM dd yyyy", Locale.US)
    Instant.parse(if (iso.endsWith("Z")) iso else iso + "Z")
      .atZone(ZoneOffset.UTC).format(fmt)
  }

  /** GitHub issue/PR → Markdown (reference: doc2vec.ts:441-465). */
  def renderIssue(i: Issue): String = {
    val label = if (i.isPullRequest) "PR" else "Issue"
    val sb = new StringBuilder
    sb.append(s"# $label #${i.number}: ${i.title}\n\n")
    sb.append(s"- **Type:** ${if (i.isPullRequest) "Pull request" else "Issue"}\n")
    sb.append(s"- **Author:** ${i.author}\n")
    sb.append(s"- **State:** ${i.state}\n")
    sb.append(s"- **Created on:** ${toDateString(i.createdAt)}\n")
    sb.append(s"- **Updated on:** ${toDateString(i.updatedAt)}\n")
    val labels =
      if (i.labels.isEmpty) "None" else i.labels.map(l => s"`$l`").mkString(", ")
    sb.append(s"- **Labels:** $labels\n\n")
    sb.append(s"## Description\n\n${i.body.getOrElse("_No description._")}\n\n## Comments\n\n")
    if (i.comments.isEmpty) sb.append("_No comments._\n")
    else i.comments.foreach { c =>
      sb.append(s"### ${c.author} - ${toDateString(c.createdAt)}\n\n${c.body}\n\n---\n\n")
    }
    sb.toString
  }

  /** Zendesk help-center article → Markdown (reference
    * `generateMarkdownForArticle`, doc2vec.ts:1825-1854): title heading,
    * author/section/created/updated/vote bullets, optional backticked
    * label list, then the body under `## Content` — HTML bodies go
    * through the HTML→Markdown converter, plain text passes through,
    * blank bodies render `_No content._`. */
  def renderArticle(a: Article): String = {
    val sb = new StringBuilder
    sb.append(s"# ${a.title}\n\n")
    sb.append(s"- **Author:** ${a.authorId}\n")
    sb.append(s"- **Section:** ${a.sectionId}\n")
    sb.append(s"- **Created:** ${toDateString(a.createdAt)}\n")
    sb.append(s"- **Updated:** ${toDateString(a.updatedAt)}\n")
    sb.append(s"- **Vote Sum:** ${a.voteSum}\n")
    sb.append(s"- **Vote Count:** ${a.voteCount}\n")
    if (a.labelNames.nonEmpty)
      sb.append(
        s"- **Labels:** ${a.labelNames.map(l => s"`$l`").mkString(", ")}\n")
    val body = a.body.getOrElse("")
    val clean =
      if (body.trim.isEmpty) "_No content._"
      else if (body.contains("<"))
        graft.functions.HtmlToMarkdown.convert(body)
      else body
    sb.append(s"\n## Content\n\n$clean\n")
    sb.toString
  }

  /** Zendesk ticket → Markdown (reference: doc2vec.ts:1586-1627);
    * internal comments skipped unless includeInternal. */
  def renderTicket(t: Ticket, includeInternal: Boolean = false): String = {
    val sb = new StringBuilder
    sb.append(s"# Ticket #${t.id}: ${t.subject}\n\n")
    sb.append(s"- **Status:** ${t.status}\n")
    sb.append(s"- **Priority:** ${t.priority.getOrElse("None")}\n")
    sb.append(s"- **Type:** ${t.ticketType.getOrElse("None")}\n")
    sb.append(s"- **Requester:** ${t.requesterId}\n")
    sb.append(s"- **Assignee:** ${t.assigneeId.map(_.toString).getOrElse("Unassigned")}\n")
    sb.append(s"- **Created:** ${toDateString(t.createdAt)}\n")
    sb.append(s"- **Updated:** ${toDateString(t.updatedAt)}\n")
    if (t.tags.nonEmpty)
      sb.append(s"- **Tags:** ${t.tags.map(x => s"`$x`").mkString(", ")}\n")
    sb.append(s"\n## Description\n\n${t.description.filter(_.nonEmpty).getOrElse("_No description._")}\n\n")
    val visible = t.comments.filter(c => c.isPublic || includeInternal)
    if (visible.nonEmpty) {
      sb.append("## Comments\n\n")
      visible.foreach { c =>
        val vis = if (c.isPublic) "" else " (internal)"
        val body = Option(c.body).map(_.replace("&nbsp;", " "))
          .filter(_.nonEmpty).getOrElse("_No content._")
        sb.append(s"### ${c.authorId} - ${toDateString(c.createdAt)}$vis\n\n$body\n\n---\n\n")
      }
    } else sb.append("## Comments\n\n_No comments._\n")
    sb.toString
  }
}
