package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** robots.txt parsing and allow/deny evaluation — the crawl-frontier
  * gate the reference's crawler family implies (its BFS fetches live
  * sites; a production deployment must not fetch what the site
  * disallows). Dependency-free Robots Exclusion Protocol core:
  *
  *   - GROUP SELECTION: the most specific matching `User-agent` group
  *     wins (exact agent name over `*`); multiple consecutive
  *     user-agent lines share one group; a non-matching group's rules
  *     are ignored entirely.
  *   - RULE PRECEDENCE: longest-path-match wins between Allow and
  *     Disallow; on equal length Allow wins (the Google/RFC 9309
  *     tie-break). Empty Disallow means allow-all.
  *   - Comments (`#`), blank lines, and directive case are handled.
  *
  * The oracle row stages one robots.txt per domain whose rules derive
  * from domain arithmetic (disallow the id first-digit prefix, allow
  * back a longer two-digit prefix), PLUS a `*` group that disallows
  * everything under `/p/` — so a parser that merges groups, picks the
  * wrong group, or gets longest-match/tie-break wrong diverges
  * catastrophically from the DuckDB mirror (pure starts_with
  * arithmetic). Parsing runs once per domain (metadata-scale);
  * evaluation is a zero-shuffle per-row kernel. */
object RobotsTxt {

  /** Parsed rule: (isAllow, path prefix). */
  type Rule = (Boolean, String)

  /** Parse robots.txt and return the rule list of the group the given
    * agent should obey (most specific user-agent match; `*` fallback;
    * empty if no group matches). */
  def parse(text: String, agent: String): List[Rule] = {
    val lines = text.split("\n").iterator
      .map(_.takeWhile(_ != '#').trim) // strip comments
      .filter(_.nonEmpty)
      .toList
    // fold into groups: consecutive user-agent lines open a group;
    // any rule line closes the agent-accumulation phase
    final case class Group(agents: List[String], rules: List[Rule])
    val (groups, last) = lines.foldLeft(
      (List.empty[Group], Option.empty[Group])) {
      case ((done, cur), line) =>
        val lower = line.toLowerCase
        def directive(name: String): Option[String] =
          if (lower.startsWith(name + ":"))
            Some(line.substring(name.length + 1).trim)
          else None
        directive("user-agent") match {
          case Some(a) => cur match {
            case Some(g) if g.rules.isEmpty => // consecutive UA lines
              (done, Some(g.copy(agents = a.toLowerCase :: g.agents)))
            case Some(g) => (done :+ g, Some(Group(List(a.toLowerCase), Nil)))
            case None => (done, Some(Group(List(a.toLowerCase), Nil)))
          }
          case None =>
            val rule = directive("allow").map(p => (true, p))
              .orElse(directive("disallow").map(p => (false, p)))
            (done, cur.map(g => rule match {
              case Some(r) => g.copy(rules = g.rules :+ r)
              case None => g // unknown directive: ignored
            }))
        }
    }
    val all = groups ++ last.toList
    val a = agent.toLowerCase
    // Most-specific match per RFC 9309 §2.2.1: among non-'*' groups
    // whose token the agent contains, the LONGEST token wins (file
    // order must not let a generic 'bot' group shadow an exact
    // 'graftbot' group later in the file), and every group naming that
    // same winning token contributes its rules (groups with identical
    // user-agent lines merge).
    val token = all.iterator
      .flatMap(_.agents.filter(ua => ua != "*" && a.contains(ua)))
      .maxByOption(_.length)
    token match {
      case Some(t) =>
        all.filter(_.agents.contains(t)).flatMap(_.rules)
      case None =>
        val wild = all.filter(_.agents.contains("*"))
        wild.flatMap(_.rules)
    }
  }

  /** RFC 9309 evaluation: longest matching rule wins; Allow wins ties;
    * no match (or an empty-path Disallow) means allowed. */
  def isAllowed(rules: List[Rule], path: String): Boolean = {
    val matching = rules.filter { case (_, p) =>
      p.nonEmpty && path.startsWith(p)
    }
    if (matching.isEmpty) true
    else {
      val best = matching.maxBy { case (allow, p) =>
        (p.length, allow) // tie at equal length → allow sorts last
      }
      best._1
    }
  }

  /** Robots fixture of domain `d`: a decoy group (full disallow for a
    * different bot), a `*` group blocking all of /p/, and the
    * agent-specific group with the arithmetic-derived rules. */
  private[graft] def fixtureText(d: Long): String = {
    val f = d % 10
    val g = (d + 3) % 10
    s"""# robots for host-$d
       |User-Agent: otherbot
       |Disallow: /
       |
       |User-agent: *
       |Disallow: /p/
       |
       |user-agent: graftbot
       |Disallow: /p/$f
       |Allow: /p/$f$g
       |""".stripMargin
  }

  /** Per-domain allow/deny accounting of the crawl frontier under the
    * staged robots fixtures. */
  def robotsReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rules: Map[Long, List[Rule]] =
      (0L until 20L).map(d => d -> parse(fixtureText(d), "graftbot")).toMap
    val docs = Tables.documents(s, dir).select("doc_id").as[Long]
    docs.map { id =>
      val dom = id % 20
      val ok = isAllowed(rules(dom), s"/p/$id")
      (dom, id, ok)
    }.toDF("domain", "doc_id", "allowed")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        sum(col("allowed").cast("long")).as("n_allowed"),
        sum((!col("allowed")).cast("long")).as("n_blocked"),
        coalesce(sum(when(!col("allowed"), col("doc_id"))), lit(0L))
          .as("sum_id_blocked"))
      .orderBy("domain")
  }
}
