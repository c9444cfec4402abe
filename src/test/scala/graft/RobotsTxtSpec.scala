package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RobotsTxt

/** REP parser corners on hand fixtures: group selection, consecutive
  * user-agent lines, longest-match precedence, the Allow tie-break,
  * comments/case/blank-line handling, and empty-disallow. */
class RobotsTxtSpec extends AnyFunSuite {

  private val txt =
    """# global comment
      |User-Agent: megabot
      |User-agent: gigabot
      |Disallow: /shared/
      |
      |user-agent: *
      |Disallow: /private/
      |Allow: /private/ok
      |
      |User-agent: graftbot   # inline comment
      |Disallow: /a/b
      |Allow: /a/bc
      |Disallow: /a/bcd
      |Allow:
      |""".stripMargin

  test("group selection: specific agent beats *; decoys are ignored") {
    val mine = RobotsTxt.parse(txt, "graftbot")
    assert(mine == List((false, "/a/b"), (true, "/a/bc"),
      (false, "/a/bcd"), (true, "")))
    // unknown agent falls back to the * group
    val other = RobotsTxt.parse(txt, "strangerbot")
    assert(other == List((false, "/private/"), (true, "/private/ok")))
    // consecutive user-agent lines share one rule list
    assert(RobotsTxt.parse(txt, "megabot/1.0") ==
      RobotsTxt.parse(txt, "gigabot"))
    assert(RobotsTxt.parse(txt, "megabot/1.0") == List((false, "/shared/")))
  }

  test("longest match wins; Allow wins ties; empty rules allow") {
    val r = RobotsTxt.parse(txt, "graftbot")
    assert(!RobotsTxt.isAllowed(r, "/a/bx")) // /a/b (disallow) matches
    assert(RobotsTxt.isAllowed(r, "/a/bc1"))   // /a/bc (allow, len 5) beats /a/b
    assert(!RobotsTxt.isAllowed(r, "/a/bcd9")) // /a/bcd (len 6) beats /a/bc
    assert(RobotsTxt.isAllowed(r, "/elsewhere")) // no rule matches
    // equal-length tie → allow
    val tie = List((false, "/x/1"), (true, "/x/2"), (true, "/y/"),
      (false, "/y/"))
    assert(RobotsTxt.isAllowed(tie, "/y/page"),
      "equal-length Allow/Disallow must resolve to Allow")
    // the empty-path Allow never blocks anything
    assert(RobotsTxt.isAllowed(List((true, "")), "/whatever"))
  }

  test("longest agent token wins over file order; same-token groups merge") {
    // a generic 'bot' group EARLIER in the file must not shadow the
    // exact 'graftbot' group later (RFC 9309 most-specific match)
    val shadowed =
      """User-agent: bot
        |Disallow: /generic/
        |
        |User-agent: graftbot
        |Disallow: /exact/
        |""".stripMargin
    assert(RobotsTxt.parse(shadowed, "graftbot") ==
      List((false, "/exact/")))
    // an agent matching only the generic token still gets that group
    assert(RobotsTxt.parse(shadowed, "otherbot") ==
      List((false, "/generic/")))
    // two groups naming the SAME token merge their rules in file order
    val split =
      """User-agent: graftbot
        |Disallow: /one/
        |
        |User-agent: other
        |Disallow: /decoy/
        |
        |User-agent: graftbot
        |Allow: /one/ok
        |""".stripMargin
    assert(RobotsTxt.parse(split, "graftbot") ==
      List((false, "/one/"), (true, "/one/ok")))
    // split * groups merge too
    val wildSplit =
      """User-agent: *
        |Disallow: /a/
        |
        |User-agent: *
        |Disallow: /b/
        |""".stripMargin
    assert(RobotsTxt.parse(wildSplit, "anyone") ==
      List((false, "/a/"), (false, "/b/")))
  }

  test("evaluation matches the fixture arithmetic on sampled ids") {
    // domain 7: f=7, g=0 → /p/7... blocked unless id starts with 70
    val rules = RobotsTxt.parse(
      RobotsTxt.fixtureText(7L), "graftbot")
    assert(!RobotsTxt.isAllowed(rules, "/p/7"))
    assert(!RobotsTxt.isAllowed(rules, "/p/77"))
    assert(RobotsTxt.isAllowed(rules, "/p/70"))
    assert(RobotsTxt.isAllowed(rules, "/p/701"))
    assert(RobotsTxt.isAllowed(rules, "/p/87"))
    // the poisoned * group must NOT leak into the selected group
    assert(RobotsTxt.isAllowed(rules, "/p/1"))
  }
}
