package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.HtmlToMarkdown

/** Property tests for the HTML normalization layer over ADVERSARIAL
  * page shapes. The round-11 tab-flattener bug (a panel double-claimed
  * through aria-controls + positional fallback double-injected its
  * label) survived four example-based unit tests because they only
  * staged one-tab-one-panel pages; these properties quantify over the
  * interaction space instead:
  *   (a) ANY tab/panel wiring — dangling aria-controls, shared
  *       targets, more tabs than panels, empty labels — injects each
  *       label AT MOST once per panel and removes every tab button;
  *   (b) script/style payloads never leak into the markdown, whatever
  *       nesting they sit in;
  *   (c) processPage's link harvest returns exactly the non-fragment,
  *       non-mailto hrefs of the page, in document order;
  *   (d) the parser never throws on malformed tag soup (unclosed /
  *       mismatched / stray-bracket input degrades, not crashes).
  * Deterministic sampling (fixed seed) so failures reproduce. */
class HtmlPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 120)(f: A => Unit): Unit = {
    var seed = Seed(1111L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); produced += 1
        case None =>
      }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced/$n")
  }

  // ── (a) tab flattening under arbitrary wiring ──────────────────────

  /** A tab group: each tab has a label (possibly empty) and an
    * aria-controls target that may name a real panel, a missing id, or
    * be absent (positional fallback); panel count is independent of
    * tab count. */
  private case class TabPage(labels: Seq[String],
      controls: Seq[Option[String]], nPanels: Int)

  private val labelGen: Gen[String] =
    Gen.oneOf(Gen.const(""), Gen.alphaStr.map(_.take(8)))
  private val tabPageGen: Gen[TabPage] = for {
    nTabs <- Gen.chooseNum(1, 5)
    nPanels <- Gen.chooseNum(1, 5)
    labels <- Gen.listOfN(nTabs, labelGen)
    controls <- Gen.listOfN(nTabs, Gen.oneOf(
      Gen.const(None: Option[String]),
      Gen.chooseNum(0, math.max(0, nPanels - 1))
        .map(i => Some(s"p$i"): Option[String]),
      Gen.const(Some("missing-id"): Option[String])))
  } yield TabPage(labels.toSeq, controls.toSeq, nPanels)

  private def renderTabPage(tp: TabPage): String = {
    val tabs = tp.labels.zip(tp.controls).map { case (l, c) =>
      val ac = c.map(id => s""" aria-controls="$id"""").getOrElse("")
      s"""<button role="tab"$ac>$l</button>"""
    }.mkString
    val panels = (0 until tp.nPanels).map { i =>
      s"""<div role="tabpanel" id="p$i"><p>body$i</p></div>"""
    }.mkString
    s"""<div role="tablist">$tabs</div>$panels"""
  }

  test("tabs: each panel gains at most one label; all buttons removed") {
    forAll(tabPageGen) { tp =>
      val md = HtmlToMarkdown.convert(renderTabPage(tp))
      // each panel body appears exactly once, with at most one
      // injected **Label:** immediately before it
      (0 until tp.nPanels).foreach { i =>
        val occurrences = s"body$i".r.findAllIn(md).length
        assert(occurrences == 1, s"panel $i duplicated/lost:\n$md\n$tp")
      }
      // PER-PANEL injection count: paragraphs rendered as **X:** are
      // the injected labels. A global `injected <= nPanels` bound
      // would miss the 2-tab/2-panel double-claim regression (2 labels
      // into ONE panel still satisfies 2 <= 2), so assert per panel:
      // in the segment between the previous panel body and this one,
      // at most ONE injected label may appear
      val labelPat = "\\*\\*[^*\n]*:\\*\\*".r
      val bodyAt = (0 until tp.nPanels).map(i => md.indexOf(s"body$i"))
      (0 until tp.nPanels).foreach { i =>
        val start =
          if (i == 0) 0 else bodyAt(i - 1) + s"body${i - 1}".length
        val seg = md.substring(start, bodyAt(i))
        val n = labelPat.findAllIn(seg).length
        assert(n <= 1,
          s"panel $i carries $n injected labels (double-claim):\n$md\n$tp")
      }
      val injected = labelPat.findAllIn(md).length
      assert(injected <= tp.nPanels,
        s"more labels than panels ($injected > ${tp.nPanels}):\n$md\n$tp")
      // tab buttons must be gone — a surviving label would render as
      // bare text between the tablist and the first panel
      assert(!md.contains("tablist"), md)
    }
  }

  // ── (b) script/style payloads never leak ───────────────────────────

  private val junkPayload = "SECRET_PAYLOAD_XYZ(){var a=1;}"
  private val wrapperGen: Gen[String] = for {
    tag <- Gen.oneOf("script", "style", "noscript", "template")
    depth <- Gen.chooseNum(0, 3)
  } yield {
    val inner = s"<$tag>$junkPayload</$tag>"
    (0 until depth).foldLeft(inner) { (html, i) =>
      s"<div><p>text$i</p>$html</div>"
    }
  }

  test("script/style subtrees are dropped at any nesting depth") {
    forAll(wrapperGen, n = 60) { html =>
      val md = HtmlToMarkdown.convert(html)
      assert(!md.contains("SECRET_PAYLOAD"), s"leaked:\n$html\n$md")
    }
  }

  // ── (c) link harvest = exactly the eligible hrefs ──────────────────

  private val hrefGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0, 99).map(i => s"/page$i"),
    Gen.chooseNum(0, 99).map(i => s"https://x.io/d$i"),
    Gen.const("#frag"),
    Gen.const("mailto:a@b"),
    Gen.const(""))
  private val linksPageGen: Gen[Seq[String]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, hrefGen)).map(_.toSeq)

  test("processPage harvests exactly the non-fragment non-mailto hrefs") {
    forAll(linksPageGen, n = 80) { hrefs =>
      val anchors = hrefs.zipWithIndex.map { case (h, i) =>
        s"""<a href="$h">t$i</a>"""
      }.mkString
      val html = s"<html><body><nav>$anchors</nav>" +
        "<article><p>body</p></article></body></html>"
      val (_, links) = HtmlToMarkdown.processPage(html)
      val expected = hrefs.filter(h =>
        h.nonEmpty && !h.startsWith("#") && !h.startsWith("mailto:"))
      assert(links == expected, s"hrefs=$hrefs got=$links")
    }
  }

  // ── (d) malformed tag soup degrades without throwing ───────────────

  private val soupChar: Gen[Char] = Gen.oneOf(
    "<>/ab=\"'p&; \n".toSeq)
  private val soupGen: Gen[String] = Gen.chooseNum(1, 80)
    .flatMap(n => Gen.listOfN(n, soupChar)).map(_.mkString)

  test("tag soup never throws (parse degrades to text)") {
    forAll(soupGen, n = 150) { soup =>
      val md = HtmlToMarkdown.convert(s"<div><p>a</p>$soup<p>b</p></div>")
      assert(md != null)
      val (md2, links) = HtmlToMarkdown.processPage(soup)
      assert(md2 != null && links != null)
    }
  }
}
