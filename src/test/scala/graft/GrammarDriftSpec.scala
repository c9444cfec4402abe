package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Quantifies the span parser's boundary drift against real-world
  * TypeScript — the reference repo's own non-test sources (PUBLIC
  * content, read-only). Real tree-sitter grammars are an offline-build
  * constraint, so "how close are the span boundaries?" was a declared
  * residual risk with no number attached. This spec attaches the
  * number.
  *
  * Metric: every live (unmasked) column-0 line beginning with a
  * top-level declaration starter keyword is a boundary tree-sitter
  * would cut at. Drift = the fraction of those expected boundaries
  * that do NOT begin a top-level span — a misparse (runaway template
  * literal, regex mislex, unbalanced mask) swallows the following
  * declarations into one span and drops their boundaries, which this
  * metric counts directly. Span integrity (ascending, non-overlapping,
  * in-range) is asserted alongside. */
class GrammarDriftSpec extends AnyFunSuite {

  private val starters = Set("import", "export", "const", "let", "var",
    "function", "async", "class", "interface", "type", "enum",
    "namespace", "declare", "abstract")

  private def tsFiles(root: java.io.File): Seq[java.io.File] = {
    val kids = Option(root.listFiles()).toSeq.flatten
    kids.flatMap {
      case d if d.isDirectory && d.getName != "node_modules" => tsFiles(d)
      case f if f.getName.endsWith(".ts") && !f.getName.endsWith(".d.ts") =>
        Seq(f)
      case _ => Nil
    }
  }

  test("span-boundary drift over the reference's TypeScript sources") {
    val files = tsFiles(new java.io.File("/root/reference"))
    assert(files.size >= 30, s"reference corpus missing? found ${files.size}")
    var expected = 0L
    var matched = 0L
    var parsed = 0
    val worst = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    files.foreach { f =>
      val src = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val tree = CodeParsers.parse("typescript", src)
      assert(tree.isDefined, s"parse failed on ${f.getPath}")
      parsed += 1
      val spans = tree.get.children.map(c => (c.start, c.end))
      // integrity: ascending, non-overlapping, inside the file
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(e1 <= s2, s"overlapping spans in ${f.getPath}")
        case _ =>
      }
      spans.foreach { case (s0, e0) =>
        assert(s0 >= 0 && e0 <= src.length && s0 <= e0,
          s"span out of range in ${f.getPath}")
      }
      val mask = CodeParsers.codeMask(src, python = false)
      // effective span starts: first non-whitespace char of each span
      val spanStarts = spans.map { case (s0, e0) =>
        var i = s0
        while (i < e0 && src.charAt(i).isWhitespace) i += 1
        i
      }.toSet
      // expected boundaries: live column-0 starter-keyword lines
      var lineStart = 0
      var fExp = 0
      var fMatch = 0
      val missed = scala.collection.mutable.ArrayBuffer.empty[String]
      while (lineStart < src.length) {
        var lineEnd = src.indexOf('\n', lineStart)
        if (lineEnd < 0) lineEnd = src.length
        val c = src.charAt(math.min(lineStart, src.length - 1))
        if (lineStart < lineEnd && !c.isWhitespace && mask(lineStart)) {
          var e = lineStart
          while (e < lineEnd && (src.charAt(e).isLetter)) e += 1
          val word = src.substring(lineStart, e)
          if (starters.contains(word) &&
              (e >= lineEnd || !src.charAt(e).isLetterOrDigit)) {
            fExp += 1
            if (spanStarts.contains(lineStart)) fMatch += 1
            else missed +=
              src.substring(lineStart, math.min(lineEnd, lineStart + 90))
          }
        }
        lineStart = lineEnd + 1
      }
      expected += fExp
      matched += fMatch
      if (fExp > fMatch) {
        worst += ((f.getName, fExp, fMatch))
        missed.take(3).foreach(l => info(s"  MISSED ${f.getName}: $l"))
      }
    }
    val drift = 1.0 - matched.toDouble / expected
    info(f"parsed $parsed files; expected boundaries=$expected " +
      f"matched=$matched drift=${drift * 100}%.2f%%")
    worst.sortBy(w => w._3 - w._2).take(8).foreach { case (n, e, m) =>
      info(f"  $n: $m/$e boundaries matched")
    }
    assert(expected > 400, s"metric degenerate: only $expected boundaries")
    // measured 2026-08-13: 485/485 boundaries, drift 0.00%. The gauge
    // initially read 0.41% — both misses were regex literals with
    // unbalanced brackets/braces (/\[\d{4}-/ and /\$\{([^}]+)\}/g)
    // corrupting bracket depth for tens of KB; codeMask now masks JS
    // regex literals. The gate allows <1% so corpus-side noise can't
    // flake the build while still catching any real lexer regression.
    assert(drift < 0.01, f"boundary drift ${drift * 100}%.2f%% exceeds 1%%")
  }
}
