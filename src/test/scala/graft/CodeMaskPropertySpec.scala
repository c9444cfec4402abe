package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.CodeParsers

/** Property tests for the lexical mask over ADVERSARIAL payloads: an
  * arbitrary soup of braces, quotes, hashes, and keywords is embedded
  * inside each multi-line string construct, and the construct must (a)
  * mask the whole payload (no live char between the delimiters), (b)
  * keep the code before/after live, and (c) never change the statement
  * count of the surrounding program. Deterministic sampling (fixed
  * seed) so failures reproduce. */
class CodeMaskPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(4242L)
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

  /** Payload soup: the characters most likely to derail a lexer. Never
    * contains a construct terminator — callers guarantee that by
    * filtering per construct. */
  private val soupChar: Gen[Char] = Gen.oneOf(
    "{}()[]#\"' end def if } { ] [ : \\ / * $ a b \n".toSeq)
  private val soup: Gen[String] = Gen.chooseNum(1, 60)
    .flatMap(n => Gen.listOfN(n, soupChar)).map(_.mkString)

  private def spans(lang: String, code: String): Seq[(Int, Int)] =
    CodeParsers.parse(lang, code).get.children.map(c => (c.start, c.end))

  test("python triple-quoted strings absorb any payload") {
    forAll(soup.map(_.replace("'''", "' '").replace("\\", "/"))) { payload =>
      val code = s"x = '''$payload'''\ny = 2\n"
      val got = spans("python", code)
      assert(got.length == 2, s"payload leaked statements: $got\n$code")
      assert(code.substring(got(1)._1, got(1)._2) == "y = 2",
        s"trailing statement corrupted: $got")
    }
  }

  test("JS template literals absorb any payload without interpolation markers") {
    forAll(soup.map(_.replace("`", " ").replace("${", "$ {")
      .replace("\\", "/"))) { payload =>
      val code = s"const x = `$payload`;\nlet y = 2;\n"
      val got = spans("typescript", code)
      assert(got.length == 2, s"payload leaked statements: $got\n$code")
      assert(code.substring(got(1)._1, got(1)._2) == "let y = 2;",
        s"trailing statement corrupted: $got")
    }
  }

  test("ruby heredoc bodies absorb any payload") {
    forAll(soup.map(_.replace("EOF", "exx"))) { payload =>
      // payload lines must not equal the terminator; lowercase guard above
      val code = s"x = <<~EOF\n$payload\nEOF\ny = 2\n"
      val got = spans("ruby", code)
      assert(got.length == 2, s"payload leaked statements: $got\n$code")
      assert(code.substring(got(1)._1, got(1)._2) == "y = 2",
        s"trailing statement corrupted: $got")
    }
  }

  test("shift-heavy ruby file stays linear (terminator index, not rescans)") {
    // 20k lines of uppercase shift/append operands, none terminated:
    // the superseded per-candidate linear scan made this quadratic
    // (~20k x 10k lines of lookahead); the lazily-built full-line
    // index must keep it effectively instant. Generous 10s bound —
    // the quadratic form took minutes, so flakiness margin is wide.
    val code = (1 to 20000)
      .map(i => s"x$i = y$i <<WIDTH$i | z <<SHIFT_CONST$i")
      .mkString("", "\n", "\nstop\n")
    val t0 = System.nanoTime()
    val phantom = spans("ruby", code)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 10.0, f"parse took $elapsed%.1f s — quadratic again?")
    // none of the 40k phantom openers opened: every line is a live
    // statement (a phantom heredoc would swallow the remainder)
    assert(phantom.length == 20001, s"got ${phantom.length} spans")
    // and a real heredoc among 20k phantoms still masks exactly its body
    val withReal = code + "body = <<REALDOC\npayload line\nREALDOC\nafter = 1\n"
    val real = spans("ruby", withReal)
    assert(real.length == 20003, s"got ${real.length} spans")
    val bodySpan = real(20001)
    assert(withReal.substring(bodySpan._1, bodySpan._2).endsWith("REALDOC"),
      "real heredoc must span through its terminator line")
  }

  test("single-line strings with brackets never shift brace statements") {
    forAll(soup.map(_.replace("\n", " ").replace("\"", "'")
      .replace("\\", "/").replace("*", "x").replace("/", "x"))) { payload =>
      val code = s"""const a = "$payload";\nfunction f() {\n  return 1;\n}\n"""
      val got = spans("typescript", code)
      assert(got.length == 2, s"string payload leaked: $got\n$code")
      assert(code.substring(got(1)._1, got(1)._2).startsWith("function f()"),
        s"function statement corrupted: $got")
    }
  }

  test("C++ raw strings absorb any payload") {
    forAll(soup.map(_.replace(")xq\"", ") xq"))) { payload =>
      val code = s"""const char* a = R"xq($payload)xq";\nint y = 2;\n"""
      val got = spans("cpp", code)
      assert(got.length == 2, s"raw-string payload leaked: $got\n$code")
      assert(code.substring(got(1)._1, got(1)._2) == "int y = 2;",
        s"trailing statement corrupted: $got")
    }
  }

  test("C# verbatim strings absorb any payload (doubled-quote escape)") {
    // a lone `"` closes the verbatim string; `""` is the escape — so
    // double every quote in the payload to keep it interior
    forAll(soup.map(_.replace("\"", "\"\""))) { payload =>
      val code = s"""var a = @"$payload";\nvar y = 2;\n"""
      val got = spans("csharp", code)
      assert(got.length == 2, s"verbatim payload leaked: $got\n$code")
      assert(code.substring(got(1)._1, got(1)._2) == "var y = 2;",
        s"trailing statement corrupted: $got")
    }
  }

  test("Swift extended raw strings absorb any payload") {
    forAll(soup.map(_.replace("\"#", "\" #").replace("\n", " "))) { payload =>
      val code = s"""let a = #"$payload"#\nlet y = 2\n"""
      val got = spans("swift", code)
      assert(got.length == 2, s"swift raw payload leaked: $got\n$code")
      assert(code.substring(got(1)._1, got(1)._2) == "let y = 2",
        s"trailing statement corrupted: $got")
    }
  }

  test("PHP heredoc bodies absorb any payload; closer tail stays live") {
    forAll(soup.map(_.replace("EOT", "ext"))) { payload =>
      // the closer line continues with live code — its paren must
      // still balance the opener's
      val code = s"$$x = strtoupper(<<<EOT\n$payload\nEOT);\n$$y = 2;\n"
      val got = spans("php", code)
      assert(got.length == 2, s"heredoc payload leaked: $got\n$code")
      assert(code.substring(got(1)._1, got(1)._2) == "$y = 2;",
        s"trailing statement corrupted: $got")
    }
  }

  test("C++ digit separators never open phantom char literals") {
    val code = "int big = 1'000'000;\nint odd = 0xFF'F0;\n" +
      "struct P {\n  int x;\n};\nint tail = 2;\n"
    val got = spans("cpp", code)
    assert(got.length == 4, s"digit separator derailed the lexer: $got")
    assert(code.substring(got(3)._1, got(3)._2) == "int tail = 2;")
  }
}
