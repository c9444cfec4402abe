package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Chunker
import graft.functions.TextUtil

/** Property tests for the chunker invariants (SURVEY.md §5d): no content
  * loss, index density, total consistency, id integrity — over random
  * markdown-shaped documents. Deterministic sampling (fixed seed) so
  * failures reproduce. */
class ChunkerPropertySpec extends AnyFunSuite {

  /** Pull n deterministic samples from a generator and assert on each. */
  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
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

  private val word = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
  private val sentence = Gen.chooseNum(3, 12)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" ") + ".")
  private val section: Gen[String] = for {
    level <- Gen.chooseNum(1, 4)
    title <- Gen.listOfN(2, word).map(_.mkString(" "))
    n <- Gen.chooseNum(1, 30)
    body <- Gen.listOfN(n, sentence)
  } yield ("#" * level) + " " + title + "\n\n" + body.mkString(" ")
  private val markdownDoc: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, section))
      .map(_.mkString("\n\n"))

  test("chunk_index is dense 0..n-1 and total_chunks equals n") {
    forAll(markdownDoc) { md =>
      val chunks = Chunker.chunkMarkdown(md, "p", "1", "doc://x")
      assert(chunks.map(_.chunk_index) == chunks.indices)
      assert(chunks.forall(_.total_chunks == chunks.length))
    }
  }

  test("chunk ids always hash their own content") {
    forAll(markdownDoc) { md =>
      Chunker.chunkMarkdown(md, "p", "1", "doc://x").foreach { c =>
        assert(c.chunk_id == TextUtil.sha256Hex(c.content))
        assert(c.content.length <= Chunker.MaxChars +
          "[Topic: ]\n".length + 128) // prefix allowance
      }
    }
  }

  test("no content loss: every body sentence survives in some chunk") {
    forAll(markdownDoc) { md =>
      val chunks = Chunker.chunkMarkdown(md, "p", "1", "doc://x")
      val joined = chunks.map(_.content).mkString("\n")
      // every non-heading line of the source must appear (chunks overlap,
      // so containment — not equality — is the invariant); long lines may
      // be split by the overlap splitter, so sample a prefix
      md.split("\n").filterNot(l => l.startsWith("#") || l.isBlank)
        .foreach { line =>
          val probe = line.take(60)
          assert(joined.contains(probe) ||
            probe.length > 40 && joined.contains(probe.take(30)),
            s"lost line: $probe")
        }
    }
  }

  test("token chunker is lossless and respects the window size") {
    forAll(Gen.asciiPrintableStr) { text =>
      val pieces = Chunker.tokenChunk(text, 64)
      assert(pieces.mkString == text)
      assert(pieces.dropRight(1).forall(_.length == 64) ||
        text.exists(Character.isHighSurrogate)) // surrogate nudges allowed
    }
  }

  test("grammar parsers: valid span trees and no content loss (all families)") {
    import graft.operators.CodeParsers
    import graft.operators.Chunker.CodeTree

    def validTree(t: CodeTree, lo: Int, hi: Int): Unit = {
      assert(t.start >= lo && t.end <= hi && t.start <= t.end,
        s"span out of bounds: ${t.start}..${t.end} in $lo..$hi")
      t.children.foreach(c => validTree(c, t.start, t.end))
      // children are ordered and non-overlapping
      t.children.sliding(2).foreach {
        case Seq(a, b) => assert(a.end <= b.start, s"overlap $a $b")
        case _ => ()
      }
    }
    def noWs(s: String): String = s.replaceAll("\\s+", "")

    val braceGen: Gen[String] = Gen.chooseNum(1, 8).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(1, 99)
        b <- Gen.chooseNum(1, 4)
      } yield s"function f$k() {\n" +
        (1 to b).map(i => s"  const v$i = $i + $k;").mkString("\n") +
        s"\n  return v1;\n}")
    }.map(_.mkString("\n\n"))

    val pyGen: Gen[String] = Gen.chooseNum(1, 8).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(1, 99)
        b <- Gen.chooseNum(1, 4)
      } yield s"def f$k(x):\n" +
        (1 to b).map(i => s"    y$i = x + $i").mkString("\n") +
        "\n    return y1")
    }.map(_.mkString("\n\n"))

    val rbGen: Gen[String] = Gen.chooseNum(1, 8).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(1, 99)
        b <- Gen.chooseNum(1, 4)
      } yield s"def f$k(x)\n" +
        (1 to b).map(i => s"  y$i = x + $i").mkString("\n") +
        "\n  y1\nend")
    }.map(_.mkString("\n\n"))

    for ((lang, gen) <- Seq(("typescript", braceGen), ("python", pyGen),
      ("ruby", rbGen))) {
      forAll(gen, n = 40) { code =>
        val tree = CodeParsers.parse(lang, code).get
        validTree(tree, 0, code.length)
        for (size <- Seq(20, 60, 200, 5000)) {
          val joined = Chunker.chunkTreeTexts(code, tree, size).mkString("\n")
          assert(noWs(joined) == noWs(code),
            s"$lang/$size lost content:\n$code\n----\n$joined")
        }
      }
    }
  }

  test("grammar parsers survive arbitrary input without crashing") {
    import graft.operators.CodeParsers
    forAll(Gen.asciiPrintableStr, n = 150) { junk =>
      for (lang <- Seq("typescript", "python", "ruby", "go", "json")) {
        val tree = CodeParsers.parse(lang, junk)
        assert(tree.isDefined)
        // descent over the junk tree still terminates and emits
        Chunker.chunkTreeTexts(junk, tree.get, 32)
      }
    }
  }

  test("code chunker preserves every source line across pieces") {
    val codeGen: Gen[String] = Gen.chooseNum(1, 12).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(1, 8).map { k =>
        s"function f$k() {\n  return $k;\n}"
      })
    }.map(_.mkString("\n\n"))
    forAll(codeGen) { code =>
      val joined = Chunker.codeChunkTexts(code, 512).mkString("\n")
      code.split("\n").filterNot(_.isBlank).foreach { line =>
        assert(joined.contains(line.trim), s"lost: $line")
      }
    }
  }
}
