package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.{DocExtract, DocFixture, DocumentConverters}

/** Property tests for the legacy .doc byte-walk over arbitrary word
  * payloads: CFB container + FIB + piece table (CP1252 + UTF-16
  * pieces), the single-piece shape, the pre-Clx fcMin/fcMac legacy
  * route, and the fEncrypted gate must round-trip ANY printable-ASCII
  * content — the example-based specs pin one corpus shape, these
  * quantify over word counts and characters (including backslash,
  * quotes, brackets). Deterministic sampling (fixed seed) so failures
  * reproduce. */
class DocPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = Seed(7777L)
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

  private val wordGen: Gen[String] = Gen.nonEmptyListOf(
    Gen.choose(33, 126).map(_.toChar)).map(_.mkString.take(10))

  private val wordsGen: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, wordGen))

  test("property: two-piece piece-table docs round-trip any words") {
    val gen = for { a <- wordsGen; b <- wordsGen } yield (a, b)
    forAll(gen) { case (a, b) =>
      val bytes = DocFixture.pieceTableDoc(a, b)
      val md = DocExtract.docToMarkdown("p.doc", bytes).get
      assert(md == s"# p\n\n${a.mkString(" ")}\n${b.mkString(" ")}",
        s"a=$a b=$b")
    }
  }

  test("property: single-piece and legacy docs round-trip any words") {
    forAll(wordsGen) { ws =>
      val one = DocFixture.pieceTableDoc(ws, Seq.empty)
      assert(DocExtract.docToMarkdown("s.doc", one).get ==
        s"# s\n\n${ws.mkString(" ")}", s"single ws=$ws")
      val legacy = DocFixture.legacyDoc(ws)
      assert(DocExtract.docToMarkdown("l.doc", legacy).get ==
        s"# l\n\n${ws.mkString(" ")}", s"legacy ws=$ws")
    }
  }

  test("property: the fEncrypted flag always gates to the stub") {
    val gen = for { a <- wordsGen; b <- wordsGen } yield (a, b)
    forAll(gen, n = 30) { case (a, b) =>
      val bytes = DocFixture.pieceTableDoc(a, b, encrypted = true)
      assert(DocExtract.docToMarkdown("e.doc", bytes).isEmpty)
      val md = DocumentConverters.convertFileToMarkdown("e.doc", bytes).get
      assert(md.contains("[stub-extracted document text"))
      // the piece table is still in the container: no plaintext leaks
      (a ++ b).filter(_.length >= 4)
        .foreach(w => assert(!md.contains(w), s"leaked $w"))
    }
  }

  test("property: corrupting the container never throws") {
    val gen = for {
      a <- wordsGen
      pos <- Gen.choose(0, 100000)
      bit <- Gen.choose(0, 7)
    } yield (a, pos, bit)
    forAll(gen, n = 80) { case (a, pos, bit) =>
      val bytes = DocFixture.pieceTableDoc(a, a)
      val i = pos % bytes.length
      bytes(i) = (bytes(i) ^ (1 << bit)).toByte
      // decodes, degrades, or bails — never throws
      DocExtract.docToMarkdown("c.doc", bytes)
    }
  }
}
