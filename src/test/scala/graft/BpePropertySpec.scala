package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.BpeTokenizer

/** Property tests for the BPE tokenizer over random corpora:
  * lossless roundtrip, encoding determinism, monotone compression,
  * word-border isolation, and sentinel integrity. Deterministic
  * sampling (fixed seed) so failures reproduce. */
class BpePropertySpec extends AnyFunSuite {

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

  // small alphabet → high pair frequency → merges actually fire
  private val word = Gen.chooseNum(1, 10)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))
    .map(_.mkString)
  private val text = Gen.chooseNum(1, 40)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, text))

  test("roundtrip: decode(encode(text)) == text for any corpus and merges") {
    forAll(corpus) { docs =>
      val merges = BpeTokenizer.train(docs, 40)
      docs.foreach { t =>
        assert(BpeTokenizer.decode(BpeTokenizer.encode(t, merges)) == t)
      }
      // and for text the tokenizer never saw
      val unseen = "dcba abcd ddd"
      assert(BpeTokenizer.decode(
        BpeTokenizer.encode(unseen, merges)) == unseen)
    }
  }

  test("encoding is a pure function: same input, same tokens") {
    forAll(corpus) { docs =>
      val merges = BpeTokenizer.train(docs, 30)
      docs.foreach { t =>
        assert(BpeTokenizer.encode(t, merges) ==
          BpeTokenizer.encode(t, merges))
      }
    }
  }

  test("more merges never increase any document's token count") {
    forAll(corpus) { docs =>
      val few = BpeTokenizer.train(docs, 5)
      val many = BpeTokenizer.train(docs, 40)
      // prefix property: a longer training run starts with the same merges
      assert(many.take(few.length) == few)
      docs.foreach { t =>
        assert(BpeTokenizer.encode(t, many).length <=
          BpeTokenizer.encode(t, few).length)
      }
    }
  }

  test("every token count is bounded by chars+words (sentinel per word)") {
    forAll(corpus) { docs =>
      val merges = BpeTokenizer.train(docs, 20)
      docs.foreach { t =>
        val words = t.split(" ").count(_.nonEmpty)
        val chars = t.replace(" ", "").length
        val n = BpeTokenizer.encode(t, merges).length
        assert(n >= words, "at least one token per word")
        assert(n <= chars + words, "never more symbols than chars+sentinels")
      }
    }
  }

  test("learned merges never span the end-of-word sentinel's right side") {
    // nothing may follow Eow inside a word, so no merge can have Eow as
    // its LEFT half (Eow is always terminal in any symbol sequence)
    forAll(corpus) { docs =>
      BpeTokenizer.train(docs, 40).foreach { case (a, _) =>
        assert(!a.endsWith(BpeTokenizer.Eow),
          s"merge left side '$a' contains terminal sentinel")
      }
    }
  }
}
