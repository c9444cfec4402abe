package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BpeTokenizer

/** Semantics of the BPE trainer/encoder: greedy merge order, tie
  * determinism, roundtrip decode, word-border isolation. */
class BpeTokenizerSpec extends AnyFunSuite {

  test("training learns the most frequent pair first") {
    // 'aa' dominates: every word contains the pair twice
    val merges = BpeTokenizer.train(Seq("aaaa aaaa aaab"), 1)
    assert(merges == Vector(("a", "a")))
  }

  test("merge ranks apply in training order during encoding") {
    val merges = BpeTokenizer.train(Seq("abab abab abab ab"), 3)
    // first merge must be (a,b) — the most frequent pair
    assert(merges.head == ("a", "b"))
    val toks = BpeTokenizer.encode("abab", merges)
    // with enough merges the whole word + sentinel collapses
    assert(toks.mkString("") == "abab" + BpeTokenizer.Eow)
  }

  test("ties break lexicographically (deterministic across runs)") {
    // 'ab' and 'cd' both appear exactly once; (a,b) < (c,d)
    val m1 = BpeTokenizer.train(Seq("ab cd"), 1)
    val m2 = BpeTokenizer.train(Seq("ab cd"), 1)
    assert(m1 == m2)
    assert(m1.head == ("a", BpeTokenizer.Eow) ||
      m1.head._1 <= "c") // lexicographically first among max-count pairs
  }

  test("encode/decode roundtrip preserves text") {
    val corpus = Seq("the quick brown fox", "the lazy dog", "the the the")
    val merges = BpeTokenizer.train(corpus, 50)
    corpus.foreach { text =>
      val toks = BpeTokenizer.encode(text, merges)
      assert(BpeTokenizer.decode(toks) == text, s"roundtrip broke: $text")
    }
    // unseen words still encode (char fallback) and roundtrip
    assert(BpeTokenizer.decode(
      BpeTokenizer.encode("zebra unseen", merges)) == "zebra unseen")
  }

  test("merges never cross word borders") {
    // 'xy' only ever appears split across two words — must not merge
    val merges = BpeTokenizer.train(Seq("ax yb ax yb ax yb"), 10)
    assert(!merges.contains(("x", "y")))
  }

  test("more merges never increase the token count") {
    val corpus = Seq("spark scale spark scale spark")
    val few = BpeTokenizer.train(corpus, 2)
    val many = BpeTokenizer.train(corpus, 30)
    val text = "spark scale"
    assert(BpeTokenizer.encode(text, many).length <=
      BpeTokenizer.encode(text, few).length)
  }
}
