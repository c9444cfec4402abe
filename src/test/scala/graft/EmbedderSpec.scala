package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Embedder

class EmbedderSpec extends AnyFunSuite {

  test("deterministic: same text same vector") {
    val a = Embedder.embed("the quick brown fox")
    val b = Embedder.embed("the quick brown fox")
    assert(a.sameElements(b))
  }

  test("unit norm for non-empty text") {
    val v = Embedder.embed("some words here for a vector")
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("empty text embeds to the zero vector") {
    assert(Embedder.embed("").forall(_ == 0f))
    assert(Embedder.embed("   ").forall(_ == 0f))
  }

  test("dimension is fixed") {
    assert(Embedder.embed("x").length == Embedder.Dim)
  }

  test("accumulator counts token multiplicity") {
    val once = Embedder.accumulate("hello")
    val twice = Embedder.accumulate("hello hello")
    assert(twice.map(math.abs).sum == 2 * once.map(math.abs).sum)
  }

  test("truncation cap applies before hashing (reference 32764-char net)") {
    val word = "tok "
    val longText = word * 20000 // 80k chars
    val capped = longText.substring(0, Embedder.MaxChars)
    assert(Embedder.accumulate(longText)
      .sameElements(Embedder.accumulate(capped)))
  }

  test("similar texts are closer than dissimilar ones") {
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = Embedder.embed("spark query engine with columnar scans")
    val near = Embedder.embed("spark query engine with columnar scans extra")
    val far = Embedder.embed("completely unrelated words about cooking pasta")
    assert(cos(base, near) > cos(base, far))
  }
}
