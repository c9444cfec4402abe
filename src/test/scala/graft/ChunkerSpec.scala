package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextUtil
import graft.operators.Chunker

/** Golden tests ported from the reference's chunker contract
  * (reference: tests/content-processor.test.ts:143-254, 2292-2423). */
class ChunkerSpec extends AnyFunSuite {

  private def md(s: String) =
    Chunker.chunkMarkdown(s, "TestProduct", "1.0", "https://example.com/page")

  test("sha256 matches the standard vector") {
    assert(TextUtil.sha256Hex("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(TextUtil.sha256Hex("") ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("creates chunks from markdown content") {
    val chunks = md("# Introduction\n\n" + "This is a test paragraph. " * 50)
    assert(chunks.nonEmpty)
  }

  test("injects breadcrumb context prefix") {
    val chunks = md("# Section A\n\n## Subsection B\n\n" + "Content here. " * 50)
    assert(chunks.exists(_.content.contains("[Topic:")))
  }

  test("assigns correct metadata") {
    val chunks = md("# Title\n\n" + "Paragraph content. " * 30)
    val c = chunks.head
    assert(c.product_name == "TestProduct")
    assert(c.version == "1.0")
    assert(c.url == "https://example.com/page")
    assert(c.chunk_index == 0)
    assert(c.total_chunks == chunks.length)
    assert(c.chunk_id == TextUtil.sha256Hex(c.content))
    assert(c.hash == c.chunk_id)
  }

  test("deterministic chunk ids") {
    val m = "# Title\n\nContent here. " * 20
    assert(md(m).map(_.chunk_id) == md(m).map(_.chunk_id))
  }

  test("empty markdown produces no chunks") {
    assert(md("").isEmpty)
    assert(md("   \n  \n").isEmpty)
  }

  test("tracks heading hierarchy") {
    val chunks = md("# Main\n\n## Sub\n\n### Deep\n\n" + "Content goes here. " * 50)
    assert(chunks.exists(_.heading_hierarchy.nonEmpty))
    val c = chunks.find(_.heading_hierarchy.nonEmpty).get
    assert(c.heading_hierarchy == Seq("Main", "Sub", "Deep"))
    assert(c.content.startsWith("[Topic: Main > Sub > Deep]\n"))
  }

  test("merges small sections (semantic merging)") {
    val chunks = md("# Section A\n\nShort.\n\n# Section B\n\nAlso short.")
    assert(chunks.length == 1)
    assert(chunks.head.content.contains("Short."))
    assert(chunks.head.content.contains("Also short."))
  }

  test("splits large sections with overlap") {
    val big = "# Big Section\n\n" +
      "This is a long sentence that will repeat many times to exceed the max token limit. " * 200
    val chunks = md(big)
    assert(chunks.length > 1)
    // stride = 3600, slices of 4000 ⇒ 400-char overlap between neighbors
    val a = chunks(0).content
    val b = chunks(1).content
    val tail = a.substring(a.length - 100)
    assert(b.contains(tail.substring(0, 50)) || b.contains(tail.takeRight(50)))
  }

  test("total_chunks set on all chunks") {
    val chunks = md("# Section 1\n\n" + "Content for section one. " * 100 +
      "\n\n# Section 2\n\n" + "Content for section two. " * 100)
    assert(chunks.forall(_.total_chunks == chunks.length))
  }

  test("cleans anchor links from headings") {
    val chunks = md("# Title [](#anchor-id)\n\n" + "Some content here. " * 50)
    chunks.foreach(c =>
      c.heading_hierarchy.foreach(h => assert(!h.contains("[](#anchor-id)"))))
    assert(chunks.head.heading_hierarchy == Seq("Title"))
  }

  test("sequential chunk_index values") {
    val chunks = md("# Part 1\n\n" + "Content one. " * 100 +
      "\n\n# Part 2\n\n" + "Content two. " * 100 +
      "\n\n# Part 3\n\n" + "Content three. " * 100)
    chunks.zipWithIndex.foreach { case (c, i) => assert(c.chunk_index == i) }
  }

  test("default section is Introduction when no heading") {
    val chunks = md("Just some text without any headings. " * 50)
    assert(chunks.head.section == "Introduction")
    assert(!chunks.head.content.contains("[Topic:"))
  }

  test("overlapping content between consecutive chunks of large sections") {
    val chunks = md("# Big Section\n\n" +
      "This is sentence number one for testing overlap. " * 300)
    assert(chunks.length > 1)
    for (i <- 0 until chunks.length - 1) {
      val cur = chunks(i).content
      val next = chunks(i + 1).content
      val overlapWords = cur.split("\\s+").takeRight(20)
      assert(overlapWords.exists(w => w.length > 5 && next.contains(w)))
    }
  }

  test("never emits a lone surrogate when splitting emoji-heavy content") {
    val chunks = md("# Emoji Section\n\n" +
      "padding 😀 text 🎉 more 👍 words " * 600)
    assert(chunks.length > 1)
    chunks.foreach { c =>
      var i = 0
      val s = c.content
      while (i < s.length) {
        val ch = s.charAt(i)
        if (Character.isHighSurrogate(ch)) {
          assert(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)),
            s"lone high surrogate at $i")
          i += 2
        } else { assert(!Character.isLowSurrogate(ch), s"lone low surrogate at $i"); i += 1 }
      }
    }
  }

  test("strips a lone surrogate arriving in source content") {
    val chunks =
      md("# Broken\n\nThis body has a stray half-emoji \ud83d in the middle.")
    assert(chunks.nonEmpty)
    assert(chunks.head.content.contains("stray half-emoji"))
    assert(!chunks.head.content.exists(Character.isHighSurrogate))
  }

  test("safety valve flushes heading-less content periodically") {
    val chunks = md("word " * 2000)
    assert(chunks.length > 1)
  }

  test("sibling H3 merge uses parent H2 topic") {
    val chunks = md("# Main Title\n\n## Parent Section\n\n" +
      "### Child A\n\nShort content A.\n\n" +
      "### Child B\n\nShort content B.\n\n" +
      "### Child C\n\nShort content C.")
    val childChunks = chunks.filter(c => c.content.contains("Child A") ||
      c.content.contains("Child B") || c.content.contains("Child C"))
    assert(childChunks.nonEmpty)
    childChunks.foreach(c =>
      assert(c.heading_hierarchy.mkString(" > ").contains("Parent Section")))
    // merged siblings: topic truncated above the H3 level
    val merged = chunks.find(c =>
      c.content.contains("Child A") && c.content.contains("Child B"))
    merged.foreach(c =>
      assert(c.heading_hierarchy == Seq("Main Title", "Parent Section")))
  }

  test("level jump leaves no phantom hierarchy entries") {
    val chunks = md("# Top\n\n### Deep Jump\n\n" + "Body text. " * 80)
    val c = chunks.head
    assert(c.heading_hierarchy == Seq("Top", "Deep Jump"))
    assert(c.section == "Deep Jump")
  }

  // ── chunkCode ───────────────────────────────────────────────────────
  private def code(text: String, path: String) =
    Chunker.chunkCode(text, "TestProduct", "1.0",
      s"file:///$path", path)

  test("code chunks get [File:] prefix and url-scoped ids") {
    val chunks = code("def f():\n    return 1\n", "src/a.py")
    assert(chunks.nonEmpty)
    assert(chunks.head.content.startsWith("[File: src/a.py]\n"))
    assert(chunks.head.chunk_id ==
      TextUtil.sha256Hex(s"file:///src/a.py::${chunks.head.content}"))
    assert(chunks.head.section == "src/a.py")
    assert(chunks.head.heading_hierarchy == Seq("src/a.py"))
  }

  test("identical snippets in different files get different ids") {
    val a = code("x = 1\n", "a.py")
    val b = code("x = 1\n", "b.py")
    assert(a.head.chunk_id != b.head.chunk_id)
  }

  test("md files inside a code source route through the markdown chunker") {
    val chunks = code("# Readme\n\nSome docs here.", "docs/readme.md")
    assert(chunks.length == 1)
    assert(chunks.head.content.startsWith("[File: docs/readme.md]\n"))
    assert(chunks.head.content.contains("[Topic: Readme]"))
    assert(chunks.head.heading_hierarchy.head == "docs/readme.md")
    assert(chunks.head.section == "docs/readme.md")
  }

  test("unknown extension falls back to character windows") {
    val text = "x" * 1300
    val chunks = code(text, "data.xyz")
    assert(chunks.length == 3) // 512+512+276
    assert(chunks.map(_.chunk_index) == Seq(0, 1, 2))
    assert(chunks.forall(_.total_chunks == 3))
  }

  test("structure chunker keeps small functions whole and merges neighbors") {
    val src = (1 to 8).map(i =>
      s"function f$i() {\n  return $i;\n}\n").mkString("\n")
    val pieces = Chunker.codeChunkTexts(src, 512)
    assert(pieces.nonEmpty)
    // every function body appears exactly once across pieces
    val joined = pieces.mkString("\n")
    (1 to 8).foreach(i => assert(joined.contains(s"return $i;")))
    assert(pieces.forall(_.length <= 512 + 64)) // merge respects budget
  }

  test("structure chunker splits an oversized function into sub-blocks") {
    val big = "function big() {\n" +
      (1 to 60).map(i => s"  const v$i = compute($i);").mkString("\n") +
      "\n}\n"
    val pieces = Chunker.codeChunkTexts(big, 512)
    assert(pieces.length > 1)
    val joined = pieces.mkString("\n")
    (1 to 60).foreach(i => assert(joined.contains(s"compute($i)")))
  }

  test("token chunker windows are lossless") {
    val text = "abcdefgh" * 200
    assert(Chunker.tokenChunk(text, 512).mkString == text)
  }

  test("sliceSafe keeps straddled pairs with the following slice") {
    val s = "ab😀cd" // emoji at index 2-3
    assert(TextUtil.sliceSafe(s, 0, 3) == "ab")     // pair travels right
    assert(TextUtil.sliceSafe(s, 3, 6) == "😀cd") // steps back for the high half
    // consecutive slices are lossless
    assert(TextUtil.sliceSafe(s, 0, 3) + TextUtil.sliceSafe(s, 3, s.length) == s)
  }

  test("chunkTreeTexts runs the reference descent over an external tree") {
    import graft.operators.Chunker.CodeTree
    // a hand-built tree mirroring tree-sitter's program →
    // [function_declaration, function_declaration] spans
    val code =
      "function add(a, b) {\n  return a + b;\n}\n" + "\n" +
      "function mul(a, b) {\n  return a * b;\n}\n"
    // tree-sitter spans end at the closing brace (exclusive end = '}'+1)
    val f1End = code.indexOf("}") + 1
    val f2Start = code.indexOf("function", f1End)
    val f2End = code.lastIndexOf("}") + 1
    val f1 = CodeTree(0, f1End, Seq.empty)
    val f2 = CodeTree(f2Start, f2End, Seq.empty)
    val program = CodeTree(0, code.length, Seq(f1, f2))
    // chunkSize 40: program oversized -> descend; each function (38
    // chars) fits -> emitted whole; merge: 38+1+38 > 40 -> two chunks
    assert(Chunker.chunkTreeTexts(code, program, chunkSize = 40) == Seq(
      code.substring(0, f1End), code.substring(f2Start, f2End)))
    // chunkSize 100: the program node itself fits -> emitted whole,
    // no descent (reference: tokenCount <= chunkSize short-circuits)
    assert(Chunker.chunkTreeTexts(code, program, chunkSize = 100) ==
      Seq(code))
    // chunkSize 78: program (79) oversized -> descend; the two 38-char
    // functions then greedily merge with a \n separator (38+1+38 = 77)
    assert(Chunker.chunkTreeTexts(code, program, chunkSize = 78) == Seq(
      code.substring(0, f1End) + "\n" + code.substring(f2Start, f2End)))
    // oversized leaf with no children is emitted whole (reference rule)
    val leafOnly = CodeTree(0, code.length, Seq.empty)
    assert(Chunker.chunkTreeTexts(code, leafOnly, chunkSize = 10) ==
      Seq(code))
    // blank-only nodes emit nothing; the non-blank source falls back to
    // character windows (reference fallback contract)
    val blankTree = CodeTree(f1End, f1End + 1, Seq.empty) // "\n" only
    assert(Chunker.chunkTreeTexts(code, blankTree, chunkSize = 40)
      .nonEmpty) // falls back to tokenChunk windows over the full code
  }
}
