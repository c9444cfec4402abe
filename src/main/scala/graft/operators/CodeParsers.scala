package graft.operators

import scala.collection.mutable.ArrayBuffer
import graft.operators.Chunker.CodeTree

/** Grammar-aware span parsers producing the tree-sitter-shaped
  * `CodeTree` that `Chunker.chunkTreeTexts` consumes (the reference
  * parses with real tree-sitter grammars, code-chunker.ts:68-118; a JVM
  * tree-sitter binding is a native dependency this offline build
  * excludes, so these recursive-descent parsers reproduce the node
  * spans the chunker actually depends on: one node per declaration /
  * statement, from its first to its last token, with members of a
  * brace or indent suite as children).
  *
  * Two families cover the reference's chunking contract
  * (tests/code-chunker.test.ts):
  *   - brace languages (typescript, javascript, go, rust, java, …):
  *     statements are line groups that return to bracket depth 0,
  *     tracked outside strings and comments; a statement containing a
  *     brace suite gets header / members / closer children.
  *   - python: statements are indent suites (decorators attach to the
  *     following definition, like tree-sitter's decorated_definition);
  *     a compound statement gets header + body-statement children.
  *
  * Parsing is per-document and runs inside row kernels — no state, no
  * driver work, safe to call from any executor thread.
  */
object CodeParsers {

  /** Languages handled by the bracket-depth statement parser. */
  private val braceLangs = Set(
    "typescript", "javascript", "go", "rust", "java", "kotlin",
    "c", "cpp", "csharp", "scala", "swift", "php",
    "css", "scss", "json")

  /** Parse `source` for `lang`; None when no grammar family covers the
    * language (callers fall back to the generic block tree). */
  def parse(lang: String, source: String): Option[CodeTree] = lang match {
    case "python" =>
      val mask = codeMask(source, python = true)
      val stmts = pyStatements(source, mask, 0, source.length)
        .map { case (s, e) => pyNode(source, mask, s, e) }
      Some(CodeTree(0, source.length, stmts))
    case "ruby" =>
      val mask = codeMask(source, python = true, ruby = true) // + heredocs
      val stmts = rubyStatements(source, mask, 0, source.length)
        .map { case (s, e) => rubyNode(source, mask, s, e) }
      Some(CodeTree(0, source.length, stmts))
    case l if braceLangs(l) =>
      val mask = braceMask(l, source)
      val stmts = braceStatements(source, mask, 0, source.length)
        .map { case (s, e) => braceNode(source, mask, s, e) }
      Some(CodeTree(0, source.length, stmts))
    case _ => None
  }

  /** Per-language lexical mask for the brace family — the single place
    * the flag dispatch lives, shared by [[parse]] and the drift gauges
    * (so a gauge can never measure a different mask than the parser
    * runs). Regex literals exist only in the JS family; masking them
    * for Go/Rust/Java would risk eating genuine division expressions.
    * Rust adds lifetimes ('a is not a char literal) and raw strings
    * (r#"…"# with live-looking braces); Java/Kotlin/Scala add
    * triple-quoted text blocks; C/C++ add R"(…)" raw strings and
    * digit-separator apostrophes (1'000'000); C# adds @"…" verbatim
    * strings ("" escape, spans newlines) and `"""` raw strings; Swift
    * adds `"""` multiline and #"…"# extended raw strings; PHP adds
    * heredocs/nowdocs (`<<<LABEL` bodies, flexible closers) and `#`
    * line comments — each a lexical hazard that would corrupt bracket
    * depth if left unmasked (the drift gauges in GrammarDriftSpec
    * measure exactly this). */
  private[operators] def braceMask(l: String, source: String): Array[Boolean] =
    codeMask(source, python = false,
      jsRegex = l == "typescript" || l == "javascript",
      rust = l == "rust",
      cpp = l == "c" || l == "cpp",
      csharp = l == "csharp",
      swift = l == "swift",
      php = l == "php",
      tripleQuote = l == "java" || l == "kotlin" || l == "scala" ||
        l == "csharp" || l == "swift")

  // ── Lexical mask ──────────────────────────────────────────────────────

  /** mask(i) = char i is live code — not inside a string literal or
    * comment. Bracket counting and quote-aware statement splitting only
    * consult live chars, so a brace in a template literal or a `#` in a
    * Python string can't derail the spans.
    *
    * Newlines stay live (line structure is what statements are built
    * from) EXCEPT inside a multi-line string construct — a template
    * literal, a triple-quoted string, or a heredoc body — where the
    * newline is masked so the splitters treat the whole construct as
    * one statement line group (tree-sitter spans a multi-line string as
    * one node; splitting it at interior newlines was the chunk-boundary
    * drift called out for these constructs).
    *
    * Template literals model `${`…`}` interpolation with a nesting
    * stack: interpolation interiors are live code (a brace pair inside
    * `${foo({b:1})}` counts and balances), the `${`/`}` delimiters
    * themselves are masked, and templates nest arbitrarily inside
    * interpolations.
    *
    * Ruby (`ruby = true`) adds heredocs: `<<DELIM`, `<<~DELIM`,
    * `<<-DELIM` and the quoted forms, DELIM an UPPERCASE identifier
    * (the uppercase convention is the disambiguator against the `<<`
    * append/shift operator, which lowercase operands would otherwise
    * trip). Multiple heredocs queued on one line open in order after
    * its newline; `~`/`-` terminators match after indent strip. A
    * bare-identifier opener additionally requires its terminator line
    * to EXIST somewhere below (see [[heredocTerminates]]) — the
    * second disambiguator against uppercase-constant operands. */
  /** Full-line index answering "does a plausible terminator line for
    * `delim` exist after position `from`?" — exact match for strict
    * heredocs, indent-stripped for `<<~`/`<<-`. Used to reject phantom
    * `<<CONST` heredocs (append/shift of an uppercase constant) whose
    * "body" would otherwise swallow the rest of the file.
    *
    * The index (line content -> ascending start offsets, exact and
    * trimmed) is built LAZILY on the first query, once per
    * [[codeMask]] call, so each candidate check is O(log lines)
    * instead of O(remaining file) — a Ruby source dense with uppercase
    * shift/append operands (generated bit-twiddling code) previously
    * made codeMask worst-case quadratic. Files with no `<<UPPER`
    * candidate never pay the single O(file) build. */
  private final class TerminatorIndex(src: String) {
    private lazy val (exact, trimmed) = {
      import scala.collection.mutable.{ArrayBuffer, HashMap}
      val e = HashMap.empty[String, ArrayBuffer[Int]]
      val t = HashMap.empty[String, ArrayBuffer[Int]]
      val n = src.length
      var i = 0
      while (i <= n) {
        var end = src.indexOf('\n', i)
        if (end < 0) end = n
        val line = src.substring(i, end)
        e.getOrElseUpdate(line, ArrayBuffer.empty[Int]) += i
        t.getOrElseUpdate(line.trim, ArrayBuffer.empty[Int]) += i
        i = end + 1
        if (end == n) i = n + 2 // past the guard: last line handled
      }
      (e, t)
    }
    /** True iff a line equal to `delim` (trimmed when `flex`) STARTS at
      * offset >= the first line boundary after `from` — same contract
      * as the superseded linear scan: the terminator must be a whole
      * line strictly below the opener's. */
    def terminates(from: Int, delim: String, flex: Boolean): Boolean = {
      val nl = src.indexOf('\n', from)
      if (nl < 0) return false
      val first = nl + 1
      (if (flex) trimmed else exact).get(delim).exists { starts =>
        var lo = 0
        var hi = starts.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (starts(mid) < first) lo = mid + 1 else hi = mid
        }
        lo < starts.length
      }
    }
  }

  /** Keywords after which a `/` lexes as a regex literal, not
    * division (the standard JS lexer disambiguation). */
  private val regexPrecedingKeywords = Set("return", "case", "typeof",
    "instanceof", "in", "of", "new", "delete", "void", "do", "else",
    "yield", "await", "throw")

  private[operators] def codeMask(src: String,
      python: Boolean, ruby: Boolean = false,
      jsRegex: Boolean = false,
      rust: Boolean = false,
      cpp: Boolean = false,
      csharp: Boolean = false,
      swift: Boolean = false,
      php: Boolean = false,
      tripleQuote: Boolean = false): Array[Boolean] = {
    val n = src.length
    val mask = Array.fill(n)(true)
    val terminators = new TerminatorIndex(src) // lazy: free until queried

    /** Exclusive end of a Rust raw string starting at `start` (`r"…"`,
      * `r#"…"#`, `br##"…"##`), or -1 when the prefix doesn't open one.
      * The body is uninterpreted — no escapes — and closes only at a
      * `"` followed by the opener's exact hash count, so interior
      * quotes, braces, and newlines are all string content. An
      * unterminated raw string swallows the rest of the file (matching
      * the real lexer's error recovery closely enough for masking). */
    def rawStringEnd(start: Int): Int = {
      var j = start
      if (src.charAt(j) == 'b') j += 1
      if (j >= n || src.charAt(j) != 'r') return -1
      j += 1
      var hashes = 0
      while (j < n && src.charAt(j) == '#') { hashes += 1; j += 1 }
      if (j >= n || src.charAt(j) != '"') return -1
      j += 1
      while (j < n) {
        if (src.charAt(j) == '"') {
          var k = j + 1
          var h = 0
          while (k < n && h < hashes && src.charAt(k) == '#') {
            h += 1; k += 1
          }
          if (h == hashes) return k
        }
        j += 1
      }
      n
    }

    /** Exclusive end of a C++ raw string `R"delim(…)delim"` starting
      * at the `R`, or -1 when it doesn't open one. The body is
      * uninterpreted — no escapes — and closes only at the exact
      * `)delim"` sequence, so interior quotes, braces, and newlines
      * are all string content. (The rare L/u/U/u8-prefixed forms are
      * not detected — their `R` has an identifier char before it.) */
    def cppRawEnd(start: Int): Int = {
      var j = start + 1
      if (j >= n || src.charAt(j) != '"') return -1
      j += 1
      val dStart = j
      while (j < n && j - dStart <= 16 && {
        val d = src.charAt(j)
        d != '(' && d != ')' && d != '\\' && d != '"' && !d.isWhitespace
      }) j += 1
      if (j >= n || src.charAt(j) != '(') return -1
      val closer = ")" + src.substring(dStart, j) + "\""
      val idx = src.indexOf(closer, j + 1)
      if (idx < 0) n else idx + closer.length
    }

    /** Exclusive end of a C# verbatim string body starting at its
      * opening `"`: backslash is NOT an escape, `""` is the quote
      * escape, newlines are content. Unterminated swallows the file. */
    def verbatimEnd(start: Int): Int = {
      var j = start + 1
      while (j < n) {
        if (src.charAt(j) == '"') {
          if (j + 1 < n && src.charAt(j + 1) == '"') j += 2
          else return j + 1
        } else j += 1
      }
      n
    }

    /** Exclusive end of a Swift extended raw string `#"…"#` /
      * `##"…"##` / `#"""…"""#` starting at the first `#`, or -1. No
      * escapes bind at fewer hashes than the opener; the closer is a
      * `"` directly followed by the opener's hash count (for the
      * multiline form that quote is the last of the closing `"""`). */
    def swiftRawEnd(start: Int): Int = {
      var j = start
      var hashes = 0
      while (j < n && src.charAt(j) == '#') { hashes += 1; j += 1 }
      if (j >= n || src.charAt(j) != '"') return -1
      j += 1
      while (j < n) {
        if (src.charAt(j) == '"') {
          var k = j + 1
          var h = 0
          while (k < n && h < hashes && src.charAt(k) == '#') {
            h += 1; k += 1
          }
          if (h == hashes) return k
        }
        j += 1
      }
      n
    }

    /** Is a `/` at position i a regex literal opener? JS disambiguates
      * by what precedes: after an operand (identifier, number, `)`,
      * `]`, string close) a `/` divides; after an operator, opener,
      * separator, keyword, or nothing it starts a regex. Drift gauge
      * evidence: `/\[\d{4}-/` (unmatched `[`) and `/\$\{([^}]+)\}/g`
      * (net extra `}`) each silently corrupted bracket depth and
      * swallowed tens of KB into one span before regexes were masked. */
    def regexPosition(i: Int): Boolean = {
      var j = i - 1
      while (j >= 0 && src.charAt(j).isWhitespace) j -= 1
      if (j < 0) return true
      val p = src.charAt(j)
      // `<` and bare `>` are deliberately NOT triggers: JSX close tags
      // (`</div>`, two on one line) would mask tag content as a
      // phantom regex, and a regex directly after a comparison
      // operator is vanishingly rare in real code. `=>` IS a trigger —
      // `xs.filter(s => /\[/.test(s))` puts an arrow, not a
      // comparison, before the regex
      if (p == '>') return j >= 1 && src.charAt(j - 1) == '='
      // postfix `++`/`--` leaves an OPERAND before the slash
      // (`i++ / n / 2` is division); a lone `+`/`-` is a binary
      // operator and keeps its regex trigger (`a + /re/.test(b)`).
      // A doubled sign only counts as postfix when it actually
      // FOLLOWS an operand — a unary chain like `f(+ +/re/.source)`
      // doubles the sign without one and stays a regex position
      if (p == '+' || p == '-') {
        if (!(j >= 1 && src.charAt(j - 1) == p)) return true
        var k = j - 2
        while (k >= 0 && src.charAt(k).isWhitespace) k -= 1
        return !(k >= 0 && {
          val c = src.charAt(k)
          c.isLetterOrDigit || c == '_' || c == '$' || c == ')' ||
            c == ']'
        })
      }
      if ("([{,;=:!&|?*%~^".indexOf(p.toInt) >= 0) return true
      if (p.isLetter) {
        var w = j
        while (w >= 0 && (src.charAt(w).isLetterOrDigit ||
            src.charAt(w) == '_' || src.charAt(w) == '$')) w -= 1
        val word = src.substring(w + 1, j + 1)
        return regexPrecedingKeywords.contains(word) &&
          (w < 0 || src.charAt(w) != '.')
      }
      false
    }

    /** End offset (exclusive, incl. flags) of a regex starting at i,
      * or -1 when no closing `/` exists on the line — then the `/` is
      * division/operator and nothing is masked. Escapes skip a char; a
      * `/` inside a `[...]` class does not terminate. */
    def regexEnd(i: Int): Int = {
      var j = i + 1
      var inClass = false
      while (j < n) {
        val c = src.charAt(j)
        if (c == '\\' && j + 1 < n) j += 1
        else if (c == '\n') return -1
        else if (c == '[') inClass = true
        else if (c == ']') inClass = false
        else if (c == '/' && !inClass) {
          var e = j + 1
          while (e < n && src.charAt(e).isLetter) e += 1
          return e
        }
        j += 1
      }
      -1
    }
    var i = 0
    var state = 0 // 0 code, 1 line comment, 2 block comment, 3 string
    var quote = ' '
    var triple = false
    // open `${` interpolations, innermost last; value = brace depth
    // inside that interpolation so far
    val interp = scala.collection.mutable.Stack[Int]()
    // heredoc delimiters queued on the current line: (delim, flexIndent)
    val heredocs = scala.collection.mutable.Queue[(String, Boolean)]()
    while (i < n) {
      val c = src.charAt(i)
      if ((ruby || php) && c == '\n' && heredocs.nonEmpty &&
          (state == 0 || state == 1)) {
        // the queued heredocs open here: their bodies (and interior
        // newlines) are string content until each terminator line
        if (state == 1) state = 0
        mask(i) = false
        var j = i + 1
        while (heredocs.nonEmpty && j < n) {
          val (delim, flex) = heredocs.head
          var lineEnd = j
          while (lineEnd < n && src.charAt(lineEnd) != '\n') lineEnd += 1
          val line = src.substring(j, lineEnd)
          // PHP 7.3 flexible closers: indented, and followed by the
          // rest of the expression (`EOT;`, `EOT)`, `EOT . $x`) — the
          // label just can't continue into a longer identifier
          val isTerm =
            if (php) {
              val t = line.trim
              t.startsWith(delim) && (t.length == delim.length || {
                val ch = t.charAt(delim.length)
                !ch.isLetterOrDigit && ch != '_'
              })
            } else if (flex) line.trim == delim
            else line == delim
          // a PHP closer line continues with LIVE code after the
          // label (`EOT);`, `EOT . $x;`) — mask only through the
          // label; everything else masks the whole line
          val maskEnd =
            if (php && isTerm)
              j + line.indexOf(delim) + delim.length
            else lineEnd
          var k = j
          while (k < maskEnd) { mask(k) = false; k += 1 }
          if (isTerm) heredocs.dequeue()
          if (heredocs.nonEmpty && lineEnd < n) mask(lineEnd) = false
          j = lineEnd + 1
        }
        // resume on the live newline that closed the last terminator
        // line (or at EOF for an unterminated heredoc)
        i = j - 1
      } else state match {
        case 0 =>
          if (!python && c == '/' && i + 1 < n) {
            val d = src.charAt(i + 1)
            if (d == '/') { state = 1; mask(i) = false }
            else if (d == '*') { state = 2; mask(i) = false }
            else if (jsRegex && regexPosition(i)) {
              val end = regexEnd(i)
              if (end > 0) {
                // mask the whole literal incl. flags: its brackets,
                // braces, and quotes are pattern content, not code
                var k = i
                while (k < end) { mask(k) = false; k += 1 }
                i = end - 1
              }
            }
          } else if (c == '#' && (python ||
              // PHP keeps # line comments, but `#[` opens an
              // attribute (live code whose brackets must count)
              (php && (i + 1 >= n || src.charAt(i + 1) != '[')))) {
            state = 1; mask(i) = false
          } else if (php && c == '<' && i + 3 < n &&
              src.charAt(i + 1) == '<' && src.charAt(i + 2) == '<') {
            // PHP heredoc/nowdoc opener: `<<<LABEL`, `<<<"LABEL"`,
            // `<<<'LABEL'` — body starts after this line's newline;
            // unlike Ruby's `<<CONST` there is no operator ambiguity,
            // so no terminator-existence check is needed
            var j = i + 3
            while (j < n && (src.charAt(j) == ' ' || src.charAt(j) == '\t'))
              j += 1
            var q = ' '
            if (j < n && (src.charAt(j) == '\'' || src.charAt(j) == '"')) {
              q = src.charAt(j); j += 1
            }
            val ls = j
            while (j < n && (src.charAt(j).isLetterOrDigit ||
                src.charAt(j) == '_')) j += 1
            val okLabel = j > ls && !src.charAt(ls).isDigit
            val okClose = q == ' ' || (j < n && src.charAt(j) == q)
            if (okLabel && okClose) {
              heredocs.enqueue((src.substring(ls, j), true))
              i = if (q == ' ') j - 1 else j
            }
          } else if (ruby && c == '<' && i + 1 < n &&
              src.charAt(i + 1) == '<' &&
              (i == 0 || src.charAt(i - 1) != '<')) {
            // possible heredoc opener; operator chars stay live either
            // way, detection only queues the delimiter
            var j = i + 2
            var flex = false
            if (j < n && (src.charAt(j) == '~' || src.charAt(j) == '-')) {
              flex = true; j += 1
            }
            if (j < n && (src.charAt(j) == '"' || src.charAt(j) == '\'')) {
              val q = src.charAt(j)
              var e = j + 1
              while (e < n && src.charAt(e) != q && src.charAt(e) != '\n')
                e += 1
              if (e < n && src.charAt(e) == q && e > j + 1) {
                heredocs.enqueue((src.substring(j + 1, e), flex))
                i = e // skip the quoted delimiter
              }
            } else {
              var e = j
              while (e < n && (src.charAt(e) == '_' ||
                  (src.charAt(e) >= 'A' && src.charAt(e) <= 'Z') ||
                  src.charAt(e).isDigit)) e += 1
              // `<<CONST` is ambiguous with append/shift of an
              // uppercase constant (`arr <<DEFAULTS`, `x<<WIDTH`): only
              // treat it as a heredoc when its terminator line actually
              // exists later — a phantom heredoc would otherwise mask
              // the entire remainder of the file as string content
              if (e > j && !src.charAt(j).isDigit &&
                  terminators.terminates(e, src.substring(j, e), flex)) {
                heredocs.enqueue((src.substring(j, e), flex))
                i = e - 1
              } else i += 1 // plain << operator: skip the second '<'
            }
          } else if (rust && (c == 'r' || c == 'b') &&
              (i == 0 || {
                val p = src.charAt(i - 1)
                !p.isLetterOrDigit && p != '_'
              }) && rawStringEnd(i) > 0) {
            // Rust raw (or byte/raw-byte) string: the whole token —
            // prefix, hashes, body, interior braces/quotes/NEWLINES —
            // is string content; rawStringEnd already found the
            // matching `"##…` closer
            val end = rawStringEnd(i)
            var k = i
            while (k < end) { mask(k) = false; k += 1 }
            i = end - 1
          } else if (rust && c == '\'') {
            // lifetime vs char literal: '\…' (escape) and 'X' (single
            // char + closing quote) are char literals — masked through
            // the closer so '{' or '\u{1F600}' can't corrupt bracket
            // depth; anything else ('a in generics, 'static, loop
            // labels) is a lifetime/label and stays live code
            if (i + 1 < n && src.charAt(i + 1) == '\\') {
              var j = i + 1
              while (j < n && src.charAt(j) != '\n' &&
                  !(src.charAt(j) == '\'' && src.charAt(j - 1) != '\\')) {
                // a \' escape keeps scanning: step past the pair
                if (src.charAt(j) == '\\' && j + 1 < n) j += 1
                j += 1
              }
              var k = i
              while (k <= math.min(j, n - 1)) { mask(k) = false; k += 1 }
              i = math.min(j, n - 1)
            } else if (i + 2 < n && src.charAt(i + 2) == '\'' &&
                src.charAt(i + 1) != '\'') {
              mask(i) = false; mask(i + 1) = false; mask(i + 2) = false
              i += 2
            } // else: lifetime — live, no state change
          } else if (cpp && c == 'R' && (i == 0 || {
              val p = src.charAt(i - 1)
              !p.isLetterOrDigit && p != '_'
            }) && cppRawEnd(i) > 0) {
            val end = cppRawEnd(i)
            var k = i
            while (k < end) { mask(k) = false; k += 1 }
            i = end - 1
          } else if (cpp && c == '\'' && i > 0 && i + 1 < n && {
              def hex(ch: Char) = ch.isDigit ||
                (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')
              hex(src.charAt(i - 1)) && hex(src.charAt(i + 1))
            }) {
            // C++14/C23 digit separator (1'000'000, 0xFF'FF): not a
            // char-literal opener; the apostrophe stays live code
          } else if (csharp && ((c == '@' && i + 1 < n &&
              (src.charAt(i + 1) == '"' || (src.charAt(i + 1) == '$' &&
                i + 2 < n && src.charAt(i + 2) == '"'))) ||
              (c == '$' && i + 2 < n && src.charAt(i + 1) == '@' &&
                src.charAt(i + 2) == '"'))) {
            // verbatim (possibly interpolated) string: @"…", @$"…",
            // $@"…" — "" escapes, newlines are content. Interpolation
            // braces inside are balanced pairs, so masking the whole
            // token wholesale cannot skew bracket depth
            val q = if (src.charAt(i + 1) == '"') i + 1 else i + 2
            val end = verbatimEnd(q)
            var k = i
            while (k < end) { mask(k) = false; k += 1 }
            i = end - 1
          } else if (swift && c == '#' && swiftRawEnd(i) > 0) {
            val end = swiftRawEnd(i)
            var k = i
            while (k < end) { mask(k) = false; k += 1 }
            i = end - 1
          } else if (c == '"' || (c == '\'' && !rust) ||
              (!python && c == '`')) {
            quote = c
            triple = (python || (tripleQuote && c == '"')) &&
              i + 2 < n &&
              src.charAt(i + 1) == c && src.charAt(i + 2) == c
            state = 3
            if (triple) {
              mask(i + 1) = false; mask(i + 2) = false; i += 2
            }
          } else if (interp.nonEmpty) {
            // live code inside a `${` interpolation: track its brace
            // depth; the matching depth-0 `}` returns to the template
            if (c == '{') interp.push(interp.pop() + 1)
            else if (c == '}') {
              val d = interp.pop()
              if (d == 0) {
                mask(i) = false
                state = 3; quote = '`'; triple = false
              } else interp.push(d - 1)
            } else if (c == '\n') mask(i) = false // still inside the literal
          }
        case 1 => // line comment: dies at newline (newline stays live)
          if (c == '\n') state = 0 else mask(i) = false
        case 2 => // block comment (newlines stay live)
          if (c != '\n') mask(i) = false
          if (c == '*' && i + 1 < n && src.charAt(i + 1) == '/') {
            mask(i + 1) = false; i += 1; state = 0
          }
        case 3 => // string literal
          if (c == '\n') {
            // single-line strings can't span lines; triple (and
            // backtick template) strings can — with MASKED newlines
            if (!triple && quote != '`') state = 0
            else mask(i) = false
          } else mask(i) = false
          if (state == 3 && c == '\\' && i + 1 < n) {
            if (src.charAt(i + 1) != '\n') mask(i + 1) = false
            i += 1
          } else if (state == 3 && quote == '`' && c == '$' &&
              i + 1 < n && src.charAt(i + 1) == '{') {
            // template interpolation: delimiters masked, interior live
            mask(i + 1) = false
            interp.push(0)
            state = 0
            i += 1
          } else if (state == 3 && c == quote) {
            if (!triple) state = 0
            else if (i + 2 < n && src.charAt(i + 1) == quote &&
              src.charAt(i + 2) == quote) {
              mask(i + 1) = false; mask(i + 2) = false; i += 2; state = 0
            } else if (i + 2 >= n) state = 0
          }
      }
      i += 1
    }
    mask
  }

  // ── Brace family ──────────────────────────────────────────────────────

  /** Split [from, to) into statement spans: line groups that return to
    * combined bracket depth 0 at a line end. Spans run from the first to
    * the last non-whitespace char (tree-sitter nodes cover tokens, not
    * the blank lines between them). */
  private[operators] def braceStatements(src: String, mask: Array[Boolean],
      from: Int, to: Int): Seq[(Int, Int)] = {
    val out = ArrayBuffer[(Int, Int)]()
    var depth = 0
    var stmtStart = -1
    var lastNonWs = -1
    var i = from
    while (i < to) {
      val c = src.charAt(i)
      if (c == '\n') {
        // a masked newline is interior to a multi-line string — the
        // statement continues across it
        if (mask(i) && stmtStart >= 0 && depth <= 0) {
          out += ((stmtStart, lastNonWs + 1)); stmtStart = -1; depth = 0
        }
      } else {
        if (mask(i)) {
          if (c == '{' || c == '(' || c == '[') depth += 1
          else if (c == '}' || c == ')' || c == ']') depth -= 1
        }
        if (!c.isWhitespace) {
          if (stmtStart < 0) stmtStart = i
          lastNonWs = i
        }
      }
      i += 1
    }
    if (stmtStart >= 0) out += ((stmtStart, lastNonWs + 1))
    out.toSeq
  }

  /** One brace-family statement: if it carries a multi-member brace
    * suite, children = header (through the opening brace), each member
    * statement (recursively parsed), and the closer (the closing brace
    * through any trailing `;`). Otherwise a leaf. */
  private def braceNode(src: String, mask: Array[Boolean],
      start: Int, end: Int): CodeTree = {
    // first '{' at combined bracket depth 0 — e.g. past the parameter
    // list of `func f(a int) int {`
    var i = start
    var d = 0
    var open = -1
    while (i < end && open < 0) {
      if (mask(i)) {
        val c = src.charAt(i)
        if (c == '(' || c == '[') d += 1
        else if (c == ')' || c == ']') d -= 1
        else if (c == '{' && d == 0) open = i
      }
      i += 1
    }
    if (open < 0) return CodeTree(start, end, Seq.empty)
    var bd = 0
    var close = -1
    i = open
    while (i < end && close < 0) {
      if (mask(i)) {
        val c = src.charAt(i)
        if (c == '{') bd += 1
        else if (c == '}') { bd -= 1; if (bd == 0) close = i }
      }
      i += 1
    }
    if (close < 0) return CodeTree(start, end, Seq.empty)
    val body = braceStatements(src, mask, open + 1, close)
      .map { case (s, e) => braceNode(src, mask, s, e) }
    if (body.isEmpty) CodeTree(start, end, Seq.empty)
    else CodeTree(start, end,
      CodeTree(start, open + 1, Seq.empty) +: body :+
        CodeTree(close, end, Seq.empty))
  }

  // ── Python ────────────────────────────────────────────────────────────

  /** Indent of a line (expanded position of its first non-ws char), or
    * -1 for blank lines. Tabs count as 1 — the fixtures and reference
    * corpus are space-indented. */
  private def lineIndent(src: String, lineStart: Int, to: Int): Int = {
    var i = lineStart
    while (i < to && src.charAt(i) != '\n') {
      if (!src.charAt(i).isWhitespace) return i - lineStart
      i += 1
    }
    -1
  }

  /** Split [from, to) into python statement spans at the block's base
    * indent. A line at base indent starts a new statement unless the
    * current statement is still an open decorator group (tree-sitter's
    * decorated_definition spans decorators AND the following def) or a
    * bracket continuation. Deeper-indented and blank lines attach to
    * the current statement; trailing blanks are excluded from spans. */
  private[operators] def pyStatements(src: String, mask: Array[Boolean],
      from: Int, to: Int): Seq[(Int, Int)] = {
    val out = ArrayBuffer[(Int, Int)]()
    // base indent = indent of the first non-blank line
    var probe = from
    var base = -1
    while (probe < to && base < 0) {
      base = lineIndent(src, probe, to)
      if (base < 0) {
        while (probe < to && src.charAt(probe) != '\n') probe += 1
        probe += 1
      }
    }
    if (base < 0) return Seq.empty
    var i = from
    var depth = 0
    var stmtStart = -1
    var lastNonWs = -1
    var decoratorPending = false
    // a line opened by a masked newline is interior to a multi-line
    // string — it has no indent structure of its own and can never
    // start a statement, whatever column its text sits at
    var fresh = true
    while (i < to) {
      val ind = lineIndent(src, i, to)
      val lineEnd = {
        var j = i
        while (j < to && src.charAt(j) != '\n') j += 1
        j
      }
      if (fresh && ind >= 0) {
        val firstChar = src.charAt(i + ind)
        val startsNew = depth == 0 && ind <= base &&
          (stmtStart < 0 || !decoratorPending)
        if (startsNew) {
          if (stmtStart >= 0) out += ((stmtStart, lastNonWs + 1))
          stmtStart = i + ind
          decoratorPending = firstChar == '@'
        } else if (decoratorPending && depth == 0 && ind <= base) {
          // the def/class line the decorators were waiting for
          if (firstChar != '@') decoratorPending = false
        }
      }
      if (ind >= 0 || !fresh) {
        var j = if (fresh && ind >= 0) i + ind else i
        while (j < lineEnd) {
          if (mask(j)) {
            val c = src.charAt(j)
            if (c == '(' || c == '[' || c == '{') depth += 1
            else if (c == ')' || c == ']' || c == '}')
              depth = math.max(0, depth - 1)
          }
          if (!src.charAt(j).isWhitespace) lastNonWs = j
          j += 1
        }
      }
      fresh = lineEnd >= to || mask(lineEnd)
      i = lineEnd + 1
    }
    if (stmtStart >= 0) out += ((stmtStart, lastNonWs + 1))
    out.toSeq
  }

  /** One python statement: decorator lines become leading leaf children
    * with the decorated definition as the last child; a compound
    * statement (header line ending in ':') gets header + body-statement
    * children; everything else is a leaf. */
  private def pyNode(src: String, mask: Array[Boolean],
      start: Int, end: Int): CodeTree = {
    if (src.charAt(start) == '@') {
      // split decorator lines (bracket-aware) from the definition
      val decos = ArrayBuffer[(Int, Int)]()
      var i = start
      var depth = 0
      var lineStart = start
      var defStart = -1
      while (i < end && defStart < 0) {
        val c = src.charAt(i)
        if (mask(i)) {
          if (c == '(' || c == '[' || c == '{') depth += 1
          else if (c == ')' || c == ']' || c == '}')
            depth = math.max(0, depth - 1)
        }
        if (c == '\n' && mask(i) && depth == 0) {
          var j = i + 1
          while (j < end && src.charAt(j).isWhitespace) j += 1
          if (j < end) {
            decos += ((lineStart, i))
            if (src.charAt(j) == '@') lineStart = j
            else defStart = j
            i = j - 1
          }
        }
        i += 1
      }
      if (defStart < 0) return CodeTree(start, end, Seq.empty)
      val kids = decos.map { case (s, e) =>
        CodeTree(s, trimEnd(src, s, e), Seq.empty) }.toSeq :+
        pyNode(src, mask, defStart, end)
      return CodeTree(start, end, kids)
    }
    // compound statement: header runs to the first depth-0 line end
    // whose last live char is ':'
    var i = start
    var depth = 0
    var lastLive = ' '
    var lastLivePos = -1
    var headerEnd = -1
    while (i < end && headerEnd < 0) {
      val c = src.charAt(i)
      if (c == '\n' && mask(i)) { // masked newline: string interior
        if (depth == 0) {
          if (lastLive == ':') headerEnd = lastLivePos + 1
          else return CodeTree(start, end, Seq.empty) // simple multi-line
        }
      } else if (c != '\n' && mask(i)) {
        if (c == '(' || c == '[' || c == '{') depth += 1
        else if (c == ')' || c == ']' || c == '}')
          depth = math.max(0, depth - 1)
        if (!c.isWhitespace) { lastLive = c; lastLivePos = i }
      }
      i += 1
    }
    if (headerEnd < 0) return CodeTree(start, end, Seq.empty)
    val bodyStart = {
      var j = headerEnd
      while (j < end && src.charAt(j) != '\n') j += 1
      j + 1
    }
    if (bodyStart >= end) return CodeTree(start, end, Seq.empty)
    val body = pyStatements(src, mask, bodyStart, end)
      .map { case (s, e) => pyNode(src, mask, s, e) }
    if (body.isEmpty) CodeTree(start, end, Seq.empty)
    else CodeTree(start, end,
      CodeTree(start, headerEnd, Seq.empty) +: body)
  }

  private def trimEnd(src: String, start: Int, end: Int): Int = {
    var e = end
    while (e > start && src.charAt(e - 1).isWhitespace) e -= 1
    e
  }

  // ── Ruby (end-delimited suites) ───────────────────────────────────────

  private val rubyAlwaysOpen = Set("def", "class", "module", "begin", "case")
  private val rubyFirstOpen = Set("if", "unless", "while", "until", "for")

  /** Net block-depth change of one line: `end` tokens close, opener
    * keywords open (if/unless/while/until only in statement position —
    * Ruby's modifier forms `x if cond` don't open a block), and a
    * trailing-or-infix `do` opens its block. Tokens come from the
    * lexical mask, so strings and comments can't shift depth. */
  private def rubyLineDelta(masked: String): Int = {
    val tokens = """[A-Za-z_]\w*[?!]?""".r.findAllIn(masked).toSeq
    var delta = 0
    tokens.zipWithIndex.foreach { case (t, idx) =>
      t match {
        case "end" => delta -= 1
        case "do" => delta += 1
        case k if rubyAlwaysOpen(k) => delta += 1
        case k if rubyFirstOpen(k) && idx == 0 => delta += 1
        case _ => ()
      }
    }
    delta
  }

  /** Masked text of the line starting at `i` (masked-out chars become
    * spaces), plus the line-end offset. */
  private def maskedLine(src: String, mask: Array[Boolean], i: Int,
      to: Int): (String, Int) = {
    var j = i
    val sb = new StringBuilder
    while (j < to && src.charAt(j) != '\n') {
      sb.append(if (mask(j)) src.charAt(j) else ' ')
      j += 1
    }
    (sb.toString, j)
  }

  /** Split [from, to) into ruby statement spans: line groups that
    * return to keyword-block depth 0 at a line end. */
  private[operators] def rubyStatements(src: String, mask: Array[Boolean],
      from: Int, to: Int): Seq[(Int, Int)] = {
    val out = ArrayBuffer[(Int, Int)]()
    var depth = 0
    var stmtStart = -1
    var lastNonWs = -1
    var i = from
    while (i < to) {
      val (line, lineEnd) = maskedLine(src, mask, i, to)
      var k = i
      while (k < lineEnd) {
        if (!src.charAt(k).isWhitespace) {
          if (stmtStart < 0) stmtStart = k
          lastNonWs = k
        }
        k += 1
      }
      depth += rubyLineDelta(line)
      // a masked line-end newline is interior to a heredoc body — the
      // statement continues through it
      if (stmtStart >= 0 && depth <= 0 &&
          (lineEnd >= to || mask(lineEnd))) {
        out += ((stmtStart, lastNonWs + 1)); stmtStart = -1; depth = 0
      }
      i = lineEnd + 1
    }
    if (stmtStart >= 0) out += ((stmtStart, lastNonWs + 1))
    out.toSeq
  }

  /** One ruby statement: a multi-line keyword suite closed by a final
    * `end` line gets header / body-statement / closer children. */
  private def rubyNode(src: String, mask: Array[Boolean],
      start: Int, end: Int): CodeTree = {
    val (firstLine, firstEnd) = maskedLine(src, mask, start, end)
    val word0 = """[A-Za-z_]\w*""".r.findFirstIn(firstLine)
    val opens = word0.exists(w => rubyAlwaysOpen(w) || rubyFirstOpen(w))
    if (!opens || firstEnd >= end) return CodeTree(start, end, Seq.empty)
    // the final line must be the matching `end`
    var lastLineStart = end - 1
    while (lastLineStart > start && src.charAt(lastLineStart - 1) != '\n')
      lastLineStart -= 1
    val lastFirstWord = """[A-Za-z_]\w*""".r
      .findFirstIn(maskedLine(src, mask, lastLineStart, end)._1)
    if (!lastFirstWord.contains("end")) return CodeTree(start, end, Seq.empty)
    val bodyStart = firstEnd + 1
    // span of `end` starts at its first non-ws char (indent excluded)
    var closerStart = lastLineStart
    while (closerStart < end && src.charAt(closerStart).isWhitespace)
      closerStart += 1
    if (bodyStart >= lastLineStart) return CodeTree(start, end, Seq.empty)
    val body = rubyStatements(src, mask, bodyStart, lastLineStart)
      .map { case (s, e) => rubyNode(src, mask, s, e) }
    if (body.isEmpty) CodeTree(start, end, Seq.empty)
    else CodeTree(start, end,
      CodeTree(start, firstEnd, Seq.empty) +: body :+
        CodeTree(closerStart, end, Seq.empty))
  }
}
