package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Chunker, CodeParsers}

/** Golden replication of the reference's code-chunker contract
  * (/root/reference/tests/code-chunker.test.ts) through the
  * grammar-family span parsers + Chunker.chunkTreeTexts. Fixture code
  * and assertions mirror the reference suite: boundary integrity (every
  * chunk containing a construct's opening also contains its closing),
  * merge behavior, size limits, and edge cases — with the reference's
  * default char-count tokenCounter (tokens = text.length). */
class CodeParserSpec extends AnyFunSuite {

  private def chunk(lang: String, code: String, chunkSize: Int): Seq[String] =
    Chunker.chunkTreeTexts(code,
      CodeParsers.parse(lang, code).getOrElse(fail(s"no parser for $lang")),
      chunkSize)

  /** Reference assertBoundaryIntegrity: chunking must actually happen
    * (chunks > 1), each opening pattern appears somewhere, and every
    * chunk containing an opening also contains the matching closing. */
  private def assertBoundaryIntegrity(chunks: Seq[String],
      constructs: Seq[(String, String, String)]): Unit = {
    assert(chunks.length > 1, s"chunking must happen: $chunks")
    for ((name, opening, closing) <- constructs) {
      val matching = chunks.filter(_.contains(opening))
      assert(matching.nonEmpty, s"$name: no chunk contains '$opening'")
      for (c <- matching)
        assert(c.contains(closing),
          s"$name: chunk with '$opening' lacks '$closing':\n$c")
    }
  }

  private def assertBoundaryIntegrityRe(chunks: Seq[String],
      constructs: Seq[(String, String, scala.util.matching.Regex)]): Unit = {
    assert(chunks.length > 1, s"chunking must happen: $chunks")
    for ((name, opening, closing) <- constructs) {
      val matching = chunks.filter(_.contains(opening))
      assert(matching.nonEmpty, s"$name: no chunk contains '$opening'")
      for (c <- matching)
        assert(closing.findFirstIn(c).isDefined,
          s"$name: chunk with '$opening' lacks /$closing/:\n$c")
    }
  }

  // ─── chunk basics (reference "chunk" describe) ──────────────────────

  test("empty and whitespace-only input produce no chunks") {
    assert(chunk("typescript", "", 512).isEmpty)
    assert(chunk("typescript", "   \n\n  \t  ", 512).isEmpty)
  }

  test("small input is a single chunk at the default size") {
    assert(chunk("typescript", "const x = 1;", 512).length == 1)
  }

  test("chunks TypeScript interface/function/class code") {
    val code = """
interface User {
    name: string;
    age: number;
}

function greet(user: User): string {
    return `Hello, ${user.name}!`;
}

class UserService {
    private users: User[] = [];

    addUser(user: User): void {
        this.users.push(user);
    }

    getUsers(): User[] {
        return this.users;
    }
}
"""
    val chunks = chunk("typescript", code, 100)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(c.strip().nonEmpty))
  }

  test("respects chunkSize limit within the reference's 1.5x bound") {
    val code = (0 until 20).map(i =>
      s"function fn$i(a: number, b: number): number {\n  return a + b + $i;\n}\n")
      .mkString("\n")
    val chunks = chunk("typescript", code, 200)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 300), chunks.map(_.length))
  }

  test("preserves code content across chunks (no data loss)") {
    val code = "const x = 1;\nconst y = 2;\nconst z = 3;"
    val joined = chunk("typescript", code, 50).mkString("\n")
    assert(joined.contains("const x = 1"))
    assert(joined.contains("const y = 2"))
    assert(joined.contains("const z = 3"))
  }

  // ─── merge behavior ─────────────────────────────────────────────────

  test("merges small adjacent chunks up to chunkSize") {
    assert(chunk("typescript",
      "const a = 1;\nconst b = 2;\nconst c = 3;", 500).length == 1)
  }

  test("does not merge past chunkSize") {
    val code = "const variable_one = \"hello\";\n" +
      "const variable_two = \"world\";\nconst variable_three = \"test\";"
    assert(chunk("typescript", code, 30).length > 1)
  }

  test("whitespace-heavy code yields no empty chunks") {
    val chunks = chunk("typescript",
      "\n\n\n// comment\n\n\nconst x = 1;\n\n\n", 500)
    chunks.foreach(c => assert(c.strip().nonEmpty))
  }

  test("indivisible oversized leaf is still returned") {
    val code =
      "const veryLongVariableName = \"a very long string value that exceeds chunk size\";"
    assert(chunk("typescript", code, 5).nonEmpty)
  }

  test("mismatched language still produces output") {
    assert(chunk("python", "interface Foo { bar: string; }", 200).nonEmpty)
  }

  // ─── TypeScript boundary integrity ──────────────────────────────────

  test("TS: standalone functions stay intact") {
    val code = """
function add(a: number, b: number): number {
    const result = a + b;
    return result;
}

function multiply(x: number, y: number): number {
    const product = x * y;
    return product;
}

function greet(name: string): string {
    const greeting = `Hello, ${name}!`;
    return greeting;
}
"""
    assertBoundaryIntegrity(chunk("typescript", code, 200), Seq(
      ("add", "function add(", "return result;\n}"),
      ("multiply", "function multiply(", "return product;\n}"),
      ("greet", "function greet(", "return greeting;\n}")))
  }

  test("TS: arrow functions stay intact") {
    val code = """
const double = (x: number): number => {
    const result = x * 2;
    return result;
};

const triple = (x: number): number => {
    const result = x * 3;
    return result;
};

const quadruple = (x: number): number => {
    const result = x * 4;
    return result;
};
"""
    assertBoundaryIntegrity(chunk("typescript", code, 150), Seq(
      ("double", "const double =", "return result;\n};"),
      ("triple", "const triple =", "return result;\n};"),
      ("quadruple", "const quadruple =", "return result;\n};")))
  }

  test("TS: interfaces stay intact") {
    val code = """
interface User {
    id: number;
    name: string;
    email: string;
    createdAt: Date;
}

interface Product {
    sku: string;
    title: string;
    price: number;
    inStock: boolean;
}

interface Order {
    orderId: string;
    userId: number;
    total: number;
    status: string;
}
"""
    assertBoundaryIntegrity(chunk("typescript", code, 120), Seq(
      ("User", "interface User {", "createdAt: Date;\n}"),
      ("Product", "interface Product {", "inStock: boolean;\n}"),
      ("Order", "interface Order {", "status: string;\n}")))
  }

  test("TS: class methods stay intact when the class is split") {
    val code = """
class Calculator {
    private history: number[] = [];

    add(a: number, b: number): number {
        const result = a + b;
        this.history.push(result);
        return result;
    }

    subtract(a: number, b: number): number {
        const result = a - b;
        this.history.push(result);
        return result;
    }

    getHistory(): number[] {
        return [...this.history];
    }
}
"""
    assertBoundaryIntegrity(chunk("typescript", code, 150), Seq(
      ("add", "add(a: number, b: number)", "return result;\n    }"),
      ("subtract", "subtract(a: number, b: number)", "return result;\n    }"),
      ("getHistory", "getHistory()", "return [...this.history];\n    }")))
  }

  test("TS: async functions stay intact") {
    val code = """
async function fetchUser(id: number): Promise<User> {
    const response = await fetch(`/api/users/${id}`);
    const data = await response.json();
    return data as User;
}

async function fetchProducts(): Promise<Product[]> {
    const response = await fetch('/api/products');
    const data = await response.json();
    return data as Product[];
}
"""
    assertBoundaryIntegrity(chunk("typescript", code, 250), Seq(
      ("fetchUser", "async function fetchUser(", "return data as User;\n}"),
      ("fetchProducts", "async function fetchProducts(",
        "return data as Product[];\n}")))
  }

  test("TS: enum declarations stay intact") {
    val code = """
enum Direction {
    Up = "UP",
    Down = "DOWN",
    Left = "LEFT",
    Right = "RIGHT",
}

enum Color {
    Red = 0,
    Green = 1,
    Blue = 2,
}

enum Status {
    Pending = "PENDING",
    Active = "ACTIVE",
    Inactive = "INACTIVE",
    Archived = "ARCHIVED",
}
"""
    assertBoundaryIntegrity(chunk("typescript", code, 130), Seq(
      ("Direction", "enum Direction {", "Right = \"RIGHT\",\n}"),
      ("Color", "enum Color {", "Blue = 2,\n}"),
      ("Status", "enum Status {", "Archived = \"ARCHIVED\",\n}")))
  }

  // ─── JavaScript ─────────────────────────────────────────────────────

  test("JS: functions stay intact") {
    val code = """
function fibonacci(n) {
    if (n <= 1) return n;
    let a = 0, b = 1;
    for (let i = 2; i <= n; i++) {
        const temp = a + b;
        a = b;
        b = temp;
    }
    return b;
}

function factorial(n) {
    if (n <= 1) return 1;
    let result = 1;
    for (let i = 2; i <= n; i++) {
        result *= i;
    }
    return result;
}
"""
    assertBoundaryIntegrity(chunk("javascript", code, 250), Seq(
      ("fibonacci", "function fibonacci(n)", "return b;\n}"),
      ("factorial", "function factorial(n)", "return result;\n}")))
  }

  test("JS: class methods stay intact when the class is split") {
    val code = """
class EventEmitter {
    constructor() {
        this.listeners = {};
    }

    on(event, callback) {
        if (!this.listeners[event]) {
            this.listeners[event] = [];
        }
        this.listeners[event].push(callback);
    }

    emit(event, ...args) {
        const callbacks = this.listeners[event] || [];
        callbacks.forEach(cb => cb(...args));
    }
}
"""
    assertBoundaryIntegrityRe(chunk("javascript", code, 200), Seq(
      ("constructor", "constructor()",
        """this\.listeners = \{\};\n    \}""".r),
      ("on", "on(event, callback)",
        """this\.listeners\[event\]\.push\(callback\);\n\s+\}""".r),
      ("emit", "emit(event, ...args)",
        """callbacks\.forEach\(cb => cb\(\.\.\.args\)\);\n\s+\}""".r)))
  }

  // ─── Python ─────────────────────────────────────────────────────────

  test("PY: function definitions stay intact") {
    val code = """
def binary_search(arr, target):
    low = 0
    high = len(arr) - 1
    while low <= high:
        mid = (low + high) // 2
        if arr[mid] == target:
            return mid
        elif arr[mid] < target:
            low = mid + 1
        else:
            high = mid - 1
    return -1

def merge_sort(arr):
    if len(arr) <= 1:
        return arr
    mid = len(arr) // 2
    left = merge_sort(arr[:mid])
    right = merge_sort(arr[mid:])
    return merge(left, right)
"""
    assertBoundaryIntegrity(chunk("python", code, 350), Seq(
      ("binary_search", "def binary_search(", "return -1"),
      ("merge_sort", "def merge_sort(", "return merge(left, right)")))
  }

  test("PY: class methods stay intact when the class is split") {
    val code = """
class Stack:
    def __init__(self):
        self.items = []

    def push(self, item):
        self.items.append(item)
        return self

    def pop(self):
        if self.is_empty():
            raise IndexError("pop from empty stack")
        return self.items.pop()

    def peek(self):
        if self.is_empty():
            raise IndexError("peek from empty stack")
        return self.items[-1]

    def is_empty(self):
        return len(self.items) == 0

    def size(self):
        return len(self.items)
"""
    assertBoundaryIntegrity(chunk("python", code, 200), Seq(
      ("__init__", "def __init__(self)", "self.items = []"),
      ("push", "def push(self, item)", "return self"),
      ("pop", "def pop(self)", "return self.items.pop()"),
      ("is_empty", "def is_empty(self)", "return len(self.items) == 0")))
  }

  test("PY: decorated functions stay intact") {
    val code = """
def decorator(func):
    def wrapper(*args, **kwargs):
        print("Before")
        result = func(*args, **kwargs)
        print("After")
        return result
    return wrapper

@decorator
def say_hello(name):
    message = f"Hello, {name}!"
    print(message)
    return message

@decorator
def say_goodbye(name):
    message = f"Goodbye, {name}!"
    print(message)
    return message
"""
    assertBoundaryIntegrity(chunk("python", code, 200), Seq(
      ("decorator", "def decorator(func)", "return wrapper"),
      ("say_hello", "def say_hello(name)", "return message"),
      ("say_goodbye", "def say_goodbye(name)", "return message")))
  }

  // ─── Go ─────────────────────────────────────────────────────────────

  test("GO: function definitions stay intact") {
    val code = """
package main

import "fmt"

func fibonacci(n int) int {
	if n <= 1 {
		return n
	}
	a, b := 0, 1
	for i := 2; i <= n; i++ {
		a, b = b, a+b
	}
	return b
}

func isPrime(n int) bool {
	if n < 2 {
		return false
	}
	for i := 2; i*i <= n; i++ {
		if n%i == 0 {
			return false
		}
	}
	return true
}

func main() {
	fmt.Println(fibonacci(10))
	fmt.Println(isPrime(17))
}
"""
    assertBoundaryIntegrityRe(chunk("go", code, 250), Seq(
      ("fibonacci", "func fibonacci(n int) int {", """return b\n\}""".r),
      ("isPrime", "func isPrime(n int) bool {", """return true\n\}""".r),
      ("main", "func main() {", """isPrime\(17\)\)\n\}""".r)))
  }

  test("GO: struct methods stay intact") {
    val code = """
package main

type Point struct {
	X float64
	Y float64
}

func (p Point) Distance(other Point) float64 {
	dx := p.X - other.X
	dy := p.Y - other.Y
	return dx*dx + dy*dy
}

func (p *Point) Translate(dx, dy float64) {
	p.X += dx
	p.Y += dy
}

func NewPoint(x, y float64) Point {
	return Point{X: x, Y: y}
}
"""
    assertBoundaryIntegrityRe(chunk("go", code, 250), Seq(
      ("Distance", "func (p Point) Distance(",
        """return dx\*dx \+ dy\*dy\n\}""".r),
      ("Translate", "func (p *Point) Translate(", """p\.Y \+= dy\n\}""".r),
      ("NewPoint", "func NewPoint(",
        """return Point\{X: x, Y: y\}\n\}""".r)))
  }

  // ─── Rust ───────────────────────────────────────────────────────────

  test("RS: function definitions stay intact") {
    val code = """
fn gcd(mut a: u64, mut b: u64) -> u64 {
    while b != 0 {
        let temp = b;
        b = a % b;
        a = temp;
    }
    a
}

fn lcm(a: u64, b: u64) -> u64 {
    let g = gcd(a, b);
    (a / g) * b
}

fn is_palindrome(s: &str) -> bool {
    let bytes = s.as_bytes();
    let len = bytes.len();
    for i in 0..len / 2 {
        if bytes[i] != bytes[len - 1 - i] {
            return false;
        }
    }
    true
}
"""
    assertBoundaryIntegrityRe(chunk("rust", code, 250), Seq(
      ("gcd", "fn gcd(", """a\n\}""".r),
      ("lcm", "fn lcm(", """\(a / g\) \* b\n\}""".r),
      ("is_palindrome", "fn is_palindrome(", """true\n\}""".r)))
  }

  test("RS: impl methods stay intact when the impl is split") {
    val code = """
struct Rectangle {
    width: f64,
    height: f64,
}

impl Rectangle {
    fn new(width: f64, height: f64) -> Self {
        Rectangle { width, height }
    }

    fn area(&self) -> f64 {
        self.width * self.height
    }

    fn perimeter(&self) -> f64 {
        2.0 * (self.width + self.height)
    }

    fn is_square(&self) -> bool {
        (self.width - self.height).abs() < f64::EPSILON
    }
}
"""
    assertBoundaryIntegrityRe(chunk("rust", code, 200), Seq(
      ("new", "fn new(width", """Rectangle \{ width, height \}\n\s+\}""".r),
      ("area", "fn area(&self)", """self\.width \* self\.height\n\s+\}""".r),
      ("perimeter", "fn perimeter(&self)",
        """2\.0 \* \(self\.width \+ self\.height\)\n\s+\}""".r)))
  }

  // ─── Java ───────────────────────────────────────────────────────────

  test("JAVA: methods stay intact when the class is split") {
    val code = """
public class MathUtils {
    public static int factorial(int n) {
        if (n <= 1) return 1;
        int result = 1;
        for (int i = 2; i <= n; i++) {
            result *= i;
        }
        return result;
    }

    public static boolean isPrime(int n) {
        if (n < 2) return false;
        for (int i = 2; i * i <= n; i++) {
            if (n % i == 0) return false;
        }
        return true;
    }

    public static int[] fibonacci(int count) {
        int[] fib = new int[count];
        fib[0] = 0;
        fib[1] = 1;
        for (int i = 2; i < count; i++) {
            fib[i] = fib[i-1] + fib[i-2];
        }
        return fib;
    }
}
"""
    assertBoundaryIntegrityRe(chunk("java", code, 250), Seq(
      ("factorial", "public static int factorial(",
        """return result;\n\s+\}""".r),
      ("isPrime", "public static boolean isPrime(",
        """return true;\n\s+\}""".r),
      ("fibonacci", "public static int[] fibonacci(",
        """return fib;\n\s+\}""".r)))
  }

  // ─── Kotlin ─────────────────────────────────────────────────────────

  test("KT: function definitions stay intact") {
    val code = """
fun fibonacci(n: Int): Long {
    if (n <= 1) return n.toLong()
    var a = 0L
    var b = 1L
    for (i in 2..n) {
        val temp = a + b
        a = b
        b = temp
    }
    return b
}

fun isPalindrome(s: String): Boolean {
    val cleaned = s.lowercase().filter { it.isLetterOrDigit() }
    return cleaned == cleaned.reversed()
}

fun gcd(a: Int, b: Int): Int {
    var x = a
    var y = b
    while (y != 0) {
        val temp = y
        y = x % y
        x = temp
    }
    return x
}
"""
    assertBoundaryIntegrityRe(chunk("kotlin", code, 300), Seq(
      ("fibonacci", "fun fibonacci(", """return b\n\}""".r),
      ("isPalindrome", "fun isPalindrome(",
        """return cleaned == cleaned\.reversed\(\)\n\}""".r),
      ("gcd", "fun gcd(", """return x\n\}""".r)))
  }

  // ─── Ruby ───────────────────────────────────────────────────────────

  test("RB: method definitions stay intact") {
    val code = """
def binary_search(arr, target)
  low = 0
  high = arr.length - 1
  while low <= high
    mid = (low + high) / 2
    if arr[mid] == target
      return mid
    elsif arr[mid] < target
      low = mid + 1
    else
      high = mid - 1
    end
  end
  -1
end

def quick_sort(arr)
  return arr if arr.length <= 1
  pivot = arr[0]
  left = arr[1..].select { |x| x <= pivot }
  right = arr[1..].select { |x| x > pivot }
  quick_sort(left) + [pivot] + quick_sort(right)
end
"""
    assertBoundaryIntegrityRe(chunk("ruby", code, 400), Seq(
      ("binary_search", "def binary_search(", """-1\nend""".r),
      ("quick_sort", "def quick_sort(", """quick_sort\(right\)\nend""".r)))
  }

  test("RB: class methods stay intact when the class is split") {
    val code = """
class LinkedList
  def initialize
    @head = nil
    @size = 0
  end

  def push(value)
    node = Node.new(value, @head)
    @head = node
    @size += 1
    self
  end

  def pop
    raise "empty list" if @head.nil?
    value = @head.value
    @head = @head.next
    @size -= 1
    value
  end

  def length
    @size
  end
end
"""
    assertBoundaryIntegrityRe(chunk("ruby", code, 200), Seq(
      ("initialize", "def initialize", """@size = 0\n  end""".r),
      ("push", "def push(value)", """self\n  end""".r),
      ("pop", "def pop", """value\n  end""".r)))
  }

  // ─── C ──────────────────────────────────────────────────────────────

  test("C: function definitions stay intact") {
    val code = """
#include <stdio.h>

int factorial(int n) {
    if (n <= 1) return 1;
    int result = 1;
    for (int i = 2; i <= n; i++) {
        result *= i;
    }
    return result;
}

void swap(int *a, int *b) {
    int temp = *a;
    *a = *b;
    *b = temp;
}

int main() {
    printf("%d\n", factorial(5));
    int x = 3, y = 7;
    swap(&x, &y);
    printf("%d %d\n", x, y);
    return 0;
}
"""
    assertBoundaryIntegrityRe(chunk("c", code, 250), Seq(
      ("factorial", "int factorial(int n) {", """return result;\n\}""".r),
      ("swap", "void swap(int *a, int *b) {", """\*b = temp;\n\}""".r),
      ("main", "int main() {", """return 0;\n\}""".r)))
  }

  // ─── JSON / CSS ─────────────────────────────────────────────────────

  test("JSON objects chunk without loss") {
    val code =
      "{\n  \"name\": \"test\",\n  \"version\": \"1.0\",\n  \"dependencies\": {\n    \"a\": \"1.0\",\n    \"b\": \"2.0\"\n  }\n}"
    val chunks = chunk("json", code, 100)
    assert(chunks.nonEmpty)
    assert(chunks.mkString("\n").contains("\"dependencies\""))
  }

  test("CSS rules chunk without loss") {
    val code = """
body { margin: 0; padding: 0; }
.container { max-width: 1200px; margin: 0 auto; }
h1 { font-size: 2em; color: #333; }
"""
    val chunks = chunk("css", code, 100)
    assert(chunks.nonEmpty)
    assert(chunks.mkString("\n").contains(".container"))
  }

  // ─── Lexical robustness (strings/comments can't derail spans) ───────

  test("braces inside strings and comments do not affect statement spans") {
    val code = """
function a() {
    const s = "not a brace: } {";
    // stray } in comment
    return s;
}

function b() {
    const t = `template ${x} with } brace`;
    /* block } comment */
    return t;
}
"""
    assertBoundaryIntegrity(chunk("typescript", code, 120), Seq(
      ("a", "function a()", "return s;\n}"),
      ("b", "function b()", "return t;\n}")))
  }

  test("python strings with colons and hashes do not derail the parser") {
    val code = """
def f():
    s = "text with # not a comment and : colon"
    return s

def g():
    t = '''triple
    with : and # inside'''
    return t
"""
    assertBoundaryIntegrity(chunk("python", code, 80), Seq(
      ("f", "def f()", "return s"),
      ("g", "def g()", "return t")))
  }

  // ─── multi-line string constructs span one statement (tree-sitter
  //     parity for the constructs the round-7 audit flagged) ──────────

  private def topSpans(lang: String, code: String): Seq[String] = {
    val tree = CodeParsers.parse(lang, code).getOrElse(fail(s"no $lang"))
    tree.children.map(c => code.substring(c.start, c.end))
  }

  test("TS: regex literals with unbalanced brackets/braces are masked") {
    // the two real-world span-swallowers the drift gauge caught in the
    // reference corpus: an unmatched `[` and a net-extra `}` inside
    // regex literals corrupted bracket depth for tens of KB
    val code = """const ts = /\[\d{4}-\d{2}-\d{2}T/;
const fix = s.replace(/\$\{([^}]+)\}/g, sub);
function after() {
    return 1;
}
done();
"""
    val spans = topSpans("typescript", code)
    assert(spans.length == 4, s"regex derailed spans: $spans")
    assert(spans(2).startsWith("function after"), spans(2))
    assert(spans(3) == "done();")
  }

  test("TS: division is never mis-lexed as a regex") {
    val code = """const x = (a + b) / 2;
const y = n / m / k;
const z = arr[0] / len;
after();
"""
    val spans = topSpans("typescript", code)
    assert(spans.length == 4, s"division mis-lexed: $spans")
    assert(spans(3) == "after();")
  }

  test("TS: regex after an arrow (=>) is masked; postfix ++ / is division") {
    // arrow case: `>` precedes the slash but the token is `=>`, so the
    // regex (with its unbalanced `[`) must be masked or it derails
    // bracket depth — the exact failure mode the regex lexer fixed
    val arrow = """const hits = xs.filter(s => /\[/.test(s));
function after() {
    return 1;
}
done();
"""
    val spans1 = topSpans("typescript", arrow)
    assert(spans1.length == 3, s"arrow regex derailed spans: $spans1")
    assert(spans1(1).startsWith("function after"), spans1(1))
    // postfix case: `i++ / n / 2` is division twice, not a phantom
    // regex literal `/ n /` (binary `+` keeps its trigger: `a + /x/`)
    val postfix = """const r = i++ / n / 2;
const s = j-- / m;
const t = a + /x]/.test(b);
after();
"""
    val spans2 = topSpans("typescript", postfix)
    assert(spans2.length == 4, s"postfix ++ mis-lexed: $spans2")
    assert(spans2(3) == "after();")
    // unary-chain edge: the sign is doubled but does NOT follow an
    // operand, so `+ +/re/` keeps its regex trigger — the unbalanced
    // `[` inside would derail bracket depth if lexed as division
    val unary = """const u = f(+ +/\[/.test(b));
const v = w[0]++ / len;
after();
"""
    val spans3 = topSpans("typescript", unary)
    assert(spans3.length == 3, s"unary-chain regex mis-lexed: $spans3")
    assert(spans3(2) == "after();")
  }

  test("TS: regex after return/operators; slash in char class doesn't end it") {
    val code = """function f(s) {
    if (bad) return /a\/b[/]c/.test(s);
    return s.match(/x{2,}/g);
}
g();
"""
    val spans = topSpans("typescript", code)
    assert(spans.length == 2, s"got: $spans")
    assert(spans(1) == "g();")
  }

  test("TS: nested template literals with interpolated braces are one statement") {
    val code = """const q = `select ${cols.map(c => `"${c.name}"`).join(', ')}
from ${tbl}
where x = ${foo({limit: 10})}`;
function after() {
    return 1;
}
"""
    val spans = topSpans("typescript", code)
    assert(spans.length == 2, s"want 2 statements, got:\n${spans.mkString("<<<\n", "\n>>>\n<<<\n", "\n>>>")}")
    assert(spans.head.contains("where x =") && spans.head.endsWith("`;"),
      s"template literal split: ${spans.head}")
    assert(spans(1).startsWith("function after"))
    // and the chunker never separates the template's opening from its end
    assertBoundaryIntegrity(chunk("typescript", code, 90), Seq(
      ("template", "const q = `select", "`;"),
      ("after", "function after()", "return 1;\n}")))
  }

  test("TS: stray closing brace inside a multi-line template does not close a suite") {
    val code = """class C {
    render() {
        return `multi
} not a closer
line3`;
    }
    other() { return 2; }
}
"""
    val spans = topSpans("typescript", code)
    assert(spans.length == 1, s"class must be one statement: $spans")
    assertBoundaryIntegrity(chunk("typescript", code, 60), Seq(
      ("render", "render() {", "line3`;"),
      ("other", "other() {", "return 2; }")))
  }

  test("RB: heredoc bodies with keyword-looking lines stay inside the statement") {
    val code = """def build
  sql = <<~SQL
    SELECT *
    end
    def fake
  SQL
  run(sql)
end

def other
  x = 1
end
"""
    val spans = topSpans("ruby", code)
    assert(spans.length == 2,
      s"want 2 defs, got:\n${spans.mkString("<<<\n", "\n>>>\n<<<\n", "\n>>>")}")
    assert(spans.head.contains("run(sql)"),
      s"heredoc swallowed the rest of build: ${spans.head}")
    assert(spans(1).startsWith("def other"))
    // the def..end suite still decomposes: header, heredoc stmt, run, end
    val build = CodeParsers.parse("ruby", code).get.children.head
    val kids = build.children.map(c => code.substring(c.start, c.end))
    assert(kids.exists(k => k.startsWith("sql = <<~SQL") && k.endsWith("SQL")),
      s"heredoc assignment not one child: $kids")
  }

  test("RB: plain and quoted heredocs; << append operator unaffected") {
    val code = """names = <<'LIST'
a << b
LIST
acc << compute(1)
total = acc.size
"""
    val spans = topSpans("ruby", code)
    assert(spans.length == 3, s"got: $spans")
    assert(spans.head.endsWith("LIST"))
    assert(spans(1) == "acc << compute(1)")
  }

  test("RB: <<CONST append of an uppercase constant is not a heredoc") {
    // `arr <<DEFAULTS` / `x<<WIDTH` look like heredoc openers but no
    // terminator line ever appears — a phantom heredoc would mask the
    // rest of the file and collapse everything into one span
    val code = """arr <<DEFAULTS
x = y<<WIDTH
run(x)
stop
"""
    val spans = topSpans("ruby", code)
    assert(spans.length == 4, s"phantom heredoc swallowed spans: $spans")
    assert(spans(2) == "run(x)")
    // ...while a REAL heredoc whose terminator exists still masks
    val real = """body = <<TEXT
interior <<NOTHEREDOC line
TEXT
after = 1
"""
    val realSpans = topSpans("ruby", real)
    assert(realSpans.length == 2, s"got: $realSpans")
    assert(realSpans.head.endsWith("TEXT"))
    assert(realSpans(1) == "after = 1")
  }

  test("TSX: JSX trees inside a parenthesized return stay one statement") {
    // angle brackets are not brackets; the enclosing ( ) is what holds
    // the multi-line JSX together — exactly how tree-sitter's
    // jsx_element sits inside a parenthesized_expression
    val code = """function App() {
    return (
        <div className={styles.app}>
            <Header title={`hi ${user.name}`} />
            <ul>{items.map(i => <li key={i.id}>{i.text}</li>)}</ul>
        </div>
    );
}
const after = 1;
"""
    val spans = topSpans("typescript", code)
    assert(spans.length == 2, s"JSX leaked statements: $spans")
    assert(spans.head.contains("</div>") && spans.head.endsWith("}"),
      s"App split: ${spans.head}")
    assert(spans(1) == "const after = 1;")
    // the multi-line JSX return is one leaf: any chunk containing its
    // opening must contain its close (the function suite itself may
    // split header/body/closer, which is correct)
    assertBoundaryIntegrity(chunk("typescript", code, 120), Seq(
      ("jsx", "return (", ");"),
      ("after", "const after", "= 1;")))
  }

  test("PY: parameterized decorators on classes attach to the definition") {
    val code = """@register(name="x", scope=[1, 2])
@cache
class Handler:
    def run(self):
        return 1

@plain
def free():
    return 2
"""
    val spans = topSpans("python", code)
    assert(spans.length == 2, s"want 2 decorated defs: $spans")
    assert(spans.head.startsWith("@register") &&
      spans.head.contains("class Handler"),
      s"decorators detached: ${spans.head}")
    assert(spans(1).startsWith("@plain") && spans(1).contains("def free"))
  }

  test("PY: module-level triple-quoted string with hashes and brackets is one statement") {
    val code = """MOD = '''doc with # hash
and ] unbalanced [ brackets
second line at column zero'''
def h():
    return MOD
"""
    val spans = topSpans("python", code)
    assert(spans.length == 2,
      s"want 2 statements, got:\n${spans.mkString("<<<\n", "\n>>>\n<<<\n", "\n>>>")}")
    assert(spans.head.contains("brackets") && spans.head.endsWith("'''"))
    assert(spans(1).startsWith("def h()"))
  }
}
