package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** The WARC record walk against spec-conforming framing: version
  * lines, Content-Length block delimiting, HTTP status/header split
  * inside response records, transparent (multi-member) gunzip, and
  * the never-guess behavior on broken framing. */
class WarcSpec extends AnyFunSuite {

  private def iso(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("encode/parse round-trip: records, HTTP split, bodies") {
    val html = "<html><body>hello { } body</body></html>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
    val warc = Warc.warcEncode(Seq(
      ("warcinfo", "", iso("software: test\r\n")),
      ("response", "https://x.example/a", iso(http)),
      ("request", "https://x.example/a", iso("GET /a HTTP/1.1\r\n"))))
    val rs = Warc.parseWarc(warc)
    assert(rs.length == 3)
    assert(rs(0).warcType == "warcinfo" && rs(0).httpStatus == -1)
    assert(new String(rs(0).body, "ISO-8859-1") == "software: test\r\n")
    assert(rs(1).warcType == "response" &&
      rs(1).targetUri == "https://x.example/a" &&
      rs(1).httpStatus == 200 &&
      rs(1).httpContentType == "text/html" &&
      new String(rs(1).body, "ISO-8859-1") == html)
    assert(rs(2).warcType == "request" && rs(2).httpStatus == -1)
  }

  test("gzip is transparent, including Common Crawl's one-member-per-" +
      "record concatenation") {
    val mk = (n: Int) => Warc.warcEncode(Seq(("response", s"https://x/$n",
      iso(s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody$n"))))
    // whole-file single member
    val one = Warc.parseWarc(Warc.gzip(mk(1)))
    assert(one.length == 1 && new String(one(0).body, "UTF-8") == "body1")
    // concatenated members, one per record
    val multi = Warc.parseWarc(Warc.gzip(mk(1)) ++ Warc.gzip(mk(2)))
    assert(multi.length == 2)
    assert(new String(multi(0).body, "UTF-8") == "body1")
    assert(new String(multi(1).body, "UTF-8") == "body2")
  }

  test("broken framing never guesses: bad magic, short block, bad " +
      "content-length all end the walk cleanly") {
    assert(Warc.parseWarc(iso("HTTP/1.1 200 OK\r\n\r\n")).isEmpty)
    val good = Warc.warcEncode(Seq(("response", "https://x/1",
      iso("HTTP/1.1 200 OK\r\n\r\nabc"))))
    assert(Warc.parseWarc(good).length == 1)
    // truncating into the block drops the record, parses nothing past
    assert(Warc.parseWarc(good.take(good.length - 10)).isEmpty)
    // a corrupt Content-Length ends the walk instead of mis-framing
    val bad = iso(new String(good, "ISO-8859-1")
      .replace("Content-Length: ", "Content-Length: x"))
    assert(Warc.parseWarc(bad).isEmpty)
    // corrupt gzip declines
    val gz = Warc.gzip(good)
    gz(gz.length / 2) = (gz(gz.length / 2) ^ 0x55).toByte
    assert(Warc.parseWarc(gz).isEmpty ||
      Warc.parseWarc(gz).forall(_.warcType.nonEmpty))
  }

  test("fixtureWarc: 404 route, gzip parity, and the checksum the " +
      "oracle replays") {
    val r13 = Warc.parseWarc(Warc.fixtureWarc(13)) // 404, odd -> gzip
    assert(r13.length == 2 && r13(1).httpStatus == 404 &&
      new String(r13(1).body, "UTF-8") == "Not Found")
    val r2 = Warc.parseWarc(Warc.fixtureWarc(2)) // 200, even -> plain
    assert(r2.length == 2 && r2(1).httpStatus == 200)
    val body = new String(r2(1).body, "UTF-8")
    assert(body == "<html><body><h1>Doc 2</h1><p>" + ("ab" * 7) +
      "</p></body></html>")
    // gzip/plain parity: same ids decode to identical records
    assert(Warc.parseWarc(Warc.gzip(Warc.fixtureWarc(2)))
      .map(r => new String(r.body, "UTF-8")) ==
      r2.map(r => new String(r.body, "UTF-8")))
  }
}
