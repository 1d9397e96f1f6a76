package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

class WarcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def rec(t: String, uri: String, payload: String,
                  extra: Seq[(String, String)] = Nil): Array[Byte] =
    Warc.record(t,
      (if (uri.nonEmpty) Seq("WARC-Target-URI" -> uri) else Nil) ++ extra,
      payload.getBytes(UTF_8))

  test("gzip-member round trip: concatenated members parse as one record stream") {
    val bytes = Warc.gzipMember(rec("warcinfo", "", "software: x\r\n")) ++
      Warc.gzipMember(rec("request", "https://e/1", "GET /1 HTTP/1.1\r\n\r\n")) ++
      Warc.gzipMember(rec("response", "https://e/1", "HTTP/1.1 200 OK\r\n\r\nhello"))
    val rs = Warc.parseAll(Warc.maybeGunzip(bytes))
    assert(rs.map(_.warcType) === Vector("warcinfo", "request", "response"))
    assert(rs(2).targetUri === "https://e/1")
    assert(new String(rs(2).payload, UTF_8) === "HTTP/1.1 200 OK\r\n\r\nhello")
  }

  test("plain (non-gzip) streams parse identically") {
    val plain = rec("response", "https://e/2", "HTTP/1.1 200 OK\r\n\r\nbody") ++
      rec("response", "https://e/3", "HTTP/1.1 404 Not Found\r\n\r\n")
    val rs = Warc.parseAll(Warc.maybeGunzip(plain))
    assert(rs.map(_.targetUri) === Vector("https://e/2", "https://e/3"))
  }

  test("Content-Length frames BYTES: a multibyte payload does not desync the stream") {
    // '§' is 2 UTF-8 bytes; if the writer or parser counted chars the
    // second record's magic would land mid-payload and be lost
    val bytes = rec("response", "https://e/a", "HTTP/1.1 200 OK\r\n\r\n§§§ WARC/1.0 decoy") ++
      rec("response", "https://e/b", "HTTP/1.1 200 OK\r\n\r\nok")
    val rs = Warc.parseAll(bytes)
    assert(rs.map(_.targetUri) === Vector("https://e/a", "https://e/b"))
    assert(new String(rs(0).payload, UTF_8).endsWith("§§§ WARC/1.0 decoy"))
  }

  test("header folding and case-insensitive names") {
    val raw = ("WARC/1.0\r\n" +
      "warc-TYPE: response\r\n" +
      "WARC-Target-URI: <https://e/f>\r\n" +
      "WARC-Concurrent-To: <urn:uuid:\r\n abc>\r\n" +
      "CONTENT-length: 4\r\n\r\n" +
      "data\r\n\r\n").getBytes(UTF_8)
    val rs = Warc.parseAll(raw)
    assert(rs.size === 1)
    assert(rs.head.warcType === "response")
    assert(rs.head.targetUri === "https://e/f") // angle quotes stripped
    assert(rs.head.headers("warc-concurrent-to") === "<urn:uuid: abc>")
    assert(new String(rs.head.payload, UTF_8) === "data")
  }

  test("damaged shards: garbage prefix skipped, truncated tail and bad lengths dropped cleanly") {
    val good = rec("response", "https://e/ok", "HTTP/1.1 200 OK\r\n\r\nfine")
    val badLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: nonsense\r\n\r\npayload\r\n\r\n").getBytes(UTF_8)
    val truncated = rec("response", "https://e/cut",
      "HTTP/1.1 200 OK\r\n\r\n0123456789").dropRight(8)
    val bytes = "garbage bytes before the first record ".getBytes(UTF_8) ++
      badLen ++ good ++ truncated
    val rs = Warc.parseAll(bytes)
    assert(rs.map(_.targetUri) === Vector("https://e/ok"))
  }

  test("httpSplit: status, headers, body under CRLF and bare-LF separators") {
    val crlf = Warc.httpSplit(
      "HTTP/1.1 301 Moved\r\nLocation: /x\r\nContent-Type: text/html\r\n\r\n<p>b</p>".getBytes(UTF_8))
    assert(crlf.status === 301)
    assert(crlf.headers("location") === "/x")
    assert(new String(crlf.body, UTF_8) === "<p>b</p>")
    val lf = Warc.httpSplit("HTTP/1.1 200 OK\nX: y\n\nbody".getBytes(UTF_8))
    assert(lf.status === 200)
    assert(new String(lf.body, UTF_8) === "body")
    assert(Warc.httpSplit("not http at all".getBytes(UTF_8)).status === 0)
  }

  test("synthesizeFiles is partitioning-invariant and extractResponses round-trips the corpus") {
    val docs = Seq.tabulate(7)(i => (i.toLong, s"doc §$i text body")) // spans 2 files at 5/file
    val a = Warc.synthesizeFiles(docs.toDS(), 5, (_, t) => "B: " + t)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val b = Warc.synthesizeFiles(docs.toDS().repartition(4), 5, (_, t) => "B: " + t)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(a.map(_._1).toSeq === Seq(0L, 1L))
    assert(a.zip(b).forall { case ((_, x), (_, y)) => java.util.Arrays.equals(x, y) })

    val out = Warc.extractResponses(
        Warc.synthesizeFiles(docs.toDS(), 5, (_, t) => "B: " + t), "content")
      .select($"url", $"http_status", $"body")
      .as[(String, Int, String)].collect().sortBy(_._1)
    assert(out.length === 7) // warcinfo + request records skipped
    assert(out.forall(_._2 === 200))
    docs.foreach { case (id, t) =>
      assert(out.contains((s"https://corpus.example/doc/$id", 200, "B: " + t)))
    }
  }
}
