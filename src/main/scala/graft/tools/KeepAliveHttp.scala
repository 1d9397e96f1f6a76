package graft.tools

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/** Minimal persistent-connection HTTP/1.1 POST client for loopback
  * benchmarking: one socket, keep-alive, TCP_NODELAY, blocking reads.
  * It measures the SERVER plus kernel round-trip — a synchronous
  * `java.net.http.HttpClient.send` routes through the client's async
  * executor machinery and adds most of a millisecond per call on this
  * box, swamping a sub-ms handler in the p50.
  *
  * Deliberately NOT a general client: no redirects, no TLS, ASCII
  * headers, Content-Length or chunked framing required — exactly what
  * [[graft.server.RestServer]] (and a JDK HttpServer empty-body
  * response) emits on loopback.
  */
final class KeepAliveHttp(host: String, port: Int) extends AutoCloseable {
  private val socket = new Socket()
  socket.setTcpNoDelay(true)
  socket.connect(new InetSocketAddress(host, port))
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val in = new BufferedInputStream(socket.getInputStream)

  /** POST `body` to `path`; returns the response body. Handles
    * Content-Length and chunked transfer encoding (JDK HttpServer
    * switches to chunked when a handler answers
    * `sendResponseHeaders(status, 0)` — an empty-body route must
    * surface its status, not a client parse error; ADVICE r6). Throws
    * on a response with neither framing or a mid-body disconnect. */
  def post(path: String, body: String): String = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    out.write((s"POST $path HTTP/1.1\r\nHost: $host:$port\r\n" +
      s"Content-Type: application/json\r\nContent-Length: ${b.length}\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII))
    out.write(b)
    out.flush()
    val status = readLine()
    var contentLength = -1
    var chunked = false
    var line = readLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0) {
        val name = line.substring(0, i)
        val value = line.substring(i + 1).trim
        if (name.equalsIgnoreCase("content-length")) contentLength = value.toInt
        else if (name.equalsIgnoreCase("transfer-encoding") &&
          value.equalsIgnoreCase("chunked")) chunked = true
      }
      line = readLine()
    }
    if (chunked) {
      val sb = new java.lang.StringBuilder(256)
      var sz = Integer.parseInt(readLine().trim, 16)
      while (sz > 0) {
        sb.append(new String(readN(sz), StandardCharsets.UTF_8))
        readLine() // chunk-terminating CRLF
        sz = Integer.parseInt(readLine().trim, 16)
      }
      readLine() // terminal CRLF after the 0-chunk
      sb.toString
    } else {
      require(contentLength >= 0,
        s"response with neither Content-Length nor chunked framing: $status")
      new String(readN(contentLength), StandardCharsets.UTF_8)
    }
  }

  private def readN(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      require(r > 0, "connection closed mid-body")
      off += r
    }
    buf
  }

  private def readLine(): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    while (c != -1 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  override def close(): Unit = socket.close()
}
