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
  * Deliberately NOT a general client: no chunked responses, no
  * redirects, no TLS, ASCII headers, Content-Length required — exactly
  * what [[graft.server.RestServer]] emits on loopback.
  */
final class KeepAliveHttp(host: String, port: Int) extends AutoCloseable {
  private val socket = new Socket()
  socket.setTcpNoDelay(true)
  socket.connect(new InetSocketAddress(host, port))
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val in = new BufferedInputStream(socket.getInputStream)

  /** POST `body` to `path`; returns the response body. Throws on a
    * missing Content-Length or a mid-body disconnect. */
  def post(path: String, body: String): String = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    out.write((s"POST $path HTTP/1.1\r\nHost: $host:$port\r\n" +
      s"Content-Type: application/json\r\nContent-Length: ${b.length}\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII))
    out.write(b)
    out.flush()
    val status = readLine()
    var contentLength = -1
    var line = readLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).equalsIgnoreCase("content-length"))
        contentLength = line.substring(i + 1).trim.toInt
      line = readLine()
    }
    require(contentLength >= 0, s"response without Content-Length: $status")
    val buf = new Array[Byte](contentLength)
    var off = 0
    while (off < contentLength) {
      val n = in.read(buf, off, contentLength - off)
      require(n > 0, "connection closed mid-body")
      off += n
    }
    new String(buf, StandardCharsets.UTF_8)
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
