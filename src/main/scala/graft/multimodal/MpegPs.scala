package graft.multimodal

/** MPEG-1 SYSTEM stream (ISO/IEC 11172-1 "program stream" — the
  * classic `.mpg` container) demultiplexer + synthesizer. Walks the
  * pack and packet layer and reassembles PES payloads per elementary
  * stream family, tying the two from-scratch sample decoders
  * together: video packets (stream ids 0xE0–0xEF) feed [[Mpeg1]],
  * audio packets (0xC0–0xDF) feed [[Mp2]]. The reference engine has
  * no media handling (`/root/reference/src/index.js:1`), so this is
  * beyond-reference surface like the rest of the multimodal family.
  *
  * Scope (strict — anything outside returns `None`):
  *  - MPEG-1 system syntax only: pack headers with the '0010' marker
  *    nibble (8 bytes; MPEG-2's '01' pack layout is rejected),
  *    optional system headers (skipped by their transmitted length),
  *    the MPEG-1 packet header forms — stuffing 0xFF bytes, the
  *    optional '01' STD-buffer field, and '0010'+PTS / '0011'+PTS+DTS
  *    / 0x0F no-timestamp flags;
  *  - packets of all stream families: video and MPEG audio payloads
  *    are reassembled in arrival order (interleaving is transparent),
  *    padding (0xBE) and private (0xBD/0xBF) payloads are skipped;
  *  - an ISO 11172 end code (0xB9) terminates the walk; a stream
  *    that simply ends at a packet boundary is also accepted.
  *
  * [[mux]] synthesizes conforming single-pack streams for specs and
  * oracle entries (interleaved video/audio chunks; one packet carries
  * a PTS and one leads with stuffing + STD so the demux exercises
  * every header form it claims to parse).
  */
object MpegPs {

  /** Pack start code sniff: 00 00 01 BA. */
  def isPs(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 1 &&
      (bytes(3) & 0xff) == 0xba

  /** Reassembled elementary streams (empty array = family absent). */
  final case class Demuxed(video: Array[Byte], audio: Array[Byte])

  /** Demultiplex an MPEG-1 program stream. `None` on anything
    * outside the documented scope or any syntax error. */
  def demux(bytes: Array[Byte]): Option[Demuxed] = {
    if (!isPs(bytes)) return None
    try {
      val video = new java.io.ByteArrayOutputStream()
      val audio = new java.io.ByteArrayOutputStream()
      def u8(p: Int): Int = bytes(p) & 0xff
      var i = 0
      var done = false
      while (!done && i < bytes.length) {
        if (i + 4 > bytes.length ||
            bytes(i) != 0 || bytes(i + 1) != 0 || bytes(i + 2) != 1)
          throw new IllegalStateException("expected start code")
        val code = u8(i + 3)
        if (code == 0xba) { // pack header (MPEG-1: '0010' nibble, 8 bytes)
          if (i + 12 > bytes.length || (u8(i + 4) >> 4) != 2)
            throw new IllegalStateException("bad pack header")
          i += 12
        } else if (code == 0xb9) { // ISO 11172 end code
          done = true
        } else if (code == 0xbb) { // system header: skip by length
          val len = (u8(i + 4) << 8) | u8(i + 5)
          i += 6 + len
        } else if (code >= 0xbc) { // packet
          val len = (u8(i + 4) << 8) | u8(i + 5)
          val end = i + 6 + len
          if (end > bytes.length) throw new IllegalStateException("truncated packet")
          var p = i + 6
          if (code != 0xbe && code != 0xbf) { // padding/private-2 skip headers
            while (p < end && u8(p) == 0xff) p += 1 // stuffing
            if (p >= end) throw new IllegalStateException("packet all stuffing")
            if ((u8(p) >> 6) == 1) p += 2 // STD buffer size field '01'
            if (p >= end) throw new IllegalStateException("packet header overruns")
            val flag = u8(p)
            if ((flag >> 4) == 2) p += 5 // '0010' + PTS
            else if ((flag >> 4) == 3) p += 10 // '0011' + PTS + DTS
            else if (flag == 0x0f) p += 1 // no timestamps
            else throw new IllegalStateException("bad packet header flags")
            if (p > end) throw new IllegalStateException("packet header overruns")
          } else p = end
          if (code >= 0xe0 && code <= 0xef) video.write(bytes, p, end - p)
          else if (code >= 0xc0 && code <= 0xdf) audio.write(bytes, p, end - p)
          i = end
        } else throw new IllegalStateException(f"unknown start code $code%02x")
      }
      Some(Demuxed(video.toByteArray, audio.toByteArray))
    } catch {
      case _: IllegalStateException | _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Synthesize a conforming single-pack MPEG-1 program stream:
    * pack header (SCR 0, mux_rate 1), a system header, then video
    * (0xE0) and audio (0xC0) payloads interleaved in `chunk`-byte
    * packets, end code. The first video packet carries a PTS and the
    * first audio packet leads with stuffing + an STD field, so a
    * round trip exercises every packet-header form [[demux]]
    * parses. */
  def mux(video: Array[Byte], audio: Array[Byte], chunk: Int = 512): Array[Byte] = {
    require(chunk > 0, "chunk must be positive")
    val out = new java.io.ByteArrayOutputStream()
    def startCode(c: Int): Unit = { out.write(0); out.write(0); out.write(1); out.write(c) }
    startCode(0xba) // pack: '0010'+SCR(33,=0)+markers, '1'+mux_rate(22,=1)+'1'
    Array(0x21, 0x00, 0x01, 0x00, 0x01, 0x80, 0x00, 0x03).foreach(out.write)
    startCode(0xbb) // system header: rate_bound 1, audio_bound 1, video_bound 1
    Array(0x00, 0x06, 0x80, 0x00, 0x03, 0x04, 0xe1, 0xff).foreach(out.write)
    def packet(id: Int, data: Array[Byte], off: Int, n: Int,
               header: Array[Int]): Unit = {
      startCode(id)
      val len = header.length + n
      out.write(len >> 8); out.write(len & 0xff)
      header.foreach(out.write)
      out.write(data, off, n)
    }
    val noTs = Array(0x0f)
    val withPts = Array(0x21, 0x00, 0x01, 0x00, 0x01) // '0010' + PTS 0 + markers
    val stuffedStd = Array(0xff, 0xff, 0x40, 0x20, 0x0f) // stuffing, STD, no-TS
    var vOff = 0; var aOff = 0; var first = true
    while (vOff < video.length || aOff < audio.length) {
      if (vOff < video.length) {
        val n = math.min(chunk, video.length - vOff)
        packet(0xe0, video, vOff, n, if (first) withPts else noTs)
        vOff += n
      }
      if (aOff < audio.length) {
        val n = math.min(chunk, audio.length - aOff)
        packet(0xc0, audio, aOff, n, if (first) stuffedStd else noTs)
        aOff += n
      }
      first = false
    }
    startCode(0xb9)
    out.toByteArray
  }
}
