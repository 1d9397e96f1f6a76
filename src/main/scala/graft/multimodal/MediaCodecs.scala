package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real, dependency-free decoders for the UNCOMPRESSED media formats a
  * JVM can parse from raw bytes: RIFF/WAVE PCM audio and binary netpbm
  * (P5 grayscale / P6 RGB) images. These replace [[Multimodal.StubDecoder]]
  * for payloads whose magic bytes match; compressed codecs (JPEG, MP3,
  * H.264, …) still need a JNI/PandasUDF slot — the container has none —
  * and fall through to the stub.
  *
  * Everything here is driver/executor-agnostic pure byte math: decoders
  * run inside `mapPartitions` batches ([[Multimodal.decodeMedia]]), so
  * the operator shape is identical whether the frame decoder is this
  * object, a codec JNI call, or a Pandas UDF.
  *
  * Reference has no media support at all (SURVEY §2 gap-fill for the
  * training-data pipeline); formats per their public specs:
  * WAVE — RIFF chunks, `fmt ` (PCM format 1 / IEEE-float 3), `data`;
  * netpbm — `P5`/`P6` magic, ASCII header (whitespace + `#` comments),
  * maxval ≤ 255 binary raster.
  */
object MediaCodecs extends Serializable {

  /** Decoded audio facts: container-level metadata plus the two
    * amplitude statistics every audio-quality gate starts from (RMS /
    * peak over normalized [-1, 1] samples, all channels interleaved). */
  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nFrames: Long, durationMs: Double, rms: Double, peak: Double)

  /** Decoded image facts: dimensions, channel count, mean luma (BT.601
    * on RGB, identity on grayscale) over [0, 255]. */
  final case class ImageInfo(width: Int, height: Int, channels: Int, meanLuma: Double)

  /** `RIFF....WAVE` sniff (the 4-byte size field between the two tags
    * is payload-dependent, so match around it). */
  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** `P5`/`P6` + whitespace sniff. */
  def isNetpbm(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 3 && bytes(0) == 'P' &&
      (bytes(1) == '5' || bytes(1) == '6') && Character.isWhitespace(bytes(2) & 0xff)

  /** Parse a PCM (format 1, 8/16/24/32-bit int) or IEEE-float
    * (format 3, 32-bit) WAV; `None` on anything malformed or any other
    * codec id — a truncated or exotic payload must route to the stub,
    * never crash the batch. */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (!isWav(bytes)) return None
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12 // past RIFF header
      var fmtCode = -1; var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      // chunk walk: 8-byte headers, word-aligned payloads
      while (pos + 8 <= bytes.length && (dataOff < 0 || fmtCode < 0)) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val sz = buf.getInt(pos + 4)
        if (sz < 0 || pos + 8 + sz > bytes.length) return None
        id match {
          case "fmt " if sz >= 16 =>
            fmtCode = buf.getShort(pos + 8) & 0xffff
            channels = buf.getShort(pos + 10) & 0xffff
            sampleRate = buf.getInt(pos + 12)
            bits = buf.getShort(pos + 22) & 0xffff
          case "data" =>
            dataOff = pos + 8; dataLen = sz
          case _ => ()
        }
        pos += 8 + sz + (sz & 1)
      }
      if (fmtCode != 1 && fmtCode != 3) return None
      if (channels <= 0 || sampleRate <= 0 || dataOff < 0) return None
      if (fmtCode == 3 && bits != 32) return None
      if (fmtCode == 1 && bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
      val bytesPerSample = bits / 8
      val nSamples = dataLen / bytesPerSample
      val nFrames = nSamples / channels
      var sumSq = 0.0; var peak = 0.0
      var i = 0
      while (i < nSamples) {
        val off = dataOff + i * bytesPerSample
        // normalize each encoding to [-1, 1]
        val s: Double = (fmtCode, bits) match {
          case (3, 32) => buf.getFloat(off).toDouble
          case (1, 8) => ((bytes(off) & 0xff) - 128) / 128.0 // 8-bit WAV is unsigned
          case (1, 16) => buf.getShort(off) / 32768.0
          case (1, 24) =>
            val v = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) | (bytes(off + 2) << 16)
            v / 8388608.0
          case _ => buf.getInt(off) / 2147483648.0
        }
        sumSq += s * s
        val a = math.abs(s); if (a > peak) peak = a
        i += 1
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
      Some(WavInfo(sampleRate, channels, bits, nFrames,
        nFrames * 1000.0 / sampleRate, rms, peak))
    } catch { case _: Exception => None }
  }

  /** Encode mono 8-bit PCM bytes (unsigned, center 128) as a canonical
    * 44-byte-header WAV — the synthesis half of [[decodeWav]], used to
    * materialize real decodable audio from arbitrary byte streams
    * (deterministic test media, fuzz corpora). */
  def encodeWavPcm8(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val buf = ByteBuffer.allocate(44 + samples.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + samples.length)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1.toShort) // PCM
    buf.putShort(1.toShort) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate) // byte rate = rate * channels * bytesPerSample
    buf.putShort(1.toShort) // block align
    buf.putShort(8.toShort)
    buf.put("data".getBytes("US-ASCII")); buf.putInt(samples.length)
    buf.put(samples)
    buf.array()
  }

  /** Netpbm header scanner: next ASCII token past whitespace and `#`
    * comment lines; returns (value, nextPos) or null at EOF/overrun. */
  private def pbmToken(bytes: Array[Byte], from: Int): (Int, Int) = {
    var p = from
    while (p < bytes.length) {
      val c = bytes(p) & 0xff
      if (c == '#') { while (p < bytes.length && bytes(p) != '\n') p += 1 }
      else if (Character.isWhitespace(c)) p += 1
      else {
        var v = 0; var any = false
        while (p < bytes.length && (bytes(p) & 0xff) >= '0' && (bytes(p) & 0xff) <= '9') {
          v = v * 10 + (bytes(p) - '0'); p += 1; any = true
          if (v > 1000000000) return null
        }
        return if (any) (v, p) else null
      }
    }
    null
  }

  /** Decode binary netpbm into `(info, raster)` — raster is row-major
    * interleaved bytes (1 B/channel, maxval ≤ 255 only; 16-bit rasters
    * and malformed headers return `None`). */
  def decodeNetpbm(bytes: Array[Byte]): Option[(ImageInfo, Array[Byte])] = {
    if (!isNetpbm(bytes)) return None
    try {
      val channels = if (bytes(1) == '6') 3 else 1
      var t = pbmToken(bytes, 2); if (t == null) return None
      val width = t._1
      t = pbmToken(bytes, t._2); if (t == null) return None
      val height = t._1
      t = pbmToken(bytes, t._2); if (t == null) return None
      val maxval = t._1
      if (width <= 0 || height <= 0 || maxval <= 0 || maxval > 255) return None
      // exactly ONE whitespace byte separates header from raster
      val rasterOff = t._2 + 1
      val n = width.toLong * height * channels
      if (n > Int.MaxValue || rasterOff + n > bytes.length) return None
      val raster = java.util.Arrays.copyOfRange(bytes, rasterOff, rasterOff + n.toInt)
      var luma = 0.0
      var i = 0
      if (channels == 3) {
        while (i < raster.length) {
          luma += 0.299 * (raster(i) & 0xff) + 0.587 * (raster(i + 1) & 0xff) +
            0.114 * (raster(i + 2) & 0xff)
          i += 3
        }
      } else {
        while (i < raster.length) { luma += (raster(i) & 0xff); i += 1 }
      }
      val px = width.toLong * height
      Some((ImageInfo(width, height, channels, if (px == 0) 0.0 else luma / px), raster))
    } catch { case _: Exception => None }
  }

  /** Nearest-neighbor resize of an interleaved raster — the real
    * implementation of the resize slot for decodable images. Output is
    * a well-formed binary netpbm of the same subformat (so resized
    * payloads round-trip through [[decodeNetpbm]]). */
  def resizeNetpbm(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    require(newW > 0 && newH > 0, "target dimensions must be positive")
    decodeNetpbm(bytes).map { case (info, raster) =>
      val ch = info.channels
      val out = new Array[Byte](newW * newH * ch)
      var y = 0
      while (y < newH) {
        val sy = (y.toLong * info.height / newH).toInt
        var x = 0
        while (x < newW) {
          val sx = (x.toLong * info.width / newW).toInt
          val src = (sy * info.width + sx) * ch
          val dst = (y * newW + x) * ch
          var c = 0
          while (c < ch) { out(dst + c) = raster(src + c); c += 1 }
          x += 1
        }
        y += 1
      }
      val magic = if (ch == 3) "P6" else "P5"
      val header = s"$magic\n$newW $newH\n255\n".getBytes("US-ASCII")
      val payload = new Array[Byte](header.length + out.length)
      System.arraycopy(header, 0, payload, 0, header.length)
      System.arraycopy(out, 0, payload, header.length, out.length)
      payload
    }
  }
}
