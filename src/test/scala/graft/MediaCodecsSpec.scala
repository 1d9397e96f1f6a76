package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaCodecs, Multimodal}

/** Real (dependency-free) media decode: RIFF/WAVE PCM and binary netpbm
  * parsed from synthesized byte-exact payloads, plus the DataFrame
  * decode/resize operators' magic dispatch and stub fallback. */
class MediaCodecsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Minimal canonical WAV: RIFF header + fmt (PCM16) + data. */
  private def wavPcm16(sampleRate: Int, channels: Int, samples: Array[Short],
                       trailingChunk: Boolean = false): Array[Byte] = {
    val dataLen = samples.length * 2
    val extra = if (trailingChunk) 8 + 4 else 0
    val buf = ByteBuffer.allocate(44 + dataLen + extra).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen + extra); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1.toShort) // PCM
    buf.putShort(channels.toShort); buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort); buf.putShort(16.toShort)
    buf.put("data".getBytes); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    if (trailingChunk) { buf.put("LIST".getBytes); buf.putInt(4); buf.put("INFO".getBytes) }
    buf.array()
  }

  private def ppm(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
                  comment: Boolean = false): Array[Byte] = {
    val header = (if (comment) s"P6\n# a comment\n$w $h\n255\n" else s"P6\n$w $h\n255\n")
      .getBytes("US-ASCII")
    val raster = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val o = (y * w + x) * 3
      raster(o) = r.toByte; raster(o + 1) = g.toByte; raster(o + 2) = b.toByte
    }
    header ++ raster
  }

  test("decodeWav: PCM16 metadata, RMS/peak, chunk walk past trailing chunks") {
    // full-scale square wave: RMS = peak = 1.0 (up to 16-bit quantization)
    val square = Array.tabulate[Short](800)(i => if (i % 2 == 0) 32767 else -32768)
    val w = MediaCodecs.decodeWav(wavPcm16(8000, 2, square, trailingChunk = true)).get
    assert(w.sampleRate == 8000 && w.channels == 2 && w.bitsPerSample == 16)
    assert(w.nFrames == 400 && math.abs(w.durationMs - 50.0) < 1e-9)
    assert(w.peak == 1.0 && math.abs(w.rms - 1.0) < 1e-4)
    // silence has zero energy
    val s = MediaCodecs.decodeWav(wavPcm16(44100, 1, new Array[Short](441))).get
    assert(s.rms == 0.0 && s.peak == 0.0 && math.abs(s.durationMs - 10.0) < 1e-9)
    // malformed: truncated body, non-PCM codec id, garbage — all None, no throw
    val good = wavPcm16(8000, 1, square)
    assert(MediaCodecs.decodeWav(good.take(30)).isEmpty)
    val nonPcm = good.clone(); nonPcm(20) = 85 // fmt code 0x55 (mp3)
    assert(MediaCodecs.decodeWav(nonPcm).isEmpty)
    assert(MediaCodecs.decodeWav("RIFFxxxxWAVEgarbage".getBytes).isEmpty)
  }

  test("pcmIntSamples: 8-bit centers at -128, 16-bit raw values, float/garbage rejected") {
    // 8-bit round trip through the synthesis half: byte b -> (b&0xff)-128
    val raw = Array[Byte](0, 127, -128, -1, 64)
    val got8 = MediaCodecs.pcmIntSamples(MediaCodecs.encodeWavPcm8(raw, 8000)).get
    assert(got8.sameElements(Array(-128, -1, 0, 127, -64)))
    // 16-bit: signed little-endian values come back verbatim
    val s16 = Array[Short](0, 32767, -32768, -1)
    val got16 = MediaCodecs.pcmIntSamples(wavPcm16(8000, 1, s16)).get
    assert(got16.sameElements(Array(0, 32767, -32768, -1)))
    // chunk walk: trailing LIST chunk doesn't confuse the data range
    assert(MediaCodecs.pcmIntSamples(wavPcm16(8000, 1, s16, trailingChunk = true)).get
      .sameElements(got16))
    // garbage and truncation reject without throwing
    assert(MediaCodecs.pcmIntSamples(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.pcmIntSamples(wavPcm16(8000, 1, s16).take(30)).isEmpty)
  }

  test("decodeNetpbm: P6 dims + BT.601 luma, comments, 16-bit/truncated rejected") {
    val grad = ppm(4, 2, (x, _) => (x * 60, x * 60, x * 60), comment = true)
    val (info, raster) = MediaCodecs.decodeNetpbm(grad).get
    assert(info.width == 4 && info.height == 2 && info.channels == 3)
    // gray pixels: luma == value; mean of 0,60,120,180 per row
    assert(math.abs(info.meanLuma - 90.0) < 1e-9)
    assert(raster.length == 24)
    // red-only: luma = 0.299 * r
    val red = ppm(2, 2, (_, _) => (200, 0, 0))
    assert(math.abs(MediaCodecs.decodeNetpbm(red).get._1.meanLuma - 0.299 * 200) < 1e-9)
    assert(MediaCodecs.decodeNetpbm(grad.take(12)).isEmpty) // truncated raster
    assert(MediaCodecs.decodeNetpbm("P6\n2 2\n65535\n".getBytes ++ new Array[Byte](24)).isEmpty)
    assert(MediaCodecs.decodeNetpbm("JFIF".getBytes).isEmpty)
  }

  test("resizeNetpbm: nearest-neighbor downscale round-trips through the decoder") {
    // 4x4 quadrant image -> 2x2 must pick one source pixel per quadrant
    val quad = ppm(4, 4, (x, y) => if (x < 2 && y < 2) (255, 0, 0)
      else if (x >= 2 && y < 2) (0, 255, 0)
      else if (x < 2) (0, 0, 255) else (255, 255, 255))
    val small = MediaCodecs.resizeNetpbm(quad, 2, 2).get
    val (info, raster) = MediaCodecs.decodeNetpbm(small).get
    assert(info.width == 2 && info.height == 2)
    def px(i: Int) = ((raster(i * 3) & 0xff), (raster(i * 3 + 1) & 0xff), (raster(i * 3 + 2) & 0xff))
    assert(px(0) == ((255, 0, 0)) && px(1) == ((0, 255, 0)))
    assert(px(2) == ((0, 0, 255)) && px(3) == ((255, 255, 255)))
    // upscale replicates
    val up = MediaCodecs.decodeNetpbm(MediaCodecs.resizeNetpbm(small, 4, 4).get).get._1
    assert(up.width == 4 && up.height == 4)
  }

  test("decodeImageIO: PNG gray/RGB exact stats, JPEG dims, malformed rejected") {
    // grayscale: pixels 0..7 -> mean luma = 3.5 exactly (PNG lossless,
    // raw raster samples — no getRGB colorspace surprise)
    val gray = MediaCodecs.encodePng(Array.tabulate[Byte](8)(_.toByte), 4, 2, 1)
    assert(MediaCodecs.imageIoFormat(gray).contains("png"))
    val gi = MediaCodecs.decodeImageIO(gray).get
    assert(gi.width == 4 && gi.height == 2 && gi.channels == 1)
    assert(math.abs(gi.meanLuma - 3.5) < 1e-12)
    // RGB: red-only 200 -> BT.601 luma = 0.299 * 200
    val rgb = MediaCodecs.encodePng(
      Array.tabulate[Byte](2 * 2 * 3)(i => if (i % 3 == 0) 200.toByte else 0), 2, 2, 3)
    val ri = MediaCodecs.decodeImageIO(rgb).get
    assert(ri.width == 2 && ri.height == 2 && ri.channels == 3)
    assert(math.abs(ri.meanLuma - 0.299 * 200) < 1e-9)
    // JPEG (lossy): dims/channels exact, uniform-gray luma near-exact
    val jimg = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g2 = jimg.createGraphics()
    g2.setColor(new java.awt.Color(128, 128, 128)); g2.fillRect(0, 0, 16, 8); g2.dispose()
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jout)
    val jpeg = jout.toByteArray
    assert(MediaCodecs.imageIoFormat(jpeg).contains("jpeg"))
    val ji = MediaCodecs.decodeImageIO(jpeg).get
    assert(ji.width == 16 && ji.height == 8 && ji.channels == 3)
    assert(math.abs(ji.meanLuma - 128.0) < 3.0) // lossy, uniform field
    // malformed payloads reject to None (route to stub, never crash)
    assert(MediaCodecs.decodeImageIO(gray.take(20)).isEmpty) // truncated PNG
    val garbage = Array[Byte](0x89.toByte, 'P', 'N', 'G') ++ Array.fill[Byte](32)(7)
    assert(MediaCodecs.decodeImageIO(garbage).isEmpty) // magic + junk body
    assert(MediaCodecs.decodeImageIO("not an image".getBytes).isEmpty)
    assert(MediaCodecs.decodeImageIO(null).isEmpty)
    assert(MediaCodecs.imageIoFormat(wavPcm16(8000, 1, Array[Short](0))).isEmpty)
  }

  test("decodeMp3: frame-header metadata, ID3 tags skipped, malformed rejected") {
    // 3 frames, 44.1k, 128 kbps (idx 9 of the MPEG1-L3 table), stereo
    val plain = MediaCodecs.encodeMp3Frames(0, 9, mono = false, nFrames = 3)
    val m = MediaCodecs.decodeMp3(plain).get
    assert(m.version == "1" && m.layer == 3)
    assert(m.sampleRate == 44100 && m.channels == 2 && m.bitrateKbps == 128)
    assert(m.nFrames == 3)
    // exact frame math: len = 144*128000/44100 = 417 B; 3*1152 samples
    assert(plain.length == 3 * 417)
    assert(math.abs(m.durationMs - 3 * 1152 * 1000.0 / 44100) < 1e-9)
    // ID3v2 front tag skipped; ID3v1 128-B trailer skipped
    val tagged = MediaCodecs.encodeMp3Frames(1, 1, mono = true, nFrames = 2,
      id3Bytes = 200)
    assert(MediaCodecs.isMp3(tagged))
    val mt = MediaCodecs.decodeMp3(tagged).get
    assert(mt.sampleRate == 48000 && mt.channels == 1 &&
      mt.bitrateKbps == 32 && mt.nFrames == 2)
    val v1 = new Array[Byte](128)
    v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
    assert(MediaCodecs.decodeMp3(plain ++ v1).get.nFrames == 3)
    // malformed payloads reject (None), never mis-parse:
    // truncated final frame
    assert(MediaCodecs.decodeMp3(plain.dropRight(1)).isEmpty)
    // garbage between/after frames (sync lost)
    assert(MediaCodecs.decodeMp3(plain ++ Array[Byte](1, 2, 3)).isEmpty)
    // reserved layer (layer bits 00)
    val badLayer = plain.clone(); badLayer(1) = 0xf9.toByte
    assert(MediaCodecs.decodeMp3(badLayer).isEmpty)
    // free-format bitrate (index 0) and invalid sample-rate index (3)
    val freeBr = plain.clone(); freeBr(2) = (freeBr(2) & 0x0f).toByte
    assert(MediaCodecs.decodeMp3(freeBr).isEmpty)
    val badSr = plain.clone(); badSr(2) = (badSr(2) | 0x0c).toByte
    assert(MediaCodecs.decodeMp3(badSr).isEmpty)
    // ID3 tag with no audio behind it
    assert(MediaCodecs.decodeMp3(tagged.take(210)).isEmpty)
    assert(!MediaCodecs.isMp3("not audio".getBytes("UTF-8")))
    // MPEG2 Layer II path (576-sample L3 twin lives in the same table
    // family): header crafted by hand — 22.05k, idx 4 → 32 kbps, mono
    val h2 = Array[Byte](0xff.toByte, 0xf4.toByte, 0x40.toByte, 0xc0.toByte)
    val fl2 = 1152 / 8 * 32000 / 22050 // layer II, MPEG2
    val s2 = h2 ++ new Array[Byte](fl2 - 4)
    val m2 = MediaCodecs.decodeMp3(s2).get
    assert(m2.version == "2" && m2.layer == 2 &&
      m2.sampleRate == 22050 && m2.bitrateKbps == 32 && m2.nFrames == 1)
  }

  test("decodeMp3: Xing/Info/VBRI headers are authoritative for frames, duration, avg bitrate") {
    // Xing with BYTES: 44.1k, nominal 128 kbps, claims 40 frames over a
    // 2-physical-frame payload — the count can only come from the header
    val xing = MediaCodecs.encodeMp3Vbr(kind = 0, sampleRateIdx = 0,
      bitrateIdx = 9, claimFrames = 40)
    val mx = MediaCodecs.decodeMp3(xing).get
    assert(mx.nFrames == 40 && mx.sampleRate == 44100 && mx.channels == 2)
    assert(math.abs(mx.durationMs - 40 * 1152 * 1000.0 / 44100) < 1e-9)
    // average bitrate from the BYTES field, integer-floor math
    val frameLen = 144 * 128000 / 44100
    val bytesF = 40L * frameLen * 3 / 4
    val kbps = (bytesF * 8 * 44100 / (40L * 1152) / 1000).toInt
    assert(mx.bitrateKbps == kbps && kbps < 128) // visibly NOT the nominal
    // Xing without BYTES falls back to the nominal first-frame bitrate
    assert(MediaCodecs.decodeMp3(MediaCodecs.encodeMp3Vbr(0, 0, 9, 40,
      withBytes = false)).get.bitrateKbps == 128)
    // Info (CBR LAME) parses identically; VBRI (Fraunhofer) too
    val mi = MediaCodecs.decodeMp3(MediaCodecs.encodeMp3Vbr(2, 1, 5, 25)).get
    assert(mi.nFrames == 25 && mi.sampleRate == 48000)
    val mv = MediaCodecs.decodeMp3(MediaCodecs.encodeMp3Vbr(1, 2, 14, 99)).get
    assert(mv.nFrames == 99 && mv.sampleRate == 32000)
    assert(mv.bitrateKbps ==
      ((99L * (144 * 320000 / 32000) * 3 / 4) * 8 * 32000 / (99L * 1152) / 1000).toInt)
    // the real-world win: a TRUNCATED VBR stream (dead strict-walk
    // territory) still yields full metadata from the header
    assert(MediaCodecs.decodeMp3(xing.take(500)).get.nFrames == 40)
    // ID3v2-fronted VBR stream: tag skipped, header still found
    val id3 = new Array[Byte](10 + 16)
    id3(0) = 'I'; id3(1) = 'D'; id3(2) = '3'; id3(3) = 4; id3(9) = 16
    assert(MediaCodecs.decodeMp3(id3 ++ xing).get.nFrames == 40)
    // CRC-protected frame: protection bit 0 shifts the tag by 2
    val crc = new Array[Byte](417)
    crc(0) = 0xff.toByte; crc(1) = 0xfa.toByte // MPEG1 L3, CRC present
    crc(2) = (9 << 4).toByte; crc(3) = 0x00
    val cp = 4 + 2 + 32
    "Xing".zipWithIndex.foreach { case (c, i) => crc(cp + i) = c.toByte }
    crc(cp + 7) = 1 // flags = FRAMES
    crc(cp + 11) = 7 // frames = 7
    assert(MediaCodecs.decodeMp3(crc).get.nFrames == 7)
    // MONO MPEG1: side info is 17 bytes, tag at 21
    val mono = new Array[Byte](417)
    mono(0) = 0xff.toByte; mono(1) = 0xfb.toByte
    mono(2) = (9 << 4).toByte; mono(3) = 0xc0.toByte
    "Xing".zipWithIndex.foreach { case (c, i) => mono(4 + 17 + i) = c.toByte }
    mono(4 + 17 + 7) = 1; mono(4 + 17 + 11) = 9
    assert(MediaCodecs.decodeMp3(mono).get.nFrames == 9)
    // Layer II never VBR-parses: plant a plausible tag, walk stays physical
    val l2 = Array[Byte](0xff.toByte, 0xf4.toByte, 0x40.toByte, 0xc0.toByte) ++
      new Array[Byte](1152 / 8 * 32000 / 22050 - 4)
    "Xing".zipWithIndex.foreach { case (c, i) => l2(4 + 9 + i) = c.toByte }
    l2(4 + 9 + 7) = 1; l2(4 + 9 + 11) = 50
    assert(MediaCodecs.decodeMp3(l2).get.nFrames == 1)
    // CBR streams without a tag keep the physical-walk contract
    assert(MediaCodecs.decodeMp3(
      MediaCodecs.encodeMp3Frames(0, 9, mono = false, nFrames = 3)).get.nFrames == 3)
  }

  test("decodeMedia: magic dispatch wav/ppm/stub, null payloads kept, resizeMedia real+stub") {
    val wav = wavPcm16(16000, 1, Array.tabulate[Short](160)(i =>
      (math.sin(i * 0.1) * 16384).toShort))
    val img = ppm(8, 4, (x, y) => (x * 30, y * 60, 128))
    val png = MediaCodecs.encodePng(Array.tabulate[Byte](16)(i => (i * 16).toByte), 4, 4, 1)
    val media = Seq(
      (1L, wav), (2L, img), (3L, "not-a-real-format-payload".getBytes), (4L, null),
      (5L, png))
      .toDF("media_id", "data")
    val rows = Multimodal.decodeMedia(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(rows.size == 5) // counts reconcile: null payload did not vanish
    assert(rows(1L).getAs[String]("format") == "wav")
    assert(rows(1L).getAs[Int]("sample_rate") == 16000 &&
      rows(1L).getAs[Long]("n_frames") == 160)
    // 0.5-amplitude sine: RMS ~ 0.5/sqrt(2), peak ~ 0.5
    assert(math.abs(rows(1L).getAs[Double]("rms") - 0.5 / math.sqrt(2)) < 0.02)
    assert(rows(1L).getAs[Double]("peak") <= 0.51 && rows(1L).getAs[Double]("peak") > 0.45)
    assert(rows(2L).getAs[String]("format") == "ppm" &&
      rows(2L).getAs[Int]("width") == 8 && rows(2L).getAs[Int]("height") == 4)
    assert(rows(3L).getAs[String]("format") == "unknown" &&
      rows(3L).getAs[scala.collection.Seq[Float]]("stub_feature") != null)
    assert(rows(4L).getAs[String]("format") == "null-payload" &&
      rows(4L).getAs[scala.collection.Seq[Float]]("stub_feature") == null)
    assert(rows(5L).getAs[String]("format") == "png" &&
      rows(5L).getAs[Int]("width") == 4 && rows(5L).getAs[Int]("height") == 4 &&
      rows(5L).getAs[Int]("channels") == 1)

    val resized = Multimodal.resizeMedia(media, 2, 2, stubTargetBytes = 10)
      .select("media_id", "data").as[(Long, Array[Byte])].collect().toMap
    // image really resized (and still a decodable netpbm); others stub-truncated
    val (ri, _) = MediaCodecs.decodeNetpbm(resized(2L)).get
    assert(ri.width == 2 && ri.height == 2)
    assert(resized(3L).length == 10)
    assert(resized(1L).length == 10) // wav is not netpbm -> stub path
    assert(resized(4L) == null)
  }

  test("decodeAvi: DIB frames — dims/duration exact, BT.601 luma, row flip, stride padding") {
    // 3×2 RGB frames — width 3 forces a 4-byte-stride pad (9 → 12)
    def frame(base: Int): Array[Byte] = Array.tabulate[Byte](3 * 2 * 3) { i =>
      ((base + i * 7) % 256).toByte
    }
    val frames = Array(frame(10), frame(100))
    val avi = MediaCodecs.encodeAviDib(frames, width = 3, height = 2,
      usecPerFrame = 40000) // 25 fps
    assert(MediaCodecs.isAvi(avi) && !MediaCodecs.isWav(avi))
    val v = MediaCodecs.decodeAvi(avi).get
    assert(v.width == 3 && v.height == 2 && v.nFrames == 2 && v.codec == "dib")
    assert(v.usecPerFrame == 40000 && math.abs(v.durationMs - 80.0) < 1e-9)
    // mean luma replayed from the raw RGB bytes
    def lumaOf(px: Array[Byte]): Double =
      (0 until 6).map { p =>
        0.299 * (px(3 * p) & 0xff) + 0.587 * (px(3 * p + 1) & 0xff) +
          0.114 * (px(3 * p + 2) & 0xff)
      }.sum / 6
    assert(math.abs(v.meanLuma - (lumaOf(frames(0)) + lumaOf(frames(1))) / 2) < 1e-9)
    // firstLuma is the TOP-LEFT pixel of frame 0 — byte offsets 0..2 of
    // the TOP-DOWN input raster; if the decoder forgot the bottom-up
    // flip it would read the stored first row = image BOTTOM row
    val want = 0.299 * (frames(0)(0) & 0xff) + 0.587 * (frames(0)(1) & 0xff) +
      0.114 * (frames(0)(2) & 0xff)
    assert(math.abs(v.firstLuma - want) < 1e-9)
    val bottomLeft = 0.299 * (frames(0)(9) & 0xff) + 0.587 * (frames(0)(10) & 0xff) +
      0.114 * (frames(0)(11) & 0xff)
    assert(math.abs(want - bottomLeft) > 1e-6) // the flip is actually observable
    // malformed: truncated mid-movi and a frame-size lie both reject
    assert(MediaCodecs.decodeAvi(avi.take(avi.length - 5)).isEmpty)
    val lied = avi.clone()
    // find first 00db chunk and shrink its declared size below a frame
    val idx = lied.indices.find(i => i + 4 < lied.length && lied(i) == '0' &&
      lied(i + 1) == '0' && lied(i + 2) == 'd' && lied(i + 3) == 'b').get
    lied(idx + 4) = 5; lied(idx + 5) = 0; lied(idx + 6) = 0; lied(idx + 7) = 0
    assert(MediaCodecs.decodeAvi(lied).isEmpty)
  }

  test("decodeAvi: MJPEG frames through ImageIO; decodeMedia routes avi rows") {
    // encode two 8×8 gray JPEGs with the JDK writer
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 8) img.getRaster.setSample(x, y, 0, shade)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", out)
      out.toByteArray
    }
    val avi = MediaCodecs.encodeAviMjpeg(Array(jpeg(40), jpeg(200)), 8, 8,
      usecPerFrame = 33333)
    val v = MediaCodecs.decodeAvi(avi).get
    assert(v.width == 8 && v.height == 8 && v.nFrames == 2 && v.codec == "mjpeg")
    // flat-shade JPEGs decode near-exactly (DC-only blocks)
    assert(math.abs(v.meanLuma - 120.0) < 3.0)
    assert(math.abs(v.firstLuma - 40.0) < 3.0)

    // DataFrame routing: avi rows land on the real decoder with the
    // video columns set; a corrupt avi falls to the stub as unknown
    val dib = MediaCodecs.encodeAviDib(
      Array(Array.tabulate[Byte](4 * 2 * 3)(i => (i * 5).toByte)), 4, 2, 100000)
    val bad = dib.clone(); bad(40) = 99 // clobber inside avih
    val rows = Multimodal.decodeMedia(
        Seq((1L, dib), (2L, avi), (3L, bad.take(20))).toDF("media_id", "data"))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(rows(1L).getAs[String]("format") == "avi" &&
      rows(1L).getAs[String]("video_codec") == "dib" &&
      rows(1L).getAs[Long]("n_frames") == 1 &&
      rows(1L).getAs[Int]("width") == 4 &&
      math.abs(rows(1L).getAs[Double]("duration_ms") - 100.0) < 1e-9 &&
      !rows(1L).isNullAt(rows(1L).fieldIndex("first_luma")))
    assert(rows(2L).getAs[String]("video_codec") == "mjpeg")
    assert(rows(3L).getAs[String]("format") == "unknown")
  }
}
