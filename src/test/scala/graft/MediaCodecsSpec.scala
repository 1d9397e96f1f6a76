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
}
