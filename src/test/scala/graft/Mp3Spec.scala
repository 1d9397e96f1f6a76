package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaCodecs, Mp3}

/** MPEG-1 Layer III sample decoder (VERDICT r12 #2): the requantized
  * frequency lines replayed first-principles from [[Mp3.encode3]]'s
  * documented parameterization — the same replay the
  * `multimodal_decode_mp3` DuckDB oracle runs — for BOTH block
  * families (long and short/reordered), the bit-reservoir
  * back-reference path pinned bit-identical to the contiguous
  * layout, and the strict-`None` stance on every documented
  * out-of-scope shape. The short round-trip is the regression test
  * for the r12 `imdctShort` overlap-offset bug (out(6+12w) → AIOOBE
  * at w=2 swallowed into `None`; correct offset is 6+6w). */
class Mp3Spec extends AnyFunSuite {

  /** ISO Table B.8 widths at 48 kHz — transcribed independently here
    * so a typo in the decoder's copy fails the replay. */
  private val LongW48 =
    Array(4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10, 12, 16, 18, 22, 28, 34, 40, 46, 54, 54, 192)
  private val ShortW48 = Array(4, 4, 4, 4, 6, 6, 10, 12, 14, 16, 20, 26, 66)

  /** encode3's signed big-value pair for raw pair p of (frame,
    * granule) — straight from the encode3 scaladoc formulas. */
  private def rawLine(id: Long, f: Int, g: Int, rl: Int): Int = {
    if (rl >= 64) return 0 // 32 pairs; count1 region empty
    val p = rl / 2
    if (rl % 2 == 0) {
      val x = ((id + 3 * f + 5 * g + p) % 2).toInt
      if (x > 0 && (id + p + g) % 2 == 1) -x else x
    } else {
      val y = ((id + f + 2 * g + 7 * p) % 2).toInt
      if (y > 0 && (id + 3 * p + f) % 2 == 1) -y else y
    }
  }

  /** §2.4.3.4 requantization replay, long blocks: |is|^(4/3) is `is`
    * itself (values ∈ {−1,0,1}), every factor an exact power of 2. */
  private def expectedLong(id: Long, f: Int, g: Int): Array[Double] = {
    val out = new Array[Double](576)
    val gainA = math.pow(2.0, ((id + 2 * f + g) % 8).toDouble)
    var b = 0; var i = 0
    while (b < 22) {
      val sf = if (b < 21) ((id + b + g) % 4).toInt else 0
      val gain = gainA * math.pow(2.0, -sf.toDouble)
      val end = i + LongW48(b)
      while (i < end) { out(i) = rawLine(id, f, g, i) * gain; i += 1 }
      b += 1
    }
    out
  }

  /** Short-block replay: per-window subblock gain + scalefactor,
    * then the (band, window, line) → (band, line, window) reorder. */
  private def expectedShort(id: Long, f: Int, g: Int): Array[Double] = {
    val out = new Array[Double](576)
    val gainA = math.pow(2.0, ((id + 2 * f + g) % 8).toDouble)
    var b = 0; var rawStart = 0
    while (b < 13) {
      val wdt = ShortW48(b)
      var w = 0
      while (w < 3) {
        val sbg = ((id + w + g) % 8).toInt
        val sf = if (b < 12) ((id + b + w + g) % 4).toInt else 0
        val gain = gainA * math.pow(2.0, -2.0 * sbg) * math.pow(2.0, -sf.toDouble)
        var l = 0
        while (l < wdt) {
          out(rawStart + l * 3 + w) = rawLine(id, f, g, rawStart + w * wdt + l) * gain
          l += 1
        }
        w += 1
      }
      rawStart += 3 * wdt
      b += 1
    }
    out
  }

  test("long blocks: encode3 -> decode matches the first-principles replay bit-exactly") {
    for (id <- Seq(0L, 1L, 7L, 42L, 63L); nf <- Seq(1, 3)) {
      val info = Mp3.decode(Mp3.encode3(id, nf)).getOrElse(fail(s"id=$id nf=$nf"))
      assert(info.sampleRate == 48000 && info.channels == 1 &&
        info.bitrateKbps == 192 && info.nFrames == nf)
      assert(info.pcm.length == nf * 1152)
      for (f <- 0 until nf; g <- 0 until 2) {
        assert(info.blockTypes(f * 2 + g) == 0)
        val exp = expectedLong(id, f, g)
        val got = info.lines(f * 2 + g)
        assert(got.length == 576)
        var i = 0
        while (i < 576) {
          assert(got(i) == exp(i), s"id=$id f=$f g=$g line=$i: ${got(i)} != ${exp(i)}")
          i += 1
        }
      }
      // the hybrid filterbank actually ran on real content
      assert(info.pcm.exists(_ != 0.0) && info.pcm.forall(v => !v.isNaN && !v.isInfinite))
    }
  }

  test("short blocks decode (imdctShort AIOOBE regression) and match the reordered replay") {
    for (id <- Seq(0L, 3L, 42L, 63L); nf <- Seq(1, 3)) {
      val dec = Mp3.decode(Mp3.encode3(id, nf, short = true))
      assert(dec.isDefined, s"short-block stream id=$id must decode (r12 AIOOBE regression)")
      val info = dec.get
      for (f <- 0 until nf; g <- 0 until 2) {
        assert(info.blockTypes(f * 2 + g) == 2)
        val exp = expectedShort(id, f, g)
        val got = info.lines(f * 2 + g)
        var i = 0
        while (i < 576) {
          assert(got(i) == exp(i), s"id=$id f=$f g=$g line=$i: ${got(i)} != ${exp(i)}")
          i += 1
        }
      }
      assert(info.pcm.length == nf * 1152 && info.pcm.exists(_ != 0.0))
    }
  }

  test("bit reservoir: back-referenced main data decodes to the exact same lines") {
    for (id <- Seq(2L, 11L); short <- Seq(false, true)) {
      val plain = Mp3.decode(Mp3.encode3(id, 4, short)).getOrElse(fail("plain"))
      val back = Mp3.decode(Mp3.encode3(id, 4, short, reservoirBack = 64))
        .getOrElse(fail(s"reservoir stream id=$id short=$short must decode"))
      assert(back.nFrames == 4)
      for (i <- plain.lines.indices)
        assert(java.util.Arrays.equals(plain.lines(i), back.lines(i)),
          s"id=$id short=$short gr=$i reservoir layout changed the decoded lines")
      assert(java.util.Arrays.equals(plain.pcm, back.pcm))
    }
  }

  test("broken back-reference (main_data_begin beyond accumulated reservoir) is None") {
    // frame 0 with a nonzero main_data_begin: nothing accumulated yet
    val b = Mp3.encode3(5L, 2)
    // main_data_begin is the first 9 bits after the 4-byte header
    b(4) = 0x00.toByte; b(5) = (b(5) | 0x80).toByte // set mdb = 1 on frame 0
    assert(Mp3.decode(b).isEmpty)
  }

  test("strict None: every documented out-of-scope shape") {
    // stereo (channel mode joint/stereo) — header-metadata remit
    assert(Mp3.decode(MediaCodecs.encodeMp3Frames(1, 11, mono = false, 2)).isEmpty)
    // untranscribed Huffman tables (real-world encoder selections)
    for (tab <- Seq(7, 13, 24))
      assert(Mp3.decode(Mp3.encode3(9L, 1, tableSelect = tab)).isEmpty, s"table $tab")
    // mixed-block granules
    assert(Mp3.decode(Mp3.encode3(9L, 1, short = true, mixed = true)).isEmpty)
    // CRC-protected stream (protection bit 0)
    val crc = Mp3.encode3(9L, 1); crc(1) = (crc(1) & ~1).toByte
    assert(Mp3.decode(crc).isEmpty)
    // truncation: mid-frame and mid-stream
    val two = Mp3.encode3(9L, 2)
    assert(Mp3.decode(two.dropRight(10)).isEmpty)
    assert(Mp3.decode(two.take(4)).isEmpty)
    // garbage and degenerate inputs
    assert(Mp3.decode(Array.fill(64)(0x55.toByte)).isEmpty)
    assert(Mp3.decode(Array.emptyByteArray).isEmpty)
    assert(Mp3.decode(null).isEmpty)
  }

  test("retained-output guard: adversarially long streams fail closed") {
    // 3700 frames × 2304 retained doubles ≈ 8.5M > MaxRetainedSamples (2^23)
    assert(Mp3.decode(Mp3.encode3(1L, 3700)).isEmpty)
    // just inside the guard still decodes (boundary sanity, small case)
    assert(Mp3.decode(Mp3.encode3(1L, 8)).isDefined)
  }

  test("decodeMedia routing: in-scope mono decodes with PCM stats; stereo takes the header path") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq(
      (1L, Mp3.encode3(4L, 2)), // in-scope: real decode
      (2L, MediaCodecs.encodeMp3Frames(1, 11, mono = false, 3))) // stereo: header path
      .toDF("media_id", "data")
    val rows = graft.multimodal.Multimodal.decodeMedia(media)
      .orderBy($"media_id")
      .select($"media_id", $"format", $"sample_rate", $"channels", $"n_frames",
        $"duration_ms", $"rms", $"peak", $"bitrate_kbps")
      .collect()
    assert(rows(0).getString(1) == "mp3" && rows(0).getInt(2) == 48000)
    assert(rows(0).getInt(3) == 1 && rows(0).getLong(4) == 2L) // FRAME count
    assert(rows(0).getDouble(5) == 2 * 1152 * 1000.0 / 48000)
    assert(!rows(0).isNullAt(6) && rows(0).getDouble(6) > 0.0 &&
      rows(0).getDouble(7) >= rows(0).getDouble(6)) // real PCM stats
    assert(rows(0).getInt(8) == 192)
    assert(rows(1).getString(1) == "mp3" && rows(1).getInt(3) == 2)
    assert(rows(1).getLong(4) == 3L && rows(1).isNullAt(6) && rows(1).isNullAt(7))
  }
}
