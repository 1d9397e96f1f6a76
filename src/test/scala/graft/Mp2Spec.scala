package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Mp2

/** MPEG-1 Layer II sample decoder (VERDICT r10 #4): bitstream +
  * requantization replayed first-principles from the encode
  * parameterization (the same replay the DuckDB oracle runs), the
  * synthesis filterbank pinned against a direct-by-definition
  * implementation, and the decodeWav-style strictness stance. */
class Mp2Spec extends AnyFunSuite {

  /** Independent replay of the requantized subband matrix for
    * [[Mp2.encode]]'s parameterization — written from the encode
    * scaladoc's formulas, not the decoder's code path. */
  private def expectedSubbands(id: Long, f: Int): Array[Double] = {
    val out = new Array[Double](36 * 32)
    for (((sb, levels), _) <- Mp2.EncSubbands.zipWithIndex) {
      val grouped = levels == 3 || levels == 5 || levels == 9
      val k = 32 - Integer.numberOfLeadingZeros(levels)
      val c2 = (1 << k).toDouble / levels
      val d = if (grouped) 0.5 else 2.0 / (1 << k)
      val half = 1 << (k - 1)
      val scfsi = ((id + sb) % 4).toInt
      // transmitted scalefactor exponents m (idx = 3m)
      def m(qi: Int): Int = ((id + 5 * sb + 11 * qi) % 7).toInt
      def sfOf(qi: Int): Double = 2.0 * math.pow(2.0, -m(qi).toDouble)
      val sfPart: Int => Double = scfsi match {
        case 0 => p => sfOf(p)
        case 1 => p => if (p < 2) sfOf(0) else sfOf(1)
        case 2 => _ => sfOf(0)
        case _ => p => if (p == 0) sfOf(0) else sfOf(1)
      }
      for (g <- 0 until 12; j <- 0 until 3) {
        val c = ((id + 17 * f + g + 7 * sb + 3 * j) % levels).toInt
        out((g * 3 + j) * 32 + sb) =
          sfPart(g / 4) * (c2 * (c.toDouble / half - 1.0 + d))
      }
    }
    out
  }

  test("encode -> decode: every requantized subband sample matches the first-principles replay") {
    for (id <- Seq(0L, 1L, 7L, 42L, 63L); nf <- Seq(1, 3)) {
      val info = Mp2.decode(Mp2.encode(id, nf))
        .getOrElse(fail(s"decode failed for id=$id"))
      assert(info.sampleRate == 48000 && info.channels == 1 &&
        info.bitrateKbps == 192 && info.nFrames == nf)
      assert(info.pcm.length == nf * 1152)
      for (f <- 0 until nf) {
        val want = expectedSubbands(id, f)
        val got = info.subbands(f)
        assert(got.length == 36 * 32)
        // bit-identical: the replay uses only IEEE-deterministic ops
        // (dyadic sums, one rounded divide for C, exact 2^-m scaling)
        assert(got.toSeq == want.toSeq, s"id=$id frame=$f")
      }
    }
  }

  test("unallocated subbands decode to exactly zero") {
    val info = Mp2.decode(Mp2.encode(5L, 1)).get
    val allocated = Mp2.EncSubbands.map(_._1).toSet
    for (t <- 0 until 36; sb <- 0 until 32 if !allocated.contains(sb))
      assert(info.subbands(0)(t * 32 + sb) == 0.0)
    // and the allocated ones are not all zero
    assert(Mp2.EncSubbands.exists { case (sb, _) =>
      (0 until 36).exists(t => info.subbands(0)(t * 32 + sb) != 0.0) })
  }

  test("synthesizer matches a direct-by-definition implementation and zero maps to zero") {
    // direct version: explicit V history, U gather, W window, 16-term
    // sum — transcribed from the standard's flow chart, not from the
    // fused production loop
    val window = Mp2.PrototypeWindow
    val nSteps = 8
    val rnd = new scala.util.Random(7)
    val inputs = Array.fill(nSteps)(Array.fill(32)(rnd.nextDouble() * 2 - 1))
    val vHist = Array.fill(1024)(0.0)
    val direct = Array.ofDim[Double](nSteps, 32)
    for (t <- 0 until nSteps) {
      System.arraycopy(vHist, 0, vHist, 64, 960)
      for (i <- 0 until 64)
        vHist(i) = (0 until 32).map(kk =>
          math.cos((16 + i) * (2 * kk + 1) * math.Pi / 64.0) * inputs(t)(kk)).sum
      val u = new Array[Double](512)
      for (b <- 0 until 8; i <- 0 until 32) {
        u(64 * b + i) = vHist(128 * b + i)
        u(64 * b + 32 + i) = vHist(128 * b + 96 + i)
      }
      val w = Array.tabulate(512)(i => u(i) * window(i))
      for (j <- 0 until 32)
        direct(t)(j) = (0 until 16).map(b => w(j + 32 * b)).sum
    }
    val synth = new Mp2.Synthesizer()
    val out = new Array[Double](32)
    for (t <- 0 until nSteps) {
      synth.step(inputs(t), out, 0)
      for (j <- 0 until 32)
        assert(math.abs(out(j) - direct(t)(j)) < 1e-12, s"t=$t j=$j")
    }
    // zero input through a FRESH synthesizer stays exactly zero
    val z = new Mp2.Synthesizer()
    val zo = new Array[Double](32)
    for (_ <- 0 until 20) { z.step(new Array[Double](32), zo, 0); assert(zo.forall(_ == 0.0)) }
  }

  test("pcm is deterministic and bounded for full-scale input") {
    val a = Mp2.decode(Mp2.encode(9L, 2)).get.pcm
    val b = Mp2.decode(Mp2.encode(9L, 2)).get.pcm
    assert(a.toSeq == b.toSeq)
    // subband samples are <= 2*C < 4 in magnitude; a unity-sum window
    // keeps the synthesis output in the same order of magnitude
    assert(a.forall(x => math.abs(x) < 8.0))
    assert(a.exists(_ != 0.0))
  }

  test("decodeMedia routes Layer II payloads through the real sample decoder") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq(
      (1L, Mp2.encode(1L, 2)),
      (2L, graft.multimodal.MediaCodecs.encodeMp3Frames(1, 10, mono = true, 3)))
      .toDF("media_id", "data")
    val rows = graft.multimodal.Multimodal.decodeMedia(media)
      .orderBy($"media_id")
      .select($"media_id", $"format", $"sample_rate", $"n_frames", $"rms", $"peak")
      .collect()
    assert(rows(0).getString(1) == "mp2")
    assert(rows(0).getInt(2) == 48000)
    assert(rows(0).getLong(3) == 2L * 1152) // PCM frames, wav-branch units
    assert(rows(0).getDouble(4) > 0.0 && rows(0).getDouble(5) > rows(0).getDouble(4))
    // Layer III NOW routes through Mp3.decode for in-scope mono
    // streams (r12+): rms/peak are REAL PCM stats (zero-filled frame
    // bodies ⇒ silence ⇒ rms = peak = 0.0, non-null), and n_frames is
    // the FRAME count (graded multimodal_mp3_meta contract), not PCM
    // samples. Streams outside Mp3's scope (stereo, untranscribed
    // tables) still take the header-metadata path — pinned in Mp3Spec.
    assert(rows(1).getString(1) == "mp3" && !rows(1).isNullAt(4))
    assert(rows(1).getLong(3) == 3L) // frame count, not samples
    assert(rows(1).getDouble(4) == 0.0 && rows(1).getDouble(5) == 0.0)
  }

  /** Independent Layer I replay from encode1's documented formulas. */
  private def expectedL1(id: Long, f: Int): Array[Double] = {
    val out = new Array[Double](12 * 32)
    for ((sb, nb) <- Mp2.Enc1Subbands) {
      val levels = (1 << nb) - 1
      val c2 = (1 << nb).toDouble / levels
      val d = 1.0 / (1 << (nb - 1))
      val half = 1 << (nb - 1)
      val m = ((id + 5 * sb + f) % 7).toInt
      val sf = 2.0 * math.pow(2.0, -m.toDouble)
      for (t <- 0 until 12) {
        val c = ((id + 17 * f + t + 7 * sb) % levels).toInt
        out(t * 32 + sb) = sf * (c2 * (c.toDouble / half - 1.0 + d))
      }
    }
    out
  }

  test("Layer I: encode1 -> decode matches the first-principles replay bit-exactly") {
    for (id <- Seq(0L, 3L, 42L, 63L); nf <- Seq(1, 3)) {
      val info = Mp2.decode(Mp2.encode1(id, nf)).getOrElse(fail(s"id=$id"))
      assert(info.layer == 1 && info.sampleRate == 48000 &&
        info.channels == 1 && info.bitrateKbps == 192 && info.nFrames == nf)
      assert(info.pcm.length == nf * 384)
      for (f <- 0 until nf)
        assert(info.subbands(f).toSeq == expectedL1(id, f).toSeq, s"id=$id f=$f")
    }
  }

  test("Layer I routing and strictness: mp1 rows, 384 samples/frame, no layer mixing") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq((1L, Mp2.encode1(4L, 2))).toDF("media_id", "data")
    val row = graft.multimodal.Multimodal.decodeMedia(media)
      .select($"format", $"sample_rate", $"n_frames", $"rms").collect()(0)
    assert(row.getString(0) == "mp1" && row.getInt(1) == 48000)
    assert(row.getLong(2) == 2L * 384)
    assert(row.getDouble(3) > 0.0)
    val good = Mp2.encode1(5L, 1)
    assert(Mp2.decode(good).isDefined)
    assert(Mp2.decode(good.dropRight(1)) === None) // truncated frame
    // a Layer I frame followed by a Layer II frame: layers must not mix
    assert(Mp2.decode(good ++ Mp2.encode(5L, 1)) === None)
    assert(Mp2.isMp2(good))
  }

  test("strictness: wrong layer/mode/truncation and garbage all return None") {
    val good = Mp2.encode(3L, 1)
    assert(Mp2.decode(good.dropRight(1)) === None)     // truncated frame
    assert(Mp2.decode(Array[Byte](1, 2, 3, 4)) === None)
    assert(Mp2.decode(null) === None)
    val stereo = good.clone(); stereo(3) = 0x00.toByte // stereo mode
    assert(Mp2.decode(stereo) === None)
    val layer3 = good.clone(); layer3(1) = 0xfb.toByte // layer III
    assert(Mp2.decode(layer3) === None)
    // an MP3 (layer III) synth stream is not an MP2 stream
    val mp3 = graft.multimodal.MediaCodecs.encodeMp3Frames(1, 10, mono = true, 2)
    assert(Mp2.decode(mp3) === None)
    assert(Mp2.isMp2(good) && !Mp2.isMp2(mp3))
  }
}
