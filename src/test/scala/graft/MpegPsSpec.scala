package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Mp2, Mpeg1, MpegPs}

/** MPEG-1 program-stream (.mpg) demux: byte-exact reassembly across
  * interleaved packets and every packet-header form, end-to-end A/V
  * decode through decodeMedia, and the strictness stance. */
class MpegPsSpec extends AnyFunSuite {

  private val video = Mpeg1.encode(
    Seq(Array(10, 20, 30, 40), Array(50, 60, 70, 80)), mbCols = 1, mbRows = 1)
  private val audio = Mp2.encode(7L, 2)

  test("mux -> demux reassembles both tracks byte-exactly across interleaving") {
    for (chunk <- Seq(16, 512, 1 << 20)) { // many packets .. single packet
      val ps = MpegPs.mux(video, audio, chunk)
      val d = MpegPs.demux(ps).getOrElse(fail(s"demux failed chunk=$chunk"))
      assert(d.video.toSeq == video.toSeq, s"video chunk=$chunk")
      assert(d.audio.toSeq == audio.toSeq, s"audio chunk=$chunk")
    }
  }

  test("padding packets are skipped, video-only and audio-only streams work") {
    val vOnly = MpegPs.demux(MpegPs.mux(video, Array.emptyByteArray)).get
    assert(vOnly.video.toSeq == video.toSeq && vOnly.audio.isEmpty)
    val aOnly = MpegPs.demux(MpegPs.mux(Array.emptyByteArray, audio)).get
    assert(aOnly.audio.toSeq == audio.toSeq && aOnly.video.isEmpty)
    // hand-splice a padding packet (0xBE) before the end code
    val ps = MpegPs.mux(video, audio)
    val pad = Array[Byte](0, 0, 1, 0xbe.toByte, 0, 4, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte)
    val spliced = ps.dropRight(4) ++ pad ++ ps.takeRight(4)
    val d = MpegPs.demux(spliced).getOrElse(fail("padding splice failed"))
    assert(d.video.toSeq == video.toSeq && d.audio.toSeq == audio.toSeq)
  }

  test("strictness: garbage, truncation, MPEG-2 pack nibble and bad flags return None") {
    val ps = MpegPs.mux(video, audio)
    assert(MpegPs.demux(Array[Byte](1, 2, 3)) === None)
    assert(MpegPs.demux(null) === None)
    assert(MpegPs.demux(ps.dropRight(10)) === None) // truncated mid-packet
    val m2 = ps.clone()
    m2(4) = 0x44.toByte // MPEG-2 pack marker '01' instead of '0010'
    assert(MpegPs.demux(m2) === None)
    assert(!MpegPs.isPs(video) && MpegPs.isPs(ps))
  }

  test("decodeMedia: .mpg rows carry both the MP2 audio and M1V video fields") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq(
      (1L, MpegPs.mux(video, audio)),
      (2L, video)) // bare elementary stream still routes to m1v
      .toDF("media_id", "data")
    val rows = graft.multimodal.Multimodal.decodeMedia(media)
      .orderBy($"media_id")
      .select($"media_id", $"format", $"video_codec", $"width", $"height",
        $"n_frames", $"sample_rate", $"channels", $"bitrate_kbps",
        $"rms", $"mean_luma", $"first_luma")
      .collect()
    val luma = (b: Int) => 0.299 * b + 0.587 * b + 0.114 * b
    assert(rows(0).getString(1) == "mpg" && rows(0).getString(2) == "intra")
    assert(rows(0).getInt(3) == 16 && rows(0).getInt(4) == 16)
    assert(rows(0).getLong(5) == 2L)
    assert(rows(0).getInt(6) == 48000 && rows(0).getInt(7) == 1 &&
      rows(0).getInt(8) == 192)
    assert(rows(0).getDouble(9) > 0.0) // real PCM through the demuxed track
    assert(rows(0).getDouble(11) == luma(10))
    assert(rows(1).getString(1) == "m1v")
    assert(rows(1).getDouble(10) == rows(0).getDouble(10)) // same video track
  }
}
