package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Mp2, Mp3, Mpeg1, MpegPs}

/** Corruption-robustness fuzz for the from-scratch media decoders:
  * at 100 TB a `decodeMedia` pass sees corrupt, truncated and
  * adversarial payloads by the billions, and a decoder that throws
  * unexpectedly, hangs, or allocates unboundedly on garbage is an
  * executor-killer. Every decoder must return `None`/`Some` — never
  * escape an exception — on: pure random bytes, random bytes behind
  * a valid magic (reaching the deep parse paths), and valid streams
  * with random single-byte corruptions. Seeded, deterministic. */
class MediaFuzzSpec extends AnyFunSuite {

  private def withSeed[A](seed: Long)(f: scala.util.Random => A): A =
    f(new scala.util.Random(seed))

  private def decodesSafely(b: Array[Byte], tag: String): Unit = {
    try { Mpeg1.decode(b); () }
    catch { case e: Throwable => fail(s"Mpeg1 threw on $tag: $e") }
    try { MpegPs.demux(b); () }
    catch { case e: Throwable => fail(s"MpegPs threw on $tag: $e") }
    try { Mp2.decode(b); () }
    catch { case e: Throwable => fail(s"Mp2 threw on $tag: $e") }
    try { Mp3.decode(b); () }
    catch { case e: Throwable => fail(s"Mp3 threw on $tag: $e") }
  }

  test("pure random payloads never escape an exception") {
    withSeed(11) { rnd =>
      for (i <- 0 until 200) {
        val b = new Array[Byte](rnd.nextInt(4096))
        rnd.nextBytes(b)
        decodesSafely(b, s"random#$i")
      }
    }
  }

  test("random bytes behind valid magics reach the deep parse paths safely") {
    val magics = Seq[Array[Byte]](
      Array(0, 0, 1, 0xb3.toByte), // MPEG-1 video sequence header
      Array(0, 0, 1, 0xba.toByte), // MPEG-1 program stream pack
      Array(0xff.toByte, 0xfd.toByte), // Layer II header sync
      Array(0xff.toByte, 0xfb.toByte), // Layer III header sync
      Array(0xff.toByte, 0xff.toByte)) // Layer I header sync
    withSeed(23) { rnd =>
      for (m <- magics; i <- 0 until 100) {
        val body = new Array[Byte](rnd.nextInt(2048))
        rnd.nextBytes(body)
        decodesSafely(m ++ body, s"magic+random#$i")
      }
    }
  }

  test("valid streams with random byte corruptions decode or reject, never throw") {
    val video = Mpeg1.encodeFrames(
      Seq(
        Mpeg1.IFrame(Array.tabulate(16)(i => (i * 15 + 9) % 256), tempRef = 0),
        Mpeg1.PFrame(Seq(Mpeg1.PredMb(8, 8), Mpeg1.SkipMb,
          Mpeg1.PredMb(0, 0, residual = b => if (b == 0) Seq((0, 3)) else Nil),
          Mpeg1.IntraMb(Array(1, 2, 3, 4))), tempRef = 2),
        Mpeg1.BFrame(Seq(Mpeg1.BPred(Some((8, 0)), Some((0, 0))), Mpeg1.BSkip,
          Mpeg1.BPred(Some((0, 0)), None), Mpeg1.BIntra(Array(5, 6, 7, 8))),
          tempRef = 1)),
      mbCols = 2, mbRows = 2)
    val audio = Mp2.encode(9L, 2)
    val audio1 = Mp2.encode1(9L, 2)
    val audio3 = Mp3.encode3(9L, 2)
    val audio3s = Mp3.encode3(9L, 2, short = true)
    val ps = MpegPs.mux(video, audio)
    withSeed(37) { rnd =>
      for ((base, tag) <- Seq((video, "m1v"), (audio, "mp2"),
          (audio1, "mp1"), (audio3, "mp3"), (audio3s, "mp3s"),
          (ps, "ps")); i <- 0 until 150) {
        val b = base.clone()
        // flip 1-3 random bytes (may hit headers, VLC data, lengths)
        for (_ <- 0 to rnd.nextInt(3))
          b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        decodesSafely(b, s"$tag-corrupt#$i")
        decodesSafely(b.take(rnd.nextInt(b.length + 1)), s"$tag-trunc#$i")
      }
    }
  }

  test("a forged sequence header cannot demand huge plane allocations") {
    // 4095x4095 declared dims = ~16.8M coded px > MaxCodedPixels
    val w = new java.io.ByteArrayOutputStream()
    w.write(Array[Byte](0, 0, 1, 0xb3.toByte))
    // width 4095 / height 4095: fff fff, then aspect+rate nibbles
    w.write(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0x13, 0xff.toByte,
      0xff.toByte, 0xe0.toByte, 0x00))
    val forged = w.toByteArray
    assert(Mpeg1.isM1v(forged))
    assert(Mpeg1.decode(forged) === None)
    assert(4095L * 4095L > Mpeg1.MaxCodedPixels)
  }

  test("repeated picture headers cannot accumulate unbounded retained planes") {
    // dims just UNDER the per-picture cap (2880x2880 = 8.29M < 2^23)
    // with many ~8-byte picture headers: each retained frame is ~50 MB
    // of planes, so the CUMULATIVE budget must fail the stream closed.
    def stream(nPics: Int): Array[Byte] = {
      val w = new java.io.ByteArrayOutputStream()
      w.write(Array[Byte](0, 0, 1, 0xb3.toByte))
      // width=2880 height=2880 (0xB40B40), aspect=1 rate=1, bitrate
      // 0x3ffff + marker, vbv=0, constrained=0, no quant matrices
      w.write(Array[Byte](0xb4.toByte, 0x0b, 0x40, 0x11,
        0xff.toByte, 0xff.toByte, 0xe0.toByte, 0x00))
      for (_ <- 0 until nPics) // I-picture header, no slices (black frame)
        w.write(Array[Byte](0, 0, 1, 0, 0x00, 0x08, 0x00, 0x00))
      w.toByteArray
    }
    assert(2880L * 2880L < Mpeg1.MaxCodedPixels)
    // 4 x 8.29M px fits the 2^25 budget; the guard must not over-fire
    assert(Mpeg1.decode(stream(4)).exists(_.nFrames == 4))
    // a ~200-byte payload demanding ~1.6 GB of planes fails closed
    assert(Mpeg1.decode(stream(20)) === None)
  }
}
