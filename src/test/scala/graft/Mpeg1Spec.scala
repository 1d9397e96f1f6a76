package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Mpeg1

/** MPEG-1 video intra-frame sample decoder (the stub's last video
  * codec slot): the §2.4.4.2 reconstruction replayed first-principles
  * from the encode parameterization (the same replay the DuckDB
  * oracle runs), the separable IDCT pinned against a
  * direct-by-definition transcription, exact DC-only pixel round
  * trips, multi-macroblock DC prediction, and the decodeWav-style
  * strictness stance (out-of-scope streams are None, not noise). */
class Mpeg1Spec extends AnyFunSuite {

  /** Direct-by-definition 2-D IDCT — the standard's double sum, not
    * the production separable row/column passes. */
  private def directIdct(fc: Array[Int]): Array[Double] = {
    val out = new Array[Double](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += 0.25 * cu * cv * fc(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      out(y * 8 + x) = s
    }
    out
  }

  /** Independent replay of the reconstructed coefficients for the
    * graded entry's parameterization — written from the §2.4.4.2
    * formulas, not the decoder's code path. */
  private def expectedCoeff(id: Long, qs: Int, blk: Int, zz: Int): Int =
    if (zz == 0) {
      (if (blk < 4) ((id + 29 * blk) % 256).toInt else 128) * 8
    } else {
      val l0 = ((id + 5 * blk + 11 * zz) % 509).toInt - 254
      val lvl = if (l0 == 0) 7 else l0
      val w = Mpeg1.DefaultIntraQuant(Mpeg1.Zigzag(zz))
      var f = 2 * lvl * qs * w / 16
      if (f != 0 && (f & 1) == 0) f -= Integer.signum(f)
      math.max(-2048, math.min(2047, f))
    }

  test("DC-only streams round-trip to exact flat pixels, stats, dims, fps") {
    val dcs = Seq(Array(0, 255, 7, 200), Array(128, 128, 128, 128))
    val bytes = Mpeg1.encode(dcs, mbCols = 1, mbRows = 1, frameRateCode = 5)
    val info = Mpeg1.decode(bytes).getOrElse(fail("decode failed"))
    assert(info.width == 16 && info.height == 16 && info.nFrames == 2)
    assert(info.fps == 30.0 && info.durationMs == 2 * 1000.0 / 30.0)
    for ((dc, f) <- dcs.zipWithIndex; y <- 0 until 16; x <- 0 until 16) {
      val want = dc((y / 8) * 2 + x / 8)
      assert(info.frames(f).y(y * 16 + x) == want, s"f=$f ($x,$y)")
      // neutral chroma: BT.601 is the identity on Y
      assert(info.frames(f).cb((y / 2) * 8 + x / 2) == 128)
      assert(Mpeg1.pixelRgb(info.frames(f), x, y) == ((want, want, want)))
    }
    val luma = (b: Int) => 0.299 * b + 0.587 * b + 0.114 * b
    assert(math.abs(info.firstLuma - luma(0)) == 0.0)
    val mean0 = (luma(0) + luma(255) + luma(7) + luma(200)) / 4
    assert(math.abs(info.meanLuma - (mean0 + luma(128)) / 2) < 1e-9)
  }

  test("a stream without a sequence_end_code keeps its last bytes") {
    // the encoder terminates with 00 00 01 b7; stripping it leaves the
    // final slice running to end-of-buffer — decode must not clip the
    // last 3 real bytes (scanStartCodes end-extent regression)
    val dcs = Seq(Array(0, 255, 7, 200), Array(128, 1, 254, 64))
    val bytes = Mpeg1.encode(dcs, mbCols = 1, mbRows = 1, frameRateCode = 5)
    assert(bytes.takeRight(4).sameElements(Array[Byte](0, 0, 1, 0xb7.toByte)))
    val clipped = bytes.dropRight(4)
    val a = Mpeg1.decode(bytes).getOrElse(fail("full decode failed"))
    val b = Mpeg1.decode(clipped).getOrElse(fail("no-seq-end decode failed"))
    assert(b.nFrames == a.nFrames && b.meanLuma == a.meanLuma &&
      b.frames(1).y.sameElements(a.frames(1).y))
  }

  test("multi-macroblock frames: address increments and per-slice DC prediction") {
    // 2x2 macroblocks = 32x32 px, 16 luma blocks in block-raster order
    val dc = Array.tabulate(16)(i => (i * 16 + 3) % 256)
    val info = Mpeg1.decode(Mpeg1.encode(Seq(dc), mbCols = 2, mbRows = 2))
      .getOrElse(fail("decode failed"))
    assert(info.width == 32 && info.height == 32)
    for (y <- 0 until 32; x <- 0 until 32)
      assert(info.frames(0).y(y * 32 + x) == dc((y / 8) * 4 + x / 8), s"($x,$y)")
  }

  test("reconstructed coefficients match the first-principles replay (table + escape + oddify + saturate)") {
    val zzs = Seq(1, 3, 8, 27, 63)
    // id sweep covers table-coded and both escape forms, both signs,
    // the lvl==0->7 rewrite, and (id=508+246=...) saturation at high qs
    for (id <- Seq(0L, 1L, 7L, 131L, 254L, 263L, 300L, 509L)) {
      val qs = 1 + (id % 31).toInt
      val dcv = Array.tabulate(4)(b => ((id + 29 * b) % 256).toInt)
      val bytes = Mpeg1.encode(Seq(dcv), mbCols = 1, mbRows = 1,
        quantizerScale = qs,
        ac = (_, _, blk) => zzs.map { zz =>
          val l0 = ((id + 5 * blk + 11 * zz) % 509).toInt - 254
          (zz, if (l0 == 0) 7 else l0)
        })
      val info = Mpeg1.decode(bytes, keepCoeffs = true).getOrElse(fail(s"id=$id"))
      val blocks = info.frames(0).coeffs
      assert(blocks.size == 6)
      for ((mb, blk, f) <- blocks) {
        assert(mb == 0)
        assert(f(0) == expectedCoeff(id, qs, blk, 0), s"id=$id blk=$blk DC")
        for (zz <- zzs)
          assert(f(Mpeg1.Zigzag(zz)) == expectedCoeff(id, qs, blk, zz),
            s"id=$id blk=$blk zz=$zz")
        // untouched positions reconstruct to exactly zero
        val touched = (0 +: zzs.map(Mpeg1.Zigzag)).toSet
        for (p <- 0 until 64 if !touched.contains(p))
          assert(f(p) == 0, s"id=$id blk=$blk pos=$p")
      }
    }
  }

  test("saturation clamps to [-2048, 2047] on oversized levels") {
    val big = Mpeg1.reconstructAc(254, 31, 83)   // ~81k pre-clamp
    val neg = Mpeg1.reconstructAc(-254, 31, 83)
    assert(big == 2047 && neg == -2048)
    // oddification subtracts toward zero on even values
    assert(Mpeg1.reconstructAc(1, 8, 16) == 15)  // 2*1*8*16/16 = 16 -> 15
    assert(Mpeg1.reconstructAc(-1, 8, 16) == -15)
    assert(Mpeg1.reconstructAc(1, 1, 8) == 1)    // 2*1*1*8/16 = 1, already odd
    assert(Mpeg1.reconstructAc(1, 1, 7) == 0)    // 14/16 truncates to 0, no oddify
  }

  test("decoded pixels match a direct-by-definition IDCT of the reconstructed coefficients") {
    val zzs = Seq(1, 5, 20, 40)
    val id = 42L
    val bytes = Mpeg1.encode(Seq(Array(100, 50, 200, 12)), mbCols = 1, mbRows = 1,
      quantizerScale = 4,
      ac = (_, _, blk) => zzs.map(zz => (zz, ((id + 3 * blk + zz) % 19).toInt - 9))
        .filter(_._2 != 0))
    val info = Mpeg1.decode(bytes, keepCoeffs = true).getOrElse(fail("decode"))
    val fr = info.frames(0)
    for ((_, blk, fc) <- fr.coeffs) {
      val direct = directIdct(fc)
      for (j <- 0 until 8; i <- 0 until 8) {
        val got =
          if (blk < 4) fr.y((((blk >> 1) * 8) + j) * 16 + (blk & 1) * 8 + i)
          else if (blk == 4) fr.cb(j * 8 + i)
          else fr.cr(j * 8 + i)
        val want = math.max(0.0, math.min(255.0, direct(j * 8 + i)))
        // got = round(clamp(separable)); separable agrees with the
        // direct form to ~1e-12, so the rounded value sits within
        // half a step of the direct-form pixel
        assert(math.abs(got - want) <= 0.5 + 1e-9, s"blk=$blk ($i,$j)")
      }
    }
  }

  test("stream-loaded intra quantizer matrix is applied (zigzag transmission round trip)") {
    val flat16 = Array.fill(64)(16)
    val bytes = Mpeg1.encode(Seq(Array(10, 20, 30, 40)), mbCols = 1, mbRows = 1,
      quantizerScale = 2, ac = (_, _, _) => Seq((1, 3), (9, -5)),
      intraMatrix = Some(flat16))
    val info = Mpeg1.decode(bytes, keepCoeffs = true).getOrElse(fail("decode"))
    val f = info.frames(0).coeffs.head._3
    // 2*3*2*16/16 = 12 -> oddify 11; 2*(-5)*2*16/16 = -20 -> -19
    assert(f(Mpeg1.Zigzag(1)) == 11 && f(Mpeg1.Zigzag(9)) == -19)
  }

  test("strictness: P-pictures, truncation and garbage all return None") {
    val good = Mpeg1.encode(Seq(Array(1, 2, 3, 4)), mbCols = 1, mbRows = 1)
    assert(Mpeg1.decode(good).isDefined)
    // patch picture_coding_type I->P (byte 5 after the 00 00 01 00
    // picture start code: 2 temporal-ref bits, 3 type bits, 3 vbv bits)
    val p = good.clone()
    val pic = (0 until p.length - 3).find(i =>
      p(i) == 0 && p(i + 1) == 0 && p(i + 2) == 1 && p(i + 3) == 0).get
    assert(p(pic + 5) == 0x0f.toByte)
    p(pic + 5) = 0x17.toByte
    assert(Mpeg1.decode(p) === None)
    // dropping just the 4-byte sequence_end_code is NOT an error (the
    // final slice legally runs to end-of-buffer); cutting past it into
    // real slice data is
    assert(Mpeg1.decode(good.dropRight(6)) === None) // truncated slice
    assert(Mpeg1.decode(Array[Byte](1, 2, 3, 4)) === None)
    assert(Mpeg1.decode(null) === None)
    assert(Mpeg1.isM1v(good) && !Mpeg1.isM1v(Array[Byte](0, 0, 1, 0)))
  }

  // ─── P-pictures (motion compensation) ───

  /** 16 distinct flat luma blocks (2×2 MBs = 32×32 px). */
  private val RefDc = Array.tabulate(16)(i => (i * 15 + 11) % 256)

  private def decodeIp(pMbs: Seq[Mpeg1.PMb], qs: Int = 8, fCode: Int = 3,
                       fullPel: Boolean = false,
                       keepCoeffs: Boolean = false): Mpeg1.M1vInfo =
    Mpeg1.decode(Mpeg1.encodeFrames(
      Seq(Mpeg1.IFrame(RefDc), Mpeg1.PFrame(pMbs, fCode, fullPel)),
      mbCols = 2, mbRows = 2, quantizerScale = qs), keepCoeffs)
      .getOrElse(fail("decode failed"))

  test("VLC tables are prefix-free; CBP covers 1..63; spot codes match the standard") {
    assert(Mpeg1.prefixFree(Mpeg1.cbpTableCodes))
    assert(Mpeg1.cbpTableValues.sorted == (1 to 63).toList)
    val cbp = Mpeg1.cbpTableCodes.zip(Mpeg1.cbpTableValues).toMap.map(_.swap)
    assert(cbp(60) == "111" && cbp(1) == "01011" && cbp(63) == "001100" &&
      cbp(32) == "1010" && cbp(59) == "000000010")
    assert(Mpeg1.prefixFree(Mpeg1.motionTableCodes))
    assert(Mpeg1.motionCodeOf(0) == "1" && Mpeg1.motionCodeOf(1) == "010" &&
      Mpeg1.motionCodeOf(-1) == "011" && Mpeg1.motionCodeOf(4) == "0000110" &&
      Mpeg1.motionCodeOf(-16) == "00000011001")
  }

  test("pred-m full-pel motion: every pixel is the reference shifted by the vector") {
    // recon units are half-pels: (dx,dy) px = recon (2dx, 2dy).
    // MB0 (8,4), MB1 (-16,0), MB2 (0,-8), MB3 (-8,-4): in-bounds per MB
    val mvs = Seq((8, 4), (-16, 0), (0, -8), (-8, -4))
    val info = decodeIp(mvs.map { case (dx, dy) => Mpeg1.PredMb(2 * dx, 2 * dy) })
    assert(info.nFrames == 2 && info.frames(1).picType == 2)
    val ref = info.frames(0).y
    val p = info.frames(1).y
    for (my <- 0 until 2; mx <- 0 until 2; j <- 0 until 16; i <- 0 until 16) {
      val (dx, dy) = mvs(my * 2 + mx)
      val x = mx * 16 + i; val y = my * 16 + j
      assert(p(y * 32 + x) == ref((y + dy) * 32 + x + dx), s"($x,$y)")
    }
    // neutral chroma survives any chroma vector
    assert(info.frames(1).cb.forall(_ == 128) && info.frames(1).cr.forall(_ == 128))
  }

  test("half-pel motion averages with rounding away from zero") {
    // MB0: recon (1, 0) = right half-pel; MB3: recon (1, 1) = both
    val info = decodeIp(Seq(
      Mpeg1.PredMb(1, 0), Mpeg1.PredMb(-2, 0),
      Mpeg1.PredMb(0, -2), Mpeg1.PredMb(-1, -1)))
    val ref = info.frames(0).y
    val p = info.frames(1).y
    for (j <- 0 until 16; i <- 0 until 16) {
      // MB0 at (0,0): pred = (ref[y][x] + ref[y][x+1] + 1) >> 1
      assert(p(j * 32 + i) ==
        ((ref(j * 32 + i) + ref(j * 32 + i + 1) + 1) >> 1), s"mb0 ($i,$j)")
      // MB3 at (16,16): recon (-1,-1) -> full (-1,-1) + halves (1,1)
      val x = 16 + i; val y = 16 + j
      val s = ref((y - 1) * 32 + (x - 1)) + ref((y - 1) * 32 + x) +
        ref(y * 32 + (x - 1)) + ref(y * 32 + x)
      assert(p(y * 32 + x) == ((s + 2) >> 2), s"mb3 ($i,$j)")
    }
  }

  test("pred-mc residuals: clamp(round(pred + IDCT)), coeff taps match reconstructNonIntra") {
    val qs = 7 // odd: (2L+sign)*qs stays odd, no oddification
    // DC-only residuals on luma blocks 0 and 3 of each MB (cbp 100100),
    // level +/-1 exercises the dct_coeff_first "1s" special form
    def res(b: Int): Seq[(Int, Int)] =
      if (b == 0) Seq((0, 1)) else if (b == 3) Seq((0, -3)) else Nil
    val info = decodeIp(
      Seq.fill(4)(Mpeg1.PredMb(0, 0, residual = res)), qs = qs, keepCoeffs = true)
    val ref = info.frames(0).y
    val p = info.frames(1).y
    val v1 = Mpeg1.reconstructNonIntra(1, qs, 16)   // (2+1)*7 = 21
    val v3 = Mpeg1.reconstructNonIntra(-3, qs, 16)  // (-6-1)*7 = -49
    assert(v1 == 21 && v3 == -49)
    val taps = info.frames(1).coeffs
    assert(taps.size == 8 && taps.forall { case (_, b, f) =>
      (b == 0 || b == 3) && f(0) == (if (b == 0) v1 else v3) &&
        f.drop(1).forall(_ == 0)
    })
    for (my <- 0 until 2; mx <- 0 until 2; j <- 0 until 16; i <- 0 until 16) {
      val x = mx * 16 + i; val y = my * 16 + j
      val blkInMb = (j / 8) * 2 + i / 8
      val want = blkInMb match {
        case 0 => math.max(0, math.min(255, math.round(ref(y * 32 + x) + v1 / 8.0).toInt))
        case 3 => math.max(0, math.min(255, math.round(ref(y * 32 + x) + v3 / 8.0).toInt))
        case _ => ref(y * 32 + x)
      }
      assert(p(y * 32 + x) == want, s"($x,$y)")
    }
  }

  test("skipped MBs copy co-located pixels and reset the motion predictor") {
    // MB0 carries a nonzero vector; MB1/MB2 skip; MB3's delta-0 vector
    // must decode to ZERO (predictor reset by the skips), not MB0's
    val info = decodeIp(Seq(
      Mpeg1.PredMb(16, 16), Mpeg1.SkipMb, Mpeg1.SkipMb, Mpeg1.PredMb(0, 0)))
    val ref = info.frames(0).y
    val p = info.frames(1).y
    for (j <- 0 until 16; i <- 0 until 16) {
      assert(p(j * 32 + i) == ref((j + 8) * 32 + i + 8), s"mb0 ($i,$j)")
      assert(p(j * 32 + 16 + i) == ref(j * 32 + 16 + i), s"mb1 ($i,$j)")
      assert(p((16 + j) * 32 + i) == ref((16 + j) * 32 + i), s"mb2 ($i,$j)")
      assert(p((16 + j) * 32 + 16 + i) == ref((16 + j) * 32 + 16 + i), s"mb3 ($i,$j)")
    }
  }

  test("intra-in-P replaces the MB and chains DC prediction from a reset predictor") {
    val newDc = Array(40, 80, 120, 160)
    val info = decodeIp(Seq(
      Mpeg1.PredMb(0, 0), Mpeg1.IntraMb(newDc),
      Mpeg1.IntraMb(newDc.map(_ + 10)), Mpeg1.PredMb(0, 0)))
    val p = info.frames(1).y
    for (j <- 0 until 16; i <- 0 until 16) {
      val b = (j / 8) * 2 + i / 8
      assert(p(j * 32 + 16 + i) == newDc(b), s"mb1 ($i,$j)")
      assert(p((16 + j) * 32 + i) == newDc(b) + 10, s"mb2 ($i,$j)")
    }
  }

  test("pred-c and +quant types: zero vector, mid-slice quantizer switch persists") {
    val qs2 = 11
    def resA(b: Int): Seq[(Int, Int)] = if (b == 1) Seq((0, 5)) else Nil
    def resB(b: Int): Seq[(Int, Int)] = if (b == 2) Seq((0, 5)) else Nil
    val info = decodeIp(Seq(
      Mpeg1.PredMb(0, 0, residual = resA, noMv = true, newQs = Some(qs2)),
      Mpeg1.PredMb(0, 0, residual = resB), // inherits qs2, not the slice qs
      Mpeg1.PredMb(0, 0), Mpeg1.PredMb(0, 0)), qs = 9, keepCoeffs = true)
    val v = Mpeg1.reconstructNonIntra(5, qs2, 16) // 11*11 = 121
    assert(v == 121)
    assert(info.frames(1).coeffs.map { case (mb, b, f) => (mb, b, f(0)) } ==
      Vector((0, 1, v), (1, 2, v)))
  }

  test("full_pel doubles the reconstructed vector at use time") {
    // fullPel: recon value 4 displaces by 4 FULL pels (8 half-pels)
    val info = decodeIp(Seq(
      Mpeg1.PredMb(4, 0), Mpeg1.PredMb(-4, 0),
      Mpeg1.PredMb(0, 0), Mpeg1.PredMb(0, 0)), fullPel = true)
    val ref = info.frames(0).y
    val p = info.frames(1).y
    for (j <- 0 until 16; i <- 0 until 16)
      assert(p(j * 32 + i) == ref(j * 32 + i + 4), s"($i,$j)")
  }

  test("motion wraparound: the big path reconstructs targets the little delta cannot reach") {
    // fCode 1 (f=1): recon range [-16, 15]. prev 15 -> target -16 has
    // raw delta -31; the encoder wraps to +1 and the decoder's range
    // check must take the big branch.
    val info = decodeIp(Seq(
      Mpeg1.PredMb(15, 0), Mpeg1.PredMb(0, 0), Mpeg1.PredMb(0, 0),
      Mpeg1.PredMb(0, 0)), fCode = 1)
    val ref = info.frames(0).y
    val p = info.frames(1).y
    // recon 15 -> full 7, half 1 at MB0 (x in 0..15: x+8 <= 23 in-bounds)
    for (j <- 0 until 16; i <- 0 until 16) {
      assert(p(j * 32 + i) ==
        ((ref(j * 32 + i + 7) + ref(j * 32 + i + 8) + 1) >> 1), s"($i,$j)")
    }
    val info2 = decodeIp(Seq(
      Mpeg1.PredMb(15, 0), Mpeg1.PredMb(-16, 0),
      Mpeg1.PredMb(0, 0), Mpeg1.PredMb(0, 0)), fCode = 1)
    val p2 = info2.frames(1).y
    val ref2 = info2.frames(0).y
    // MB1 at x in 16..31 with recon -16 = -8 px
    for (j <- 0 until 16; i <- 0 until 16)
      assert(p2(j * 32 + 16 + i) == ref2(j * 32 + 16 + i - 8), s"wrap ($i,$j)")
  }

  // ─── B-pictures (bidirectional prediction) ───

  /** P-frame of four intra MBs with distinct DCs — the backward
    * anchor whose content differs from the I-frame. */
  private def pAnchorDc(m: Int, b: Int): Int = (70 + m * 40 + b * 9) % 256
  private def pAnchor: Mpeg1.PFrame = Mpeg1.PFrame(
    (0 until 4).map(m => Mpeg1.IntraMb(Array.tabulate(4)(b => pAnchorDc(m, b)))),
    tempRef = 2)

  private def decodeIpb(bMbs: Seq[Mpeg1.BMb], qs: Int = 8,
                        keepCoeffs: Boolean = false): Mpeg1.M1vInfo =
    Mpeg1.decode(Mpeg1.encodeFrames(
      Seq(Mpeg1.IFrame(RefDc, tempRef = 0), pAnchor,
        Mpeg1.BFrame(bMbs, tempRef = 1)),
      mbCols = 2, mbRows = 2, quantizerScale = qs), keepCoeffs)
      .getOrElse(fail("decode failed"))

  /** The backward anchor's flat value at pixel (x, y). */
  private def pAnchorPx(x: Int, y: Int): Int = {
    val m = (y / 16) * 2 + x / 16
    pAnchorDc(m, ((y % 16) / 8) * 2 + (x % 16) / 8)
  }

  test("B-picture: fwd/bwd/interp/intra MBs, display-order reassembly") {
    val info = decodeIpb(Seq(
      Mpeg1.BPred(Some((16, 0)), None),            // fwd +8px right from I
      Mpeg1.BPred(None, Some((0, 16))),            // bwd +8px down from P
      Mpeg1.BPred(Some((0, 0)), Some((0, 0))),     // interp of co-located
      Mpeg1.BIntra(Array(1, 2, 3, 4))))
    // coding order I,P,B -> display order I,B,P via temporal_reference
    assert(info.frames.map(_.picType) == Vector(1, 3, 2))
    assert(info.frames.map(_.temporalRef) == Vector(0, 1, 2))
    val iRef = info.frames(0).y
    val b = info.frames(1).y
    for (j <- 0 until 16; i <- 0 until 16) {
      assert(b(j * 32 + i) == iRef(j * 32 + i + 8), s"fwd ($i,$j)")
      val x1 = 16 + i
      assert(b(j * 32 + x1) == pAnchorPx(x1, j + 8), s"bwd ($i,$j)")
      val y2 = 16 + j
      assert(b(y2 * 32 + i) ==
        ((iRef(y2 * 32 + i) + pAnchorPx(i, y2) + 1) >> 1), s"interp ($i,$j)")
      assert(b(y2 * 32 + x1) == Array(1, 2, 3, 4)((j / 8) * 2 + i / 8),
        s"intra ($i,$j)")
    }
  }

  test("B-skip repeats the previous MB's prediction directions and vectors") {
    // 4×1 MBs (64×16 px) so the skipped MBs sit in the interior and
    // the inherited +8px forward vector stays in-picture everywhere
    val iDc = Array.tabulate(16)(i => (i * 13 + 7) % 256)
    val pDc = (m: Int, b: Int) => (60 + m * 31 + b * 11) % 256
    val info = Mpeg1.decode(Mpeg1.encodeFrames(
      Seq(
        Mpeg1.IFrame(iDc, tempRef = 0),
        Mpeg1.PFrame((0 until 4).map(m =>
          Mpeg1.IntraMb(Array.tabulate(4)(b => pDc(m, b)))), tempRef = 2),
        Mpeg1.BFrame(Seq(
          Mpeg1.BPred(Some((16, 0)), Some((0, 0))), // interp, fwd +8px right
          Mpeg1.BSkip, Mpeg1.BSkip,
          Mpeg1.BPred(Some((0, 0)), None)), tempRef = 1)),
      mbCols = 4, mbRows = 1)).getOrElse(fail("decode failed"))
    def iPx(x: Int, y: Int) = iDc((y / 8) * 8 + x / 8)
    def pPx(x: Int, y: Int) = pDc(x / 16, (y / 8) * 2 + (x % 16) / 8)
    val b = info.frames(1).y
    assert(info.frames(1).picType == 3)
    // skipped MB1 (x 16..31) and MB2 (x 32..47): same interp with fwd
    // recon (16,0) and bwd (0,0) AT THEIR OWN positions — the
    // predictors survive the skips
    for (j <- 0 until 16; i <- 0 until 16) {
      val x1 = 16 + i
      assert(b(j * 64 + x1) ==
        ((iPx(x1 + 8, j) + pPx(x1, j) + 1) >> 1), s"mb1 ($i,$j)")
      val x2 = 32 + i
      assert(b(j * 64 + x2) ==
        ((iPx(x2 + 8, j) + pPx(x2, j) + 1) >> 1), s"mb2 ($i,$j)")
    }
  }

  test("B residuals add to the interpolated prediction; +quant switches persist") {
    val qs2 = 13
    def res(b: Int): Seq[(Int, Int)] = if (b == 2) Seq((0, 3)) else Nil
    val info = decodeIpb(Seq(
      Mpeg1.BPred(Some((0, 0)), Some((0, 0)), residual = res, newQs = Some(qs2)),
      Mpeg1.BPred(Some((0, 0)), Some((0, 0)), residual = res), // inherits qs2
      Mpeg1.BPred(Some((0, 0)), None),
      Mpeg1.BPred(None, Some((0, 0)))), qs = 9, keepCoeffs = true)
    val v = Mpeg1.reconstructNonIntra(3, qs2, 16) // 7*13 = 91
    assert(v == 91)
    assert(info.frames(1).coeffs.map { case (mb, b, f) => (mb, b, f(0)) } ==
      Vector((0, 2, v), (1, 2, v)))
    val iRef = info.frames(0).y
    val b = info.frames(1).y
    // MB0 block 2 (x 0..7, y 8..15): clamp(round(interp + 91/8))
    for (j <- 8 until 16; i <- 0 until 8) {
      val interp = (iRef(j * 32 + i) + pAnchorPx(i, j) + 1) >> 1
      assert(b(j * 32 + i) ==
        math.max(0, math.min(255, math.round(interp + v / 8.0).toInt)), s"($i,$j)")
    }
  }

  test("D-pictures: DC-only syntax round-trips to exact flat pixels") {
    val dcs = Seq(Array.tabulate(16)(i => (i * 17 + 3) % 256),
      Array.tabulate(16)(i => (255 - i * 9) % 256))
    val info = Mpeg1.decode(Mpeg1.encodeFrames(
      dcs.map(Mpeg1.DFrame(_)), mbCols = 2, mbRows = 2))
      .getOrElse(fail("decode failed"))
    assert(info.nFrames == 2 && info.frames.forall(_.picType == 4))
    for ((dc, f) <- dcs.zipWithIndex; y <- 0 until 32; x <- 0 until 32)
      assert(info.frames(f).y(y * 32 + x) == dc((y / 8) * 4 + x / 8), s"f=$f ($x,$y)")
    // DC prediction chains across MBs and frames are independent
    // (slice reset), and chroma stays neutral
    assert(info.frames(1).cb.forall(_ == 128))
    // decodeMedia tags the DC-only syntax
    import TestSpark.spark
    import spark.implicits._
    val media = Seq((1L, Mpeg1.encodeFrames(dcs.map(Mpeg1.DFrame(_)),
      mbCols = 2, mbRows = 2))).toDF("media_id", "data")
    val row = graft.multimodal.Multimodal.decodeMedia(media).collect()(0)
    assert(row.getString(1) == "m1v" && row.getString(14) == "dc")
  }

  test("strictness: anchor-less B-pictures and out-of-picture vectors return None") {
    val good = Mpeg1.encodeFrames(
      Seq(Mpeg1.IFrame(RefDc), Mpeg1.PFrame(Seq.fill(4)(Mpeg1.PredMb(0, 0)))),
      mbCols = 2, mbRows = 2)
    assert(Mpeg1.decode(good).isDefined)
    // patch the SECOND picture header P -> B (type 3); a B-picture
    // needs TWO prior anchors and only the I preceded it. The 10-bit
    // temporal_reference is 1, so byte 5 is 01|010|111 = 0x57
    val b = good.clone()
    val pics = (0 until b.length - 3).filter(i =>
      b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1 && b(i + 3) == 0)
    assert(pics.size == 2 && b(pics(1) + 5) == 0x57.toByte)
    b(pics(1) + 5) = 0x5f.toByte
    assert(Mpeg1.decode(b) === None)
    // a vector referencing outside the coded picture is rejected
    val oob = Mpeg1.encodeFrames(
      Seq(Mpeg1.IFrame(RefDc),
        Mpeg1.PFrame(Seq(Mpeg1.PredMb(-2, 0), Mpeg1.PredMb(0, 0),
          Mpeg1.PredMb(0, 0), Mpeg1.PredMb(0, 0)))),
      mbCols = 2, mbRows = 2)
    assert(Mpeg1.decode(oob) === None)
  }

  test("decodeMedia routes MPEG-1 video through the real intra decoder") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq(
      (1L, Mpeg1.encode(Seq(Array(9, 9, 9, 9), Array(30, 30, 30, 30)),
        mbCols = 1, mbRows = 1)),
      (2L, graft.multimodal.MediaCodecs.encodeAviDib(
        Array(Array.fill(4 * 2 * 3)(' '.toByte)), width = 4, height = 2,
        usecPerFrame = 40000)))
      .toDF("media_id", "data")
    val rows = graft.multimodal.Multimodal.decodeMedia(media)
      .orderBy($"media_id")
      .select($"media_id", $"format", $"video_codec", $"width", $"height",
        $"n_frames", $"mean_luma", $"first_luma")
      .collect()
    assert(rows(0).getString(1) == "m1v" && rows(0).getString(2) == "intra")
    assert(rows(0).getInt(3) == 16 && rows(0).getInt(4) == 16)
    assert(rows(0).getLong(5) == 2L)
    val luma = (b: Int) => 0.299 * b + 0.587 * b + 0.114 * b
    assert(math.abs(rows(0).getDouble(6) - (luma(9) + luma(30)) / 2) < 1e-9)
    assert(rows(0).getDouble(7) == luma(9))
    // AVI still routes through the container walk, not the MPEG path
    assert(rows(1).getString(1) == "avi" && rows(1).getString(2) == "dib")
  }
}
