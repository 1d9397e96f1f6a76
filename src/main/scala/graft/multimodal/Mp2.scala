package graft.multimodal

/** MPEG-1 Audio Layer I and Layer II (ISO/IEC 11172-3) SAMPLE
  * decoder — the compressed-audio slot VERDICT r10 #4 asked to take
  * off the stub: real bitstream parse (header walk, bit allocation,
  * scfsi, scalefactors, sample codes), standard-exact requantization
  * to subband samples, and the §2.4.3.2 polyphase synthesis
  * filterbank to PCM. Layer I is the simpler sibling: 4-bit
  * allocations selecting 2^nb − 1 level quantizers (the SAME
  * ungrouped [[Quant]] family — C = 2^nb/(2^nb − 1), D = 2^(1−nb)),
  * one 6-bit scalefactor per allocated subband per frame, 384
  * samples/frame (12 filterbank steps). Pure JVM byte/float math,
  * executor-safe, zero dependencies — the same `mapPartitions`
  * operator shape as every [[MediaCodecs]] decoder.
  *
  * Exactness contract (what is standard, what is not):
  *  - **Bitstream + requantization are standard-exact.** Frame
  *    layout, Table B.2a bit-allocation classes (sblimit 27: subbands
  *    0-2 nbal 4, 3-10 nbal 4, 11-22 nbal 3, 23-26 nbal 2), grouped
  *    degrouping (3/5/9 levels in 5/7/10-bit triplet codes), Table B.1
  *    scalefactors `2·2^(-idx/3)`, and the requantization
  *    `s = sf · C · (code/2^(k-1) − 1 + D)` with `C = 2^k/levels`,
  *    `D = 0.5` (grouped) / `2^(1−k)` (ungrouped) follow the spec; the
  *    `multimodal_decode_mp2` entry grades every decoded subband
  *    sample against a DuckDB replay of these formulas.
  *  - **The synthesis ALGORITHM is the standard's** (64-point
  *    matrixing `N[i][k] = cos((16+i)(2k+1)π/64)` into a 1024-slot V
  *    FIFO, U gather, 512-tap window, 16-term sum per output sample),
  *    but the prototype window COEFFICIENTS are a documented stand-in:
  *    ISO Table B.3 is a designed (non-closed-form) table that is not
  *    derivable offline, so [[PrototypeWindow]] is a Blackman-windowed
  *    sinc at the same cutoff (π/64), unity-sum normalized. Swapping
  *    in the B.3 coefficients makes the PCM bit-compliant with
  *    reference decoders; with the stand-in it is a real, deterministic
  *    subband synthesis with the standard's structure (spec-pinned
  *    against a direct-by-definition reference implementation).
  *
  * Scope: MPEG-1, Layers I/II, mono, no CRC, 44.1/48 kHz (Layer II
  * additionally requires a B.2a-served bitrate; [[encode]] emits
  * Layer II 48 kHz/192 kbps, [[encode1]] Layer I 48 kHz/192 kbps);
  * anything else returns `None` (routes to the stub, same stance as
  * `decodeWav`/`decodeMp3`).
  */
object Mp2 extends Serializable {

  /** One quantization step class: `levels` reconstruction levels,
    * grouped iff 3/5/9 (three samples share one code). `k` is the
    * per-sample code width (`2^k − 1 = levels` ungrouped; smallest
    * width fitting a sub-code grouped); requantization constants per
    * ISO §2.4.3.3 / Annex B Table B.4. */
  final case class Quant(levels: Int, grouped: Boolean) {
    val k: Int = 32 - Integer.numberOfLeadingZeros(levels)
    val codeBits: Int =
      if (grouped) levels match { case 3 => 5; case 5 => 7; case 9 => 10 }
      else k
    val C: Double = (1L << k).toDouble / levels
    val D: Double = if (grouped) 0.5 else 1.0 / (1L << (k - 1)).toDouble
    val half: Int = 1 << (k - 1)
    /** Requantized subband sample for `code` under scalefactor `sf`. */
    def dequant(code: Int, sf: Double): Double =
      sf * (C * (code.toDouble / half - 1.0 + D))
  }

  private def q(levels: Int): Quant =
    Quant(levels, grouped = levels == 3 || levels == 5 || levels == 9)

  /** Table B.2a quantizer menus per subband class (index 0 = no
    * allocation; sblimit 27). */
  private val StepsA = Array(3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767, 65535)
  private val StepsB = Array(3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535)
  private val StepsC = Array(3, 5, 7, 9, 15, 31, 63, 65535)
  private val StepsD = Array(3, 5, 65535)

  val SbLimit = 27

  /** (nbal, quantizer menu) for each of the 27 subbands. */
  private def sbClass(sb: Int): (Int, Array[Int]) =
    if (sb < 3) (4, StepsA)
    else if (sb < 11) (4, StepsB)
    else if (sb < 23) (3, StepsC)
    else (2, StepsD)

  /** Table B.1 scalefactors: `2 · 2^(-idx/3)`, idx 0..62. */
  def scaleFactor(idx: Int): Double = 2.0 * math.pow(2.0, -idx / 3.0)

  // ─── Bit I/O (MSB-first, as the spec transmits) ───

  private final class BitReader(bytes: Array[Byte], startBit: Int, endBit: Int) {
    private var pos = startBit
    def read(n: Int): Int = {
      if (pos + n > endBit) throw new IllegalStateException("bitstream overrun")
      var v = 0; var i = 0
      while (i < n) {
        v = (v << 1) | ((bytes(pos >>> 3) >>> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
  }

  private final class BitWriter(bytes: Array[Byte], startBit: Int) {
    private var pos = startBit
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        if (((v >>> i) & 1) != 0)
          bytes(pos >>> 3) = (bytes(pos >>> 3) | (1 << (7 - (pos & 7)))).toByte
        pos += 1; i -= 1
      }
    }
  }

  // ─── Synthesis filterbank (§2.4.3.2) ───

  /** Matrixing coefficients `N[i][k] = cos((16+i)(2k+1)π/64)`. */
  private lazy val Nmat: Array[Array[Double]] =
    Array.tabulate(64, 32)((i, kk) => math.cos((16 + i) * (2 * kk + 1) * math.Pi / 64.0))

  /** Stand-in prototype window (see the object scaladoc): Blackman-
    * windowed sinc, cutoff π/64 (half a subband width), unity-sum
    * normalized. Deterministic closed form; replace with ISO Table B.3
    * for reference-decoder bit-compliance. */
  lazy val PrototypeWindow: Array[Double] = {
    val w = Array.tabulate(512) { i =>
      val t = (i - 255.5) / 64.0
      val sinc = math.sin(math.Pi * t) / (math.Pi * t) // t never 0 at half-offset
      val u = i / 511.0
      val bl = 0.42 - 0.5 * math.cos(2 * math.Pi * u) + 0.08 * math.cos(4 * math.Pi * u)
      sinc * bl
    }
    val sum = w.sum
    w.map(_ / sum)
  }

  /** Streaming synthesis state: the 1024-slot V FIFO. One [[step]] per
    * 32-subband-sample vector → 32 PCM samples, exactly the standard's
    * shift / matrix / gather / window / sum flow. */
  final class Synthesizer(window: Array[Double] = PrototypeWindow) {
    require(window.length == 512, "prototype window must have 512 taps")
    private val v = new Array[Double](1024)
    def step(s: Array[Double], out: Array[Double], off: Int): Unit = {
      System.arraycopy(v, 0, v, 64, 960) // shift by 64
      var i = 0
      while (i < 64) {
        val row = Nmat(i)
        var acc = 0.0; var kk = 0
        while (kk < 32) { acc += row(kk) * s(kk); kk += 1 }
        v(i) = acc; i += 1
      }
      var j = 0
      while (j < 32) {
        var acc = 0.0; var b = 0
        while (b < 8) {
          // U[64b + j] = V[128b + j]; U[64b + 32 + j] = V[128b + 96 + j]
          acc += window(64 * b + j) * v(128 * b + j)
          acc += window(64 * b + 32 + j) * v(128 * b + 96 + j)
          b += 1
        }
        out(off + j) = acc
        j += 1
      }
    }
  }

  // ─── Decode ───

  /** Decoded Layer I/II stream: header facts, every requantized
    * subband sample (`subbands(frame)(t·32 + sb)` with t the
    * filterbank step — 36/frame for Layer II (granule·3 + j),
    * 12/frame for Layer I; zeros where unallocated), and the
    * synthesized PCM (1152 or 384 samples/frame). */
  final case class Mp2Info(sampleRate: Int, channels: Int, bitrateKbps: Int,
                           nFrames: Int, subbands: Array[Array[Double]],
                           pcm: Array[Double], layer: Int = 2)

  /** Layer I/II sniff: a valid MPEG-1 Layer I or II mono no-CRC
    * header at byte 0 (byte 1 is 0xFF for Layer I, 0xFD for II). */
  def isMp2(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      ((bytes(1) & 0xff) == 0xfd || (bytes(1) & 0xff) == 0xff)

  /** Decode an MPEG-1 Layer I or II mono stream (strict, like
    * [[MediaCodecs.decodeMp3]]: every byte must belong to a frame,
    * constant header facts across frames). */
  def decode(bytes: Array[Byte]): Option[Mp2Info] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val pcm = scala.collection.mutable.ArrayBuffer.empty[Double]
      val synth = new Synthesizer()
      var pos = 0
      var sr = -1; var kbps = -1; var layer = -1
      while (pos < bytes.length) {
        val h = MediaCodecs.mp3FrameHeader(bytes, pos).getOrElse(return None)
        // scope gate: MPEG-1 Layer I/II mono no-CRC at 44.1/48 kHz
        if (h.version != 3 || (h.layer != 1 && h.layer != 2) ||
            h.channels != 1 || (bytes(pos + 1) & 1) != 1 ||
            (h.sampleRate != 44100 && h.sampleRate != 48000)) return None
        if (sr < 0) { sr = h.sampleRate; kbps = h.bitrateKbps; layer = h.layer }
        else if (h.sampleRate != sr || h.layer != layer) return None
        if (pos + h.frameLen > bytes.length) return None
        val steps = if (layer == 1) 12 else 36
        val sbm = if (layer == 1) decodeFrameBody1(bytes, pos, h.frameLen)
          else decodeFrameBody(bytes, pos, h.frameLen)
        frames += sbm
        val out = new Array[Double](steps * 32)
        val s = new Array[Double](32)
        var t = 0
        while (t < steps) {
          System.arraycopy(sbm, t * 32, s, 0, 32)
          synth.step(s, out, t * 32)
          t += 1
        }
        pcm ++= out
        pos += h.frameLen
      }
      if (frames.isEmpty) None
      else Some(Mp2Info(sr, 1, kbps, frames.size, frames.toArray,
        pcm.toArray, layer))
    } catch { case _: Exception => None }
  }

  /** Parse one LAYER I frame body (§2.4.2.5): 4-bit allocations
    * (code a → a+1-bit samples, 2^(a+1) − 1 level quantizers — the
    * same ungrouped [[Quant]] family as Layer II), one 6-bit
    * scalefactor per allocated subband, then 12 steps of 32 samples.
    * Returns the 12×32 requantized subband matrix. */
  private def decodeFrameBody1(bytes: Array[Byte], frameOff: Int,
                               frameLen: Int): Array[Double] = {
    val r = new BitReader(bytes, frameOff * 8 + 32, (frameOff + frameLen) * 8)
    val alloc = new Array[Quant](32)
    var sb = 0
    while (sb < 32) {
      val a = r.read(4)
      if (a == 15) throw new IllegalStateException("forbidden allocation 15")
      alloc(sb) = if (a == 0) null else Quant((1 << (a + 1)) - 1, grouped = false)
      sb += 1
    }
    val sf = new Array[Double](32)
    sb = 0
    while (sb < 32) {
      if (alloc(sb) != null) sf(sb) = scaleFactor(r.read(6))
      sb += 1
    }
    val out = new Array[Double](12 * 32)
    var t = 0
    while (t < 12) {
      sb = 0
      while (sb < 32) {
        val qz = alloc(sb)
        if (qz != null) out(t * 32 + sb) = qz.dequant(r.read(qz.k), sf(sb))
        sb += 1
      }
      t += 1
    }
    out
  }

  /** Parse one frame body (past the 32-bit header) into the 36×32
    * requantized subband matrix. */
  private def decodeFrameBody(bytes: Array[Byte], frameOff: Int,
                              frameLen: Int): Array[Double] = {
    val r = new BitReader(bytes, frameOff * 8 + 32, (frameOff + frameLen) * 8)
    val alloc = new Array[Quant](SbLimit)
    var sb = 0
    while (sb < SbLimit) {
      val (nbal, menu) = sbClass(sb)
      val a = r.read(nbal)
      alloc(sb) = if (a == 0) null else q(menu(a - 1))
      sb += 1
    }
    val scfsi = new Array[Int](SbLimit)
    sb = 0
    while (sb < SbLimit) {
      if (alloc(sb) != null) scfsi(sb) = r.read(2)
      sb += 1
    }
    // per-part effective scalefactors (parts = 3 × 12 samples)
    val sf = Array.ofDim[Double](SbLimit, 3)
    sb = 0
    while (sb < SbLimit) {
      if (alloc(sb) != null) {
        def s(): Double = scaleFactor(r.read(6))
        scfsi(sb) match {
          case 0 => sf(sb)(0) = s(); sf(sb)(1) = s(); sf(sb)(2) = s()
          case 1 => val a = s(); val b = s(); sf(sb)(0) = a; sf(sb)(1) = a; sf(sb)(2) = b
          case 2 => val a = s(); sf(sb)(0) = a; sf(sb)(1) = a; sf(sb)(2) = a
          case _ => val a = s(); val b = s(); sf(sb)(0) = a; sf(sb)(1) = b; sf(sb)(2) = b
        }
      }
      sb += 1
    }
    val out = new Array[Double](36 * 32)
    var g = 0
    while (g < 12) {
      val part = g / 4
      sb = 0
      while (sb < SbLimit) {
        val qz = alloc(sb)
        if (qz != null) {
          if (qz.grouped) {
            var v = r.read(qz.codeBits)
            var j = 0
            while (j < 3) {
              out((g * 3 + j) * 32 + sb) = qz.dequant(v % qz.levels, sf(sb)(part))
              v /= qz.levels
              j += 1
            }
          } else {
            var j = 0
            while (j < 3) {
              out((g * 3 + j) * 32 + sb) = qz.dequant(r.read(qz.k), sf(sb)(part))
              j += 1
            }
          }
        }
        sb += 1
      }
      g += 1
    }
    out
  }

  // ─── Deterministic synthesis encoder (the oracle-replayable half) ───

  /** The four subbands [[encode]] allocates — one per B.2a class —
    * and their quantizers (7 ungrouped / 9, 5, 3 grouped): every
    * grouping/width branch of the decoder exercised. */
  val EncSubbands: Array[(Int, Int)] =
    Array((2, 7), (7, 9), (12, 5), (24, 3)) // (subband, levels)

  /** Number of transmitted scalefactors per scfsi value. */
  private def nScf(scfsi: Int): Int = scfsi match {
    case 0 => 3; case 2 => 1; case _ => 2
  }

  /** Synthesize a deterministic MPEG-1 Layer II mono 48 kHz/192 kbps
    * stream from `id` — the oracle-replayable parameterization (every
    * derived value below is mirrored in the `multimodal_decode_mp2`
    * DuckDB oracle):
    *  - scfsi(sb) = (id + sb) mod 4 — all four patterns cycle;
    *  - transmitted scalefactor indexes 3·((id + 5·sb + 11·q) mod 7)
    *    (multiples of 3 ⇒ scalefactors are exact powers of two, so
    *    requantized samples are IEEE-identical across engines);
    *  - sample codes c = (id + 17·frame + granule + 7·sb + 3·j) mod
    *    levels.
    * Frame size 576 bytes; unused sample bits stay zero (ancillary). */
  /** The four subbands [[encode1]] allocates and their sample widths
    * nb (quantizer = 2^nb − 1 levels): narrow to maximal widths, and
    * subbands beyond Layer II's sblimit (Layer I allocates all 32). */
  val Enc1Subbands: Array[(Int, Int)] =
    Array((1, 2), (6, 4), (13, 8), (27, 15)) // (subband, nb)

  /** Synthesize a deterministic MPEG-1 LAYER I mono 48 kHz/192 kbps
    * stream from `id` — the oracle-replayable parameterization
    * (mirrored in the `multimodal_decode_mp1` DuckDB oracle):
    *  - scalefactor indexes 3·((id + 5·sb + f) mod 7) — exact powers
    *    of two, varying per frame (Layer I transmits one per
    *    allocated subband per frame);
    *  - sample codes c = (id + 17·f + t + 7·sb) mod (2^nb − 1).
    * Frame size 192 bytes ((12·192000/48000)·4); unused bits zero. */
  def encode1(id: Long, nFrames: Int): Array[Byte] = {
    require(nFrames > 0, "nFrames must be positive")
    val frameLen = 12 * 192000 / 48000 * 4 // 192
    val out = new Array[Byte](nFrames * frameLen)
    val nbOf = Enc1Subbands.toMap
    var f = 0
    while (f < nFrames) {
      val off = f * frameLen
      out(off) = 0xff.toByte
      out(off + 1) = 0xff.toByte // MPEG1, Layer I, no CRC
      out(off + 2) = 0x64.toByte // bitrate idx 6 (192), 48 kHz, no pad
      out(off + 3) = 0xc0.toByte // mono
      val w = new BitWriter(out, off * 8 + 32)
      var sb = 0
      while (sb < 32) {
        w.write(nbOf.get(sb).map(_ - 1).getOrElse(0), 4)
        sb += 1
      }
      Enc1Subbands.foreach { case (s, _) =>
        w.write((3 * ((id + 5 * s + f) % 7)).toInt, 6)
      }
      var t = 0
      while (t < 12) {
        Enc1Subbands.foreach { case (s, nb) =>
          val levels = (1 << nb) - 1
          w.write(((id + 17 * f + t + 7 * s) % levels).toInt, nb)
        }
        t += 1
      }
      f += 1
    }
    out
  }

  def encode(id: Long, nFrames: Int): Array[Byte] = {
    require(nFrames > 0, "nFrames must be positive")
    val frameLen = 144 * 192000 / 48000 // 576
    val out = new Array[Byte](nFrames * frameLen)
    var f = 0
    while (f < nFrames) {
      val off = f * frameLen
      out(off) = 0xff.toByte
      out(off + 1) = 0xfd.toByte // MPEG1, Layer II, no CRC
      out(off + 2) = 0xa4.toByte // bitrate idx 10 (192), 48 kHz, no pad
      out(off + 3) = 0xc0.toByte // mono
      val w = new BitWriter(out, off * 8 + 32)
      val enc = EncSubbands.toMap
      // allocation: menu index of the chosen quantizer, else 0
      var sb = 0
      while (sb < SbLimit) {
        val (nbal, menu) = sbClass(sb)
        w.write(enc.get(sb).map(l => menu.indexOf(l) + 1).getOrElse(0), nbal)
        sb += 1
      }
      EncSubbands.foreach { case (s, _) => w.write(((id + s) % 4).toInt, 2) }
      EncSubbands.foreach { case (s, _) =>
        val scfsi = ((id + s) % 4).toInt
        var qi = 0
        while (qi < nScf(scfsi)) {
          w.write((3 * ((id + 5 * s + 11 * qi) % 7)).toInt, 6)
          qi += 1
        }
      }
      var g = 0
      while (g < 12) {
        EncSubbands.foreach { case (s, levels) =>
          val qz = q(levels)
          def code(j: Int): Int = ((id + 17 * f + g + 7 * s + 3 * j) % levels).toInt
          if (qz.grouped)
            w.write(code(0) + levels * code(1) + levels * levels * code(2), qz.codeBits)
          else { w.write(code(0), qz.k); w.write(code(1), qz.k); w.write(code(2), qz.k) }
        }
        g += 1
      }
      f += 1
    }
    out
  }
}
