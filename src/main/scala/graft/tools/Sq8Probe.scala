package graft.tools

import graft.search.Kernels

/** Micro-probe that selected the SHIPPED SQ8 single-query kernel
  * (r15). Variants, 100k/1M × 64-D measured:
  *
  *   float     — Kernels.scoreSingle over float rows (the baseline)
  *   symmetric — the SHIPPED kernel: query quantized to int8 once per
  *               search, int8×int8 multiply-add lanes (SDOT shape) —
  *               0.8× float's time at 100k, 0.5× at 1M (4× fewer
  *               bytes scanned)
  *   decoded   — rejected: tile-decode to a float buffer then the
  *               float kernel (1.2-1.5× slower than float)
  *   intdot    — the raw loop the r15 kernel shipped (kept as the
  *               reference measurement)
  *
  * r17 kernel pass (VERDICT r16 #3) — variants below intdot:
  *
  *   intq      — SHIPPED since r17: query codes widened to int[] once
  *               per search; only the row side sign-extends. 1.4-1.6×
  *               over intdot at every scale (1M×64: 28.4 vs 44.0 ms;
  *               1M×128: 50.3 vs 58.4; 100k×64: 2.53 vs 3.81) and at
  *               or below the float kernel's time everywhere probed.
  *   simple    — rejected: un-unrolled reduction in case C2's SLP
  *               could vectorize b2i multiplies (it can't — 1.9×
  *               slower than intq)
  *   longread  — rejected: 8 bytes per VarHandle long load + shift
  *               extraction (3-5× slower; the shift chain costs more
  *               than the saved bounds checks)
  *   short16   — rejected: short[] codes to isolate the b2i cost
  *               (no gain over intdot at 2× the bytes)
  *
  * The rejected first cut (asymmetric: per-element byte→float
  * widening inside the float lanes) ran 1.5-2× SLOWER than float at
  * every scale — b2f conversion in the multiply-add chain defeats
  * HotSpot's SLP vectorizer.
  *
  * Run: sbt 'runMain graft.tools.Sq8Probe [n] [dim]' */
object Sq8Probe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(n * dim)(rnd.nextFloat() * 2 - 1)
    val ids = Array.tabulate(n)(_.toLong)
    // quantize (the ScalarQuant rule)
    val codes = new Array[Byte](n * dim)
    val scales = new Array[Double](n)
    val norm2 = new Array[Double](n)
    val fnorm2 = new Array[Double](n)
    for (r <- 0 until n) {
      var mx = 0.0
      for (d <- 0 until dim) mx = math.max(mx, math.abs(xs(r * dim + d).toDouble))
      val sc = mx / 127.0
      scales(r) = sc
      var ss = 0L
      var fn = 0.0
      for (d <- 0 until dim) {
        val q = if (sc > 0) math.max(-127, math.min(127,
          math.floor(xs(r * dim + d) / sc + 0.5).toInt)) else 0
        codes(r * dim + d) = q.toByte
        ss += q.toLong * q
        val x = xs(r * dim + d).toDouble
        fn += x * x
      }
      norm2(r) = sc * sc * ss
      fnorm2(r) = fn
    }
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    var qn2 = 0.0
    for (d <- 0 until dim) qn2 += q(d).toDouble * q(d)
    val qInv = 1.0 / math.sqrt(qn2)

    def time(label: String)(body: => Unit): Unit = {
      (0 until 30).foreach(_ => body) // JIT warm
      val p50 = Timing.p50Ms(101)(body)
      println(f"$label%-10s p50 $p50%8.3f ms")
    }

    // float baseline
    time("float") {
      val h = new Kernels.TopKHeap(10)
      Kernels.scoreSingle(Kernels.MetricCosine, q, qInv, qn2, xs, ids, n, fnorm2, h)
    }
    // the shipped kernel (symmetric int8 since r15)
    time("symmetric") {
      val h = new Kernels.TopKHeap(10)
      Kernels.scoreSq8Single(Kernels.quantizeSq8Query(q), codes, scales,
        ids, n, norm2, h)
    }
    // decoded: tile-buffered b2f then the float kernel per tile
    val TileR = 1024
    val buf = new Array[Float](TileR * dim)
    time("decoded") {
      val h = new Kernels.TopKHeap(10)
      var base = 0
      while (base < n) {
        val rows = math.min(TileR, n - base)
        val m = rows * dim
        val off0 = base * dim
        var i = 0
        while (i < m) { buf(i) = codes(off0 + i).toFloat; i += 1 }
        // cosine over codes: scale cancels in the norm, so feed the
        // reconstructed norm2/scale² = Σcode² … cheaper: use CosineUnit
        // with post-division — here just score raw dot then adjust
        var r = 0
        while (r < rows) {
          var s0 = 0f; var s1 = 0f; var s2 = 0f; var s3 = 0f
          val off = r * dim
          var d = 0
          val lim = dim - 3
          while (d < lim) {
            s0 += buf(off + d) * q(d)
            s1 += buf(off + d + 1) * q(d + 1)
            s2 += buf(off + d + 2) * q(d + 2)
            s3 += buf(off + d + 3) * q(d + 3)
            d += 4
          }
          while (d < dim) { s0 += buf(off + d) * q(d); d += 1 }
          val dot = ((s0 + s1) + (s2 + s3)).toDouble
          val gr = base + r
          val vn2 = norm2(gr)
          val inv = if (vn2 > 0) scales(gr) / math.sqrt(vn2) else 0.0
          h.offer(dot * inv * qInv, ids(gr))
          r += 1
        }
        base += rows
      }
    }
    // symmetric: query quantized to int8 once per search, dot in int
    // lanes (byte×byte→int multiply-add — the SDOT shape)
    val qmax = q.map(x => math.abs(x.toDouble)).max
    val qsc = qmax / 127.0
    val qc = q.map(x => math.max(-127, math.min(127,
      math.floor(x / qsc + 0.5).toInt)).toByte)
    time("intdot") {
      val h = new Kernels.TopKHeap(10)
      var r = 0
      while (r < n) {
        var s0 = 0; var s1 = 0; var s2 = 0; var s3 = 0
        val off = r * dim
        var d = 0
        val lim = dim - 3
        while (d < lim) {
          s0 += codes(off + d) * qc(d)
          s1 += codes(off + d + 1) * qc(d + 1)
          s2 += codes(off + d + 2) * qc(d + 2)
          s3 += codes(off + d + 3) * qc(d + 3)
          d += 4
        }
        while (d < dim) { s0 += codes(off + d) * qc(d); d += 1 }
        val dot = ((s0 + s1) + (s2 + s3)).toDouble * qsc
        val vn2 = norm2(r)
        val inv = if (vn2 > 0) scales(r) / math.sqrt(vn2) else 0.0
        h.offer(dot * inv * qInv, ids(r))
        r += 1
      }
    }

    // ---- r17 kernel-pass candidates (VERDICT r16 #3): the shipped
    // intdot runs ~8 GB/s effective vs the float kernel's ~25 — the
    // widening byte→int conversions per element are the suspect ----

    // intq: query codes held as int[] (plain int loads on the query
    // side; the row side still sign-extends)
    val qcInt = qc.map(_.toInt)
    time("intq") {
      val h = new Kernels.TopKHeap(10)
      var r = 0
      while (r < n) {
        var s0 = 0; var s1 = 0; var s2 = 0; var s3 = 0
        val off = r * dim
        var d = 0
        val lim = dim - 3
        while (d < lim) {
          s0 += codes(off + d) * qcInt(d)
          s1 += codes(off + d + 1) * qcInt(d + 1)
          s2 += codes(off + d + 2) * qcInt(d + 2)
          s3 += codes(off + d + 3) * qcInt(d + 3)
          d += 4
        }
        while (d < dim) { s0 += codes(off + d) * qcInt(d); d += 1 }
        val dot = ((s0 + s1) + (s2 + s3)).toDouble * qsc
        val vn2 = norm2(r)
        val inv = if (vn2 > 0) scales(r) / math.sqrt(vn2) else 0.0
        h.offer(dot * inv * qInv, ids(r))
        r += 1
      }
    }

    // simple: NO manual unroll — a single plain reduction loop, the
    // shape C2's SLP vectorizer recognizes (manual 4-lane unrolls
    // often BLOCK SLP; the float kernel vectorizes because its lanes
    // map to what SLP would emit anyway)
    time("simple") {
      val h = new Kernels.TopKHeap(10)
      var r = 0
      while (r < n) {
        var s = 0
        val off = r * dim
        var d = 0
        while (d < dim) { s += codes(off + d) * qc(d); d += 1 }
        val dot = s.toDouble * qsc
        val vn2 = norm2(r)
        val inv = if (vn2 > 0) scales(r) / math.sqrt(vn2) else 0.0
        h.offer(dot * inv * qInv, ids(r))
        r += 1
      }
    }

    // longread: 8 row bytes per long load (VarHandle LE), extracted by
    // shift — 1/8th the array loads and bounds checks; query side int[]
    val LH = java.lang.invoke.MethodHandles.byteArrayViewVarHandle(
      classOf[Array[Long]], java.nio.ByteOrder.LITTLE_ENDIAN)
    time("longread") {
      val h = new Kernels.TopKHeap(10)
      var r = 0
      while (r < n) {
        var s0 = 0; var s1 = 0; var s2 = 0; var s3 = 0
        val off = r * dim
        var d = 0
        val lim = dim - 7
        while (d < lim) {
          val w = LH.get(codes, off + d).asInstanceOf[Long]
          s0 += (w << 56 >> 56).toInt * qcInt(d) +
                (w << 24 >> 56).toInt * qcInt(d + 4)
          s1 += (w << 48 >> 56).toInt * qcInt(d + 1) +
                (w << 16 >> 56).toInt * qcInt(d + 5)
          s2 += (w << 40 >> 56).toInt * qcInt(d + 2) +
                (w << 8 >> 56).toInt * qcInt(d + 6)
          s3 += (w << 32 >> 56).toInt * qcInt(d + 3) +
                (w >> 56).toInt * qcInt(d + 7)
          d += 8
        }
        while (d < dim) { s0 += codes(off + d) * qcInt(d); d += 1 }
        val dot = ((s0 + s1) + (s2 + s3)).toDouble * qsc
        val vn2 = norm2(r)
        val inv = if (vn2 > 0) scales(r) / math.sqrt(vn2) else 0.0
        h.offer(dot * inv * qInv, ids(r))
        r += 1
      }
    }

    // short16: codes widened ONCE at pack time to short[] (2 B/elem —
    // still 2× smaller than float): measures whether the byte→int
    // sign-extension (not bandwidth) is the cost. If this matches
    // float, the fix is a short-code variant or routing; if it matches
    // intdot, the multiply-add chain itself is the ceiling.
    val shorts = new Array[Short](n * dim)
    locally { var i = 0; while (i < n * dim) { shorts(i) = codes(i).toShort; i += 1 } }
    time("short16") {
      val h = new Kernels.TopKHeap(10)
      var r = 0
      while (r < n) {
        var s = 0
        val off = r * dim
        var d = 0
        while (d < dim) { s += shorts(off + d) * qcInt(d); d += 1 }
        val dot = s.toDouble * qsc
        val vn2 = norm2(r)
        val inv = if (vn2 > 0) scales(r) / math.sqrt(vn2) else 0.0
        h.offer(dot * inv * qInv, ids(r))
        r += 1
      }
    }
  }
}
