package graft.tools

import graft.search.Kernels

/** Scratch micro-probe for single-query kernel variants (not part of the
  * product surface; run via `runMain graft.tools.KernelProbe`). */
object KernelProbe {

  // double 4-lane variant — what scoreSingle used before the float-lane
  // switch; kept as the A/B that justified it (float lanes SLP-vectorize,
  // double-with-conversion does not)
  private def dotDouble4(q: Array[Float], xs: Array[Float], off: Int, dim: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var d = 0
    val lim = dim - 3
    while (d < lim) {
      s0 += xs(off + d).toDouble * q(d)
      s1 += xs(off + d + 1).toDouble * q(d + 1)
      s2 += xs(off + d + 2).toDouble * q(d + 2)
      s3 += xs(off + d + 3).toDouble * q(d + 3)
      d += 4
    }
    while (d < dim) { s0 += xs(off + d).toDouble * q(d); d += 1 }
    (s0 + s1) + (s2 + s3)
  }

  // 8-lane double variant
  private def dotDouble8(q: Array[Float], xs: Array[Float], off: Int, dim: Int): Double = {
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var s4 = 0.0; var s5 = 0.0; var s6 = 0.0; var s7 = 0.0
    var d = 0
    val lim = dim - 7
    while (d < lim) {
      s0 += xs(off + d).toDouble * q(d)
      s1 += xs(off + d + 1).toDouble * q(d + 1)
      s2 += xs(off + d + 2).toDouble * q(d + 2)
      s3 += xs(off + d + 3).toDouble * q(d + 3)
      s4 += xs(off + d + 4).toDouble * q(d + 4)
      s5 += xs(off + d + 5).toDouble * q(d + 5)
      s6 += xs(off + d + 6).toDouble * q(d + 6)
      s7 += xs(off + d + 7).toDouble * q(d + 7)
      d += 8
    }
    while (d < dim) { s0 += xs(off + d).toDouble * q(d); d += 1 }
    (((s0 + s1) + (s2 + s3)) + ((s4 + s5) + (s6 + s7)))
  }

  def main(args: Array[String]): Unit = {
    val dim = 64
    val n = 10000
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(n * dim)(rnd.nextFloat() * 2 - 1)
    val ids = Array.tabulate(n)(_.toLong)
    val norm2 = Array.tabulate(n) { r =>
      var s = 0.0; var d = 0
      while (d < dim) { val x = xs(r * dim + d).toDouble; s += x * x; d += 1 }
      s
    }
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    var qn2 = 0.0
    (0 until dim).foreach(d => qn2 += q(d).toDouble * q(d))
    val qInv = 1.0 / math.sqrt(qn2)

    def time(label: String)(body: => Unit): Unit = {
      (0 until 199).foreach(_ => body) // JIT warm (Timing adds 1 warm call)
      val (p50, best) = Timing.p50BestMs(200)(body)
      println(f"$label%-28s p50=$p50%.4f ms  best=$best%.4f ms")
    }

    time("scoreSingle (float x4)") {
      val h = new Kernels.TopKHeap(10)
      Kernels.scoreSingle(Kernels.MetricCosineUnit, q, qInv, qn2, xs, ids, n, norm2, h)
    }
    time("double x4 lanes") {
      val h = new Kernels.TopKHeap(10)
      var r = 0
      while (r < n) { h.offer(dotDouble4(q, xs, r * dim, dim), ids(r)); r += 1 }
    }
    time("double x8 lanes") {
      val h = new Kernels.TopKHeap(10)
      var r = 0
      while (r < n) { h.offer(dotDouble8(q, xs, r * dim, dim), ids(r)); r += 1 }
    }
    // fleet tile kernel at nq=1 for reference
    time("scoreTile nq=1") {
      val qp = Kernels.packQueries(Array(q))
      val h = Array(new Kernels.TopKHeap(10))
      val out = new Array[Float](1)
      Kernels.scoreTile(Kernels.MetricCosineUnit, qp, xs, ids, n, h, out, norm2)
    }

    // end-to-end ServingSession.searchOne (where does the bench p50 go?)
    val qd = q.map(_.toDouble)
    for (rows <- Seq(2000, 10000)) {
      val sess = graft.search.ServingSession.fromLocalRows(
        Iterator.tabulate(rows)(i => (i.toLong, java.util.Arrays.copyOfRange(xs, (i % n) * dim, (i % n) * dim + dim))), dim)
      time(s"searchOne e2e n=$rows") { sess.searchOne(qd, 10) }
    }
  }
}
