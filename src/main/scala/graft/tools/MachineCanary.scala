package graft.tools

import graft.search.Kernels

/** In-band machine-speed canary for the bench artifact (VERDICT r6 #1):
  * the p50 of ONE deterministic single-thread kernel call —
  * `Kernels.scoreSingle` over a seeded 10k×64 float block, top-10 heap
  * — measured with the shared [[Timing]] protocol. The kernel has been
  * functionally frozen since r4, so this number moves ONLY with the
  * machine: environmental drift (shared-sandbox contention moved r5→r6
  * wall-clocks ~3× on unchanged code) becomes distinguishable from
  * regression INSIDE the artifact instead of by argument. Reference
  * points: ~0.31 ms on the r6/r7 sandbox, ~0.1 ms implied for the
  * r5-class machine (r5/r6 throughput ratio on unchanged kernels).
  *
  * Same block parameters as `KernelProbe`'s first row, so historical
  * probe numbers line up with the canary. */
object MachineCanary {

  /** (p50 ms, best ms) of the canary kernel call. */
  def measure(reps: Int = 200): (Double, Double) = {
    val dim = 64
    val n = 10000
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(n * dim)(rnd.nextFloat() * 2 - 1)
    val ids = Array.tabulate(n)(_.toLong)
    val norm2 = Array.tabulate(n) { r =>
      var s = 0.0
      var d = 0
      while (d < dim) { val x = xs(r * dim + d).toDouble; s += x * x; d += 1 }
      s
    }
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    var qn2 = 0.0
    (0 until dim).foreach(d => qn2 += q(d).toDouble * q(d))
    val qInv = 1.0 / math.sqrt(qn2)
    // JIT warm beyond Timing's single warm call — the canary must
    // measure steady-state machine speed, not compilation
    (0 until 199).foreach { _ =>
      val h = new Kernels.TopKHeap(10)
      Kernels.scoreSingle(Kernels.MetricCosineUnit, q, qInv, qn2, xs, ids, n, norm2, h)
    }
    Timing.p50BestMs(reps) {
      val h = new Kernels.TopKHeap(10)
      Kernels.scoreSingle(Kernels.MetricCosineUnit, q, qInv, qn2, xs, ids, n, norm2, h)
    }
  }

  /** p50 wall-ms of 8 THREADS each scoring the canary block once (via
    * the common FJ pool, like the serving fan-out). On an idle
    * multi-core box this ≈ the single-thread p50; under core/bandwidth
    * contention it rises — the signal the single-thread canary cannot
    * see (r6's suite numbers degraded ~2× beyond what its single-thread
    * canary-equivalent showed). */
  def measureParallel(reps: Int = 50, nThreads: Int = 8): Double = {
    val dim = 64
    val n = 10000
    val rnd = new scala.util.Random(3)
    val xs = Array.fill(n * dim)(rnd.nextFloat() * 2 - 1)
    val ids = Array.tabulate(n)(_.toLong)
    val norm2 = Array.tabulate(n) { r =>
      var s = 0.0
      var d = 0
      while (d < dim) { val x = xs(r * dim + d).toDouble; s += x * x; d += 1 }
      s
    }
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    var qn2 = 0.0
    (0 until dim).foreach(d => qn2 += q(d).toDouble * q(d))
    val qInv = 1.0 / math.sqrt(qn2)
    def batch(): Unit = {
      java.util.stream.IntStream.range(0, nThreads).parallel().forEach { _ =>
        val h = new Kernels.TopKHeap(10)
        Kernels.scoreSingle(Kernels.MetricCosineUnit, q, qInv, qn2, xs, ids, n, norm2, h)
      }
    }
    (0 until 20).foreach(_ => batch()) // JIT + pool warm
    Timing.p50BestMs(reps)(batch())._1
  }
}
