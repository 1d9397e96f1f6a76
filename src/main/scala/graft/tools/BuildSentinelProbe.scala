package graft.tools

/** Differential proof of the r17 BUILD re-pair machinery (VERDICT r16
  * #1) — the build-block twin of [[ShuffleSentinelProbe]]'s shuffle
  * proof: the r16 verdict marked `hnsw_100k_d128` weak because the
  * hnsw/ann BUILD family had no drift self-flag path ("the row can't
  * prove its own innocence"). This probe runs the EXACT shipped
  * decision ([[graft.Bench.rePairDecision]]) over live HNSW builds in
  * two regimes:
  *
  *   healthy — two settled builds, retry never fires, no flag;
  *   drifted — an antagonist (core-stealing + DRAM-saturating threads,
  *             the ShuffleSentinelProbe hog) starts BETWEEN the pair's
  *             builds and stays on through the retry, so the pair
  *             splits and cannot reconcile → the decision must FLAG.
  *
  * No Spark session — the build path is pure JVM, which is exactly why
  * the shuffle/CPU block brackets alone could not attribute its drift.
  *
  * Run: sbt 'runMain graft.tools.BuildSentinelProbe [n] [dim]'
  * Evidence ledger: docs/probes/build_sentinel_r17.txt */
object BuildSentinelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(30000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(128)
    val rnd0 = new scala.util.Random(19) // the d128 block's generator
    val rows = Array.tabulate(n)(i =>
      (i.toLong, Array.fill(dim)(rnd0.nextFloat() * 2 - 1)))

    def settle(): Unit = { System.gc(); Thread.sleep(500); System.gc() }
    def build(): Double = {
      settle()
      val t0 = System.nanoTime()
      val idx = graft.ann.Hnsw.buildParallel(rows.iterator, dim)
      require(idx.nVectors == n, "build sanity")
      (System.nanoTime() - t0) / 1e9
    }

    build() // JIT warm
    // ── healthy regime ──
    val h1 = build()
    val h2 = build()
    val (hBest, hFlag) = graft.Bench.rePairDecision(
      h1, h2, 1.5, () => settle(), () => build())
    println(f"healthy: pair $h1%.2f/$h2%.2f s best=$hBest%.2f flagged=$hFlag")

    // ── drifted regime: antagonist lands between the pair's builds
    // and stays on through the retry (the sustained-drift mode) ──
    val d1 = build()
    @volatile var stop = false
    val hogs = (0 until Runtime.getRuntime.availableProcessors()).map { _ =>
      val t = new Thread(() => {
        val m = 2800000
        val a = new Array[Double](m)
        val b = Array.tabulate(m)(i => (i % 1024) * 0.5)
        val c = Array.tabulate(m)(i => (i % 512) * 0.25)
        while (!stop) {
          var i = 0
          while (i < m) { a(i) = b(i) + 3.0 * c(i); i += 1 }
        }
        if (a(m / 2).isNaN) throw new IllegalStateException("unreachable")
      })
      t.setDaemon(true)
      t.start()
      t
    }
    Thread.sleep(1000) // ramp
    val d2 = build()
    val (dBest, dFlag) = graft.Bench.rePairDecision(
      d1, d2, 1.5, () => settle(), () => build())
    stop = true
    hogs.foreach(_.join(2000))
    println(f"drifted: pair $d1%.2f/$d2%.2f s best=$dBest%.2f flagged=$dFlag")
    println(s"differential: healthy_flag=$hFlag drifted_flag=$dFlag " +
      s"(PASS iff false/true)")
    if (hFlag || !dFlag) {
      System.err.println("[probe] differential FAILED")
      sys.exit(1)
    }
  }
}
