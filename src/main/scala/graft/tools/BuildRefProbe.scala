package graft.tools

/** Settled-reference measurement for the LONG build rows (VERDICT r17
  * #3): `hnsw_1m.build_sec` crept 30.2 → 38.1 s across r16 → r17 with
  * every same-run sentinel clean — multi-round creep needs a STORED
  * cross-round reference (tools/bench_diff.py CROSS_ROUND_REFS), and
  * this probe is how that reference is measured: the EXACT corpus the
  * bench's hnsw_1m block generates (1M × 64-D, 500-center Gaussian
  * mixture, same seeds), N settled standalone builds, each printed,
  * min = the reference. No Spark session — the build path is pure JVM.
  *
  * Run: sbt 'runMain graft.tools.BuildRefProbe [runs]'
  * Evidence ledger: docs/probes/span_refs_r18.txt
  */
object BuildRefProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val dim = 64
    val nClusters = 500
    val n = 1000000
    // identical generator to Bench's hnsw_1m block
    val rows = Array.tabulate(n) { i =>
      val cl = i % nClusters
      val rc = new scala.util.Random(cl * 1009 + 7)
      val center = Array.fill(dim)(rc.nextGaussian())
      val rn = new scala.util.Random(i)
      (i.toLong, center.map(x => (x + rn.nextGaussian()).toFloat))
    }
    println(s"[build-ref] corpus ready: $n x $dim (500-center mixture)")

    def settle(): Unit = { System.gc(); Thread.sleep(1000); System.gc() }
    val secs = Array.tabulate(runs) { r =>
      settle()
      val t0 = System.nanoTime()
      var idx = graft.ann.Hnsw.buildParallel(rows.iterator, dim)
      val s = (System.nanoTime() - t0) / 1e9
      require(idx.nVectors == n, "build sanity")
      idx = null
      println(f"[build-ref] hnsw_1m build run ${r + 1}: $s%.1f s")
      s
    }
    println(f"[build-ref] hnsw_1m build settled min=${secs.min}%.1f s runs=${secs.map(s => f"$s%.1f").mkString("[", ",", "]")}")
  }
}
