package graft.tools

/** Dev harness for the serving fan-out knob: builds a synthetic packed
  * [[graft.search.ServingSession.Exact]] (no Spark) and sweeps
  * `graft.serving.minRowsPerWorker`, printing single-query p50 and
  * fleet QPS per value. The fork cost of common-pool tasks varies by
  * host (measured ~60 µs+/task on the r9 sandbox), so the default is
  * chosen from this probe's p50 minimum, not guessed.
  *
  * Usage: `sbt "runMain graft.tools.ServingProbe [n] [dim]"` */
object ServingProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val dim = if (args.length > 1) args(1).toInt else 64
    val rnd = new scala.util.Random(7)
    val rows = Iterator.tabulate(n)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val idx = graft.search.ServingSession.fromLocalRows(rows, dim)
    val queries = Array.tabulate(64)(qi =>
      (qi.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val single = queries(0)._2

    def p50(reps: Int)(body: => Unit): Double = {
      val t = Array.fill(reps) {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      t.sorted.apply(reps / 2)
    }

    // warm
    (0 until 50).foreach(_ => idx.searchOne(single, 10))
    println(s"[probe] n=$n dim=$dim blocks=${idx.blocks.length}")
    for (mrpw <- Seq("2048", "3072", "4096", "8192", "12288", "16384", "24576", "32768",
                     "65536", "131072", s"${n + 1}" /* = serial-ish 1 worker */)) {
      System.setProperty("graft.serving.minRowsPerWorker", mrpw)
      (0 until 30).foreach(_ => idx.searchOne(single, 10)) // re-warm path
      val sp50 = p50(201)(idx.searchOne(single, 10): Unit)
      val fleetSec = p50(7)(idx.search(queries.toSeq, 10): Unit) / 1000.0
      println(f"[probe] minRowsPerWorker=$mrpw%-7s single_p50=$sp50%.3f ms  fleet64_qps=${64 / fleetSec}%.0f")
    }
    System.clearProperty("graft.serving.minRowsPerWorker")
  }
}
