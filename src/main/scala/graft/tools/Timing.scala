package graft.tools

/** Shared latency-measurement protocol for the bench and the scratch
  * probes — one untimed warm call, then `reps` timed calls. Keeping it
  * in one place keeps every probe measuring the same way (review r4:
  * three hand-rolled copies had drifted in warmup behavior). */
object Timing {

  /** Median latency in ms. */
  def p50Ms(reps: Int)(body: => Unit): Double = p50BestMs(reps)(body)._1

  /** (median, best) latency in ms. */
  def p50BestMs(reps: Int)(body: => Unit): (Double, Double) = {
    body // warm the exact path being measured
    val lats = (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e6
    }.sorted
    (lats(lats.size / 2), lats.head)
  }
}
