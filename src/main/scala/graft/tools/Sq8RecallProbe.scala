package graft.tools

/** SQ8 recall beyond the pinned contract (r15): the 64-D clustered
  * score-recall@10 >= 0.95 contract lives in ServingRecallSpec; this
  * probe measures the harsher regimes (128-D, isotropic) BEFORE any
  * contract is promised there — 128-D isotropic is ANN's hardest
  * near-tie regime and the symmetric int8 noise grows ~sqrt(dim).
  * Driver-only, no Spark session. Protocol = the spec's: exact
  * driver rescore of every returned id vs the exact kth.
  * Run: sbt 'runMain graft.tools.Sq8RecallProbe [n]' */
object Sq8RecallProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val k = 10
    val nQ = 50
    for ((label, dim, clustered) <- Seq(("64-clustered", 64, true),
                                        ("128-clustered", 128, true),
                                        ("64-isotropic", 64, false),
                                        ("128-isotropic", 128, false))) {
      val rows: Array[Array[Float]] = Array.tabulate(n) { i =>
        if (clustered) {
          val cl = i % 50
          val rc = new scala.util.Random(cl * 1009 + 7)
          val center = Array.fill(dim)(rc.nextGaussian())
          val rn = new scala.util.Random(i)
          graft.ann.Hnsw.l2normalize(center.map(x => (x + rn.nextGaussian()).toFloat))
        } else {
          val rn = new scala.util.Random(i)
          graft.ann.Hnsw.l2normalize(Array.fill(dim)(rn.nextFloat() * 2 - 1))
        }
      }
      val sq8 = graft.search.ServingSession.fromLocalRowsSq8(
        rows.iterator.zipWithIndex.map { case (v, i) => (i.toLong, v) }, dim)
      def exactDot(q: Array[Float], v: Array[Float]): Double = {
        var s = 0.0; var d = 0
        while (d < dim) { s += v(d).toDouble * q(d); d += 1 }
        s
      }
      var recallSum = 0.0
      for (qi <- 0 until nQ) {
        val q = rows(qi)
        val kth = rows.map(exactDot(q, _)).sorted(Ordering[Double].reverse).apply(k - 1)
        val hits = sq8.searchOne(q.map(_.toDouble), k)
        recallSum += hits.count { case (id, _, _) =>
          exactDot(q, rows(id.toInt)) >= kth - 1e-9 }.toDouble / k
      }
      println(f"[sq8recall] $label%-15s n=$n score-recall@10 = ${recallSum / nQ}%.4f")
    }
  }
}
