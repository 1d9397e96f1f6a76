package graft.tools

/** Standalone probe for the HNSW serving index (Bench's `hnsw_100k`
  * block, sizeable): build seconds, single-query p50 at ef, recall@10
  * vs brute force. Usage: `sbt "runMain graft.tools.HnswProbe [n] [ef]"`. */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val target = if (args.length > 0) args(0).toInt else 100000
    val ef = if (args.length > 1) args(1).toInt else 64
    val efC = if (args.length > 2) args(2).toInt else 100
    val par = args.length > 3 && args(3) == "par"
    // distinct seeded random vectors (the tiled testdata corpus has
    // ~1k unique embeddings - duplicates collapse into graph nodes,
    // so it cannot exercise a 100k graph); isotropic random is ANN's
    // hardest recall regime, the honest setting. No Spark needed.
    val clustered = args.length > 4 && args(4) == "clu"
    val batch = if (args.length > 5) args(5).toInt else 512
    val dim = if (args.length > 6) args(6).toInt else 64
    val m = if (args.length > 7) args(7).toInt else 16
    val rnd0 = new scala.util.Random(11)
    val rows =
      if (clustered) Array.tabulate(target) { i =>
        val cl = i % 50
        val rc = new scala.util.Random(cl * 1009 + 7)
        val center = Array.fill(dim)(rc.nextGaussian())
        val rn = new scala.util.Random(i)
        (i.toLong, center.map(x => (x + rn.nextGaussian()).toFloat))
      }
      else Array.tabulate(target)(i =>
        (i.toLong, Array.fill(dim)(rnd0.nextFloat() * 2 - 1)))
    val t0 = System.nanoTime()
    val idx =
      if (par) graft.ann.Hnsw.buildParallel(rows.iterator, dim, m = m,
        efConstruction = efC, batchSize = batch)
      else graft.ann.Hnsw.build(rows.iterator, dim, m = m, efConstruction = efC)
    val buildSec = (System.nanoTime() - t0) / 1e9
    // corpus-drawn queries (Bench protocol; isotropic queries against a
    // clustered corpus sit off-manifold — no workload looks like that)
    val queries = rows.iterator.take(50).map(_._2.map(_.toDouble)).toArray
    val normRows = rows.map { case (id, v) => (id, graft.ann.Hnsw.l2normalize(v)) }
    // score-recall@10 (the suite's convention: tiled corpora duplicate
    // vectors, so id-membership is meaningless under score ties)
    def bruteKth(q: Array[Double]): Double = {
      val qn = graft.ann.Hnsw.l2normalize(q.map(_.toFloat))
      normRows.map { case (_, vn) =>
        var s = 0.0; var d = 0
        while (d < dim) { s += vn(d).toDouble * qn(d); d += 1 }
        s
      }.sorted(Ordering[Double].reverse).apply(9)
    }
    val recall = queries.take(50).map { q =>
      val kth = bruteKth(q)
      idx.searchOne(q.toSeq, 10, ef).count(_._2 >= kth - 1e-6) / 10.0
    }.sum / 50
    idx.searchOne(queries(0).toSeq, 10, ef)
    var qi = 0
    val p50 = Timing.p50Ms(201) {
      idx.searchOne(queries(qi % queries.length).toSeq, 10, ef); qi += 1
    }
    // dynamic-insert throughput, both Bench shapes: trickle =
    // one-by-one Index.add; burst = 250-row addAll epochs
    val addPerSec = {
      val rnd = new scala.util.Random(rows.length + 13)
      val extra = Array.tabulate(2000)(i =>
        (rows.length.toLong + i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      val ta = System.nanoTime()
      extra.foreach { case (id, v) => idx.add(id, v) }
      extra.length / ((System.nanoTime() - ta) / 1e9)
    }
    val burstPerSec = {
      val rnd = new scala.util.Random(rows.length + 17)
      val extra = Array.tabulate(2000)(i =>
        (rows.length.toLong + 2000 + i, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
      val ta = System.nanoTime()
      extra.grouped(250).foreach(g => idx.addAll(g.iterator))
      extra.length / ((System.nanoTime() - ta) / 1e9)
    }
    println(f"[probe] hnsw n=${rows.length} dim=$dim m=$m efC=$efC par=$par build=$buildSec%.1fs p50=$p50%.3fms " +
      f"recall@10(ef=$ef)=$recall%.3f add/s=$addPerSec%.0f burst/s=$burstPerSec%.0f bytes=${idx.bytes / 1048576}%dMB topLevel=${idx.topLevel}")
  }
}
