package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF×SQ8 composed recall, measured BEFORE the contract is pinned
  * (the r15 SQ8 protocol): cell-pruned int8 scan at the spec corpus
  * (100k × 64-D, 50-center clustered, queries from the corpus) across
  * an nProbe grid, so the ServingRecallSpec floor is set where the
  * measurement says it holds, not hoped. Composition loses recall two
  * ways — cell-miss (IVF at 8/32 probes pins ≥0.93 alone) and int8
  * reorder (SQ8 alone pins ≥0.95) — this probe shows where the product
  * crosses 0.95. Protocol = the spec's: exact driver rescore of every
  * returned id vs the exact kth score.
  * Run: sbt 'runMain graft.tools.IvfSq8Probe'
  */
object IvfSq8Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("ivfsq8-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val dim = 64
    val n = 100000
    val k = 10
    val nQ = 50
    val rows: Array[(Long, Array[Float])] = Array.tabulate(n) { i =>
      val cl = i % 50
      val rc = new scala.util.Random(cl * 1009 + 7)
      val center = Array.fill(dim)(rc.nextGaussian())
      val rn = new scala.util.Random(i)
      (i.toLong, graft.ann.Hnsw.l2normalize(
        center.map(x => (x + rn.nextGaussian()).toFloat)))
    }
    val corpus = spark.createDataset(rows.toSeq.map { case (id, v) => (id, v.toSeq) })
      .toDF("vec_id", "embedding").repartition(8).cache()
    corpus.count()
    val queries: Seq[(Long, Seq[Double])] =
      rows.take(nQ).map { case (id, v) => (id, v.map(_.toDouble).toSeq) }.toSeq

    val exactKth: Map[Long, Double] = queries.map { case (qid, q) =>
      val qa = q.toArray
      val scores = rows.map { case (_, v) =>
        var s = 0.0; var d = 0
        while (d < dim) { s += v(d).toDouble * qa(d); d += 1 }
        s
      }
      qid -> scores.sorted(Ordering[Double].reverse).apply(k - 1)
    }.toMap

    def recallOf(hits: Array[(Long, Long)]): Double =
      hits.count { case (qid, id) =>
        val v = rows(id.toInt)._2
        val qa = queries.find(_._1 == qid).get._2.toArray
        var s = 0.0; var d = 0
        while (d < dim) { s += v(d).toDouble * qa(d); d += 1 }
        s >= exactKth(qid) - 1e-9
      }.toDouble / (nQ * k)

    for (nCells <- Seq(32)) {
      val model = graft.ann.Ann.trainIvf(corpus, "embedding", nCells = nCells, maxIter = 5)
      val cells = graft.ann.Ann.assignCells(corpus, "embedding", "vec_id", model).cache()
      cells.count()
      val idx = graft.search.PackedIndex.buildIvfSq8(cells, model)
      val resident = graft.search.ServingSession.fromIvfSq8(idx)
      for (nProbe <- Seq(4, 8, 12, 16, 32)) {
        val dHits = idx.search(queries, k = k, nProbe = nProbe)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val rHits = resident.get.search(queries, k = k, nProbe = nProbe)
          .map { case (q, id, _, _) => (q, id) }.toArray
        println(f"nCells=$nCells nProbe=$nProbe%2d dist_recall=${recallOf(dHits)}%.4f " +
          f"res_recall=${recallOf(rHits)}%.4f parity=${dHits.sorted.sameElements(rHits.sorted)}")
      }
      idx.unpersist(); cells.unpersist()
    }
    spark.stop()
  }
}
