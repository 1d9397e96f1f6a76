package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.{Kernels, VectorSearch}

class KernelsSpec extends AnyFunSuite {
  import TestSpark.spark

  test("TopKHeap keeps the ORDER BY score DESC, id ASC LIMIT k set, incl. ties") {
    val h = new Kernels.TopKHeap(3)
    // scores with a tie at 0.5: ids 7 and 2 — id 2 must win the last slot
    Seq((0.1, 1L), (0.5, 7L), (0.9, 3L), (0.5, 2L), (0.8, 4L), (0.2, 9L))
      .foreach { case (s, id) => h.offer(s, id) }
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    h.foreachEntry((s, id) => kept += ((s, id)))
    assert(kept.sortBy(t => (-t._1, t._2)) ==
      Seq((0.9, 3L), (0.8, 4L), (0.5, 2L)))
  }

  test("TopKHeap with fewer offers than k keeps everything") {
    val h = new Kernels.TopKHeap(10)
    h.offer(0.4, 5L); h.offer(0.6, 1L)
    assert(h.size == 2)
  }

  test("scoreSingle == naive double-precision scoring, every metric, dim not divisible by 4") {
    val rnd = new scala.util.Random(7)
    val dim = 13 // exercises the unroll tail
    val n = 257
    val rows = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val ids = Array.tabulate(n)(_.toLong)
    val xs = new Array[Float](n * dim)
    val norm2 = rows.map { v =>
      var s = 0.0; var d = 0
      while (d < dim) { s += v(d).toDouble * v(d); d += 1 }
      s
    }
    rows.zipWithIndex.foreach { case (v, i) => System.arraycopy(v, 0, xs, i * dim, dim) }
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    var qn2 = 0.0
    (0 until dim).foreach(d => qn2 += q(d).toDouble * q(d))
    val qInv = 1.0 / math.sqrt(qn2)

    def naive(metric: Int, v: Array[Float], vn2: Double): Double = {
      var dot = 0.0
      (0 until dim).foreach(d => dot += v(d).toDouble * q(d))
      metric match {
        case Kernels.MetricCosine => dot / (math.sqrt(vn2) * math.sqrt(qn2))
        case Kernels.MetricCosineUnit => dot
        case Kernels.MetricDot => 1.0 + dot
        case Kernels.MetricEuclidean =>
          val sq = qn2 + vn2 - 2.0 * dot
          1.0 - math.sqrt(math.max(sq, 0.0))
      }
    }
    for (metric <- Seq(Kernels.MetricCosine, Kernels.MetricCosineUnit,
                       Kernels.MetricDot, Kernels.MetricEuclidean)) {
      val h = new Kernels.TopKHeap(10)
      Kernels.scoreSingle(metric, q, qInv, qn2, xs, ids, n, norm2, h)
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      h.foreachEntry((s, id) => kept += ((s, id)))
      val expect = rows.indices
        .map(i => (naive(metric, rows(i), norm2(i)), i.toLong))
        .sortBy(t => (-t._1, t._2)).take(10)
      val got = kept.sortBy(t => (-t._1, t._2))
      assert(got.map(_._2) == expect.map(_._2), s"metric $metric ids")
      got.zip(expect).foreach { case ((gs, _), (es, _)) =>
        // float accumulator lanes vs double oracle: documented tolerance
        assert(math.abs(gs - es) < 1e-5, s"metric $metric score")
      }
    }
  }

  test("knnBatchFast matches the declarative knn per query, every metric") {
    val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    for (m <- Seq(VectorSearch.Cosine, VectorSearch.Euclidean, VectorSearch.DotProduct)) {
      val fast = VectorSearch.knnBatchFast(e, queries, k = 10, m = m,
          vectorCol = "embedding", idCol = "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      queries.foreach { case (qid, qv) =>
        val exact = VectorSearch.knn(e, qv.toSeq, k = 10, m = m,
            vectorCol = "embedding", idCol = "vec_id")
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val got = fast.filter(_._1 == qid).map(_._2)
        // float kernel vs double plan: allow 1 borderline swap at the tail
        assert((exact -- got).size <= 1,
          s"metric=$m qid=$qid exact=$exact fast=$got")
      }
    }
  }

  test("malformed rows (null / wrong dim) are skipped, not fatal") {
    val qids = Array(1L)
    val qVecs = Array(Array(1f, 0f))
    val rows = Iterator(
      (1L, Array(1f, 0f)),
      (2L, null: Array[Float]),
      (3L, Array(1f, 0f, 0f)), // wrong dim
      (4L, Array(0f, 1f)))
    val out = Kernels.topkOverRows(rows, qids, qVecs, k = 10,
      Kernels.MetricCosineUnit).map(_._2).toSet
    assert(out == Set(1L, 4L))
  }

  test("topkOverCellRows scores rows only against their cell's probing queries") {
    // 2 cells; q0 probes cell 0 only, q1 probes both
    val qids = Array(100L, 200L)
    val qVecs = Array(Array(1f, 0f), Array(0f, 1f))
    val cellQueries = Array(Array(0, 1), Array(1))
    val rows = Iterator(
      (1L, Array(1f, 0f), 0),  // cell 0: visible to both
      (2L, Array(0f, 1f), 1),  // cell 1: visible to q1 only
      (3L, Array(1f, 1f), 1))  // cell 1: visible to q1 only
    val out = Kernels.topkOverCellRows(rows, qids, qVecs, cellQueries, k = 2).toSeq
    val byQ = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byQ(100L) == Set(1L))         // q0 never sees cell 1 rows
    assert(byQ(200L) == Set(2L, 3L))     // q1's best two live in cell 1
  }
}
