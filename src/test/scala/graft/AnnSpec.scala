package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann

class AnnSpec extends AnyFunSuite {
  import TestSpark.spark

  test("IVF recall curve: monotone toward 1.0 at full probe, sublinear candidate fraction") {
    val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val nCells = 8
    val curve = Ann.recallCurve(e, "embedding", "vec_id", queries, k = 10,
      nCells = nCells, nProbes = Seq(1, 4, 8))
    info("IVF recall curve (nProbe, recall@10, scanned fraction):")
    curve.foreach { case (p, r, f) => info(f"  nProbe=$p%2d recall=$r%.3f fraction=$f%.3f") }
    val byProbe = curve.map { case (p, r, f) => p -> (r, f) }.toMap
    assert(byProbe(8)._1 == 1.0)          // full probe == exact
    assert(byProbe(1)._1 <= byProbe(8)._1) // monotone ends
    assert(byProbe(1)._2 < 0.5)            // single probe scans a fraction
    assert(byProbe(4)._2 < 1.0)
  }

  test("nearestCell == nearestCells(v, 1).head — no-copy argmin parity incl. ties") {
    val rnd = new scala.util.Random(7)
    val model = Ann.IvfModel(Array.tabulate(16)(_ =>
      Array.fill(8)(rnd.nextDouble() * 2 - 1)))
    (0 until 200).foreach { _ =>
      val v = Array.fill(8)(rnd.nextDouble() * 2 - 1)
      assert(model.nearestCell(v) === model.nearestCells(v.toSeq, 1).head)
    }
    // exact tie: duplicate centroids — both orders must pick the LOWER id
    val dup = Ann.IvfModel(Array(Array(1.0, 0.0), Array(0.5, 0.5), Array(1.0, 0.0)))
    val q = Array(1.0, 0.0)
    assert(dup.nearestCell(q) === 0 && dup.nearestCells(q.toSeq, 1).head === 0)
  }

  test("ivfSearchBatch returns k ranked rows per query, scores descending") {
    val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val model = Ann.trainIvf(e, "embedding", nCells = 4)
    val cells = Ann.assignCells(e, "embedding", "vec_id", model)
    val q = e.select("vec_id", "embedding").head
    val queries = Seq((q.getLong(0), q.getSeq[Float](1).map(_.toDouble).toSeq))
    val res = Ann.ivfSearchBatch(cells, model, queries, k = 5, nProbe = 4).collect()
    assert(res.length == 5)
    val scores = res.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    // the query vector itself lives in some probed-or-not cell; with
    // nProbe=4 of 4 every cell is probed, so self must be rank 1
    assert(res.minBy(_.getAs[Int]("rank")).getAs[Long]("id") == q.getLong(0))
  }
}
