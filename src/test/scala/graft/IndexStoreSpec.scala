package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{Ann, IndexStore, Pq}
import graft.search.PackedIndex

/** Durable index artifacts: model JSON round-trips bit-exact, codes
  * round-trip through cell-partitioned parquet, and a reloaded index
  * answers identically to the original. */
class IndexStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val corpus = {
    import spark.implicits._
    val d = 32
    spark.range(400).as[Long].map { i =>
      val rc = new scala.util.Random((i % 8) * 31 + 5)
      val center = Array.fill(d)(rc.nextGaussian())
      val rn = new scala.util.Random(i)
      (i, Pq.l2normalize(center.map(x => (x + 0.3 * rn.nextGaussian()).toFloat)))
    }.toDF("vec_id", "embedding").cache()
  }

  test("IVF and PQ models round-trip bit-exact through JSON") {
    val dir = Files.createTempDirectory("graft_idx").toString
    val ivf = Ann.trainIvf(corpus, "embedding", nCells = 4, maxIter = 4)
    IndexStore.saveIvf(ivf, s"$dir/ivf.json")
    val ivf2 = IndexStore.loadIvf(s"$dir/ivf.json")
    assert(ivf2.nCells == ivf.nCells)
    ivf.centroids.zip(ivf2.centroids).foreach { case (a, b) => assert(a.sameElements(b)) }

    val pq = Pq.train(corpus, "embedding", "vec_id", m = 4, maxTrain = 300, iters = 4)
    IndexStore.savePq(pq, s"$dir/pq.json")
    val pq2 = IndexStore.loadPq(s"$dir/pq.json")
    assert(pq2.m == pq.m && pq2.dsub == pq.dsub && pq2.ksub == pq.ksub)
    assert(pq2.codebooks.sameElements(pq.codebooks))
    // residual flag rides the model through the artifact; absent field
    // (pre-flag files) = raw-trained
    assert(!pq2.residual)
    IndexStore.savePq(pq.copy(residual = true), s"$dir/pq_res.json")
    assert(IndexStore.loadPq(s"$dir/pq_res.json").residual)
    // wrong-format guard
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.json"),
      """{"format":"other"}""".getBytes("UTF-8"))
    assertThrows[IllegalArgumentException](IndexStore.loadIvf(s"$dir/bad.json"))
  }

  test("reloaded IVF-PQ index answers identically to the original") {
    val dir = Files.createTempDirectory("graft_idx2").toString
    val ivf = Ann.trainIvf(corpus, "embedding", nCells = 4, maxIter = 4)
    val pq = Pq.train(corpus, "embedding", "vec_id", m = 4, maxTrain = 300, iters = 4)
    val cells = Ann.assignCells(corpus, "embedding", "vec_id", ivf)
    val codes = Pq.encodeCells(cells, pq)
    IndexStore.saveIvf(ivf, s"$dir/ivf.json")
    IndexStore.savePq(pq, s"$dir/pq.json")
    IndexStore.saveCells(codes.toDF("id", "cell", "code"), s"$dir/codes")

    val queries = corpus.limit(8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val idx = PackedIndex.buildIvfPq(codes, ivf, pq)
    val want = idx.search(queries, k = 5, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
    idx.unpersist()

    val idx2 = PackedIndex.buildIvfPq(
      IndexStore.loadCodes(spark, s"$dir/codes"),
      IndexStore.loadIvf(s"$dir/ivf.json"), IndexStore.loadPq(s"$dir/pq.json"))
    try {
      val got = idx2.search(queries, k = 5, nProbe = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted.toSeq
      assert(got == want)
    } finally idx2.unpersist()

    // incremental append: a second batch encodes against the FROZEN
    // stored models and lands in the same cell-partitioned layout;
    // the reloaded index serves old + new rows
    val batch2 = corpus.select(
      (org.apache.spark.sql.functions.col("vec_id") + 100000).as("vec_id"),
      org.apache.spark.sql.functions.col("embedding"))
    IndexStore.appendBatch(batch2, "embedding", "vec_id",
      s"$dir/ivf.json", s"$dir/pq.json", s"$dir/codes")
    val n0 = corpus.count()
    assert(IndexStore.loadCodes(spark, s"$dir/codes").count() == 2 * n0)
    // replayed batch is idempotent: the anti-join on stored ids skips it
    IndexStore.appendBatch(batch2, "embedding", "vec_id",
      s"$dir/ivf.json", s"$dir/pq.json", s"$dir/codes")
    assert(IndexStore.loadCodes(spark, s"$dir/codes").count() == 2 * n0)
    // a batch off the frozen model's dimensionality fails LOUDLY —
    // anywhere in the batch, not just the first row
    import org.apache.spark.sql.functions.{array, col, lit, when}
    val badDim = batch2.select((col("vec_id") + 500000).as("vec_id"),
      when(col("vec_id") % 2 === 0, array((0 until 5).map(_ => lit(0.1f)): _*))
        .otherwise(col("embedding").cast("array<float>")).as("embedding"))
    assertThrows[IllegalArgumentException](IndexStore.appendBatch(
      badDim, "embedding", "vec_id", s"$dir/ivf.json", s"$dir/pq.json", s"$dir/codes"))
    val merged = PackedIndex.buildIvfPq(
      IndexStore.loadCodes(spark, s"$dir/codes"),
      IndexStore.loadIvf(s"$dir/ivf.json"), IndexStore.loadPq(s"$dir/pq.json"))
    try {
      // identical content under offset ids: the duplicate of each top
      // hit is reachable, so the appended rows serve alongside the old
      val ids = merged.search(queries.take(2), k = 20, nProbe = 4).collect()
        .map(_.getLong(1)).toSet
      assert(ids.exists(_ >= 100000) && ids.exists(_ < 100000))
    } finally merged.unpersist()
  }
}
