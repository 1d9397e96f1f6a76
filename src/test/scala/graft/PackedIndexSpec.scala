package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann
import graft.search.{PackedIndex, VectorSearch}

class PackedIndexSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val e = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")

  test("exact packed index matches the scan path bit-for-bit") {
    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val idx = PackedIndex.buildExact(e, "embedding", "vec_id")
    try {
      val packed = idx.search(queries, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val scan = VectorSearch.knnBatchFast(e, queries, k = 10,
          vectorCol = "embedding", idCol = "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(packed == scan) // same float kernel both sides => identical
    } finally idx.unpersist()
  }

  test("IVF packed index matches ivfSearchBatchFast on the same model") {
    val model = Ann.trainIvf(e, "embedding", nCells = 4)
    val cells = Ann.assignCells(e, "embedding", "vec_id", model).cache()
    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val idx = PackedIndex.buildIvf(cells, model)
    try {
      val packed = idx.search(queries, k = 5, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val scan = Ann.ivfSearchBatchFast(cells, model, queries, k = 5, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(packed == scan)
    } finally { idx.unpersist(); cells.unpersist() }
  }

  test("packed index counts every source row exactly once") {
    val idx = PackedIndex.buildExact(e, "embedding", "vec_id")
    try assert(idx.n == e.count())
    finally idx.unpersist()
  }
}
