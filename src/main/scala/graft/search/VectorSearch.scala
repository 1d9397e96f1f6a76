package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Exact k-nearest-neighbour search — the correctness spine of the engine
  * (SURVEY §7.1). The reference serves kNN from an HNSW graph
  * (`/root/reference/src/core/HNSWIndex.js:245-320`); on Spark the same
  * *results contract* (top-K by metric, `score = 1 - distance`) is a
  * declarative scan: score column + `ORDER BY ... LIMIT k`, which Catalyst
  * executes as `TakeOrderedAndProject` — per-partition top-K heaps with a
  * driver-side merge of K·numPartitions rows, no global sort, no shuffle
  * of the full table. At 100 TB this reads minimal columns (pruned scan)
  * and moves only K rows per partition.
  *
  * Divergence from the reference, preserved deliberately (SURVEY §2.2):
  * filters here run BEFORE ranking (filter-then-rank), so a selective
  * filter still returns `k` rows when matches exist — *more* correct than
  * the reference's post-ANN filtering which can under-fill.
  */
object VectorSearch {

  sealed trait Metric {
    /** distance column; `score = 1 - distance` */
    def distance(v: Column, q: Column): Column
  }
  case object Cosine extends Metric {
    def distance(v: Column, q: Column): Column = cosineDistance(v, q)
  }
  /** Cosine over vectors already unit-normalized at ingest: plain dot. */
  case object CosineUnit extends Metric {
    def distance(v: Column, q: Column): Column = lit(1.0) - dotProduct(v, q)
  }
  case object Euclidean extends Metric {
    def distance(v: Column, q: Column): Column = euclideanDistance(v, q)
  }
  case object DotProduct extends Metric {
    def distance(v: Column, q: Column): Column = dotProductDistance(v, q)
  }

  def metric(name: String): Metric = name match {
    case "cosine"     => Cosine
    case "euclidean"  => Euclidean
    case "dotProduct" => DotProduct
    case other        => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Top-K rows by similarity to `queryVec`.
    *
    * @param df          collection table
    * @param queryVec    query vector (broadcast as a plan literal)
    * @param k           result count
    * @param m           distance metric
    * @param vectorCol   name of the `ARRAY<FLOAT|DOUBLE>` column
    * @param idCol       unique id column — also the deterministic tie-break
    * @param tenantId    optional tenant filter (partition-prunable)
    * @param preFilter   optional extra predicate (metadata filters, TTL)
    * @param includeVector keep the vector column in the output
    */
  def knn(df: DataFrame, queryVec: Seq[Double], k: Int,
          m: Metric = Cosine,
          vectorCol: String = "vector", idCol: String = "id",
          tenantId: Option[String] = None,
          preFilter: Option[Column] = None,
          includeVector: Boolean = false): DataFrame = {
    val q = vecLit(queryVec)
    var in = df
    tenantId.foreach(t => in = in.filter(col("tenant_id") === lit(t)))
    preFilter.foreach(p => in = in.filter(p))
    val scored = in.withColumn("score", score(m.distance(col(vectorCol), q)))
    val out = if (includeVector) scored else scored.drop(vectorCol)
    // desc(score) with asc(id) tie-break => deterministic TakeOrderedAndProject
    out.orderBy(desc("score"), asc(idCol)).limit(k)
  }

  /** TTL expiry predicate: keep rows whose age is within `ttl_ms`
    * (`HNSWIndex.js:295-300` — lazy expiry at read; pair with a vacuum
    * job for physical deletion at scale). Null/0 ttl = no expiry. */
  def ttlAlive(tsCol: Column, ttlMsCol: Column, nowMs: Column = unix_millis(current_timestamp())): Column =
    ttlMsCol.isNull || ttlMsCol <= 0 || (nowMs - unix_millis(tsCol)) < ttlMsCol
}
