package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Distance metric. `score` is the similarity the reference reports
    * (`score = 1 - distance`, `HNSWIndex.js:307`) — computed directly in
    * similarity form so external oracles reproduce it bit-for-bit (e.g.
    * cosine score is the ratio `dot/(|a||b|)`, not `1-(1-sim)`). */
  sealed trait Metric {
    /** `score = 1 - distance`; can be negative for euclidean/dotProduct —
      * preserved deliberately (reference quirk). */
    def score(v: Column, q: Column): Column
  }
  case object Cosine extends Metric {
    def score(v: Column, q: Column): Column = cosineSimilarity(v, q)
  }
  /** Cosine over vectors already unit-normalized at ingest: plain dot —
    * the reference's normalize-at-insert trick (`HNSWIndex.js:137-140`). */
  case object CosineUnit extends Metric {
    def score(v: Column, q: Column): Column = dotProduct(v, q)
  }
  case object Euclidean extends Metric {
    def score(v: Column, q: Column): Column = lit(1.0) - euclideanDistance(v, q)
  }
  /** distance = -dot (`HNSWIndex.js:461-466`) so score = 1 + dot. */
  case object DotProduct extends Metric {
    def score(v: Column, q: Column): Column = lit(1.0) + dotProduct(v, q)
  }

  def metric(name: String): Metric = name match {
    case "cosine"     => Cosine
    case "euclidean"  => Euclidean
    case "dotProduct" => DotProduct
    case other        => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Top-K rows by similarity to `queryVec`.
    *
    * The query vector is inlined as a plan literal (`vecLit`) — no extra
    * scan job, no broadcast exchange; Catalyst constant-folds it into the
    * whole-stage-codegen'd score expression.
    *
    * @param df          collection table
    * @param queryVec    query vector (inlined as a plan literal)
    * @param k           result count
    * @param m           distance metric
    * @param vectorCol   name of the `ARRAY<FLOAT|DOUBLE>` column
    * @param idCol       unique id column — also the deterministic tie-break
    * @param tenantId    optional tenant filter (partition-prunable)
    * @param preFilter   optional extra predicate (metadata filters, TTL)
    * @param includeVector keep the vector column in the output
    * @param roundTo     round the score to N decimals *before* ranking —
    *                    makes top-K + ties bit-reproducible across engines
    * @param scoreCol    output score column name
    * @param tenantCol   tenant column name
    */
  def knn(df: DataFrame, queryVec: Seq[Double], k: Int,
          m: Metric = Cosine,
          vectorCol: String = "vector", idCol: String = "id",
          tenantId: Option[String] = None,
          preFilter: Option[Column] = None,
          includeVector: Boolean = false,
          roundTo: Option[Int] = None,
          scoreCol: String = "score",
          tenantCol: String = "tenant_id"): DataFrame = {
    require(!df.columns.contains(scoreCol),
      s"input already has a '$scoreCol' column — pass scoreCol to avoid masking it")
    var in = df
    tenantId.foreach(t => in = in.filter(col(tenantCol) === lit(t)))
    preFilter.foreach(p => in = in.filter(p))
    // Single-query scoring runs the native codegen expression
    // ([[graft.functions.QueryScore]]): one array traversal per row, no
    // zipped intermediate, query embedded as a constant reference.
    // Bit-parity with the HOF form (same fold order, same cosine
    // denominator with the precomputed left-to-right qNorm) is
    // contract-tested in VectorFunctionsSpec and gate-checked by the
    // knn_* oracle entries.
    import graft.functions.QueryScore
    val raw = m match {
      case Cosine     => QueryScore(col(vectorCol), queryVec, QueryScore.CosineFull)
      case CosineUnit => QueryScore(col(vectorCol), queryVec, QueryScore.Dot)
      case Euclidean  => QueryScore(col(vectorCol), queryVec, QueryScore.EuclidScore)
      case DotProduct => QueryScore(col(vectorCol), queryVec, QueryScore.DotScore)
    }
    val s = roundTo.map(d => round(raw, d)).getOrElse(raw)
    val scored = in.withColumn(scoreCol, s)
    val out = if (includeVector) scored else scored.drop(vectorCol)
    // desc(score) with asc(id) tie-break => deterministic TakeOrderedAndProject
    out.orderBy(desc(scoreCol), asc(idCol)).limit(k)
  }

  /** Batched kNN: top-K per query over a set of queries — the throughput
    * shape (the reference benches a 1,000-query loop, `bin/cli.js:81-90`;
    * Spark answers all of them in ONE job).
    *
    * Declarative form: broadcast the (small) query side, score every
    * (query, row) pair, rank per query with a *partitioned* window.
    * The shuffle carries the scored pairs clustered by `qid` — fine up to
    * ~10^4 queries; for larger fleets use [[knnBatchFast]].
    */
  def knnBatch(df: DataFrame, queries: DataFrame, k: Int,
               m: Metric = Cosine,
               vectorCol: String = "vector", idCol: String = "id",
               queryIdCol: String = "qid", queryVecCol: String = "qv",
               roundTo: Option[Int] = None,
               scoreCol: String = "score"): DataFrame = {
    val raw = m.score(col(vectorCol), col(queryVecCol))
    val s = roundTo.map(d => round(raw, d)).getOrElse(raw)
    val scored = df.crossJoin(broadcast(queries))
      .withColumn(scoreCol, s)
      .drop(vectorCol, queryVecCol)
    val w = Window.partitionBy(queryIdCol).orderBy(desc(scoreCol), asc(idCol))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Batched kNN via per-partition bounded heaps: each input partition
    * keeps only its local top-K per query (queries held driver-side and
    * closed over — they are small), so the shuffle moves at most
    * `numPartitions × Q × k` rows instead of `N × Q`. This is the
    * 100 TB-safe shape for large query fleets; the final global rank runs
    * on the pruned remainder.
    *
    * Scoring runs in the tiled float kernel ([[Kernels.scoreTile]]) —
    * a (Q × dim)·(dim × tile) matrix multiply per row tile with
    * primitive-array top-K heaps (VERDICT r2 §Performance fix).
    *
    * PRECISION (ADVICE r3): the kernel accumulates dot products in
    * single precision, and Euclidean uses the norm identity
    * `‖q‖² + ‖v‖² − 2·dot`, which cancels for near-identical vectors —
    * near-tied candidates (score gap within float ulps, ~1e-7 relative)
    * may rank in a different order than the declarative double-precision
    * path ([[knn]]/[[knnBatch]]). Scores themselves agree to ~6 decimal
    * digits. Callers needing bit-stable ordering at equal scores should
    * use the declarative paths.
    *
    * Output: (qid, id, score, rank) with rank ≤ k per qid.
    */
  def knnBatchFast(df: DataFrame, queries: Seq[(Long, Array[Double])], k: Int,
                   m: Metric = Cosine,
                   vectorCol: String = "vector", idCol: String = "id"): DataFrame = {
    import df.sparkSession.implicits._
    val spark = df.sparkSession
    val qids = queries.map(_._1).toArray
    val qVecs = queries.map(_._2.map(_.toFloat)).toArray
    val qBc = spark.sparkContext.broadcast((qids, qVecs))
    val metricCode = m match {
      case Cosine => Kernels.MetricCosine
      case CosineUnit => Kernels.MetricCosineUnit
      case DotProduct => Kernels.MetricDot
      case Euclidean => Kernels.MetricEuclidean
    }
    val pairs = df.select(col(idCol).cast("long").as("id"),
        col(vectorCol).cast("array<float>").as("v"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (ids, vecs) = qBc.value
        Kernels.topkOverRows(it, ids, vecs, k, metricCode)
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaDouble))
      .toDF("qid", "id", "score")
    val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** TTL expiry predicate: keep rows whose age is within `ttl_ms`
    * (`HNSWIndex.js:295-300` — lazy expiry at read; pair with
    * [[graft.engine.FusionEngine.vacuum]] for physical deletion at scale).
    * Null/0 ttl = no expiry. */
  def ttlAlive(tsCol: Column, ttlMsCol: Column, nowMs: Column = unix_millis(current_timestamp())): Column =
    ttlMsCol.isNull || ttlMsCol <= 0 || (nowMs - unix_millis(tsCol)) < ttlMsCol
}
