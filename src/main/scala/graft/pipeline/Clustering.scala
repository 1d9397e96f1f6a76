package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic clustering for auditable curation decisions.
  *
  * [[graft.ann.Ann.trainIvf]] (MLlib k-means) is the ANN quantizer:
  * fast, float, seeded — but its float centroid sums depend on
  * partition reduce order, so an independent engine cannot replay
  * WHICH documents a downstream dedup pass dropped. Curation wants the
  * opposite trade (SemDeDup — Abbas et al. 2023, arXiv:2303.09540 —
  * drops data by cluster-local cosine; a non-replayable cluster
  * assignment makes the drop set non-auditable). This k-means removes
  * the float path entirely:
  *
  *   - coordinates quantize once to `round(x * scale)` longs;
  *   - distances are exact integer sums of squared diffs;
  *   - centroid updates are `floor(sum / n)` on exact integer sums
  *     (computed as double division — quotient magnitude ≤ scale,
  *     integer sums ≤ 2^53, so the division is exact to well below
  *     the floor boundary for any count ≤ ~10^9 per cluster);
  *   - init is the `k` smallest ids' vectors, cluster id = rank;
  *   - argmin ties break to the lowest cluster id.
  *
  * Every step is order-independent and integer-exact, so the same
  * corpus gives the same assignment in Spark, DuckDB, or a pocket
  * calculator — the correctness entry `kmeans_assign` replays two full
  * Lloyd iterations in pure SQL and matches by hash.
  *
  * Scale shape (100 TB): the quantized table is persisted once
  * (narrow: id + 8·dim bytes); each iteration is one broadcast-closure
  * map (assign) + one map-side-combinable groupBy over (cluster, dim)
  * partial sums (update). Only k·dim rows ever reach the driver per
  * iteration. No pairwise anything; cost is O(iters · n · k · dim)
  * flat map work, the same as any Lloyd run.
  */
object Clustering {

  /** Quantized-integer Lloyd k-means; returns `(id, cluster)`.
    *
    * `iters` counts ASSIGN steps: assignments are computed with the
    * init centroids, then `iters - 1` update+assign rounds follow —
    * the returned labels are the `iters`-th assignment. Empty clusters
    * keep their previous centroid. `scale` must keep `|x|·scale`
    * below ~3e9 so the squared-diff sum stays inside a long
    * (dim ≤ ~1000 at the default 1e6 scale).
    */
  def kmeansAssignQuantized(df: DataFrame, vecCol: String, idCol: String,
                            k: Int, iters: Int,
                            scale: Double = 1e6): DataFrame =
    kmeansAssignWithCentroids(df, vecCol, idCol, k, iters, scale)._1

  /** [[kmeansAssignQuantized]] that ALSO returns the FINAL quantized
    * centroids (the ones the returned labels were assigned against) —
    * k·dim driver longs, already resident in the Lloyd loop. Callers
    * that build a replayable coarse quantizer on top of the
    * deterministic cells (the oracle-graded IVF×SQ8 entry) need the
    * centroids to replay the PRUNE, not just the assignment. */
  def kmeansAssignWithCentroids(df: DataFrame, vecCol: String, idCol: String,
                                k: Int, iters: Int,
                                scale: Double = 1e6): (DataFrame, Array[Array[Long]]) = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // Persisted because the plan below references it iters + 1 times
    // (one scan per assign, one per update); RDD-level persist so the
    // ContextCleaner reclaims the blocks once the result is GC'd —
    // same stance as Dedup.simhashPairs.
    val qRdd = df.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol).cast("array<double>"),
          x => round(x * scale).cast("long")).as("qv"))
      .as[(Long, Array[Long])].rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    val q = spark.createDataset(qRdd).toDF("id", "qv")

    // k·dim driver bytes — bounded by construction, not by data volume
    var cents: Array[Array[Long]] = q.orderBy($"id").limit(k)
      .as[(Long, Array[Long])].collect().map(_._2)
    require(cents.length == k, s"need >= $k rows to seed $k clusters")

    var it = 1
    while (it < iters) {
      val assigned = assignQuantized(q, cents)
      // exact integer partial sums per (cluster, dim) — map-side
      // combinable; k·dim rows collect to the driver
      val upd = assigned.select($"cluster", posexplode($"qv").as(Seq("d", "x")))
        .groupBy($"cluster", $"d")
        .agg(floor(sum($"x").cast("double") / count(lit(1))).cast("long").as("c"))
        .collect()
      val next = cents.map(_.clone()) // empty cluster keeps its centroid
      upd.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2)
      }
      cents = next
      it += 1
    }
    val labels = assignQuantized(q, cents).select($"id", $"cluster")
      .localCheckpoint(eager = true) // cut the lineage over q…
    qRdd.unpersist()                 // …so its blocks can go now
    (labels, cents)
  }

  /** One argmin pass over the quantized table, centroids broadcast in
    * the closure. Exact integer math; ties to the lowest cluster id. */
  private def assignQuantized(q: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    q.as[(Long, Array[Long])].map { case (id, v) =>
      val cs = bc.value
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cs.length) {
        val cv = cs(c)
        var s = 0L
        var i = 0
        while (i < v.length) { val d = v(i) - cv(i); s += d * d; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      (id, v, best)
    }.toDF("id", "qv", "cluster")
  }

  /** SemDeDup (Abbas et al. 2023): cluster embeddings, then surface
    * near-duplicate PAIRS cluster-locally — cosine runs only inside a
    * cell, so the pair space is bounded by the largest cluster, not
    * n². Returns `(id_a, id_b, cos)` with the same double-exact cosine
    * contract as [[graft.dedup.Dedup.embeddingNearDupPairs]] (which
    * does the per-cell work: one repartition by cluster, kernel pass
    * per cell, no pair join).
    *
    * The quantized k-means makes the whole pipeline replayable: the
    * correctness entry's oracle recomputes clusters AND pairs from
    * scratch in SQL and must match by hash.
    */
  def semdedupPairs(df: DataFrame, vecCol: String, idCol: String,
                    k: Int, iters: Int, tau: Double,
                    scale: Double = 1e6): DataFrame = {
    val asg = kmeansAssignQuantized(df, vecCol, idCol, k, iters, scale)
    val withCluster = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"))
      .join(asg, Seq("id"))
    graft.dedup.Dedup.embeddingNearDupPairs(withCluster, "v", "id", "cluster", tau)
  }

  /** Chunk→document embedding pooling: the weighted mean of a doc's
    * chunk embeddings, L2-normalized — how a chunk-indexed corpus gets
    * DOC-level vectors for document dedup ([[semdedupPairs]] input),
    * clustering, and mixture analysis without re-embedding. Weights
    * are the caller's (chunk token counts in the standard recipe).
    *
    * DETERMINISM (the auditable-curation stance of this file): float
    * accumulation order must not change the output, so per doc the
    * chunks are collected and SORTED by chunk id, and both the
    * per-dimension weighted sums and the squared-norm reduce as
    * in-order left folds over that sorted list (`aggregate` /
    * `list_reduce` fold left in both engines → bit-identical IEEE
    * results; same contract as the quantized k-means above). Returns
    * one row per (doc, dim): `(doc_id, n_chunks, dim, value)` with
    * value rounded to 6dp.
    *
    * Scale shape (100 TB): ONE groupBy(doc) shuffle whose payload is
    * the input chunk vectors (linear — collect_list is bounded by
    * chunks-per-doc, a per-document quantity, never corpus-sized), then
    * a narrow per-doc fold of dim × n_chunks multiply-adds and the
    * posexplode projection. A (doc, dim) partial-agg shape would
    * map-side combine but reintroduce order-dependent float sums — the
    * fold keeps the replay exact, and the per-doc work (≤ a few
    * hundred chunks × dim) is cache-resident. */
  def poolEmbeddings(chunks: DataFrame, docCol: String, chunkIdCol: String,
                     vecCol: String, weightCol: String,
                     dim: Int): DataFrame = {
    // null / dimension-mismatched chunk vectors are SKIPPED (the
    // cleaning-engine stance shared with the float kernels and
    // Pq.encodeCells) — element_at past a short array returns null and
    // a single bad chunk would otherwise null-poison its whole doc's
    // folds; a doc with no valid chunks emits nothing
    val valid = chunks.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
    val chs = valid.select(col(docCol).cast("long").as("doc_id"),
        struct(col(chunkIdCol).cast("long").as("cid"),
          col(weightCol).cast("double").as("w"),
          col(vecCol).cast("array<double>").as("v")).as("c"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("c"))).as("chs"))
    val pooled = chs
      .select(col("doc_id"), size(col("chs")).as("n_chunks"), col("chs"),
        aggregate(col("chs"), lit(0.0),
          (acc, c) => acc + c.getField("w")).as("wsum"))
      .select(col("doc_id"), col("n_chunks"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          aggregate(col("chs"), lit(0.0), (acc, c) =>
            acc + c.getField("w") * element_at(c.getField("v"), d + 1)) /
            col("wsum"))
          .as("mean"))
    // L2 norm as an in-order fold over the pooled vector (64 adds —
    // same order both engines), then per-dim normalize + 6dp round
    val normed = pooled.select(col("doc_id"), col("n_chunks"),
      col("mean"),
      sqrt(aggregate(col("mean"), lit(0.0), (acc, x) => acc + x * x)).as("nrm"))
    normed.select(col("doc_id"), col("n_chunks"),
        posexplode(col("mean")).as(Seq("dim", "x")),
        col("nrm"))
      .select(col("doc_id"), col("n_chunks"), col("dim"),
        round(when(col("nrm") > 0.0, col("x") / col("nrm")).otherwise(0.0), 6)
          .as("value"))
  }
}
