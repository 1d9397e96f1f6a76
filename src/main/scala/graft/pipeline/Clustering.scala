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
                            scale: Double = 1e6): DataFrame = {
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
    labels
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
}
