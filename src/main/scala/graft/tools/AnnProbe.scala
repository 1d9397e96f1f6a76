package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: isolate the IVF scan-path QPS at a given scale (the
  * BENCH knn_1m `ivf_scan_qps` cell) with warmup + best-of-N, so a
  * regression there can be bisected without a full Bench run.
  *
  * Usage: `sbt "runMain graft.tools.AnnProbe 1000000 256 64 8"`
  * (nVectors, nQueries, nCells, nProbe).
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val target = if (args.length > 0) args(0).toInt else 1000000
    val nq = if (args.length > 1) args(1).toInt else 256
    val nCells = if (args.length > 2) args(2).toInt else 64
    val nProbe = if (args.length > 3) args(3).toInt else 8
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val copies = math.max(1L, target / n)
    val tiled = e.crossJoin(
        spark.range(copies).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * n).as("vec_id"), col("embedding"))
      .repartition(cpus.toInt).cache()
    println(s"[annprobe] tiled to ${tiled.count()} vectors")
    val queries = e.filter(col("vec_id") < nq)
      .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .toSeq

    def timedRuns(runs: Int)(body: => Unit): Array[Double] =
      Array.fill(runs) {
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }

    val model = graft.ann.Ann.trainIvf(tiled, "embedding", nCells = nCells, maxIter = 5)
    val cells = graft.ann.Ann.assignCells(tiled, "embedding", "vec_id", model).cache()
    println(s"[annprobe] cells assigned: ${cells.count()}")

    graft.ann.Ann.ivfSearchBatchFast(cells, model, queries, k = 10, nProbe = nProbe).count() // warm
    val scanRuns = timedRuns(3)(
      graft.ann.Ann.ivfSearchBatchFast(cells, model, queries, k = 10, nProbe = nProbe).count(): Unit)
    println(s"[annprobe] ivf_scan runs=${scanRuns.map(s => f"$s%.2f").mkString("[", ",", "]")}s " +
      f"best_qps=${queries.size / scanRuns.min}%.1f")

    // resident-IVF FLEET path (Bench's knn_* `ivf_fleet_qps` cell) —
    // the r10 artifact's 1M row swung 912→376 on the degraded box;
    // this isolates it with the same build + best-of-3
    val ivfIdx = graft.search.PackedIndex.buildIvf(cells, model)
    graft.search.ServingSession.fromIvf(ivfIdx) match {
      case Some(s) =>
        s.search(queries.take(4), k = 10, nProbe = nProbe) // warm
        val fleetRuns = timedRuns(3)(
          s.search(queries, k = 10, nProbe = nProbe): Unit)
        println(s"[annprobe] ivf_fleet runs=${fleetRuns.map(s => f"$s%.2f").mkString("[", ",", "]")}s " +
          f"best_qps=${queries.size / fleetRuns.min}%.1f")
      case None => println("[annprobe] ivf_fleet: snapshot over byte cap, skipped")
    }
    ivfIdx.unpersist()

    val qArr = queries.map { case (q, v) => (q, v.toArray) }
    graft.search.VectorSearch.knnBatchFast(tiled, qArr, k = 10,
      vectorCol = "embedding", idCol = "vec_id").count() // warm
    val exactRuns = timedRuns(3)(graft.search.VectorSearch.knnBatchFast(
      tiled, qArr, k = 10, vectorCol = "embedding", idCol = "vec_id").count(): Unit)
    println(s"[annprobe] exact_scan runs=${exactRuns.map(s => f"$s%.2f").mkString("[", ",", "]")}s " +
      f"best_qps=${queries.size / exactRuns.min}%.1f")
    spark.stop()
  }
}
