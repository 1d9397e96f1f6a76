package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: grid PQ refined score-recall@10 over (m, nProbe,
  * refineFactor) at a given scale, using the same tiled-corpus
  * protocol as Bench's knn probes — to pick defaults that actually
  * clear a recall bar instead of guessing (VERDICT r5 #3).
  *
  * Usage: `sbt "runMain graft.tools.PqProbe 100000 64"`
  * (nVectors, nCells).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val target = if (args.length > 0) args(0).toInt else 100000
    val nCells = if (args.length > 1) args(1).toInt else 64
    val nq = 128
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
    val tiled = e.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * n).as("vec_id"), col("embedding"))
      .repartition(cpus.toInt).cache()
    println(s"[pqprobe] tiled to ${tiled.count()} vectors, $nCells cells")
    val queries = e.filter(col("vec_id") < nq)
      .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .toSeq

    val exactKth = graft.search.VectorSearch.knnBatchFast(
        tiled, queries.map { case (q, v) => (q, v.toArray) }, k = 10,
        vectorCol = "embedding", idCol = "vec_id")
      .groupBy("qid").agg(min("score").as("kth")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val model = graft.ann.Ann.trainIvf(tiled, "embedding", nCells = nCells, maxIter = 5)
    val cells = graft.ann.Ann.assignCells(tiled, "embedding", "vec_id", model).cache()
    cells.count()

    for (m <- Seq(8, 16)) {
      val pqModel = graft.ann.Pq.trainResidual(cells, model, m = m)
      val pqIdx = graft.search.PackedIndex.buildIvfPq(
        graft.ann.Pq.encodeCells(cells, pqModel, residualIvf = Some(model)),
        model, pqModel)
      for (nProbe <- Seq(8, 16); rf <- Seq(8, 16, 32, 64)) {
        val t0 = System.nanoTime()
        val refined = pqIdx.searchRefined(tiled, "embedding", "vec_id",
            queries, k = 10, nProbe = nProbe, refineFactor = rf)
          .collect().map(r => (r.getLong(0), r.getDouble(2)))
        val sec = (System.nanoTime() - t0) / 1e9
        // strict 1e-9 vs the float-kernel tolerance: the gap between
        // the two columns is measurement artifact, not real misses
        val recStrict = refined.count { case (q, s) => s >= exactKth(q) - 1e-9 }.toDouble /
          (queries.size * 10)
        val rec = refined.count { case (q, s) =>
          s >= exactKth(q) - graft.search.Kernels.FloatScoreTolerance }.toDouble /
          (queries.size * 10)
        println(f"[pqprobe] m=$m%-3d nProbe=$nProbe%-3d rf=$rf%-3d recall=$rec%.3f recall@1e-9=$recStrict%.3f refined_qps=${queries.size / sec}%.0f")
      }
      pqIdx.unpersist()
    }
    spark.stop()
  }
}
