package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone probe for the Bench `knn_10k`/`knn_100k` EXACT + SERVING
  * cells (the r11 weak row: exact 209 QPS / p50 2.85 ms in-suite vs
  * r10's 1,156 / 0.39 ms): the same protocol as Bench's `scaleProbe`
  * exact block — tile embeddings to the target, build the packed exact
  * index, serving p50 over 201 single queries, routed fleet QPS and
  * exact job QPS best-of-3 — repeated `rounds` times in one JVM with a
  * machine-canary stamp before and after each round, so suite pressure
  * and machine drift are separable from a real regression.
  *
  * Usage: `sbt "runMain graft.tools.KnnScaleProbe [n] [nFleet] [rounds]"`
  * (defaults 10000 256 3). `SPARK_GRAFT_SF_DIR` selects the testdata SF
  * (default sf0.1, the Bench setting).
  */
object KnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val target = if (args.length > 0) args(0).toLong else 10000L
    val nFleet = if (args.length > 1) args(1).toInt else 256
    val rounds = if (args.length > 2) args(2).toInt else 3
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
    val copies = math.max(1, (target / math.max(1L, n)).toInt)
    val tiled = e.crossJoin(
        spark.range(copies).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * n).as("vec_id"), col("embedding"))
      .repartition(cpus.toInt).cache()
    val total = tiled.count()
    val queries = e.filter(col("vec_id") < nFleet)
      .select(col("vec_id").cast("long").as("qid"), col("embedding").as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toSeq

    def timedRuns(runs: Int)(body: => Unit): Array[Double] =
      Array.fill(runs) {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }

    for (round <- 1 to rounds) {
      System.gc(); Thread.sleep(1000); System.gc()
      val canary0 = MachineCanary.measure()._1
      val idx = graft.search.PackedIndex.buildExact(tiled, "embedding", "vec_id")
      idx.search(queries.take(4), k = 10).count() // warm
      val exactRuns = timedRuns(3)(idx.search(queries, k = 10).count(): Unit)
      val serving = graft.search.ServingSession.fromExact(idx)
      val servingP50 = serving.map { s =>
        var i = 0
        Timing.p50Ms(201) { s.searchOne(queries(i % queries.size)._2, k = 10); i += 1 }
      }.getOrElse(-1.0)
      val routed = graft.search.ServingSession.routedWith(idx, serving)
      val fleetQps = serving.map { _ =>
        routed.search(queries.take(4), k = 10)
        queries.size / timedRuns(3)(routed.search(queries, k = 10): Unit).min
      }.getOrElse(-1.0)
      idx.unpersist()
      val canary1 = MachineCanary.measure()._1
      println(f"[knnprobe] n=$total round=$round canary=[$canary0%.3f,$canary1%.3f]ms " +
        f"exact_qps=${queries.size / exactRuns.min}%.0f " +
        f"exact_runs=${exactRuns.map(s => f"${queries.size / s}%.0f").mkString("[", ",", "]")} " +
        f"single_query_p50_ms=$servingP50%.3f serving_fleet_qps=$fleetQps%.0f path=${routed.lastPath}")
    }
    spark.stop()
  }
}
