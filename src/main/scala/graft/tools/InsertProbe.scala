package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone probe for the `insert_100k` baseline row (VERDICT r10
  * #1: the official r10 artifact measured 2.06× the reference's 2.8 s
  * on a box whose canary opened 2× slow; prior rounds measured
  * 0.97-1.55×). Same protocol that closed `dedup_pairs`/`pack_s`:
  * canary stamps around N full engine-insert runs, each into a fresh
  * collection, identical construction to Bench's `engine_100k` block.
  *
  * Env: `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_CPUS`
  * (default 32), `SPARK_GRAFT_RUNS` (default 3). */
object InsertProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (c0, _) = MachineCanary.measure()
    val root = java.nio.file.Files.createTempDirectory("graft_insert_probe").toString
    val g = graft.Graft.create(spark, root)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val copies = math.max(1, (100000 / math.max(1L, n)).toInt)
    val tiled = e.crossJoin(spark.range(copies).select(col("id").as("copy")))
      .select(concat(lit("v"), (col("vec_id") + col("copy") * n)).as("id"),
        col("embedding").cast("array<float>").as("vector"),
        concat(lit("doc "), col("vec_id")).as("content"))
    val secs = (0 until runs).map { i =>
      val name = s"bench$i"
      g.engine.createCollection(name, graft.model.CollectionConfig(dimensions = 64))
      val t0 = System.nanoTime()
      g.engine.insert(name, tiled.repartition(cpus))
      (System.nanoTime() - t0) / 1e9
    }
    val (c1, _) = MachineCanary.measure()
    val best = secs.min
    println(f"[probe] insert_100k best=$best%.3fs runs=${secs.map(s => f"$s%.2f").mkString("[", ",", "]")} " +
      f"ratio_vs_2.8=${best / 2.8}%.2f canary=[$c0%.3f,$c1%.3f]ms " +
      f"canary_norm_ratio=${(best / 2.8) * (0.31 / math.max(c0, 1e-9))}%.2f")
    spark.stop()
  }
}
