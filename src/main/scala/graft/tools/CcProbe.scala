package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone probe for the distributed connected-components branch
  * (the >2^20-edge min-label path — Bench's `cc_10m` block, sizeable
  * here). Graph: two-level star, components of 100 nodes, diameter 4,
  * so the measurement is the per-round join/agg machinery, not an
  * adversarial diameter. Usage:
  *
  * {{{
  *   SPARK_GRAFT_CC_EDGES=10000000 sbt "runMain graft.tools.CcProbe"
  * }}}
  *
  * Env: `SPARK_GRAFT_CC_EDGES` (default 10M), `SPARK_GRAFT_CPUS`
  * (default 32), `SPARK_GRAFT_RUNS` (default 3). Prints canary stamps
  * around the timed runs (same protocol as Bench). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = sys.env.getOrElse("SPARK_GRAFT_CC_EDGES", "10000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (c0, _) = MachineCanary.measure()
    def edges = spark.range(nEdges).select(
      col("id").as("id_a"),
      when(col("id") % 100 === 0, col("id") + 5)
        .when(col("id") % 10 === 0, col("id") - col("id") % 100)
        .otherwise(col("id") - col("id") % 10).as("id_b"))
    def run(): Long = graft.dedup.Dedup.connectedComponents(edges)
      .agg(countDistinct(col("comp"))).head().getLong(0)
    val comps = run() // warm
    require(comps == nEdges / 100,
      s"expected ${nEdges / 100} components, got $comps")
    val secs = Array.fill(runs) {
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    val (c1, _) = MachineCanary.measure()
    println(f"[probe] cc edges=$nEdges comps=$comps best=${secs.min}%.2fs " +
      f"runs=${secs.map(s => f"$s%.2f").mkString("[", ",", "]")} " +
      f"canary=[$c0%.3f,$c1%.3f]ms")
    spark.stop()
  }
}
