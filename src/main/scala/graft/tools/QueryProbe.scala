package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time a subset of `SparkEntry.queries` by name without
  * running the whole Bench suite. Usage:
  *
  * {{{
  *   sbt "runMain graft.tools.QueryProbe dedup_pairs dedup_embedding"
  * }}}
  *
  * Env: `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_CPUS`
  * (default 32), `SPARK_GRAFT_RUNS` timed runs per query (default 3,
  * best + all printed). One untimed warmup per query, same protocol
  * as Bench.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    names.foreach { name =>
      val q = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val rows = q(spark, sfDir).count() // warmup
      val secs = Array.fill(runs) {
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s rows=$rows%-8d best=${secs.min}%.2fs runs=${secs.map(s => f"$s%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
