package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` of named graded queries to one file per
  * query — the per-round before/after plan evidence the optimization
  * deliverable wants (`plans/r<N>/<query>_<suffix>.txt`). Unlike
  * [[PlanDump]] (the curated PLANS.md slice), this takes the query
  * list and output naming from the command line:
  *
  * {{{
  *   sbt 'runMain graft.tools.PlanFiles plans/r18 before dedup_pairs repeated_ngrams'
  * }}}
  *
  * Env: `SPARK_GRAFT_SF_DIR` (default sf0.01), `SPARK_GRAFT_CPUS`
  * (default 8) — PlanDump's defaults, so the two tools' plans are
  * comparable. */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanFiles <outDir> <suffix> <query> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        (s"# $name ($suffix) — explain(formatted), $sfDir, local[$cpus]\n\n" + plan)
          .getBytes("UTF-8"))
      println(s"[plans] wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
