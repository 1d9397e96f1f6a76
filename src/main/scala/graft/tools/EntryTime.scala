package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe: wall-time named SparkEntry queries at sf0.1, two runs
  * each (cold + steady-state) — the quick way to attribute a graded
  * entry's bench cost before reaching for the full suite.
  * Run: sbt 'runMain graft.tools.EntryTime <entry> [entry ...]' */
object EntryTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toSeq.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
        println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
