package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: print formatted physical plans for the headline queries
  * so scan pruning (`PushedFilters`, `ReadSchema`), whole-stage codegen
  * spans, and exchange placement are inspectable.
  * `sbt "runMain graft.Explain [sfDir] [name...]"` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("point_lookup", "knn_cosine", "hybrid_rrf", "conversation_lastn",
        "q1_agg", "line_dedup", "text_surprisal")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n═══════════ $n ═══════════")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
