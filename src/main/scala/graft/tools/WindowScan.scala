package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Finds every graded entry whose EXECUTED plan contains a
  * no-partition [[WindowExec]] (the "Moving all data to a single
  * partition" warning — a scale bug unless the window's input is
  * bounded upstream). Plans are executed (not just analyzed) at the
  * given SF so AQE-final plans are scanned. */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    // recursive scan that unwraps AQE wrappers, query stages, and
    // subquery plans — a plain collect stops at AdaptiveSparkPlanExec
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] = {
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case _ => Seq.empty
      }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(scan) ++
        p.subqueries.flatMap(scan) ++
        p.expressions.flatMap(_.collect {
          case pe: org.apache.spark.sql.execution.ScalarSubquery => pe.plan
        }).flatMap(scan)
    }
    var found = 0
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.count()
        // executedPlan after execution = the AQE-final plan
        val hits = scan(df.queryExecution.executedPlan)
        if (hits.nonEmpty) {
          found += hits.size
          println(s"[windowscan] $name: ${hits.size} no-partition WindowExec")
          hits.foreach(w => println(s"  ${w.windowExpression.mkString(", ").take(120)}"))
        }
      } catch { case e: Throwable =>
        println(s"[windowscan] $name FAILED: ${e.getMessage}")
      }
    }
    println(s"[windowscan] done: $found no-partition windows across ${names.size} entries")
    spark.stop()
  }
}
