package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** REST serving mode (reference `bin/cli.js serve`): the [[Graft]]
  * composition root behind the HTTP adapter.
  * `sbt "runMain graft.Serve [port] [root]"` — port 0 picks a free port
  * (printed); serves until killed. */
object Serve {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(0)
    val root = args.lift(1).getOrElse(Files.createTempDirectory("graft_serve").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bound = Graft.create(spark, root).restServer(port).start()
    println(s"[serve] listening on http://127.0.0.1:$bound  (root=$root)")
    Thread.currentThread().join() // serve until killed
  }
}
