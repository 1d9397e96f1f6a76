package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end schema-adaptivity: every event-time query must return
  * IDENTICAL rows whether `events.ts` arrives as TIMESTAMP_NTZ (the
  * current testdata shape) or LONG epoch-nanoseconds (the r1-r7 shape a
  * user's `nanosAsLong` parquet still produces). EventTimeSpec pins the
  * column helpers; this spec pins the seven whole queries that died in
  * round 8 when the shape flipped — the regression test for the next
  * flip, in either direction. */
class EventTimeAdaptiveSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  /** sf0.001 with events.ts rewritten LONG-ns; other tables symlinked. */
  private lazy val nsDir: String = {
    val dir = Files.createTempDirectory("graft_ns_events").toFile
    dir.deleteOnExit()
    val src = Paths.get(TestSpark.Sf0001)
    src.toFile.listFiles().filter(_.getName.endsWith(".parquet"))
      .filterNot(_.getName == "events.parquet")
      .foreach(f => Files.createSymbolicLink(
        Paths.get(dir.getPath, f.getName), f.toPath))
    val ev = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
    val cols = ev.columns.map {
      case "ts" => expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000L").as("ts")
      case c    => col(c)
    }
    ev.select(cols.toIndexedSeq: _*)
      .coalesce(1).write.parquet(s"${dir.getPath}/events.parquet")
    dir.getPath
  }

  private val eventQueries = Seq("ttl_filter", "consolidation_decay",
    "events_windowed", "events_sessionize", "events_asof",
    "events_asof_exact", "events_range")

  test("events.ts LONG-ns source verifies as a long column") {
    val ts = spark.read.parquet(s"$nsDir/events.parquet").schema("ts")
    assert(ts.dataType === org.apache.spark.sql.types.LongType)
  }

  eventQueries.foreach { name =>
    test(s"$name: identical rows from TIMESTAMP_NTZ and LONG-ns events") {
      val q = SparkEntry.queries(name)
      // window_start is TimestampType in events_windowed — stringify so
      // the comparison is on rendered values, not java object identity
      def rows(dir: String): Seq[String] =
        q(spark, dir).collect().map(_.mkString("")).toSeq.sorted
      val ntz = rows(TestSpark.Sf0001)
      val ns = rows(nsDir)
      assert(ns.nonEmpty, s"$name returned no rows")
      assert(ns === ntz)
    }
  }
}
