package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.EventTime]] must emit identical epoch integers no
  * matter which physical type the `ts` column landed as — LONG
  * nanoseconds, TIMESTAMP, or TIMESTAMP_NTZ (the three shapes a user's
  * event parquet can take, and the exact break that cost round 8 seven
  * oracle entries when testdata flipped from nanos to timestamp[us]). */
class EventTimeSpec extends AnyFunSuite {
  import graft.functions.EventTime

  private val spark = TestSpark.spark
  import spark.implicits._

  // epoch instants with sub-ms micros to catch flooring bugs, incl. a
  // ms-boundary-1µs value (floor must go DOWN, not round up)
  private val micros = Seq(0L, 999L, 1000L, 1699999999999999L, 1700000000000001L,
    1700000001999999L)

  private def longNsDf = micros.map(_ * 1000L).toDF("ts")
  private def tsDf = longNsDf.select(timestamp_micros(expr("ts DIV 1000")).as("ts"))
  private def ntzDf = tsDf.select($"ts".cast(TimestampNTZType).as("ts"))

  private def longs(df: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.Column): Seq[Long] =
    df.select(c.as("v")).orderBy("v").collect().map(_.getLong(0)).toSeq

  test("epochUs identical across LONG-ns, TIMESTAMP, TIMESTAMP_NTZ") {
    val want = micros.sorted
    assert(longs(longNsDf, EventTime.epochUs(longNsDf)) === want)
    assert(longs(tsDf, EventTime.epochUs(tsDf)) === want)
    assert(longs(ntzDf, EventTime.epochUs(ntzDf)) === want)
  }

  test("epochMs floors exactly like DuckDB epoch_ms, all three types") {
    val want = micros.map(_ / 1000L).sorted
    assert(longs(longNsDf, EventTime.epochMs(longNsDf)) === want)
    assert(longs(tsDf, EventTime.epochMs(tsDf)) === want)
    assert(longs(ntzDf, EventTime.epochMs(ntzDf)) === want)
  }

  test("epochNs identical across types (µs sources upscale ×1000)") {
    val want = micros.map(_ * 1000L).sorted
    assert(longs(longNsDf, EventTime.epochNs(longNsDf)) === want)
    assert(longs(tsDf, EventTime.epochNs(tsDf)) === want)
    assert(longs(ntzDf, EventTime.epochNs(ntzDf)) === want)
  }

  test("asTimestamp yields the same instant from every shape") {
    val a = longs(longNsDf, unix_micros(EventTime.asTimestamp(longNsDf)))
    val b = longs(tsDf, unix_micros(EventTime.asTimestamp(tsDf)))
    val c = longs(ntzDf, unix_micros(EventTime.asTimestamp(ntzDf)))
    assert(a === micros.sorted); assert(b === a); assert(c === a)
  }

  test("unsupported type fails loudly at plan time") {
    val bad = Seq("x").toDF("ts")
    val e = intercept[IllegalArgumentException](EventTime.epochMs(bad))
    assert(e.getMessage.contains("unsupported"))
  }
}
