package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive event-time extraction.
  *
  * An event table's `ts` column can land in Spark as any of
  *
  *   - `LongType` — epoch NANOSECONDS (parquet INT64 nanos read under
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, the only way Spark can
  *     read a nanos column at all),
  *   - `TimestampType` / `TimestampNTZType` — parquet micros/millis
  *     timestamps, NTZ when the file says `isAdjustedToUTC=false`.
  *
  * Callers that need epoch integers must NOT assume one shape (`ts DIV
  * 1000000` dies at analysis on a timestamp column; `unix_millis(ts)` dies
  * on a long). These helpers inspect the bound schema and emit the right
  * expression for whatever arrived.
  *
  * All arithmetic stays in integer SQL expressions: epoch-ns exceeds 2^53,
  * so a double round-trip corrupts low bits and can shift boundary events
  * across windows/sessions. Integer `DIV` truncates toward zero = floor on
  * the positive post-epoch domain, matching DuckDB's `epoch_ms`/`epoch_ns`
  * flooring on the oracle side.
  *
  * NTZ columns are interpreted in the session time zone; every entry point
  * in this project pins `spark.sql.session.timeZone=UTC`, which matches
  * DuckDB's naive-timestamp epoch functions (no zone shift on either side).
  */
object EventTime {

  /** Epoch microseconds as LONG from whatever `c` is. */
  def epochUs(df: DataFrame, c: String = "ts"): Column = df.schema(c).dataType match {
    case LongType          => expr(s"`$c` DIV 1000")
    case TimestampType     => expr(s"unix_micros(`$c`)")
    case TimestampNTZType  => expr(s"unix_micros(CAST(`$c` AS TIMESTAMP))")
    case other => throw new IllegalArgumentException(
      s"EventTime: unsupported type for event-time column `$c`: $other")
  }

  /** Epoch milliseconds as LONG (floored exactly like DuckDB `epoch_ms`). */
  def epochMs(df: DataFrame, c: String = "ts"): Column = df.schema(c).dataType match {
    case LongType          => expr(s"`$c` DIV 1000000")
    case TimestampType     => expr(s"unix_micros(`$c`) DIV 1000")
    case TimestampNTZType  => expr(s"unix_micros(CAST(`$c` AS TIMESTAMP)) DIV 1000")
    case other => throw new IllegalArgumentException(
      s"EventTime: unsupported type for event-time column `$c`: $other")
  }

  /** Epoch nanoseconds as LONG (µs sources upscale ×1000 — exact, and safe
    * until 2262 when long-ns overflows; same bound the nanos format has). */
  def epochNs(df: DataFrame, c: String = "ts"): Column = df.schema(c).dataType match {
    case LongType          => col(c)
    case TimestampType     => expr(s"unix_micros(`$c`) * 1000L")
    case TimestampNTZType  => expr(s"unix_micros(CAST(`$c` AS TIMESTAMP)) * 1000L")
    case other => throw new IllegalArgumentException(
      s"EventTime: unsupported type for event-time column `$c`: $other")
  }

  /** A proper `TimestampType` instant column from whatever `c` is (for
    * window/watermark operators that need a real timestamp). */
  def asTimestamp(df: DataFrame, c: String = "ts"): Column =
    timestamp_micros(epochUs(df, c))
}
