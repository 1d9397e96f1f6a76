package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators (SURVEY §2.8, extended for the training-data
  * pipeline): watermarked windowed aggregation and event-time session
  * windows — the two Structured Streaming shapes a 100 TB event feed
  * needs beyond plain append ingest ([[StreamingIngest]]).
  *
  * Both run the SAME code in batch mode (Spark unifies the APIs): the
  * `events_windowed` correctness entry executes [[windowedEventCounts]]
  * over the static `events` table against a DuckDB oracle, and the
  * streaming path is exercised with `MemoryStream` in StreamingSpec.
  */
object EventStreams {

  /** Tumbling-window counts per event type. Streaming inputs get a
    * watermark (late rows beyond `watermarkDelay` are dropped and state
    * for closed windows is evicted — bounded state at any scale); on a
    * batch DataFrame the same plan is a plain windowed aggregate.
    * Output: `(window_start TIMESTAMP, event_type, n)`. */
  def windowedEventCounts(events: DataFrame, tsCol: String = "ts",
                          windowDur: String = "1 hour",
                          watermarkDelay: String = "10 minutes"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
             else events
    in.groupBy(window(col(tsCol), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
  }

  /** A closed session: user, bounds, event count. */
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Batch-mode gap sessionization over a historical event table — the
    * backfill twin of [[sessionize]] (same session definition: a session
    * ends after `gapMs` of inactivity). Standard lag/cumsum shape:
    * session starts where the in-user gap exceeds `gapMs`, a running sum
    * of starts numbers the sessions, then one aggregate per session.
    *
    * Scale: ONE shuffle on `userCol` (all three windows and the final
    * aggregate share its partitioning — Catalyst plans a single
    * Exchange); per-user data is sorted within partitions, never
    * collected. A pathologically hot user is one partition's sort —
    * AQE skew handling applies. Input `tsMsCol` must be epoch millis.
    * Output matches [[Session]]: `(user_id, start_ms, end_ms,
    * n_events)`. */
  def sessionizeBatch(events: DataFrame, userCol: String, tsMsCol: String,
                      gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(userCol).orderBy(col(tsMsCol))
    events
      .withColumn("_prev_ms", lag(col(tsMsCol), 1).over(byUser))
      .withColumn("_starts", when(col("_prev_ms").isNull ||
        col(tsMsCol) - col("_prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("_sid", sum(col("_starts"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol).as("user_id"), col("_sid"))
      .agg(min(col(tsMsCol)).as("start_ms"), max(col(tsMsCol)).as("end_ms"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_ms", "end_ms", "n_events")
  }

  /** Internal per-user state (public: the codegen'd state encoder
    * instantiates it from generated Java). */
  final case class SessionState(startMs: Long, lastMs: Long, n: Long)

  /** Event-time session windows via `flatMapGroupsWithState`: a user's
    * session closes after `gapMs` of inactivity (measured against the
    * watermark), at which point ONE session row is emitted and the
    * state is dropped. State per key is three longs — bounded by the
    * number of concurrently-active users, not by history. Input:
    * `(user_id, ts)` rows; streaming only (event-time timeout requires
    * a watermark). */
  def sessionize(events: Dataset[(Long, Timestamp)], gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events.toDF("user_id", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp)](Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP))
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: the session is closed
            val s = state.get
            state.remove()
            Iterator(Session(user, s.startMs, s.lastMs, s.n))
          } else {
            // fold events in time order; a gap INSIDE the data closes
            // the running session inline (the timeout path only fires
            // for keys that go silent)
            val times = rows.map(_._2.getTime).toArray
            java.util.Arrays.sort(times)
            var closed = List.empty[Session]
            var st = state.getOption
            times.foreach { t =>
              st = st match {
                case Some(s) if t - s.lastMs > gapMs =>
                  closed ::= Session(user, s.startMs, s.lastMs, s.n)
                  Some(SessionState(t, t, 1))
                case Some(s) if s.startMs - t > gapMs =>
                  // out-of-order straggler from BEFORE the running
                  // session (watermark allowed it, but merging would
                  // span an inactivity gap): emit as its own session
                  closed ::= Session(user, t, t, 1)
                  Some(s)
                case Some(s) =>
                  Some(SessionState(math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
