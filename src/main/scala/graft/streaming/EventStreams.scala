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

  /** Event DEBOUNCE dedup: drop an event when another event of the same
    * key fired within the previous `windowMs` (duplicate clicks, retry
    * storms, at-least-once upstream delivery). An event is kept iff its
    * gap to the IMMEDIATELY PRECEDING event of its key exceeds
    * `windowMs` — the raw-predecessor definition (a burst longer than
    * the window collapses to its first event only if gaps inside the
    * burst stay under the window; each sub-threshold gap suppresses).
    *
    * Scale: ONE partitioned lag window keyed on `keyCols` — per-key
    * ordering only, never a corpus-wide sort; state per task is one
    * row. `tieCols` break equal-timestamp order deterministically
    * (equal-ts events debounce in `tieCols` order: the first survives,
    * the rest are 0-gap duplicates). Returns the input columns,
    * filtered. Input `tsMsCol` must be epoch millis. */
  def debounce(events: DataFrame, keyCols: Seq[String], tsMsCol: String,
               windowMs: Long, tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "debounce needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsMsCol +: tieCols).map(col): _*)
    events
      .withColumn("_prev_ms", lag(col(tsMsCol), 1).over(w))
      .filter(col("_prev_ms").isNull ||
        col(tsMsCol) - col("_prev_ms") > windowMs)
      .drop("_prev_ms")
  }

  /** Point-in-time (as-of) LEFT join: each `left` row picks up
    * `carryCols` from the LATEST `right` row of the same key with
    * `right.time <= left.time` (ties at equal time match — the right
    * row sorts first), or NULLs when no prior right row exists. The
    * classic feature-store / training-data lookup ("the price as of
    * the trade", "the profile as of the event") that Spark has no
    * native operator for.
    *
    * Plan shape: NOT a range join (whose candidate space explodes as
    * |left|×|right| per key) — both sides union into one stream,
    * ONE shuffle on `keyCol`, one within-partition sort, and a
    * running `last(_, ignoreNulls)` window carries the right payload
    * forward. Cost is sort-merge linear per key; a hot key is one
    * partition's sort (AQE skew handling applies).
    *
    * Requirements: time columns must be integral (cast upstream —
    * epoch ms/ns); `carryCols` must not collide with left's columns;
    * `right` SHOULD be unique per `(key, time)` (pre-aggregate
    * duplicates upstream). If it isn't, the pick is still
    * DETERMINISTIC — the carry struct itself is the window sort's
    * final tiebreaker, so the greatest carry tuple (field-order
    * struct comparison) wins at equal instants on every run/partition
    * layout (ADVICE r5: an arbitrary-pick would vary across runs). */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTimeCol: String, rightTimeCol: String,
               carryCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(carryCols.nonEmpty, "asOfJoin needs at least one carry column")
    require(carryCols.forall(c => !left.columns.contains(c)),
      s"carryCols ${carryCols.filter(left.columns.contains)} collide with left columns")
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    // the right payload travels as ONE struct, carried atomically —
    // per-column last(ignoreNulls) would backfill a NULL field of the
    // latest right row from an OLDER row, emitting a mixed row that
    // never existed (review r5)
    val rightStruct = struct(carryCols.map(col).toIndexedSeq: _*)
    val lSide = left.select(col(keyCol).as("_k"),
      col(leftTimeCol).cast("long").as("_t"), lit(1).as("_side"),
      leftStruct.as("_l"))
    val lType = lSide.schema("_l").dataType
    val rSide0 = right.select(col(keyCol).as("_k"),
      col(rightTimeCol).cast("long").as("_t"), lit(0).as("_side"),
      rightStruct.as("_c"))
    val rType = rSide0.schema("_c").dataType
    val rSide = rSide0.withColumn("_l", lit(null).cast(lType))
      .select("_k", "_t", "_side", "_l", "_c")
    // _c as final sort key: among duplicate right rows at one (key,
    // time) the greatest carry struct sorts last and is the row
    // last() carries — a total order, so the pick is deterministic.
    // Left rows all have _c NULL there, so their relative order stays
    // irrelevant (each sees the same preceding right rows). Map-typed
    // carries are not orderable in Spark — those keep the old
    // (documented) arbitrary pick rather than failing the whole join.
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case _ => true
    }
    val sortKeys =
      if (orderable(rType)) Seq(col("_t"), col("_side"), col("_c"))
      else Seq(col("_t"), col("_side"))
    val w = Window.partitionBy("_k").orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.withColumn("_c", lit(null).cast(rType))
      .select("_k", "_t", "_side", "_l", "_c")
      .unionByName(rSide)
      .select(col("_side"), col("_l"),
        last(col("_c"), ignoreNulls = true).over(w).as("_cc"))
      .filter(col("_side") === 1)
      .select((Seq(col("_l.*")) ++
        carryCols.map(c => col("_cc").getField(c).as(c))): _*)
  }

  /** Bounded time-RANGE join: all `(left, right)` pairs of the same key
    * with `left.time − windowMs < right.time <= left.time` — the
    * "events in the trailing window" lookup (views before a purchase,
    * sensor readings before an alarm). Output: left's columns plus
    * `carryCols` from each matching right row (INNER — rows without a
    * match don't appear; aggregate + left-join upstream for counts
    * with zeros).
    *
    * Plan shape: NOT an inequality join (Spark plans those as
    * broadcast-nested-loop — |L|×|R| per key): both times bucketize to
    * `windowMs`-wide buckets, each right row is visible in its own and
    * the NEXT bucket (2× fan-out, constant), and the join is a plain
    * equi-join on `(key, bucket)` — shuffle-hash/sort-merge, AQE-
    * friendly — with the exact range predicate as a post-filter.
    * Matches per pair are emitted once: the two candidate buckets are
    * disjoint. Time columns must be integral and NON-NEGATIVE (epoch
    * values — `DIV` truncation and floor division agree there; a
    * negative time would bucket off-by-one). */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                leftTimeCol: String, rightTimeCol: String, windowMs: Long,
                carryCols: Seq[String]): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    require(carryCols.nonEmpty, "rangeJoin needs at least one carry column")
    require(carryCols.forall(c => !left.columns.contains(c)),
      s"carryCols ${carryCols.filter(left.columns.contains)} collide with left columns")
    val lbb = left.select(
      (Seq(col(keyCol).as("_k"), col(leftTimeCol).cast("long").as("_lt"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("_l"))): _*)
      .withColumn("_b", expr(s"_lt DIV $windowMs"))
    val rbb = right.select(
      (Seq(col(keyCol).as("_k"), col(rightTimeCol).cast("long").as("_rt")) ++
        carryCols.map(col)): _*)
      .withColumn("_rb", expr(s"_rt DIV $windowMs"))
      .withColumn("_b", explode(array(col("_rb"), col("_rb") + 1)))
    lbb.join(rbb, Seq("_k", "_b"))
      .filter(col("_rt") > col("_lt") - windowMs && col("_rt") <= col("_lt"))
      .select((Seq(col("_l.*")) ++ carryCols.map(col)): _*)
  }

  /** Merged-stream row for [[asOfEnrichStream]]: `isLeft = false` rows
    * update the per-key state, `isLeft = true` rows emit enriched. */
  final case class AsOfEvent(key: Long, tsMs: Long, isLeft: Boolean, value: Long)

  /** [[AsOfEvent]] + the event-time column the watermark rides (public
    * for the codegen'd encoder). */
  final case class AsOfEventT(key: Long, tsMs: Long, isLeft: Boolean,
                              value: Long, eventTime: Timestamp)

  /** [[asOfEnrichStream]] output: a left row with the latest prior
    * right `(asofTs, asofValue)` of its key, or nulls (None). */
  final case class AsOfEnriched(key: Long, tsMs: Long, value: Long,
                                asofTs: Option[Long], asofValue: Option[Long])

  /** Per-key latest right payload (public for the state encoder). */
  final case class AsOfState(tsMs: Long, value: Long)

  /** STREAMING twin of [[asOfJoin]]: the merged left/right stream
    * enriches each left row with the key's latest right payload from
    * the state store (two longs per key). Rows are processed in
    * event-time order WITHIN each micro-batch; across batches the
    * enrichment is as-of-arrival — the streaming approximation every
    * online feature store makes (exact when each key's rows arrive in
    * event-time order). Batch backfill should use [[asOfJoin]], the
    * exact form — same pairing as `sessionize` / `sessionizeBatch`.
    *
    * State EVICTION (streaming only — review r5): a key whose last row
    * is `ttlMs` of EVENT time behind the watermark is dropped (same
    * mechanism as [[sessionize]]), so the store is bounded by
    * recently-active keys, not every key ever seen — an evicted key's
    * next left row reads as "no prior right" until a fresh right row
    * arrives, the standard feature-cache-expiry tradeoff. The
    * watermark this rides on carries the usual contract: input rows
    * more than `watermarkDelay` behind the stream's max event time
    * are DROPPED before the state function (exactly as
    * [[windowedEventCounts]] / [[sessionize]] drop late rows) — size
    * `watermarkDelay` to the source's real lateness. A BATCH Dataset
    * takes the no-watermark path (every row processed, no timeouts —
    * state dies with the job, so eviction is moot); exact batch
    * backfill remains [[asOfJoin]]. */
  def asOfEnrichStream(events: Dataset[AsOfEvent],
                       ttlMs: Long = 24L * 3600 * 1000,
                       watermarkDelay: String = "10 minutes"): Dataset[AsOfEnriched] = {
    implicit val evEnc = Encoders.product[AsOfEventT]
    implicit val outEnc = Encoders.product[AsOfEnriched]
    implicit val stEnc = Encoders.product[AsOfState]
    implicit val longEnc = Encoders.scalaLong
    val streaming = events.isStreaming
    val withTime = events.toDF()
      .withColumn("eventTime", expr("timestamp_millis(tsMs)"))
    val marked = if (streaming) withTime.withWatermark("eventTime", watermarkDelay)
      else withTime
    val timeout = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    marked.as[AsOfEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfEnriched](OutputMode.Append, timeout) {
        (key: Long, rows: Iterator[AsOfEventT], state: GroupState[AsOfState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption
            var maxMs = Long.MinValue
            val out = Vector.newBuilder[AsOfEnriched]
            // event-time order within the batch; right sorts before left
            // at equal ts so an equal-time quote is visible to the trade
            rows.toVector.sortBy(e => (e.tsMs, e.isLeft)).foreach { e =>
              maxMs = math.max(maxMs, e.tsMs)
              if (e.isLeft)
                out += AsOfEnriched(key, e.tsMs, e.value,
                  st.map(_.tsMs), st.map(_.value))
              else if (st.forall(_.tsMs <= e.tsMs))
                st = Some(AsOfState(e.tsMs, e.value))
            }
            st.foreach { s =>
              state.update(s)
              // streaming only: the batch GroupState has no watermark
              // and needs no timeout (state dies with the job)
              if (streaming)
                state.setTimeoutTimestamp(
                  math.max(maxMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** One buffered `(tsMs, value)` row of [[AsOfExactState]] (public
    * for the state encoder). */
  final case class AsOfPend(tsMs: Long, value: Long)

  /** [[asOfEnrichStreamExact]] per-key state: left rows awaiting the
    * watermark, right rows still mutable-relevant, and the compacted
    * latest right at-or-below the watermark. Bounded by one watermark
    * delay of rows per key, NOT history — rights at or below the
    * watermark collapse to the single latest `(latestTs, latestVal)`
    * and emitted lefts leave the buffer. */
  final case class AsOfExactState(lefts: List[AsOfPend], rights: List[AsOfPend],
                                  latestTs: Long, latestVal: Long, hasLatest: Boolean)

  /** EXACT streaming as-of: [[asOfEnrichStream]]'s opt-in twin that
    * buffers left rows until the WATERMARK passes their event time and
    * only then emits them, enriched with the true latest prior right —
    * so cross-batch out-of-order arrivals (a right row for time 90
    * arriving a batch after a left row at 100) enrich exactly as the
    * batch [[asOfJoin]] would (VERDICT r5 #4). The price of exactness
    * is latency (a left row waits out `watermarkDelay`) and a state
    * buffer of one watermark-delay of rows per key; the default
    * as-of-arrival mode keeps zero-latency emission with 2 longs of
    * state. Rows later than the watermark are dropped by the standard
    * contract — size `watermarkDelay` to the source's real lateness,
    * it is also the exactness horizon.
    *
    * Mechanics per key: new rows land in the left/right buffers; every
    * invocation drains lefts with `ts ≤ watermark` in event-time order
    * (right rows at the same instant visible, matching [[asOfJoin]]),
    * compacts rights at-or-below the watermark to the single latest,
    * and arms an event-time timeout at the earliest still-buffered
    * left so the group wakes to emit even if the key goes silent. On a
    * BATCH Dataset the watermark is +∞ (one group pass drains
    * everything — equals [[asOfJoin]] by construction, no timeouts). */
  def asOfEnrichStreamExact(events: Dataset[AsOfEvent],
                            watermarkDelay: String = "10 minutes"): Dataset[AsOfEnriched] = {
    implicit val evEnc = Encoders.product[AsOfEventT]
    implicit val outEnc = Encoders.product[AsOfEnriched]
    implicit val stEnc = Encoders.product[AsOfExactState]
    implicit val longEnc = Encoders.scalaLong
    val streaming = events.isStreaming
    val withTime = events.toDF()
      .withColumn("eventTime", expr("timestamp_millis(tsMs)"))
    val marked = if (streaming) withTime.withWatermark("eventTime", watermarkDelay)
      else withTime
    val timeout = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    marked.as[AsOfEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfExactState, AsOfEnriched](OutputMode.Append, timeout) {
        (key: Long, rows: Iterator[AsOfEventT], state: GroupState[AsOfExactState]) =>
          val st0 = state.getOption.getOrElse(
            AsOfExactState(Nil, Nil, Long.MinValue, 0L, hasLatest = false))
          // ingest this batch's rows (empty on a pure timeout wake-up)
          var lefts = st0.lefts
          var rights = st0.rights
          rows.foreach { e =>
            if (e.isLeft) lefts ::= AsOfPend(e.tsMs, e.value)
            else rights ::= AsOfPend(e.tsMs, e.value)
          }
          val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
          val leftsSorted = lefts.sortBy(_.tsMs)
          // rights sorted by (ts, value): equal-instant duplicates pick
          // the greatest value — the same deterministic tiebreak as
          // asOfJoin's carry-struct sort
          val rightsSorted = rights.sortBy(p => (p.tsMs, p.value))
          val (emitNow, keepLefts) = leftsSorted.partition(_.tsMs <= wm)
          val out = emitNow.map { l =>
            val prior = rightsSorted.takeWhile(_.tsMs <= l.tsMs).lastOption
            val (ts, v, has) = prior match {
              case Some(p) => (p.tsMs, p.value, true)
              case None => (st0.latestTs, st0.latestVal, st0.hasLatest)
            }
            AsOfEnriched(key, l.tsMs, l.value,
              if (has) Some(ts) else None, if (has) Some(v) else None)
          }
          // compact: rights at-or-below the watermark collapse to the
          // single latest (still the prior for every future left)
          val (settled, keepRights) = rightsSorted.partition(_.tsMs <= wm)
          val (nLatestTs, nLatestVal, nHas) = settled.lastOption match {
            case Some(p) => (p.tsMs, p.value, true)
            case None => (st0.latestTs, st0.latestVal, st0.hasLatest)
          }
          if (keepLefts.isEmpty && keepRights.isEmpty && !streaming) {
            if (state.exists) state.remove()
          } else {
            state.update(AsOfExactState(keepLefts, keepRights, nLatestTs, nLatestVal, nHas))
            if (streaming) {
              // wake when the watermark passes the earliest pending
              // left; with none pending, park one delay out so a
              // right-only key eventually re-compacts and (when it
              // stays silent) ages out of the store
              val next = keepLefts.headOption.map(_.tsMs)
                .getOrElse(wm + 24L * 3600 * 1000)
              state.setTimeoutTimestamp(math.max(next, wm + 1))
            }
          }
          out.iterator
      }
  }

  /** One debounce-stream event (public for the encoder). */
  final case class DebEvent(key: Long, tsMs: Long, eventId: Long)
  /** [[DebEvent]] + the event-time column the watermark rides. */
  final case class DebEventT(key: Long, tsMs: Long, eventId: Long,
                             eventTime: Timestamp)
  /** One buffered pending event (public for the state encoder). */
  final case class DebPend(tsMs: Long, eventId: Long)
  /** [[debounceStream]] per-key state: events awaiting the watermark
    * plus the raw-predecessor timestamp of the already-emitted prefix.
    * Bounded by one watermark delay of rows per key. */
  final case class DebounceState(pending: List[DebPend], lastTs: Long,
                                 hasLast: Boolean)

  /** STREAMING twin of [[debounce]] — the same raw-predecessor
    * semantics (keep an event iff its gap to the immediately preceding
    * event of its key exceeds `windowMs`) made exact under cross-batch
    * out-of-order arrival by the [[asOfEnrichStreamExact]] recipe:
    * events buffer per key until the WATERMARK passes their event
    * time, then process in `(ts, eventId)` order against the state's
    * raw-predecessor timestamp. Latency = `watermarkDelay`; state = one
    * delay of rows per key; rows later than the watermark are dropped
    * by the standard contract. On a BATCH Dataset the watermark is +∞:
    * one pass drains everything and equals [[debounce]] by
    * construction (spec-pinned). */
  def debounceStream(events: Dataset[DebEvent], windowMs: Long,
                     watermarkDelay: String = "10 minutes"): Dataset[DebEvent] = {
    implicit val evEnc = Encoders.product[DebEventT]
    implicit val outEnc = Encoders.product[DebEvent]
    implicit val stEnc = Encoders.product[DebounceState]
    implicit val longEnc = Encoders.scalaLong
    val streaming = events.isStreaming
    val withTime = events.toDF()
      .withColumn("eventTime", expr("timestamp_millis(tsMs)"))
    val marked = if (streaming) withTime.withWatermark("eventTime", watermarkDelay)
      else withTime
    val timeout = if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    marked.as[DebEventT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[DebounceState, DebEvent](OutputMode.Append, timeout) {
        (key: Long, rows: Iterator[DebEventT], state: GroupState[DebounceState]) =>
          val st0 = state.getOption.getOrElse(
            DebounceState(Nil, Long.MinValue, hasLast = false))
          var pend = st0.pending
          rows.foreach(e => pend ::= DebPend(e.tsMs, e.eventId))
          val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
          val sorted = pend.sortBy(p => (p.tsMs, p.eventId))
          val (ready, keep) = sorted.partition(_.tsMs <= wm)
          var lastTs = st0.lastTs
          var hasLast = st0.hasLast
          val out = List.newBuilder[DebEvent]
          ready.foreach { p =>
            if (!hasLast || p.tsMs - lastTs > windowMs)
              out += DebEvent(key, p.tsMs, p.eventId)
            lastTs = p.tsMs; hasLast = true // raw predecessor: every event counts
          }
          // state is REMOVABLE once nothing is buffered and the
          // watermark has passed lastTs + windowMs: any future
          // non-late event has ts > wm >= lastTs + windowMs, so its
          // gap exceeds the window whatever lastTs was (r11 review —
          // without this, one state row per key ever seen lived
          // forever and the store grew unboundedly)
          val removable = keep.isEmpty &&
            (!streaming || (hasLast && wm - lastTs >= windowMs))
          if (removable) {
            if (state.exists) state.remove()
          } else {
            state.update(DebounceState(keep, lastTs, hasLast))
            if (streaming) {
              // wake at the earliest buffered event, or at the moment
              // this key's state becomes removable
              val next = keep.headOption.map(_.tsMs)
                .getOrElse(lastTs + windowMs)
              state.setTimeoutTimestamp(math.max(next, wm + 1))
            }
          }
          out.result().iterator
      }
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
