package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming event operators (§2.8 extension): watermarked windowed
  * counts and event-time sessionization, driven with MemoryStream. */
class EventStreamsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  private implicit def sq: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("windowedEventCounts on a batch frame equals a plain windowed aggregate") {
    val ev = Seq(
      (ts(1), "click"), (ts(2), "click"), (ts(5), "view"),
      (ts(61), "click"), (ts(62), "view"))
      .toDF("ts", "event_type")
    val out = EventStreams.windowedEventCounts(ev, "ts", "1 hour")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, "click", 2L), (0L, "view", 1L),
      (60L, "click", 1L), (60L, "view", 1L)))
  }

  test("windowedEventCounts streaming: watermark drops late rows, windows finalize") {
    val stream = MemoryStream[(Timestamp, String)]
    val q = EventStreams.windowedEventCounts(
        stream.toDF().toDF("ts", "event_type"), "ts", "1 hour", "5 minutes")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()
    try {
      stream.addData((ts(1), "click"), (ts(3), "click"))
      q.processAllAvailable()
      // advance event time far past window end + watermark → finalize hour 0
      stream.addData((ts(130), "view"))
      q.processAllAvailable()
      // a LATE row for hour 0 (watermark is now ~125min) must be dropped
      stream.addData((ts(2), "late-click"))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000,
          r.getString(1), r.getLong(2)))
      assert(rows.toSeq.contains((0L, "click", 2L)))
      assert(!rows.exists(_._2 == "late-click"))
    } finally q.stop()
  }

  test("out-of-order straggler older than the running session becomes its own session") {
    val stream = MemoryStream[(Long, Timestamp)]
    // 60-minute allowed lateness so the straggler survives the watermark
    val q = EventStreams.sessionize(stream.toDS(), gapMs = 10 * 60000L, "60 minutes")
      .writeStream.format("memory").queryName("straggler_sessions")
      .outputMode("append").start()
    try {
      stream.addData((7L, ts(100)))    // session starts at min 100; watermark -> 40
      q.processAllAvailable()
      stream.addData((7L, ts(45)))     // in-lateness straggler, 55 min BEFORE start
      q.processAllAvailable()
      stream.addData((7L, ts(300)))    // forward gap closes [100,100]; watermark on
      q.processAllAvailable()
      stream.addData((7L, ts(500)))    // push watermark to close everything open
      q.processAllAvailable()
      val sessions = spark.table("straggler_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1) / 60000,
          r.getLong(2) / 60000, r.getLong(3))).toSet
      assert(sessions.contains((7L, 45L, 45L, 1L)),
        s"straggler session missing: $sessions") // NOT merged into [100,...]
      assert(sessions.contains((7L, 100L, 100L, 1L)))
    } finally q.stop()
  }

  test("sessionizeBatch matches the streaming session definition") {
    // same fixture shape as the streaming tests: per-user gaps both
    // under and over gapMs, one interleaved second user
    val ev = Seq(
      (7L, 1L), (7L, 4L), (9L, 2L),   // user 7 session [1,4], user 9 [2,2]
      (7L, 60L), (7L, 65L), (7L, 68L), // user 7 session [60,68]
      (9L, 90L))                       // user 9 session [90,90]
      .map { case (u, m) => (u, m * 60000L) }
      .toDF("user_id", "ts_ms")
    val out = EventStreams.sessionizeBatch(ev, "user_id", "ts_ms", gapMs = 10 * 60000L)
      .orderBy("user_id", "start_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1) / 60000,
        r.getLong(2) / 60000, r.getLong(3)))
    assert(out.toSeq == Seq(
      (7L, 1L, 4L, 2L), (7L, 60L, 68L, 3L),
      (9L, 2L, 2L, 1L), (9L, 90L, 90L, 1L)))
  }

  test("sessionizeBatch: an event exactly gapMs after the previous stays in-session") {
    val ev = Seq((1L, 0L), (1L, 10 * 60000L), (1L, 20 * 60000L + 1))
      .toDF("user_id", "ts_ms")
    val out = EventStreams.sessionizeBatch(ev, "user_id", "ts_ms", gapMs = 10 * 60000L)
      .orderBy("start_ms").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // gap == gapMs merges (strict `>` splits); the +1 ms event splits
    assert(out.toSeq == Seq((0L, 10 * 60000L, 2L),
      (20 * 60000L + 1, 20 * 60000L + 1, 1L)))
  }

  test("asOfJoin: latest prior right row per key; equal-time matches; no-prior gives NULLs") {
    val trades = Seq(
      (1L, 100L, 10L, "t-a"), // user 10 at t=100
      (2L, 200L, 10L, "t-b"),
      (3L, 50L, 20L, "t-c"),  // before any quote for user 20
      (4L, 300L, 30L, "t-d")  // user 30 has no quotes at all
    ).toDF("trade_id", "t", "user", "tag")
    val quotes = Seq(
      (100L, 10L, 1.5), // equal time as trade 1 -> matches
      (150L, 10L, 2.5),
      (199L, 10L, 3.5),
      (60L, 20L, 9.0)
    ).toDF("qt", "user", "price")
    val got = graft.streaming.EventStreams.asOfJoin(
        trades, quotes, "user", "t", "qt", Seq("qt", "price"))
      .select($"trade_id", $"tag", $"qt", $"price")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == (("t-a", Some(100L), Some(1.5)))) // <= includes equal ts
    assert(got(2L) == (("t-b", Some(199L), Some(3.5)))) // latest of three priors
    assert(got(3L) == (("t-c", None, None)))            // quote exists only later
    assert(got(4L) == (("t-d", None, None)))            // key never quoted
    // carry-name collision is rejected loudly
    assertThrows[IllegalArgumentException](graft.streaming.EventStreams.asOfJoin(
      trades, quotes, "user", "t", "qt", Seq("tag")))
  }

  test("asOfJoin: duplicate right rows at one (key, time) pick deterministically (greatest carry)") {
    val trades = Seq((1L, 100L, 10L)).toDF("trade_id", "t", "user")
    // three quotes at the SAME instant — contract says pre-aggregate,
    // but a violation must not be silently nondeterministic: the
    // greatest carry struct wins on every run (ADVICE r5)
    val quotes = Seq(
      (100L, 10L, 2.5, "b"),
      (100L, 10L, 9.0, "c"),
      (100L, 10L, 1.5, "a")
    ).toDF("qt", "user", "price", "src")
    (1 to 5).foreach { _ =>
      val got = graft.streaming.EventStreams.asOfJoin(
          trades, quotes.repartition(7), "user", "t", "qt", Seq("price", "src"))
        .select($"price", $"src").collect()
      assert(got.map(r => (r.getDouble(0), r.getString(1))).toSeq == Seq((9.0, "c")))
    }
  }

  test("asOfEnrichStream: state carries the latest right payload across micro-batches") {
    import graft.streaming.EventStreams.{AsOfEvent, AsOfEnriched}
    val stream = MemoryStream[AsOfEvent]
    val q = graft.streaming.EventStreams.asOfEnrichStream(stream.toDS())
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    try {
      // batch 1: quote then trade (same batch, event-time order applies;
      // equal-ts quote visible), plus a trade with no prior quote
      stream.addData(
        AsOfEvent(1L, 10L, isLeft = false, value = 100L),
        AsOfEvent(1L, 10L, isLeft = true, value = 7L),
        AsOfEvent(2L, 5L, isLeft = true, value = 8L))
      q.processAllAvailable()
      // batch 2: trade enriched from STATE (quote arrived a batch ago);
      // a stale right row (older ts than state) must not regress state
      stream.addData(
        AsOfEvent(1L, 20L, isLeft = true, value = 9L),
        AsOfEvent(1L, 4L, isLeft = false, value = 50L),
        AsOfEvent(1L, 30L, isLeft = true, value = 11L))
      q.processAllAvailable()
      val rows = spark.table("asof_enrich").as[AsOfEnriched]
        .collect().map(e => (e.key, e.tsMs) -> (e.asofTs, e.asofValue)).toMap
      assert(rows((1L, 10L)) == ((Some(10L), Some(100L)))) // equal-ts match
      assert(rows((2L, 5L)) == ((None, None)))             // never quoted
      assert(rows((1L, 20L)) == ((Some(10L), Some(100L)))) // state from batch 1
      assert(rows((1L, 30L)) == ((Some(10L), Some(100L)))) // stale right ignored
    } finally q.stop()
  }

  test("asOfEnrichStreamExact: cross-batch out-of-order input equals batch asOfJoin") {
    import graft.streaming.EventStreams.{AsOfEvent, AsOfEnriched}
    val stream = MemoryStream[AsOfEvent]
    val q = graft.streaming.EventStreams.asOfEnrichStreamExact(
        stream.toDS(), watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("asof_exact")
      .outputMode("append").start()
    val fed = scala.collection.mutable.ArrayBuffer.empty[AsOfEvent]
    def feed(evs: AsOfEvent*): Unit = {
      fed ++= evs
      stream.addData(evs: _*)
      q.processAllAvailable()
    }
    try {
      // batch 1: a left at 100_000 arrives BEFORE the right that should
      // enrich it — the as-of-arrival mode would emit it with the stale
      // 80_000 payload; exact mode must hold it for the watermark
      feed(AsOfEvent(1L, 80000L, isLeft = false, value = 400L),
        AsOfEvent(1L, 100000L, isLeft = true, value = 7L))
      // batch 2 (wm = 95_000): the LATE right at 96_000 lands a batch
      // after the left it affects; a same-instant duplicate must lose
      // to the greater value (deterministic tiebreak, same as asOfJoin)
      feed(AsOfEvent(1L, 96000L, isLeft = false, value = 500L),
        AsOfEvent(1L, 96000L, isLeft = false, value = 100L),
        AsOfEvent(2L, 106000L, isLeft = true, value = 8L))
      // batches 3-5: unrelated keys push the watermark so pending lefts
      // finalize via event-time timeouts
      feed(AsOfEvent(3L, 107000L, isLeft = true, value = 9L))
      feed(AsOfEvent(3L, 115000L, isLeft = false, value = 1L))
      feed(AsOfEvent(4L, 125000L, isLeft = false, value = 2L))
      feed(AsOfEvent(4L, 135000L, isLeft = false, value = 3L))
      val got = spark.table("asof_exact").as[AsOfEnriched]
        .collect().map(e => (e.key, e.tsMs) -> (e.asofTs, e.asofValue)).toMap
      // the late-right case: exact mode saw 96_000 arrive after the left
      assert(got((1L, 100000L)) == ((Some(96000L), Some(500L))))
      // ground truth: batch asOfJoin over everything fed, restricted to
      // the lefts the stream finalized
      val lefts = fed.filter(_.isLeft).map(e => (e.key, e.tsMs, e.value))
        .toSeq.toDF("key", "t", "value")
      val rights = fed.filterNot(_.isLeft).map(e => (e.key, e.tsMs, e.value))
        .toSeq.toDF("key", "rt", "asof_value")
      val oracle = graft.streaming.EventStreams.asOfJoin(
          lefts, rights.withColumn("asof_ts", $"rt"), "key", "t", "rt",
          Seq("asof_ts", "asof_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
      got.keys.foreach { k => assert(got(k) == oracle(k), s"mismatch at $k") }
      assert(got.size >= 3) // 1@100k, 2@106k, 3@107k all finalized
    } finally q.stop()
  }

  test("asOfEnrichStreamExact on a static Dataset equals asOfJoin (single drain)") {
    import graft.streaming.EventStreams.{AsOfEvent, AsOfEnriched}
    val ds = Seq(
      AsOfEvent(1L, 10L, isLeft = false, value = 100L),
      AsOfEvent(1L, 15L, isLeft = true, value = 7L),
      AsOfEvent(1L, 2L, isLeft = true, value = 6L),
      AsOfEvent(2L, 5L, isLeft = true, value = 8L)).toDS()
    val got = graft.streaming.EventStreams.asOfEnrichStreamExact(ds)
      .collect().map(e => (e.key, e.tsMs) -> (e.asofTs, e.asofValue)).toMap
    assert(got((1L, 15L)) == ((Some(10L), Some(100L))))
    assert(got((1L, 2L)) == ((None, None)))
    assert(got((2L, 5L)) == ((None, None)))
  }

  test("asOfEnrichStream on a static Dataset: no-watermark path, every row processed") {
    import graft.streaming.EventStreams.{AsOfEvent, AsOfEnriched}
    val ds = Seq(
      AsOfEvent(1L, 10L, isLeft = false, value = 100L),
      AsOfEvent(1L, 15L, isLeft = true, value = 7L),
      AsOfEvent(1L, 2L, isLeft = true, value = 6L), // "late" — batch keeps it
      AsOfEvent(2L, 5L, isLeft = true, value = 8L)).toDS()
    val got = graft.streaming.EventStreams.asOfEnrichStream(ds)
      .collect().map(e => (e.key, e.tsMs) -> (e.asofTs, e.asofValue)).toMap
    assert(got((1L, 15L)) == ((Some(10L), Some(100L))))
    assert(got((1L, 2L)) == ((None, None))) // before the quote in event time
    assert(got((2L, 5L)) == ((None, None)))
  }

  test("rangeJoin: trailing-window pairs match a brute-force inequality join") {
    val rnd = new scala.util.Random(5)
    val lefts = (1L to 40L).map(i => (i, rnd.nextInt(500).toLong, (i % 4) + 1))
    val rights = (100L to 220L).map(i => (i, rnd.nextInt(500).toLong, (i % 4) + 1))
    val lDf = lefts.toDF("lid", "lt", "k")
    val rDf = rights.toDF("rid", "rt", "k")
    val w = 100L
    val got = graft.streaming.EventStreams.rangeJoin(
        lDf, rDf, "k", "lt", "rt", w, Seq("rid", "rt"))
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val brute = (for {
      (lid, lt, lk) <- lefts
      (rid, rt, rk) <- rights
      if lk == rk && rt > lt - w && rt <= lt
    } yield (lid, rid)).toSet
    assert(got == brute)
    assert(brute.nonEmpty) // the fixture actually exercises matches
    // exact boundary: rt == lt matches, rt == lt - w does not
    val edge = graft.streaming.EventStreams.rangeJoin(
      Seq((1L, 200L, 1L)).toDF("lid", "lt", "k"),
      Seq((10L, 200L, 1L), (11L, 100L, 1L), (12L, 101L, 1L)).toDF("rid", "rt", "k"),
      "k", "lt", "rt", w, Seq("rid"))
      .select($"rid").as[Long].collect().toSet
    assert(edge == Set(10L, 12L))
  }

  test("sessionize closes a session after the inactivity gap, state dropped") {
    val stream = MemoryStream[(Long, Timestamp)]
    val q = EventStreams.sessionize(stream.toDS(), gapMs = 10 * 60000L, "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 7: events at minute 1, 4; user 9: minute 2
      stream.addData((7L, ts(1)), (7L, ts(4)), (9L, ts(2)))
      q.processAllAvailable()
      assert(spark.table("sessions").isEmpty) // nothing closed yet
      // jump event time to minute 60 → watermark 59 > last+gap for both
      stream.addData((7L, ts(60)))
      q.processAllAvailable()
      stream.addData((7L, ts(120))) // push watermark past session 2's gap
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1) / 60000,
          r.getLong(2) / 60000, r.getLong(3))).toSet
      assert(sessions.contains((7L, 1L, 4L, 2L)))  // first session of user 7
      assert(sessions.contains((9L, 2L, 2L, 1L)))  // user 9's singleton
      assert(sessions.contains((7L, 60L, 60L, 1L))) // second session of user 7
    } finally q.stop()
  }

  test("debounce: window-edge, equal-ts, and burst-chain semantics") {
    // user 1 "click": 0 → kept; 60000 (gap == window, NOT > window) →
    // dropped; 120001 (gap 60001 from its raw predecessor 60000, which
    // was itself dropped) → kept: the raw-predecessor definition.
    // user 1 "view": independent key, kept.
    // user 2 "click": equal timestamps — tie order by event_id, first
    // survives, second is a 0-gap duplicate.
    val ev = Seq(
      (10L, 1L, "click", 0L),
      (11L, 1L, "click", 60000L),
      (12L, 1L, "click", 120001L),
      (13L, 1L, "view", 30L),
      (14L, 2L, "click", 500L),
      (15L, 2L, "click", 500L))
      .toDF("event_id", "user_id", "event_type", "ts_ms")
    val kept = EventStreams.debounce(ev, Seq("user_id", "event_type"),
        "ts_ms", windowMs = 60000L, tieCols = Seq("event_id"))
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(10L, 12L, 13L, 14L))
    // schema passes through untouched
    assert(EventStreams.debounce(ev, Seq("user_id"), "ts_ms", 1L)
      .columns.toSeq == ev.columns.toSeq)
    // a burst with every gap under the window collapses to its head
    // even when the burst spans longer than the window end-to-end
    val burst = (0L until 10L).map(i => (i, 1L, "c", i * 50000L))
      .toDF("event_id", "user_id", "event_type", "ts_ms")
    val burstKept = EventStreams.debounce(burst,
        Seq("user_id", "event_type"), "ts_ms", 60000L,
        tieCols = Seq("event_id"))
      .select("event_id").as[Long].collect().toSet
    assert(burstKept == Set(0L))
  }

  test("debounceStream: cross-batch out-of-order input equals batch debounce") {
    import EventStreams.DebEvent
    // base offset keeps every event-time strictly above the initial
    // watermark (a ts-0 row sits exactly ON watermark 0 and is dropped
    // as late before the group function ever sees it).
    // key 1: base (keep), +50000 (drop), +120000 (keep, gap 70000 from
    // raw predecessor +50000), +130000 (drop); key 2: singleton
    val base = 3600000L
    val all = Seq(
      DebEvent(1L, base, 10L), DebEvent(1L, base + 50000L, 11L),
      DebEvent(1L, base + 120000L, 12L), DebEvent(1L, base + 130000L, 13L),
      DebEvent(2L, base + 7L, 20L))
    val batchKept = EventStreams.debounce(
        all.toDF("user_id", "ts_ms", "event_id"),
        Seq("user_id"), "ts_ms", windowMs = 60000L, tieCols = Seq("event_id"))
      .select("event_id").as[Long].collect().toSet
    assert(batchKept == Set(10L, 12L, 20L))
    val stream = MemoryStream[DebEvent]
    val q = EventStreams.debounceStream(stream.toDS(), windowMs = 60000L,
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("deb")
      .outputMode("append").start()
    try {
      // out-of-order ACROSS batches, all within the 5-min watermark:
      // the 50000 row arrives a batch AFTER the 120000 row — an
      // as-of-arrival debounce would wrongly keep 120000's successor
      stream.addData(DebEvent(1L, base, 10L), DebEvent(1L, base + 120000L, 12L))
      q.processAllAvailable()
      stream.addData(DebEvent(1L, base + 50000L, 11L),
        DebEvent(1L, base + 130000L, 13L), DebEvent(2L, base + 7L, 20L))
      q.processAllAvailable()
      // advance the watermark far past every buffered event
      stream.addData(DebEvent(9L, 10L * 60 * 60 * 1000, 99L))
      q.processAllAvailable()
      val kept = spark.table("deb").select("eventId").as[Long].collect().toSet
      assert(kept == batchKept)
    } finally q.stop()
  }

  test("debounceStream on a static Dataset equals batch debounce (single drain)") {
    import EventStreams.DebEvent
    val all = (0L until 40L).map(i =>
      DebEvent(i % 3, (i * 37000L) % 400000L, i))
    val viaStream = EventStreams.debounceStream(all.toDS(), windowMs = 60000L)
      .collect().map(_.eventId).toSet
    val viaBatch = EventStreams.debounce(
        all.toDF("user_id", "ts_ms", "event_id"),
        Seq("user_id"), "ts_ms", 60000L, tieCols = Seq("event_id"))
      .select("event_id").as[Long].collect().toSet
    assert(viaStream == viaBatch)
  }
}
