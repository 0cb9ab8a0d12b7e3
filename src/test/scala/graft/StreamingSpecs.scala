package graft

import graft.operators.FieldMapping
import graft.pipeline.PipelineRunner.PipelineSpec
import graft.streaming._
import graft.streaming.EventStreams.EventRow
import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.concurrent.duration._

class AggMaintainSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.AggMaintain

  test("snapshot chain: merges accumulate, newest-batch replay is idempotent, crash tmp is cleared, pruning keeps the merge input") {
    val dir = tmpDir("aggmaintain").resolve("store").toString
    def batch(rows: (String, Double)*): org.apache.spark.sql.DataFrame =
      rows.toDF("k", "v")
    // exactly-representable doubles so sums are order-proof in the spec
    AggMaintain.processBatch(batch(("a", 1.0), ("a", 2.0), ("b", 4.0)), 0L, "k", "v", dir)
    AggMaintain.processBatch(batch(("a", 8.0), ("c", 16.0)), 1L, "k", "v", dir)
    AggMaintain.processBatch(batch(("b", 32.0)), 2L, "k", "v", dir)
    def state(): Map[String, (Long, Double)] =
      AggMaintain.current(spark, dir).get.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = Map("a" -> ((3L, 11.0)), "b" -> ((2L, 36.0)), "c" -> ((1L, 16.0)))
    assert(state() === expected)

    // crash window: a half-staged tmp for the next batch is cleared on retry
    val crashed = new java.io.File(dir, ".tmp-v3")
    crashed.mkdirs()
    new java.io.File(crashed, "part-garbage.parquet").createNewFile()

    // newest-batch replay: batch 2 re-fires (its merge input v=1 must
    // still exist after pruning) and re-installs the identical snapshot
    AggMaintain.processBatch(batch(("b", 32.0)), 2L, "k", "v", dir)
    assert(state() === expected)

    // batch 3 after the crash debris: retry path stages cleanly
    AggMaintain.processBatch(batch(("c", 64.0)), 3L, "k", "v", dir)
    assert(state() === Map("a" -> ((3L, 11.0)), "b" -> ((2L, 36.0)), "c" -> ((2L, 80.0))))
    assert(!crashed.exists(), "crash debris not cleared")

    // empty store reads as None
    assert(AggMaintain.current(spark, tmpDir("aggmaintain_empty").toString).isEmpty)
  }

  test("chain-regression guard: a fresh-checkpoint restart against an existing store fails fast") {
    val dir = tmpDir("aggmaintain_regress").resolve("store").toString
    def batch(rows: (String, Double)*): org.apache.spark.sql.DataFrame =
      rows.toDF("k", "v")
    AggMaintain.processBatch(batch(("a", 1.0)), 4L, "k", "v", dir)
    AggMaintain.processBatch(batch(("a", 2.0)), 5L, "k", "v", dir)
    // restarted stream with a fresh checkpoint: batch ids reset to 0 —
    // merging would fork the chain (v=0 from only the new batch) while
    // current() still serves v=5, then silently overtake on a wrong base
    val e = intercept[IllegalArgumentException] {
      AggMaintain.processBatch(batch(("a", 4.0)), 0L, "k", "v", dir)
    }
    assert(e.getMessage.contains("chain regression"))
    // the store is untouched: v=5 still current, no v=0 installed
    assert(AggMaintain.current(spark, dir).get.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      === Map("a" -> ((2L, 3.0))))
    assert(!new java.io.File(dir, "v=0").exists())
    // an EQUAL batch id is the legitimate replay window, not a regression
    AggMaintain.processBatch(batch(("a", 2.0)), 5L, "k", "v", dir)
    assert(AggMaintain.current(spark, dir).get.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      === Map("a" -> ((2L, 3.0))))
  }

  test("AggMaintain end-to-end via MemoryStream matches a batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("aggmaintain_e2e").toString
    val in = MemoryStream[(String, Double)]
    val q = AggMaintain.start(in.toDF().toDF("k", "v"), "k", "v",
      s"$dir/store", s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(("x", 1.0), ("y", 2.0)); q.processAllAvailable()
      in.addData(("x", 4.0)); q.processAllAvailable()
      in.addData(("z", 8.0), ("x", 16.0)); q.processAllAvailable()
      val got = AggMaintain.current(spark, s"$dir/store").get.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got === Map("x" -> ((3L, 21.0)), "y" -> ((1L, 2.0)), "z" -> ((1L, 8.0))))
    } finally q.stop()
  }
}

class AsofEnrichStreamSpec extends SparkSpec {
  import graft.sources.ManifestTable
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("within-batch event time; late dim versions reach later batches only; replay no-ops") {
    val base = tmpDir("asofstream").toString
    val dimDir = s"$base/dim"
    val outDir = s"$base/out"
    def enrich(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      AsofEnrichStream.processBatch(batch, id, dimDir,
        leftKeys = Seq("user_id"), rightKeys = Seq("c_user"),
        leftTime = "ts", rightTime = "cts", outDir = outDir, track = Seq("ts"))
    // dimension v1: one version at t=10
    ManifestTable.commit(Seq((1L, ts(10), 100L)).toDF("c_user", "cts", "click_id"),
      dimDir, Seq("cts"))
    // batch 0: t=20 matches v1's t=10 row; t=5 predates every version -> null
    enrich(Seq((1L, ts(20), 1000L), (1L, ts(5), 1001L))
      .toDF("user_id", "ts", "purchase_id"), 0L)
    // a LATE dimension version lands (t=15, click 200)...
    ManifestTable.commit(Seq((1L, ts(15), 200L)).toDF("c_user", "cts", "click_id"),
      dimDir, Seq("cts"))
    // ...batch 1 at the same event time now sees it; batch 2 at t=12 must
    // NOT (event time < the new version's time — as-of, not latest)
    enrich(Seq((1L, ts(20), 1002L)).toDF("user_id", "ts", "purchase_id"), 1L)
    enrich(Seq((1L, ts(12), 1003L)).toDF("user_id", "ts", "purchase_id"), 2L)
    val out = ManifestTable.snapshot(spark, outDir)
      .select($"purchase_id", $"click_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1000L).contains(100L), "emitted rows keep their enrichment — no rewrite")
    assert(out(1001L).isEmpty, "facts before every dimension version stay null-enriched")
    assert(out(1002L).contains(200L), "later batches see the late dimension version")
    assert(out(1003L).contains(100L), "a future-dated version never enriches an older fact")
    // replayed batch short-circuits on the txn marker: no duplicate rows
    val head = ManifestTable.latestVersion(outDir)
    enrich(Seq((1L, ts(20), 1002L)).toDF("user_id", "ts", "purchase_id"), 1L)
    assert(ManifestTable.latestVersion(outDir) == head)
    assert(ManifestTable.snapshot(spark, outDir).count() == 4)
  }
}

class ChangeFeedStreamSpec extends SparkSpec {
  import graft.sources.ManifestTable
  import spark.implicits._

  test("cursor drains commit ranges, replays at-least-once, and crosses maintenance windows") {
    val base = tmpDir("cdfstream").toString
    val dir = s"$base/table"
    val state = s"$base/cursor"
    ManifestTable.commit((1 to 10).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), dir, Seq("k"))
    ChangeFeedStream.init(state, ManifestTable.latestVersion(dir).get)
    // re-running the deployment script must not rewind a live cursor
    ChangeFeedStream.init(state, 0L)
    assert(ChangeFeedStream.cursor(state).contains(1L))
    // idle poll: no sink call, no advance
    var calls = Vector.empty[(Set[(Long, String)], Long, Long)]
    def sink(df: org.apache.spark.sql.DataFrame, from: Long, to: Long): Unit =
      calls :+= ((df.select($"k", $"_change").as[(Long, String)].collect().toSet, from, to))
    assert(ChangeFeedStream.poll(spark, dir, state, sink).isEmpty && calls.isEmpty)
    // two commits drain as ONE range
    ManifestTable.merge(Seq((3L, 333.0), (11L, 11.0)).toDF("k", "v"), dir, Seq("k"))
    ManifestTable.deleteByKey(Seq(5L).toDF("k"), dir, Seq("k"))
    assert(ChangeFeedStream.poll(spark, dir, state, sink).contains((1L, 3L)))
    assert(calls.last._1 == Set((3L, "insert"), (3L, "delete"), (11L, "insert"), (5L, "delete")),
      s"got ${calls.last._1}")
    // crash between sink and advance == re-delivery of the same range
    calls = Vector.empty
    ManifestTable.commit(Seq((12L, 12.0)).toDF("k", "v"), dir, Seq("k"))
    var boom = true
    intercept[RuntimeException](ChangeFeedStream.poll(spark, dir, state,
      (df, f, t) => { sink(df, f, t); if (boom) throw new RuntimeException("sink crash") }))
    assert(ChangeFeedStream.cursor(state).contains(3L), "cursor must NOT advance past a failed sink")
    boom = false
    assert(ChangeFeedStream.poll(spark, dir, state,
      (df, f, t) => { sink(df, f, t); if (boom) throw new RuntimeException("sink crash") })
      .contains((3L, 4L)))
    assert(calls.map(c => (c._2, c._3)) == Vector((3L, 4L), (3L, 4L)),
      "failed range re-delivers identically (at-least-once)")
    // a materialize boundary does not wedge the cursor (netChanges fallback)
    ManifestTable.materializeDeletes(spark, dir)
    ManifestTable.commit(Seq((13L, 13.0)).toDF("k", "v"), dir, Seq("k"))
    calls = Vector.empty
    assert(ChangeFeedStream.poll(spark, dir, state, sink).isDefined)
    assert(calls.last._1 == Set((13L, "insert")),
      s"maintenance-only commits contribute no rows; got ${calls.last._1}")
    assert(ChangeFeedStream.poll(spark, dir, state, sink).isEmpty, "drained")
    // marker retirement: a long poll history keeps at most two cursor
    // files on disk, and the surviving max is still the cursor
    val markers = new java.io.File(state).list().count(_.startsWith("cur-"))
    assert(markers <= 2, s"superseded cursor markers must retire, found $markers")
    assert(ChangeFeedStream.cursor(state).contains(ManifestTable.latestVersion(dir).get))
  }

  test("retention pins protect a lagging cursor; an expired base re-baselines, never wedges") {
    val base = tmpDir("cdfpin").toString
    val dir = s"$base/table"
    val state = s"$base/cursor"
    ManifestTable.commit((1 to 6).map(i => (i.toLong, i * 1.0)).toDF("k", "v"), dir, Seq("k"))
    // pin-registering init: the consumer's base survives aggressive expiry
    ChangeFeedStream.init(dir, state, ManifestTable.latestVersion(dir).get)
    assert(ManifestTable.cursorPins(dir).values.toSeq == Seq(1L))
    (1 to 4).foreach(i =>
      ManifestTable.commit(Seq((100L + i, i * 1.0)).toDF("k", "v"), dir, Seq("k")))
    ManifestTable.expireSnapshots(dir, keepLast = 1)
    assert(ManifestTable.versions(dir).sorted == Seq(1L, 2L, 3L, 4L, 5L),
      "every version >= the pin must survive keepLast=1 expiry")
    var calls = Vector.empty[(Set[(Long, String)], Long, Long)]
    def sink(df: org.apache.spark.sql.DataFrame, from: Long, to: Long): Unit =
      calls :+= ((df.select($"k", $"_change").as[(Long, String)].collect().toSet, from, to))
    // lagging drain still runs the BOUNDED feed (base retained)
    assert(ChangeFeedStream.poll(spark, dir, state, sink).contains((1L, 5L)))
    assert(calls.last._2 == 1L && calls.last._1 ==
      (1 to 4).map(i => (100L + i, "insert")).toSet)
    // pin advanced with the cursor; older versions now expirable
    assert(ManifestTable.cursorPins(dir).values.toSeq == Seq(5L))
    // simulate a pre-pin legacy consumer: drop the pin, expire the base
    ManifestTable.commit(Seq((200L, 2.0)).toDF("k", "v"), dir, Seq("k"))
    ManifestTable.dropCursorPin(dir, ChangeFeedStream.pinName(state))
    ManifestTable.expireSnapshots(dir, keepLast = 1)
    assert(!ManifestTable.versions(dir).contains(5L), "base version expired")
    calls = Vector.empty
    // poll RE-BASELINES: full head snapshot as inserts, flagged by sentinel
    assert(ChangeFeedStream.poll(spark, dir, state, sink)
      .contains((ChangeFeedStream.Rebaseline, 6L)))
    val (rows, from, to) = calls.last
    assert(from == ChangeFeedStream.Rebaseline && to == 6L)
    assert(rows == ManifestTable.snapshot(spark, dir).select($"k").as[Long]
      .collect().toSet.map((k: Long) => (k, "insert")), s"got $rows")
    // cursor advanced and re-pinned: the NEXT poll is a normal bounded delta
    assert(ManifestTable.cursorPins(dir).values.toSeq == Seq(6L))
    ManifestTable.commit(Seq((300L, 3.0)).toDF("k", "v"), dir, Seq("k"))
    calls = Vector.empty
    assert(ChangeFeedStream.poll(spark, dir, state, sink).contains((6L, 7L)))
    assert(calls.last._1 == Set((300L, "insert")))
  }
}

class StreamingSpecs extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("hourly windowed counts: watermark finalizes windows in append mode and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.hourlyWindowedCounts(in.toDF, "2 hours")
      .writeStream.format("memory").queryName("hourly_t").outputMode("append").start()
    try {
      in.addData(
        EventRow(1, ts("2020-01-01 10:05:00"), 1, "click", 1.5),
        EventRow(2, ts("2020-01-01 10:20:00"), 2, "click", 2.5),
        EventRow(3, ts("2020-01-01 11:10:00"), 1, "view", 1.0))
      q.processAllAvailable()
      // watermark now 09:10 -> nothing finalized
      assert(spark.table("hourly_t").isEmpty)
      // push watermark past 12:00 (14:30 - 2h = 12:30) so both the 10:00
      // and 11:00 windows finalize, then offer a LATE row for the 10:00
      // window, which must be dropped
      in.addData(EventRow(4, ts("2020-01-01 14:30:00"), 3, "click", 9.0))
      q.processAllAvailable()
      in.addData(EventRow(5, ts("2020-01-01 09:59:00"), 9, "click", 99.0)) // late beyond watermark
      in.addData(EventRow(6, ts("2020-01-01 14:40:00"), 3, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_t")
        .select("hour_start", "event_type", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows.contains((ts("2020-01-01 10:00:00"), "click", 2L, 4.0)))
      assert(rows.contains((ts("2020-01-01 11:00:00"), "view", 1L, 1.0)))
      // the late 09:59 click never lands anywhere
      assert(!rows.exists { case (_, _, _, s) => s == 99.0 })
    } finally q.stop()
  }

  test("streaming OHLC bars: open/close track event order across micro-batches; finalized bars equal the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.ohlcBars(in.toDF, "2 hours")
      .writeStream.format("memory").queryName("ohlc_t").outputMode("append").start()
    val rows = Seq(
      // out-of-order arrival WITHIN the window across two batches: the
      // open must still be the earliest (ts, event_id), not first-seen
      EventRow(2, ts("2020-01-01 10:20:00"), 1, "click", 7.0),
      EventRow(1, ts("2020-01-01 10:05:00"), 2, "click", 2.0),
      EventRow(3, ts("2020-01-01 10:50:00"), 1, "click", 4.0),
      EventRow(4, ts("2020-01-01 10:30:00"), 3, "view", 1.0))
    try {
      in.addData(rows.take(2): _*)
      q.processAllAvailable()
      in.addData(rows.drop(2): _*)
      in.addData(EventRow(9, ts("2020-01-01 14:30:00"), 9, "view", 0.5)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("ohlc_t")
        .select("hour_start", "event_type", "bar_open", "bar_close", "bar_high", "bar_low", "n_events", "volume")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7))).toSet
      assert(got.contains((ts("2020-01-01 10:00:00"), "click", 2.0, 4.0, 7.0, 2.0, 3L, 13.0)),
        s"open=earliest ts, close=latest, across batch boundaries: $got")
      assert(got.contains((ts("2020-01-01 10:00:00"), "view", 1.0, 1.0, 1.0, 1.0, 1L, 1.0)))
      // batch/stream parity: the same rows through the batch twin's
      // aggregation shape give identical finalized bars
      val batch = rows.toDF()
        .groupBy(window(col("ts"), "1 hour")("start").as("hour_start"), col("event_type"))
        .agg(min_by(col("value"), struct(col("ts"), col("event_id"))).as("bar_open"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("bar_close"),
          max(col("value")).as("bar_high"), min(col("value")).as("bar_low"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(30, 2))).cast("double").as("volume"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7))).toSet
      assert(batch.subsetOf(got), s"stream bars must equal batch bars: $batch vs $got")
    } finally q.stop()
  }

  test("session windows merge within gap and split across it") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.sessionWindows(in.toDF, "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("sessions_t").outputMode("append").start()
    try {
      in.addData(
        EventRow(1, ts("2020-01-01 10:00:00"), 1, "a", 0),
        EventRow(2, ts("2020-01-01 10:10:00"), 1, "a", 0), // same session
        EventRow(3, ts("2020-01-01 11:30:00"), 1, "a", 0)) // new session (gap 80m)
      q.processAllAvailable()
      in.addData(EventRow(4, ts("2020-01-01 14:00:00"), 2, "a", 0)) // advance watermark
      q.processAllAvailable()
      in.addData(EventRow(5, ts("2020-01-01 15:00:00"), 2, "a", 0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_t")
        .filter(col("user_id") === 1)
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(sessions === Set(
        (ts("2020-01-01 10:00:00"), ts("2020-01-01 10:40:00"), 2L),
        (ts("2020-01-01 11:30:00"), ts("2020-01-01 12:00:00"), 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState session paths: watermark-closed sessions emit once with q142's path semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.sessionPathsStream(in.toDS(), gapMinutes = 30, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("sesspaths_t").outputMode("append").start()
    try {
      // user 1: two sessions (80-minute gap); second arrives OUT OF
      // ORDER (event 5 before event 4 in event time)
      in.addData(
        EventRow(1, ts("2020-01-01 10:00:00"), 1, "a", 0),
        EventRow(2, ts("2020-01-01 10:10:00"), 1, "b", 0),
        EventRow(5, ts("2020-01-01 11:40:00"), 1, "d", 0),
        EventRow(4, ts("2020-01-01 11:30:00"), 1, "c", 0))
      q.processAllAvailable()
      // nothing can close yet: watermark is 10:40 (max 11:40 - 1h)
      assert(spark.table("sesspaths_t").isEmpty)
      // advance the watermark far enough to close both sessions
      in.addData(EventRow(9, ts("2020-01-01 16:00:00"), 2, "z", 0))
      q.processAllAvailable()
      in.addData(EventRow(10, ts("2020-01-01 17:00:00"), 2, "z", 0))
      q.processAllAvailable()
      val got = spark.table("sesspaths_t")
        .filter(col("user_id") === 1)
        .select("path", "n_events", "session_start_us", "session_end_us").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      def us(s: String) = ts(s).getTime * 1000L
      assert(got === Set(
        ("a>b", 2L, us("2020-01-01 10:00:00"), us("2020-01-01 10:10:00")),
        ("c>d", 2L, us("2020-01-01 11:30:00"), us("2020-01-01 11:40:00"))),
        s"out-of-order events must re-sort inside the session: $got")
      // exactly-once: each session appears a single time in the sink
      val n = spark.table("sesspaths_t").filter(col("user_id") === 1).count()
      assert(n == 2L, s"sessions must emit exactly once, got $n rows")
    } finally q.stop()
  }

  test("session paths: an event at EXACTLY end+gap merges (strict close boundary), and the size cap force-closes a never-pausing key") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.sessionPathsStream(in.toDS(), gapMinutes = 30,
      watermarkDelay = "1 hour", maxSessionEvents = 4)
      .writeStream.format("memory").queryName("sessbound_t").outputMode("append").start()
    try {
      // user 1: second event lands at exactly first+gap — same session
      // under the batch split rule (> gap splits), so the stream must
      // not have closed the first event's session before it arrived
      in.addData(EventRow(1, ts("2020-01-01 10:00:00"), 1, "a", 0))
      q.processAllAvailable()
      in.addData(EventRow(2, ts("2020-01-01 10:30:00"), 1, "b", 0))
      q.processAllAvailable()
      in.addData(EventRow(9, ts("2020-01-01 15:00:00"), 2, "z", 0)) // flush watermark
      q.processAllAvailable()
      in.addData(EventRow(10, ts("2020-01-01 16:00:00"), 2, "z", 0))
      q.processAllAvailable()
      val u1 = spark.table("sessbound_t").filter(col("user_id") === 1)
        .select("path", "n_events").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(u1 === Set(("a>b", 2L)), s"exact-gap event must merge, got $u1")
      // user 5: 5 events a minute apart (never pauses) with cap 4 —
      // the session force-closes WITHOUT its end+gap passing the
      // watermark (events sit above the current 15:00 watermark)
      in.addData((1 to 5).map(i =>
        EventRow(20 + i, ts(f"2020-01-01 16:0$i%d:00"), 5, "h", 0)): _*)
      q.processAllAvailable()
      val u5 = spark.table("sessbound_t").filter(col("user_id") === 5)
        .select("n_events").collect().map(_.getLong(0)).toSeq
      assert(u5 === Seq(5L), s"cap must force-close the oversize session, got $u5")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps a running per-user aggregate across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.runningUserState(in.toDS())
      .writeStream.format("memory").queryName("userstate_t").outputMode("update").start()
    try {
      in.addData(
        EventRow(1, ts("2020-01-01 10:00:00"), 7, "a", 1.0),
        EventRow(2, ts("2020-01-01 10:01:00"), 7, "a", 2.0))
      q.processAllAvailable()
      in.addData(EventRow(9, ts("2020-01-01 10:05:00"), 7, "a", 0.5))
      q.processAllAvailable()
      val rows = spark.table("userstate_t")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(rows.contains((7L, 2L, 3.0, 2L)))  // after batch 1
      assert(rows.contains((7L, 3L, 3.5, 9L)))  // after batch 2
    } finally q.stop()
  }

  test("verified-data stream applies LWW point updates to per-entity state tables across batches") {
    import spark.implicits._
    val dir = tmpDir("verified")
    val state = dir.resolve("state").toString
    Seq((1L, 10L, "orig", "x"), (1L, 11L, "orig", "y"))
      .toDF("company_id", "external_id", "verified_data", "other")
      .write.parquet(s"$state/verified_contact")

    val batch1 = Seq(("contact", 1L, 10L, 1L, "fix-1"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, batch1, state)
    val batch2 = Seq(("contact", 1L, 10L, 2L, "fix-2"), ("contact", 1L, 11L, 2L, "fix-3"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, batch2, state)
    // replay batch2 (at-least-once delivery) — must be a no-op
    VerifiedStream.applyBatch(spark, batch2, state)

    val got = VerifiedStream.readState(spark, s"$state/verified_contact")
      .orderBy("external_id").collect().map(_.toSeq).toSeq
    assert(got === Seq(Seq(1L, 10L, "fix-2", "x", 2L), Seq(1L, 11L, "fix-3", "y", 2L)))

    // cross-batch LWW: a STALE redelivery in a later batch (seq 1 < the
    // stored seq 2) must not regress the state
    val stale = Seq(("contact", 1L, 10L, 1L, "fix-1-redelivered"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, stale, state)
    val afterStale = VerifiedStream.readState(spark, s"$state/verified_contact")
      .filter(col("external_id") === 10L).collect()(0)
    assert(afterStale.getString(2) === "fix-2")
    assert(afterStale.getLong(4) === 2L)

    // first-seen entity bootstraps an empty table instead of failing the
    // stream (UPDATE semantics: corrections to missing rows update
    // nothing, as in the reference); unsafe entity names are skipped
    val batch3 = Seq(("invoice", 9L, 1L, 1L, "new-entity"), ("../evil", 9L, 1L, 1L, "nope"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, batch3, state)
    assert(VerifiedStream.readState(spark, s"$state/verified_invoice").isEmpty)
    import scala.jdk.CollectionConverters._
    val children = java.nio.file.Files.list(java.nio.file.Paths.get(state)).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(children === Set("verified_contact", "verified_invoice"))
  }

  test("verified-data updates survive key dtype drift: int-typed batch keys route to the bigint-keyed buckets") {
    import spark.implicits._
    val dir = tmpDir("verified_drift")
    val state = dir.resolve("state").toString
    // stored table keys are BIGINT; pick a key where hash(int) and
    // hash(long) route to DIFFERENT buckets, so un-cast routing would
    // read/write the wrong bucket and silently drop the update
    val nb = VerifiedStream.defaultBuckets
    def bucketOf(c: Column): Int =
      spark.range(1).select(pmod(hash(c, c), lit(nb))).first().getInt(0)
    val key = (1L to 500L)
      .find(k => bucketOf(lit(k)) != bucketOf(lit(k.toInt)))
      .getOrElse(fail("no int/long hash-divergent key under 500"))
    Seq((key, key, "orig"))
      .toDF("company_id", "external_id", "verified_data")
      .write.parquet(s"$state/verified_contact")

    // batch arrives with INT keys (producer type drift)
    val drifted = Seq(("contact", key.toInt, key.toInt, 1L, "fixed"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, drifted, state)

    val got = VerifiedStream.readState(spark, s"$state/verified_contact").collect()
    assert(got.length === 1)
    assert(got(0).getAs[String]("verified_data") === "fixed")
    assert(got(0).getAs[Long]("company_id") === key)
  }

  test("batch/stream parity: streaming hourly windows over the events table equal the q18 batch aggregation") {
    import spark.implicits._
    val dir = tmpDir("parity")
    val events = Tables(spark, "/root/testdata/sf0.001").events
    // stream the normalized events (Tables applies the nanos fix; the
    // stream source needs a plain µs-timestamp schema)
    val normPath = dir.resolve("events_norm").toString
    events.write.mode("overwrite").parquet(normPath)
    val stream = spark.readStream.schema(events.schema).parquet(normPath)
    val q = EventStreams.hourlyWindowedCounts(stream)
      .writeStream.format("memory").queryName("parity_t").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    val streaming = spark.table("parity_t")
      .select("hour_start", "event_type", "n", "sum_value").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = graft.queries.QueryCatalog.byName("q18_events_hourly")
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streaming === batch)
  }

  test("checkpoint recovery: a restarted stream resumes from the checkpoint and processes only new files") {
    import spark.implicits._
    val dir = tmpDir("ckptrec")
    val inbox = java.nio.file.Files.createDirectories(dir.resolve("inbox"))
    val ckpt = dir.resolve("ckpt").toString
    val out = dir.resolve("out").toString

    def writeMsg(name: String, v: Long): Unit =
      java.nio.file.Files.writeString(inbox.resolve(name), s"""{"v": $v}""")
    def runOnce(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
      val q = spark.readStream.schema(schema).json(inbox.toString)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }

    writeMsg("m1.json", 1L); writeMsg("m2.json", 2L)
    runOnce()
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // restart with the same checkpoint: only the new file lands, no
    // reprocessing of m1/m2 (exactly-once file-source semantics)
    writeMsg("m3.json", 3L)
    runOnce()
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("stream-static enrichment: each micro-batch left-joins the broadcast dim; unmatched keys keep null payloads") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Long)]
    val out = graft.streaming.EventStreams.enrichAgainstStatic(
      in.toDF().toDF("user_id", "event_id"), dim, "user_id")
    val q = out.writeStream.format("memory").queryName("enrich_static").outputMode("append").start()
    try {
      in.addData((1L, 100L), (3L, 101L)); q.processAllAvailable()
      in.addData((2L, 102L)); q.processAllAvailable()
      val rows = spark.table("enrich_static").collect()
        .map(r => (r.getLong(1), Option(r.getString(2)))).toSet
      assert(rows === Set((100L, Some("gold")), (101L, None), (102L, Some("silver"))))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with the same user's clicks in the prior hour") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pIn = MemoryStream[EventRow]
    val cIn = MemoryStream[EventRow]
    val q = EventStreams.purchaseClickJoin(pIn.toDF, cIn.toDF)
      .writeStream.format("memory").queryName("ssjoin_t").outputMode("append").start()
    try {
      cIn.addData(
        EventRow(1, ts("2020-01-01 09:30:00"), 7, "click", 0), // within the hour
        EventRow(2, ts("2020-01-01 08:30:00"), 7, "click", 0), // too old
        EventRow(3, ts("2020-01-01 09:45:00"), 8, "click", 0)) // other user
      pIn.addData(EventRow(10, ts("2020-01-01 10:00:00"), 7, "purchase", 1))
      q.processAllAvailable()
      // advance both watermarks so the joined row finalizes in append mode
      cIn.addData(EventRow(4, ts("2020-01-01 14:00:00"), 9, "click", 0))
      pIn.addData(EventRow(11, ts("2020-01-01 14:00:00"), 9, "purchase", 0))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_t")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((10L, 1L)))
      assert(!rows.contains((10L, 2L)) && !rows.contains((10L, 3L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.dedupEvents(in.toDF)
      .writeStream.format("memory").queryName("dedup_t").outputMode("append").start()
    try {
      in.addData(
        EventRow(1, ts("2020-01-01 10:00:00"), 1, "click", 1.0),
        EventRow(1, ts("2020-01-01 10:00:01"), 1, "click", 1.0), // dup id, redelivered
        EventRow(2, ts("2020-01-01 10:05:00"), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(EventRow(1, ts("2020-01-01 10:00:02"), 1, "click", 1.0)) // dup again, same batch window
      q.processAllAvailable()
      val ids = spark.table("dedup_t").select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 2L))
    } finally q.stop()
  }

  test("verified state survives a crash between the swap renames (recovery from .old)") {
    import spark.implicits._
    val dir = tmpDir("verifiedcrash")
    val state = dir.resolve("state").toString
    Seq((1L, 10L, "orig", 5L))
      .toDF("company_id", "external_id", "verified_data", "verified_seq")
      .write.parquet(s"$state/verified_contact")
    // simulate the crash window: target renamed to .old, new target never landed
    val target = java.nio.file.Paths.get(s"$state/verified_contact")
    java.nio.file.Files.move(target, java.nio.file.Paths.get(s"$state/verified_contact.old"))
    val batch = Seq(("contact", 1L, 10L, 7L, "post-crash"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, batch, state)
    val rows = spark.read.parquet(s"$state/verified_contact")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    // the pre-crash row was recovered from .old, then the batch applied
    assert(rows === Seq((10L, "post-crash", 7L)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$state/verified_contact.old")))
  }

  test("bucketed state: a 1-key batch rewrites only the touched bucket; migration pins _nbuckets") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("verifiedbuckets")
    val state = dir.resolve("state").toString
    val table = s"$state/verified_contact"
    // legacy FLAT table with keys spread over every bucket
    (1 to 200).map(i => (1L, i.toLong, s"v$i"))
      .toDF("company_id", "external_id", "verified_data")
      .write.parquet(table)

    // first touch migrates: bucket=N dirs + _nbuckets marker, no loose parquet
    val b1 = Seq(("contact", 1L, 5L, 1L, "m1"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, b1, state)
    val children = java.nio.file.Files.list(java.nio.file.Paths.get(table)).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(children.contains("_nbuckets"))
    assert(children.exists(_.startsWith("bucket=")))
    assert(!children.exists(_.endsWith(".parquet")))

    def listing(): Map[String, Set[String]] =
      java.nio.file.Files.list(java.nio.file.Paths.get(table)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket="))
        .map(d => d.getFileName.toString ->
          java.nio.file.Files.list(d).iterator().asScala.map(_.getFileName.toString).toSet)
        .toMap

    // pick a second key routed to a DIFFERENT bucket than key 5
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    def bucketOf(ext: Long): Int = spark.range(1)
      .select(pmod(hash(lit(1L), lit(ext)), lit(VerifiedStream.defaultBuckets)).cast("int"))
      .head().getInt(0)
    val key2 = (6L to 60L).find(k => bucketOf(k) != bucketOf(5L)).get

    val before = listing()
    val b2 = Seq(("contact", 1L, key2, 2L, "m2"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, b2, state)
    val after = listing()
    val changed = (before.keySet ++ after.keySet).filter(k => before.get(k) != after.get(k))
    // the point update rewrote exactly its key's bucket
    assert(changed === Set(s"bucket=${bucketOf(key2)}"))
    // and applied correctly, with every other row intact
    val got = VerifiedStream.readState(spark, table)
    assert(got.filter(col("external_id") === key2).head().getString(2) === "m2")
    assert(got.filter(col("external_id") === 5L).head().getString(2) === "m1")
    assert(got.count() === 200)
  }

  test("bucketed state: crash between the per-bucket swap renames recovers from .bN.old") {
    import spark.implicits._
    val dir = tmpDir("verifiedbucketcrash")
    val state = dir.resolve("state").toString
    val table = s"$state/verified_contact"
    val b1 = Seq(("contact", 1L, 10L, 5L, "orig"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    // bootstrap is UPDATE-only (inserts nothing), so seed via a flat
    // table then migrate it with a first apply
    Seq((1L, 10L, "orig", 5L))
      .toDF("company_id", "external_id", "verified_data", "verified_seq")
      .write.parquet(table)
    VerifiedStream.applyBatch(spark, b1, state)
    // simulate the crash window: the (single-key) table's one live
    // bucket renamed to hidden .old, new bucket never landed
    import scala.jdk.CollectionConverters._
    val bucketDir = java.nio.file.Files.list(java.nio.file.Paths.get(table)).iterator().asScala
      .find(_.getFileName.toString.startsWith("bucket=")).get
    val bucketId = bucketDir.getFileName.toString.stripPrefix("bucket=")
    java.nio.file.Files.move(bucketDir, bucketDir.resolveSibling(s".b$bucketId.old"))
    // replayed batch must first restore the bucket, then apply
    val b2 = Seq(("contact", 1L, 10L, 7L, "post-crash"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, b2, state)
    val row = VerifiedStream.readState(spark, table).collect()(0)
    assert((row.getLong(1), row.getString(2), row.getLong(3)) === ((10L, "post-crash", 7L)))
    assert(!java.nio.file.Files.exists(bucketDir.resolveSibling(s".b$bucketId.old")))
  }

  test("rebucket: 4 -> 16 re-pins the marker, point updates still route, crash mid-swap recovers") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val dir = tmpDir("rebucket")
    val state = dir.resolve("state").toString
    val table = s"$state/verified_contact"
    // seed a flat table, migrate it at 4 buckets via a first apply
    (1 to 100).map(i => (1L, i.toLong, s"v$i", 1L))
      .toDF("company_id", "external_id", "verified_data", "verified_seq")
      .write.parquet(table)
    val b1 = Seq(("contact", 1L, 5L, 2L, "m1"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, b1, state, nBuckets = 4)
    def marker(): String =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$table/_nbuckets")), "UTF-8").trim
    assert(marker() === "4")

    VerifiedStream.rebucket(spark, table, 16)
    assert(marker() === "16")
    // every row landed in the bucket dir 16-way routing says it should
    val misrouted = spark.read.parquet(table)
      .filter(col("bucket") =!= pmod(hash(col("company_id"), col("external_id")), lit(16)).cast("int"))
      .count()
    assert(misrouted === 0L)
    assert(VerifiedStream.readState(spark, table).count() === 100)
    // idempotent no-op at the same count
    VerifiedStream.rebucket(spark, table, 16)
    assert(marker() === "16")

    // a point update after rebucket rewrites exactly its 16-way bucket
    def listing(): Map[String, Set[String]] =
      java.nio.file.Files.list(java.nio.file.Paths.get(table)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket="))
        .map(d => d.getFileName.toString ->
          java.nio.file.Files.list(d).iterator().asScala.map(_.getFileName.toString).toSet)
        .toMap
    def bucketOf(ext: Long): Int = spark.range(1)
      .select(pmod(hash(lit(1L), lit(ext)), lit(16)).cast("int")).head().getInt(0)
    val before = listing()
    val b2 = Seq(("contact", 1L, 7L, 3L, "m2"))
      .toDF("entity", "company_id", "external_id", "seq", "verified_data")
    VerifiedStream.applyBatch(spark, b2, state, nBuckets = 4) // session default ignored: marker routes
    val after = listing()
    val changed = (before.keySet ++ after.keySet).filter(k => before.get(k) != after.get(k))
    assert(changed === Set(s"bucket=${bucketOf(7L)}"))
    assert(VerifiedStream.readState(spark, table)
      .filter(col("external_id") === 7L).head().getString(2) === "m2")

    // crash window: root renamed to .old, staging left behind — a
    // re-run (or the next batch's recoverRoot) restores and completes
    val root = java.nio.file.Paths.get(table)
    java.nio.file.Files.move(root, java.nio.file.Paths.get(s"$table.old"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$table.tmp"))
    VerifiedStream.rebucket(spark, table, 32)
    assert(marker() === "32")
    assert(VerifiedStream.readState(spark, table).count() === 100)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$table.old")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$table.tmp")))
  }

  test("sensor loop: message drop fans out one pipeline run per file (end-to-end reference topology)") {
    val dir = tmpDir("sensor")
    val inbox = dir.resolve("inbox")
    val sink = dir.resolve("sink").toString
    java.nio.file.Files.createDirectories(inbox)
    val zip = dir.resolve("drop1.zip")
    Fixtures.writeZip(zip, Seq(
      "metadata.json" -> """{"workflow_system_name": "crm", "company_id": 1}""",
      "contact.json" -> """{"cid": "c9", "name": "zoe"}""",
    ))
    java.nio.file.Files.writeString(inbox.resolve("msg1.json"),
      s"""{"s3_bucket": "local", "s3_file_path": "${zip.toString}"}""")

    val spec = (runId: String, path: String) => PipelineSpec(
      runId = runId,
      mappings = Map("contact" -> Seq(
        FieldMapping("cid", "contact_id"),
        FieldMapping("upper(name)", "full_name"))),
      sinkDir = sink,
    )
    val q = SensorLoop.start(spark, inbox.toString, dir.resolve("ckpt").toString, spec,
      trigger = Trigger.AvailableNow())
    try q.awaitTermination(120000) finally q.stop()

    val contacts = spark.read.parquet(s"$sink/contact").collect()
    assert(contacts.map(_.toSeq).toSeq === Seq(Seq("c9", "ZOE")))
  }

  test("sensor loop: two files in one batch run their pipelines concurrently (bounded fan-out)") {
    val dir = tmpDir("sensorpar")
    val inbox = dir.resolve("inbox")
    val sink = dir.resolve("sink").toString
    java.nio.file.Files.createDirectories(inbox)
    Seq(("drop1", "c1", "ann"), ("drop2", "c2", "bob")).foreach { case (name, cid, who) =>
      val zip = dir.resolve(s"$name.zip")
      Fixtures.writeZip(zip, Seq(
        "metadata.json" -> """{"workflow_system_name": "crm", "company_id": 1}""",
        "contact.json" -> s"""{"cid": "$cid", "name": "$who"}""",
      ))
      java.nio.file.Files.writeString(inbox.resolve(s"$name.json"),
        s"""{"s3_bucket": "local", "s3_file_path": "${zip.toString}"}""")
    }

    // rendezvous: each per-file run must reach this barrier while the
    // other is also in flight. Sequential execution (the old foreach)
    // would park the first run here until the 30 s timeout, fail the
    // batch, and fail this test — passing PROVES overlap, not just
    // ordering luck.
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val spec = (runId: String, path: String) => {
      barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
      PipelineSpec(
        runId = runId,
        mappings = Map("contact" -> Seq(
          FieldMapping("cid", "contact_id"),
          FieldMapping("upper(name)", "full_name"))),
        sinkDir = s"$sink/$runId", // per-run sink: concurrent runs never share a dir
      )
    }
    val q = SensorLoop.start(spark, inbox.toString, dir.resolve("ckpt").toString, spec,
      trigger = Trigger.AvailableNow(), maxParallelFiles = 2)
    try q.awaitTermination(120000) finally q.stop()

    // deterministic run ids: batch 0, sorted file order → drop1=run_0_0
    val out = (0 to 1).flatMap { i =>
      spark.read.parquet(s"$sink/run_0_$i/contact").collect().map(_.toSeq)
    }.sortBy(_.head.toString)
    assert(out === Seq(Seq("c1", "ANN"), Seq("c2", "BOB")))
  }

  test("sensor loop: per-run retries re-run a failed file's pipeline in place (reference default_args knob)") {
    val dir = tmpDir("sensorretry")
    val inbox = dir.resolve("inbox")
    val sink = dir.resolve("sink").toString
    java.nio.file.Files.createDirectories(inbox)
    val zip = dir.resolve("drop1.zip")
    Fixtures.writeZip(zip, Seq(
      "metadata.json" -> """{"workflow_system_name": "crm", "company_id": 1}""",
      "contact.json" -> """{"cid": "c7", "name": "kim"}""",
    ))
    java.nio.file.Files.writeString(inbox.resolve("msg1.json"),
      s"""{"s3_bucket": "local", "s3_file_path": "${zip.toString}"}""")

    // first attempt of the run blows up before the pipeline starts; the
    // retry (same runId) must succeed and complete the batch
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val spec = (runId: String, path: String) => {
      if (attempts.getAndIncrement() == 0) sys.error("transient resolve failure")
      PipelineSpec(
        runId = runId,
        mappings = Map("contact" -> Seq(
          FieldMapping("cid", "contact_id"),
          FieldMapping("upper(name)", "full_name"))),
        sinkDir = sink,
      )
    }
    val q = SensorLoop.start(spark, inbox.toString, dir.resolve("ckpt").toString, spec,
      trigger = Trigger.AvailableNow(), retries = 1, retryDelay = 0.seconds)
    try q.awaitTermination(120000) finally q.stop()
    assert(attempts.get() === 2, "expected exactly one failed attempt plus one retry")
    assert(spark.read.parquet(s"$sink/contact").collect().map(_.toSeq).toSeq ===
      Seq(Seq("c7", "KIM")))
  }
}
