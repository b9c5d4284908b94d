package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("file-source stream with AvailableNow: windowed counts match batch") {
    val dir = Files.createTempDirectory("events_stream")
    // two "monthly drops" of event files — the REFRESH analog
    Seq(
      """{"event_id":1,"ts":"2024-01-01T00:10:00.000Z","user_id":1,"event_type":"click","value":1.0,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T00:20:00.000Z","user_id":2,"event_type":"click","value":1.0,"props":"{}"}""",
      """{"event_id":3,"ts":"2024-01-01T01:05:00.000Z","user_id":1,"event_type":"view","value":1.0,"props":"{}"}"""
    ).zipWithIndex.foreach { case (line, i) =>
      Files.write(dir.resolve(s"drop$i.json"), line.getBytes("UTF-8"))
    }
    val counts = EventStream.hourlyCounts(EventStream.readEvents(spark, dir.toString))
    val q = counts.writeStream
      .format("memory")
      .queryName("hourly_counts_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("hourly_counts_test")
      .select(date_format(col("hour_start"), "HH").as("h"), col("event_type"), col("n_events"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("00", "click", 2L), ("01", "view", 1L)))
  }

  test("streaming dedup suppresses redelivered events across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStream.dedupEvents(events).writeStream
      .format("memory")
      .queryName("dedup_test")
      .outputMode("append")
      .start()
    def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)
    input.addData((1L, ts(0), 1L), (1L, ts(0), 1L), (2L, ts(1), 2L))
    q.processAllAvailable()
    // event 1 redelivered in a LATER micro-batch — state must remember it
    input.addData((1L, ts(2), 1L), (3L, ts(3), 3L))
    q.processAllAvailable()
    val got = spark.table("dedup_test").select("event_id")
      .as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("stream-stream interval join pairs clicks with in-horizon views only") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)
    val clickIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val viewIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = EventStream.clickViewJoin(
      clickIn.toDF().toDF("event_id", "ts", "user_id"),
      viewIn.toDF().toDF("event_id", "ts", "user_id"))
    val q = joined.writeStream.format("memory")
      .queryName("ssjoin_test").outputMode("append").start()
    // user 1: view at t=0 and t=8 within 10 min of click at t=9;
    // view at t=30 would pair with nothing; user 2's view never joins user 1
    viewIn.addData((10L, ts(0), 1L), (11L, ts(8), 1L), (12L, ts(5), 2L))
    clickIn.addData((1L, ts(9), 1L))
    q.processAllAvailable()
    // a later view arriving before a later click still joins (both buffered)
    viewIn.addData((13L, ts(30), 1L))
    clickIn.addData((2L, ts(31), 1L))
    q.processAllAvailable()
    val got = spark.table("ssjoin_test")
      .select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 13L)))
    q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionize(spark, input.toDS())
    val q = sessions.writeStream
      .format("memory")
      .queryName("sessions_test")
      .outputMode("append")
      .start()
    def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)
    // user 1: two events 5 min apart (one session), then a 40-min gap
    // opens a NEW session -> the first one is emitted as closed
    input.addData(
      EventStream.Event(1, ts(0), 1),
      EventStream.Event(2, ts(5), 1))
    q.processAllAvailable()
    input.addData(EventStream.Event(3, ts(45), 1))
    q.processAllAvailable()
    val closed = spark.table("sessions_test")
      .as[EventStream.Session].collect()
    assert(closed.length == 1)
    assert(closed.head.user_id == 1 && closed.head.n_events == 2)
    assert(closed.head.start_ms == ts(0).getTime && closed.head.end_ms == ts(5).getTime)
    q.stop()
  }

  test("transformWithState running counts accumulate ValueState across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventStream.Event]
      val q = EventStream.runningUserCounts(spark, input.toDS())
        .writeStream.format("memory").queryName("tws_counts_test")
        .outputMode("update")
        .start()
      def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)
      // batch 0: user 1 twice, user 2 once
      input.addData(
        EventStream.Event(1, ts(0), 1),
        EventStream.Event(2, ts(1), 1),
        EventStream.Event(3, ts(2), 2))
      q.processAllAvailable()
      // batch 1: user 1 again — the ValueState must carry the prior 2
      input.addData(EventStream.Event(4, ts(3), 1))
      q.processAllAvailable()
      val got = spark.table("tws_counts_test")
        .as[EventStream.UserCount].collect().toSet
      assert(got == Set(
        EventStream.UserCount(1, 2), EventStream.UserCount(2, 1),
        EventStream.UserCount(1, 3)))
      q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(provKey, p)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("transformWithState MapState merges per-type counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventStream.TypedEvent]
      val q = EventStream.topTypePerUser(spark, input.toDS())
        .writeStream.format("memory").queryName("tws_toptype_test")
        .outputMode("update")
        .start()
      def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)
      // batch 0: user 1 -> b,b,a : top is b(2)
      input.addData(
        EventStream.TypedEvent(1, ts(0), 1, "b"),
        EventStream.TypedEvent(2, ts(1), 1, "b"),
        EventStream.TypedEvent(3, ts(2), 1, "a"))
      q.processAllAvailable()
      // batch 1: two more a's — the MAP must carry b's 2 and a's 1, so
      // the argmax flips to a(3); a fresh-state batch would report a(2)
      input.addData(
        EventStream.TypedEvent(4, ts(3), 1, "a"),
        EventStream.TypedEvent(5, ts(4), 1, "a"))
      q.processAllAvailable()
      val got = spark.table("tws_toptype_test")
        .as[EventStream.UserTypeTop].collect().toSet
      assert(got == Set(
        EventStream.UserTypeTop(1, 3, 2, "b", 2),
        EventStream.UserTypeTop(1, 5, 2, "a", 3)))
      q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(provKey, p)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("transformWithState ListState keeps the order-free last-3 across batches") {
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[EventStream.TypedEvent]
      val q = EventStream.recentEventsPerUser(spark, input.toDS())
        .writeStream.format("memory").queryName("tws_recent_test")
        .outputMode("update")
        .start()
      def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)
      def ms(minute: Int) = 1704067200000L + minute * 60000L
      // batch 0: events at minutes 5, 1, 9 (unsorted arrival)
      input.addData(
        EventStream.TypedEvent(50, ts(5), 1, "a"),
        EventStream.TypedEvent(10, ts(1), 1, "a"),
        EventStream.TypedEvent(90, ts(9), 1, "a"))
      q.processAllAvailable()
      // batch 1: minute 7 — must displace minute 1 from the carried list
      input.addData(EventStream.TypedEvent(70, ts(7), 1, "a"))
      q.processAllAvailable()
      val got = spark.table("tws_recent_test")
        .as[EventStream.UserRecent].collect().toSet
      assert(got == Set(
        EventStream.UserRecent(1, 3, 3, s"90@${ms(9)},50@${ms(5)},10@${ms(1)}"),
        EventStream.UserRecent(1, 4, 3, s"90@${ms(9)},70@${ms(7)},50@${ms(5)}")))
      q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(provKey, p)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("sessionizeTws (event-time timers) equals fMGWS sessionize row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)
      // user 1: two sessions split by a 31-min gap; the second session is
      // left OPEN at the horizon and must be flushed by the final
      // watermark timer. user 2: one closed session.
      // batch 0 holds the early events of BOTH users (nothing in batch 1
      // is behind the batch-0 watermark — late-row policy must not differ
      // between the two APIs for this equality to be meaningful)
      val events = Seq(
        EventStream.Event(1, ts(0), 1), EventStream.Event(2, ts(10), 1),
        EventStream.Event(4, ts(0), 2), EventStream.Event(5, ts(5), 2),
        EventStream.Event(3, ts(41), 1),
        EventStream.Event(6, ts(90), 2)) // advances the watermark horizon
      def run(f: (org.apache.spark.sql.SparkSession,
                  org.apache.spark.sql.Dataset[EventStream.Event]) =>
                org.apache.spark.sql.Dataset[EventStream.Session],
              name: String) = {
        val input = MemoryStream[EventStream.Event]
        val q = f(spark, input.toDS())
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        input.addData(events.take(4))
        q.processAllAvailable()
        input.addData(events.drop(4))
        q.processAllAvailable()
        q.stop()
        spark.table(name).as[EventStream.Session].collect().toSet
      }
      val viaTimers = run(EventStream.sessionizeTws(_, _), "tws_sess_test")
      val viaFmgws = run(EventStream.sessionize(_, _), "fmgws_sess_test")
      assert(viaTimers == viaFmgws)
      // and the planted structure is what both produced: user 1's open
      // 1-event session is flushed by the final watermark (41+30 < 90),
      // user 2's minute-90 session is not (90+30 > 90)
      assert(viaTimers.map(s => (s.user_id, s.n_events)) ==
        Set((1L, 2L), (1L, 1L), (2L, 2L)))
    } finally prev match {
      case Some(p) => spark.conf.set(provKey, p)
      case None    => spark.conf.unset(provKey)
    }
  }

  test("scd2MaintainStream folds micro-batches into a versioned Type-2 ledger") {
    implicit val sqlCtx = spark.sqlContext
    val ledgerDir = Files.createTempDirectory("scd2_ledger").toString
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val updates = input.toDF().toDF("user_id", "plan", "ts")
    val q = EventStream.scd2MaintainStream(updates, ledgerDir,
      keyCols = Seq("user_id"), attrCols = Seq("plan"), tsCol = "ts")
      .outputMode("update").start()
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

    // batch 0: two users sign up; user 1 flips plans WITHIN the batch —
    // only the latest-by-ts update may land
    input.addData((1L, "free", ts(1)), (1L, "pro", ts(2)), (2L, "free", ts(2)))
    q.processAllAvailable()
    val v0 = spark.read.parquet(s"$ledgerDir/v=0")
    assert(v0.count() == 2)
    assert(v0.filter($"user_id" === 1 && $"plan" === "pro" && $"is_current").count() == 1)

    // batch 1: user 2 upgrades, user 1 untouched (partial delta: NO soft delete)
    input.addData((2L, "team", ts(10)))
    q.processAllAvailable()
    q.stop()
    assert(Files.readString(java.nio.file.Paths.get(s"$ledgerDir/_LATEST")) == "1")
    val v1 = spark.read.parquet(s"$ledgerDir/v=1")
    val rows = v1.select($"user_id", $"plan", $"valid_to".cast("string"), $"is_current")
      .as[(Long, String, Option[String], Boolean)].collect().toSet
    assert(rows == Set(
      (1L, "pro", None, true),                   // untouched by the delta
      (2L, "free", Some("2024-01-10"), false),   // closed old version
      (2L, "team", None, true)))                 // opened new version

    // simulate a crash inside the pointer commit window (after the
    // delete, before the rename): the next start must auto-recover to
    // the highest _SUCCESS-complete version and keep appending history
    Files.delete(java.nio.file.Paths.get(s"$ledgerDir/_LATEST"))
    val input2 = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q2 = EventStream.scd2MaintainStream(
      input2.toDF().toDF("user_id", "plan", "ts"), ledgerDir,
      keyCols = Seq("user_id"), attrCols = Seq("plan"), tsCol = "ts")
      .outputMode("update").start()
    input2.addData((1L, "enterprise", ts(20)))
    q2.processAllAvailable()
    q2.stop()
    assert(Files.readString(java.nio.file.Paths.get(s"$ledgerDir/_LATEST")) == "2")
    val v2 = spark.read.parquet(s"$ledgerDir/v=2")
    // history from the recovered v=1 preserved, new version appended
    assert(v2.filter($"user_id" === 1).count() == 2)
    assert(v2.filter($"user_id" === 1 && $"plan" === "enterprise" && $"is_current")
      .count() == 1)
  }

  test("cdcLatest picks the batch-order-independent winner across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // (k, name, bal, seq, op)
    val input = MemoryStream[(Long, String, Double, Long, String)]
    val changes = input.toDF().toDF("k", "name", "bal", "seq", "op")
    val q = EventStream.cdcLatest(changes, Seq("k"), "seq", "op").writeStream
      .format("memory").queryName("cdc_latest_test")
      .outputMode("complete").start()
    // batch 1: k=1 updated, k=2 inserted, k=3 same-seq I+D tie
    input.addData((1L, "a", 10.0, 2L, "U"), (2L, "b", 5.0, 1L, "I"),
      (3L, "c1", 1.0, 4L, "I"), (3L, "c2", 1.0, 4L, "D"))
    q.processAllAvailable()
    // batch 2: k=1 LATER delete arrives in a different batch; k=2 older
    // duplicate redelivered (must lose to the seq-1 original on tiebreak)
    input.addData((1L, "a", 10.0, 3L, "D"), (2L, "b-old", 4.0, 0L, "U"))
    q.processAllAvailable()
    val got = spark.table("cdc_latest_test")
      .select($"k", $"op", $"seq", $"name")
      .as[(Long, String, Long, String)].collect().toSet
    q.stop()
    assert(got == Set(
      (1L, "D", 3L, "a"),    // cross-batch: the later delete wins
      (2L, "I", 1L, "b"),    // higher seq wins over the redelivered 0
      (3L, "D", 4L, "c2"))) // same-seq tie: op asc => D beats I
  }

  test("statePartitionsForRate applies the measured sizing table") {
    // README §streaming round-9 sweep, under a production-like session
    // default (32): 10k rows/s -> 8 partitions (the point where the
    // stream-stream join first holds a 1 s trigger); low rates clamp
    // at 4; high rates take the session's cluster-sized parallelism
    EventStream.withStatePartitions(spark, 32) {
      assert(EventStream.statePartitionsForRate(spark, 10000) == 8)
      assert(EventStream.statePartitionsForRate(spark, 1000) == 4)
      assert(EventStream.statePartitionsForRate(spark, 20000) == 16)
      assert(EventStream.statePartitionsForRate(spark, 1000000) == 32)
    }
    // and the clamp follows the session: this 4-partition test session
    // never over-shards a low-rate stream's state
    assert(EventStream.statePartitionsForRate(spark, 1000000) ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }

  test("withStatePartitionsForRate lets the stream-stream join hold a 1 s trigger at 10k rows/s") {
    // the operational form of the round-9 sweep: at the SESSION default
    // (32 partitions) this join's per-batch floor measured ~5.2 s p50 —
    // it cannot hold a 1 s trigger at any rate; sized by rate (8) it
    // measured ~1.0 s p50. The 3.5 s bound discriminates the two
    // regimes with ~3x headroom for suite-concurrency noise.
    def rateSide(rps: Int, idOffset: Long) = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).load()
      .select((col("value") + idOffset).as("event_id"),
        col("timestamp").as("ts"), (col("value") % 10000).as("user_id"))
    // outer 32 = the production-like session default the rate sizing
    // overrides; inner call sizes the state layout down to 8
    val q = EventStream.withStatePartitions(spark, 32) {
      EventStream.withStatePartitionsForRate(spark, 10000) {
        EventStream.clickViewJoin(
            rateSide(5000, 0L), rateSide(5000, 1000000000L),
            horizon = "10 minutes", delay = "10 minutes")
          .writeStream.format("noop")
          .trigger(Trigger.ProcessingTime("1 second"))
          .outputMode("append").start()
      }
    }
    try {
      Thread.sleep(15000)
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      assert(progress.length >= 4, s"only ${progress.length} non-empty batches")
      // the rate-sized layout is baked into the state stores
      assert(progress.last.stateOperators.head.numShufflePartitions == 8L,
        "state layout must use the rate-sized partition count")
      val walls = progress.drop(2) // source ramp + store open
        .map(_.durationMs.get("triggerExecution").toLong).sorted
      val p50 = walls(walls.length / 2)
      assert(p50 <= 3500,
        s"p50 batch wall ${p50} ms — the rate-sized join should hold a " +
          s"1 s trigger (32-partition floor measured ~5200 ms)")
    } finally q.stop()
  }
}
