package graft.streaming

import graft.SparkSpec
import graft.ops.FoodPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp

/** Streaming-semantics tests (SURVEY.md §5.2): complete-mode running
  * counts across micro-batches, watermark windowing with late-data
  * drop, bounded-state dedup, and custom stateful sessionization —
  * all over MemoryStream (the Kafka source needs a broker; its options
  * are reference-identical and constructed in the last test).
  */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("complete-mode running counts accumulate across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val counts = FoodPipeline.nutriscoreDistribution(
      FoodPipeline.parsePage(in.toDF()))
    val q = counts.writeStream.format("memory")
      .queryName("running_counts").outputMode(OutputMode.Complete()).start()
    try {
      def page(grade: String): String =
        s"""{"rows":[{"row":{"nutriscore_grade":"$grade","categories_tags":[],
           |"nutriments":[],"product_name":[],"packaging_tags":[],
           |"brands_tags":[],"additives_tags":[],"nova_groups_tags":[]}}]}"""
          .stripMargin.replaceAll("\n", "")
      in.addData(page("a"), page("b"))
      q.processAllAvailable()
      assert(rowsOf(sql("SELECT * FROM running_counts")) ===
        Seq(Seq("A", "1"), Seq("B", "1")))
      in.addData(page("a"), page("zz"))
      q.processAllAvailable()
      // batch 2 merges into running state: A=2, B=1, UNKNOWN=1
      assert(rowsOf(sql("SELECT * FROM running_counts")) ===
        Seq(Seq("A", "2"), Seq("B", "1"), Seq("UNKNOWN", "1")))
    } finally q.stop()
  }

  test("watermarked tumbling window drops events later than the watermark") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val out = Streams.windowedEventCounts(
      in.toDF().toDF("ts", "event_type"), "10 minutes", "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("windowed").outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), "click"), (ts(5), "click"))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 window
      in.addData((ts(40), "view"))
      q.processAllAvailable()
      // a late event for the long-closed 10:00 window must be dropped
      in.addData((ts(1), "click"))
      q.processAllAvailable()
      in.addData((ts(59), "view")) // close the 10:40 window too
      q.processAllAvailable()
      val rows = rowsOf(sql("SELECT window_start, event_type, event_count FROM windowed"))
      assert(rows.contains(Seq("2024-01-01 10:00:00.0", "click", "2"))) // late '1' absent
      assert(!rows.contains(Seq("2024-01-01 10:00:00.0", "click", "3")))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val out = Streams.dedupedEvents(
      in.toDF().toDF("event_id", "ts"), "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("deduped").outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2)))
      q.processAllAvailable()
      in.addData((1L, ts(3)), (3L, ts(4))) // 1 is still a dup within horizon
      q.processAllAvailable()
      val ids = sql("SELECT event_id FROM deduped")
        .collect().map(_.getLong(0)).sorted.toList
      assert(ids === List(1L, 2L, 3L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: gap splits, timeout closes idle sessions") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[StatefulSessions.Event]
    val out = StatefulSessions.sessionize(in.toDS())
    val q = out.writeStream.format("memory")
      .queryName("stateful_sessions").outputMode(OutputMode.Append()).start()
    try {
      def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
      in.addData(StatefulSessions.Event(1L, t("10:00")),
        StatefulSessions.Event(1L, t("10:10")), // merges: gap 10m < 30m
        StatefulSessions.Event(2L, t("10:05")))
      q.processAllAvailable()
      // gap 80m > 30m → closes user 1's first session in-function
      in.addData(StatefulSessions.Event(1L, t("11:30")))
      q.processAllAvailable()
      // advance watermark far past every open session's timeout
      in.addData(StatefulSessions.Event(3L, t("14:00")))
      q.processAllAvailable()
      in.addData(StatefulSessions.Event(3L, t("15:30")))
      q.processAllAvailable()
      val sessions = sql("SELECT * FROM stateful_sessions")
        .as[StatefulSessions.ClosedSession].collect()
      val u1 = sessions.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(u1.length === 2)
      assert(u1(0).event_count === 2 && u1(1).event_count === 1)
      assert(sessions.count(_.user_id == 2L) === 1) // closed by timeout
    } finally q.stop()
  }

  test("stateful transitions: the carry emits cross-batch hand-offs, gap boundary exact") {
    import graft.streaming.StatefulTransitions
    import graft.streaming.StatefulTransitions.{TEvent, Transition}
    implicit val sc = spark.sqlContext
    val in = MemoryStream[TEvent]
    val q = StatefulTransitions.transitions(in.toDS()).writeStream
      .format("memory").queryName("stateful_transitions")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(hhmmss: String) = Timestamp.valueOf(s"2024-01-01 $hhmmss")
      // batch 1: one event — no transition yet
      in.addData(TEvent(1L, t("10:00:00"), "view", 1L))
      q.processAllAvailable()
      // batch 2: within gap → the CROSS-BATCH transition view→click;
      // exactly-30min gap → still same session (q139's > boundary)
      in.addData(TEvent(1L, t("10:10:00"), "click", 2L),
        TEvent(1L, t("10:40:00"), "purchase", 3L))
      q.processAllAvailable()
      // batch 3: 30min + 1s past → new session, NO transition
      in.addData(TEvent(1L, t("11:10:01"), "view", 4L))
      q.processAllAvailable()
      val got = sql("SELECT from_type, to_type FROM stateful_transitions")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toList
      assert(got === List(("click", "purchase"), ("view", "click")),
        s"expected exactly the two in-gap hand-offs, got $got")
    } finally q.stop()
  }

  test("stateful transitions: late arrivals chain among themselves and bridge into the carry") {
    import graft.streaming.StatefulTransitions.{foldBatch, TransState}
    val min = 60L * 1000000L // one minute in µs
    // carry at t=50min; batch delivers two LATE rows (10min, 20min)
    // and one in-order row (60min)
    val (out, cur) = foldBatch(Some(TransState(50 * min, 9L, "C")),
      Seq((60 * min, 10L, "D"), (10 * min, 1L, "A"), (20 * min, 2L, "B")))
    assert(out.map(t => (t.from_type, t.to_type)) ===
      List(("A", "B"), ("B", "C"), ("C", "D")),
      "late rows must chain in order, bridge into the carry, then resume")
    assert(cur.map(_.last_type) === Some("D"))
    // a late row beyond the gap bridges nothing
    val (out2, _) = foldBatch(Some(TransState(50 * min, 9L, "C")),
      Seq((10 * min, 1L, "A")))
    assert(out2.isEmpty, "a 40-minute-late row is a different session")
    // equal-µs disorder: smaller event_id sorts before the carry
    val (out3, cur3) = foldBatch(Some(TransState(50 * min, 9L, "C")),
      Seq((50 * min, 3L, "B")))
    assert(out3.map(t => (t.from_type, t.to_type)) === List(("B", "C")))
    assert(cur3.map(_.last_type) === Some("C"), "carry stays the latest")
  }

  test("stream-static enrichment: dim refresh lands on restart, stream offsets stay exactly-once") {
    import org.apache.spark.sql.types.StructType
    val work = java.nio.file.Files.createTempDirectory("graft_ss_dim").toString
    def writeDim(seg: String): Unit =
      spark.createDataFrame(java.util.List.of(
          org.apache.spark.sql.Row(1L, seg)),
        StructType.fromDDL("user_id bigint, segment string"))
        .write.mode("overwrite").parquet(s"$work/dim")
    def feedChunk(id: Long): Unit =
      graft.streaming.Streams.orderedChunkFeed(
        spark.createDataFrame(java.util.List.of(
            org.apache.spark.sql.Row(id, 1L)),
          StructType.fromDDL("event_id bigint, user_id bigint")),
        s"$work/feed", 1, col("event_id"))
    def runOnce(): Unit = {
      // dim REBUILT per run: the static side's file listing pins at
      // query start — this is the re-plan the q192 scaladoc describes
      val dim = spark.read.schema("user_id bigint, segment string")
        .parquet(s"$work/dim")
      val stream = spark.readStream
        .schema(StructType.fromDDL("event_id bigint, user_id bigint"))
        .option("maxFilesPerTrigger", "1").parquet(s"$work/feed")
      stream.join(broadcast(dim), Seq("user_id"))
        .writeStream.format("parquet").option("path", s"$work/out")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    writeDim("v1"); feedChunk(10L); runOnce()
    // refresh the dim, append one event, RESTART from the checkpoint
    writeDim("v2"); feedChunk(20L); runOnce()
    val got = spark.read.parquet(s"$work/out")
      .select(col("event_id"), col("segment")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toList
    assert(got === List((10L, "v1"), (20L, "v2")),
      "pre-refresh events keep the dim they were enriched with; the " +
        "restarted run reads the refreshed dim and ONLY the new offsets " +
        s"(no reprocessing of chunk 10) — got $got")
  }

  test("SCD2 fold: runs collapse, a change closes at the changing event's µs") {
    import graft.streaming.StatefulScd2.{foldBatch, RunState}
    val min = 60L * 1000000L
    // fresh key: A A B A — two closures, open run A
    val (out, cur) = foldBatch(None, Seq(
      (10 * min, 1L, "A"), (20 * min, 2L, "A"),
      (30 * min, 3L, "B"), (40 * min, 4L, "A")))
    assert(out.map(i => (i.event_type, i.from_us, i.to_us)) === List(
      ("A", 10 * min, Some(30 * min)), ("B", 30 * min, Some(40 * min))))
    assert(cur === Some(RunState("A", 40 * min, 40 * min, 4L)))
    // carry continues across the batch boundary: same type = no closure
    val (out2, cur2) = foldBatch(cur, Seq((50 * min, 5L, "A")))
    assert(out2.isEmpty && cur2.get.from_us === 40 * min,
      "a same-type event must extend the carried run, not restart it")
    // rows fold in (µs, event_id) order whatever the arrival order
    val (out3, _) = foldBatch(None, Seq(
      (30 * min, 3L, "B"), (10 * min, 1L, "A"), (20 * min, 2L, "A")))
    assert(out3.map(i => (i.event_type, i.to_us)) ===
      List(("A", Some(30 * min))))
  }

  test("stateful SCD2: cross-batch run continuation; flush timer emits open intervals") {
    import graft.streaming.StatefulScd2
    import graft.streaming.StatefulScd2.{Interval, SEvent}
    implicit val sc = spark.sqlContext
    def t(x: String) = Timestamp.valueOf(x)
    val flushUs = graft.streaming.StatefulSessions.micros(
      t("2024-01-01 12:00:00"))
    val in = MemoryStream[SEvent]
    val q = StatefulScd2.intervals(in.toDS(), flushUs).writeStream
      .format("memory").queryName("scd2_intervals")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: u1 opens run A; u2 opens run C
      in.addData(SEvent(1L, t("2024-01-01 10:00:00"), "A", 1L),
        SEvent(2L, t("2024-01-01 10:01:00"), "C", 2L))
      q.processAllAvailable()
      // batch 2: u1's A CONTINUES across the boundary, then closes at B
      in.addData(SEvent(1L, t("2024-01-01 10:05:00"), "A", 3L),
        SEvent(1L, t("2024-01-01 10:20:00"), "B", 4L))
      q.processAllAvailable()
      // two sentinel batches push the watermark past the quiesce point
      in.addData(SEvent(-1L, t("2024-01-02 10:00:00"), "__flush", 5L))
      q.processAllAvailable()
      in.addData(SEvent(-1L, t("2024-01-02 10:01:00"), "__flush", 6L))
      q.processAllAvailable()
      val got = sql("SELECT * FROM scd2_intervals").as[Interval].collect()
        .filter(_.user_id >= 0L).sortBy(i => (i.user_id, i.from_us)).toList
      def us(x: String) = graft.streaming.StatefulSessions.micros(t(x))
      assert(got === List(
        Interval(1L, "A", us("2024-01-01 10:00:00"),
          Some(us("2024-01-01 10:20:00"))),
        Interval(1L, "B", us("2024-01-01 10:20:00"), None),
        Interval(2L, "C", us("2024-01-01 10:01:00"), None)),
        s"one closed A spanning the batch boundary + two flushed opens; got $got")
    } finally q.stop()
  }

  test("transformWithState SCD2 twin reproduces the batch q194 census") {
    import graft.streaming.{StatefulScd2, StatefulTransitions}
    import graft.streaming.StatefulScd2.SEvent
    implicit val ee = org.apache.spark.sql.Encoders.product[SEvent]
    val sf = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("graft_tws196").toString
    StatefulTransitions.stageOrderedFeed(spark, sf, s"$work/feed", 4)
    val maxTs = graft.Tables.events(spark, sf)
      .agg(max(col("ts").cast("timestamp_ltz"))).head().getTimestamp(0)
    val flushUs = graft.streaming.StatefulSessions.micros(maxTs) +
      3600L * 1000000L
    val far = new Timestamp(maxTs.getTime + 48L * 3600 * 1000)
    Seq(far, new Timestamp(far.getTime + 60000)).foreach { t =>
      graft.streaming.Streams.orderedChunkFeed(
        spark.createDataset(Seq(SEvent(-1L, t, "__flush", -1L)))(ee).toDF(),
        s"$work/feed", 1, col("ts"))
    }
    // transformWithState needs multi-column-family state — RocksDB only
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val feed = StatefulTransitions.feedStream(spark, s"$work/feed")
        .map(e => SEvent(e.user_id, e.ts, e.event_type, e.event_id))(ee)
      StatefulScd2.intervalsTws(feed, flushUs).writeStream
        .format("parquet").option("path", s"$work/intervals")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val tws = rowsOf(spark.read.parquet(s"$work/intervals")
      .filter(col("user_id") >= 0L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("intervals"),
        sum(when(col("to_us").isNull, 0L).otherwise(1L)).as("closed"),
        sum(col("to_us") - col("from_us")).as("dur_us_sum"),
        max(col("to_us") - col("from_us")).as("dur_us_max")))
    val batch = rowsOf(graft.queries.Temporal.q194Scd2Intervals(spark, sf))
    assert(tws === batch,
      "the transformWithState SCD2 twin must reproduce the batch build")
  }

  test("stateful SCD2 reproduces the batch q194 census at sf0.001") {
    val streamed = rowsOf(graft.queries.StreamingQ
      .q196IncrementalScd2(spark, "/root/testdata/sf0.001"))
    val batch = rowsOf(graft.queries.Temporal
      .q194Scd2Intervals(spark, "/root/testdata/sf0.001"))
    assert(streamed === batch,
      "the keyed-state SCD2 build must equal the batch gaps-and-islands µs-exactly")
    assert(streamed.nonEmpty)
  }

  test("stateful transitions reproduce the batch q139 matrix at sf0.001") {
    val streamed = rowsOf(graft.queries.StreamingQ
      .q147IncrementalTransitions(spark, "/root/testdata/sf0.001"))
    val batch = rowsOf(graft.queries.Events
      .q139SessionTransitions(spark, "/root/testdata/sf0.001"))
    assert(streamed === batch,
      "the per-user carry must reproduce the batch window's matrix exactly")
  }

  test("orderedChunkFeed replays range-sorted chunks as in-order micro-batches") {
    // the contract the de-drivered q113/q147 harnesses rest on: range i
    // lands in part file i, staged mtimes strictly increase, and the
    // file source admits oldest-first — so batch k's key range sits
    // entirely below batch k+1's. Appending (the sentinel-flush path)
    // must sort after everything already staged.
    import org.apache.spark.sql.types.StructType
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ordfeed").toString
    val n = 5
    Streams.orderedChunkFeed(
      spark.range(1000).select(col("id").as("seq")), s"$dir/feed", n, col("seq"))
    Streams.orderedChunkFeed( // appended chunk: must arrive LAST
      Seq(5000L).toDF("seq"), s"$dir/feed", 1, col("seq"))
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = spark.readStream.schema(StructType.fromDDL("seq bigint"))
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/feed")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val r = b.agg(min(col("seq")), max(col("seq"))).head()
        ranges.synchronized { ranges += ((id, r.getLong(0), r.getLong(1))); () }
      }
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val sorted = ranges.sortBy(_._1).toList
    assert(sorted.size == n + 1, s"expected ${n + 1} micro-batches, got $sorted")
    sorted.sliding(2).foreach {
      case List((_, _, hi), (_, lo, _)) =>
        assert(hi < lo, s"batch ranges out of order or overlapping: $sorted")
      case _ => ()
    }
    assert(sorted.last._3 == 5000L, "appended chunk must replay last")
    // the staging temp dir must not outlive the call: a bench sweep
    // stages one per feed and /tmp fills with _SUCCESS/.crc husks
    val husks = new java.io.File(
      System.getProperty("java.io.tmpdir")).listFiles()
      .filter(_.getName.startsWith("graft_feedstage"))
    assert(husks.isEmpty,
      s"orderedChunkFeed left staging dirs behind: ${husks.mkString(", ")}")
  }

  test("transformWithState transitions twin reproduces the batch q139 matrix") {
    import graft.streaming.StatefulTransitions
    val sf = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("graft_tws147").toString
    StatefulTransitions.stageOrderedFeed(spark, sf, s"$work/feed", 6)
    // transformWithState needs multi-column-family state — RocksDB only
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      StatefulTransitions.transitionsTws(
          StatefulTransitions.feedStream(spark, s"$work/feed")).writeStream
        .format("parquet").option("path", s"$work/trans")
        .option("checkpointLocation", s"$work/ckpt")
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val tws = spark.read.parquet(s"$work/trans")
      .groupBy("from_type", "to_type").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toList
    val batch = graft.queries.Events.q139SessionTransitions(spark, sf)
      .select(col("from_type"), col("to_type"), col("transitions"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sorted.toList
    assert(tws === batch,
      "the transformWithState carry must reproduce the batch matrix exactly")
  }

  test("session_window streaming aggregation groups by inactivity gap") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val out = Streams.sessionWindowStats(
      in.toDF().toDF("ts", "user_id"), "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("sessions").outputMode(OutputMode.Append()).start()
    try {
      in.addData((ts(0), 7L), (ts(10), 7L), (ts(55), 7L))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 7L)) // advance watermark
      q.processAllAvailable()
      val rows = rowsOf(sql("SELECT user_id, events_in_session FROM sessions"))
      assert(rows.contains(Seq("7", "2"))) // 10:00+10:10 merged
      assert(rows.contains(Seq("7", "1"))) // 10:55 alone
    } finally q.stop()
  }

  /** Full-file batch parity for a stateful sessionizer: stream the
    * sf0.001 events IN ORDER (with any positive watermark delay a
    * session closed by the advancing watermark can never be touched by
    * a later in-order event, so chunking is arbitrary), flush open
    * sessions via a far-future dummy user (watermark computed at batch
    * N's end applies in batch N+1 — hence two flush batches), then the
    * per-user census of closed sessions must equal batch q17. Events
    * carry sub-ms micros, so this pins the µs-exact gap arithmetic. */
  private def sessionParityCheck(
      api: org.apache.spark.sql.Dataset[StatefulSessions.Event] =>
        org.apache.spark.sql.Dataset[StatefulSessions.ClosedSession],
      queryName: String): Unit = {
    implicit val sc = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, sf)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp_ltz").as("ts"))
      .collect()
      .map(r => StatefulSessions.Event(r.getLong(0), r.getTimestamp(1)))
      .sortBy(e => StatefulSessions.micros(e.ts))
    val in = MemoryStream[StatefulSessions.Event]
    val q = api(in.toDS()).writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Append()).start()
    val flushUser = -1L
    try {
      events.grouped(400).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
      val far = new Timestamp(events.map(_.ts.getTime).max + 48L * 3600 * 1000)
      in.addData(StatefulSessions.Event(flushUser, far))
      q.processAllAvailable()
      in.addData(StatefulSessions.Event(flushUser,
        new Timestamp(far.getTime + 60000)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sql(s"SELECT * FROM $queryName")
      .filter(col("user_id") =!= flushUser)
      .groupBy("user_id")
      .agg(count(lit(1)).as("session_count"),
        max(col("event_count")).as("max_session_events"))
    assert(rowsOf(streamed) ===
      rowsOf(graft.queries.Events.q17UserSessions(spark, sf)),
      s"$queryName: closed sessions must reproduce the batch sessionization")
  }

  test("flatMapGroupsWithState sessionization equals batch q17 over the full file") {
    sessionParityCheck(StatefulSessions.sessionize(_), "fmgws_parity")
  }

  test("transformWithState sessionization equals batch q17 over the full file") {
    // transformWithState needs multi-column-family state — RocksDB only
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try sessionParityCheck(StatefulSessions.sessionizeTws(_), "tws_parity")
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("upsert sink writes only changed keys; latestSnapshot reconstructs state") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val in = MemoryStream[String]
    def page(grade: String): String =
      s"""{"rows":[{"row":{"nutriscore_grade":"$grade","categories_tags":[],
         |"nutriments":[],"product_name":[],"packaging_tags":[],
         |"brands_tags":[],"additives_tags":[],"nova_groups_tags":[]}}]}"""
        .stripMargin.replaceAll("\n", "")
    val counts = FoodPipeline.nutriscoreDistribution(
      FoodPipeline.parsePage(in.toDF()))
    val q = Streams.upsertParquetSink(counts, s"$dir/out", s"$dir/cp").start()
    try {
      in.addData(page("a"), page("b"))
      q.processAllAvailable()
      in.addData(page("a")) // only A changes in batch 2
      q.processAllAvailable()
      val log = spark.read.parquet(s"$dir/out")
      // update mode emitted A twice (count 1 then 2) but B once
      assert(log.filter(col("nutriscore") === "A").count() === 2)
      assert(log.filter(col("nutriscore") === "B").count() === 1)
      val snap = rowsOf(Streams.latestSnapshot(spark, s"$dir/out", Seq("nutriscore")))
      assert(snap === Seq(Seq("A", "2"), Seq("B", "1")))
    } finally q.stop()
  }

  test("file-drop source: dropped page files stream through the food pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_filedrop")
    val inDir = dir.resolve("in"); java.nio.file.Files.createDirectory(inDir)
    def page(grade: String): String =
      s"""{"rows":[{"row":{"nutriscore_grade":"$grade","categories_tags":[],
         |"nutriments":[],"product_name":[],"packaging_tags":[],
         |"brands_tags":[],"additives_tags":[],"nova_groups_tags":[]}}]}"""
        .stripMargin.replaceAll("\n", "")
    java.nio.file.Files.writeString(inDir.resolve("page1.json"), page("a"))
    val counts = FoodPipeline.nutriscoreDistribution(
      FoodPipeline.parsePage(Streams.jsonFileSource(spark, inDir.toString)))
    val q = counts.writeStream.format("memory")
      .queryName("filedrop_counts").outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      assert(rowsOf(sql("SELECT * FROM filedrop_counts")) === Seq(Seq("A", "1")))
      java.nio.file.Files.writeString(inDir.resolve("page2.json"), page("a"))
      q.processAllAvailable()
      assert(rowsOf(sql("SELECT * FROM filedrop_counts")) === Seq(Seq("A", "2")))
    } finally q.stop()
  }

  test("stateful sessions: late in-gap event extends the session span backwards") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[StatefulSessions.Event]
    val q = StatefulSessions.sessionize(in.toDS())
      .writeStream.format("memory")
      .queryName("late_sessions").outputMode(OutputMode.Append()).start()
    try {
      def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
      in.addData(StatefulSessions.Event(1L, t("10:00")))
      q.processAllAvailable()
      // late event 5 min EARLIER, still within watermark and gap
      in.addData(StatefulSessions.Event(1L, t("09:55")))
      q.processAllAvailable()
      in.addData(StatefulSessions.Event(2L, t("14:00"))) // trigger timeout
      q.processAllAvailable()
      in.addData(StatefulSessions.Event(2L, t("15:00")))
      q.processAllAvailable()
      val s = sql("SELECT * FROM late_sessions")
        .as[StatefulSessions.ClosedSession].collect().filter(_.user_id == 1L)
      assert(s.length === 1)
      assert(s(0).session_start === t("09:55"), "span must extend backwards")
      assert(s(0).session_end === t("10:00") && s(0).event_count === 2)
    } finally q.stop()
  }

  test("transformWithState sessionizer equals the flatMapGroupsWithState one") {
    implicit val sc = spark.sqlContext
    // transformWithState needs multi-column-family state — RocksDB only
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    // batches exercise: merge, gap split, backwards extension (late
    // in-gap event), and timer-driven close on an idle key
    val batches: Seq[Seq[StatefulSessions.Event]] = Seq(
      Seq(StatefulSessions.Event(1L, t("10:00")),
        StatefulSessions.Event(1L, t("10:10")),
        StatefulSessions.Event(2L, t("10:05"))),
      Seq(StatefulSessions.Event(1L, t("09:55")), // extends back in-gap
        StatefulSessions.Event(1L, t("11:30"))),  // splits: 80m gap
      Seq(StatefulSessions.Event(3L, t("14:00"))), // advances watermark
      Seq(StatefulSessions.Event(3L, t("15:30"))))
    def run(name: String,
            wire: org.apache.spark.sql.Dataset[StatefulSessions.Event] =>
              org.apache.spark.sql.Dataset[StatefulSessions.ClosedSession]) = {
      val in = MemoryStream[StatefulSessions.Event]
      val q = wire(in.toDS()).writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Append()).start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        sql(s"SELECT * FROM $name")
          .as[StatefulSessions.ClosedSession].collect()
          .map(s => (s.user_id, s.session_start.getTime,
            s.session_end.getTime, s.event_count)).toSet
      } finally q.stop()
    }
    try {
      val classic = run("tws_classic", StatefulSessions.sessionize(_))
      val tws = run("tws_new", StatefulSessions.sessionizeTws(_))
      assert(tws === classic)
      assert(classic.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("RTBF eviction (classic): erase removes the KEY from the state store, not just its output") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_evictc").toString
    val in = MemoryStream[StatefulSessions.CEvent]
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def ce(u: Long, ts: Timestamp, er: Boolean = false) =
      StatefulSessions.CEvent(u, ts, er)
    val q = StatefulSessions.sessionizeCtl(in.toDS()).writeStream
      .format("memory").queryName("evict_classic")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append()).start()
    // the store audit the q223 scaladoc points here for: keyed state
    // read straight from the checkpoint via the statestore source
    def stateKeys(): Set[Long] =
      spark.read.format("statestore").load(s"$dir/ckpt")
        .select("key.*").collect().map(_.getLong(0)).toSet
    try {
      in.addData(ce(3L, t("10:00")), ce(3L, t("10:05")), ce(7L, t("10:02")))
      q.processAllAvailable()
      assert(stateKeys() === Set(3L, 7L),
        "both users hold OPEN sessions in the checkpoint before erasure")
      in.addData(ce(3L, t("10:06"), er = true))
      q.processAllAvailable()
      // gone, not silenced: the live key persists, the erased one doesn't
      assert(stateKeys() === Set(7L),
        "the erased key must be GONE from the state store")
      // flush user 7 via the watermark and drain
      in.addData(ce(9L, t("14:00"))); q.processAllAvailable()
      in.addData(ce(9L, t("15:30"))); q.processAllAvailable()
      val out = sql("SELECT * FROM evict_classic")
        .as[StatefulSessions.ClosedSession].collect()
      assert(!out.exists(_.user_id == 3L),
        "an erased open session never happened — it must not 'close'")
      assert(out.filter(_.user_id == 7L).map(_.event_count).toSeq === Seq(1L),
        "a bystander key's session must close normally")
    } finally q.stop()
  }

  test("RTBF eviction (TWS): clear+timer-delete matches the classic twin; re-arrival starts fresh") {
    implicit val sc = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def ce(u: Long, ts: Timestamp, er: Boolean = false) =
      StatefulSessions.CEvent(u, ts, er)
    // merge, erase mid-session, POST-ERASE RE-ARRIVAL (ungated — the
    // operator keeps no tombstone memory, so a fresh session starts:
    // point-in-time semantics, the write-path gate owns the future),
    // then watermark-driven closes
    val batches: Seq[Seq[StatefulSessions.CEvent]] = Seq(
      Seq(ce(3L, t("10:00")), ce(3L, t("10:10")), ce(7L, t("10:05"))),
      Seq(ce(3L, t("10:20"), er = true)),
      Seq(ce(3L, t("10:25"))), // re-arrival: new session of exactly 1
      Seq(ce(9L, t("14:00"))),
      Seq(ce(9L, t("15:30"))))
    // audit: mid-run keyed-state reads straight from the checkpoint
    def run(name: String,
            wire: org.apache.spark.sql.Dataset[StatefulSessions.CEvent] =>
              org.apache.spark.sql.Dataset[StatefulSessions.ClosedSession],
            ckpt: String,
            audit: Int => Unit) = {
      val in = MemoryStream[StatefulSessions.CEvent]
      val q = wire(in.toDS()).writeStream.format("memory")
        .queryName(name).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          in.addData(b); q.processAllAvailable(); audit(i)
        }
        sql(s"SELECT * FROM $name")
          .as[StatefulSessions.ClosedSession].collect()
          .map(s => (s.user_id, s.session_start.getTime,
            s.session_end.getTime, s.event_count)).toSet
      } finally q.stop()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_evictt").toString
    def twsKeys(): Set[Long] =
      spark.read.format("statestore").option("stateVarName", "session")
        .load(s"$dir/ckpt_t")
        .select("key.*").collect().map(_.getLong(0)).toSet
    try {
      val classic = run("evict_twin_classic",
        StatefulSessions.sessionizeCtl(_), s"$dir/ckpt_c", _ => ())
      val tws = run("evict_twin_tws",
        StatefulSessions.sessionizeCtlTws(_), s"$dir/ckpt_t", {
          // the store audit, at the moments it is meaningful: before
          // the erase both keys hold open sessions; right after it the
          // erased key is GONE while the bystander persists
          case 0 => assert(twsKeys() === Set(3L, 7L))
          case 1 => assert(twsKeys() === Set(7L),
            "clear()+deleteTimer must remove the key, not silence it")
          case _ => ()
        })
      assert(tws === classic, "one fold, two APIs, one answer")
      // the pre-erase span (10:00-10:10, 2 events) must be absent; the
      // post-erase re-arrival closes as a fresh 1-event session
      assert(!classic.exists(s => s._1 == 3L && s._4 == 2L),
        "the erased open session leaked to the output")
      assert(classic.count(s => s._1 == 3L) === 1)
      assert(classic.exists(s => s._1 == 3L && s._4 == 1L &&
        s._2 == t("10:25").getTime))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("RTBF eviction (SCD2): erase removes the open RUN + flush timer; twins agree; bystanders flush") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StatefulScd2
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def ce(u: Long, ts: Timestamp, ty: String, id: Long, er: Boolean = false) =
      StatefulScd2.CSEvent(u, ts, ty, id, er)
    val flushUs = StatefulSessions.micros(t("16:00"))
    // user 3: a run that changes state (one CLOSED interval lands in
    // the sink) then stays open; the erase must kill the OPEN run and
    // its flush timer while the already-closed interval (the "landed"
    // half, vacuumed in q226's composed row) and user 7's runs survive
    val batches: Seq[Seq[StatefulScd2.CSEvent]] = Seq(
      Seq(ce(3L, t("10:00"), "view", 1), ce(3L, t("10:05"), "click", 2),
        ce(7L, t("10:02"), "view", 3)),
      Seq(ce(3L, t("10:20"), "click", 4, er = true)),
      Seq(ce(9L, t("17:10"), "view", 5)), // watermark over the quiesce
      Seq(ce(9L, t("17:40"), "view", 6)))
    def run(name: String,
            wire: (org.apache.spark.sql.Dataset[StatefulScd2.CSEvent], Long) =>
              org.apache.spark.sql.Dataset[StatefulScd2.Interval],
            ckpt: String, audit: Int => Unit) = {
      val in = MemoryStream[StatefulScd2.CSEvent]
      val q = wire(in.toDS(), flushUs).writeStream.format("memory")
        .queryName(name).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          in.addData(b); q.processAllAvailable(); audit(i)
        }
        sql(s"SELECT * FROM $name").as[StatefulScd2.Interval].collect()
          .map(s => (s.user_id, s.event_type, s.from_us, s.to_us)).toSet
      } finally q.stop()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_evicts").toString
    def runKeys(): Set[Long] =
      spark.read.format("statestore").option("stateVarName", "run")
        .load(s"$dir/ckpt_t")
        .select("key.*").collect().map(_.getLong(0)).toSet
    try {
      val classic = run("scd2_evict_classic",
        StatefulScd2.intervalsCtl(_, _), s"$dir/ckpt_c", _ => ())
      val tws = run("scd2_evict_tws",
        StatefulScd2.intervalsCtlTws(_, _), s"$dir/ckpt_t", {
          case 0 => assert(runKeys() === Set(3L, 7L))
          case 1 => assert(runKeys() === Set(7L),
            "the erased key's run must be GONE from the store")
          case _ => ()
        })
      assert(tws === classic, "one fold, two APIs, one answer")
      // user 3's CLOSED interval (view 10:00→10:05) landed pre-erase —
      // that is the landed half q226's vacuum owns; the OPEN click run
      // must NOT appear (neither closed nor flushed)
      assert(classic.count(_._1 == 3L) === 1)
      assert(classic.exists(i => i._1 == 3L && i._2 == "view" &&
        i._4.contains(StatefulSessions.micros(t("10:05")))))
      assert(!classic.exists(i => i._1 == 3L && i._2 == "click"),
        "the erased open run leaked to the output")
      // bystander flushes its open run at the quiesce point
      assert(classic.exists(i => i._1 == 7L && i._4.isEmpty))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("RTBF eviction (transitions): erase clears the carry; pending hand-off dies; twins agree") {
    implicit val sc = spark.sqlContext
    import graft.streaming.StatefulTransitions
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    def ce(u: Long, ts: Timestamp, ty: String, id: Long, er: Boolean = false) =
      StatefulTransitions.CTEvent(u, ts, ty, id, er)
    // user 3 emits one transition pre-erase (view→click, landed — the
    // vacuum's half in q227's composed row), then the erase kills the
    // carry; a post-erase re-arrival emits NO transition (fresh carry,
    // point-in-time semantics) and only chains from there on
    val batches: Seq[Seq[StatefulTransitions.CTEvent]] = Seq(
      Seq(ce(3L, t("10:00"), "view", 1), ce(3L, t("10:05"), "click", 2),
        ce(7L, t("10:02"), "view", 3)),
      Seq(ce(3L, t("10:10"), "view", 4, er = true)),
      Seq(ce(3L, t("10:12"), "purchase", 5), ce(7L, t("10:15"), "click", 6)),
      Seq(ce(3L, t("10:20"), "view", 7)))
    def run(name: String,
            wire: org.apache.spark.sql.Dataset[StatefulTransitions.CTEvent] =>
              org.apache.spark.sql.Dataset[StatefulTransitions.Transition],
            ckpt: String, audit: Int => Unit) = {
      val in = MemoryStream[StatefulTransitions.CTEvent]
      val q = wire(in.toDS()).writeStream.format("memory")
        .queryName(name).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          in.addData(b); q.processAllAvailable(); audit(i)
        }
        sql(s"SELECT * FROM $name").as[StatefulTransitions.Transition]
          .collect().map(x => (x.user_id, x.from_type, x.to_type)).toList
          .sorted
      } finally q.stop()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_evictt2").toString
    def carryKeys(): Set[Long] =
      spark.read.format("statestore").option("stateVarName", "carry")
        .load(s"$dir/ckpt_t")
        .select("key.*").collect().map(_.getLong(0)).toSet
    try {
      val classic = run("trans_evict_classic",
        StatefulTransitions.transitionsCtl(_), s"$dir/ckpt_c", _ => ())
      val tws = run("trans_evict_tws",
        StatefulTransitions.transitionsCtlTws(_), s"$dir/ckpt_t", {
          case 0 => assert(carryKeys() === Set(3L, 7L))
          case 1 => assert(carryKeys() === Set(7L),
            "the erased key's carry must be GONE from the store")
          case _ => ()
        })
      assert(tws === classic, "one fold, two APIs, one answer")
      // pre-erase hand-off landed; the hand-off INTO the first
      // post-erase event must NOT exist; chaining resumes after it
      assert(classic.count(_._1 == 3L) === 2, classic.toString)
      assert(classic.contains((3L, "view", "click")))
      assert(!classic.contains((3L, "click", "purchase")),
        "the pending hand-off must die with the erased carry")
      assert(classic.contains((3L, "purchase", "view")))
      assert(classic.contains((7L, "view", "click")))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-stream interval join matches within the window, drops outside it") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val views = MemoryStream[(Long, Timestamp, String)]
    val joined = Streams.intervalJoin(
      clicks.toDF().toDF("user_id", "lts", "click_id"),
      views.toDF().toDF("user_id", "rts", "view_id"),
      "user_id", intervalSeconds = 600) // 10 minutes
      .select(col("click_id"), col("view_id"))
    val q = joined.writeStream.format("memory")
      .queryName("interval_join").outputMode(OutputMode.Append()).start()
    try {
      views.addData((1L, ts(0), "v1"), (1L, ts(30), "v2"), (2L, ts(1), "v3"))
      clicks.addData((1L, ts(5), "c1"),   // joins v1 (5m before)
        (1L, ts(35), "c2"),               // joins v2 only (v1 is 35m back)
        (2L, ts(20), "c3"),               // v3 is 19m back → outside window
        (3L, ts(9), "c4"))                // no view for user 3
      q.processAllAvailable()
      val pairs = rowsOf(sql("SELECT * FROM interval_join"))
      assert(pairs === Seq(Seq("c1", "v1"), Seq("c2", "v2")))
    } finally q.stop()
  }

  test("stream-static join: streaming events enriched against a static dimension") {
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Double)]
    val enriched = in.toDF().toDF("user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
      .groupBy(col("tier")).agg(count(lit(1)).as("n"))
    val q = enriched.writeStream.format("memory")
      .queryName("enriched").outputMode(OutputMode.Complete()).start()
    try {
      in.addData((1L, 5.0), (1L, 6.0), (2L, 1.0), (9L, 0.0))
      q.processAllAvailable()
      assert(rowsOf(sql("SELECT * FROM enriched")) ===
        Seq(Seq("gold", "2"), Seq("null", "1"), Seq("silver", "1")))
    } finally q.stop()
  }

  test("checkpoint recovery: restarted query resumes state and offsets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_recovery")
    val inDir = dir.resolve("in"); java.nio.file.Files.createDirectory(inDir)
    val cp = dir.resolve("cp").toString
    def page(grade: String): String =
      s"""{"rows":[{"row":{"nutriscore_grade":"$grade","categories_tags":[],
         |"nutriments":[],"product_name":[],"packaging_tags":[],
         |"brands_tags":[],"additives_tags":[],"nova_groups_tags":[]}}]}"""
        .stripMargin.replaceAll("\n", "")
    def start() = {
      val counts = FoodPipeline.nutriscoreDistribution(
        FoodPipeline.parsePage(Streams.jsonFileSource(spark, inDir.toString)))
      Streams.upsertParquetSink(counts, s"$dir/out", cp).start()
    }
    java.nio.file.Files.writeString(inDir.resolve("p1.json"), page("a"))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // new data lands while the query is down
    java.nio.file.Files.writeString(inDir.resolve("p2.json"), page("a"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // running count resumed from checkpointed state: A=2, not A=1;
      // and p1 was NOT reprocessed (no duplicate batch for it)
      val snap = rowsOf(Streams.latestSnapshot(spark, s"$dir/out", Seq("nutriscore")))
      assert(snap === Seq(Seq("A", "2")))
    } finally q2.stop()
  }

  test("the full 7-query fleet runs concurrently off one source (reference architecture)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fleet")
    val inDir = dir.resolve("in"); java.nio.file.Files.createDirectory(inDir)
    val page =
      """{"rows":[
        | {"row":{"nutriscore_grade":"a","categories_tags":["en:snacks"],
        |  "nutriments":[{"name":"sugars","value":12.5}],
        |  "product_name":[{"lang":"main","text":"Chips"}],
        |  "packaging_tags":["en:bag"],"brands_tags":["en:crisps-co"],
        |  "additives_tags":["en:e322"],"nova_groups_tags":["en:4-ultra"]}},
        | {"row":{"nutriscore_grade":"c","categories_tags":["en:drinks"],
        |  "nutriments":[{"name":"sugars","value":30.0}],
        |  "product_name":[{"lang":"main","text":"Cola"}],
        |  "packaging_tags":["en:bottle"],"brands_tags":["en:fizz"],
        |  "additives_tags":["en:e150d"],"nova_groups_tags":["en:4-ultra"]}}
        |]}""".stripMargin.replaceAll("\n", "")
    java.nio.file.Files.writeString(inDir.resolve("p1.json"), page)
    val parsed = FoodPipeline.parsePage(Streams.jsonFileSource(spark, inDir.toString))
    val queries = Streams.foodQueryFleet(parsed,
      s"$dir/out", s"$dir/cp", complete = true).map(_.start())
    try {
      queries.foreach(_.processAllAvailable())
      val tables = Seq("nutriscore_counts", "category_counts", "brand_counts",
        "packaging_distribution", "nova_group_classification",
        "top_additive_products", "top_sugary_products_by_category")
      tables.foreach { t =>
        val n = spark.read.parquet(s"$dir/out/$t").count()
        assert(n > 0, s"$t empty")
      }
      // spot-check two ends of the fleet
      assert(rowsOf(spark.read.parquet(s"$dir/out/nutriscore_counts")) ===
        Seq(Seq("A", "1"), Seq("C", "1")))
      val sugary = spark.read.parquet(s"$dir/out/top_sugary_products_by_category")
      assert(sugary.filter(col("main_category") === "drinks")
        .collect()(0).getAs[String]("product_name") === "Cola")
    } finally queries.foreach(_.stop())
  }

  test("append sink: per-batch partitions accumulate with batch_id") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_append").toString
    val in = MemoryStream[(Long, String)]
    val q = Streams.appendParquetSink(
      in.toDF().toDF("id", "tag"), s"$dir/out", s"$dir/cp").start()
    try {
      in.addData((1L, "a")); q.processAllAvailable()
      in.addData((2L, "b")); q.processAllAvailable()
      val log = spark.read.parquet(s"$dir/out")
      assert(log.count() === 2)
      // batch_id is a PARTITION column now — replayed batches overwrite
      // their own partition (idempotent), and readers can prune on it
      assert(log.select("batch_id").distinct().count() === 2)
      val plan = spark.read.parquet(s"$dir/out")
        .filter(col("batch_id") === 1).queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), plan.take(1500))
    } finally q.stop()
  }

  test("Trigger.AvailableNow: catch-up batch over a stream source terminates by itself") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avnow")
    val inDir = dir.resolve("in"); java.nio.file.Files.createDirectory(inDir)
    (1 to 3).foreach { i =>
      java.nio.file.Files.writeString(inDir.resolve(s"f$i.json"),
        s"""{"rows":[{"row":{"nutriscore_grade":"a","categories_tags":[],
           |"nutriments":[],"product_name":[],"packaging_tags":[],
           |"brands_tags":[],"additives_tags":[],"nova_groups_tags":[]}}]}"""
          .stripMargin.replaceAll("\n", ""))
    }
    // the nightly-compaction shape: a batch job that drains whatever
    // the stream source has accumulated, with streaming exactly-once
    // bookkeeping, then exits
    val counts = FoodPipeline.nutriscoreDistribution(
      FoodPipeline.parsePage(Streams.jsonFileSource(spark, inDir.toString)))
    val q = counts.writeStream.format("memory").queryName("avnow_counts")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", dir.resolve("cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query should self-terminate")
    assert(rowsOf(sql("SELECT * FROM avnow_counts")) === Seq(Seq("A", "3")))
  }

  test("RocksDB state store provider sustains a running aggregation") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sc = spark.sqlContext
    try {
      val in = MemoryStream[String]
      def page(grade: String): String =
        s"""{"rows":[{"row":{"nutriscore_grade":"$grade","categories_tags":[],
           |"nutriments":[],"product_name":[],"packaging_tags":[],
           |"brands_tags":[],"additives_tags":[],"nova_groups_tags":[]}}]}"""
          .stripMargin.replaceAll("\n", "")
      val q = FoodPipeline.nutriscoreDistribution(FoodPipeline.parsePage(in.toDF()))
        .writeStream.format("memory").queryName("rocks_counts")
        .outputMode(OutputMode.Complete()).start()
      try {
        in.addData(page("a")); q.processAllAvailable()
        in.addData(page("a")); q.processAllAvailable()
        assert(rowsOf(sql("SELECT * FROM rocks_counts")) === Seq(Seq("A", "2")))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("batch/stream duality: identical results from the same transform over the same data") {
    // stream the events parquet as a file source and run the SAME
    // windowed aggregation the batch oracle query runs — the design
    // spine of the engine (every op is a pure DataFrame => DataFrame)
    // means the two must agree row-for-row
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_duality")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    // driver testdata has shipped ts as int64-nanos AND as timestamp[us]
    // (NTZ) across rounds — mirror Tables.events' type-aware handling
    def normalize(df: org.apache.spark.sql.DataFrame) =
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    val batchDf = normalize(spark.read.parquet(dir.toString))
    val streamDf = normalize(
      spark.readStream.schema(spark.read.parquet(dir.toString).schema)
        .parquet(dir.toString))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("event_count"))
      .select(col("w.start").as("ws"), col("event_type"), col("event_count"))
    val q = agg(streamDf).writeStream.format("memory")
      .queryName("duality").outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000))
    assert(rowsOf(sql("SELECT * FROM duality")) === rowsOf(agg(batchDf)))
  }

  test("curation ingest: PII scrubbed in-stream, split-partitioned layout, batch parity") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_curation")
    val (out, ckpt) = (s"$dir/clean", s"$dir/ckpt")
    val in = MemoryStream[(Long, String)]
    val q = Streams.curationIngest(
      in.toDF().toDF("doc_id", "text"), out, ckpt).start()
    try {
      val rows = (0L until 40L).map(i =>
        (i, s"doc body $i mail bob$i@spam.example.com ip 10.1.$i.9 tail"))
      in.addData(rows: _*)
      q.processAllAvailable()
      val clean = spark.read.parquet(out)
      assert(clean.count() === 40)
      // every planted address is scrubbed
      val texts = clean.select("text").collect().map(_.getString(0))
      assert(texts.forall(t => t.contains("<EMAIL>") && t.contains("<IP>")))
      assert(texts.forall(t => !t.contains("@") && !t.contains("10.1.")))
      // split assignment identical to the batch q77 cut
      import org.apache.spark.sql.functions.col
      val streamed = clean.select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = spark.createDataFrame(rows).toDF("doc_id", "text")
        .select(col("doc_id"), graft.queries.Text.splitLabel(col("doc_id")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed === batch)
      // physical layout prunes by split: split=... directories exist
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).toSet
      assert(dirs.exists(_.startsWith("split=train")), dirs.mkString(","))
      // a split-filtered read prunes partitions at the source
      val plan = spark.read.parquet(out).filter(col("split") === "train")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(split"), plan.take(2000))
    } finally q.stop()
  }

  test("incremental CMS: micro-batch cell sums equal the batch sketch on the union corpus") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_inccms")
    val (cells, ckpt) = (s"$dir/cells", s"$dir/ckpt")
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalCms(
      in.toDF().toDF("doc_id", "text"), cells, ckpt).start()
    try {
      val b0 = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      val b1 = Seq((3L, "alpha delta delta gamma"))
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
      import org.apache.spark.sql.functions._
      val streamed = Streams.cmsSnapshot(spark, cells).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      // batch sketch over the UNION corpus through the same code path
      import spark.implicits._
      val union = (b0 ++ b1).toDF("doc_id", "text")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val batch = graft.queries.Stats.cmsCells(union).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed === batch, "mergeable-cell invariant broken across micro-batches")
      // point estimate: min over rows for 'alpha' >= its true count (3)
      val alphaCells = graft.queries.Stats.cmsCells(
        Seq("alpha").toDF("token")).collect().map(r => (r.getInt(0), r.getLong(1)))
      val est = alphaCells.map(streamed(_)).min
      assert(est >= 3L, s"CMS underestimated: $est < 3")
    } finally q.stop()
  }

  test("incremental mixture weights: sum-merged snapshot equals batch q97 on the union corpus") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_inctok")
    val (toks, ckpt) = (s"$dir/tokens", s"$dir/ckpt")
    val in = MemoryStream[(String, String)]
    val q = Streams.incrementalSourceTokens(
      in.toDF().toDF("source", "text"), toks, ckpt).start()
    // real corpus slices, streamed in thirds: the snapshot must track
    // the exact batch weights over everything ingested so far
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = Streams.mixtureWeightsSnapshot(spark, toks)
    val batch = graft.queries.Text.q97MixtureWeights(
      spark, "/root/testdata/sf0.001")
    assert(rowsOf(streamed) === rowsOf(batch),
      "sum-merged token totals must yield the exact batch mixture")
  }

  test("incremental KMV sketch: merged k-min partials equal the batch kernel") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_inckmv")
    val (sk, ckpt) = (s"$dir/kmv", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.001"
    // poll-safe before first commit (the round-6 advice contract)
    assert(Streams.kmvSnapshot(spark, sk).count() === 0L)
    val in = MemoryStream[(String, Long, String)]
    val q = Streams.incrementalKmv(
      in.toDF().toDF("source", "doc_id", "text"), sk, ckpt).start()
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // each landed batch partition holds ≤k rows per source (the O(k)
    // state claim, checked on disk, not just asserted in prose)
    val perBatch = spark.read.parquet(sk)
      .groupBy(col("source"), col("batch_id")).count().collect()
    assert(perBatch.nonEmpty)
    perBatch.foreach(r => assert(r.getLong(2) <= graft.queries.Stats.KmvK))
    val streamed = Streams.kmvSnapshot(spark, sk)
    val batch = graft.queries.Stats.kmvSketchOf(
      graft.queries.Stats.chunkHashesOf(graft.Tables.documents(spark, sf)))
    assert(rowsOf(streamed) === rowsOf(batch),
      "k-min of merged k-min partials must equal the batch sketch")
  }

  /** Recursive dir copy (crash-state construction for the compaction
    * recovery tests). */
  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src); val d = java.nio.file.Paths.get(dst)
    val walk = java.nio.file.Files.walk(s)
    try walk.forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else { java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t); () }
    } finally walk.close()
  }

  test("compaction before the first commit is a no-op, not an exception") {
    val ghost = java.nio.file.Files.createTempDirectory("graft_ghost")
      .toString + "/never_written"
    Streams.compactMinMergePartials(spark, ghost, Streams.kmvMerge())
    Streams.compactSummedPartials(spark, ghost,
      _.groupBy(col("source")).agg(sum(col("tokens")).as("tokens")))
    assert(!new java.io.File(ghost).exists(),
      "a fold ahead of the monitor's first batch must leave nothing behind")
  }

  test("min-merge compaction folds the KMV log to merged+latest, snapshot unchanged") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_kmvcomp")
    val (sk, ckpt) = (s"$dir/kmv", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.001"
    val in = MemoryStream[(String, Long, String)]
    val q = Streams.incrementalKmv(
      in.toDF().toDF("source", "doc_id", "text"), sk, ckpt).start()
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val before = rowsOf(Streams.kmvSnapshot(spark, sk))
    val latest = spark.read.parquet(sk).agg(max(col("batch_id")))
      .head().get(0).toString.toLong
    // keep one folded batch's raw rows to resurrect after the fold
    val resurrect = spark.read.parquet(sk)
      .filter(col("batch_id") === 0L).drop("batch_id").collect().toSeq
    Streams.compactMinMergePartials(spark, sk, Streams.kmvMerge())
    val partsAfter = spark.read.parquet(sk)
      .select(col("batch_id")).distinct().collect()
      .map(_.get(0).toString.toLong).sorted
    assert(partsAfter === Array(-1L, latest),
      s"expected merged(-1) + latest($latest), got ${partsAfter.mkString(",")}")
    assert(rowsOf(Streams.kmvSnapshot(spark, sk)) === before,
      "compaction must not change the snapshot")
    // idempotent: a second fold finds nothing foldable and no-ops
    Streams.compactMinMergePartials(spark, sk, Streams.kmvMerge())
    assert(rowsOf(Streams.kmvSnapshot(spark, sk)) === before)
    // duplication tolerance — THE property that makes the in-place
    // protocol crash-safe: a folded batch partition that survives a
    // crash alongside its merged copy only duplicates rows the k-min
    // merge collapses
    import spark.implicits._
    resurrect.map(r => (r.getString(0), r.getLong(1))).toDF("source", "h")
      .withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(sk)
    assert(rowsOf(Streams.kmvSnapshot(spark, sk)) === before,
      "a resurrected folded partition must not change the min-merge snapshot")
  }

  test("capped-dedup and overlap logs compact through their family protocols") {
    // claims = min-merge family (in-place: duplication-tolerant),
    // copies = SUM family (stage-and-swap: double-count-unsafe),
    // sketch = min-merge — the round-11 logs ride the SAME protocols
    // their scaladocs claim; snapshots must be fold-transparent
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_capcomp")
    val (claims, copies, ck1) = (s"$dir/claims", s"$dir/copies", s"$dir/c1")
    val (sketch, ck2) = (s"$dir/sketch", s"$dir/c2")
    val sf = "/root/testdata/sf0.001"
    val in = MemoryStream[(Long, String, String)]
    val q1 = Streams.incrementalCappedDedup(
      in.toDF().toDF("doc_id", "source", "text"), claims, copies, ck1).start()
    val in2 = MemoryStream[(String, String)]
    val q2 = Streams.incrementalOverlapSketch(
      in2.toDF().toDF("source", "text"), sketch, ck2).start()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { g =>
        in.addData(g.toSeq: _*); q1.processAllAvailable()
        in2.addData(g.map(d => (d._2, d._3)).toSeq: _*); q2.processAllAvailable()
      }
    } finally { q1.stop(); q2.stop() }
    val capBefore = rowsOf(Streams.cappedDedupSnapshot(spark, claims, copies))
    val ovlBefore = rowsOf(Streams.overlapSnapshot(spark, sketch))
    val cap = graft.queries.Dedup.DupCap
    // keep one folded batch's raw claim rows to resurrect after the fold
    val resurrectClaims = spark.read.parquet(claims)
      .filter(col("batch_id") === 0L).drop("batch_id").collect().toSeq
    Streams.compactMinMergePartials(spark, claims,
      Streams.cappedClaimsMerge(cap))
    Streams.compactSummedPartials(spark, copies,
      _.groupBy(col("source"), col("fp")).agg(sum(col("copies")).as("copies")))
    Streams.compactMinMergePartials(spark, sketch,
      Streams.kmvMerge(graft.queries.Dedup.OverlapK))
    Seq(claims, copies, sketch).foreach { p =>
      val parts = spark.read.parquet(p).select(col("batch_id")).distinct()
        .collect().map(_.get(0).toString.toLong).sorted
      assert(parts.length === 2 && parts.head === -1L,
        s"$p: expected merged(-1) + latest, got ${parts.mkString(",")}")
      // the folded claims hold ≤cap rows per fp; the folded sketch ≤k
      // per source — compaction restores the state bound the scaladocs
      // promise ("folds it back to cap")
    }
    val claimsPerFp = spark.read.parquet(claims)
      .filter(col("batch_id") === -1L)
      .groupBy(col("fp")).count().agg(max(col("count"))).head.getLong(0)
    assert(claimsPerFp <= cap, s"folded claims exceed cap: $claimsPerFp")
    assert(rowsOf(Streams.cappedDedupSnapshot(spark, claims, copies))
      === capBefore, "claims/copies compaction changed the census")
    assert(rowsOf(Streams.overlapSnapshot(spark, sketch)) === ovlBefore,
      "sketch compaction changed the overlap estimates")
    // duplication tolerance for the CLAIMS log — the in-place protocol's
    // crash contract (merged batch_id=-1 written, crash before the folded
    // deletes): a resurrected folded partition re-presents claim rows
    // that also live in the merged copy. cappedClaimsMerge's distinct()
    // must collapse them; without it each duplicate takes a row_number
    // slot and evicts a true bottom-cap survivor, corrupting kept_docs.
    import spark.implicits._
    resurrectClaims
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toDF("fp", "h", "doc_id", "source")
      .withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(claims)
    assert(rowsOf(Streams.cappedDedupSnapshot(spark, claims, copies))
      === capBefore,
      "a resurrected folded claims partition must not change the census")
  }

  test("incremental budget selection: restart + mid-ingest fold, snapshot equals batch q169") {
    val dir = java.nio.file.Files.createTempDirectory("graft_budget")
    val (scored, ckpt, feed) = (s"$dir/scored", s"$dir/ckpt", s"$dir/feed")
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    def run(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id bigint, source string, text string"))
        .option("maxFilesPerTrigger", "1").parquet(feed)
      Streams.incrementalBudgetSelection(stream, scored, ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    // half the corpus in 2 micro-batches, then the stream "dies"
    Streams.orderedChunkFeed(docs.filter(col("doc_id") % 2 === 0),
      feed, 2, col("doc_id"))
    run()
    // keep one folded batch's raw rows to resurrect after the fold
    val resurrect = spark.read.parquet(scored)
      .filter(col("batch_id") === 0L).drop("batch_id").collect().toSeq
    assert(resurrect.nonEmpty, "expected batch 0 rows to resurrect")
    // mid-ingest maintenance: fold the landed partials (in-place
    // protocol — the scored log's distinct merge is duplication-safe)
    Streams.compactMinMergePartials(spark, scored, Streams.budgetScoredMerge)
    // resume FROM THE SAME CHECKPOINT with the second half appended
    Streams.orderedChunkFeed(docs.filter(col("doc_id") % 2 === 1),
      feed, 2, col("doc_id"))
    run()
    val batch = rowsOf(graft.queries.Selection.q169TokenBudget(spark, sf))
    assert(rowsOf(Streams.budgetSnapshot(spark, scored)) === batch,
      "streamed-ingest budget census must equal batch q169 after restart + fold")
    // duplication tolerance (the in-place fold's crash contract): a
    // folded batch partition resurrected next to its merged copy must
    // not change the census — budgetScoredMerge/budgetSnapshot distinct
    import spark.implicits._
    resurrect
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toDF("doc_id", "source", "t", "r")
      .withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(scored)
    assert(rowsOf(Streams.budgetSnapshot(spark, scored)) === batch,
      "a resurrected folded scored partition must not change the census")
  }

  test("incremental frontier: cross-batch dominance, split twins, fold + resurrect") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_frontier")
    val (front, ckpt) = (s"$dir/frontier", s"$dir/ckpt")
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.incrementalFrontier(
      in.toDF().toDF("doc_id", "source", "text"), front, ckpt).start()
    try {
      // batch 0: doc 1 (t=2, r=1000) dominates doc 2 (t=2, r=500)
      // in-batch — only doc 1's row may land
      in.addData((1L, "s", "a b"), (2L, "s", "x x"))
      q.processAllAvailable()
      // batch 1: doc 3 (t=3, r=1000) dominates batch 0's survivor
      // ACROSS the batch boundary (longer at equal ratio)
      in.addData((3L, "s", "a b c"))
      q.processAllAvailable()
      // batch 2: doc 4 is doc 3's exact (t, r) TWIN from another batch
      // — twins are mutually non-dominated, both must survive
      in.addData((4L, "t", "p q r"))
      q.processAllAvailable()
    } finally q.stop()
    val landed0 = spark.read.parquet(front).filter(col("batch_id") === 0L)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(landed0 === Array(1L),
      "batch 0 must land ONLY its own skyline (doc 2 is dominated in-batch)")
    def snap() = rowsOf(Streams.frontierSnapshot(spark, front))
    val expect = Seq(Seq("3", "s", "3", "1000"), Seq("4", "t", "3", "1000"))
    assert(snap() === expect,
      "snapshot must drop the batch-0 survivor to the batch-1 dominator and keep both twins")
    // fold (distinct-then-skyline merge), then resurrect the folded
    // batch-0 partition — the crash contract of the in-place protocol
    val resurrect = spark.read.parquet(front)
      .filter(col("batch_id") === 0L).drop("batch_id").collect().toSeq
    Streams.compactMinMergePartials(spark, front, Streams.frontierMerge)
    assert(snap() === expect, "fold must be snapshot-transparent")
    import spark.implicits._
    resurrect
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toDF("doc_id", "source", "t", "r")
      .withColumn("batch_id", lit(0L))
      .write.mode("append").partitionBy("batch_id").parquet(front)
    assert(snap() === expect,
      "a resurrected folded frontier partition must not change the skyline")
  }

  test("summed compaction: atomic swap preserves totals; recovery handles both crash points") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sumcomp")
    val (toks, ckpt) = (s"$dir/tokens", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.001"
    val in = MemoryStream[(String, String)]
    val q = Streams.incrementalSourceTokens(
      in.toDF().toDF("source", "text"), toks, ckpt).start()
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    try {
      docs.grouped(math.max(1, docs.length / 4)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val before = rowsOf(Streams.mixtureWeightsSnapshot(spark, toks))
    val latest = spark.read.parquet(toks).agg(max(col("batch_id")))
      .head().get(0).toString.toLong
    def sumMerge(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("source")).agg(sum(col("tokens")).as("tokens"))
    Streams.compactSummedPartials(spark, toks, sumMerge)
    val partsAfter = spark.read.parquet(toks)
      .select(col("batch_id")).distinct().collect()
      .map(_.get(0).toString.toLong).sorted
    assert(partsAfter === Array(-1L, latest))
    assert(rowsOf(Streams.mixtureWeightsSnapshot(spark, toks)) === before,
      "the swap must preserve summed totals exactly")
    // no commit debris
    assert(!new java.io.File(toks + ".graft_compact_stage").exists())
    assert(!new java.io.File(toks + ".graft_compact_old").exists())
    // idempotent second fold
    Streams.compactSummedPartials(spark, toks, sumMerge)
    assert(rowsOf(Streams.mixtureWeightsSnapshot(spark, toks)) === before)

    // crash point A — between the two commit renames (stage is
    // complete and marked): the snapshot path must roll FORWARD
    val logA = s"$dir/tokensA"
    copyDir(toks, logA)
    copyDir(logA, logA + ".graft_compact_stage")
    new java.io.File(logA + ".graft_compact_stage/_GRAFT_STAGE_COMPLETE")
      .createNewFile()
    assert(new java.io.File(logA).renameTo(
      new java.io.File(logA + ".graft_compact_old")))
    assert(rowsOf(Streams.mixtureWeightsSnapshot(spark, logA)) === before,
      "a mid-swap crash with a completed stage must roll forward")
    assert(new java.io.File(logA).exists())
    assert(!new java.io.File(logA + ".graft_compact_old").exists())

    // crash point B — stage NOT complete (no marker): roll BACK to the
    // raw log; the half-written stage is swept
    val logB = s"$dir/tokensB"
    copyDir(toks, logB)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(logB + ".graft_compact_stage/batch_id=-1"))
    assert(new java.io.File(logB).renameTo(
      new java.io.File(logB + ".graft_compact_old")))
    assert(rowsOf(Streams.mixtureWeightsSnapshot(spark, logB)) === before,
      "a crash before the stage completed must roll back to the raw log")
    assert(new java.io.File(logB).exists())
    assert(!new java.io.File(logB + ".graft_compact_stage").exists())
  }

  test("incremental centroids: vector-SUM partials reproduce the batch q110 matrix") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_inccent")
    val (cent, ckpt) = (s"$dir/cent", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.001"
    assert(Streams.centroidSnapshot(spark, cent).count() === 0L) // poll-safe
    val in = MemoryStream[(Int, Seq[Float])]
    val q = Streams.incrementalCentroids(
      in.toDF().toDF("label", "embedding"), cent, ckpt).start()
    val embs = graft.Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    try {
      embs.grouped(math.max(1, embs.length / 3)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val batch = rowsOf(graft.queries.Similarity.q110LabelCentroidSim(spark, sf))
    assert(rowsOf(Streams.centroidSnapshot(spark, cent)) === batch,
      "merged running-mean partials must reproduce the batch matrix")
    // the vector-state log folds with the SUM-family swap compactor
    Streams.compactSummedPartials(spark, cent,
      _.groupBy(col("label"), col("pos"))
        .agg(sum(col("s")).as("s"), sum(col("n")).as("n")))
    assert(rowsOf(Streams.centroidSnapshot(spark, cent)) === batch,
      "compaction must preserve the centroid matrix")
  }

  test("incremental chi-square cells: summed partials equal the batch census") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incchi")
    val (cells, ckpt) = (s"$dir/cells", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.001"
    assert(Streams.chi2Snapshot(spark, cells).count() === 0L) // poll-safe
    val in = MemoryStream[(Timestamp, String)]
    val q = Streams.incrementalDayTypeCells(
      in.toDF().toDF("ts", "event_type"), cells, ckpt).start()
    val events = graft.Tables.events(spark, sf)
      .select(col("ts").cast("timestamp_ltz"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)))
    try {
      events.grouped(math.max(1, events.length / 3)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = rowsOf(Streams.chi2Snapshot(spark, cells))
    val batch = rowsOf(graft.queries.Events.q145Chi2DailyMix(spark, sf))
    assert(streamed === batch,
      "summed contingency partials must reproduce the batch χ² exactly")
  }

  test("incremental centroids survive a restart: offsets resume, matrix equals batch") {
    // 6th member of the restart family (KMV=k-min, segments=min,
    // chi2=sum, ANN=index, quantiles=bottom-k — and now the
    // vector-SUM member): a lost offset would re-land half0's Σ/n and
    // DOUBLE-COUNT the centroids, so offsets-resumed is the sharp half
    // of this assertion
    val dir = java.nio.file.Files.createTempDirectory("graft_centrec")
    val (cent, cp) = (s"$dir/cent", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val embs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      embs.filter(col("vec_id") % 2 === half).coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalCentroids(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id bigint, label int, embedding array<float>"))
        .parquet(in.toString), cent, cp).start()
    land(0)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    land(1) // arrives while the monitor is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(cent)
      .select(col("batch_id")).distinct().count()
    assert(batches === 2, s"expected 2 batch partitions, got $batches")
    assert(rowsOf(Streams.centroidSnapshot(spark, cent)) ===
      rowsOf(graft.queries.Similarity.q110LabelCentroidSim(spark, sf)),
      "post-restart matrix must equal the batch q110 matrix")
  }

  test("incremental snapshot diff survives a restart; duplicate manifest rows are harmless") {
    import graft.queries.PipelineQ
    val dir = java.nio.file.Files.createTempDirectory("graft_diffrec")
    val (man, cp) = (s"$dir/manifest", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val bDocs = PipelineQ.snapshotBDocs(spark, sf)
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      bDocs.filter(col("doc_id") % 2 === half).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.appendParquetSink(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id bigint, source string, text string"))
        .parquet(in.toString)
        .select(col("doc_id"), col("source"),
          graft.ops.TextOps.fingerprint(col("text")).as("fp")),
      man, cp).start()
    land(0)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    land(1) // the second crawl shard arrives while the monitor is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(man)
      .select(col("batch_id")).distinct().count()
    assert(batches === 2, s"expected 2 batch partitions, got $batches")
    def snap(): Seq[Seq[String]] = rowsOf(PipelineQ.diffCensus(
      PipelineQ.snapshotAManifest(spark, sf),
      spark.read.parquet(man)
        .select(col("doc_id"), col("source").as("source_b"),
          col("fp").as("fp_b")).distinct()))
    val expect = rowsOf(PipelineQ.q197SnapshotDiff(spark, sf))
    assert(snap() === expect,
      "post-restart diff must equal the batch q197 census")
    // duplication tolerance: a resurrected copy of a landed partition
    // (the fold-crash shape) must not shift any census cell
    val b0 = spark.read.parquet(man).filter(col("batch_id") === 0L)
      .select(col("doc_id"), col("source"), col("fp"))
    b0.withColumn("batch_id", lit(7L))
      .write.mode("append").partitionBy("batch_id").parquet(man)
    assert(snap() === expect,
      "a duplicated manifest partition must be invisible to the diff")
  }

  test("incremental integrity roots survive a restart: partials merge to the batch roots") {
    import graft.queries.PipelineQ
    val dir = java.nio.file.Files.createTempDirectory("graft_rootsrec")
    val (roots, cp) = (s"$dir/roots", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      docs.filter(col("doc_id") % 2 === half).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalIntegrityRoots(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "source string, doc_id bigint, text string"))
        .parquet(in.toString), roots, cp).start()
    land(0)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    land(1) // the second crawl shard arrives while the monitor is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(roots)
      .select(col("batch_id")).distinct().count()
    assert(batches === 2, s"expected 2 batch partitions, got $batches")
    assert(rowsOf(Streams.integrityRootsSnapshot(spark, roots)) ===
      rowsOf(PipelineQ.q200IntegrityRoots(spark, sf)),
      "post-restart roots must equal the one-shot batch scan")
  }

  test("incremental expectations survive a restart: re-summed partials equal the batch census") {
    import graft.queries.Relational
    val dir = java.nio.file.Files.createTempDirectory("graft_exprec")
    val (checks, cp) = (s"$dir/checks", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"))
    val active = graft.Tables.customer(spark, sf)
      .filter(col("c_acctbal") >= 0)
      .select(col("c_custkey").as("pk")).distinct()
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      ev.filter(col("user_id") % 2 === half).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalExpectations(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "user_id bigint, event_type string, value double"))
        .parquet(in.toString)
        .join(broadcast(active), col("user_id") === col("pk"), "left"),
      checks, cp).start()
    land(0)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    land(1) // arrives while the gate is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(checks)
      .select(col("batch_id")).distinct().count()
    assert(batches === 2, s"expected 2 batch partitions, got $batches")
    val want = rowsOf(Relational.expectationPartials(
        ev.join(broadcast(active), col("user_id") === col("pk"), "left"))
      .groupBy(col("check_name"))
      .agg(sum(col("rows")).as("rows_checked"),
        sum(col("violations")).as("violations"),
        countDistinct(col("key")).as("distinct_keys")))
    assert(rowsOf(Streams.expectationsSnapshot(spark, checks)) === want,
      "post-restart census must equal the whole-feed batch gate")
  }

  test("incremental z-order: landed index census equals batch q72; readers prune by zdir") {
    import graft.queries.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft_zorderrec")
    val (idx, cp) = (s"$dir/index", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val facts = Layout.dayAndCust(spark, sf)
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      facts.filter(col("o_custkey") % 2 === half).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalZorder(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "day bigint, o_custkey bigint"))
        .parquet(in.toString), idx, cp).start()
    land(0)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    land(1) // arrives while the maintainer is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rowsOf(Streams.zorderSnapshot(spark, idx)) ===
      rowsOf(Layout.q72ZorderCensus(spark, sf)),
      "the landed curve index must census exactly like the batch table")
    // THE claim: the landed layout is queryable with directory pruning
    // — a zdir predicate reaches PartitionFilters, so a curve-range
    // scan lists only its own directories
    // plain read: partition discovery types zdir as int — take it as-is
    val zdir = spark.read.parquet(idx).select(col("zdir"))
      .agg(min(col("zdir"))).head.get(0)
    val plan = spark.read.parquet(idx).filter(col("zdir") === zdir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(zdir"),
      plan.take(1500))
  }

  test("dataset-card snapshot before any commit is ZERO rows, never a null card") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cardempty")
    val sf = "/root/testdata/sf0.001"
    val card = Streams.datasetCardSnapshot(spark, dir.toString,
      graft.Tables.documents(spark, sf))
    assert(card.count() === 0L,
      "a poller mid-startup must read 'no data yet', not an all-null row")
    // schema is the real card's, so a consumer's projection still binds
    assert(card.columns.contains("exact_dup_ppm"))
  }

  test("benchmark driver pulls refuse past the plan-literal bound") {
    val sf = "/root/testdata/sf0.001"
    intercept[IllegalArgumentException] {
      graft.queries.Text.benchShingleArray(spark, sf,
        maxBroadcastShingles = 1L)
    }
    intercept[IllegalArgumentException] {
      graft.queries.PipelineQ.gateBenchArray(spark, sf,
        maxBroadcastShingles = 1L)
    }
    // under the bound both pulls succeed and stay benchmark-sized
    assert(graft.queries.Text.benchShingleArray(spark, sf).nonEmpty)
  }

  test("incremental KMV survives a restart: offsets resume, snapshot equals batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kmvrec")
    val (sk, cp) = (s"$dir/kmv", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    // land a deterministic half of the corpus as one parquet file
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      docs.filter(col("doc_id") % 2 === half).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalKmv(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "source string, doc_id bigint, text string"))
        .parquet(in.toString), sk, cp).start()
    land(0)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // the second half arrives while the monitor is DOWN
    land(1)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // restart resumed from checkpointed offsets: half0 was not
    // re-ingested as a new batch — exactly one landed partition per half
    val batches = spark.read.parquet(sk)
      .select(col("batch_id")).distinct().count()
    assert(batches === 2, s"expected 2 batch partitions, got $batches")
    val streamed = rowsOf(Streams.kmvSnapshot(spark, sk))
    val batch = rowsOf(graft.queries.Stats.kmvSketchOf(
      graft.queries.Stats.chunkHashesOf(docs)))
    assert(streamed === batch,
      "post-restart snapshot must equal the batch sketch over the union")
  }

  test("incremental capped dedup: merged bottom-cap claims equal the batch census") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_inccap")
    val (claims, copies, ckpt) = (s"$dir/claims", s"$dir/copies", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.001"
    assert(Streams.cappedDedupSnapshot(spark, claims, copies).count() === 0L)
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.incrementalCappedDedup(
      in.toDF().toDF("doc_id", "source", "text"), claims, copies, ckpt).start()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    try {
      // stream in REVERSE doc_id thirds: many of a fingerprint's
      // cap-survivors (smallest row hashes) arrive in LATE batches —
      // bottom-cap-of-union must still elect exactly them
      docs.sortBy(-_._1).grouped(math.max(1, docs.length / 3)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = rowsOf(Streams.cappedDedupSnapshot(spark, claims, copies))
    val batch = rowsOf(graft.queries.Dedup.q172CappedDedup(spark, sf))
    assert(streamed === batch,
      "merged capped claims + summed copies must reproduce the batch census")
    // the claims log never exceeds cap rows per (fp, batch)
    val overCap = spark.read.parquet(claims)
      .groupBy(col("fp"), col("batch_id")).count()
      .filter(col("count") > graft.queries.Dedup.DupCap).count()
    assert(overCap === 0L, "a batch landed more than cap claims for one fp")
  }

  test("incremental overlap sketches: merged k-mins reproduce the batch estimator") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incovl")
    val (sketch, ckpt) = (s"$dir/sketch", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.01" // saturates sketches (QueriesSpec pin)
    assert(Streams.overlapSnapshot(spark, sketch).count() === 0L)
    val in = MemoryStream[(String, String)]
    val q = Streams.incrementalOverlapSketch(
      in.toDF().toDF("source", "text"), sketch, ckpt).start()
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    try {
      // REVERSE order: most sources' true bottom-k hashes arrive
      // spread across late batches — k-min-of-union must elect them
      docs.reverse.grouped(math.max(1, docs.length / 3)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = rowsOf(Streams.overlapSnapshot(spark, sketch))
    val batch = rowsOf(graft.queries.Dedup.q171SketchOverlap(spark, sf)
      .select(col("src_a"), col("src_b"),
        col("est_common"), col("est_union")))
    assert(streamed === batch,
      "merged k-min sketches must reproduce the batch estimates")
    // the landed log obeys the state bound: ≤ k rows per (source, batch)
    val overK = spark.read.parquet(sketch)
      .groupBy(col("source"), col("batch_id")).count()
      .filter(col("count") > graft.queries.Dedup.OverlapK).count()
    assert(overK === 0L, "a batch landed more than k sketch rows for one source")
  }

  test("incremental capped dedup survives a restart: replay cannot double copies or claims") {
    // bottom-cap is min-merge-family (idempotent under re-landing);
    // the copies log is SUM-merge — the side a lost offset would
    // corrupt. Kill between halves, resume, snapshot == batch census.
    val dir = java.nio.file.Files.createTempDirectory("graft_caprec")
    val (claims, copies, cp) = (s"$dir/claims", s"$dir/copies", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      // REVERSED halves: low-doc_id survivors arrive after the restart
      docs.filter(col("doc_id") % 2 === (1 - half)).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalCappedDedup(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id bigint, source string, text string"))
        .parquet(in.toString), claims, copies, cp).start()
    land(0)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    land(1)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(copies)
      .select(col("batch_id")).distinct().count()
    assert(batches === 2,
      s"expected 2 landed partitions (offsets resumed), got $batches")
    val streamed = rowsOf(Streams.cappedDedupSnapshot(spark, claims, copies))
    val batch = rowsOf(graft.queries.Dedup.q172CappedDedup(spark, sf))
    assert(streamed === batch,
      "post-restart merged claims must equal the batch census")
  }

  test("incremental quantile sample survives a restart: snapshot equals batch q155") {
    // the 5th member of the restart family (KMV=k-min, segments=min,
    // chi2=sum, ANN=index pairing): a lost offset would re-land
    // half0's bottom-k partials — harmless to the min-merge values but
    // a duplicated (h, v) partial row changes nothing ONLY because the
    // kernel collapses pairs; the sharp assertion is offsets resumed +
    // snapshot == batch census bit-for-bit
    val dir = java.nio.file.Files.createTempDirectory("graft_qtlrec")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"))
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      docs.filter(col("doc_id") % 2 === half).coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalQuantileSample(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "source string, doc_id bigint, n_chars bigint"))
        .parquet(in.toString),
      s"$dir/sample", s"$dir/ckpt", graft.queries.Stats.QuantileRegK).start()
    land(0)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    land(1) // arrives while the monitor is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(s"$dir/sample")
      .select(col("batch_id")).distinct().count()
    assert(batches === 2,
      s"expected 2 landed partitions (offsets resumed), got $batches")
    val exact = graft.queries.Stats.exactMedianOf(
      graft.Tables.documents(spark, sf))
    val streamed = rowsOf(Streams.quantileSnapshot(spark, s"$dir/sample",
      exact, graft.queries.Stats.QuantileRegK))
    val batch = rowsOf(graft.queries.Stats.q155SampledQuantiles(spark, sf))
    assert(streamed === batch,
      "post-restart merged bottom-k partials must equal the batch census")
  }

  test("incremental ANN index survives a restart: offsets resume, pairs equal batch q31") {
    // completes the restart-proof family (KMV=k-min, segments=min,
    // chi2=sum): the ANN index's cross-batch pairing reads its own
    // landed history — a lost offset would re-land half0 under a new
    // batch_id AND re-pair it against itself; the pairs distinct()
    // hides duplicate pairs but not self-matches, so equality with the
    // batch q31 set is the sharp assertion.
    val dir = java.nio.file.Files.createTempDirectory("graft_annrec")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      emb.filter(col("vec_id") % 2 === half).coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalAnnNearDups(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id bigint, v array<double>"))
        .parquet(in.toString),
      s"$dir/index", s"$dir/pairs", s"$dir/ckpt").start()
    land(0)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    land(1) // arrives while the ingest is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(s"$dir/index")
      .select(col("batch_id")).distinct().count()
    assert(batches === 2,
      s"expected 2 landed index partitions (offsets resumed), got $batches")
    val streamed = spark.read.parquet(s"$dir/pairs")
      .select("bucket", "vec_a", "vec_b", "cos_sim").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = graft.queries.Similarity.q31EmbeddingNearDups(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch,
      "post-restart pairs must equal the batch q31 near-dup set")
    assert(batch.nonEmpty)
  }

  test("incremental segment dedup survives a restart: a replayed batch cannot steal a claim") {
    // the min-merge family's kill/restart proof (round-7/8 verdict #4):
    // min-merge is exactly where an offset regression would corrupt —
    // a re-ingested batch landing under a NEW batch_id would still
    // min-merge to the same claims (idempotent values), but a lost
    // offset re-counting doc totals would double the SUM side. The
    // restart must resume offsets (one landed partition per half) and
    // the snapshot must equal the batch census over the union.
    val dir = java.nio.file.Files.createTempDirectory("graft_segrec")
    val (claims, docsP, cp) = (s"$dir/claims", s"$dir/docs", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      // REVERSED halves: the globally-first claimant of shared
      // fingerprints (lowest doc_id) arrives in the SECOND run, after
      // the restart — the merged index must still hand it the claim
      docs.filter(col("doc_id") % 2 === (1 - half)).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalSegmentDedup(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "source string, doc_id bigint, text string"))
        .parquet(in.toString), claims, docsP, cp).start()
    land(0)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    land(1) // the second half arrives while the monitor is DOWN
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(docsP)
      .select(col("batch_id")).distinct().count()
    assert(batches === 2,
      s"expected 2 landed partitions (offsets resumed), got $batches")
    val streamed = rowsOf(Streams.segmentDedupSnapshot(spark, claims, docsP))
    val batch = rowsOf(graft.queries.Dedup.q134SegmentDedup(spark, sf))
    assert(streamed === batch,
      "post-restart min-merged claims must equal the batch census")
  }

  test("incremental chi-square cells survive a restart: snapshot equals batch after resume") {
    // the contingency (sum-merge) family's kill/restart proof: a lost
    // offset would re-land half0's cells and every o doubles
    val dir = java.nio.file.Files.createTempDirectory("graft_chi2rec")
    val (cells, cp) = (s"$dir/cells", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("event_id"))
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      events.filter(col("event_id") % 2 === half).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalDayTypeCells(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "ts timestamp_ntz, event_type string, event_id bigint"))
        .parquet(in.toString), cells, cp).start()
    land(0)
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    land(1)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val batches = spark.read.parquet(cells)
      .select(col("batch_id")).distinct().count()
    assert(batches === 2,
      s"expected 2 landed partitions (offsets resumed), got $batches")
    val streamed = rowsOf(Streams.chi2Snapshot(spark, cells))
    val batch = rowsOf(graft.queries.Events.q145Chi2DailyMix(spark, sf))
    assert(streamed === batch,
      "post-restart summed cells must reproduce the batch χ² exactly")
  }

  test("incremental segment dedup: merged first-claims equal the batch census; replay can't steal a claim") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incseg")
    val (claims, docsP, ckpt) = (s"$dir/claims", s"$dir/docs", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.001"
    assert(Streams.segmentDedupSnapshot(spark, claims, docsP).count() === 0L)
    val in = MemoryStream[(String, Long, String)]
    val q = Streams.incrementalSegmentDedup(
      in.toDF().toDF("source", "doc_id", "text"), claims, docsP, ckpt).start()
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    try {
      // stream in REVERSE doc_id thirds: the globally-first claimant
      // of many fingerprints arrives LAST — min-merge must still hand
      // it the claim (arrival order is irrelevant to first-claim)
      docs.sortBy(-_._2).grouped(math.max(1, docs.length / 3)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = rowsOf(Streams.segmentDedupSnapshot(spark, claims, docsP))
    val batch = rowsOf(graft.queries.Dedup.q134SegmentDedup(spark, sf))
    assert(streamed === batch,
      "min-merged claims + summed totals must reproduce the batch census")
  }

  test("incremental OOV monitor: summed partials equal batch oovStats; planted drift fires") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incoov")
    val (stats, ckpt) = (s"$dir/stats", s"$dir/ckpt")
    val sf = "/root/testdata/sf0.001"
    val vocab = graft.queries.Text.trainVocab(spark, sf)
    val in = MemoryStream[(String, String)]
    val q = Streams.incrementalOovStats(
      in.toDF().toDF("source", "text"), vocab, stats, ckpt).start()
    // real non-train docs in two batches, plus a planted drifting feed
    // whose tokens are guaranteed out-of-vocabulary
    val docs = graft.Tables.documents(spark, sf)
      .filter(graft.queries.Text.splitLabel(col("doc_id")) =!= "train")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val drifted = ("feedX", "zz1 zz2 zz3 zz1 the")
    try {
      docs.grouped(math.max(1, docs.length / 2)).foreach { g =>
        in.addData(g.toSeq: _*); q.processAllAvailable()
      }
      in.addData(drifted); q.processAllAvailable()
    } finally q.stop()
    val streamed = Streams.oovRateSnapshot(spark, stats)
    import spark.implicits._
    val batch = graft.queries.Text.oovStats(
      (docs :+ drifted).toSeq.toDF("source", "text"), vocab)
      .withColumn("oov_ppm", expr("oov * 1000000 div tokens"))
    assert(rowsOf(streamed) === rowsOf(batch),
      "sum-merged OOV partials must equal the batch census on the union")
    val x = streamed.filter(col("source") === "feedX").collect()(0)
    assert(x.getAs[Long]("oov") === 4L && x.getAs[Long]("tokens") === 5L,
      s"planted drift feed must read 4/5 OOV, got $x")
  }

  test("incremental source signatures: min-merged snapshot equals batch signatures on the union") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incsig")
    val (sigs, ckpt) = (s"$dir/sigs", s"$dir/ckpt")
    val in = MemoryStream[(String, String)]
    val q = Streams.incrementalSourceSignatures(
      in.toDF().toDF("source", "text"), sigs, ckpt).start()
    try {
      val b0 = Seq(("feedA", "the quick brown fox jumps over it"),
        ("feedB", "a slow green turtle walks under it"))
      val b1 = Seq(("feedA", "the quick brown fox naps all day long"),
        ("feedC", "the quick brown fox jumps over it"))
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
      val streamed = Streams.sourceSignatureSnapshot(spark, sigs).collect()
        .map(r => r.getString(0) -> (1 to graft.queries.Dedup.SourceMinHashes)
          .map(r.getLong)).toMap
      import spark.implicits._
      val batch = graft.queries.Dedup.sourceSignatures(
        (b0 ++ b1).toDF("source", "text")).collect()
        .map(r => r.getString(0) -> (1 to graft.queries.Dedup.SourceMinHashes)
          .map(r.getLong)).toMap
      assert(streamed === batch, "min-merge across batches drifted from the union batch")
      // feedC replays feedA's first doc verbatim: identical signature
      assert(streamed("feedC") === graft.queries.Dedup.sourceSignatures(
        b0.take(1).toDF("source", "text")).collect()
        .map(r => (1 to graft.queries.Dedup.SourceMinHashes).map(r.getLong)).head)
    } finally q.stop()
  }

  test("incremental LSH dedup: cross-batch candidates surface, index append is idempotent") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup")
    val (index, pairs, ckpt) =
      (s"$dir/index", s"$dir/pairs", s"$dir/ckpt")
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalLshDedup(
      in.toDF().toDF("doc_id", "text"), index, pairs, ckpt).start()
    try {
      val doc = "the quick brown fox jumps over the lazy dog again and again"
      // batch 0: two identical docs -> within-batch candidate
      in.addData((1L, doc), (2L, doc))
      q.processAllAvailable()
      val b0 = spark.read.parquet(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b0.contains((1L, 2L)))
      // batch 1: a third copy -> candidates against BOTH history docs
      in.addData((3L, doc))
      q.processAllAvailable()
      val all = spark.read.parquet(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all.contains((1L, 3L)) && all.contains((2L, 3L)))
      // index holds 4 band rows per doc per batch, batch-partitioned
      val idx = spark.read.parquet(index)
      assert(idx.count() === 3 * 4)
      assert(idx.select("batch_id").distinct().count() === 2)
    } finally q.stop()
  }

  test("incremental dedup duality: streamed pairs log equals the batch candidate set") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup_dual")
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalLshDedup(
      in.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/pairs", s"$dir/ckpt")
      .start()
    // a corpus with near-dups spread ACROSS batch boundaries
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "spark engines shuffle data between partitioned executors",
      4L -> "the quick brown fox jumps over the lazy dog tonight",
      5L -> "spark engines shuffle data between partitioned executors",
      6L -> "completely different text with no overlap at all here")
    try {
      docs.grouped(2).foreach { g => in.addData(g: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/pairs")
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    import spark.implicits._
    val batchDocs = docs.toDF("doc_id", "text")
    val sigs = graft.queries.Dedup.bandedSignatures(batchDocs)
    val batchPairs = sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batchPairs,
      "incremental ingest must find exactly the batch pipeline's LSH candidates")
    assert(batchPairs.nonEmpty)
  }

  test("incremental LSH index: per-batch history read prunes on band partitions") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup_prune")
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalLshDedup(
      in.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/pairs", s"$dir/ckpt")
      .start()
    try {
      in.addData((1L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      in.addData((2L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
    } finally q.stop()
    // the EXACT read the ingest path performs per batch: bands touched
    // by the batch + exclusion of its own batch_id, BOTH as partition
    // filters — nothing outside those partitions is scanned
    val hist = Streams.lshIndexHistory(spark, s"$dir/index", Seq(0, 1), 1L)
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    val pf = plan.substring(plan.indexOf("PartitionFilters: ["))
    assert(pf.takeWhile(_ != ']').contains("band#"),
      s"band must be a partition filter, got: ${pf.take(300)}")
    assert(pf.takeWhile(_ != ']').contains("batch_id#"),
      s"batch_id must be a partition filter, got: ${pf.take(300)}")
    // PushedFilters on data columns must NOT carry band (it is a
    // directory, not a column, in this layout)
    assert(hist.collect().forall(_.getAs[Long]("doc_id") == 1L))
  }

  test("incremental LSH index compaction folds old batches; candidates unchanged") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incdedup_compact")
    val (index, pairs) = (s"$dir/index", s"$dir/pairs")
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "spark engines shuffle data between partitioned executors",
      4L -> "the quick brown fox jumps over the lazy dog tonight",
      5L -> "spark engines shuffle data between partitioned executors",
      6L -> "completely different text with no overlap at all here")
    // ONE query lineage throughout: compaction runs while the ingest
    // query is paused and it resumes from the SAME checkpoint — batch
    // ids keep advancing, which is what replay-idempotence is keyed on
    val in = MemoryStream[(Long, String)]
    def start() = Streams.incrementalLshDedup(
      in.toDF().toDF("doc_id", "text"), index, pairs, s"$dir/ckpt").start()
    val q1 = start()
    try docs.take(4).grouped(2).foreach { g => in.addData(g: _*); q1.processAllAvailable() }
    finally q1.stop() // batches 0, 1 ingested
    Streams.compactLshIndex(spark, index)   // folds batch 0 into -1; keeps 1
    val afterFold = spark.read.parquet(index)
    assert(afterFold.select("batch_id").distinct().collect()
      .map(_.get(0).toString.toLong).sorted.toSeq === Seq(-1L, 1L))
    Streams.compactLshIndex(spark, index)   // idempotent: nothing left to fold
    assert(spark.read.parquet(index).count() === afterFold.count())
    // ingest resumes against the compacted index
    val q2 = start()
    try { in.addData(docs.drop(4): _*); q2.processAllAvailable() }
    finally q2.stop()
    val streamed = spark.read.parquet(pairs)
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = graft.queries.Dedup.bandedSignatures(docs.toDF("doc_id", "text"))
    val batchPairs = sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batchPairs, "compaction must not change the candidate set")
    assert(batchPairs.nonEmpty)
  }

  test("incremental ANN duality: streamed near-dup pairs equal batch q31 on the union corpus") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incann")
    val sf = "/root/testdata/sf0.001"
    // the REAL embeddings table, streamed in batches of ~100 vectors
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val in = MemoryStream[(Long, Seq[Double])]
    def start() = Streams.incrementalAnnNearDups(
      in.toDF().toDF("vec_id", "v"), s"$dir/index", s"$dir/pairs", s"$dir/ckpt")
      .start()
    val q1 = start()
    try corpus.take(300).grouped(100).foreach { g => in.addData(g: _*); q1.processAllAvailable() }
    finally q1.stop()
    // compaction between ingest sessions (same generic fold, bucket layout)
    Streams.compactLshIndex(spark, s"$dir/index", bandCols = Seq("bucket_grp"))
    val q2 = start()
    try corpus.drop(300).grouped(100).foreach { g => in.addData(g: _*); q2.processAllAvailable() }
    finally q2.stop()
    val streamed = spark.read.parquet(s"$dir/pairs")
      .select("bucket", "vec_a", "vec_b", "cos_sim").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = graft.queries.Similarity.q31EmbeddingNearDups(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed === batch,
      "incremental ANN ingest must find exactly the batch q31 near-dup set")
    assert(batch.nonEmpty)
  }

  test("incremental ANN index: per-batch history read prunes on bucket partitions") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incann_prune")
    val in = MemoryStream[(Long, Seq[Double])]
    val q = Streams.incrementalAnnNearDups(
      in.toDF().toDF("vec_id", "v"), s"$dir/index", s"$dir/pairs", s"$dir/ckpt")
      .start()
    try {
      in.addData((1L, Seq(1.0, 0.5, -0.25, 0.125)))
      q.processAllAvailable()
      in.addData((2L, Seq(1.0, 0.5, -0.25, 0.125)))
      q.processAllAvailable()
    } finally q.stop()
    val hist = Streams.annIndexHistory(spark, s"$dir/index", Seq(0L, 7L), 1L)
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    val pf = plan.substring(plan.indexOf("PartitionFilters: ["))
    assert(pf.takeWhile(_ != ']').contains("bucket_grp#"),
      s"bucket_grp must be a partition filter, got: ${pf.take(300)}")
    assert(pf.takeWhile(_ != ']').contains("batch_id#"),
      s"batch_id must be a partition filter, got: ${pf.take(300)}")
    // the exact bucket set prunes as a PUSHED data filter inside the
    // group partitions (row-group min/max stats)
    assert(plan.contains("PushedFilters: ") &&
      plan.substring(plan.indexOf("PushedFilters: ")).takeWhile(_ != ']')
        .contains("bucket"),
      s"bucket must reach the scan as a pushed filter")
    assert(spark.read.parquet(s"$dir/pairs").select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)),
      "identical vector ingested later must pair with its history copy")
  }

  test("ANN serving: read prunes to probe buckets; serve over the landed index equals the fresh multiprobe search") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_annserve")
    val sf = "/root/testdata/sf0.001"
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val in = MemoryStream[(Long, Seq[Double])]
    val q = Streams.incrementalAnnNearDups(
      in.toDF().toDF("vec_id", "v"), s"$dir/index", s"$dir/pairs", s"$dir/ckpt")
      .start()
    try corpus.grouped(300).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
    finally q.stop()
    Streams.compactLshIndex(spark, s"$dir/index", bandCols = Seq("bucket_grp"))
    // the serving read's plan: probe-bucket groups reach
    // PartitionFilters, the exact buckets push into the scan
    val read = Streams.annServeRead(spark, s"$dir/index", Seq(0L, 7L, 33L))
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    val pf = plan.substring(plan.indexOf("PartitionFilters: ["))
    assert(pf.takeWhile(_ != ']').contains("bucket_grp#"),
      s"bucket_grp must partition-prune the serving read: ${pf.take(300)}")
    assert(plan.contains("PushedFilters: ") &&
      plan.substring(plan.indexOf("PushedFilters: ")).takeWhile(_ != ']')
        .contains("bucket"),
      "exact buckets must reach the scan as a pushed filter")
    // serve ≡ fresh search: top-K from the compacted landed index must
    // equal q51's multiprobe over the table, row for row
    val queries = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qb", graft.queries.Similarity.bucketCode(col("qv")))
    val served = Streams.annServeTopK(spark, s"$dir/index", queries,
      graft.queries.Similarity.AnnTopK)
    assert(rowsOf(served) ===
      rowsOf(graft.queries.Similarity.q51MultiprobeAnn(spark, sf)))
  }

  test("LSH admission serving: read prunes to request bands/sigs; pairs equal the restricted batch census") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_lshserve")
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalLshDedup(
      in.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/pairs",
      s"$dir/ckpt").start()
    try corpus.grouped(25).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
    finally q.stop()
    Streams.compactLshIndex(spark, s"$dir/index")
    // the serving read's plan: request bands reach PartitionFilters,
    // the request signatures push into the scan
    val plan = Streams.lshServeRead(spark, s"$dir/index", Seq(0, 2), Seq("x"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert(plan.substring(plan.indexOf("PartitionFilters: ["))
        .takeWhile(_ != ']').contains("band#"),
      "request bands must partition-prune the serving read")
    assert(plan.contains("PushedFilters: ") &&
      plan.substring(plan.indexOf("PushedFilters: ")).takeWhile(_ != ']')
        .contains("sig"),
      "request signatures must reach the scan as a pushed filter")
    // serve ≡ fresh search, restricted to pairs touching the request
    val request = docs.filter(col("doc_id") < 10)
    val served = graft.queries.Dedup.jaccardVerify(
      Streams.lshServePairs(spark, s"$dir/index",
        graft.queries.Dedup.bandedSignatures(request)), docs)
    val reference = graft.queries.Dedup.jaccardVerify(
      graft.queries.Dedup.lshCandidates(docs)
        .filter(col("doc_a") < 10 || col("doc_b") < 10), docs)
    assert(rowsOf(served) === rowsOf(reference))
    assert(rowsOf(served).nonEmpty, "request must carry near-dup mass")
  }

  test("incremental hourly counts: merged snapshot verdicts equal batch q90 on the union") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incanom")
    val sf = "/root/testdata/sf0.001"
    // ts may be TIMESTAMP_NTZ (LocalDateTime rows) — cast to ltz so
    // getTimestamp works; session tz is UTC so the wall clock (and the
    // unix_timestamp-derived hour buckets) are unchanged
    val events = graft.Tables.events(spark, sf)
      .select(col("ts").cast("timestamp_ltz").as("ts"),
        col("event_type"), col("event_id")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val in = MemoryStream[(Timestamp, String, Long)]
    val q = Streams.incrementalHourlyCounts(
      in.toDF().toDF("ts", "event_type", "event_id"),
      s"$dir/counts", s"$dir/ckpt").start()
    // arrival order ≠ event-time order (shuffle by id hash): the
    // SUM-merge must still reconstruct exact hourly counts
    try events.sortBy(_._3.hashCode()).grouped(300).foreach { g =>
      in.addData(g.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = Streams.rateAnomalySnapshot(spark, s"$dir/counts")
    val batch = graft.queries.Events.q90RateAnomaly(spark, sf)
    assert(rowsOf(streamed) === rowsOf(batch),
      "mid-ingest snapshot verdicts must equal the batch q90 verdicts")
    assert(streamed.filter(col("anomaly")).count() > 0)
  }

  test("incremental novelty: first-seen min-merge matches an in-memory curve; replay can't steal credit") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incnov")
    val b0 = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"))
    val b1 = Seq((3L, "alpha beta gamma delta epsilon zeta"), // b0 rerun: 0 new
      (4L, "one two three four five nine ten"))               // partial overlap
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalNoveltyGrams(
      in.toDF().toDF("doc_id", "text"), s"$dir/grams", s"$dir/ckpt").start()
    try {
      in.addData(b0: _*); q.processAllAvailable()
      in.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    def gramsOf(docs: Seq[(Long, String)]): Map[String, Long] =
      docs.flatMap(_._2.split(" ").sliding(graft.queries.Dedup.SpanK.toInt)
        .map(_.mkString(" ")).toSeq.distinct).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
    val (g0, g1) = (gramsOf(b0), gramsOf(b1))
    val rows = Streams.noveltyCurveSnapshot(spark, s"$dir/grams").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val new1 = g1.keySet.diff(g0.keySet).size.toLong
    assert(rows(0L) === ((g0.size.toLong, g0.values.sum, g0.size.toLong,
      g0.size.toLong, 100L)))
    assert(rows(1L) === ((g1.size.toLong, g1.values.sum, new1,
      g0.size.toLong + new1, new1 * 100 / g1.size)))
    // batch-1 grams that b0 already introduced earn no first-seen credit
    assert(new1 < g1.size.toLong, "overlap corpus must not be fully novel")
  }

  test("incremental split guard: snapshot equals batch q93; a cross-split dup surfaces mid-ingest") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incguard")
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalSplitGuard(
      in.toDF().toDF("doc_id", "text"), s"$dir/fps", s"$dir/ckpt").start()
    try docs.grouped(250).foreach { g => in.addData(g.toSeq: _*); q.processAllAvailable() }
    finally q.stop()
    val streamed = Streams.splitGuardSnapshot(spark, s"$dir/fps")
    val batch = graft.queries.Text.q93SplitLeakage(spark, sf)
    assert(rowsOf(streamed) === rowsOf(batch),
      "mid-ingest leakage census must equal the batch q93 census")
  }

  test("incremental pipeline + finalize equals the batch q50 manifest on the union corpus") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_incpipe")
    val sf = "/root/testdata/sf0.001"
    // doc_id-ordered ingest: first-arrival exact dedup == min-doc_id
    val corpus = graft.Tables.documents(spark, sf)
      .select("source", "doc_id", "text", "n_chars")
      .orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val in = MemoryStream[(String, Long, String, Long)]
    val q = Streams.incrementalPipeline(
      in.toDF().toDF("source", "doc_id", "text", "n_chars"),
      s"$dir/fp", s"$dir/survivors", s"$dir/lsh", s"$dir/pairs", s"$dir/ckpt")
      .start()
    try corpus.grouped(200).foreach { g => in.addData(g: _*); q.processAllAvailable() }
    finally q.stop()
    val streamed = Streams.finalizePipeline(spark, s"$dir/survivors", s"$dir/pairs")
    val batch = graft.queries.PipelineQ.q50TrainingManifest(spark, sf)
    assert(rowsOf(streamed) === rowsOf(batch),
      "streamed ingest + finalize must reproduce the batch q50 manifest")
    assert(rowsOf(batch).nonEmpty)
    // the fingerprint history read prunes on fp_prefix partitions
    val hist = Streams.fpIndexHistory(spark, s"$dir/fp", Seq("a", "b"), 99L)
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    val pf = plan.substring(plan.indexOf("PartitionFilters: ["))
    assert(pf.takeWhile(_ != ']').contains("fp_prefix#"), pf.take(300))
  }

  test("finalize with a collision-free corpus (zero pairs ever logged) still packs") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_nopairs")
    // three distinct docs that pass quality triage (≥10 tokens, ≥50
    // chars, >30% unique, no stopwords) and share no 3-grams → the
    // candidate pairs log gets ONLY empty batch partitions
    def doc(ws: String) = (ws, ws.length.toLong)
    val (t1, n1) = doc("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
    val (t2, n2) = doc("one two three four five six seven eight nine ten eleven twelve")
    val (t3, n3) = doc("red green blue cyan pink amber teal mauve coral jade onyx pearl")
    // doc_ids 6 and 19 pass the md5-byte sample cut (< 51), 1 does not
    val docs = Seq(("s0", 6L, t1, n1), ("s0", 19L, t2, n2), ("s1", 1L, t3, n3))
    val in = MemoryStream[(String, Long, String, Long)]
    val q = Streams.incrementalPipeline(
      in.toDF().toDF("source", "doc_id", "text", "n_chars"),
      s"$dir/fp", s"$dir/survivors", s"$dir/lsh", s"$dir/pairs", s"$dir/ckpt")
      .start()
    try { in.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    val manifest = Streams.finalizePipeline(spark, s"$dir/survivors", s"$dir/pairs")
    // zero dropped: every sampled doc must appear in the manifest
    val sampledDocs = docs.count { case (_, id, _, _) =>
      spark.range(id, id + 1)
        .filter(graft.queries.Text.sampleHashByte(
          org.apache.spark.sql.functions.col("id")) < graft.queries.Text.SampleCut)
        .count() == 1
    }
    val packed = manifest.agg(org.apache.spark.sql.functions
      .coalesce(org.apache.spark.sql.functions.sum("doc_count"),
        org.apache.spark.sql.functions.lit(0L)))
      .collect()(0).getLong(0)
    assert(packed === sampledDocs.toLong)
    assert(sampledDocs > 0, "fixture should have at least one sampled doc")
  }

  test("z-order compaction: staged swap folds to one file per zdir; census and pruning survive; idempotent") {
    import graft.queries.Layout
    val dir = java.nio.file.Files.createTempDirectory("graft_zcompact")
    val (idx, cp) = (s"$dir/index", s"$dir/ckpt")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val sf = "/root/testdata/sf0.001"
    val facts = Layout.dayAndCust(spark, sf)
    def land(half: Int): Unit = {
      val stage = s"$dir/stage$half"
      facts.filter(col("o_custkey") % 2 === half).coalesce(1)
        .write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          in.resolve(s"half$half.parquet")))
    }
    def start() = Streams.incrementalZorder(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "day bigint, o_custkey bigint"))
        .option("maxFilesPerTrigger", "1")
        .parquet(in.toString), idx, cp).start()
    land(0); land(1)
    val q1 = start(); q1.processAllAvailable(); q1.stop() // 2 micro-batches
    def dataFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
          Seq(f)
        else Nil
      walk(new java.io.File(idx))
    }
    val before = rowsOf(Streams.zorderSnapshot(spark, idx))
    assert(before === rowsOf(Layout.q72ZorderCensus(spark, sf)))
    Streams.compactZorderIndex(spark, idx)
    // THE fold's payoff: every folded zdir holds exactly ONE merged
    // file (batch_id=-1); only the live latest batch keeps its own
    val mergedByZdir = dataFiles()
      .filter(_.getPath.contains("batch_id=-1"))
      .groupBy(_.getParentFile.getParentFile.getName)
    assert(mergedByZdir.nonEmpty, "compaction must fold batch 0")
    mergedByZdir.foreach { case (zdir, fs) =>
      assert(fs.size === 1, s"$zdir: folded partition must be one file") }
    assert(!dataFiles().exists(_.getPath.contains("batch_id=0")),
      "folded batch partitions must be gone")
    // census bit-equal to never having compacted
    assert(rowsOf(Streams.zorderSnapshot(spark, idx)) === before)
    // directory pruning intact on the compacted index
    val zdir = spark.read.parquet(idx).select(col("zdir"))
      .agg(min(col("zdir"))).head.get(0)
    val plan = spark.read.parquet(idx).filter(col("zdir") === zdir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(zdir"), plan.take(1500))
    // idempotent: a second fold with nothing foldable is a no-op
    val files = dataFiles().map(_.getPath).sorted
    Streams.compactZorderIndex(spark, idx)
    assert(dataFiles().map(_.getPath).sorted === files)
  }

  test("tombstone vacuum: affected partitions swap, fully-purged vanish, unaffected untouched, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vacuum")
    val log = s"$dir/log"
    // batch 0: docs {1 live, 2 tomb}; batch 1: {3, 4} untouched;
    // batch 2: {5, 6} BOTH tombstoned (the fully-purged partition)
    Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 2L), (6L, 2L))
      .toDF("doc_id", "batch_id")
      .write.partitionBy("batch_id").parquet(log)
    val tombs = Seq(2L, 5L, 6L).toDF("doc_id")
    def files(sub: String): Seq[(String, Long)] = {
      val d = new java.io.File(s"$log/$sub")
      if (!d.isDirectory) Nil
      else d.listFiles().filter(f => !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toSeq.sorted
    }
    val untouchedBefore = files("batch_id=1")
    Streams.vacuumTombstoned(spark, log, tombs, Seq("doc_id"),
      Seq("batch_id"))
    assert(Streams.tombstoneResiduals(spark, log, tombs, Seq("doc_id")) === 0L)
    assert(rowsOf(spark.read.parquet(log).select(col("doc_id"))) ===
      Seq(Seq("1"), Seq("3"), Seq("4")))
    assert(!new java.io.File(s"$log/batch_id=2").exists,
      "a partition whose every row was tombstoned must be GONE")
    assert(files("batch_id=1") === untouchedBefore,
      "unaffected partitions must not be rewritten (same files, same mtimes)")
    assert(!new java.io.File(s"$log/.graft_vacuum_stage").exists &&
      !new java.io.File(s"$log/.graft_vacuum_old").exists)
    // idempotent: nothing left to vacuum — file set unchanged
    val after = files("batch_id=0") ++ files("batch_id=1")
    Streams.vacuumTombstoned(spark, log, tombs, Seq("doc_id"),
      Seq("batch_id"))
    assert(files("batch_id=0") ++ files("batch_id=1") === after)
  }

  test("tombstone vacuum reads ONLY the affected partitions (literal PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vprune")
    val log = s"$dir/log"
    (0L to 3L).flatMap(b => Seq((b * 10 + 1, b), (b * 10 + 2, b)))
      .toDF("doc_id", "batch_id")
      .write.partitionBy("batch_id").parquet(log)
    val affected = spark.read.parquet(log)
      .filter(col("batch_id") === 1 || col("batch_id") === 3)
      .select(col("batch_id")).distinct().collect().toSeq
    val read = Streams.vacuumAffectedRead(spark, log, affected,
      Seq("batch_id"))
    // the pruning claim, asserted at the PLAN: the literal predicate
    // reaches PartitionFilters, and the scan lists 2 of 4 directories
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(1500))
    val pf = plan.substring(plan.indexOf("PartitionFilters: ["))
      .takeWhile(_ != ']')
    assert(pf.contains("batch_id"), pf)
    val scanned: Int = read.queryExecution.executedPlan.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
    assert(scanned === 2, s"must list 2 affected dirs, scanned $scanned")
    assert(rowsOf(read.select(col("doc_id"))) ===
      Seq(Seq("11"), Seq("12"), Seq("31"), Seq("32")))
  }

  test("retention composes with compaction: fold first, then expire from the merged partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retcompact")
    val log = s"$dir/hours"
    // three "micro-batches" of hourly partials, 6 hours of history
    def hour(h: Int): Long = 1700000000L / 3600 * 3600 + h * 3600L
    Seq(
      (hour(0), "a", 5L, 0L), (hour(1), "a", 3L, 0L),
      (hour(2), "a", 2L, 1L), (hour(3), "b", 7L, 1L),
      (hour(4), "a", 1L, 2L), (hour(5), "b", 4L, 2L),
      (hour(2), "a", 9L, 2L)) // hour 2 re-observed in a later batch
      .toDF("hour_start", "event_type", "cnt", "batch_id")
      .write.partitionBy("batch_id").parquet(log)
    val sumMerge = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(col("hour_start"), col("event_type"))
        .agg(sum(col("cnt")).as("cnt"))
    Streams.compactSummedPartials(spark, log, sumMerge)
    // batches 0/1 folded into batch_id=-1; latest (2) stays live
    assert(!new java.io.File(s"$log/batch_id=0").exists)
    // expire hours < hour(3): rewrites the MERGED partition (and the
    // live one carries no expired rows... hour(2) in batch 2 does —
    // both rewrite), whole-expired partitions would vanish
    Streams.retentionVacuum(spark, log, col("hour_start") < hour(3),
      Seq("batch_id"))
    val after = spark.read.parquet(log)
    assert(after.filter(col("hour_start") < hour(3)).count() === 0L)
    // census over retained horizon survives fold + expiry exactly
    assert(rowsOf(sumMerge(after.drop("batch_id"))) ===
      Seq(Seq(hour(3).toString, "b", "7"),
        Seq(hour(4).toString, "a", "1"),
        Seq(hour(5).toString, "b", "4")))
    // idempotent follow-up: nothing expired remains → no-op
    Streams.retentionVacuum(spark, log, col("hour_start") < hour(3),
      Seq("batch_id"))
    assert(rowsOf(sumMerge(spark.read.parquet(log).drop("batch_id"))).size === 3)
  }

  test("tombstone vacuum crash recovery: complete stage rolls forward, incomplete rolls back") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    // --- roll FORWARD: crash after the marker, mid-swap ---
    val d1 = java.nio.file.Files.createTempDirectory("graft_vrecf")
    val log1 = s"$d1/log"
    Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("doc_id", "batch_id")
      .write.partitionBy("batch_id").parquet(log1)
    // staged kept-rows for batch 0 (doc 2 tombstoned), marker present
    Seq((1L, 0L)).toDF("doc_id", "batch_id")
      .write.partitionBy("batch_id").parquet(s"$log1/.graft_vacuum_stage")
    fs.create(p(s"$log1/.graft_vacuum_stage/_GRAFT_STAGE_COMPLETE")).close()
    // simulate: live batch 0 already renamed aside, stage not yet in
    fs.mkdirs(p(s"$log1/.graft_vacuum_old"))
    assert(fs.rename(p(s"$log1/batch_id=0"),
      p(s"$log1/.graft_vacuum_old/batch_id=0")))
    // any vacuum call repairs first — tombstones that hit nothing
    Streams.vacuumTombstoned(spark, log1, Seq(999L).toDF("doc_id"),
      Seq("doc_id"), Seq("batch_id"))
    assert(rowsOf(spark.read.parquet(log1).select(col("doc_id"))) ===
      Seq(Seq("1"), Seq("3")), "roll-forward must commit the staged rows")
    assert(!fs.exists(p(s"$log1/.graft_vacuum_stage")) &&
      !fs.exists(p(s"$log1/.graft_vacuum_old")))
    // --- roll BACK: crash before the marker (no renames happened) ---
    val d2 = java.nio.file.Files.createTempDirectory("graft_vrecb")
    val log2 = s"$d2/log"
    Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "batch_id")
      .write.partitionBy("batch_id").parquet(log2)
    Seq((1L, 0L)).toDF("doc_id", "batch_id") // incomplete: NO marker
      .write.partitionBy("batch_id").parquet(s"$log2/.graft_vacuum_stage")
    Streams.vacuumTombstoned(spark, log2, Seq(999L).toDF("doc_id"),
      Seq("doc_id"), Seq("batch_id"))
    assert(rowsOf(spark.read.parquet(log2).select(col("doc_id"))) ===
      Seq(Seq("1"), Seq("2")), "roll-back must leave the log pre-vacuum")
    assert(!fs.exists(p(s"$log2/.graft_vacuum_stage")))
  }

  test("tombstone vacuum on a NULL-valued partition keeps its non-tombstoned rows") {
    // the swap renders null as __HIVE_DEFAULT_PARTITION__ and finds the
    // dir; the read must select it too (null-safe `<=>`) — with a bare
    // `===` the kept-rows read is empty, no staged leaf is written, and
    // the rename-away silently deletes the bystander rows
    val dir = java.nio.file.Files.createTempDirectory("graft_vnull")
    val log = s"$dir/log"
    Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("a")))
      .toDF("doc_id", "grp")
      .write.partitionBy("grp").parquet(log)
    Streams.vacuumTombstoned(spark, log, Seq(2L).toDF("doc_id"),
      Seq("doc_id"), Seq("grp"))
    assert(Streams.tombstoneResiduals(spark, log,
      Seq(2L).toDF("doc_id"), Seq("doc_id")) === 0L)
    assert(rowsOf(spark.read.parquet(log).select(col("doc_id"))) ===
      Seq(Seq("1"), Seq("3")),
      "null-partition bystander must survive the vacuum")
  }

  test("tombstone vacuum coerces tombstone type to the ref column's before bloom hashing") {
    // double ref column, long tombstone: native equality coerces
    // (11.0 == 11) but the string forms differ ("11.0" vs "11") — an
    // uncoerced bloom would FALSE-NEGATIVE and silently skip the
    // partition the legacy full scan would have vacuumed
    val dir = java.nio.file.Files.createTempDirectory("graft_vcoerce")
    val log = s"$dir/log"
    Streams.writeBatchPartition(
      Seq((11.0, "x"), (12.0, "y")).toDF("ref_id", "payload"),
      0L, log, refCols = Seq("ref_id"))
    Streams.writeBatchPartition(
      Seq((13.0, "z")).toDF("ref_id", "payload"),
      1L, log, refCols = Seq("ref_id"))
    Streams.vacuumTombstoned(spark, log, Seq(11L).toDF("doc_id"),
      Seq("ref_id"), Seq("batch_id"))
    assert(spark.read.parquet(log).filter(col("ref_id") === 11.0)
      .count() === 0L,
      "coerced bloom must flag the partition; erased row must be gone")
    assert(spark.read.parquet(log).count() === 2L)
  }

  test("schema-evolving partial log: merged read sees v1 rows with NULL new columns; census exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve")
    val log = s"$dir/hours"
    // v1 batch: (hour_start, event_type, cnt); v2 adds value_cents
    Streams.writeBatchPartition(
      Seq((3600L, "view", 5L)).toDF("hour_start", "event_type", "cnt"),
      0L, log)
    Streams.writeBatchPartition(
      Seq((3600L, "view", 2L, 730L), (7200L, "click", 1L, 99L))
        .toDF("hour_start", "event_type", "cnt", "value_cents"),
      1L, log)
    val snap = spark.read.option("mergeSchema", "true").parquet(log)
    assert(snap.columns.contains("value_cents"),
      "the merged read must surface the evolved column")
    // v1 rows carry NULL for the new column — never a fabricated zero
    assert(snap.filter(col("batch_id") === 0L)
      .select(col("value_cents")).collect().forall(_.isNullAt(0)))
    // census: cnt sums across BOTH versions; cents over v2 mass only,
    // NULL where no v2 row contributes (null-sum semantics)
    val census = rowsOf(snap.groupBy(col("hour_start"), col("event_type"))
      .agg(sum(col("cnt")).as("events"),
        sum(col("value_cents")).as("value_cents")))
    assert(census === Seq(
      Seq("3600", "view", "7", "730"),
      Seq("7200", "click", "1", "99")))
  }

  test("tombstone vacuum swaps STRING partitions with Hive-escaped values") {
    // a partition value containing characters Spark escapes on write
    // (space, ':') lands on disk as src=web%20crawl%3Av2 — the swap must
    // derive the SAME escaped directory or it silently no-ops
    val dir = java.nio.file.Files.createTempDirectory("graft_vescape")
    val log = s"$dir/log"
    Seq((1L, "web crawl:v2"), (2L, "web crawl:v2"), (3L, "books"))
      .toDF("doc_id", "src")
      .write.partitionBy("src").parquet(log)
    Streams.vacuumTombstoned(spark, log, Seq(2L).toDF("doc_id"),
      Seq("doc_id"), Seq("src"))
    assert(Streams.tombstoneResiduals(spark, log, Seq(2L).toDF("doc_id"),
      Seq("doc_id")) === 0L,
      "escaped partition dir missed: the vacuum no-opped on it")
    assert(rowsOf(spark.read.parquet(log).select(col("doc_id"))) ===
      Seq(Seq("1"), Seq("3")))
    assert(!new java.io.File(s"$log/.graft_vacuum_stage").exists &&
      !new java.io.File(s"$log/.graft_vacuum_old").exists)
  }

  test("retention vacuum RETAINS rows whose expiry predicate is NULL") {
    // three-valued logic: null hour_start is neither expired nor live
    // under `<` — it must survive the rewrite, not silently vanish
    val dir = java.nio.file.Files.createTempDirectory("graft_retnull")
    val log = s"$dir/hours"
    Seq((Some(100L), "a", 0L), (None, "b", 0L), (Some(900L), "c", 0L))
      .toDF("hour_start", "event_type", "batch_id")
      .write.partitionBy("batch_id").parquet(log)
    Streams.retentionVacuum(spark, log, col("hour_start") < 500L,
      Seq("batch_id"))
    assert(rowsOf(spark.read.parquet(log).select(col("event_type"))) ===
      Seq(Seq("b"), Seq("c")),
      "the NULL-predicate row must be retained by the rewrite")
  }

  test("vacuum detection consults _refs: bloom candidates only, verify read touches only them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vrefs")
    val log = s"$dir/log"
    // land 4 batches through the REAL landing path (sidecar maintained)
    (0L to 3L).foreach { b =>
      Streams.writeBatchPartition(Seq(b * 10 + 1, b * 10 + 2).toDF("doc_id"),
        b, log, refCols = Seq("doc_id"))
    }
    assert(new java.io.File(s"$log/_refs").isDirectory, "sidecar must exist")
    // the sidecar never leaks into a read of the artifact itself
    assert(spark.read.parquet(log).columns.toSeq.sorted ===
      Seq("batch_id", "doc_id"))
    val tomb = Seq(11L).toDF("__t") // lives in batch_id=1 only
    // 1) the consult: O(partitions) summary rows, bloom prunes to the
    //    one hit partition, nothing uncovered
    val Some((cands, uncov)) =
      Streams.refsCandidatePartitions(spark, log, tomb, Seq("batch_id"))
    assert(uncov.isEmpty, s"all partitions are summarized: $uncov")
    assert(cands.map(_.getLong(0)).toSet === Set(1L),
      s"bloom must prune to the hit partition, got $cands")
    // 2) the verify read's files-read footprint — the rewrite's
    //    discipline applied to DETECTION (verdict-r13 What's-wrong #1)
    val touched = Streams.vacuumDetectRead(spark, log, cands, uncov,
      Seq("batch_id")).get
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(_.contains("batch_id=1")),
      s"detection must read only candidate partitions: ${touched.toSeq}")
    // 3) end-to-end detection equals the legacy full scan's answer
    val hit = col("doc_id") === col("__t")
    assert(Streams.detectAffected(spark, log, broadcast(tomb), hit,
      Seq("batch_id")).map(_.get(0).toString.toLong) === Seq(1L))
    // 4) the vacuum itself, and the post-swap sidecar refresh: the
    //    erased id no longer flags its old partition on later vacuums
    Streams.vacuumTombstoned(spark, log, Seq(11L).toDF("doc_id"),
      Seq("doc_id"), Seq("batch_id"))
    assert(Streams.tombstoneResiduals(spark, log, Seq(11L).toDF("doc_id"),
      Seq("doc_id")) === 0L)
    val Some((cands2, uncov2)) =
      Streams.refsCandidatePartitions(spark, log, tomb, Seq("batch_id"))
    assert(cands2.isEmpty && uncov2.isEmpty,
      "refresh must drop the erased id's positions from the sidecar")
  }

  test("admission gate routes near-dups to quarantine; quarantined signatures still register (chain law)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gate")
    def p(s: String) = s"$dir/$s"
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "one two three four five six seven eight nine"
    val t4 = "lorem ipsum dolor sit amet consectetur adipiscing"
    // batch 0: doc 3 duplicates doc 1 within the batch
    Streams.gatedAdmissionStep(
      Seq((1L, t1), (2L, t2), (3L, t1), (4L, t4)).toDF("doc_id", "text"),
      0L, p("corpus"), p("quar"), p("index"), p("pairs"))
    assert(rowsOf(spark.read.parquet(p("corpus")).select(col("doc_id"))) ===
      Seq(Seq("1"), Seq("2"), Seq("4")))
    assert(rowsOf(spark.read.parquet(p("quar"))
      .select(col("doc_id"), col("dup_of"))) === Seq(Seq("3", "1")))
    // batch 1: doc 5 duplicates the QUARANTINED doc 3's text — the
    // register-all law: 3's signatures are in the index, so 5
    // quarantines against the dup region's first writer (dup_of = 1)
    // and the pair log shows BOTH colliders
    Streams.gatedAdmissionStep(
      Seq((5L, t1), (6L, "unique text nothing shares these tokens here"))
        .toDF("doc_id", "text"),
      1L, p("corpus"), p("quar"), p("index"), p("pairs"))
    assert(rowsOf(spark.read.parquet(p("quar"))
      .select(col("doc_id"), col("dup_of"))) ===
      Seq(Seq("3", "1"), Seq("5", "1")))
    assert(rowsOf(spark.read.parquet(p("corpus")).select(col("doc_id"))) ===
      Seq(Seq("1"), Seq("2"), Seq("4"), Seq("6")))
    val pairs = spark.read.parquet(p("pairs"))
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)) && pairs.contains((3L, 5L)),
      s"quarantined doc 3's registered signatures must pair with 5: $pairs")
    // the index carries EVERY presented doc's signatures — the
    // mechanism behind chain exactness
    assert(spark.read.parquet(p("index")).select(col("doc_id"))
      .distinct().count() === 6L)
    // replayed batch: same routing, no duplicates (overwrite semantics)
    Streams.gatedAdmissionStep(
      Seq((5L, t1), (6L, "unique text nothing shares these tokens here"))
        .toDF("doc_id", "text"),
      1L, p("corpus"), p("quar"), p("index"), p("pairs"))
    assert(spark.read.parquet(p("quar")).count() === 2L)
    assert(spark.read.parquet(p("corpus")).count() === 4L)
  }

  test("gated ingest census equals the batch admission law over the union corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gatediff")
    def p(s: String) = s"$dir/$s"
    // dup groups spanning batch boundaries, fed in doc_id order
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six seven",
      3L -> "alpha beta gamma delta epsilon zeta", // dup of 1
      4L -> "completely different tokens in this document here",
      5L -> "one two three four five six seven",   // dup of 2
      6L -> "alpha beta gamma delta epsilon zeta", // dup of 1
      7L -> "yet another unique stretch of words for the corpus")
    texts.grouped(3).zipWithIndex.foreach { case (chunk, b) =>
      Streams.gatedAdmissionStep(chunk.toDF("doc_id", "text"),
        b.toLong, p("corpus"), p("quar"), p("index"), p("pairs"))
    }
    val all = texts.toDF("doc_id", "text")
    val sigs = graft.queries.Dedup.bandedSignatures(all)
    val law = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("b.doc_id").as("doc_id"))
      .agg(min(col("a.doc_id")).as("dup_of"))
    assert(rowsOf(spark.read.parquet(p("quar"))
        .select(col("doc_id"), col("dup_of"))) ===
      rowsOf(law.select(col("doc_id"), col("dup_of"))),
      "gated quarantine must equal the batch law")
    assert(rowsOf(spark.read.parquet(p("corpus")).select(col("doc_id"))) ===
      rowsOf(all.join(law, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))),
      "gated survivors must equal the batch law's admitted set")
  }

  test("retention detection consults zone maps: candidates only, verify read touches only them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zrefs")
    val log = s"$dir/hours"
    // 4 batches through the REAL landing path, zone sidecar maintained:
    // batch b holds hours {10b, 10b+5}
    (0L to 3L).foreach { b =>
      Streams.writeBatchPartition(
        Seq((b * 10, 1L), (b * 10 + 5, 1L)).toDF("hour_start", "cnt"),
        b, log, zoneCols = Seq("hour_start"))
    }
    // zone-only sidecar: tombstone detection must NOT claim it
    assert(Streams.refsCandidatePartitions(spark, log, Seq(0L).toDF("t"),
      Seq("batch_id")).isEmpty)
    // 1) the consult: zmin < 15 flags batches 0 and 1 only, all covered
    val Some((cands, uncov)) = Streams.refsZoneCandidates(spark, log,
      "hour_start", (zmin, _) => zmin < 15L, Seq("batch_id"))
    assert(uncov.isEmpty, s"all partitions are zone-summarized: $uncov")
    assert(cands.map(_.getLong(0)).toSet === Set(0L, 1L),
      s"zone map must prune to expired-range partitions, got $cands")
    // 2) the verify read's files-read footprint (the tombstone
    //    discipline, retention edition)
    val touched = Streams.vacuumDetectRead(spark, log, cands, uncov,
      Seq("batch_id")).get
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(f =>
      f.contains("batch_id=0") || f.contains("batch_id=1")),
      s"detection must read only candidate partitions: ${touched.toSeq}")
    // 3) the keyed vacuum end-to-end: batch 0 vanishes wholesale,
    //    batch 1 rewrites (10 expired, 15 kept), 2/3 untouched
    Streams.retentionVacuumKeyed(spark, log, "hour_start", lit(15L),
      Seq("batch_id"))
    assert(rowsOf(spark.read.parquet(log).select(col("hour_start"))) ===
      Seq(Seq("15"), Seq("20"), Seq("25"), Seq("30"), Seq("35")))
    assert(!new java.io.File(s"$log/batch_id=0").exists)
    // 4) the post-swap refresh: the same cutoff no longer flags
    //    anything — batch 0's row is gone, batch 1's zmin moved up
    val Some((cands2, uncov2)) = Streams.refsZoneCandidates(spark, log,
      "hour_start", (zmin, _) => zmin < 15L, Seq("batch_id"))
    assert(cands2.isEmpty && uncov2.isEmpty,
      s"refresh must re-zone the rewritten partition: $cands2 $uncov2")
    // idempotent follow-up
    Streams.retentionVacuumKeyed(spark, log, "hour_start", lit(15L),
      Seq("batch_id"))
    assert(spark.read.parquet(log).count() === 5L)
  }

  test("summed-partials compaction carries the zone sidecar across its root swap, folded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zfold")
    val log = s"$dir/hours"
    (0L to 2L).foreach { b =>
      Streams.writeBatchPartition(
        Seq((b * 10, 1L), (b * 10 + 5, 1L)).toDF("hour_start", "cnt"),
        b, log, zoneCols = Seq("hour_start"))
    }
    Streams.compactSummedPartials(spark, log,
      _.groupBy(col("hour_start")).agg(sum(col("cnt")).as("cnt")))
    assert(new java.io.File(s"$log/_refs").isDirectory,
      "sidecar must survive the whole-root compaction swap")
    // folded rows: batches 0/1 merged under batch_id=-1 with the
    // min/max union; latest (2) keeps its own row
    val refs = spark.read.parquet(s"$log/_refs")
      .select(col("batch_id"), col("zmin_hour_start"), col("zmax_hour_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(refs === Set((-1L, 0L, 15L), (2L, 20L, 25L)), refs.toString)
    // detection still prunes on the compacted artifact: cutoff 20
    // flags the merged partition only, nothing uncovered
    val Some((cands, uncov)) = Streams.refsZoneCandidates(spark, log,
      "hour_start", (zmin, _) => zmin < 20L, Seq("batch_id"))
    assert(uncov.isEmpty && cands.map(_.getLong(0)).toSet === Set(-1L))
    Streams.retentionVacuumKeyed(spark, log, "hour_start", lit(20L),
      Seq("batch_id"))
    assert(rowsOf(spark.read.parquet(log).select(col("hour_start"))) ===
      Seq(Seq("20"), Seq("25")))
  }

  test("vacuum detection is conservative for partitions the sidecar has never seen") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vrefs_cons")
    val log = s"$dir/log"
    (0L to 1L).foreach { b =>
      Streams.writeBatchPartition(Seq(b * 10 + 1).toDF("doc_id"), b, log,
        refCols = Seq("doc_id"))
    }
    // a pre-summary slice: landed with NO sidecar row (a legacy batch,
    // or a merged partition from a fold that predates the sidecar)
    Streams.writeBatchPartition(Seq(41L).toDF("doc_id"), 4L, log)
    val tomb = Seq(41L).toDF("__t")
    val Some((cands, uncov)) =
      Streams.refsCandidatePartitions(spark, log, tomb, Seq("batch_id"))
    assert(cands.isEmpty, "41 is in no summarized partition")
    assert(uncov.map(_.getName) === Seq("batch_id=4"),
      "the unsummarized leaf must stay a candidate")
    assert(Streams.detectAffected(spark, log, broadcast(tomb),
      col("doc_id") === col("__t"), Seq("batch_id"))
      .map(_.get(0).toString.toLong) === Seq(4L))
    Streams.vacuumTombstoned(spark, log, Seq(41L).toDF("doc_id"),
      Seq("doc_id"), Seq("batch_id"))
    assert(Streams.tombstoneResiduals(spark, log, Seq(41L).toDF("doc_id"),
      Seq("doc_id")) === 0L)
    assert(rowsOf(spark.read.parquet(log).select(col("doc_id"))) ===
      Seq(Seq("1"), Seq("11")))
  }

  test("compaction folds the sidecar too: merged partition stays covered and detectable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vrefs_fold")
    val log = s"$dir/log"
    (0L to 2L).foreach { b =>
      Streams.writeBatchPartition(Seq(b * 10 + 1, b * 10 + 2).toDF("doc_id"),
        b, log, refCols = Seq("doc_id"))
    }
    Streams.compactMinMergePartials(spark, log, _.distinct())
    assert(spark.read.parquet(log).select("batch_id").distinct().collect()
      .map(_.get(0).toString.toLong).sorted.toSeq === Seq(-1L, 2L))
    val tomb = Seq(1L).toDF("__t") // landed in batch 0, now inside -1
    val Some((cands, uncov)) =
      Streams.refsCandidatePartitions(spark, log, tomb, Seq("batch_id"))
    assert(uncov.isEmpty,
      s"refsFoldBatches must cover the merged partition, got $uncov")
    assert(cands.map(_.getLong(0)).toSet === Set(-1L))
    Streams.vacuumTombstoned(spark, log, Seq(1L).toDF("doc_id"),
      Seq("doc_id"), Seq("batch_id"))
    assert(Streams.tombstoneResiduals(spark, log, Seq(1L).toDF("doc_id"),
      Seq("doc_id")) === 0L)
    assert(spark.read.parquet(log).count() === 5L)
  }

  // Streams.kafkaSource mirrors the reference's Kafka options 1:1
  // (Consumer.scala:50-56) but the spark-sql-kafka connector jar is not
  // shipped in this container, so `.load()` is untestable offline; the
  // option-building is a pure function, contract-tested here so the S3
  // wiring can't silently drift from the reference even where the
  // connector can't load. The file/memory sources above cover the
  // streaming execution paths.
  test("kafka source options match the reference contract exactly") {
    val opts = Streams.kafkaSourceOptions("broker1:9092,broker2:9092", "openfood")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "openfood",          // subscribe, not subscribePattern/assign
      "startingOffsets" -> "earliest",    // replay the topic from the start
      "failOnDataLoss" -> "false"))       // tolerate aged-out offsets
    // nothing else sneaks in: exactly the reference's four options
    assert(opts.size === 4)
  }
}
