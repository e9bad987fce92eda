package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Stage the (ns-converted) events table as a stream input dir. */
  private def stageEvents(): String = {
    val dir = tmpDir("stream-in")
    Tables.load(spark, sf, "events")
      .repartition(3) // 3 files → 3 micro-batches with maxFilesPerTrigger=1
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts over a file stream match the batch answer") {
    val dir = stageEvents()
    val q = EventsStream.windowedCounts(EventsStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .groupBy("event_type").agg(sum("n").as("n"))
        .as[(String, Long)].collect().toMap
      // Append mode only emits windows closed by the watermark; the final
      // (unclosed) windows stay in state, so streamed ⊆ batch per type.
      val batch = Tables.load(spark, sf, "events")
        .groupBy("event_type").count().as[(String, Long)].collect().toMap
      assert(streamed.nonEmpty)
      assert(streamed.forall { case (k, v) => v > 0 && v <= batch(k) })
    } finally q.stop()
  }

  test("hopping windows stream with doubled mass: each event in exactly 2 windows") {
    val dir = stageEvents()
    val q = EventsStream.windowedCounts(EventsStream.readEvents(spark, dir),
        slide = Some("30 minutes"))
      .writeStream.format("memory").queryName("hop_counts")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hop_counts")
        .groupBy("event_type").agg(sum("n").as("n"))
        .as[(String, Long)].collect().toMap
      // closed hopping windows count each event up to twice (width/slide)
      val batch = Tables.load(spark, sf, "events")
        .groupBy("event_type").count().as[(String, Long)].collect().toMap
      assert(streamed.nonEmpty)
      assert(streamed.forall { case (k, v) => v > 0 && v <= 2 * batch(k) })
      // starts sit on the 30-min slide grid, denser than the 1-h tumble
      val starts = spark.table("hop_counts")
        .select("win_start").distinct()
        .as[java.sql.Timestamp].collect()
      assert(starts.forall(_.getTime % (30 * 60 * 1000L) == 0))
      assert(starts.exists(_.getTime % (60 * 60 * 1000L) != 0), "no half-hour start seen")
    } finally q.stop()
  }

  /** Stage events as three CHRONOLOGICAL micro-batch files (file-source
    * order = mtime order). Session equivalence with batch needs in-order
    * arrival: a random split would let the watermark close a session
    * before a time-earlier file delivers its remaining events. */
  private def stageEventsChronological(): String = {
    val dir = tmpDir("stream-chrono")
    val ev = Tables.load(spark, sf, "events")
    val cuts = ev.selectExpr("percentile(unix_micros(ts), array(0.33, 0.66)) as p")
      .head.getSeq[Double](0)
    val (t1, t2) = (cuts(0).toLong, cuts(1).toLong)
    Seq(
      ev.filter(unix_micros(col("ts")) <= t1),
      ev.filter(unix_micros(col("ts")) > t1 && unix_micros(col("ts")) <= t2),
      ev.filter(unix_micros(col("ts")) > t2)
    ).foreach { chunk =>
      chunk.coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct mtimes → deterministic file-source order
    }
    dir
  }

  test("native session_window stream: every closed session equals its batch twin") {
    val dir = stageEventsChronological()
    val q = EventsStream.nativeSessions(EventsStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("native_sessions")
        .select("user_id", "win_start", "win_end", "n_events")
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty, "no sessions closed by the watermark")
      // batch twin (oracle-verified q_session_window) on the same data
      val batch = graft.SparkEntry.queries("q_session_window")(spark, sf)
        .select("user_id", "win_start", "win_end", "n_events")
        .collect().map(_.toSeq).toSet
      // append mode emits only watermark-closed sessions: streamed ⊆ batch,
      // and each closed session matches the batch row exactly
      assert(streamed.subsetOf(batch),
        s"${streamed.diff(batch).take(3)} not found in batch sessions")
    } finally q.stop()
  }

  test("nativeSessions survives kill/restart: checkpointed state round-trips, exactly-once output") {
    // The recovery contract, not just semantics: run the session stream
    // over the first two chronological chunks, STOP the query (a forced
    // kill), deliver the third chunk, and restart a brand-new query on
    // the SAME checkpoint + file sink. The state store must round-trip
    // (sessions still open at the kill keep accumulating), the source
    // must resume from its committed offsets (no reprocessing), and the
    // transactional file sink must stay exactly-once across the restart.
    val in = tmpDir("restart-in")
    val out = tmpDir("restart-out")
    val ckpt = tmpDir("restart-ckpt")
    val ev = Tables.load(spark, sf, "events")
    val cuts = ev.selectExpr("percentile(unix_micros(ts), array(0.33, 0.66)) as p")
      .head.getSeq[Double](0)
    val (t1, t2) = (cuts(0).toLong, cuts(1).toLong)
    def deliver(chunk: org.apache.spark.sql.DataFrame): Unit = {
      chunk.coalesce(1).write.mode("append").parquet(in)
      Thread.sleep(20) // distinct mtimes → deterministic file order
    }
    deliver(ev.filter(unix_micros(col("ts")) <= t1))
    deliver(ev.filter(unix_micros(col("ts")) > t1 && unix_micros(col("ts")) <= t2))
    def start() = EventsStream.nativeSessions(EventsStream.readEvents(spark, in))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // the kill: open sessions live only in the checkpoint now
    val before = spark.read.parquet(out).count()
    deliver(ev.filter(unix_micros(col("ts")) > t2))
    val q2 = start() // NEW query object, same checkpoint
    try {
      q2.processAllAvailable()
      val res = spark.read.parquet(out)
        .select("user_id", "win_start", "win_end", "n_events")
      val rows = res.collect()
      assert(rows.length > before,
        "restart emitted nothing — state/offsets did not recover")
      // exactly-once: no session double-emitted across the boundary
      assert(res.groupBy("user_id", "win_start").count()
        .filter(col("count") > 1).count() == 0,
        "duplicate session emission across restart")
      // every closed session still equals its batch twin byte-for-byte
      val batch = graft.SparkEntry.queries("q_session_window")(spark, sf)
        .select("user_id", "win_start", "win_end", "n_events")
        .collect().map(_.toSeq).toSet
      val streamed = rows.map(_.toSeq).toSet
      assert(streamed.nonEmpty && streamed.subsetOf(batch),
        s"${streamed.diff(batch).take(3)} not found in batch sessions")
    } finally q2.stop()
  }

  test("streaming sliding distinct: every window's sketch estimate tracks the exact batch count") {
    val dir = stageEventsChronological()
    val q = EventsStream.slidingDistinct(EventsStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("sliding_nd")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_nd")
        .as[(java.sql.Timestamp, Double)].collect()
      assert(streamed.nonEmpty)
      val ev = Tables.load(spark, sf, "events")
      streamed.foreach { case (winEnd, apx) =>
        val lo = new java.sql.Timestamp(
          winEnd.getTime - 7L * 24 * 3600 * 1000)
        val exact = ev.filter(col("ts") >= lit(lo) && col("ts") < lit(winEnd))
          .select("user_id").distinct().count()
        assert(math.abs(apx - exact) <= math.max(1.0, exact * 0.05),
          s"window ending $winEnd: estimate $apx vs exact $exact")
      }
    } finally q.stop()
  }

  test("streaming SCD2 apply converges to the batch q_scd2 table across kill/restart, replays, and out-of-order arrivals") {
    val in = tmpDir("scd2-in")
    val table = tmpDir("scd2-table")
    val ckpt = tmpDir("scd2-ckpt")
    val events = Tables.load(spark, sf, "events")
    def run(): Unit = {
      val q = EventsStream.scd2Ingest(EventsStream.readEvents(spark, in), table)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    // file 1: the LATER half of each user's purchases (event_id parity),
    // so file 2 delivers earlier versions OUT OF ORDER — the merge must
    // re-chain validity, not append
    val f1 = events.filter(col("event_id") % 2 === 0)
    val f2full = events.filter(col("event_id") % 2 === 1)
      // plus a replay of file 1's rows: at-least-once delivery must not
      // double-insert a version
      .unionByName(f1.limit(200))
    f1.coalesce(1).write.mode("append").parquet(in)
    run() // ...kill: the validity table lives only in storage now
    val mid = EventsStream.scd2Table(spark, table)
    assert(mid.filter(col("is_current")).groupBy(col("user_id")).count()
      .filter(col("count") > 1).count() == 0, "two current rows for one user")
    f2full.coalesce(1).write.mode("append").parquet(in)
    run() // ...restart from the checkpoint
    val got = EventsStream.scd2Table(spark, table)
      .select("user_id", "event_id", "value", "valid_from", "valid_to", "is_current")
      .collect().map(_.toSeq).toSet
    // the batch operator over the SAME logical input is the oracle
    val want = graft.SparkEntry.queries("q_scd2")(spark, sf)
      .select("user_id", "event_id", "value", "valid_from", "valid_to", "is_current")
      .collect().map(_.toSeq).toSet
    assert(got == want,
      s"stream table diverged from batch q_scd2: extra=${got.diff(want).take(3)} missing=${want.diff(got).take(3)}")
    assert(got.nonEmpty)
    // crash-safety of the snapshot chain: at most 2 snapshots retained,
    // each complete
    val snaps = new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b="))
    assert(snaps.length <= 2, snaps.map(_.getName).mkString(","))
    assert(snaps.forall(f => new java.io.File(f, "_SUCCESS").exists()))
  }

  test("SCD2 same-id replay merges against the pre-batch state and rewrites its snapshot deterministically") {
    val table = tmpDir("scd2-replay")
    val ev = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
    val b0 = ev.filter(col("event_id") % 2 === 0).limit(100)
    val b1 = ev.filter(col("event_id") % 2 === 1).limit(100)
    EventsStream.applyScd2Batch(b0, table, 0L)
    EventsStream.applyScd2Batch(b1, table, 1L)
    val before = EventsStream.scd2Table(spark, table)
      .collect().map(_.toSeq).toSet
    // at-least-once replay whose prior attempt COMPLETED the write (crash
    // between the _SUCCESS marker and the checkpoint commit): b=00001 is
    // already the newest complete snapshot, so prev-selection must take
    // the strictly-older b=00000 — reading b=00001 while overwriting it
    // would throw and crash-loop the stream on restart
    EventsStream.applyScd2Batch(b1, table, 1L)
    val after = EventsStream.scd2Table(spark, table)
      .collect().map(_.toSeq).toSet
    assert(after == before, "same-id replay changed the table")
    assert(after.nonEmpty)
  }

  test("SCD2 snapshot selection and retention order batch ids numerically past the %05d width") {
    val table = tmpDir("scd2-wide")
    val b = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").limit(5)
    EventsStream.applyScd2Batch(b, table, 99999L)
    EventsStream.applyScd2Batch(b, table, 100000L)
    // lexically "b=100000" < "b=99999"; numeric order must win for both
    // the retained set and prev-selection
    val names = new java.io.File(table).listFiles().map(_.getName).toSet
    assert(names == Set("b=99999", "b=100000"), names.toString)
    EventsStream.applyScd2Batch(b, table, 100001L)
    val after = new java.io.File(table).listFiles().map(_.getName).toSet
    assert(after == Set("b=100000", "b=100001"), after.toString)
  }

  test("streaming upsert sink converges replayed batches to one row per key") {
    val dir = tmpDir("upsert-in")
    val ev = Tables.load(spark, sf, "events").limit(300)
    ev.limit(150).write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir) // replays the first 150 + 150 new
    val q = EventsStream.upsertSink(
      spark.readStream.schema(EventsStream.eventSchema)
        .option("maxFilesPerTrigger", 1).parquet(dir),
      "stream_upsert_target", Seq("event_id")).start()
    try {
      q.processAllAvailable()
      val table = spark.table("stream_upsert_target")
      assert(table.count() == 300, s"got ${table.count()}")
      assert(table.select("event_id").distinct().count() == 300)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS stream_upsert_target")
    }
  }

  test("stream-static join enriches every micro-batch from the broadcast dim") {
    val dir = stageEvents()
    val dim = Seq(("click", "ui"), ("view", "ui"), ("purchase", "commerce"),
      ("signup", "growth"), ("error", "ops")).toDF("event_type", "category")
    val q = EventsStream.enriched(
      EventsStream.readEvents(spark, dir), dim, "event_type")
      .writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("enriched_stream")
      assert(out.count() == Tables.load(spark, sf, "events").count())
      assert(out.filter(col("category").isNull).count() == 0)
    } finally q.stop()
  }

  test("streaming dedup drops replayed ids within the watermark horizon") {
    val dir = tmpDir("dedup-in")
    val ev = Tables.load(spark, sf, "events").limit(200)
    // write the same 200 events twice → a replayed micro-batch; the second
    // replay RE-STAMPS the event time (+5 min) — a per-id dup that plain
    // dropDuplicates(id, ts) would let through
    ev.write.mode("overwrite").parquet(dir)
    ev.withColumn("ts", org.apache.spark.sql.functions.expr("ts + INTERVAL 5 MINUTES"))
      .write.mode("append").parquet(dir)
    val q = EventsStream.dedupedStream(
      spark.readStream.schema(EventsStream.eventSchema).parquet(dir))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_stream").count()
      assert(n == 200, s"expected 200 unique events, got $n")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch equivalent") {
    val dir = stageEvents()
    val stream = EventsStream.purchaseAttribution(
      EventsStream.readEvents(spark, dir), windowMinutes = 10)
    val q = stream.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val batch = EventsStream.purchaseAttribution(
        Tables.load(spark, sf, "events"), windowMinutes = 10)
      val streamed = spark.table("attrib")
        .select("purchase_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batched = batch
        .select("purchase_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batched.nonEmpty, "no attributable purchase/click pairs in test data")
      // watermark may hold back pairs near the end of event time → subset
      assert(streamed.subsetOf(batched))
      assert(streamed.size >= batched.size / 2,
        s"streamed ${streamed.size} of ${batched.size} pairs")
    } finally q.stop()
  }

  test("sessionize closes sessions after the inactivity gap") {
    val dir = tmpDir("sess-in")
    def ts(min: Int) = new Timestamp(3600_000L * 24 + min * 60_000L)
    // user 1: two bursts separated by 90 min → first session must close.
    // user 2: one burst. A late high-watermark event advances event time.
    val events = Seq(
      EventsStream.Event(1, ts(0), 1, "click", 1.0),
      EventsStream.Event(2, ts(10), 1, "click", 2.0),
      EventsStream.Event(3, ts(100), 1, "view", 3.0),
      EventsStream.Event(4, ts(5), 2, "click", 4.0),
      EventsStream.Event(5, ts(600), 3, "view", 0.5)).toDS()
    events.write.mode("overwrite").parquet(dir)

    val in = spark.readStream.schema(EventsStream.eventSchema).parquet(dir).as[EventsStream.Event]
    val q = EventsStream.sessionize(in, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val closed = spark.table("sessions")
        .as[EventsStream.Session].collect().toSeq
      val u1 = closed.filter(_.user_id == 1)
      assert(u1.exists(s => s.n_events == 2 && s.total_value == 3.0),
        s"expected user 1's first 2-event session closed, got $closed")
    } finally q.stop()
  }

  test("streamed closed sessions agree with the batch q_sessionize twin") {
    val dir = stageEvents()
    val in = spark.readStream.schema(EventsStream.eventSchema).parquet(dir)
      .as[EventsStream.Event]
    val q = EventsStream.sessionize(in, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_parity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions_parity")
        .select("user_id", "first_ts", "n_events")
        .as[(Long, Timestamp, Int)].collect()
        .map { case (u, f, n) => (u, f.getTime, n.toLong) }.toSet
      val batch = graft.SparkEntry.queries("q_sessionize")(spark, sf)
        .select("user_id", "first_ts", "n_events")
        .as[(Long, Timestamp, Long)].collect()
        .map { case (u, f, n) => (u, f.getTime, n) }.toSet
      // Append mode emits only watermark-closed sessions → subset, but
      // every emitted session must exist identically in the batch answer.
      assert(streamed.nonEmpty, "no sessions closed in the stream run")
      assert(streamed.subsetOf(batch),
        s"streamed sessions not in batch: ${streamed.diff(batch).take(5)}")
    } finally q.stop()
  }

  test("heavyHitters: SpaceSaving bounds hold, the heavy user survives eviction pressure") {
    val in = tmpDir("hh-in")
    def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d")
    // batch 1: user 7 hits 20×, users 1..3 hit 2× each (≤ capacity distinct
    // → no evictions, counts exact)
    val b1 = ((0 until 20).map(i =>
      EventsStream.Event(i.toLong, ts(i), 7L, "click", 1.0)) ++
      (1 to 3).flatMap(u => (0 until 2).map(i =>
        EventsStream.Event(100L + u * 10 + i, ts(i), u.toLong, "click", 1.0))))
    // batch 2: 12 distinct one-hit users — eviction pressure on capacity 8;
    // user 7's count is never the minimum, so it must survive untouched
    val b2 = (30 until 42).map(i =>
      EventsStream.Event(200L + i, ts(i), i.toLong, "click", 1.0))
    b1.toDF().coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1100)
    b2.toDF().coalesce(1).write.mode("append").parquet(in)
    val q = EventsStream.heavyHitters(
        EventsStream.readEvents(spark, in).as[EventsStream.Event],
        capacity = 8, k = 3)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("hh").as[EventsStream.HeavyHitter].collect()
    // snapshot after batch 1: exact counts (no eviction happened)
    val snap1 = rows.filter(_.n_seen == 26L)
    assert(snap1.exists(h => h.user_id == 7L && h.est == 20L && h.err == 0L),
      rows.mkString("; "))
    // snapshot after batch 2: the heavy user is still tracked exactly
    val snap2 = rows.filter(_.n_seen == 38L)
    assert(snap2.nonEmpty, rows.mkString("; "))
    assert(snap2.exists(h => h.user_id == 7L && h.est == 20L && h.err == 0L),
      snap2.mkString("; "))
    // SpaceSaving bounds on every emitted row: est ≥ est − err ≥ 0,
    // and an estimate can never exceed the stream length seen so far
    rows.foreach { h =>
      assert(h.est >= h.err && h.err >= 0L && h.est <= h.n_seen, h.toString)
    }
  }

  test("driftMonitor: warmup freezes the baseline, a shifted chunk is flagged, a steady one is clear") {
    val in = tmpDir("drift-in")
    def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d")
    // micro-batch 1 = exactly the warmup per type: alternating 9/11 → mean 10
    val b1 = (0 until 20).flatMap(i => Seq(
      EventsStream.Event(i.toLong, ts(i), 1L, "steady",
        if (i % 2 == 0) 9.0 else 11.0),
      EventsStream.Event(100L + i, ts(i), 2L, "shift",
        if (i % 2 == 0) 9.0 else 11.0)))
    // micro-batch 2: steady repeats the regime, shift jumps +10
    val b2 = (0 until 20).flatMap(i => Seq(
      EventsStream.Event(200L + i, ts(i), 1L, "steady",
        if (i % 2 == 0) 9.0 else 11.0),
      EventsStream.Event(300L + i, ts(i), 2L, "shift",
        if (i % 2 == 0) 19.0 else 21.0)))
    b1.toDF().coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1100) // distinct mtimes → deterministic file order
    b2.toDF().coalesce(1).write.mode("append").parquet(in)
    val q = EventsStream.driftMonitor(
        EventsStream.readEvents(spark, in).as[EventsStream.Event], warmup = 20)
      .writeStream.format("memory").queryName("drift_alerts")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("drift_alerts")
      .as[EventsStream.DriftAlert].collect()
    // batch 1 is fully absorbed by the warmup → verdicts only from batch 2
    assert(rows.length == 2, rows.mkString("; "))
    val byType = rows.map(r => r.event_type -> r).toMap
    assert(byType("shift").drifted && byType("shift").z > 3.0, byType.toString)
    assert(!byType("steady").drifted &&
      math.abs(byType("steady").z) < 1e-9, byType.toString)
    assert(byType("shift").n_base == 20L &&
      byType("shift").mean_base == 10.0 && byType("shift").mean_chunk == 20.0)
  }
}
