package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import java.sql.Timestamp

/** Structured Streaming over the events table.
  *
  * The reference has no streaming surface — its closest analog is hourly
  * micro-batch JSONL files (gcs.py:42-55) plus append-only inserts
  * (bq.py:386-417). This module is the engine's forward-looking stream
  * layer: a file-source stream (new files per micro-batch ≙ the hourly
  * objects), watermarked tumbling-window aggregation, and custom session
  * state via flatMapGroupsWithState. All operators are incremental and
  * state-bounded (watermark evicts), so the same code runs unbounded at
  * production scale.
  */
object EventsStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Int, first_ts: Timestamp,
                           last_ts: Timestamp, total_value: Double)

  /** The converted (µs-timestamp) events schema — what [[graft.Tables.load]]
    * produces and what staged stream input dirs contain. */
  def eventSchema: StructType =
    StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")

  /** File-source stream: each new parquet file in `dir` is a micro-batch
    * (≙ one hourly JSONL object landing in GCS). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** Watermarked tumbling-or-hopping window counts per event type. A
    * `slide` shorter than the width makes the windows overlap (each event
    * lands in width/slide windows — the batch twin is q_hopping_window);
    * the default slide = width is a tumbling window. Late data beyond
    * the watermark is dropped; state size is bounded by
    * (#windows in watermark horizon) × (#event types). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours",
                     slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide.getOrElse(window_)), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming trailing-window distinct users via HLL sketches — the
    * streaming twin of the batch q_sliding_distinct: `window(ts, 7d, 1d)`
    * fans each event into its ≤7 trailing windows and the per-window
    * state is ONE mergeable sketch (a few KB), not a distinct-user set —
    * the only way windowed distincts stay bounded on an unbounded
    * stream. Estimates carry the same ±rsd contract the batch twin
    * pins; exactness is impossible here by design (exact distinct would
    * hold every user id in state forever). */
  def slidingDistinct(events: DataFrame, width: String = "7 days",
                      slide: String = "1 day",
                      watermark: String = "14 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("apx_users"))
      .select(col("window.end").as("win_end"), col("apx_users"))

  /** Streaming upsert sink: every micro-batch merges into a catalog table
    * by key via foreachBatch + [[graft.tables.TableOps.upsertTable]] — the
    * streaming twin of the reference's MERGE ingestion (bq.py:450-554).
    * Replays and late duplicates converge to one row per key. */
  def upsertSink(stream: DataFrame, table: String, keys: Seq[String]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      if (!spark.catalog.tableExists(table))
        graft.tables.TableOps.createTableAs(spark, table, batch)
      else
        graft.tables.TableOps.upsertTable(spark, table, batch, keys)
    }

  /** Stream–static enrichment join: each micro-batch joins against the
    * (broadcast) dimension snapshot — no streaming state at all, the
    * standard shape for attaching reference data to a 100 TB/day stream. */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup by id (the training-pipeline ingest guard):
    * `dropDuplicatesWithinWatermark` keeps ONE row per id even when a
    * replay re-stamps the event time — duplicates are dropped as long as
    * they arrive within the watermark delay of the first sighting, and
    * state is evicted after it (bounded by the horizon). Plain
    * `dropDuplicates(id, ts)` would only drop exact (id, ts) replays. */
  def dedupedStream(events: DataFrame, idCol: String = "event_id",
                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream–stream interval join: purchases attributed to the same user's
    * clicks within `windowMinutes` before the purchase. Both sides are
    * watermarked so the join state is evicted once event time passes the
    * interval bound — the canonical bounded-state stream–stream shape. */
  def purchaseAttribution(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", s"$windowMinutes minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", s"$windowMinutes minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** The NATIVE streaming session-window operator — the same
    * `session_window` expression as the batch `q_session_window` query,
    * maintained incrementally with watermark-bounded state. Sessions are
    * emitted (append mode) once the watermark passes their end; state per
    * key is one merged [start, last+gap) interval, evicted on emit. The
    * batch twin is oracle-verified, and the spec proves every closed
    * streamed session is byte-identical to its batch-computed row — the
    * "one definition, two runtimes" contract. */
  def nativeSessions(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("win_start"),
        col("session_window.end").as("win_end"),
        col("n_events"), col("total_value"))

  final case class HeavyState(counts: Map[Long, (Long, Long)], n: Long)

  final case class HeavyHitter(event_type: String, user_id: Long,
      est: Long, err: Long, n_seen: Long)

  /** Streaming heavy hitters — SpaceSaving (Metwally et al. 2005) per
    * event type: which users dominate the feed, answered with O(capacity)
    * state per group no matter how many distinct users pass. Tracked item
    * → count+1; new item with room → (1,0); new item at capacity evicts
    * the min-count entry and inherits its count as the error bound. The
    * classical guarantees hold for ANY arrival order (est ≥ true ≥
    * est − err; every user with true share > 1/capacity is tracked), so
    * the operator is exact-by-bounds even though the post-shuffle
    * iterator order inside a micro-batch is arbitrary — the eviction
    * victim is chosen by the total (count, user_id) order, so equal-count
    * ties break deterministically. Update-mode output: the current top-k
    * snapshot per (type, micro-batch) — the batch twin of the count-min
    * q_heavy_hitters panel, state-bounded for an unbounded stream. */
  def heavyHitters(events: Dataset[Event], capacity: Int = 8,
      k: Int = 3): Dataset[HeavyHitter] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[HeavyState, HeavyHitter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (ty: String, batch: Iterator[Event], state: GroupState[HeavyState]) =>
          val st = state.getOption.getOrElse(HeavyState(Map.empty, 0L))
          var m = st.counts
          var n = st.n
          batch.foreach { e =>
            n += 1
            m.get(e.user_id) match {
              case Some((c, err)) => m = m.updated(e.user_id, (c + 1, err))
              case None if m.size < capacity =>
                m = m.updated(e.user_id, (1L, 0L))
              case None =>
                val (victim, (cmin, _)) =
                  m.minBy { case (uid, (c, _)) => (c, uid) }
                m = (m - victim).updated(e.user_id, (cmin + 1, cmin))
            }
          }
          state.update(HeavyState(m, n))
          m.toSeq.sortBy { case (uid, (c, _)) => (-c, uid) }.take(k)
            .map { case (uid, (c, err)) => HeavyHitter(ty, uid, c, err, n) }
            .iterator
      }
  }

  final case class DriftState(n: Long, sum: Double, sumsq: Double)

  final case class DriftAlert(event_type: String, n_base: Long,
      mean_base: Double, n_chunk: Long, mean_chunk: Double,
      z: Double, drifted: Boolean)

  /** Streaming drift monitor — the q_psi_drift / q_changepoint shape made
    * INCREMENTAL: per event type, the first `warmup` values build a
    * baseline (count/sum/sumsq — mergeable Welford-style moments, O(1)
    * state per group forever); every later micro-batch chunk is z-tested
    * against that frozen baseline (z = (m_chunk − m_base)/(s_base/√n)),
    * emitting one verdict row per (type, chunk). This is the serving-side
    * twin of the batch drift panels: same statistic, but the data is seen
    * once, in arrival order, with bounded state — the shape that monitors
    * a feed at production scale without ever re-scanning history. */
  def driftMonitor(events: Dataset[Event], warmup: Long = 100,
      zThreshold: Double = 3.0): Dataset[DriftAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftState, DriftAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (ty: String, batch: Iterator[Event], state: GroupState[DriftState]) =>
          // The baseline absorbs values until warmup; the remainder of
          // the chunk (if any) is tested as ONE unit. Within a micro-
          // batch the iterator order after the group shuffle is
          // arbitrary, so the monitor is exact when the warmup boundary
          // aligns with micro-batch edges (the staged-feed case);
          // mid-chunk, the baseline takes an arbitrary warmup-sized
          // subset — statistically equivalent for a monitor, and both
          // the absorbed sums and the tested mean are order-independent.
          // The iterator is folded INCREMENTALLY (round-12 advice): no
          // per-group buffer, so peak memory is O(1) per group even when
          // one event type dominates a huge micro-batch — the bounded-
          // state framing above holds for the pass itself, not just the
          // retained state.
          val st = state.getOption.getOrElse(DriftState(0L, 0.0, 0.0))
          var bn = st.n; var bs = st.sum; var bq = st.sumsq
          var cn = 0L; var cs = 0.0
          batch.foreach { e =>
            val v = e.value
            if (bn < warmup) { bn += 1; bs += v; bq += v * v }
            else { cn += 1; cs += v }
          }
          state.update(DriftState(bn, bs, bq))
          if (cn == 0L || bn < 2) Iterator.empty
          else {
            val mb = bs / bn
            val vb = math.max(1e-12, (bq - bs * bs / bn) / (bn - 1))
            val mc = cs / cn
            val z = (mc - mb) / math.sqrt(vb / cn)
            Iterator.single(DriftAlert(ty, bn, mb, cn, mc, z,
              math.abs(z) > zThreshold))
          }
      }
  }

  /** Custom sessionization state machine: per-user sessions closed after
    * `gapMinutes` of event-time inactivity (flatMapGroupsWithState with
    * event-time timeout). Emits a row per closed session. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val closed = state.get
            state.remove()
            Iterator.single(closed)
          } else {
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            val closedAndOpen = evs.foldLeft(
              (List.empty[Session], state.getOption)) {
              case ((closed, cur), e) =>
                cur match {
                  case Some(sess)
                      if e.ts.getTime - sess.last_ts.getTime <= gapMinutes * 60000L =>
                    (closed, Some(sess.copy(
                      n_events = sess.n_events + 1, last_ts = e.ts,
                      total_value = sess.total_value + e.value)))
                  case Some(sess) =>
                    (sess :: closed, Some(Session(userId, 1, e.ts, e.ts, e.value)))
                  case None =>
                    (closed, Some(Session(userId, 1, e.ts, e.ts, e.value)))
                }
            }
            closedAndOpen._2.foreach { open =>
              state.update(open)
              state.setTimeoutTimestamp(open.last_ts.getTime + gapMinutes * 60000L)
            }
            closedAndOpen._1.reverseIterator
          }
      }
  }

  /** Read the current SCD2 validity table maintained by [[scd2Ingest]]:
    * the newest complete (`_SUCCESS`-marked) snapshot, or an empty frame
    * of the right schema before the first batch lands. */
  def scd2Table(spark: SparkSession, dir: String): DataFrame =
    scd2Read(spark, scd2Snapshots(dir).lastOption.map(_._2.getAbsolutePath))

  /** The SCD2 state as of BEFORE batch `id`: the newest complete snapshot
    * whose batch id is STRICTLY LESS than `id`. An at-least-once replay
    * whose prior attempt already committed `b=<id>` (crash between the
    * `_SUCCESS` marker and the checkpoint commit) must NOT read its own
    * snapshot as `prev` — `out.write.mode(overwrite)` would then target
    * the path being read (Spark refuses, crash-looping the stream on
    * every restart) — and merging against the pre-batch state is exactly
    * what makes the replayed rewrite deterministic. */
  private[graft] def scd2TableBefore(spark: SparkSession, dir: String,
                                     id: Long): DataFrame =
    scd2Read(spark, scd2Snapshots(dir).takeWhile(_._1 < id)
      .lastOption.map(_._2.getAbsolutePath))

  private def scd2Read(spark: SparkSession, path: Option[String]): DataFrame = {
    val schema = StructType.fromDDL(
      "user_id BIGINT, event_id BIGINT, value DOUBLE, " +
        "valid_from TIMESTAMP, valid_to TIMESTAMP, is_current BOOLEAN")
    path match {
      case Some(p) => spark.read.schema(schema).parquet(p)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Complete (`_SUCCESS`-marked) snapshots under `dir`, sorted by the
    * NUMERIC batch id parsed from the `b=<id>` name. Lexical order
    * diverges from numeric once the %05d format widens past id 99999
    * ("b=100000" < "b=99999" lexically), which would corrupt both
    * prev-selection and retention — so every reader parses the id. */
  private def scd2Snapshots(dir: String): Seq[(Long, java.io.File)] = {
    val root = new java.io.File(dir)
    Option(root.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("b=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f => scala.util.Try(
        (f.getName.stripPrefix("b=").toLong, f)).toOption)
      .sortBy(_._1)
  }

  /** STREAMING SCD2 / CDC APPLY (round-12 stretch #8) — the reference's
    * upsert made incremental on a VERSIONED dimension: each micro-batch
    * of purchase events is merged into the slowly-changing validity table
    * that the batch q_scd2 builds in one pass, via the same anti-join +
    * union choreography as the reference's MERGE (bq.py:450-554) —
    * extended with version REBUILD, because an SCD2 merge does not just
    * replace rows, it re-chains valid_from/valid_to:
    *   1. `touched` = the batch's user keys (bounded by the batch);
    *   2. untouched users' rows pass through via ONE LEFT ANTI join —
    *      the fact history never reshuffles for keys the batch misses;
    *   3. touched users' history (existing versions ∪ incoming rows,
    *      deduped on (user, event) so an at-least-once replay cannot
    *      double-insert) is re-chained with the SAME per-user
    *      (valid_from, event_id) lead window as the batch operator — so
    *      out-of-order arrivals across batches converge to the batch
    *      answer, not just append-order approximations;
    *   4. the new table lands as a `b=<batchId>` snapshot whose
    *      `_SUCCESS` marker is the commit point (crash mid-write leaves
    *      an unmarked dir that readers skip; a replayed batch rewrites
    *      its own snapshot deterministically — the DocsStream
    *      idempotency discipline), and all but the newest two snapshots
    *      are pruned after the marker lands.
    * State lives entirely in storage (no streaming state store), so the
    * apply cost per batch is |touched users' history| + one anti-join —
    * the merge-on-touched-keys shape a production CDC apply pays. */
  def scd2Ingest(events: DataFrame, dir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.filter(col("event_type") === "purchase")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyScd2Batch(batch, dir, id)
      }

  /** One SCD2 merge step — exposed for spec-level replay tests. */
  private[graft] def applyScd2Batch(batch: DataFrame, dir: String,
                                    id: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val s = batch.sparkSession
    val incoming = batch.select(col("user_id"), col("event_id"),
      col("value"), col("ts").as("valid_from"))
    val prev = scd2TableBefore(s, dir, id)
    val touched = incoming.select(col("user_id")).distinct()
    val kept = prev.join(broadcast(touched), Seq("user_id"), "left_anti")
    val affected = prev.join(broadcast(touched), Seq("user_id"), "left_semi")
      .select(col("user_id"), col("event_id"), col("value"),
        col("valid_from"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_id"))
    val rebuilt = affected.unionByName(incoming)
      .dropDuplicates("user_id", "event_id")
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
    val out = kept.unionByName(rebuilt)
    val snap = f"$dir/b=$id%05d"
    out.write.mode("overwrite").parquet(snap)
    // retention AFTER the new marker exists: keep the newest two
    // snapshots (current + rollback), prune the rest — a crash between
    // marker and prune only leaves extra history behind
    val root = new java.io.File(dir)
    Option(root.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("b="))
      .sortBy(f => scala.util.Try(
        f.getName.stripPrefix("b=").toLong).getOrElse(-1L))
      .dropRight(2)
      .foreach { f =>
        java.nio.file.Files.walk(f.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
  }
}
