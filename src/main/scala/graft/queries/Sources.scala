package graft.queries

import graft.{Num, Tables}
import graft.io.DatasetConvention
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.Instant

/** Source/sink parity queries: the JSONL dataset convention round-trip and
  * the batch form of the streaming tumbling-window aggregate.
  */
object Sources {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val queries: Map[String, QFn] = Map(

    // Sink → source identity through the partitioned-JSONL convention
    // (≙ add_records_to_dataset then get_dataset, gcs.py:162-218/523-597):
    // documents written under {base}/docs/version=1/year=…/… and read back
    // via partition discovery must reproduce the table exactly.
    "q_dataset_roundtrip" -> ((s, d) => {
      val base = java.nio.file.Files.createTempDirectory("graft-ds").toString
      DatasetConvention.append(
        t(s, d, "documents").select(col("doc_id"), col("text"), col("n_chars")),
        base, "docs", version = 1, ts = Instant.parse("2024-01-15T00:00:00Z"))
      DatasetConvention.read(s, base, "docs", version = Some(1))
        .select(col("doc_id"), col("text"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Batch tumbling window over event time — the exact aggregation
    // EventsStream.windowedCounts runs incrementally; here verifiable
    // against DuckDB's date_trunc.
    "q_tumbling_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))),

    // Batch sessionization — the oracle-checkable twin of
    // EventsStream.sessionize (30-min inactivity gap). Gap-cut via lag +
    // running sum of new-session flags; interval arithmetic (not epoch
    // casts) so both engines compare timestamps exactly. One shuffle on
    // user_id serves both window passes and the final per-session
    // aggregate (same partitioning).
    "q_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
            .otherwise(0L))
        .withColumn("session_num", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_num"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
          Num.dsum(col("value")).as("total_value"))
        .orderBy(col("user_id"), col("session_num"))
    }),

    // Rolling time-range window: per user, count/sum over the trailing 10
    // minutes of EVENT TIME (a RANGE frame over epoch micros, not a rows
    // frame) — the per-entity rate/feature shape of a training pipeline.
    // One shuffle on user_id; range frames treat equal-timestamp peers
    // identically in both engines, so ties are deterministic.
    "q_window_timerange" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-600L * 1000000L, 0L)
      t(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_10m"),
          sum(col("value").cast(Num.Dec)).over(w).cast("double").as("value_10m"))
        .orderBy(col("event_id"))
    }),

    // As-of join: every purchase carries the user's most recent prior (or
    // simultaneous) click. Spark-first shape: NO join at all — one window
    // pass over the event stream carrying the last click forward
    // (`last(..., ignoreNulls)` over rows-unbounded-preceding), then filter
    // to purchases. At 100 TB this is one shuffle on user_id and a linear
    // scan per partition, where a per-key range join would build and probe
    // giant per-user click sets. Deterministic tiebreak: (ts, event_id).
    "q_asof_join" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("last_click_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("last_click_id"), col("last_click_ts"))
        .orderBy(col("purchase_id"))
    }),

    // Batch run of the STREAMING interval-join code path:
    // EventsStream.purchaseAttribution is called on a batch DataFrame
    // (withWatermark is a no-op in batch), proving the stream and batch
    // answers come from one implementation — and checking it against the
    // DuckDB interval join.
    "q_interval_join" -> ((s, d) =>
      graft.streaming.EventsStream.purchaseAttribution(t(s, d, "events"), 10)
        .orderBy(col("purchase_id"), col("click_id")))
  )

  val oracleSql: Map[String, String] = Map(
    // Round-trip is identity over the source table.
    "q_dataset_roundtrip" ->
      "SELECT doc_id, text, n_chars FROM documents ORDER BY doc_id",

    "q_tumbling_window" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type,
         |  COUNT(*) AS n, ${Num.sqlDsum("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

    "q_sessionize" ->
      s"""WITH l AS (
         |  SELECT user_id, event_id, ts, value,
         |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
         |                 THEN 1 ELSE 0 END AS new_sess
         |  FROM l),
         |s AS (
         |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_num
         |  FROM f)
         |SELECT user_id, session_num, COUNT(*) AS n_events,
         |  CAST(MIN(ts) AS TIMESTAMP) AS first_ts,
         |  CAST(MAX(ts) AS TIMESTAMP) AS last_ts,
         |  ${Num.sqlDsum("value")} AS total_value
         |FROM s GROUP BY user_id, session_num
         |ORDER BY user_id, session_num""".stripMargin,

    "q_window_timerange" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  COUNT(*) OVER w AS n_10m,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS value_10m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // Equivalent window-carry SQL (DuckDB's native ASOF JOIN has an
    // unspecified tiebreak among equal timestamps; the window form pins
    // (ts, event_id) in both engines).
    "q_asof_join" ->
      """WITH w AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS last_click_id,
        |    LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS last_click_ts
        |  FROM events)
        |SELECT event_id AS purchase_id, user_id,
        |  CAST(ts AS TIMESTAMP) AS purchase_ts,
        |  last_click_id, CAST(last_click_ts AS TIMESTAMP) AS last_click_ts
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,

    "q_interval_join" ->
      """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  c.event_id AS click_id,
        |  CAST(p.ts AS TIMESTAMP) AS purchase_ts,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts, p.value AS value
        |FROM events p
        |JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
        |ORDER BY purchase_id, click_id""".stripMargin
  )
}
