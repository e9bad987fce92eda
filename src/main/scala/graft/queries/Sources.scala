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
        .orderBy(col("win_start"), col("event_type")))
  )

  val oracleSql: Map[String, String] = Map(
    // Round-trip is identity over the source table.
    "q_dataset_roundtrip" ->
      "SELECT doc_id, text, n_chars FROM documents ORDER BY doc_id",

    "q_tumbling_window" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type,
         |  COUNT(*) AS n, ${Num.sqlDsum("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
  )
}
