package graft.tables

import graft.merge.Merge
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table lifecycle operators (≙ reference BigQuery table management:
  * create/check/get/delete bq.py:50-117, strict insert bq.py:119-147,
  * CTAS bq.py:420-447/651-675, low-downtime replace bq.py:557-591,
  * upsert bq.py:450-554) on the Spark session catalog.
  *
  * The reference's retry/backoff machinery (bq.py:321-383) is subsumed by
  * Spark's task retries; its chunked-insert batching (bq.py:386-417) by
  * partition-parallel writes (`repartition(n)` ≙ chunk count).
  */
object TableOps {

  /** ≙ check_table (bq.py:50-65). */
  def checkTable(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** ≙ get_table schema fetch (bq.py:67-75). */
  def tableSchema(spark: SparkSession, table: String): StructType =
    spark.table(table).schema

  /** ≙ create_table with explicit schema (bq.py:77-103). */
  def createTable(spark: SparkSession, table: String, schema: StructType): Unit = {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    empty.write.mode(SaveMode.ErrorIfExists).saveAsTable(table)
  }

  /** ≙ idempotent delete_table (bq.py:276-299): check-first, warn-if-absent. */
  def deleteTable(spark: SparkSession, table: String): Boolean =
    if (checkTable(spark, table)) { spark.sql(s"DROP TABLE $table"); true }
    else { Console.err.println(s"[graft] delete_table: $table does not exist"); false }

  /** Strict append (≙ insert with ignore_unknown_values=False,
    * skip_invalid_rows=False — bq.py:142-143): schema must equal the
    * target's (names + types), else reject the whole batch. */
  def insertStrict(spark: SparkSession, table: String, rows: DataFrame): Unit = {
    Merge.requireSameSchema(spark.table(table), rows)
    rows.write.mode(SaveMode.Append).insertInto(table)
  }

  /** ≙ chunked insert (bq.py:386-417): the reference splits records into
    * chunks of 1000 per request; in Spark the chunk count maps to write
    * parallelism — one task per chunk, retried independently
    * (`spark.task.maxFailures` ≙ the per-chunk tenacity retry). */
  def insertChunked(spark: SparkSession, table: String, rows: DataFrame,
                    chunks: Int): Unit =
    insertStrict(spark, table, rows.repartition(chunks))

  /** ≙ run_command (bq.py:219-234): DDL/DML with empty result. */
  def runCommand(spark: SparkSession, commandSql: String): Unit = {
    spark.sql(commandSql).collect()
    ()
  }

  /** ≙ create_table_from_query / create_or_replace_table_as
    * (bq.py:651-675, 420-447). Spark's overwrite of a catalog table is
    * atomic per table, which is the property the reference builds its
    * tmp-swap choreography for. */
  def createTableAs(spark: SparkSession, table: String, query: DataFrame,
                    overwrite: Boolean = false): Unit =
    query.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .saveAsTable(table)

  /** Low-downtime replace (≙ replace_table, bq.py:557-591): stage the new
    * contents in `<table>_tmp`, swap via atomic overwrite, drop tmp. The
    * tmp stage also breaks read-from-write cycles when `rows` derives from
    * the target itself. */
  def replaceTable(spark: SparkSession, table: String, rows: DataFrame): Unit = {
    val tmp = s"${table}_tmp"
    deleteQuietly(spark, tmp)
    rows.write.mode(SaveMode.Overwrite).saveAsTable(tmp)
    try spark.table(tmp).write.mode(SaveMode.Overwrite).saveAsTable(table)
    finally deleteQuietly(spark, tmp)
  }

  /** ≙ upsert_table_from_records (bq.py:450-554): schema-gate the updates
    * against the target (raises SchemaMismatchException, ≙ bq.py:523-531),
    * merge by key, swap through tmp (≙ tmp-table choreography incl. cleanup
    * on failure, test_bq.py:506-533 — the real table is never dropped). */
  def upsertTable(spark: SparkSession, table: String, updates: DataFrame,
                  keys: Seq[String]): Unit = {
    val target = spark.table(table)
    val merged = Merge.upsert(target, updates, keys) // schema gate inside
    replaceTable(spark, table, merged)
  }

  /** Bucketed + sorted table write: co-locates rows by join/aggregation key
    * so equi-joins and groupBys between same-bucketed tables run with ZERO
    * shuffle (Catalyst reuses the bucketing as the required distribution).
    * At 100 TB this is the difference between re-shuffling the fact table
    * per query and never shuffling it at all — bucket once at ingest,
    * join forever. */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                   overwrite: Boolean = false): Unit =
    df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  private def deleteQuietly(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
