package graft.tables

import graft.merge.Merge
import graft.schema.SchemaInference
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Table lifecycle operators (≙ reference BigQuery table management:
  * create/check/get/delete bq.py:50-117, strict insert bq.py:119-147,
  * CTAS bq.py:420-447/651-675, low-downtime replace bq.py:557-591,
  * upsert bq.py:450-554) on the Spark session catalog.
  *
  * The reference's per-chunk insert retry (bq.py:367-383) is subsumed by
  * Spark's task retries; its chunked-insert batching (bq.py:386-417) by
  * partition-parallel writes (`repartition(n)` ≙ chunk count); its
  * create-on-Conflict retry (bq.py:321-364) is [[createTableRetrying]].
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

  /** ≙ create_table's Conflict retry (bq.py:321-364: tenacity 3 attempts,
    * exponential backoff min 1 s): a TRANSIENT Conflict — a just-deleted
    * table whose deletion is still settling in an eventually-consistent
    * catalog — resolves on a later attempt; a persistent Conflict (the
    * table really exists) propagates after the final attempt. The local
    * catalog is strongly consistent, so this is observable-behavior parity,
    * exercised in TableOpsSpec via an injected transient conflict. */
  def createTableRetrying(spark: SparkSession, table: String, schema: StructType,
                          attempts: Int = 3,
                          sleep: Long => Unit = Thread.sleep): Unit =
    retryOnConflict(attempts, sleep)(createTable(spark, table, schema))

  /** Retry `body` on table-already-exists up to `attempts` times with
    * exponential backoff (1 s, 2 s, …, ≙ tenacity.wait_exponential(min=1));
    * the last attempt's Conflict propagates. */
  private[tables] def retryOnConflict[T](attempts: Int, sleep: Long => Unit)
                                        (body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException =>
          if (attempt >= attempts) throw e
          Console.err.println(
            s"[graft] create_table: Conflict on attempt $attempt/$attempts, retrying: ${e.getMessage}")
          sleep(1000L << (attempt - 1))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** ≙ idempotent delete_table (bq.py:276-299): check-first, warn-if-absent. */
  def deleteTable(spark: SparkSession, table: String): Boolean =
    if (checkTable(spark, table)) { spark.sql(s"DROP TABLE $table"); true }
    else { Console.err.println(s"[graft] delete_table: $table does not exist"); false }

  /** Strict append (≙ insert with ignore_unknown_values=False,
    * skip_invalid_rows=False — bq.py:142-143): schema must equal the
    * target's (names + types), else reject the whole batch. */
  def insertStrict(spark: SparkSession, table: String, rows: DataFrame): Unit = {
    val target = spark.table(table)
    Merge.requireSameSchema(target, rows)
    // BigQuery's insert matches values to columns BY NAME; Spark's
    // insertInto is positional — reorder to the target's layout so a
    // same-schema-different-order batch lands in the right columns.
    rows.select(target.columns.map(col): _*)
      .write.mode(SaveMode.Append).insertInto(table)
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

  /** Record-level upsert composite (≙ upsert_table_from_records end to
    * end): empty records → warn no-op, nothing touched
    * (test_bq.py:492-505); MISSING target → create_table_from_records
    * instead of raising (bq.py:497-512, test_bq.py:537-562); else decode
    * records with the target's schema — or the records' inferred schema
    * when `useTargetSchema=false`, whose mismatch then raises through the
    * upsert's schema gate (test_bq.py:507-534) — and merge by key. */
  def upsertTableFromRecords(spark: SparkSession, table: String,
                             records: Seq[String], keys: Seq[String],
                             useTargetSchema: Boolean = true): Unit = {
    if (records.isEmpty) {
      Console.err.println(
        "[graft] upsert_table_from_records: no records to upsert (empty collection given)")
      return
    }
    if (!checkTable(spark, table)) {
      createTableFromRecords(spark, table, records)
      return
    }
    val schema =
      if (useTargetSchema) tableSchema(spark, table)
      else SchemaInference.inferFromJson(records)
    import spark.implicits._
    val updates = spark.read.schema(schema).json(spark.createDataset(records))
    upsertTable(spark, table, updates, keys)
  }

  /** Bucketed + sorted table write: co-locates rows by join/aggregation key
    * so equi-joins and groupBys between same-bucketed tables run with ZERO
    * shuffle (Catalyst reuses the bucketing as the required distribution).
    * At 100 TB this is the difference between re-shuffling the fact table
    * per query and never shuffling it at all — bucket once at ingest,
    * join forever. */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                   overwrite: Boolean = false, path: Option[String] = None): Unit = {
    val w = df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .bucketBy(buckets, key)
      .sortBy(key)
    // path → EXTERNAL bucketed table (data lives outside the session
    // warehouse — the ingest-once layout a whole fleet of sessions then
    // joins against); no path → managed.
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** JSON-record insert with per-row error collection (≙ insert,
    * bq.py:119-147: `insert_rows_json` returns per-row errors; the
    * reference gathers ALL of them and raises one ValueError). Validation
    * runs before any write, so a bad batch leaves the table untouched
    * (≙ skip_invalid_rows=False rejecting the request). Unknown fields are
    * errors (≙ ignore_unknown_values=False); missing fields land as NULL.
    */
  def insertRecords(spark: SparkSession, table: String, records: Seq[String]): Unit = {
    val schema = tableSchema(spark, table)
    val errors = records.zipWithIndex.flatMap { case (rec, i) =>
      validateRecord(rec, schema, i)
    }
    if (errors.nonEmpty)
      throw new InsertErrorsException(errors)
    import spark.implicits._
    // read.schema(...) yields columns in target order → positional insertInto is safe
    spark.read.schema(schema).json(spark.createDataset(records))
      .write.mode(SaveMode.Append).insertInto(table)
  }

  /** ≙ create_table_from_records (bq.py:594-648): empty records → warn
    * no-op; overwrite → replace-through-tmp; else create with inferred
    * (or given) schema then insert. Create on an existing table raises
    * (≙ google Conflict), leaving the existing table untouched. */
  def createTableFromRecords(spark: SparkSession, table: String,
                             records: Seq[String], overwrite: Boolean = false,
                             schema: Option[StructType] = None): Unit = {
    if (records.isEmpty) {
      Console.err.println(
        "[graft] create_table_from_records: no records to create a table from (empty collection given)")
      return
    }
    val sch = schema.getOrElse(SchemaInference.inferFromJson(records))
    import spark.implicits._
    if (overwrite) {
      val df = spark.read.schema(sch).json(spark.createDataset(records))
      replaceTable(spark, table, df) // tmp-swap, works whether target exists
    } else {
      createTable(spark, table, sch)
      insertRecords(spark, table, records)
    }
  }

  /** Driver-side per-row validation of one JSON record against the target
    * schema. Mirrors the BigQuery streaming-insert contract the reference
    * relies on: unknown field → error, cross-kind value → error, null /
    * missing ok (all fields nullable), int accepted where double expected.
    */
  private def validateRecord(rec: String, schema: StructType, idx: Int): Seq[String] = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val node =
      try new ObjectMapper().readTree(rec)
      catch { case e: Exception =>
        return Seq(s"row $idx: unparseable JSON: ${e.getMessage}")
      }

    def check(n: JsonNode, dt: DataType, path: String): Unit = (n, dt) match {
      case (x, _) if x == null || x.isNull => () // nullable everywhere
      case (x, LongType | IntegerType | ShortType | ByteType) =>
        if (!x.isIntegralNumber) errs += s"row $idx: $path: expected integer, got ${x.getNodeType}"
      case (x, DoubleType | FloatType | _: DecimalType) =>
        if (!x.isNumber) errs += s"row $idx: $path: expected number, got ${x.getNodeType}"
      case (x, BooleanType) =>
        if (!x.isBoolean) errs += s"row $idx: $path: expected boolean, got ${x.getNodeType}"
      case (x, StringType | BinaryType) =>
        if (!x.isTextual) errs += s"row $idx: $path: expected string, got ${x.getNodeType}"
      // Malformed temporal strings must reject the BATCH (≙ BigQuery raising
      // per-row insert errors) — without this check the subsequent
      // PERMISSIVE-mode read would silently land them as NULL. Parse with
      // Spark's own lexer so validation acceptance matches the reader's.
      case (x, TimestampType) =>
        if (!x.isTextual) errs += s"row $idx: $path: expected timestamp string, got ${x.getNodeType}"
        else if (org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
          org.apache.spark.unsafe.types.UTF8String.fromString(x.asText()),
          java.time.ZoneOffset.UTC).isEmpty)
          errs += s"row $idx: $path: unparseable timestamp '${x.asText()}'"
      case (x, DateType) =>
        if (!x.isTextual) errs += s"row $idx: $path: expected date string, got ${x.getNodeType}"
        else if (org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToDate(
          org.apache.spark.unsafe.types.UTF8String.fromString(x.asText())).isEmpty)
          errs += s"row $idx: $path: unparseable date '${x.asText()}'"
      case (x, ArrayType(elem, _)) =>
        if (!x.isArray) errs += s"row $idx: $path: expected array, got ${x.getNodeType}"
        else {
          var i = 0
          val it = x.elements()
          while (it.hasNext) { check(it.next(), elem, s"$path[$i]"); i += 1 }
        }
      case (x, st: StructType) =>
        if (!x.isObject) errs += s"row $idx: $path: expected object, got ${x.getNodeType}"
        else checkObj(x, st, path)
      case _ => () // remaining Spark types have no JSON-record source here
    }

    def checkObj(n: JsonNode, st: StructType, path: String): Unit = {
      val known = st.fieldNames.toSet
      val it = n.fieldNames()
      while (it.hasNext) {
        val k = it.next()
        if (!known.contains(k)) errs += s"row $idx: $path.$k: unknown field"
      }
      st.fields.foreach { f =>
        if (n.has(f.name)) check(n.get(f.name), f.dataType, s"$path.${f.name}")
      }
    }

    if (!node.isObject) Seq(s"row $idx: record is not a JSON object")
    else { checkObj(node, schema, "$"); errs.toSeq }
  }

  private def deleteQuietly(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}

/** All per-row insert errors for a rejected batch (≙ the reference's
  * `ValueError(f"Found errors when inserting rows: {errors}")`,
  * bq.py:144-147) — the batch is rejected atomically, nothing written. */
final class InsertErrorsException(val errors: Seq[String])
  extends RuntimeException(s"Found errors when inserting rows: ${errors.mkString("; ")}")
