package graft.tables

import graft.SparkSpec
import graft.merge.SchemaMismatchException
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshTable(): String = { n += 1; s"t_ops_$n" }

  test("create / check / delete lifecycle; idempotent delete warns not throws") {
    val t = freshTable()
    assert(!TableOps.checkTable(spark, t))
    TableOps.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    assert(TableOps.checkTable(spark, t))
    assert(TableOps.tableSchema(spark, t).fieldNames.toSeq == Seq("id", "name"))
    assert(TableOps.deleteTable(spark, t))
    assert(!TableOps.deleteTable(spark, t)) // ≙ idempotent wrapper bq.py:276-299
  }

  test("strict insert appends matching schema, rejects mismatched") {
    val t = freshTable()
    TableOps.createTableAs(spark, t, Seq((1L, "a")).toDF("id", "name"))
    TableOps.insertStrict(spark, t, Seq((2L, "b")).toDF("id", "name"))
    assert(spark.table(t).count() == 2)
    intercept[SchemaMismatchException] {
      TableOps.insertStrict(spark, t, Seq(("x", "b")).toDF("id", "name"))
    }
    assert(spark.table(t).count() == 2) // nothing partial landed
  }

  test("chunked insert lands all rows; runCommand executes DDL") {
    val t = freshTable()
    TableOps.createTableAs(spark, t, Seq((0L, "z")).toDF("id", "name"))
    TableOps.insertChunked(spark, t,
      (1L to 20L).map(i => (i, s"r$i")).toDF("id", "name"), chunks = 4)
    assert(spark.table(t).count() == 21)
    TableOps.runCommand(spark, s"ALTER TABLE $t SET TBLPROPERTIES ('graft.test'='1')")
    TableOps.runCommand(spark, s"DROP TABLE $t")
    assert(!TableOps.checkTable(spark, t))
  }

  test("createTableAs overwrite ≙ CREATE OR REPLACE TABLE AS") {
    val t = freshTable()
    TableOps.createTableAs(spark, t, Seq((1L, "a")).toDF("id", "name"))
    TableOps.createTableAs(spark, t, Seq((7L, "z"), (8L, "w")).toDF("id", "name"),
      overwrite = true)
    assert(spark.table(t).count() == 2)
  }

  test("replaceTable swaps through tmp and cleans it up (≙ bq.py:557-591)") {
    val t = freshTable()
    TableOps.createTableAs(spark, t, Seq((1L, "a")).toDF("id", "name"))
    TableOps.replaceTable(spark, t, Seq((9L, "r")).toDF("id", "name"))
    assert(spark.table(t).as[(Long, String)].collect().toSeq == Seq((9L, "r")))
    assert(!TableOps.checkTable(spark, s"${t}_tmp")) // tmp dropped
  }

  test("upsertTable merges by key in place; real table never dropped mid-flight") {
    val t = freshTable()
    TableOps.createTableAs(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    TableOps.upsertTable(spark, t, Seq((2L, "B"), (3L, "c")).toDF("id", "name"), Seq("id"))
    assert(spark.table(t).as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("insertStrict matches columns by NAME: reordered same-type batch lands correctly") {
    val t = freshTable()
    TableOps.createTableAs(spark, t, Seq(("alice", "nyc")).toDF("name", "city"))
    // Swapped column order, same types — positional insert would corrupt.
    TableOps.insertStrict(spark, t, Seq(("sf", "bob")).toDF("city", "name"))
    val rows = spark.table(t).as[(String, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("alice", "nyc"), ("bob", "sf")))
  }

  test("insertRecords collects ALL per-row errors and writes nothing (≙ bq.py:119-147)") {
    val t = freshTable()
    TableOps.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))))
    val ex = intercept[InsertErrorsException] {
      TableOps.insertRecords(spark, t, Seq(
        """{"id": 1, "name": "ok"}""",
        """{"id": "not-a-number", "name": "bad type"}""",
        """{"id": 2, "name": "ok2", "extra": true}""",
        """{"id": 3.5, "name": "frac"}"""))
    }
    assert(ex.errors.size == 3) // every bad row reported, good rows not
    assert(ex.errors.exists(_.contains("row 1")))
    assert(ex.errors.exists(_.contains("unknown field")))
    assert(ex.errors.exists(_.contains("row 3")))
    assert(spark.table(t).count() == 0) // zero partial writes
    TableOps.insertRecords(spark, t, Seq(
      """{"id": 1, "name": "a"}""", """{"name": "null-id"}"""))
    assert(spark.table(t).count() == 2) // missing field → NULL, accepted
  }

  test("insertRecords rejects malformed timestamp/date strings instead of landing NULLs") {
    val t = freshTable()
    TableOps.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("d", DateType))))
    val ex = intercept[InsertErrorsException] {
      TableOps.insertRecords(spark, t, Seq(
        """{"id": 1, "ts": "2026-08-12T10:00:00Z", "d": "2026-08-12"}""",
        """{"id": 2, "ts": "not a time", "d": "2026-08-12"}""",
        """{"id": 3, "ts": "2026-08-12 10:00:00", "d": "12/08/2026"}"""))
    }
    assert(ex.errors.size == 2)
    assert(ex.errors.exists(e => e.contains("row 1") && e.contains("unparseable timestamp")))
    assert(ex.errors.exists(e => e.contains("row 2") && e.contains("unparseable date")))
    assert(spark.table(t).count() == 0) // batch rejected atomically
    // well-formed variants (ISO instant, space-separated local) land intact
    TableOps.insertRecords(spark, t, Seq(
      """{"id": 1, "ts": "2026-08-12T10:00:00Z", "d": "2026-08-12"}""",
      """{"id": 2, "ts": "2026-08-12 10:00:00", "d": "2026-01-31"}""",
      """{"id": 3, "ts": null, "d": null}"""))
    assert(spark.table(t).count() == 3)
    assert(spark.table(t).filter(col("ts").isNull).count() == 1) // only the real null
  }

  test("createTableFromRecords: empty → warn no-op (≙ bq.py:608-610)") {
    val t = freshTable()
    TableOps.createTableFromRecords(spark, t, Seq.empty)
    assert(!TableOps.checkTable(spark, t)) // no table created
  }

  test("createTableFromRecords infers schema, creates, inserts (≙ bq.py:594-648)") {
    val t = freshTable()
    TableOps.createTableFromRecords(spark, t, Seq(
      """{"id": 1, "name": "a", "score": 0.5}""",
      """{"id": 2, "name": "b", "score": 2}"""))
    val sch = TableOps.tableSchema(spark, t)
    assert(sch.fieldNames.toSeq == Seq("id", "name", "score")) // first-seen order
    assert(sch("id").dataType == LongType)
    assert(sch("score").dataType == DoubleType) // int+float widens
    assert(spark.table(t).count() == 2)
    // existing table without overwrite → raises, table untouched
    intercept[Exception] {
      TableOps.createTableFromRecords(spark, t, Seq("""{"id": 3, "name": "c", "score": 1.0}"""))
    }
    assert(spark.table(t).count() == 2)
  }

  test("createTableFromRecords overwrite replaces through tmp (≙ bq.py:624-633)") {
    val t = freshTable()
    TableOps.createTableFromRecords(spark, t, Seq("""{"id": 1}""", """{"id": 2}"""))
    TableOps.createTableFromRecords(spark, t, Seq("""{"id": 9}"""), overwrite = true)
    assert(spark.table(t).as[Long].collect().toSeq == Seq(9L))
    assert(!TableOps.checkTable(spark, s"${t}_tmp"))
    // overwrite on a missing table also works (≙ WRITE_TRUNCATE creating it)
    val t2 = freshTable()
    TableOps.createTableFromRecords(spark, t2, Seq("""{"id": 4}"""), overwrite = true)
    assert(spark.table(t2).count() == 1)
  }

  test("createTableRetrying: transient Conflict resolves, persistent Conflict raises after 3 (≙ bq.py:321-364)") {
    val t = freshTable()
    val schema = StructType(Seq(StructField("id", LongType)))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    // Injected transient conflict: table exists on attempt 1, is dropped by a
    // "settling delete" during the first backoff, attempt 2 succeeds.
    TableOps.createTable(spark, t, schema)
    TableOps.createTableRetrying(spark, t, schema,
      sleep = ms => { sleeps += ms; TableOps.deleteTable(spark, t); () })
    assert(TableOps.checkTable(spark, t))
    assert(sleeps.toSeq == Seq(1000L)) // exponential backoff base (wait_exponential min=1)
    // Persistent Conflict: all 3 attempts hit the existing table, then raise;
    // backoff doubles between attempts.
    val sleeps2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      TableOps.createTableRetrying(spark, t, schema, sleep = sleeps2 += _)
    }
    assert(sleeps2.toSeq == Seq(1000L, 2000L))
    assert(TableOps.checkTable(spark, t)) // existing table untouched
  }

  test("upsertTableFromRecords: empty no-op, missing target creates, merge by key (≙ test_bq.py:431-562)") {
    val t = freshTable()
    // empty records: complete no-op — table not created, nothing raised
    TableOps.upsertTableFromRecords(spark, t, Seq.empty, Seq("id"))
    assert(!TableOps.checkTable(spark, t))
    // missing target: falls back to create_table_from_records
    TableOps.upsertTableFromRecords(spark, t,
      Seq("""{"id": 1, "name": "a"}""", """{"id": 2, "name": "b"}"""), Seq("id"))
    assert(spark.table(t).count() == 2)
    // existing target: merge by key (update id=2, insert id=3)
    TableOps.upsertTableFromRecords(spark, t,
      Seq("""{"id": 2, "name": "B"}""", """{"id": 3, "name": "c"}"""), Seq("id"))
    val rows = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // useTargetSchema=false: records' own (mismatched) schema hits the gate
    intercept[SchemaMismatchException] {
      TableOps.upsertTableFromRecords(spark, t,
        Seq("""{"uuid": "x"}"""), Seq("uuid"), useTargetSchema = false)
    }
    assert(spark.table(t).count() == 3) // target untouched by the failed upsert
  }

  test("upsertTable schema mismatch raises and leaves target + no tmp behind") {
    val t = freshTable()
    TableOps.createTableAs(spark, t, Seq((1L, "a")).toDF("id", "name"))
    intercept[SchemaMismatchException] {
      TableOps.upsertTable(spark, t, Seq(("u", "x")).toDF("uuid", "name"), Seq("id"))
    }
    assert(spark.table(t).count() == 1)           // target intact (test_bq.py:486-487)
    assert(!TableOps.checkTable(spark, s"${t}_tmp")) // cleanup (test_bq.py:506-533)
  }
}
