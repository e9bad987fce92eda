package graft.tables

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The round-14 scale-adaptive scan fan-out (Tables.loadFan): the driver's
  * sf tables are single one-row-group parquet files, so Spark plans exactly
  * one scan task and the whole map side of a query runs on one core. The
  * fan-out repartitions right after the read — ONLY when the input layout
  * is that pathological single small file — and must (a) actually add the
  * REPARTITION_BY_NUM exchange inside the gate, (b) keep filter pushdown
  * reaching the parquet scan THROUGH the exchange, (c) change no values,
  * and (d) stay silent outside the gate (small dims, multi-file dirs,
  * `graft.scan.fanout=off`). */
class FanoutSpec extends SparkSpec {

  /** A single-file parquet "lineitem" big enough to pass the 256 KB gate. */
  private lazy val bigDir: String = {
    val d = tmpDir("graft-fanout")
    spark.range(40000)
      .select(col("id").as("l_orderkey"),
        (col("id") % 7).cast("double").as("l_quantity"),
        concat(lit("payload-padding-payload-padding-"), col("id")).as("l_comment"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/stage")
    // Tables.load expects <dir>/<name>.parquet as a FILE: move the part file
    val part = new java.io.File(s"$d/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$d/lineitem.parquet"))
    assert(new java.io.File(s"$d/lineitem.parquet").length > 262144,
      "fixture must exceed the fan-out minBytes gate")
    d
  }

  test("inside the gate: fan-out exchange present, pushdown intact, values identical") {
    val plain = Tables.load(spark, bigDir, "lineitem")
      .filter(col("l_quantity") > 3.0)
    val fanned = Tables.loadFan(spark, bigDir, "lineitem")
      .filter(col("l_quantity") > 3.0)
    val p = fanned.queryExecution.executedPlan.toString
    assert(p.contains("REPARTITION_BY_NUM"), p)
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"), p)
    // value identity, order-independently
    val a = plain.orderBy(col("l_orderkey")).collect().toSeq
    val b = fanned.orderBy(col("l_orderkey")).collect().toSeq
    assert(a == b)
  }

  test("fan-out width follows the session shuffle width (the PERF lower-core contract)") {
    val fanned = Tables.loadFan(spark, bigDir, "lineitem")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(fanned.rdd.getNumPartitions == parts)
  }

  test("below the minBytes gate (sf0.001 tables) the plan is untouched") {
    val p = Tables.loadFan(spark, sf, "lineitem")
      .queryExecution.executedPlan.toString
    assert(!p.contains("REPARTITION_BY_NUM"), p)
  }

  test("tables with no fan-out key (broadcast dims) are never fanned") {
    val p = Tables.loadFan(spark, bigDir2("region"), "region")
    assert(!p.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"))
  }

  test("graft.scan.fanout=off disables inside the gate") {
    spark.conf.set("graft.scan.fanout", "off")
    try {
      val p = Tables.loadFan(spark, bigDir, "lineitem")
        .queryExecution.executedPlan.toString
      assert(!p.contains("REPARTITION_BY_NUM"), p)
    } finally spark.conf.unset("graft.scan.fanout")
  }

  /** A >gate single-file copy under another table name. */
  private def bigDir2(name: String): String = {
    val d = tmpDir("graft-fanout2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$bigDir/lineitem.parquet"),
      java.nio.file.Paths.get(s"$d/$name.parquet"))
    d
  }
}
