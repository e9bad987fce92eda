package graft.tables

import graft.SparkSpec

/** Catalog statistics drive plan choice: ANALYZE TABLE fills sizeInBytes /
  * rowCount, and the planner picks broadcast vs sort-merge from them. At
  * 100 TB this is the difference between a dimension join that ships 10 KB
  * to every executor and one that shuffles the fact table — the stats
  * discipline an ingest job should end with. */
class AnalyzeStatsSpec extends SparkSpec {

  test("ANALYZE TABLE fills catalog stats and the planner broadcasts from them") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    nation.write.mode("overwrite").saveAsTable("st_nation")
    customer.write.mode("overwrite").saveAsTable("st_customer")
    spark.sql("ANALYZE TABLE st_nation COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE st_customer COMPUTE STATISTICS")

    val st = spark.table("st_nation").queryExecution.optimizedPlan.stats
    assert(st.sizeInBytes > 0 && st.sizeInBytes < (1L << 20),
      s"nation stats missing or implausible: $st")
    // the exact row count lands in the CATALOG entry (plan-level stats
    // only carry it with CBO on; sizeInBytes above is what drives the
    // broadcast choice either way)
    val catStats = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("st_nation"))
      .stats.get
    assert(catStats.rowCount.exists(_.toLong == nation.count()),
      s"ANALYZE must record the exact row count: $catStats")

    // the planner broadcasts the ANALYZEd small side without a hint
    val joined = spark.table("st_customer")
      .join(spark.table("st_nation"),
        spark.table("st_customer")("c_nationkey") ===
          spark.table("st_nation")("n_nationkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats-driven broadcast not chosen:\n$plan")

    // stats survive in the catalog, not just one plan: a fresh lookup
    // sees the same sizeInBytes
    val again = spark.table("st_nation").queryExecution.optimizedPlan.stats
    assert(again.sizeInBytes == st.sizeInBytes)
  }

  test("column-level ANALYZE records distinct counts the optimizer can read") {
    spark.sql("ANALYZE TABLE st_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("st_nation"))
    val colStats = cat.stats.get.colStats
    assert(colStats.contains("n_nationkey") && colStats.contains("n_regionkey"),
      s"missing column stats: ${colStats.keys}")
    val ndv = colStats("n_nationkey").distinctCount.get.toLong
    assert(ndv == spark.table("st_nation").select("n_nationkey").distinct().count(),
      s"distinct-count stat off: $ndv")
  }
}
