package graft.prune

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join story for the 100 TB design: both fact
  * tables written bucketed on the join key join WITHOUT any shuffle. At
  * corpus scale this is the difference between re-shuffling 100 TB per
  * join and reading co-partitioned files; the test pins that Spark's
  * bucketed scan actually elides the Exchange (the property would silently
  * vanish if a write lost the bucket spec or a conf disabled bucketing). */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-orderkey tables join with zero exchanges under the join") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf, "orders").write.mode("overwrite")
        .bucketBy(8, "o_orderkey").saveAsTable("b_orders")
      Tables.load(spark, sf, "lineitem").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").saveAsTable("b_lineitem")
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_totalprice"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p) // co-located: no shuffle anywhere
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // same answer as the unbucketed join
      val expected = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
