package graft.tables

import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("joining two same-bucketed tables plans no shuffle Exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    TableOps.saveBucketed(orders, "b_orders", "o_custkey", 4, overwrite = true)
    TableOps.saveBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer",
      "o_custkey", 4, overwrite = true)

    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString

    // SortMergeJoin straight over the bucketed scans: no "Exchange
    // hashpartitioning" anywhere in the plan.
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() ==
      orders.join(customer, orders("o_custkey") === customer("c_custkey")).count())
  }

  test("groupBy on the bucket key also avoids the shuffle") {
    val plan = spark.table("b_orders").groupBy("o_custkey").count()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy still shuffles:\n$plan")
  }

  test("path option makes the bucketed table EXTERNAL: files live at the path") {
    // the ingest-once layout a fleet of sessions joins against must NOT
    // live inside one session's warehouse directory
    val dir = tmpDir("bucket-ext")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    TableOps.saveBucketed(orders, "b_ext_orders", "o_orderkey", 4,
      overwrite = true, path = Some(s"$dir/orders"))
    val files = new java.io.File(s"$dir/orders").listFiles()
    assert(files != null && files.exists(_.getName.endsWith(".parquet")),
      s"no bucket files at the external path: $dir/orders")
    assert(spark.table("b_ext_orders").count() == orders.count())
    // external semantics: dropping the catalog entry keeps the data
    spark.sql("DROP TABLE b_ext_orders")
    val after = new java.io.File(s"$dir/orders").listFiles()
    assert(after != null && after.exists(_.getName.endsWith(".parquet")),
      "DROP TABLE removed external bucket files")
  }
}
