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
}
