package graft

import org.apache.spark.sql.functions._

class QueryTimeoutSpec extends SparkSpec {

  test("fast query completes within budget") {
    val rows = QueryTimeout.collectWithTimeout(
      spark.range(100).toDF("id"), timeoutSec = 60)
    assert(rows.length == 100)
  }

  test("slow query times out, raises, and cancels its job group") {
    import spark.implicits._
    val slow = spark.range(0, 64, 1, 8).toDF("id")
      .map { r => Thread.sleep(2000); r.getLong(0) }.toDF("id")
      .agg(sum("id"))
    val t0 = System.nanoTime()
    intercept[QueryTimeoutException] {
      QueryTimeout.collectWithTimeout(slow, timeoutSec = 2)
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed < 15, s"timeout not enforced promptly: ${elapsed}s")
    // session still healthy afterwards
    assert(spark.range(5).count() == 5)
  }

  test("query errors propagate as the original cause, not a timeout") {
    import spark.implicits._
    val boom = spark.range(4).toDF("id")
      .map { _ => throw new IllegalStateException("boom"); 0L }.toDF("x")
    val e = intercept[Exception] {
      QueryTimeout.collectWithTimeout(boom, timeoutSec = 60)
    }
    assert(!e.isInstanceOf[QueryTimeoutException])
  }
}
