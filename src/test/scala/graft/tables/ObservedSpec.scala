package graft.tables

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** In-flight metrics via Dataset.observe: the write-health counters come
  * from the SAME pass as the work, never a second scan. */
class ObservedSpec extends SparkSpec {

  test("rowHealth reports row and null counts from the writing pass itself") {
    val li = Tables.load(spark, sf, "lineitem")
      .withColumn("maybe", when(col("l_orderkey") % 10 === 0, col("l_quantity")))
    val (instrumented, obs) = Observed.rowHealth(li, Seq("maybe", "l_quantity"))
    // ONE action — the "write" — must populate the metrics
    instrumented.write.mode("overwrite").format("noop").save()
    val m = obs.get
    val total = li.count()
    val nullable = li.filter(col("maybe").isNull).count()
    assert(m("n_rows") === total)
    assert(m("n_null_maybe") === nullable)
    assert(m("n_null_l_quantity") === 0L)
  }

  test("metrics add no extra scan: one FileScan in the instrumented plan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val (instrumented, _) = Observed.rowHealth(
      Tables.load(spark, sf, "lineitem"), Seq("l_quantity"), "one_scan")
    val scans = instrumented.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.length === 1)
    assert(instrumented.queryExecution.sparkPlan.toString
      .contains("CollectMetrics"), "metrics must live inside the plan")
  }

  test("custom metric panel: bounds observed during an aggregate pipeline") {
    val (instrumented, obs) = Observed.withMetrics(
      Tables.load(spark, sf, "lineitem"), "bounds",
      Seq(min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty")))
    val out = instrumented.groupBy(col("l_returnflag")).count().collect()
    assert(out.nonEmpty)
    val m = obs.get
    assert(m("min_qty").asInstanceOf[Double] >= 1.0)
    assert(m("max_qty").asInstanceOf[Double] <= 50.0)
  }
}
