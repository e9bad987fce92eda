package graft.io

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Clustered (range-partitioned, sorted-within-partition) corpus writes —
  * the layout that makes id-range reads at 100 TB touch a handful of files
  * instead of the corpus: repartitionByRange gives globally disjoint
  * shards, sortWithinPartitions gives parquet row-group min/max stats that
  * range predicates skip on. */
class RangeClusterSpec extends SparkSpec {

  test("range-clustered write yields disjoint ordered shards and survives a range read") {
    val out = tmpDir("clustered")
    val docs = Tables.load(spark, sf, "documents")
    docs.repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 2, files.mkString(","))
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("doc_id"), max("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.toSeq.sliding(2).foreach {
      case Seq((_, amax), (bmin, _)) => assert(amax < bmin, ranges.mkString(","))
      case _ => ()
    }
    // a range read over the clustered layout returns exactly the rows
    val n = docs.filter(col("doc_id").between(100, 300)).count()
    val clustered = spark.read.parquet(out)
      .filter(col("doc_id").between(100, 300))
    assert(clustered.count() == n)
    // and the predicate reaches the scan (row-group skipping feeds on it)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(doc_id"), plan)
  }
}
