package graft

import org.apache.spark.sql.functions._

/** Smoke + contract checks for the registered query packs at sf0.001.
  * (Exact value verification is the driver's DuckDB gate / verify skill.) */
class QueriesSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all registered queries run at sf0.001 without error") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("dedup family agrees: minhash candidates ⊇ high-jaccard ngram pairs at sf0.001") {
    val ngram = SparkEntry.queries("q_dedup_ngram")(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ngram.subsetOf(cand),
      s"high-jaccard pairs missed by LSH: ${ngram.diff(cand)}")
  }

  test("ann bucket search returns a subset of brute-force candidates' space") {
    val ann = SparkEntry.queries("q_ann_lsh")(spark, sf).collect()
    val brute = SparkEntry.queries("q_topk_similarity")(spark, sf).collect()
    assert(brute.length == 10)
    assert(ann.forall(r => r.getAs[Long]("vec_id") != 0L))
  }
}
