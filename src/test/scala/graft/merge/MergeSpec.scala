package graft.merge

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")

  test("upsert replaces matched keys and inserts unmatched (fixture A2 semantics)") {
    val updates = Seq((2L, "B2"), (9L, "new")).toDF("id", "name")
    val out = Merge.upsert(target, updates, Seq("id"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
  }

  test("upsert is idempotent") {
    val updates = Seq((2L, "B2"), (9L, "new")).toDF("id", "name")
    val once = Merge.upsert(target, updates, Seq("id"))
    val twice = Merge.upsert(once, updates, Seq("id"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("upsert leaves key multiplicity 1 for updated keys") {
    val updates = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    val counts = Merge.upsert(target, updates, Seq("id"))
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 1L))
  }

  test("schema mismatch raises SchemaMismatchException (≙ bq.py:523-531)") {
    val bad = Seq(("uuid-1", "a")).toDF("uuid", "name")
    intercept[SchemaMismatchException] {
      Merge.upsert(target, bad, Seq("id"))
    }
  }

  test("dedupByKey keeps deterministic representative (min tie-break)") {
    val df = Seq((1L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "v")
    val out = Merge.dedupByKey(df, "k", "v").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 5L), (2L, 7L)))
  }
}
