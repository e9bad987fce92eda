package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Systematic degenerate-input sweep (round-11 verdict #5): EVERY
  * registered query runs against a 0-row, schema-correct dataset dir and
  * must either (a) complete without throwing AND keep the exact output
  * schema it has on real data, or (b) fail loudly through a DOCUMENTED
  * guard (the `require` sites listed in [[guardThrows]]). A pipeline that
  * crashes on an empty shard — a fresh date partition, a filtered-out
  * split — is a pipeline that pages someone at 3am; a query whose schema
  * drifts on empty input silently corrupts downstream unions.
  *
  * [[EmptyInputSpec]] stays as the stronger per-family contract (exact
  * EMPTINESS semantics for operators where empty-in must mean empty-out);
  * this sweep is the universal floor: no-throw + schema stability.
  */
class EmptyAllSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = tmpDir("empty-all")
    Tables.names.foreach { n =>
      Tables.load(spark, sf, n).limit(0).write.parquet(s"$dir/$n.parquet")
    }
    dir
  }

  /** Queries whose documented contract on empty input is a loud, early
    * guard throw (message fragment of the `require` site), not an empty
    * result: operators that need trained model state (k-means seeds, PQ
    * codebooks) must refuse to fabricate a model from nothing. */
  private val guardThrows: Map[String, String] = Map(
    "q_kmeans_train" -> "seed ids",
    "q_ann_pq" -> "seed ids",
    "q_ann_ivfpq" -> "seed ids",
    "q_ann_ivfpq_probe2" -> "seed ids",
    "q_ann_index_stats" -> "seed ids",
    "q_ann_recall_panel" -> "seed ids",
    "q_ann_ivf_trained" -> "seed ids",
    "q_ann_graph" -> "seed ids",
    "q_pipeline_vectors" -> "seed ids",
    "q_semantic_dedup" -> "seed ids",
    "q_cluster_topics" -> "seed ids")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"empty input: $name") {
      guardThrows.get(name) match {
        case Some(frag) =>
          val e = intercept[IllegalArgumentException] {
            fn(spark, emptyDir).collect()
          }
          assert(e.getMessage.contains(frag),
            s"guard message drifted: ${e.getMessage}")
        case None =>
          val out = fn(spark, emptyDir)
          val real = SparkEntry.queries(name)(spark, sf).schema
          assert(
            out.schema.map(f => (f.name, f.dataType)) ===
              real.map(f => (f.name, f.dataType)),
            "schema drift on empty input")
          out.collect() // the no-throw contract
      }
    }
  }
}
