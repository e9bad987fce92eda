package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** Degenerate-input behavior: a pipeline that crashes on an empty shard
  * (a fresh date partition, a filtered-out split) is a pipeline that pages
  * someone at 3am. Document operators must yield EMPTY results, not throw,
  * when the corpus is empty; operators with required model state must fail
  * loudly and early instead. */
class EmptyInputSpec extends SparkSpec {

  test("document operators degrade to empty results on an empty corpus") {
    val dir = tmpDir("empty-sf")
    Tables.load(spark, sf, "documents").limit(0)
      .write.parquet(s"$dir/documents.parquet")
    Seq("q_repetition_filter", "q_lm_perplexity", "q_pii_scrub",
        "q_contamination", "q_token_count", "q_dedup_minhash",
        "q_hash_split", "q_importance_sample", "q_domain_mix",
        "q_doc_chunks", "q_seq_pack", "q_quality_model",
        "q_vocab_build", "q_dup_spans", "q_bpe_step",
        "q_bpe_train", "q_bpe_encode", "q_unicode_clean",
        "q_incremental_dedup", "q_oov_rate", "q_group_cap",
        "q_entropy", "q_containment", "q_weighted_sample",
        "q_inverted_index", "q_quality_quantile",
        "q_stratified_split", "q_dedup_canonical",
        "q_split_leakfree", "q_epoch_shuffle",
        "q_token_budget_mix", "q_dedup_cross_source",
        "q_curriculum", "q_kanon_audit", "q_dataset_card",
        "q_dp_counts", "q_span_corruption").foreach { q =>
      assert(SparkEntry.queries(q)(spark, dir).collect().isEmpty, q)
    }
  }

  test("event operators degrade to empty results on an empty events shard") {
    val dir = tmpDir("empty-ev")
    Tables.load(spark, sf, "events").limit(0)
      .write.parquet(s"$dir/events.parquet")
    Seq("q_heavy_hitters", "q_sliding_distinct", "q_freshness").foreach { q =>
      assert(SparkEntry.queries(q)(spark, dir).collect().isEmpty, q)
    }
  }

  test("embedding operators degrade to empty results on an empty vector table") {
    val dir = tmpDir("empty-emb2")
    Tables.load(spark, sf, "embeddings").limit(0)
      .write.parquet(s"$dir/embeddings.parquet")
    assert(SparkEntry.queries("q_embed_quantize")(spark, dir).collect().isEmpty)
    assert(SparkEntry.queries("q_embed_drift")(spark, dir).collect().isEmpty)
    assert(SparkEntry.queries("q_vector_quality")(spark, dir).collect().isEmpty)
    assert(SparkEntry.queries("q_ann_prefix")(spark, dir).collect().isEmpty)
    // maxsim retrieval: no vectors → no query batch → empty, not a crash
    assert(SparkEntry.queries("q_colbert_maxsim")(spark, dir).collect().isEmpty)
  }

  test("graph operators degrade to empty results on an empty lineitem shard") {
    val dir = tmpDir("empty-li")
    Tables.load(spark, sf, "lineitem").limit(0)
      .write.parquet(s"$dir/lineitem.parquet")
    // an empty edge set must not fabricate a phantom source row (SSSP's
    // min-over-empty is NULL) or a phantom community
    Seq("q_label_prop", "q_shortest_path").foreach { q =>
      assert(SparkEntry.queries(q)(spark, dir).collect().isEmpty, q)
    }
    // the k-core census still reports its 3 rounds — of an empty graph
    val kc = SparkEntry.queries("q_kcore")(spark, dir).collect()
    assert(kc.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("k-means refuses to train without seed vectors (loud, not empty)") {
    val dir = tmpDir("empty-emb")
    Tables.load(spark, sf, "embeddings").limit(0)
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("q_kmeans_train")(spark, dir)
    }
    assert(e.getMessage.contains("seed ids"))
    // PQ sub-codebooks train through the same seed gate
    val e2 = intercept[IllegalArgumentException] {
      SparkEntry.queries("q_ann_pq")(spark, dir)
    }
    assert(e2.getMessage.contains("seed ids"))
  }
}
