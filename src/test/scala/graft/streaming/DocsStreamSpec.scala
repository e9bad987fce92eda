package graft.streaming

import graft.{SparkSpec, Tables}
import graft.io.DatasetConvention
import graft.queries.TextOps
import org.apache.spark.sql.functions._
import java.time.Instant

class DocsStreamSpec extends SparkSpec {

  test("streamed corpus ingest lands exactly the batch pipeline's gated set, once per doc") {
    val in = tmpDir("docs-in")
    val base = tmpDir("docs-out")
    val docs = Tables.load(spark, sf, "documents")
    // three JSONL files → three micro-batches; one file repeats another's
    // ids so the in-stream dedup is exercised across batches
    docs.limit(200).coalesce(1).write.mode("append").json(in)
    docs.coalesce(1).write.mode("append").json(in)
    val q = DocsStream.corpusIngest(
        DocsStream.readDocs(spark, in, maxFilesPerTrigger = Some(1)),
        base, "docs", version = 1, ts = Instant.parse("2024-02-01T00:00:00Z"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val landed = DatasetConvention.read(spark, base, "docs", version = Some(1))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // exactly once per doc despite the replayed file
    assert(landed.distinct.size == landed.size, "duplicate doc landed")
    // same set the batch gates admit
    val expected = docs
      .filter(TextOps.qualityOkExpr && TextOps.predLangExpr === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landed.toSet == expected,
      s"landed ${landed.size} != batch-gated ${expected.size}")
    // scrub is identity on this clean corpus: text survives verbatim
    val t0 = DatasetConvention.read(spark, base, "docs", version = Some(1))
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(t0.forall { case (id, txt) => orig(id) == txt })
  }

  test("content-fingerprint dedup lands one representative per batch-pipeline fp") {
    val in = tmpDir("docs-fp-in")
    val base = tmpDir("docs-fp-out")
    val docs = Tables.load(spark, sf, "documents")
    // batch 1: first 200 docs; batch 2: the SAME texts under fresh doc_ids
    // (content duplicates the id-keyed dedup would miss) plus 100 new docs
    docs.limit(200).coalesce(1).write.mode("append").json(in)
    docs.limit(300)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .coalesce(1).write.mode("append").json(in)
    val q = DocsStream.corpusIngest(
        DocsStream.readDocs(spark, in, maxFilesPerTrigger = Some(1)),
        base, "docs", version = 1, ts = Instant.parse("2024-02-04T00:00:00Z"),
        dedupByContent = true)
      .start()
    try q.processAllAvailable() finally q.stop()
    val landedIds = DatasetConvention.read(spark, base, "docs", version = Some(1))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // fingerprints come from the PRE-scrub input text, keyed by doc_id
    val union = docs.limit(200).union(
      docs.limit(300).withColumn("doc_id", col("doc_id") + 1000000L))
    val inputFp = union.select(col("doc_id"), TextOps.normFpExpr.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val landedFps = landedIds.map(inputFp)
    assert(landedFps.distinct.size == landedFps.size,
      "two representatives of one content fingerprint landed")
    // value parity with the batch exact-dedup stage: same fp set survives
    val expectedFps = union
      .filter(TextOps.qualityOkExpr && TextOps.predLangExpr === "en")
      .select(TextOps.normFpExpr.as("fp")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(landedFps.toSet == expectedFps,
      s"landed ${landedFps.size} fps != batch stage's ${expectedFps.size}")
  }

  test("near-dup ingest: stream docs LSH-colliding with the corpus are quarantined, across restarts") {
    val corpusDir = tmpDir("docs-nd-corpus")
    val in = tmpDir("docs-nd-in")
    val base = tmpDir("docs-nd-out")
    val ckpt = tmpDir("docs-nd-ckpt")
    val docs = Tables.load(spark, sf, "documents")
    // the EXISTING corpus the band index is built over
    val corpus = docs.filter(col("doc_id") < 100)
    corpus.write.parquet(s"$corpusDir/documents.parquet")
    // planted near-dups: corpus texts VERBATIM under fresh doc_ids —
    // identical shingles → identical signature → collide in every band,
    // so they MUST be quarantined; plus genuinely new documents
    val copies = corpus.withColumn("doc_id", col("doc_id") + 5000000L)
    val fresh = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
    def run(): Unit = {
      val q = DocsStream.corpusIngest(
          DocsStream.readDocs(spark, in),
          base, "docs", version = 1, ts = Instant.parse("2024-02-05T00:00:00Z"),
          nearDupCorpus = Some(corpusDir))
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val f1 = copies.filter(col("doc_id") < 5000050L)
      .unionByName(fresh.filter(col("doc_id") < 250))
    f1.coalesce(1).write.mode("append").json(in)
    run() // …kill…
    val f2 = copies.filter(col("doc_id") >= 5000050L)
      .unionByName(fresh.filter(col("doc_id") >= 250))
    f2.coalesce(1).write.mode("append").json(in)
    run() // …restart from the checkpoint
    val landed = DatasetConvention.read(spark, base, "docs", version = Some(1))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(landed.distinct.size == landed.size, "duplicate doc landed")
    // value parity: the landed set equals the per-micro-batch replay of
    // the same gates + in-batch screen + corpus screen (the in-batch
    // self-join is batch-scoped by design, so the replay is per file)
    val expected = Seq(f1, f2).flatMap { b =>
      val g = b.filter(TextOps.qualityOkExpr && TextOps.predLangExpr === "en")
      graft.queries.Dedup.dropCorpusNearDups(
          graft.queries.Dedup.dropBatchNearDups(g), corpusDir)
        .select("doc_id").collect().map(_.getLong(0))
    }.toSet
    val gated = f1.unionByName(f2)
      .filter(TextOps.qualityOkExpr && TextOps.predLangExpr === "en")
    assert(landed.toSet == expected,
      s"landed ${landed.size} != batch near-dup-gated ${expected.size}")
    // the headline behavior: every gated verbatim copy (≥3 tokens, so it
    // HAS a signature) was quarantined, none landed
    val gatedCopyIds = gated
      .filter(col("doc_id") >= 5000000L &&
        size(split(trim(lower(col("text"))), "\\s+")) >= 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gatedCopyIds.nonEmpty, "fixture lost its planted near-dups")
    assert(landed.toSet.intersect(gatedCopyIds).isEmpty,
      s"corpus near-dups landed: ${landed.toSet.intersect(gatedCopyIds)}")
    // and the genuinely new docs that pass the screen DID land
    assert(landed.toSet.exists(_ >= 200L), "the screen quarantined everything")
  }

  test("in-batch near-dup pair with no corpus twin: exactly the min-id representative lands") {
    val corpusDir = tmpDir("docs-ib-corpus")
    val in = tmpDir("docs-ib-in")
    val base = tmpDir("docs-ib-out")
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") < 100).write.parquet(s"$corpusDir/documents.parquet")
    // a gated, signature-bearing doc with NO corpus collision, cloned
    // under two fresh ids arriving in the SAME micro-batch (one file)
    val gated = docs
      .filter(col("doc_id") >= 200)
      .filter(TextOps.qualityOkExpr && TextOps.predLangExpr === "en")
      .filter(size(split(trim(lower(col("text"))), "\\s+")) >= 3)
    val seed = graft.queries.Dedup.dropCorpusNearDups(gated, corpusDir)
      .orderBy(col("doc_id")).limit(1)
    assert(seed.count() == 1, "fixture lost its corpus-clean seed doc")
    val pair = seed.withColumn("doc_id", lit(9000001L))
      .unionByName(seed.withColumn("doc_id", lit(9000002L)))
    pair.coalesce(1).write.mode("append").json(in)
    val q = DocsStream.corpusIngest(
        DocsStream.readDocs(spark, in),
        base, "docs", version = 1, ts = Instant.parse("2024-02-06T00:00:00Z"),
        nearDupCorpus = Some(corpusDir))
      .start()
    try q.processAllAvailable() finally q.stop()
    val landed = DatasetConvention.read(spark, base, "docs", version = Some(1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // identical text → identical signature → collide in every band: the
    // min-id keep rule lands 9000001 and quarantines 9000002
    assert(landed == Set(9000001L), landed.toString)
  }

  test("batch-keyed append is idempotent: a replayed batch replaces itself") {
    val base = tmpDir("docs-idem")
    val docs = Tables.load(spark, sf, "documents").limit(10)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val ts = Instant.parse("2024-02-03T00:00:00Z")
    DatasetConvention.append(docs, base, "docs", 1, ts, subdir = Some("batch-00001"))
    // at-least-once replay of the same batch: overwrite, not duplicate
    DatasetConvention.append(docs, base, "docs", 1, ts, subdir = Some("batch-00001"))
    assert(DatasetConvention.read(spark, base, "docs", version = Some(1)).count() == 10)
  }

  test("ingest restarts from its checkpoint: replayed ids never land twice") {
    val in = tmpDir("docs-in2")
    val base = tmpDir("docs-out2")
    val ckpt = tmpDir("docs-ckpt")
    val docs = Tables.load(spark, sf, "documents")
    def run(): Unit = {
      val q = DocsStream.corpusIngest(
          DocsStream.readDocs(spark, in),
          base, "docs", version = 1, ts = Instant.parse("2024-02-02T00:00:00Z"))
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    docs.limit(100).coalesce(1).write.mode("append").json(in)
    run()
    val n1 = DatasetConvention.read(spark, base, "docs", version = Some(1)).count()
    assert(n1 > 0)
    // stop, stage a file that repeats the SAME ids, restart from checkpoint:
    // the dedup state survives the restart, so nothing new lands
    docs.limit(100).coalesce(1).write.mode("append").json(in)
    run()
    val landed = DatasetConvention.read(spark, base, "docs", version = Some(1))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(landed.size == n1, s"replay landed ${landed.size - n1} duplicates")
    assert(landed.distinct.size == landed.size)
  }
}
