package graft.streaming

import graft.io.DatasetConvention
import graft.queries.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._
import java.time.Instant

/** Streaming corpus ingest — the documents-side twin of [[EventsStream]]:
  * new JSONL document files arrive per micro-batch (≙ the reference's
  * hourly objects, gcs.py:42-55), each batch passes through the SAME gate
  * expressions the batch pipeline uses ([[TextOps.qualityOkExpr]],
  * [[TextOps.predLangExpr]], [[TextOps.piiScrub]] — one definition, no
  * batch/stream drift), and survivors append to the dataset convention
  * ([[DatasetConvention.append]]) — so the downstream corpus build reads
  * one layout regardless of how documents arrived.
  */
object DocsStream {

  /** The documents table schema (TESTDATA.md), as staged JSONL carries it. */
  def docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocs(spark: SparkSession, dir: String,
               maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n.toString))
      .json(dir)
  }

  /** Gate + scrub + exact-dedup a document stream and append survivors to
    * the dataset convention. Gates are pure map work (stream-safe at any
    * scale); the in-stream exact dedup keys on doc_id — or, with
    * `dedupByContent`, on the SAME normalized-text fingerprint the batch
    * corpus build dedups on ([[TextOps.normFpExpr]], q_pipeline_corpus
    * stage 4), so one representative per content lands regardless of how
    * many doc_ids carry it. Both sides gate BEFORE deduping, so the
    * landed fp set equals the batch stage's by construction — a
    * gate-failing duplicate can't erase its group in either mode. Either way state grows with distinct keys
    * (the replay-window-bounded variant is [[EventsStream.dedupedStream]]'s
    * `dropDuplicatesWithinWatermark`, which needs an event-time column
    * documents lack — the full-state trade here is exactly the batch
    * window's). The fingerprint is computed PRE-scrub, like
    * the batch stage, so scrubbing can't split one content group in two.
    *
    * NEAR-dup ingest (round-12 directive): with `nearDupCorpus = Some(d)`,
    * each micro-batch is first self-screened for IN-BATCH near-dups
    * ([[graft.queries.Dedup.dropBatchNearDups]] — band self-join, min-id
    * keep: two near-dups arriving in the same micro-batch have no corpus
    * twin yet, so exactly one representative proceeds), then screened
    * against the EXISTING corpus at dataset dir `d` through the MinHash
    * machinery's memoized band index
    * ([[graft.queries.Dedup.dropCorpusNearDups]]): incoming docs that
    * LSH-collide with any corpus band bucket — the same candidate rule
    * q_dedup_minhash pairs on — are QUARANTINED (dropped from the
    * landing), so a near-duplicate arriving later than its cluster can no
    * longer land in the corpus. PRECONDITION: `nearDupCorpus` must point
    * at a RAW (pre-scrub) documents dir — the testdata/dataset-source
    * layout, NOT a landed dataset this ingest wrote — because the screen
    * shingles the batch's raw text and the band index is built from
    * whatever text the corpus dir stores; a piiScrub'd corpus would
    * shingle differently and PII-bearing near-dups would evade
    * quarantine. The screen is a per-batch map + batch-local min-agg +
    * one band self-join + one LEFT SEMI probe of the narrow band index —
    * stream-safe state (the index is a static asset; nothing accumulates
    * in the query). Cross-batch in-stream near-dups (a pair split across
    * micro-batches, neither in the corpus) join the index at its next
    * rebuild — the one-job-builds-the-asset cadence. */
  def corpusIngest(docs: DataFrame, base: String, dataset: String,
                   version: Int, ts: Instant,
                   dedupByContent: Boolean = false,
                   nearDupCorpus: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] =
    {
      val gated = docs.filter(TextOps.qualityOkExpr && TextOps.predLangExpr === "en")
      // only the content path pays the per-row fingerprint hash
      if (dedupByContent)
        gated.withColumn("fp", TextOps.normFpExpr).dropDuplicates("fp")
      else gated.dropDuplicates("doc_id")
    }
      .writeStream
      .outputMode("append")
      // foreachBatch is at-least-once: a batch replayed after a crash
      // re-runs its write, so the landing must be IDEMPOTENT — each batch
      // overwrites its own batchId-keyed subdirectory instead of blind-
      // appending part files with fresh random names. The near-dup screen
      // and the scrub run HERE: the screen needs the static band-index
      // join (and raw text), the scrub must follow it so quarantine
      // hashes what the corpus asset hashed.
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val fresh = nearDupCorpus.fold(batch)(d =>
          graft.queries.Dedup.dropCorpusNearDups(
            graft.queries.Dedup.dropBatchNearDups(batch), d))
        val landed = fresh
          .select(col("doc_id"), TextOps.piiScrub(col("text")).as("text"))
          // n_chars must describe the LANDED (scrubbed) text, not the raw
          .withColumn("n_chars", length(col("text")).cast("long"))
        DatasetConvention.append(landed, base, dataset, version, ts,
          subdir = Some(f"batch-$id%05d"))
      }
}
