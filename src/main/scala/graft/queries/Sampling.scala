package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset splitting/sampling for training pipelines.
  *
  * The split must be a pure function of the record id — not of partitioning,
  * row order, or a session seed — so it is stable across reruns, engines,
  * and backfills (the property that keeps eval sets leak-free when the
  * corpus is re-ingested). Bucket = first 4 hex chars of md5(id) → [0, 65536).
  */
object Sampling {
  type QFn = (SparkSession, String) => DataFrame

  /** 80/10/10 bucket thresholds over [0, 65536). */
  private val TrainMax = 52429 // 0.8 * 65536
  private val DevMax = 58982   // 0.9 * 65536

  /** Deterministic split assignment for any DataFrame with an id column. */
  def withSplit(df: DataFrame, idCol: String): DataFrame = {
    val bucket = conv(substring(md5(encode(col(idCol).cast("string"), "UTF-8")), 1, 4), 16, 10)
      .cast("long")
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < TrainMax, "train")
          .when(col("bucket") < DevMax, "dev")
          .otherwise("test"))
  }

  /** Per-stratum seeded sampling (class balancing). Deterministic within
    * Spark for a fixed seed — not cross-engine, hence spec-tested (t1)
    * rather than oracle-compared. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  val queries: Map[String, QFn] = Map(
    // Split distribution + per-split aggregate — the reproducible
    // train/dev/test assignment every corpus rebuild must preserve.
    "q_hash_split" -> ((s, d) =>
      withSplit(Tables.load(s, d, "documents"), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_hash_split" ->
      s"""WITH b AS (SELECT n_chars,
         |  (((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096)
         | + ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256)
         | + ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16)
         | +  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) AS bucket
         |FROM documents)
         |SELECT CASE WHEN bucket < $TrainMax THEN 'train'
         |            WHEN bucket < $DevMax THEN 'dev'
         |            ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM b GROUP BY 1 ORDER BY split""".stripMargin
  )
}
