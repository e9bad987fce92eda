package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query pack; each pack pairs a Spark DataFrame program
  * with a DuckDB oracle SQL string over the same parquet tables.
  */
object SparkEntry {

  private[graft] def packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.Relational.queries, graft.queries.Relational.oracleSql),
      (graft.queries.Shapes.queries, graft.queries.Shapes.oracleSql),
      (graft.queries.Sources.queries, graft.queries.Sources.oracleSql),
      (graft.queries.TextOps.queries, graft.queries.TextOps.oracleSql),
      (graft.queries.Dedup.queries, graft.queries.Dedup.oracleSql),
      (graft.queries.Similarity.queries, graft.queries.Similarity.oracleSql),
      (graft.queries.Sampling.queries, graft.queries.Sampling.oracleSql),
      (graft.queries.Pipeline.queries, graft.queries.Pipeline.oracleSql)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
