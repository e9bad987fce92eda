package graft.prune

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.charset.StandardCharsets
import java.util.Base64

/** Stateless result pagination with opaque continuation tokens
  * (≙ reference query_paginated, bq.py:165-217, fixture A8).
  *
  * The reference runs the query once into a server-side destination table
  * and pages from it with base64(JSON{destination, page_token}). Here the
  * destination is a session-scoped parquet materialization; the token is
  * base64(JSON{path, offset, pageSize}). Later pages never re-run the
  * query — they read the materialized (already sorted) result, and the
  * offset/limit collapses to a cheap skip at the file level. A stable total
  * order at materialization time is what makes tokens deterministic
  * (SURVEY.md §3 E2); at 100 TB you'd key-range-partition the
  * materialization instead of relying on a global sort.
  */
object Pagination {

  final case class Page(rows: DataFrame, nextToken: Option[String])

  private final case class Token(path: String, offset: Long, pageSize: Int)

  private def encode(t: Token): String =
    Base64.getEncoder.encodeToString(
      s"""{"path":"${t.path}","offset":${t.offset},"pageSize":${t.pageSize}}"""
        .getBytes(StandardCharsets.UTF_8))

  private def decode(token: String): Token = {
    val s = new String(Base64.getDecoder.decode(token), StandardCharsets.UTF_8)
    def field(k: String): String =
      s.split(s""""$k":""")(1).takeWhile(c => c != ',' && c != '}').trim.stripPrefix("\"").stripSuffix("\"")
    Token(field("path"), field("offset").toLong, field("pageSize").toInt)
  }

  /** First call: materialize `query` (sorted by `sortCols` for a stable
    * total order) under `destDir`, return page 0 + continuation token. */
  def firstPage(query: DataFrame, sortCols: Seq[String], pageSize: Int,
                destDir: String): Page = {
    query.orderBy(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(destDir)
    pageAt(query.sparkSession, Token(destDir, 0L, pageSize), sortCols)
  }

  /** Continuation call: decode the token, skip the query entirely
    * (≙ bq.py:198-204), page from the materialized destination. */
  def nextPage(spark: SparkSession, token: String, sortCols: Seq[String]): Page =
    pageAt(spark, decode(token), sortCols)

  private def pageAt(spark: SparkSession, t: Token, sortCols: Seq[String]): Page = {
    val dest = spark.read.parquet(t.path)
    val total = dest.count()
    val rows = dest.orderBy(sortCols.map(col): _*)
      .offset(t.offset.toInt).limit(t.pageSize)
    val nextOff = t.offset + t.pageSize
    Page(rows,
      if (nextOff >= total) None // ≙ next_page_token=None terminates (A8)
      else Some(encode(t.copy(offset = nextOff))))
  }
}
