package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets

/** Raw object operations (≙ reference gcs.py object surface: upload_file
  * gcs.py:119-159, download gcs.py:236-339, bucket-to-bucket copy
  * gcs.py:251-277/600-628) over any Hadoop-compatible filesystem — local
  * file://, HDFS, or cloud object stores via their Hadoop connectors, which
  * is how Spark reaches GCS/S3 in production anyway.
  *
  * Bulk data should flow through DataFrame readers/writers (parallel,
  * pushdown-aware); these helpers cover the reference's raw string/bytes
  * object API. The reference's per-request retry/backoff (7× tenacity,
  * gcs.py:221-235) maps to the connector's built-in retry policies.
  */
object ObjectStore {

  private def fs(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** ≙ upload_file(content, …): write a string object. */
  def putString(spark: SparkSession, path: String, content: String): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** ≙ download_files single-object read. */
  def getString(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** ≙ copy_files_from_bucket_to_bucket: prefix copy, preserving names. */
  def copy(spark: SparkSession, srcDir: String, dstDir: String): Int = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val sfs = fs(spark, srcDir)
    val dfs = fs(spark, dstDir)
    val files = sfs.listStatus(new Path(srcDir)).filter(_.isFile)
    files.foreach { st =>
      FileUtil.copy(sfs, st.getPath, dfs,
        new Path(dstDir, st.getPath.getName), false, true, conf)
    }
    files.length
  }

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  def delete(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), true)
}
