package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Schema mismatch between upsert target and updates — mirrors the
  * reference's BigQuerySchemaMismatchException (reference: bq.py:523-531). */
final class SchemaMismatchException(msg: String) extends RuntimeException(msg)

/** Keyed upsert (MERGE) re-expressed Spark-first.
  *
  * The reference implements upsert as tmp-table + `MERGE INTO tgt USING tmp
  * ON src.k = tgt.k WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN
  * INSERT ...` (reference: bq.py:450-554, MERGE SQL at bq.py:538-547).
  * Without a transactional table format, the equivalent single-job plan is
  * anti-join + union: rows of `target` whose key has no update survive,
  * every update row lands. One shuffle on the key (or zero if `updates`
  * broadcasts — typical, since updates are usually << target at scale).
  */
object Merge {

  /** Strict schema-equality gate (names + types, order-insensitive),
    * ≙ reference bq.py:517-531. */
  def requireSameSchema(target: DataFrame, updates: DataFrame): Unit = {
    def sig(df: DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    if (sig(target) != sig(updates))
      throw new SchemaMismatchException(
        s"schema mismatch: target=${sig(target)} updates=${sig(updates)}")
  }

  /** Upsert `updates` into `target` by `keys`: matched target rows are
    * replaced, unmatched update rows are inserted. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    requireSameSchema(target, updates)
    target.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
  }

  /** Keep exactly one row per key, smallest tie-break first — deterministic
    * alternative to dropDuplicates (which keeps an arbitrary row). */
  def dedupByKey(df: DataFrame, key: String, tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(key)).orderBy(col(tieBreak).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
