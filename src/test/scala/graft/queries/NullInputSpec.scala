package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Dirty-shard sweep — the second degenerate-input class next to
  * [[EmptyAllSpec]]: real feeds carry NULLs in non-key columns (a scrape
  * with no text, an event with no type, an unlabeled vector). Every
  * registered query runs against a dataset dir where such NULLs are
  * injected into the documents / events / embeddings tables and must
  * either complete without throwing AND keep its real-data output schema,
  * or fail through the same documented guards as the empty sweep.
  * Value semantics under NULL are each query's own business (most
  * correctly drop the row at the first predicate or aggregate); what this
  * sweep pins is that NO query turns a dirty shard into a 3am page —
  * no NPE from a driver-side collect, no ANSI cast/element_at throw, no
  * schema drift that would corrupt a downstream union.
  */
class NullInputSpec extends SparkSpec {

  private lazy val nullDir: String = {
    val dir = tmpDir("null-all")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sf, n)
      val dirty = n match {
        case "documents" => df
          .withColumn("text", when(col("doc_id") % 7 === 0, lit(null))
            .otherwise(col("text")))
          .withColumn("lang", when(col("doc_id") % 11 === 0, lit(null))
            .otherwise(col("lang")))
          .withColumn("source", when(col("doc_id") % 13 === 0, lit(null))
            .otherwise(col("source")))
        case "events" => df
          .withColumn("event_type", when(col("user_id") % 17 === 0, lit(null))
            .otherwise(col("event_type")))
          .withColumn("value", when(col("user_id") % 19 === 0, lit(null))
            .otherwise(col("value")))
        case "embeddings" => df
          .withColumn("label", when(col("vec_id") % 23 === 0, lit(null))
            .otherwise(col("label")))
        case _ => df
      }
      dirty.write.parquet(s"$dir/$n.parquet")
    }
    dir
  }

  /** Same guard contract as EmptyAllSpec: model-state trainers refuse
    * loudly. (Seed vectors 0..8 keep their embeddings non-null here, so
    * k-means trains — no guard entries needed unless a query documents
    * one for the null class specifically.) */
  private val guardThrows: Map[String, String] = Map.empty

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"null input: $name") {
      guardThrows.get(name) match {
        case Some(frag) =>
          val e = intercept[IllegalArgumentException] {
            fn(spark, nullDir).collect()
          }
          assert(e.getMessage.contains(frag),
            s"guard message drifted: ${e.getMessage}")
        case None =>
          val out = fn(spark, nullDir)
          val real = SparkEntry.queries(name)(spark, sf).schema
          assert(
            out.schema.map(f => (f.name, f.dataType)) ===
              real.map(f => (f.name, f.dataType)),
            "schema drift on null-dirty input")
          out.collect() // the no-throw contract
      }
    }
  }
}
