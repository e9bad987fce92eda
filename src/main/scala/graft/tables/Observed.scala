package graft.tables

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline-health metrics collected DURING a query, not after it.
  *
  * The reference's insert path counts per-row validation errors as it
  * writes (reference: bq.py:386-417, errors collected row-by-row); the
  * Spark-first equivalent for arbitrary pipelines is `Dataset.observe`:
  * metrics are aggregated inside the running plan (CollectMetrics node),
  * so a 100 TB write reports row counts / null counts / value bounds from
  * the SAME pass that produced it — a second validation scan at that
  * scale would double the job. Metrics must be aggregate expressions;
  * they are evaluated per task and merged on the driver, adding no
  * shuffle and no action of their own.
  */
object Observed {

  /** Attach arbitrary aggregate metrics to a frame. The returned
    * [[Observation]] yields its values after the FIRST action on the
    * returned frame completes. */
  def withMetrics(df: DataFrame, name: String,
                  metrics: Seq[Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observe needs at least one metric")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** The standard write-health panel: total rows plus a null count per
    * listed column — the strict-insert error ledger, without a second
    * scan. */
  def rowHealth(df: DataFrame, cols: Seq[String],
                name: String = "row_health"): (DataFrame, Observation) =
    withMetrics(df, name,
      count(lit(1)).as("n_rows") +:
        cols.map(c => count(when(col(c).isNull, 1)).as(s"n_null_$c")))
}
