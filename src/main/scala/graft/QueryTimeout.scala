package graft

import org.apache.spark.sql.{DataFrame, Row}
import java.util.UUID
import java.util.concurrent.{Executors, TimeUnit, TimeoutException => JTimeout}

/** Query exceeded its wall-clock budget (≙ reference bounded blocking:
  * `query_job.result(timeout)` — bq.py:21, 149-163, select default 10 s at
  * bq.py:680). */
final class QueryTimeoutException(msg: String) extends RuntimeException(msg)

/** Bounded-blocking query execution via job-group cancellation.
  *
  * Spark has no per-query timeout; the reference's contract (block at most
  * N seconds, then abort server-side work) maps to: run the action in a
  * dedicated thread tagged with a fresh job group, and cancel the whole
  * group (interrupting running tasks) when the deadline passes — so the
  * cluster actually stops burning resources, unlike a bare `Await`.
  */
object QueryTimeout {

  val DefaultTimeoutSec: Int = 300 // ≙ FIVE_MINUTES, bq.py:21

  def collectWithTimeout(df: DataFrame,
                         timeoutSec: Int = DefaultTimeoutSec): Array[Row] = {
    val sc = df.sparkSession.sparkContext
    val group = s"graft-q-${UUID.randomUUID()}"
    val exec = Executors.newSingleThreadExecutor()
    val fut = exec.submit(new java.util.concurrent.Callable[Array[Row]] {
      override def call(): Array[Row] = {
        // job group is thread-local: tag inside the worker thread
        sc.setJobGroup(group, "graft bounded query", interruptOnCancel = true)
        try df.collect() finally sc.clearJobGroup()
      }
    })
    try fut.get(timeoutSec.toLong, TimeUnit.SECONDS)
    catch {
      case _: JTimeout =>
        sc.cancelJobGroup(group)
        fut.cancel(true)
        throw new QueryTimeoutException(s"query exceeded ${timeoutSec}s; job group $group cancelled")
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally exec.shutdownNow()
  }
}
