package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed partial top-k aggregator: per group, keep the k largest
  * (value, tieBreak) pairs.
  *
  * The window-function route (`row_number over partitionBy … orderBy` then
  * `filter rk <= k`) must shuffle and SORT every row of every group. This
  * aggregator keeps only k candidates per partial buffer, so the shuffle
  * carries at most k rows per (group × map task) and nothing is ever
  * globally sorted — the map-side-combine shape you want for "top 3 orders
  * per customer" over a 100 TB fact table.
  *
  * Buffer is a sorted-ascending List bounded at k; merge is a bounded
  * merge. IN = (value, tieBreak); OUT = descending (value, tieBreak) list.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  override def zero: List[(Double, Long)] = Nil

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    // ascending order; drop the head (smallest) when over capacity.
    // Tie-break: smaller tieBreak ranks HIGHER (matches orderBy desc(value), asc(tie)),
    // so in ascending order (v, t1) sorts above (v, t2) when t1 < t2.
    val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)
    val withX = (x :: buf).sorted(ord)
    if (withX.length > k) withX.tail else withX
  }

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    insert(buf, in)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] =
    buf.reverse // descending by value, ascending tie-break

  // Kryo encoders: the buffer is an opaque intermediate either way, and the
  // output is consumed typed (collect / further typed maps), not as SQL
  // columns.
  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
}
