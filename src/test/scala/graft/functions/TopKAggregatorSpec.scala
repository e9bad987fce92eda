package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k aggregation equals the window row_number route") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))

    // window route: shuffle + full sort per group
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .as[(Long, Double, Long, Int)].collect()
      .map { case (c, p, o, _) => (c, p, o) }.toSet

    // aggregator route: bounded partial buffers, no global sort
    val topk = new TopKAggregator(3).toColumn
    val viaAgg = orders.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, price, okey) => (price, okey) }
      .agg(topk)
      .collect()
      .flatMap { case (cust, items) => items.map { case (p, o) => (cust, p, o) } }
      .toSet

    assert(viaAgg == viaWindow)
  }

  test("property: aggregator equals driver-side sorted top-k on random data across partitionings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(300, Gen.zip(
      Gen.choose(0L, 9L), Gen.choose(0, 50).map(_ / 7.0), Gen.choose(0L, 999L)))
    (0 until 5).foreach { i =>
      val data = gen(Gen.Parameters.default, Seed(7L + i)).getOrElse(Nil)
      val expected = data.groupBy(_._1).map { case (g, rows) =>
        g -> rows.map { case (_, v, t) => (v, t) }
          .sortBy { case (v, t) => (-v, t) }.take(3)
      }
      Seq(1, 3, 8).foreach { parts => // partial-buffer merge shape varies with partitioning
        val topk = new TopKAggregator(3).toColumn
        val got = spark.createDataset(data).repartition(parts)
          .groupByKey(_._1).mapValues { case (_, v, t) => (v, t) }.agg(topk)
          .collect().toMap
        expected.foreach { case (g, exp) =>
          assert(got(g).toList == exp, s"seed $i parts $parts group $g")
        }
      }
    }
  }

  test("merge respects capacity and ordering across partial buffers") {
    val agg = new TopKAggregator(2)
    val a = List((1.0, 9L), (5.0, 2L)).foldLeft(agg.zero)(agg.reduce)
    val b = List((3.0, 7L), (5.0, 1L)).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(a, b))
    assert(merged == Seq((5.0, 1L), (5.0, 2L))) // ties: smaller key ranks higher
  }
}
