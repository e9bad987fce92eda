package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Z-order layout: bit math, and the locality property that makes it a
  * layout operator — after Z-clustering, per-file min/max spans are tight
  * in BOTH dimensions, so parquet stats prune files for predicates on
  * either column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zAddress interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.zAddress(col("a"), col("b")).as("z"))
    // morton(3=0b011, 5=0b101) = a-bits even, b-bits odd:
    //   a: 1,1,0 -> positions 0,2 ; b: 1,0,1 -> positions 1,5
    //   z = 0b100111 = 39
    assert(df.as[Long].collect().toSeq === Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("spreadBits is invertible (distinct inputs stay distinct)") {
    val n = 1000
    val out = spark.range(n).select(ZOrder.spreadBits(col("id")).as("s"))
      .distinct().count()
    assert(out === n)
  }

  /** Mean per-file span of a column, as a fraction of its global span. */
  private def meanSpanFraction(dir: String, c: String): Double = {
    val withFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
    val global = withFile.agg(max(col(c)) - min(col(c))).head.getLong(0).toDouble
    val spans = withFile.groupBy(col("f"))
      .agg((max(col(c)) - min(col(c))).as("span"))
      .agg(avg(col("span"))).head.getDouble(0)
    spans / global
  }

  test("zAddressK interleaves k=3 bits (known values) and matches zAddress at k=2") {
    // a=0b11 → bits {0,1} → positions {0,3} = 9; b=0b101 → {0,2} →
    // {1,7} = 130; c=1 → {0} → {2} = 4; z = 9|130|4 = 143
    val z3 = Seq((3L, 5L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zAddressK(Seq(col("a"), col("b"), col("c"))).as("z"))
    assert(z3.as[Long].head() === 143L)
    // at k=2 the generic tree agrees with the mask-ladder fast path
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L))
    val both = pairs.toDF("a", "b").select(
      ZOrder.zAddress(col("a"), col("b")).as("fast"),
      ZOrder.zAddressK(Seq(col("a"), col("b"))).as("generic"))
    both.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("3-dim Z-layout tightens per-file spans in ALL THREE dimensions") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    // per-dim span scales as numFiles^(-1/k): 64 files over a 3-dim
    // curve → 4 cuts per dimension, ~1/4 expected span per file
    val zDir = tmpDir("zorder3-out")
    ZOrder.layoutK(li, Seq("l_partkey", "l_suppkey", "l_orderkey"),
        numFiles = 64)
      .write.mode("overwrite").parquet(zDir)
    // baseline: single-column range clustering is blind on dims 2 and 3
    val rDir = tmpDir("range3-out")
    li.repartitionByRange(64, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(rDir)
    val spans = Seq("l_partkey", "l_suppkey", "l_orderkey")
      .map(c => c -> meanSpanFraction(zDir, c)).toMap
    // every dimension's per-file min/max rectangle is a minority span —
    // parquet stats prune on ANY of the three filter columns
    spans.foreach { case (c, s) => assert(s < 0.5, s"$c span fraction $s") }
    // and dims 2/3 beat the single-column layout decisively
    Seq("l_suppkey", "l_orderkey").foreach { c =>
      val r = meanSpanFraction(rDir, c)
      assert(spans(c) < r * 0.75, s"z $c span ${spans(c)} !<< range-layout $r")
    }
    assert(spark.read.parquet(zDir).count() === li.count())
  }

  test("Z-layout tightens per-file spans in BOTH dimensions") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val zDir = tmpDir("zorder-out")
    ZOrder.layout(li, "l_partkey", "l_suppkey", numFiles = 8)
      .write.mode("overwrite").parquet(zDir)
    // baseline: single-column range clustering — perfect on partkey,
    // blind on suppkey
    val rDir = tmpDir("range-out")
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(rDir)

    val zPart = meanSpanFraction(zDir, "l_partkey")
    val zSupp = meanSpanFraction(zDir, "l_suppkey")
    val rSupp = meanSpanFraction(rDir, "l_suppkey")
    // both dimensions clustered: each file covers a minority rectangle
    assert(zPart < 0.6, s"partkey span fraction $zPart")
    assert(zSupp < 0.6, s"suppkey span fraction $zSupp")
    // and the second dimension beats single-column clustering decisively
    assert(zSupp < rSupp * 0.75,
      s"z suppkey span $zSupp !<< range-layout $rSupp")
    // same rows survive the re-layout
    assert(spark.read.parquet(zDir).count() === li.count())
  }
}
