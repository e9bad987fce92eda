package graft

import org.apache.spark.sql.functions._

/** Cross-engine numeric helpers. The load-bearing property here is
  * [[Num.rangeBucket]] MONOTONICITY: the whole distributed-rank family
  * (q_gini, q_pareto_8020, q_skyline, the rankedVocab scaffold) is only
  * correct if bucket order never contradicts value order — a single
  * inversion would mis-rank every row across that bucket boundary. */
class NumSpec extends SparkSpec {
  import spark.implicits._

  test("rangeBucket is monotone over adversarial non-negative values") {
    // digit-boundary values (9→10, 99→100, …), sub-1 fractions, exact
    // ties, and a pseudo-random spread across 12 orders of magnitude
    val rng = new scala.util.Random(7)
    val adversarial = Seq(0.0, 0.1, 0.97, 1.0, 1.5, 9.0, 9.999, 10.0,
      10.01, 42.0, 99.0, 99.99, 100.0, 100.5, 999.0, 1000.0, 1e6 - 1,
      1e6, 1e6 + 0.5, 987654321.123, 1e12)
    val random = Seq.fill(2000)(math.pow(10, rng.nextDouble() * 12) *
      (1 + rng.nextDouble()))
    val rows = (adversarial ++ random ++ adversarial) // repeats → ties
      .toDF("x")
      .select(col("x"), Num.rangeBucket(col("x")).as("b"))
      .orderBy(col("x"))
      .collect()
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getString(1) <= hi.getString(1),
        s"bucket inversion: x=${lo.getDouble(0)} b=${lo.getString(1)} vs " +
          s"x=${hi.getDouble(0)} b=${hi.getString(1)}")
      if (lo.getDouble(0) == hi.getDouble(0))
        assert(lo.getString(1) == hi.getString(1), "equal values split buckets")
    }
    // the spread actually buckets (not one degenerate bucket)
    assert(rows.map(_.getString(1)).distinct.length > 20)
  }

  test("rangeBucket contract: negatives raise, decimal-overflow values keep a max bucket, null passes through") {
    // negative input would bucket in INVERTED order — must fail loudly
    val neg = intercept[Exception] {
      Seq(-1.5).toDF("x").select(Num.rangeBucket(col("x"))).collect()
    }
    assert(neg.getMessage.contains("rangeBucket"), neg.getMessage)
    // extreme doubles: floor()'s long conversion SATURATES at 2^63-1, so
    // everything >= Long.MaxValue shares the top 19-digit bucket — still
    // monotone, and never the silent NULL that would vanish from the
    // downstream rb-equi-joins (the "99~" sentinel additionally guards the
    // decimal-typed overflow path, unreachable from doubles)
    val rows = Seq(1e12, 1e18, 1e19, 1e39, Double.MaxValue).toDF("x")
      .select(col("x"), Num.rangeBucket(col("x")).as("b"))
      .orderBy(col("x")).collect()
    assert(rows.forall(_.getString(1) != null),
      "no input may bucket to NULL (rows would drop from rb joins)")
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getString(1) <= hi.getString(1),
        s"inversion at the overflow boundary: ${lo.getDouble(0)} vs ${hi.getDouble(0)}")
    }
    assert(rows.last.getString(1) == "1992", rows.last.getString(1))
    // NULL in, NULL out (the pre-guard behavior)
    val n = Seq[Option[Double]](None).toDF("x")
      .select(Num.rangeBucket(col("x"))).head
    assert(n.isNullAt(0))
  }

  test("checksum modulus arithmetic is representation-stable in the long range") {
    // the mod-2^61 reduction of a DECIMAL(38,0) sum lands in [0, 2^61):
    // always a valid non-negative BIGINT in any engine's result path
    val sums = Seq("0", "1", "2305843009213693951", "2305843009213693952",
      "99999999999999999999999999999999999999")
    val out = sums.toDF("s")
      .select((col("s").cast("decimal(38,0)") % lit(Num.ChecksumMod))
        .cast("long").as("m"))
      .collect().map(_.getLong(0))
    assert(out.forall(m => m >= 0 && m < Num.ChecksumMod))
    assert(out(0) === 0L && out(1) === 1L)
    assert(out(2) === Num.ChecksumMod - 1 && out(3) === 0L)
  }
}
