package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The production-randomness DP mode (round-12 directive #6):
  * `graft.dp.secure=true` swaps the seeded md5 uniform behind the three
  * q_dp_* mechanisms for a SecureRandom draw with the identical half-step
  * distribution and sensitivity accounting. A secure release cannot be
  * value-checked (that is the point), so this spec checks what CAN be:
  * the noise distribution, the non-reproducibility, and the threshold /
  * shape contracts — while the seeded twin stays bit-reproducible for
  * the oracle gate. */
class DpSecureSpec extends SparkSpec {

  private def secureSession() = {
    val sec = spark.newSession()
    sec.conf.set("graft.dp.secure", "true")
    sec
  }

  test("secure Laplace noise has the declared scale: mean 0, E|x| = b = 1, sign-balanced") {
    val sec = secureSession()
    // 4000 draws through the REGISTERED uniform: the same inverse-CDF the
    // queries apply, over ids instead of group keys
    val u = Sampling.dpUniform(sec, "spec:", col("id"))
    val c = u - lit(0.5)
    val noise = when(c < 0, lit(1.0)).otherwise(lit(-1.0)) *
      log(lit(1.0) - lit(2.0) * abs(c))
    val xs = sec.range(4000).select(noise.as("x")).collect().map(_.getDouble(0))
    val n = xs.length.toDouble
    val mean = xs.sum / n
    val eAbs = xs.map(math.abs).sum / n
    val posShare = xs.count(_ > 0) / n
    info(f"n=4000 mean=$mean%.3f E|x|=$eAbs%.3f P(x>0)=$posShare%.3f")
    // Laplace(b=1): sd(mean) = sqrt(2)/63, sd(E|x|) = 1/63, sd(share) = .008
    // — bounds are > 5 sigma, not hopeful
    assert(math.abs(mean) < 0.2, s"mean drifted: $mean")
    assert(eAbs > 0.8 && eAbs < 1.2, s"scale drifted: $eAbs")
    assert(posShare > 0.44 && posShare < 0.56, s"sign imbalance: $posShare")
  }

  test("secure mode is non-reproducible; seeded mode stays bit-identical") {
    val sec = secureSession()
    def noises(s: org.apache.spark.sql.SparkSession): Seq[Double] =
      SparkEntry.queries("q_dp_counts")(s, sf).collect()
        .sortBy(_.getAs[String]("lang")).map(_.getAs[Double]("noise")).toSeq
    val a = noises(sec)
    val b = noises(sec)
    assert(a != b, "secure draws repeated — the release is not private")
    val s1 = noises(spark)
    val s2 = noises(spark)
    assert(s1 == s2, "seeded mode lost its oracle reproducibility")
    // identical sensitivity accounting: same Laplace(1) tails either way
    assert(a.forall(x => math.abs(x) < 40.0), s"noise out of tail bound: $a")
  }

  test("secure q_dp_topk keeps the threshold and shape contracts") {
    val sec = secureSession()
    val rows = SparkEntry.queries("q_dp_topk")(sec, sf).collect()
    assert(rows.length <= 10)
    // every released count cleared tau = 20 WITH the same noise that is
    // published (the nondeterministic draw is pinned to one evaluation —
    // a re-drawn filter would decouple the two)
    rows.foreach { r =>
      assert(r.getAs[Double]("n_dp") >= 20.0, r.toString)
      assert(math.abs(r.getAs[Double]("n_dp") - r.getAs[Long]("n_true")) < 60.0,
        s"noise exceeded any plausible Laplace(4) tail: $r")
    }
    val ranks = rows.map(_.getAs[Long]("rank"))
    assert(ranks.toSeq == (1L to rows.length).toSeq)
    val byRank = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("n_dp"))
    assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y },
      "rank order diverged from the released counts")
  }

  test("secure q_dp_quantile releases one bin on the declared grid") {
    val sec = secureSession()
    val rows = SparkEntry.queries("q_dp_quantile")(sec, sf).collect()
    assert(rows.length == 1)
    val bin = rows(0).getAs[Long]("bin")
    assert(bin >= 0L && bin < 64L, s"released bin off the grid: $bin")
    assert(rows(0).getAs[Double]("eps") == 0.5)
  }
}
