package graft.prune

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join result on skewed data") {
    // 90% of big rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "v").collect().toSet ==
      plain.select("k", "payload", "v").collect().toSet)
  }

  test("salt spreads the hot key over multiple join partitions") {
    val big = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val spread = big
      .withColumn("s", pmod(xxhash64(big.columns.map(col): _*), lit(8)))
      .select("s").distinct().count()
    assert(spread > 4, s"salt only produced $spread distinct values")
  }
}
