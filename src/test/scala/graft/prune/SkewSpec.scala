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

  test("AQE OptimizeSkewedJoin splits the hot partition at runtime on the skewed fixture") {
    // The OTHER half of the skew story (Skew.scala handles the manual
    // salt): Spark's own runtime rewrite, demonstrated with thresholds
    // scaled to local fixture sizes (the defaults are 256 MB-class). The
    // final adaptive plan must carry the skew=true SMJ marker — proof the
    // hot partition was detected and split into subpartitions.
    //
    // When the manual salt still beats AQE, and why both exist here:
    // AQE can only split AFTER the shuffle has already written the hot
    // partition (the write itself stays single-stream for that key), only
    // for sort-merge/shuffled-hash joins, and only at map-output
    // granularity; the deterministic pre-salt spreads the hot key at
    // shuffle-WRITE time, works under any join strategy (including
    // broadcast, where AQE skew handling never engages), and gives
    // reproducible task shapes — the right tool when one key dominates so
    // heavily that even a split partition's write is the bottleneck.
    val tuned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of 200k rows share key 42; ~70-byte payloads make the hot
      // shuffle partition several MB — far over the tuned 128 KB bar
      val big = spark.range(0, 200000).select(
        when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(42L)).as("k"),
        concat(lit("x"), lpad(col("id").cast("string"), 64, "0")).as("payload"))
      val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
        (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "v")
      val joined = big.join(small, "k")
      // execute THIS frame's own QueryExecution (count()/write would wrap
      // the plan in a fresh one and leave this one un-finalized)
      assert(joined.collect().length == 200000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"),
        s"AQE did not mark the hot join skewed — no OptimizeSkewedJoin rewrite:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salt spreads the hot key over multiple join partitions") {
    val big = (1 to 1000).map(i => (42L, i)).toDF("k", "payload")
    val spread = big
      .withColumn("s", pmod(xxhash64(big.columns.map(col): _*), lit(8)))
      .select("s").distinct().count()
    assert(spread > 4, s"salt only produced $spread distinct values")
  }
}
