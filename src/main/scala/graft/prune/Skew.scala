package graft.prune

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit salting
  * is the deterministic fallback when one key dominates so heavily that a
  * single task would still own it (the classic 100 TB failure mode: one
  * executor runs for hours while 999 idle).
  *
  * Shape: the big side gets a deterministic pseudo-salt in [0, salts); the
  * small side is replicated once per salt value; the join key becomes
  * (key, salt), spreading each hot key over `salts` tasks. Cost: small side
  * × salts — which is why this pairs with a broadcast-size small side.
  */
object Skew {

  /** Salted inner equi-join, result identical to `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0)
    // Deterministic spread: hash all big-side columns; identical rows
    // sharing a salt is harmless (they'd land in one task anyway).
    val saltCol: Column = pmod(xxhash64(big.columns.map(col): _*), lit(salts))
    val bigS = big.withColumn("__graft_salt", saltCol)
    val smallS = small.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    bigS.join(smallS, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
