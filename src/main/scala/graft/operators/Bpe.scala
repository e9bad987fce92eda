package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding TRAINING (Sennrich et al. 2016) over a weighted
  * distinct-word table — the tokenizer-training loop that `q_bpe_step` is
  * one iteration of.
  *
  * Words are held as ';'-terminated symbol strings ("aaab" → "a;a;a;b;";
  * ';' cannot occur inside a symbol because the tokenizer alphabet is
  * [a-z0-9]). One round = count adjacent symbol pairs weighted by word
  * count, pick the (count desc, pair asc) argmax as the merge, and apply
  * it with a literal `replace` of "l;r;" → "lr;" — left-to-right
  * non-overlapping, which is exactly the reference BPE merge pass (an odd
  * run "a;a;a;" merges once to "aa;a;", an even run twice), and identical
  * in Spark and DuckDB, so the whole training loop replays bit-for-bit as
  * chained oracle CTEs.
  *
  * Execution shape (the only one that survives 100 TB): the corpus
  * collapses to the DISTINCT-WORD table FIRST — vocabulary grows ~log of
  * corpus size, so this is a few million rows at 100 TB — and every round
  * touches only that table: one pair-keyed partial+final aggregate
  * (alphabet²-sized output) and a 1-ROW collect of the argmax as model
  * state. No window, no join, and nothing corpus-sized ever moves after
  * the initial word count — the same model-state-to-driver discipline as
  * [[KMeans]].
  */
object Bpe {

  /** One learned merge: (sym_l, sym_r, weighted pair count). */
  type Merge = (String, String, Long)

  /** The word table symbolized, with `merges` applied in order: adds a
    * `ws` column of ';'-terminated symbols. Re-derives from the raw word
    * column each call so a round-k frame is exactly k literal replaces
    * deep — the plan the oracle replays. */
  def symbolized(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words.withColumn("ws", regexp_replace(col("w"), "(.)", "$1;"))) {
      case (df, (l, r, _)) =>
        df.withColumn("ws", expr(s"replace(ws, '$l;$r;', '$l$r;')"))
    }

  /** Weighted adjacent-pair counts of a symbolized frame: (sym_l, sym_r,
    * cnt). Words reduced to one symbol carry no pairs and are filtered
    * before the explode (Spark's `sequence` turns descending on an empty
    * range, so the guard is load-bearing, not cosmetic). */
  def pairCounts(sym: DataFrame): DataFrame =
    sym.withColumn("sa", split(col("ws"), ";"))
      .filter(size(col("sa")) >= 3) // >= 2 symbols (+1 trailing empty)
      .select(col("wcnt"), explode(expr(
        "transform(sequence(1, size(sa) - 2), i -> " +
          "struct(element_at(sa, i) as l, element_at(sa, i + 1) as r))")).as("p"))
      .groupBy(col("p.l").as("sym_l"), col("p.r").as("sym_r"))
      .agg(sum(col("wcnt")).as("cnt"))

  /** Up to `merges` training rounds over a (w, wcnt) word table; stops
    * early when no pair remains. Each round collects exactly one row.
    * `manageCache = false` lets a caller that ALSO reads the word table
    * after training (q_bpe_encode) hold one persist across both uses
    * instead of paying a second corpus pass. */
  def train(words: DataFrame, merges: Int, manageCache: Boolean = true): Seq[Merge] = {
    val cached = if (manageCache) words.persist(StorageLevel.DISK_ONLY) else words
    try {
      var acc = List.empty[Merge]
      var exhausted = false
      for (_ <- 1 to merges if !exhausted) {
        val best = pairCounts(symbolized(cached, acc.reverse))
          .orderBy(col("cnt").desc, col("sym_l"), col("sym_r"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else acc = (best(0).getString(0), best(0).getString(1), best(0).getLong(2)) :: acc
      }
      acc.reverse
    } finally if (manageCache) cached.unpersist(blocking = false)
  }
}
