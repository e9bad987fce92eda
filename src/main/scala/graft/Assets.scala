package graft

/** Build-cost ledger for memoized per-dataset assets (MinHash signatures,
  * component labels, exact-pair tables, layout assets). Each asset is
  * computed once per JVM and then re-read by every consumer query — the
  * production amortization shape — so a bench median over repeats reports
  * PROBE time. This ledger records the first-touch build seconds so the
  * bench artifact can carry them separately (`assets_s`) and nobody
  * misreads a 0.2 s probe as the cost of building the asset from cold.
  */
object Assets {
  private val builds = scala.collection.concurrent.TrieMap.empty[String, Double]

  /** Run `f` (an asset build) and record its wall seconds under `name`.
    * Re-builds for another dataset dir overwrite — the bench runs one
    * dataset per JVM, and the last build is the one its medians amortize. */
  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    builds.put(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** All recorded builds (asset name → build seconds). */
  def snapshot: Map[String, Double] = builds.toMap
}
