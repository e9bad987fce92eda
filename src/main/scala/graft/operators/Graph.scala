package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph operators built from DataFrame joins — no driver-side
  * graph, no GraphX dependency.
  *
  * [[connectedComponents]] is the resolution step of the dedup pipeline
  * (candidate pairs → per-document component), extracted as a library
  * operator so any edge list can be resolved — the same algorithm backs
  * `q_dedup_resolve` and is spec-tested on adversarial shapes (long
  * chains, stars, disjoint unions) against a union-find reference.
  */
object Graph {

  /** Connected components via join-based min-label propagation with PATH
    * HALVING (each round also jumps every label to its label's label), so
    * convergence takes O(log diameter) rounds, not O(diameter). Every step
    * is a DataFrame join/aggregate — scales with the cluster, no driver
    * materialization.
    *
    * Input: undirected edges as `(src, dst)` pairs (either orientation,
    * duplicates tolerated). Output: `(doc, comp)` for every vertex that
    * appears in at least one edge, where `comp` is the smallest vertex id
    * in the component. Isolated vertices never enter the edge list, so the
    * caller joins the result back to its full entity table (as
    * q_dedup_resolve does).
    *
    * Loop-state discipline: per-round state is localCheckpoint'd (eager) —
    * each round references the previous labels plan twice and Catalyst
    * plans are trees copied by value, so without truncation the analyzed
    * plan doubles per iteration. persist() caches data but never cuts the
    * plan. Superseded checkpoints are freed as soon as the round advances.
    * On a real cluster the loop state would use reliable checkpoint() for
    * executor-loss tolerance.
    *
    * Loop-scoped session tuning (restored on exit): shuffle width sized
    * from the edge count — the loop runs over the docs-in-pairs sliver,
    * not the corpus — and AQE off, since its per-stage stat-collection
    * jobs are pure latency on small state with a pre-chosen partitioning.
    *
    * @param maxIters safety cap; path halving makes the default ample for
    *                 any graph this side of diameter 2^20. Hitting the cap
    *                 THROWS — silently emitting labels that disagree with
    *                 the transitive closure would corrupt downstream dedup.
    */
  def connectedComponents(pairs0: DataFrame, maxIters: Int = 20): DataFrame = {
    val s = pairs0.sparkSession
    val pairs = pairs0.toDF("src", "dst").persist(StorageLevel.DISK_ONLY)
    val sessionParts = s.conf.get("spark.sql.shuffle.partitions")
    val nEdges = pairs.count() * 2
    val loopParts = math.max(1L, math.min(sessionParts.toLong, nEdges / 100000L + 1L)).toInt
    val edges = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(loopParts, col("src"))
      .persist(StorageLevel.DISK_ONLY)
    // Force the edges cache NOW: its RDD only registers in
    // getPersistentRDDs on first materialization, and if that happened
    // inside the first checkpoint's id-delta window, round 1's cleanup
    // would unpersist the very cache the whole loop depends on.
    edges.count()
    val sc = s.sparkContext
    def persistedIds = sc.getPersistentRDDs.keySet.toSet
    var converged = false
    var iter = 0
    var labels: DataFrame = null
    var labelIds = Set.empty[Int]
    val sessionAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val base = persistedIds
      labels = edges.select(col("src").as("doc")).distinct()
        .select(col("doc"), col("doc").as("comp"))
        .localCheckpoint()
      labelIds = persistedIds -- base
      while (!converged && iter < maxIters) {
        // neighbor step: take the min label over incoming edges
        val prop = edges.join(labels, col("src") === col("doc"))
          .groupBy(col("dst")).agg(min(col("comp")).as("nc"))
        val stepped = labels.as("l")
          .join(prop, col("l.doc") === col("dst"), "left")
          .select(col("l.doc").as("doc"),
            least(col("l.comp"), coalesce(col("nc"), col("l.comp"))).as("comp"),
            col("l.comp").as("old_comp")) // carried for the convergence test
        // path halving: comp := min(comp, comp(comp))
        val m = stepped.select(col("doc").as("m_doc"), col("comp").as("m_comp"))
        val before = persistedIds
        val next = stepped.as("st")
          .join(m, col("st.comp") === col("m_doc"), "left")
          .select(col("st.doc").as("doc"),
            least(col("st.comp"), coalesce(col("m_comp"), col("st.comp"))).as("comp"),
            col("st.old_comp").as("old_comp"))
          .localCheckpoint() // eager: materializes the round, cuts the plan
        val nextIds = persistedIds -- before
        iter += 1
        // Convergence check every 2nd round (reads the just-checkpointed
        // blocks — no extra join): a diameter-d graph needs ~log2(d)
        // path-halved rounds, so checking half as often saves blocking
        // actions at the cost of at most one extra round over converged
        // (tiny) state. An even cap means the final permitted round checks.
        converged = (iter % 2 == 0 || iter == maxIters) &&
          next.filter(col("comp") =!= col("old_comp")).isEmpty
        // The superseded round's checkpoint blocks are dead the moment we
        // swap labels — free them now rather than carrying every round's
        // blocks to the end of the query.
        labelIds.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
        labelIds = nextIds
        labels = next.select(col("doc"), col("comp"))
      }
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", sessionParts)
      s.conf.set("spark.sql.adaptive.enabled", sessionAqe)
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: label propagation did not converge within $iter rounds")
    labels
  }
}
