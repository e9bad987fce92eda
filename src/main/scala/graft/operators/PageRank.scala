package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Damped PageRank over a directed edge list, iterated with the
  * [[Graph.connectedComponents]] loop discipline (truncate-per-round plan
  * cutting, freed superseded rounds, loop-scoped child-session tuning) and
  * the [[KMeans.trainConverged]] fixed-point stop: mass is FIXED-POINT
  * integer (1e6 per node, damping 85/100 as integer ops — the
  * q_pagerank_iter convention), so "converged" is exact rank equality, not
  * a float tolerance, and every round is bit-deterministic in any engine
  * and any partition order.
  *
  * Per-round shape (each shuffle key-bounded, nothing quadratic):
  *   - contributions: degree-widened edges ⋈ ranks on `src` (fanout =
  *     edge count; out-degrees are joined into the edge relation ONCE
  *     before the loop), integer `rank div deg` per edge;
  *   - inflow: one dst-keyed integer sum (map-side combined);
  *   - next ranks: node table LEFT JOIN inflow — nodes without inflow
  *     (sources) settle at the teleport mass 150000 after round 1.
  *
  * Edges are taken as given (parallel edges act as weights; callers
  * wanting simple-graph semantics dedup first, as q_pagerank_k does).
  * Dangling nodes (no out-edges) absorb mass without redistributing it —
  * the same contract as the single-round q_pagerank_iter query this
  * operator iterates.
  */
object PageRank {

  /** Ranks after EXACTLY `iters` damped rounds from the uniform 1e6 start —
    * the SQL-oracle-expressible variant (k chained CTE rounds); returns
    * (node, rank_fp). */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "at least one PageRank round")
    run(edges, iters, convergeStop = false)._1
  }

  /** PERSONALIZED ranks: teleport mass lands only on `seeds` (one `node`
    * column) and the start mass is 1e6 on seeds, 0 elsewhere — authority
    * RELATIVE to a trusted set (the curation question "which nodes do my
    * vetted sources endorse", vs the global variant's "which nodes does
    * the whole graph endorse"). Same loop, same integer fixed-point
    * arithmetic: the standard variant IS this one with every node a
    * seed, so the seed flag is carried through the rank state and costs
    * one boolean per node. Non-seed nodes unreachable from any seed
    * settle at exactly 0. */
  def ranksPersonalized(edges: DataFrame, seeds: DataFrame,
                        iters: Int): DataFrame = {
    require(iters >= 1, "at least one PageRank round")
    run(edges, iters, convergeStop = false, seeds = Some(seeds))._1
  }

  /** Iterate to the EXACT integer fixed point (ranks stop changing).
    * Returns (ranks, roundsRun) — roundsRun includes the final no-change
    * round that proved convergence. Hitting `maxIters` THROWS: silently
    * returning non-fixed-point ranks would let a truncated authority
    * signal leak into downstream quality gates unlabeled.
    *
    * @param checkpointDir as in [[Graph.connectedComponents]]: when set,
    *        loop state is reliably checkpointed there (executor-loss
    *        tolerance on a real cluster); same context-global caveat —
    *        concurrent invocations must pass the same dir. */
  def trainConverged(edges: DataFrame, maxIters: Int = 100,
                     checkpointDir: Option[String] = None): (DataFrame, Int) =
    run(edges, maxIters, convergeStop = true, checkpointDir)

  private def run(edges0: DataFrame, maxIters: Int, convergeStop: Boolean,
                  checkpointDir: Option[String] = None,
                  seeds: Option[DataFrame] = None): (DataFrame, Int) = {
    val s = edges0.sparkSession
    val pairs = edges0.toDF("src", "dst").persist(StorageLevel.DISK_ONLY)
    val loopS = s.newSession()
    checkpointDir.foreach(s.sparkContext.setCheckpointDir)
    // Plan truncation with a directly held RDD handle — the Graph.truncate
    // idiom verbatim: reliable-or-local checkpoint, eager materialization,
    // LogicalRDD leaf in the loop session.
    def truncate(df: DataFrame): (DataFrame, RDD[Row]) = {
      val rdd = df.rdd
      if (checkpointDir.isDefined) {
        rdd.persist(StorageLevel.DISK_ONLY)
        rdd.checkpoint()
      } else rdd.localCheckpoint()
      rdd.count()
      (loopS.createDataFrame(rdd, df.schema), rdd)
    }
    def free(rdd: RDD[Row]): Unit = {
      rdd.unpersist(blocking = false)
      if (checkpointDir.isDefined) rdd.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
    var edges: DataFrame = null
    var deg: DataFrame = null
    var lastRdd: RDD[Row] = null
    var lastSchema: org.apache.spark.sql.types.StructType = null
    try {
      val nEdges = pairs.count()
      val sessionParts = s.conf.get("spark.sql.shuffle.partitions")
      val loopParts =
        math.max(1L, math.min(sessionParts.toLong, nEdges / 100000L + 1L)).toInt
      loopS.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
      loopS.conf.set("spark.sql.adaptive.enabled", "false")
      // Edges pre-partitioned on the join key (src) once, then WIDENED by
      // their out-degree once — the (src, dst, deg) relation every round's
      // contribution join probes. Joining deg inside the loop instead
      // would repeat that node-sized join every round; hoisted here it is
      // paid once, and the per-round work drops to rank-join + two
      // aggregates. 8 bytes/row wider than the bare edge list — free at
      // any scale next to a per-round shuffle.
      val bare = loopS.createDataFrame(pairs.rdd, pairs.schema)
        .repartition(loopParts, col("src"))
        .persist(StorageLevel.DISK_ONLY)
      deg = bare.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      edges = bare.join(deg, "src")
        .repartition(loopParts, col("src"))
        .persist(StorageLevel.DISK_ONLY)
      edges.count() // edges-with-deg materialized; feeder handles are dead weight
      bare.unpersist(blocking = false)
      pairs.unpersist(blocking = false)
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      // seed flag rides in the rank state: standard PageRank is the
      // all-seeds special case, so one code path serves both
      val flagged = seeds match {
        case None => nodes.select(col("node"), lit(true).as("is_seed"))
        case Some(sd) =>
          val sdf = loopS.createDataFrame(
            sd.select(col("node")).distinct().rdd, sd.select(col("node")).schema)
          nodes.join(sdf.withColumn("s_flag", lit(true)), Seq("node"), "left")
            .select(col("node"), coalesce(col("s_flag"), lit(false)).as("is_seed"))
      }
      val (ranks0, rdd0) = truncate(
        flagged.select(col("node"),
          when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)).as("rank_fp"),
          col("is_seed")))
      var ranks = ranks0
      lastRdd = rdd0
      lastSchema = ranks0.schema
      var converged = false
      var iter = 0
      while (!converged && iter < maxIters) {
        val contrib = edges
          .join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("rank_fp div deg").as("w"))
          .groupBy(col("dst")).agg(sum(col("w")).as("inflow"))
        val (next, nextRdd) = truncate(
          ranks.select(col("node"), col("rank_fp").as("old_rank"), col("is_seed"))
            .join(contrib, col("node") === col("dst"), "left")
            .select(col("node"),
              (when(col("is_seed"), lit(150000L)).otherwise(lit(0L)) +
                expr("(85 * coalesce(inflow, cast(0 as bigint))) div 100"))
                .as("rank_fp"),
              col("old_rank"), col("is_seed")))
        iter += 1
        // Exact integer fixed point — reads the just-checkpointed blocks.
        converged = convergeStop &&
          next.filter(col("rank_fp") =!= col("old_rank")).isEmpty
        free(lastRdd)
        lastRdd = nextRdd
        lastSchema = next.schema
        ranks = next.select(col("node"), col("rank_fp"), col("is_seed"))
      }
      if (convergeStop && !converged) throw new IllegalStateException(
        s"PageRank: integer ranks did not reach a fixed point within $iter rounds")
      if (checkpointDir.isDefined) lastRdd.unpersist(blocking = false)
      (s.createDataFrame(lastRdd, lastSchema).select(col("node"), col("rank_fp")),
        iter)
    } catch {
      case t: Throwable =>
        if (lastRdd != null) free(lastRdd)
        throw t
    } finally {
      pairs.unpersist(blocking = false)
      if (edges != null) edges.unpersist(blocking = false)
      if (deg != null) deg.unpersist(blocking = false)
    }
  }
}
