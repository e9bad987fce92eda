package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics + scale-plan pins for the TPC-H-derived shapes (Shapes.scala)
  * at sf0.001. Value-level correctness is the DuckDB oracle's job; these
  * tests pin the invariants a refactor could silently lose. */
class ShapesSpec extends SparkSpec {

  private def run(q: String) = SparkEntry.queries(q)(spark, sf)
  private def plan(q: String): String =
    run(q).queryExecution.executedPlan.toString

  test("q_order_count_dist covers every customer exactly once") {
    val rows = run("q_order_count_dist").collect()
    val customers = graft.Tables.load(spark, sf, "customer").count()
    assert(rows.map(_.getLong(1)).sum === customers)
    // distribution buckets are unique
    val buckets = rows.map(_.getLong(0))
    assert(buckets.distinct.length === buckets.length)
  }

  test("q_order_count_dist pre-aggregates orders before the outer join") {
    // the join must consume the aggregated per-customer counts, not raw
    // orders: in the optimized logical plan an Aggregate sits BELOW the
    // outer join (Catalyst cannot introduce one there itself)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = run("q_order_count_dist").queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    assert(joins.nonEmpty, lp.toString)
    assert(joins.forall(_.collect { case a: Aggregate => a }.nonEmpty),
      "orders not pre-aggregated below the join:\n" + lp)
  }

  test("q_top_supplier returns the argmax supplier(s) with exact revenue") {
    val rows = run("q_top_supplier").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length === 1, "tie rows must share the max revenue")
  }

  test("q_small_qty_revenue yields one aggregate row") {
    val rows = run("q_small_qty_revenue").collect()
    assert(rows.length === 1)
    assert(!rows.head.isNullAt(0) && rows.head.getDouble(0) > 0.0)
  }

  test("q_inactive_customers: every reported customer is above the cutoff") {
    val total = run("q_inactive_customers").collect().map(_.getLong(1)).sum
    assert(total > 0)
    // no customer with a recent order may appear: recompute the quiet set
    import org.apache.spark.sql.functions._
    val cust = graft.Tables.load(spark, sf, "customer")
    val recent = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01")))
      .select(col("o_custkey")).distinct()
    val cut = cust.filter(col("c_acctbal") > 0.0)
      .agg(graft.Num.davg(col("c_acctbal"))).head.getDouble(0)
    val expected = cust.filter(col("c_acctbal") > cut)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(total === expected)
  }

  test("q_nation_volume restricts both dims via broadcast, no cartesian") {
    val p = plan("q_nation_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_nation_volume rows pair the two nations asymmetrically") {
    val rows = run("q_nation_volume").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) != r.getString(1)))
    assert(rows.forall(r => Set("NATION_18", "NATION_19")(r.getString(0))))
  }

  test("q_market_share yields a share in [0,1] per year, dims broadcast") {
    val rows = run("q_market_share").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val s = r.getDouble(1); s >= 0.0 && s <= 1.0
    })
    val p = plan("q_market_share")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_promo_share is a single percentage row with month pushdown") {
    val rows = run("q_promo_share").collect()
    assert(rows.length === 1)
    val s = rows.head.getDouble(0)
    assert(s >= 0.0 && s <= 100.0)
    val p = plan("q_promo_share")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q_part_contribution keeps only above-threshold parts, total from the aggregate") {
    import org.apache.spark.sql.functions._
    val rows = run("q_part_contribution").collect()
    assert(rows.nonEmpty)
    // verify against an independent computation of the threshold
    val pv = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_partkey")).agg(graft.Num.dsum(col("l_extendedprice")).as("v"))
    val (tot, n) = {
      val r = pv.agg(graft.Num.dsum(col("v")), count(lit(1))).head
      (r.getDouble(0), r.getLong(1))
    }
    val thr = 1.25 * tot / n
    assert(rows.forall(_.getDouble(1) > thr))
    assert(rows.length === pv.filter(col("v") > thr).count())
  }

  test("q_priority_exists counts only late-shipping orders, all five priorities") {
    val rows = run("q_priority_exists").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q_returned_topcust is a top-20 on exact revenue with broadcast nation") {
    val rows = run("q_returned_topcust").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(4))
    assert(revs.sameElements(revs.sortBy(-_: Double)), "not revenue-descending")
    val p = plan("q_returned_topcust")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_disjunctive_pred pushes the common quantity bounds to the scan") {
    val p = plan("q_disjunctive_pred")
    // l_quantity >= 1 / <= 40 is the hull of the two OR branches —
    // Catalyst should derive SOME lineitem pushdown from the disjunction
    assert(p.contains("PushedFilters"), p)
    val rows = run("q_disjunctive_pred").collect()
    assert(rows.length === 1 && rows.head.getDouble(0) > 0.0)
  }

  test("q_volume_supplier: concentration threshold is data-relative") {
    val rows = run("q_volume_supplier").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 1))
    // suppliers are unique in the output
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
  }

  test("q_profit_by_nation groups (nation, year) with both dims broadcast") {
    val rows = run("q_profit_by_nation").collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getInt(1)))
    assert(keys.distinct.length === keys.length)
    val p = plan("q_profit_by_nation")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_retention: offset-0 cell of each cohort counts the whole cohort") {
    val rows = run("q_retention").collect()
    assert(rows.nonEmpty)
    // every cohort has an offset-0 row, and no later cell exceeds it
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, cells) =>
      val zero = cells.find(_.getLong(1) == 0L)
      assert(zero.isDefined, "cohort missing its week-0 cell")
      assert(cells.forall(_.getLong(2) <= zero.get.getLong(2)),
        "retention cell larger than its cohort")
    }
  }

  test("q_table_profile profiles every column from one scan") {
    val rows = run("q_table_profile").collect()
    assert(rows.length === 4)
    val n = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) === n), "n_rows must be shared")
    assert(rows.forall(r => r.getLong(3) > 0 && r.getDouble(5) >= r.getDouble(4)))
    // one scan: exactly one FileScan of lineitem in the plan
    val p = plan("q_table_profile")
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem")) === 1, p)
  }

  test("q_map_ops merges parsed and literal maps without key loss") {
    val rows = run("q_map_ops").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) === 3), "merged map should hold k+type+uid")
    assert(rows.forall(r => r.getString(4).split(",").length === 3))
    assert(rows.forall(r => r.getString(1) === "k"))
  }

  test("q_hll_union: merged-sketch estimate answers the global distinct within bound") {
    val rows = run("q_hll_union").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "a sketch estimate left its 5% bound")
    val total = rows.filter(_.getString(0) == "TOTAL")
    assert(total.length === 1)
    val perType = rows.filterNot(_.getString(0) == "TOTAL")
    // users overlap across types: the union is smaller than the sum
    assert(total.head.getLong(1) <= perType.map(_.getLong(1)).sum)
  }

  test("q_table_checksum is invariant under repartitioning (order-free sum)") {
    import org.apache.spark.sql.functions._
    val base = run("q_table_checksum").collect()
    // same computation over a shuffled/repartitioned input
    val li = graft.Tables.load(spark, sf, "lineitem").repartition(7, col("l_partkey"))
    val re = li.select(col("l_returnflag"),
        conv(substring(md5(encode(
          concat_ws(":", col("l_orderkey"), col("l_linenumber")), "UTF-8")),
          1, 10), 16, 10).cast("decimal(38,0)").as("h"))
      .groupBy(col("l_returnflag"))
      .agg((sum(col("h")) % lit(graft.Num.ChecksumMod)).cast("long").as("checksum"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag")).collect()
    assert(base.map(_.toString).toSeq === re.map(_.toString).toSeq)
  }

  test("q_session_window agrees with the gap-cut sessionize on session structure") {
    val sw = run("q_session_window").collect()
    val gz = SparkEntry.queries("q_sessionize")(spark, sf).collect()
    assert(sw.length === gz.length, "session counts differ")
    // per-user session counts identical
    val a = sw.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    val b = gz.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(a === b)
  }

  test("q_session_window plans the native session-window aggregate, one shuffle") {
    val p = plan("q_session_window")
    assert(p.contains("UpdatingSessions") || p.contains("MergingSessions") ||
      p.contains("session_window"), p)
    val shuffles = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1, s"$shuffles data shuffles:\n$p")
  }

  test("q_top_supplier prunes the lineitem scan to the 3-month window") {
    val p = plan("q_top_supplier")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("q_min_cost_supplier: every row carries its part's true minimum cost") {
    import org.apache.spark.sql.functions._
    val rows = run("q_min_cost_supplier").collect()
    assert(rows.nonEmpty)
    // independent recomputation of the per-part minimum
    val pq = graft.Tables.load(spark, sf, "part")
      .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
      .select(col("p_partkey"))
    val mins = graft.Tables.load(spark, sf, "lineitem")
      .join(pq, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey")).agg(min(col("l_extendedprice")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(4) === mins(r.getLong(2)),
        s"part ${r.getLong(2)} not at its minimum cost")
    }
    // every qualifying part is represented (ties may add rows, never drop parts)
    assert(rows.map(_.getLong(2)).distinct.length === mins.size)
  }

  test("q_min_cost_supplier broadcasts both dims; no cartesian") {
    val p = plan("q_min_cost_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_revenue_forecast pushes all three predicates into the scan") {
    // the rendered plan truncates PushedFilters, so read the scan node's
    // metadata directly (pre-AQE physical plan has the plain tree)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = run("q_revenue_forecast").queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.metadata("PushedFilters")
    }
    assert(scans.length === 1)
    val pushed = scans.head
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    assert(run("q_revenue_forecast").collect().length === 1)
  }

  test("q_priority_split: high + low = every late-shipped lineitem, counted once") {
    import org.apache.spark.sql.functions._
    val rows = run("q_priority_split").collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val expected = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1998-01-01"))).count()
    assert(total === expected, "orderkey FK join must be fanout-1 and lossless")
  }

  test("q_supplier_cnt: anti join excludes negative-balance suppliers from every count") {
    import org.apache.spark.sql.functions._
    val p = plan("q_supplier_cnt")
    assert(p.contains("LeftAnti"), p)
    val ok = graft.Tables.load(spark, sf, "supplier")
      .filter(col("s_acctbal") >= 0).count()
    run("q_supplier_cnt").collect().foreach { r =>
      assert(r.getLong(3) <= ok, "count exceeds the eligible supplier pool")
    }
  }

  test("q_triangle_count matches a brute-force count on the collected graph") {
    val Array(row) = run("q_triangle_count").collect()
    // rebuild the edge set independently and close wedges in memory
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2001-01-01")))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val tris = edges.toSeq.map { case (a, b) =>
      adj.getOrElse(a, Set.empty[Long])
        .count(c => b < c && edges.contains((b, c)))
    }.sum
    assert(row.getLong(0) === edges.size.toLong, "edge count")
    assert(row.getLong(1) === tris.toLong, "triangle count")
  }

  test("q_bfs_reach matches a brute-force BFS on the collected graph") {
    import org.apache.spark.sql.functions._
    val rows = run("q_bfs_reach").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent BFS in memory
    val li = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2001-01-01")))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pairs: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct
      for (x <- ps; y <- ps if x != y) yield (x, y)
    }.toSet
    val adj: Map[Long, Set[Long]] =
      pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seeds = adj.keySet.filter(_ % 100 == 0)
    val d1 = seeds.flatMap(adj(_)) -- seeds
    val d2 = d1.flatMap(adj(_)) -- seeds -- d1
    assert(rows(0L) === seeds.size.toLong)
    assert(rows(1L) === d1.size.toLong)
    assert(rows(2L) === d2.size.toLong)
  }

  test("q_shortest_path matches a brute-force 2-round Bellman-Ford on the collected graph") {
    import org.apache.spark.sql.functions._
    val got = run("q_shortest_path").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val li = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2001-01-01")))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // weighted co-purchase edges: w = 1/(# shared orders)
    val cnt = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, g) => p -> g.size }
    val adj: Map[Long, Seq[(Long, Double)]] = cnt.toSeq
      .flatMap { case ((a, b), c) =>
        Seq((a, (b, 1.0 / c)), (b, (a, 1.0 / c))) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val src = adj.keys.min
    var dist = Map(src -> 0.0)
    for (_ <- 1 to 2) {
      val prev = dist
      val cand = prev.toSeq.flatMap { case (n, dn) =>
        adj(n).map { case (m, w) => (m, dn + w) } } ++ prev.toSeq
      dist = cand.groupBy(_._1).map { case (n, ds) => n -> ds.map(_._2).min }
    }
    assert(got.keySet === dist.keySet, "reached set disagrees")
    got.foreach { case (n, dd) =>
      assert(math.abs(dd - dist(n)) < 1e-12, s"dist($n): $dd vs ${dist(n)}") }
    // the source is at distance 0 and at least one multi-hop path relaxed
    assert(got(src) === 0.0)
    assert(got.size > 1, "no node reached beyond the source")
  }

  test("q_label_prop matches a brute-force 2-round synchronous LPA on the collected graph") {
    import org.apache.spark.sql.functions._
    val got = run("q_label_prop").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent synchronous label propagation in memory
    val li = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2001-01-01")))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pairs: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct
      for (x <- ps; y <- ps if x != y) yield (x, y)
    }.toSet
    val adj: Map[Long, Seq[Long]] =
      pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    var lbl: Map[Long, Long] = adj.keySet.map(n => n -> n).toMap
    for (_ <- 1 to 2) {
      val prev = lbl
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(prev).map { case (l, g) => (l, g.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val census: Map[Long, Long] = lbl.values.groupBy(identity)
      .map { case (l, g) => l -> g.size.toLong }
    assert(got === census, "community census disagrees with in-memory LPA")
    // propagation did coarsen: strictly fewer communities than nodes
    assert(got.size < adj.size,
      s"LPA produced ${got.size} communities over ${adj.size} nodes — no coarsening")
    // Newman modularity of the 2-round partition: Q = Σ_c (e_c/m − (d_c/2m)²)
    // over undirected m; with directed pair counts m2 = 2m this is
    // Σ_c (din_c/m2 − (d_c/m2)²). Positive Q = denser-than-random
    // communities — the standard quality metric, so the operator is
    // quantitatively evaluated, not just reproduced.
    val m2 = pairs.size.toDouble
    val q = lbl.groupBy(_._2).values.map { members =>
      val nodes = members.keySet
      val din = pairs.count { case (a, b) => nodes(a) && nodes(b) }
      val dC = nodes.toSeq.map(n => adj(n).size).sum
      din / m2 - math.pow(dC / m2, 2)
    }.sum
    info(f"LPA 2-round modularity on the co-purchase graph: $q%.3f")
    assert(q > 0.0, f"modularity $q%.3f — partition no better than random")
  }

  test("q_kcore census matches a brute-force 2-round peel on the collected graph") {
    import org.apache.spark.sql.functions._
    val got = run("q_kcore").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2001-01-01")))
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    var edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    def census(e: Set[(Long, Long)]): (Long, Long) =
      (e.flatMap(p => Seq(p._1, p._2)).size.toLong, e.size.toLong)
    def peel(e: Set[(Long, Long)]): Set[(Long, Long)] = {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, g) => n -> g.size }
      val alive = deg.filter(_._2 >= 3).keySet
      e.filter(p => alive(p._1) && alive(p._2))
    }
    assert(got(0L) === census(edges))
    edges = peel(edges); assert(got(1L) === census(edges))
    edges = peel(edges); assert(got(2L) === census(edges))
    // the peel bit: each round strictly or weakly shrinks, never grows
    assert(got(1L)._1 <= got(0L)._1 && got(2L)._1 <= got(1L)._1)
    assert(got(1L)._2 <= got(0L)._2 && got(2L)._2 <= got(1L)._2)
  }

  test("q_gdpr_erasure: audit identity holds, residual is zero, blast radius matches the tombstones") {
    import org.apache.spark.sql.functions._
    val rows = run("q_gdpr_erasure").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("customer", "events", "lineitem", "orders"))
    rows.foreach { case (t, (total, linked, after, residual)) =>
      assert(residual == 0L, s"$t erasure left $residual residual rows")
      assert(total - linked == after, s"$t: $total - $linked != $after")
    }
    // independent tombstone replication: md5 first hex char '0'
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(k: Long): Char =
      md.digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.head
    val custs = graft.Tables.load(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val subj = custs.filter(hex1(_) == '0').toSet
    assert(rows("customer")._2 == subj.size.toLong)
    val orders = graft.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows("orders")._2 == orders.count(o => subj(o._2)).toLong)
    val subjOrd = orders.filter(o => subj(o._2)).map(_._1).toSet
    val linkedLi = graft.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").collect().count(r => subjOrd(r.getLong(0)))
    assert(rows("lineitem")._2 == linkedLi.toLong)
    val linkedEv = graft.Tables.load(spark, sf, "events")
      .select("user_id").collect().count(r => subj(r.getLong(0)))
    assert(rows("events")._2 == linkedEv.toLong)
    // the sweep actually bites on this data
    assert(subj.nonEmpty, "empty tombstone set — audit vacuous")
  }

  test("q_bootstrap_ci: ordered interval brackets the exact mean, width is sane") {
    val r = run("q_bootstrap_ci").head()
    val (mf, med, lo, hi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo < hi, "degenerate interval")
    assert(lo <= med && med <= hi, "median outside its own order statistics")
    // the ~94% bootstrap CI brackets the exact full-data mean on this
    // fixture (deterministic — the resample is seeded)
    assert(lo <= mf && mf <= hi, s"CI [$lo, $hi] misses exact mean $mf")
    // Poisson(1) weights keep each replicate near the full mean: the
    // interval is error-bar-sized, not a pathological blowup
    assert((hi - lo) / mf < 0.2, s"CI width ${(hi - lo) / mf} of the mean")
  }

  test("q_backtest_forecast equals the in-memory rolling-origin least-squares replay") {
    import org.apache.spark.sql.functions._
    val got = run("q_backtest_forecast").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 3)
    val rows = graft.Tables.load(spark, sf, "orders")
      .select(date_trunc("month", col("o_orderdate")).as("mon"), col("o_totalprice"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
    // monthly rollup in cents (exact), month index centered like the query
    val byMon = rows.groupBy(_._1).map { case (mon, g) =>
      val cents = g.map(x => math.round(x._2 * 100)).sum
      val cal = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
      cal.setTime(mon)
      val t = (cal.get(java.util.Calendar.YEAR) * 12 +
        cal.get(java.util.Calendar.MONTH) + 1 - 24020).toLong
      (mon, t, cents)
    }.toSeq.sortBy(_._2)
    byMon.takeRight(3).foreach { case (mon, ot, ycents) =>
      val train = byMon.filter(_._2 < ot)
      val n = train.size.toDouble
      val sx = train.map(_._2).sum.toDouble
      val sy = train.map(_._3).sum.toDouble / 100.0
      val sxy = train.map(x => x._2 * x._3).sum.toDouble / 100.0
      val sxx = train.map(x => x._2 * x._2).sum.toDouble
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val yHat = sy / n + b * (ot - sx / n)
      val g = got.find(_._1 == mon).get
      assert(math.abs(g._3 - yHat) / math.abs(yHat) < 1e-9, s"$mon y_hat")
      assert(math.abs(g._2 - ycents / 100.0) < 1e-6, s"$mon y_true")
      assert(g._4 >= 0.0)
    }
    // 2^53 HEADROOM CONTRACT (round-11 advice): the num = n·sxy − sx·sy
    // decimal must keep its unscaled CENTS under 2^53 for the one
    // decimal→double cast to be cross-engine bit-identical. Recompute the
    // exact integer magnitude at this sf and assert it would STILL fit at
    // 1000× the data (revenue sums scale ~linearly with sf; t is
    // sf-independent) — the executable form of the documented sf ≤ ~10
    // bound, with margin.
    byMon.takeRight(3).foreach { case (_, ot, _) =>
      val train = byMon.filter(_._2 < ot)
      val n = BigInt(train.size)
      val sx = BigInt(train.map(_._2).sum)
      val syC = train.map(x => BigInt(x._3)).sum
      val sxyC = train.map(x => BigInt(x._2) * BigInt(x._3)).sum
      val numCents = (n * sxyC - sx * syC).abs
      assert(numCents * 1000 < (BigInt(1) << 53),
        s"num unscaled cents $numCents too close to 2^53 at 1000x scale")
    }
  }

  test("q_heavy_hitters: every top key inside the one-sided CMS bound, exact counts exact") {
    import org.apache.spark.sql.functions._
    val rows = run("q_heavy_hitters").collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getBoolean(2)), "CMS estimate escaped the eps bound")
    // the exact column really is exact: recompute independently
    val counts = graft.Tables.load(spark, sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === counts(r.getLong(0))))
    // descending with a deterministic tiebreak
    val pairs = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy { case (c, u) => (-c, u) }))
  }

  test("q_bloom_prune returns exactly the plain join's answer") {
    import org.apache.spark.sql.functions._
    val pruned = run("q_bloom_prune").collect().map(_.toString).toSeq
    val dim = graft.Tables.load(spark, sf, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = graft.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.Num.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment")).collect().map(_.toString).toSeq
    assert(pruned === plain, "Bloom pre-filter must be semantically invisible")
  }

  test("q_sliding_distinct: equi-joins only, first window equals day-1 distinct") {
    val p = plan("q_sliding_distinct")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "window fan-out must be explode + equi-join, not a range join:\n" + p)
    import org.apache.spark.sql.functions._
    val rows = run("q_sliding_distinct").collect()
    assert(rows.forall(_.getBoolean(2)), "sketch estimate escaped the bound")
    // the earliest window has no history: it must equal that day's distinct
    val first = rows.minBy(_.getTimestamp(0).getTime)
    val day1 = graft.Tables.load(spark, sf, "events")
      .filter(date_trunc("day", col("ts")) === first.getTimestamp(0))
      .select(col("user_id")).distinct().count()
    assert(first.getLong(1) === day1)
    // trailing windows are supersets of their newest day
    assert(rows.map(_.getLong(1)).max >= day1)
  }

  test("q_partition_diff computes both snapshots' checksums from ONE scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = run("q_partition_diff").queryExecution
    val scans = qe.sparkPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.length === 1, "snapshot diff must not scan the table twice")
    // every month with deleted rows is flagged; months without, not
    import org.apache.spark.sql.functions._
    val rows = run("q_partition_diff").collect()
    val deletedMonths = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 97 === 0)
      .select(date_trunc("month", col("l_shipdate"))).distinct()
      .collect().map(_.getTimestamp(0)).toSet
    rows.foreach { r =>
      assert(r.getBoolean(5) === deletedMonths.contains(r.getTimestamp(0)),
        s"changed flag wrong for ${r.getTimestamp(0)}")
    }
  }

  test("q_histogram_eqdepth: every band holds ~20% of rows (height-balanced)") {
    val rows = run("q_histogram_eqdepth").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3, 4))
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - total / 5.0) <= math.max(2.0, total * 0.01),
        s"band ${r.getInt(0)} holds ${r.getLong(1)} of $total — not height-balanced")
    }
  }

  test("q_reorder_cadence: every non-first order is one gap; percentiles ordered") {
    import org.apache.spark.sql.functions._
    val Array(r) = run("q_reorder_cadence").collect()
    val o = graft.Tables.load(spark, sf, "orders")
    val customers = o.select(col("o_custkey")).distinct().count()
    assert(r.getLong(0) === customers)
    assert(r.getLong(1) === o.count() - customers,
      "each customer's order count minus one gap apiece")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= r.getDouble(3))
  }

  test("q_latency_slo: percentile ladder ordered per type") {
    val rows = run("q_latency_slo").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4),
        s"${r.getString(0)}: p50 ≤ p95 ≤ p99 must hold")
      assert(r.getBoolean(5) === (r.getDouble(4) <= 150.0))
    }
  }

  test("q_order_width: widths conserve rows and stay bounded (the fanout evidence)") {
    val rows = run("q_order_width").collect()
    val lineitems = graft.Tables.load(spark, sf, "lineitem").count()
    val orders = rows.map(_.getLong(1)).sum
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === lineitems,
      "Σ width·n_orders must reconstruct the fact row count")
    val maxWidth = rows.map(_.getLong(0)).max
    assert(maxWidth <= 64,
      s"order width $maxWidth would break the per-order quadratic bound story")
    assert(orders === graft.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").distinct().count())
  }

  test("q_user_entropy: bounded by ln(#types); single-type users at exactly 0") {
    import org.apache.spark.sql.functions._
    val rows = run("q_user_entropy").collect()
    val nTypes = graft.Tables.load(spark, sf, "events")
      .select("event_type").distinct().count()
    val cap = math.log(nTypes.toDouble) + 1e-9
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1e-12 && r.getDouble(2) <= cap,
        s"user ${r.getLong(0)}: entropy ${r.getDouble(2)} outside [0, ln($nTypes)]")
    }
    // spot-check: a user seen with only one type must score exactly 0
    val single = graft.Tables.load(spark, sf, "events")
      .groupBy(col("user_id")).agg(countDistinct(col("event_type")).as("k"))
      .filter(col("k") === 1).select("user_id").collect()
      .map(_.getLong(0)).toSet
    rows.filter(r => single(r.getLong(0)))
      .foreach(r => assert(r.getDouble(2) === 0.0))
  }

  test("q_sql_passthrough: Spark executes the ORACLE's own text, ranks consistent") {
    // the parity claim is literal: every gateway queries() entry and its
    // oracle are the same string, for all four texts
    Shapes.PassthroughTexts.foreach { case (name, (_, sqlText)) =>
      assert(SparkEntry.oracleSql(name) eq sqlText, name)
    }
    val rows = run("q_sql_passthrough").collect()
    assert(rows.nonEmpty)
    // rank column is a real dense ranking of the revenue order
    val byRank = rows.sortBy(_.getLong(3))
    assert(byRank.map(_.getLong(3)).toSeq === (1L to rows.length))
    assert(byRank.map(_.getDouble(2)).toSeq.reverse.sorted.reverse ===
      byRank.map(_.getDouble(2)).toSeq, "rank must follow revenue descending")
  }

  test("passthrough set-ops / window / semijoin texts execute on Spark with consistent shapes") {
    val so = run("q_sql_passthrough_setops").collect()
    assert(so.map(_.getString(0)).toSeq === Seq("asia_cust", "cust_only", "either"))
    val bySide = so.map(r => r.getString(0) -> r.getLong(1)).toMap
    // |cust ∪ supp| >= |cust \ supp|; every count non-negative
    assert(bySide("either") >= bySide("cust_only"))
    assert(bySide.values.forall(_ >= 0L))

    val wi = run("q_sql_passthrough_window").collect()
    assert(wi.nonEmpty)
    // first row has no predecessor; 7-row sum always >= the day's own count
    assert(wi.head.isNullAt(4))
    wi.foreach(r => assert(r.getLong(3) >= r.getLong(1)))

    val sj = run("q_sql_passthrough_semijoin").collect()
    assert(sj.nonEmpty)
    // big spenders are a subset of active customers, per segment
    sj.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("q_histogram_eqdepth_approx: all five bands within the ±5% depth contract") {
    val rows = run("q_histogram_eqdepth_approx").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3, 4))
    assert(rows.forall(_.getBoolean(1)),
      "approx quintile band depth drifted beyond ±5% of 20%")
    // plan-shape identity with the exact twin: one boundary broadcast,
    // no sort/window anywhere — the claimed 100 TB swap is structural
    Seq("q_histogram_eqdepth", "q_histogram_eqdepth_approx").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q: boundaries must broadcast\n$p")
      assert(!p.contains("Window"), s"$q must not window\n$p")
    }
  }

  test("q_catalog_coverage: anti join against the distinct sold keys; ratios consistent") {
    val p = plan("q_catalog_coverage")
    assert(p.contains("LeftAnti"), p)
    val rows = run("q_catalog_coverage").collect()
    val parts = graft.Tables.load(spark, sf, "part").count()
    assert(rows.map(_.getLong(1)).sum === parts)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-12)
    }
  }

  test("q_lifespan: percentiles ordered inside the observable month") {
    val Array(r) = run("q_lifespan").collect()
    import org.apache.spark.sql.functions._
    val users = graft.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) === users)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= r.getDouble(2))
    assert(r.getDouble(2) <= 29.0, "events span a single month")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("q_pareto_8020: the heavy set is the minimal prefix crossing 80%") {
    import org.apache.spark.sql.functions._
    val Array(r) = run("q_pareto_8020").collect()
    val xs = graft.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey")).agg(graft.Num.dsum(col("o_totalprice")).as("x"))
      .collect().map(row => (row.getLong(0), row.getDouble(1)))
      .sortBy(e => (-e._2, e._1)).map(_._2)
    val total = xs.map(BigDecimal(_)).sum
    val cum = xs.map(BigDecimal(_)).scanLeft(BigDecimal(0))(_ + _).tail
    val k = cum.indexWhere(_ / total >= BigDecimal("0.8")) + 1
    assert(r.getLong(0) === xs.length.toLong)
    assert(r.getLong(1) === k.toLong, "minimal 80% prefix size")
    assert(r.getDouble(2) < 1.0 && r.getDouble(2) > 0.0)
  }

  test("q_growth_accounting: new + returning = daily actives; first day all new") {
    import org.apache.spark.sql.functions._
    val rows = run("q_growth_accounting").collect()
    val dau = graft.Tables.load(spark, sf, "events")
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()
      .groupBy(col("day")).count()
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === dau(r.getTimestamp(0)))
    }
    val first = rows.minBy(_.getTimestamp(0).getTime)
    assert(first.getLong(2) === 0L, "nobody can return on day one")
    // total new users across all days = the user population
    val users = graft.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === users)
  }

  test("q_price_elasticity: correlations bounded in [-1, 1], all brands covered") {
    val rows = run("q_price_elasticity").collect()
    val brands = graft.Tables.load(spark, sf, "part")
      .select("p_brand").distinct().count()
    assert(rows.length.toLong === brands,
      "every brand has discount and quantity variance in this data")
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"${r.getString(0)}: $c")
      assert(!c.isNaN)
    }
  }

  test("q_supplier_hhi: every index inside [1/n, 1]") {
    val rows = run("q_supplier_hhi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi) = (r.getLong(1), r.getDouble(2))
      assert(hhi >= 1.0 / n - 1e-9, s"${r.getString(0)}: HHI below the even floor")
      assert(hhi <= 1.0 + 1e-9)
    }
  }

  test("q_rfm: segments partition all customers; scores stay in the 1..5 cube") {
    val rows = run("q_rfm").collect()
    val total = rows.map(_.getLong(1)).sum
    val customers = graft.Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(total === customers, "every ordering customer lands in one segment")
    rows.foreach { r =>
      val seg = r.getInt(0)
      val (rb, fb, mb) = (seg / 100, seg / 10 % 10, seg % 10)
      assert(rb >= 1 && rb <= 5 && fb >= 1 && fb <= 5 && mb >= 1 && mb <= 5, seg)
      assert(r.getLong(1) > 0)
    }
    // binning is a real quintile cut: no single band of any metric holds
    // everything (the distributions here are non-degenerate)
    assert(rows.map(_.getInt(0) / 100).distinct.length > 1)
  }

  test("q_ab_test: arms partition each type; t statistic is finite") {
    import org.apache.spark.sql.functions._
    val rows = run("q_ab_test").collect()
    assert(rows.nonEmpty)
    val perType = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === perType(r.getString(0)),
        "arms must partition the type's rows")
      assert(r.getLong(1) >= 2 && r.getLong(2) >= 2)
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite)
      // a hash split of a homogeneous population should not be wildly
      // significant: |t| under 5 on this synthetic data
      assert(math.abs(r.getDouble(4)) < 5.0, s"suspicious t=${r.getDouble(4)}")
    }
  }

  test("q_skyline: sort-algebra frontier equals brute-force strict dominance; no quadratic join") {
    import org.apache.spark.sql.functions._
    val p = plan("q_skyline")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "skyline must not run the O(N²) join:\n" + p)
    val got = run("q_skyline").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val all = graft.Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expect = all.filter { case (_, pr, sz) =>
      !all.exists { case (_, pr2, sz2) =>
        pr2 <= pr && sz2 <= sz && (pr2 < pr || sz2 < sz)
      }
    }.toSet
    assert(got === expect)
  }

  test("q_constraint_check: clean data passes all six; seeded violations flip exactly their rows") {
    import org.apache.spark.sql.functions._
    val clean = run("q_constraint_check").collect()
    assert(clean.length === 6)
    assert(clean.forall(_.getBoolean(2)), "driver testdata must satisfy the gate")
    // stage a corrupted snapshot: a null key, a bad enum, an out-of-range
    // quantity, an orphaned FK row, and a duplicated orders key
    val dir = tmpDir("constraints")
    val li = graft.Tables.load(spark, sf, "lineitem")
    val corrupt = li.limit(1)
      .withColumn("l_orderkey", lit(null).cast("long"))
      .unionByName(li.limit(1).withColumn("l_returnflag", lit("X")))
      .unionByName(li.limit(1).withColumn("l_quantity", lit(99.0)))
      .unionByName(li.limit(1).withColumn("l_orderkey", lit(999999999L)))
    li.unionByName(corrupt).write.parquet(s"$dir/lineitem.parquet")
    val ord = graft.Tables.load(spark, sf, "orders")
    ord.unionByName(ord.limit(1)).write.parquet(s"$dir/orders.parquet")
    val dirty = SparkEntry.queries("q_constraint_check")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(!dirty("completeness_l_orderkey")._2)
    assert(dirty("completeness_l_orderkey")._1 === 1.0)
    assert(!dirty("enum_l_returnflag")._2)
    assert(!dirty("range_l_quantity_max")._2)
    assert(dirty("range_l_quantity_max")._1 === 99.0)
    assert(!dirty("fk_lineitem_orders")._2)
    assert(!dirty("unique_o_orderkey")._2)
    assert(dirty("range_l_quantity_min")._2, "min bound must stay green")
  }

  test("q_cdc_rows: class totals partition the key universe correctly") {
    import org.apache.spark.sql.functions._
    val byClass = run("q_cdc_rows").collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    // the classifier works at KEY grain: snapshot filters are
    // orderkey-level and the drift is partkey-level, so expected class
    // sizes are distinct-key counts under those predicates
    val keys = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")).distinct()
    def cnt(c: org.apache.spark.sql.Column) = keys.filter(c).count()
    val added = cnt(col("l_orderkey") % 97 === 0 && col("l_orderkey") % 89 =!= 0)
    val removed = cnt(col("l_orderkey") % 89 === 0 && col("l_orderkey") % 97 =!= 0)
    val changed = cnt(col("l_orderkey") % 97 =!= 0 && col("l_orderkey") % 89 =!= 0 &&
      col("l_partkey") % 101 === 0)
    assert(byClass("added") === added)
    assert(byClass("removed") === removed)
    assert(byClass("changed") === changed)
    // every key in at least one snapshot is classified exactly once
    val inEither = cnt(col("l_orderkey") % 97 =!= 0 || col("l_orderkey") % 89 =!= 0)
    assert(byClass.values.sum === inEither)
  }

  test("q_incremental_agg: detect and apply halves agree; unchanged months carried verbatim") {
    import org.apache.spark.sql.functions._
    val diff = run("q_partition_diff").collect()
      .map(r => r.getTimestamp(0) -> r.getBoolean(5)).toMap
    val inc = run("q_incremental_agg").collect()
      .map(r => r.getTimestamp(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(inc.keySet === diff.keySet, "both halves must cover the same months")
    // the old stored rollup, recomputed independently
    val old = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 97 =!= 0)
      .groupBy(date_trunc("month", col("l_shipdate")).as("m"))
      .agg(graft.Num.dsum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> (r.getDouble(1), r.getLong(2))).toMap
    diff.foreach { case (m, changed) =>
      if (changed) assert(inc(m) !== old(m), s"$m flagged changed but not rebuilt")
      else assert(inc(m) === old(m), s"$m not carried verbatim from the rollup")
    }
  }

  test("q_bloom_prune applies the membership filter below the join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val lp = run("q_bloom_prune").queryExecution.optimizedPlan
    val join = lp.collect { case j: Join => j }
    assert(join.nonEmpty)
    // the UDF filter must sit under the join, on the fact side
    val filtersBelow = join.head.left.collect { case f: Filter => f }
    assert(filtersBelow.exists(_.condition.toString.contains("UDF")),
      "bloom membership filter not pushed below the join:\n" + lp)
  }

  test("q_anova: hand-computed F on a planted two-group fixture") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // A = {1,2,3}, B = {4,5,6}: means 2 and 5, grand mean 3.5,
    // SSB = 3·1.5² + 3·1.5² = 13.5, SSW = 2 + 2 = 4,
    // F = (13.5/1)/(4/4) = 13.5
    val ev = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 4.0), ("B", 5.0), ("B", 6.0)).zipWithIndex
      .map { case ((ty, v), i) => (i.toLong, ty, v) }
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("user_id", col("event_id"))
      .withColumn("props", lit("{}"))
    val dir = tmpDir("anova-fix")
    ev.write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_anova")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_groups") == 2L && r(0).getAs[Long]("n") == 6L)
    assert(math.abs(r(0).getAs[Double]("ss_between") - 13.5) < 1e-9, r(0).toString)
    assert(math.abs(r(0).getAs[Double]("ss_within") - 4.0) < 1e-9, r(0).toString)
    assert(math.abs(r(0).getAs[Double]("f_stat") - 13.5) < 1e-9, r(0).toString)
  }

  test("q_did matches a brute-force replay of arms, midpoint split and cell means") {
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
    def arm(uid: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % 2).toInt
    }
    // Spark's Divide on longs is DOUBLE division — replay it exactly
    val mid = (rows.map(_.getLong(1)).min + rows.map(_.getLong(1)).max)
      .toDouble / 2.0
    val cells = rows.groupBy(r => (arm(r.getLong(0)), r.getLong(1).toDouble >= mid))
      .map { case (k, rs) =>
        k -> (rs.length.toLong,
          rs.map(r => BigDecimal(r.getDouble(2)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      }
    def m(a: Int, p: Boolean) = { val c = cells((a, p)); c._2 / c._1.toDouble }
    val expected = (m(1, true) - m(1, false)) - (m(0, true) - m(0, false))
    val r = SparkEntry.queries("q_did")(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_t_post") == cells((1, true))._1)
    assert(r(0).getAs[Long]("n_c_pre") == cells((0, false))._1)
    assert(math.abs(r(0).getAs[Double]("did") - expected) < 1e-9,
      s"did ${r(0).getAs[Double]("did")} vs replay $expected")
  }

  test("q_match_att: hand-computed 1-NN matches, tie-to-below, cross-bucket carry") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // controls (non-BUILDING) at balances 10/20/40 with outcomes
    // 100/200/400; a duplicate control at bal 10 (custkey 4, outcome 999)
    // must LOSE representation to custkey 1. Treated (BUILDING):
    //   bal 12 → 10 (|2|<|8|)          diff 120−100 = 20
    //   bal 15 → 10 (tie 5=5 → below)  diff 150−100 = 50
    //   bal 39 → 40 (|1|<|19|)         diff 390−400 = −10
    //   bal 100 → 40 (no control above; bal+1000=1100 lands in its own
    //               rangeBucket, so the match arrives via the carry)
    //                                  diff 1000−400 = 600
    //   bal 5 → 10 (no control below)  diff 50−100 = −50
    // ATT = 610/5 = 122, avg_treated = 342, avg_matched = 220
    val cust = Seq(
      (1L, "AUTOMOBILE", 10.0), (2L, "AUTOMOBILE", 20.0),
      (3L, "AUTOMOBILE", 40.0), (4L, "HOUSEHOLD", 10.0),
      (11L, "BUILDING", 12.0), (12L, "BUILDING", 15.0),
      (13L, "BUILDING", 39.0), (14L, "BUILDING", 100.0),
      (15L, "BUILDING", 5.0)
    ).toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val orders = Seq(
      (1L, 100.0), (2L, 200.0), (3L, 400.0), (4L, 999.0),
      (11L, 120.0), (12L, 150.0), (13L, 390.0), (14L, 1000.0), (15L, 50.0)
    ).zipWithIndex.map { case ((ck, v), i) => (i.toLong, ck, v) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val dir = tmpDir("match-att")
    cust.write.parquet(s"$dir/customer.parquet")
    orders.write.parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q_match_att")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_treated") == 5L && r(0).getAs[Long]("n_matched") == 5L)
    assert(r(0).getAs[Double]("avg_treated") == 342.0, r(0).toString)
    assert(r(0).getAs[Double]("avg_matched") == 220.0, r(0).toString)
    assert(r(0).getAs[Double]("att") == 122.0, r(0).toString)
  }

  test("q_trend_test: a linear monthly series gives S = n(n-1)/2 and the exact Sen slope") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 6 months, revenue 100·k: every pair ascends → S = 15; every pairwise
    // slope is exactly 100; z = 14/√(6·5·17/18) ≈ 2.63 > 1.96 → trending
    val orders = (1 to 6).map { k =>
      (k.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, k, 15)),
        100.0 * k)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_custkey", col("o_orderkey"))
    val dir = tmpDir("trend-fix")
    orders.write.parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q_trend_test")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_months") == 6L)
    assert(r(0).getAs[Long]("mk_s") == 15L)
    assert(r(0).getAs[Double]("sen_slope") == 100.0, r(0).toString)
    assert(r(0).getAs[Boolean]("trending"))
    assert(math.abs(r(0).getAs[Double]("mk_z") -
      14.0 / math.sqrt(6.0 * 5.0 * 17.0 / 18.0)) < 1e-12)
  }

  test("q_acf: an alternating daily series has ACF(1) = -1 and ACF(2) = +1") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one order per day, revenue alternating 100/200: shifting by one day
    // anti-aligns the series exactly (y = 300 − x), by two re-aligns it
    val orders = (0 until 12).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)),
        if (i % 2 == 0) 100.0 else 200.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_custkey", col("o_orderkey"))
    val dir = tmpDir("acf-fix")
    orders.write.parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q_acf")(spark, dir).collect()
      .map(row => row.getAs[Int]("lag") -> row.getAs[Double]("acf")).toMap
    assert(math.abs(r(1) - (-1.0)) < 1e-9, r.toString)
    assert(math.abs(r(2) - 1.0) < 1e-9, r.toString)
    assert(math.abs(r(3) - (-1.0)) < 1e-9)
    assert(math.abs(r(4) - 1.0) < 1e-9)
  }
}
