package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantics checks for the event-sourced queries (Sources.scala) at
  * sf0.001. Value-level correctness is the DuckDB oracle's job; these
  * verify invariants against independent in-memory recomputations. */
class SourcesSpec extends SparkSpec {

  test("q_mad_outlier flags exactly the >3·MAD deviations per type") {
    import org.apache.spark.sql.functions._
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      // linear-interpolated median, the percentile/quantile_cont rule
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = ev.toSeq.groupBy(_._2).values.flatMap { rows =>
      val med = medianOf(rows.map(_._3))
      val mad = medianOf(rows.map(r => math.abs(r._3 - med)))
      rows.filter(r => math.abs(r._3 - med) > 3.0 * mad).map(_._1)
    }.toSet
    val got = SparkEntry.queries("q_mad_outlier")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("q_ingest_completeness: full calendar on driver data; a staged gap is flagged") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_ingest_completeness")(spark, sf).collect()
    assert(rows.length === 30, "the driver month must yield a 30-day calendar")
    assert(rows.forall(!_.getBoolean(2)), "driver data has no missing days")
    // stage the same events with one interior day removed: the calendar
    // must still span the full range and flag the hole
    val dir = tmpDir("ingest-gap")
    val ev = graft.Tables.load(spark, sf, "events")
    val hole = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    ev.filter(date_trunc("day", col("ts")) =!= lit(hole))
      .write.parquet(s"$dir/events.parquet")
    val gapped = SparkEntry.queries("q_ingest_completeness")(spark, dir).collect()
    assert(gapped.length === 30, "a gap must not shrink the calendar")
    val flagged = gapped.filter(_.getBoolean(2)).map(_.getTimestamp(0))
    assert(flagged.toSeq === Seq(hole), "exactly the staged hole is missing")
    val holeRow = gapped.find(_.getTimestamp(0) == hole).get
    assert(holeRow.getLong(1) === 0L && holeRow.getBoolean(3),
      "a missing day is also a low day")
  }

  test("q_stickiness: DAU never exceeds WAU; the first day's ratio is exactly 1") {
    val rows = SparkEntry.queries("q_stickiness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "DAU must be ≤ trailing WAU")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    val first = rows.minBy(_.getTimestamp(0).getTime)
    assert(first.getDouble(3) === 1.0,
      "day one has no history: its week IS the day")
  }

  test("q_benford: digit counts cover all orders; chi-square terms finite") {
    val rows = SparkEntry.queries("q_benford")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 9))
    val orders = graft.Tables.load(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum === orders)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0)
      assert(r.getDouble(3) >= 0.0 && !r.getDouble(3).isInfinite)
    }
  }

  test("q_seasonal_profile: cell counts conserve mass; factors average to 1") {
    val rows = SparkEntry.queries("q_seasonal_profile")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getLong(2)).sum === total)
    // the unweighted mean of n·ncells/tn over cells is exactly 1
    val meanFactor = rows.map(_.getDouble(3)).sum / rows.length
    assert(math.abs(meanFactor - 1.0) < 1e-9)
  }

  test("q_audience_overlap matches brute-force set overlap per type pair") {
    import org.apache.spark.sql.functions._
    val tu = graft.Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val sets = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = SparkEntry.queries("q_audience_overlap")(spark, sf).collect()
    assert(rows.length === sets.size * (sets.size - 1) / 2,
      "every type pair with a shared user must appear (dense data)")
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val inter = (sets(a) & sets(b)).size.toLong
      val union = (sets(a) | sets(b)).size.toDouble
      assert(r.getLong(2) === inter, s"($a,$b) intersection")
      assert(math.abs(r.getDouble(3) - inter / union) < 1e-12, s"($a,$b) jaccard")
    }
  }

  test("q_conversion_lag: converted + censored = signup users; lags ordered") {
    import org.apache.spark.sql.functions._
    val Array(r) = SparkEntry.queries("q_conversion_lag")(spark, sf).collect()
    val signups = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) === signups)
    assert(r.getLong(1) + r.getLong(2) === r.getLong(0))
    assert(r.getLong(1) > 0, "some users must convert in this data")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= r.getDouble(4),
      "median lag must be within [0, p90]")
  }

  test("q_cohort_ltv: curves are cumulative (non-decreasing per cohort)") {
    val rows = SparkEntry.queries("q_cohort_ltv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (cohort, rs) =>
      assert(cohort >= 1995 * 12 + 1 && cohort <= 1995 * 12 + 12)
      val curve = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        s"cohort $cohort LTV curve must be non-decreasing")
      rs.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) <= 24))
    }
  }

  test("q_psi_drift: reference deciles are height-balanced; stationary data stays calm") {
    val rows = SparkEntry.queries("q_psi_drift")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 to 9))
    val refTotal = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - refTotal / 10.0) <= math.max(2.0, refTotal * 0.02),
        s"bin ${r.getInt(0)}: reference deciles must be height-balanced")
    }
    // synthetic events are stationary across the month: PSI far below the
    // 0.2 alarm and every term finite
    val psi = rows.map(_.getDouble(3)).sum
    assert(rows.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    assert(psi >= 0.0 && psi < 0.1, s"PSI $psi on stationary data")
  }

  test("q_zorder_scan: lossless re-layout, both predicate dims pushed to the scan") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_zorder_scan")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_partkey") <= 200 && col("l_suppkey") <= 40)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), graft.Num.dsum(col("l_extendedprice")).as("rev"))
      .orderBy(col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got === want, "Z-order re-layout changed the answer")
    // both filter dimensions reach the parquet scan of the laid-out files
    // (file skipping then rides the per-file min/max ZOrderSpec proves tight)
    val p = SparkEntry.queries("q_zorder_scan")(spark, sf)
      .queryExecution.executedPlan.toString
    // (the PushedFilters list is elided in toString past a width cap —
    // the partkey literal proves pushdown, the Filter node the suppkey cut)
    assert(p.contains("LessThanOrEqual(l_partkey,200)"), p)
    assert(p.contains("<= 40"), p)
  }

  test("q_bucketed_join: lossless layout, zero-exchange fact-fact join") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_bucketed_join")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), graft.Num.dsum(col("l_extendedprice")).as("rev"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got === want, "bucketed layout changed the answer")
    // the scale claim: with broadcast off (neither fact side fits in an
    // executor at 100 TB), the join is SortMergeJoin straight over the
    // bucket files — no "Exchange hashpartitioning" under either side, the
    // per-file sortBy satisfying the merge-sort requirement
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SparkEntry.queries("q_bucketed_join")(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val joinRegion = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinRegion.contains("Exchange hashpartitioning"),
        s"bucketed fact-fact join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_pit_join: exactly one row per click, feature never leaks the future") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_pit_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3), r.getDouble(4)))
    val clicks = ev.filter(_._4 == "click")
    assert(got.length == clicks.length,
      "PIT join must emit exactly one row per click")
    val purchasesByUser = ev.filter(_._4 == "purchase").groupBy(_._2)
    got.foreach { case (cid, uid, cts, feat) =>
      // expected: value of the latest purchase at or before the click,
      // ties broken by event_id (the SCD2 interval construction)
      val prior = purchasesByUser.getOrElse(uid, Array.empty)
        .filter(p => !p._3.after(cts))
      val expect = if (prior.isEmpty) None
        else Some(prior.maxBy(p => (p._3.getTime, p._1))._5)
      assert(feat == expect, s"click $cid: got $feat want $expect")
    }
  }

  test("q_orc_roundtrip: lossless format hop, partition pruned, predicate pushed") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_orc_roundtrip")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), graft.Num.dsum(col("l_extendedprice")).as("rev"))
      .orderBy(col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got === want, "ORC round-trip changed the answer")
    val p = SparkEntry.queries("q_orc_roundtrip")(spark, sf)
      .queryExecution.executedPlan.toString
    // the scan is ORC, the partition dimension prunes directories, and
    // the quantity predicate reaches the ORC reader's row-group stats
    assert(p.toLowerCase.contains("orc"), p)
    assert(p.contains("PartitionFilters") && p.contains("l_returnflag"), p)
    assert(p.contains("PushedFilters") && p.contains("l_quantity"), p)
  }

  test("q_csv_roundtrip: lossless text hop, partition pruned, schema re-imposed") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_csv_roundtrip")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getAs[java.time.LocalDateTime](3))).toSeq
    val want = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") >= 100000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), graft.Num.dsum(col("o_totalprice")).as("rev"),
        max(col("o_orderdate")).as("last_order"))
      .orderBy(col("o_orderstatus")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getAs[java.time.LocalDateTime](3))).toSeq
    assert(got.nonEmpty && got === want,
      "CSV round-trip changed the answer (doubles or timestamps drifted)")
    val p = SparkEntry.queries("q_csv_roundtrip")(spark, sf)
      .queryExecution.executedPlan.toString
    // the scan is CSV and the partition dimension prunes directories —
    // the only scan reduction a text format offers
    assert(p.toLowerCase.contains("csv"), p)
    assert(p.contains("PartitionFilters") && p.contains("o_orderstatus"), p)
  }

  test("q_gini matches the brute-force Lorenz computation, inside [0, 1)") {
    import org.apache.spark.sql.functions._
    val Array(row) = SparkEntry.queries("q_gini")(spark, sf).collect()
    val xs = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_suppkey")).agg(graft.Num.dsum(col("l_extendedprice")).as("x"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(e => (e._2, e._1)).map(_._2)
    val n = xs.length
    val sx = xs.map(BigDecimal(_)).sum
    val s2ix = xs.zipWithIndex.map { case (x, i0) =>
      BigDecimal(x) * (2 * (i0 + 1)) }.sum
    val gini = ((s2ix - (n + 1) * sx) / (n * sx)).toDouble
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - gini) < 1e-9)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) < 1.0)
  }

  test("q_decay_score: every user scored once, strictly below the undecayed sum") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_decay_score")(spark, sf).collect()
    val ev = graft.Tables.load(spark, sf, "events")
    assert(rows.length.toLong ===
      ev.select(col("user_id")).distinct().count())
    // every score is positive and strictly below the undecayed sum
    val raw = ev.groupBy(col("user_id"))
      .agg(graft.Num.dsum(col("value")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val score = r.getDouble(2)
      assert(score > 0.0)
      assert(score < raw(r.getLong(0)),
        "decay must strictly discount a month-long history")
    }
  }

  test("q_lag_features: lags and rolling mean match the per-user sequence") {
    import org.apache.spark.sql.functions._
    val seq = graft.Tables.load(spark, sf, "events")
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).map(e => e._2 -> e._3).toIndexedSeq)
      .toMap
    val rows = SparkEntry.queries("q_lag_features")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ordered = seq(r.getLong(0))
      val i = ordered.indexWhere(_._1 == r.getLong(1))
      if (i >= 1) assert(r.getDouble(3) === ordered(i - 1)._2, "lag1")
      else assert(r.isNullAt(3))
      if (i >= 2) assert(r.getDouble(4) === ordered(i - 2)._2, "lag2")
      else assert(r.isNullAt(4))
      val wnd = ordered.slice(math.max(0, i - 2), i + 1).map(_._2)
      assert(math.abs(r.getDouble(5) - wnd.sum / wnd.length) < 1e-9, "roll3")
    }
  }

  test("q_target_encode: each row's encoding excludes its own value") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2).view
      .mapValues(rs => (rs.length, rs.map(_._3).map(BigDecimal(_)).sum)).toMap
    val vals = ev.map(e => e._1 -> e).toMap
    val rows = SparkEntry.queries("q_target_encode")(spark, sf).collect()
    assert(rows.length === ev.count(e => byType(e._2)._1 >= 2))
    rows.foreach { r =>
      val (_, tpe, v) = vals(r.getLong(0))
      val (n, s) = byType(tpe)
      val loo = ((s - BigDecimal(v)) / (n - 1)).toDouble
      assert(math.abs(r.getDouble(2) - loo) < 1e-6,
        s"event ${r.getLong(0)}: ${r.getDouble(2)} vs $loo")
    }
  }

  test("q_markov_transitions: rows are probabilities that sum to 1 per current state") {
    val rows = SparkEntry.queries("q_markov_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    // conditional probabilities per current state must sum to 1
    rows.groupBy(_.getString(0)).foreach { case (cur, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"P(·|$cur) sums to $total")
    }
    // every non-last event of each user is one transition
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sf, "events")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
  }

  test("q_winsorize: clipped sums stay inside the per-type [n·lo, n·hi] band") {
    val rows = SparkEntry.queries("q_winsorize")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (n, wins, lo, hi) =
        (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= hi)
      assert(wins >= n * lo - 1e-6 && wins <= n * hi + 1e-6,
        s"${r.getString(0)}: winsorized sum escaped the clip band")
    }
  }

  test("q_interarrival: every non-first event contributes exactly one gap") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_interarrival")(spark, sf).collect()
    val gapTotal = rows.map(_.getLong(1)).sum
    val ev = graft.Tables.load(spark, sf, "events")
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(gapTotal === expected)
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), "median must not exceed p95")
      assert(r.getDouble(3) <= r.getLong(4).toDouble, "p95 must not exceed max")
      assert(r.getDouble(2) > 0.0, "timestamps are distinct ⇒ positive gaps")
    }
  }

  test("q_asof_nearest picks the true minimum |Δt| click, ties backward") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val rows = SparkEntry.queries("q_asof_nearest")(spark, sf).collect()
    val purchases = ev.filter(_._4 == "purchase")
      .map(e => e._1 -> e).toMap
    assert(rows.length === purchases.size)
    rows.foreach { r =>
      val (_, user, pUs, _) = purchases(r.getLong(0))
      clicksByUser.get(user) match {
        case None =>
          assert(r.isNullAt(2), "no clicks for user ⇒ null nearest")
        case Some(clicks) =>
          val best = clicks.map(c => math.abs(pUs - c._3)).min
          assert(r.getLong(3) === best,
            s"purchase ${r.getLong(0)}: diff ${r.getLong(3)} != min $best")
          // tie rule: if a backward click achieves the min, the chosen id
          // must be a backward one
          val backAtMin = clicks.exists(c => c._3 <= pUs && pUs - c._3 == best)
          if (backAtMin) {
            val chosenUs = clicks.find(_._1 == r.getLong(2)).map(_._3)
            assert(chosenUs.exists(_ <= pUs), "tie must resolve backward")
          }
      }
    }
  }

  test("q_changepoint locates a planted step shift at the exact day") {
    import spark.implicits._
    // 10 days at 100 events/day, then 10 days at 200: |S_t| peaks at the
    // last day of the low segment (t=10), means are exactly 100 and 200
    val rows = (0 until 20).flatMap { day =>
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 3, 1).plusDays(day.toLong).atTime(12, 0))
      val k = if (day < 10) 100 else 200
      (0 until k).map(i => (day.toLong * 1000 + i, ts, i.toLong, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("cusum-fix")
    rows.write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_changepoint")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[java.sql.Timestamp]("cp_day").toString.startsWith("2024-03-10"),
      r(0).toString)
    assert(r(0).getAs[Long]("n_days") == 20L)
    assert(r(0).getAs[Double]("mean_before") == 100.0, r(0).toString)
    assert(r(0).getAs[Double]("mean_after") == 200.0, r(0).toString)
    assert(r(0).getAs[Double]("shift") == 100.0)
  }

  test("q_ks_test: hand-computed D on a planted fixture; identical samples give D = 0") {
    import spark.implicits._
    // A = {1,2,3,4}, R = {3,4,5,6}: the ECDFs diverge most on [2,4] where
    // F_A − F_R = 0.5 (e.g. at x=2: 2/4 vs 0/4), so D = 0.5 exactly.
    val d1 = tmpDir("ks-fix")
    (Seq(1.0, 2.0, 3.0, 4.0).map(("A", _)) ++ Seq(3.0, 4.0, 5.0, 6.0).map(("R", _)))
      .toDF("l_returnflag", "l_extendedprice")
      .write.parquet(s"$d1/lineitem.parquet")
    val r1 = SparkEntry.queries("q_ks_test")(spark, d1).collect()
    assert(r1.length == 1)
    assert(r1(0).getAs[Long]("n_a") == 4L && r1(0).getAs[Long]("n_r") == 4L)
    assert(r1(0).getAs[Double]("d_stat") == 0.5, r1(0).toString)
    // the asymptotic 95% bar at n=4+4 is 1.358·sqrt(8/16) ≈ 0.96 > 0.5
    assert(!r1(0).getAs[Boolean]("reject_95"))
    // same values in both classes -> the ECDFs coincide everywhere
    val d2 = tmpDir("ks-same")
    Seq(1.0, 2.0, 3.0).flatMap(v => Seq(("A", v), ("R", v)))
      .toDF("l_returnflag", "l_extendedprice")
      .write.parquet(s"$d2/lineitem.parquet")
    val r2 = SparkEntry.queries("q_ks_test")(spark, d2).collect()(0)
    assert(r2.getAs[Double]("d_stat") == 0.0, r2.toString)
    // disjoint supports -> total separation, D = 1, decisively rejected
    val d3 = tmpDir("ks-disjoint")
    (Seq.tabulate(40)(i => ("A", i.toDouble)) ++
      Seq.tabulate(40)(i => ("R", 1000.0 + i)))
      .toDF("l_returnflag", "l_extendedprice")
      .write.parquet(s"$d3/lineitem.parquet")
    val r3 = SparkEntry.queries("q_ks_test")(spark, d3).collect()(0)
    assert(r3.getAs[Double]("d_stat") == 1.0, r3.toString)
    assert(r3.getAs[Boolean]("reject_95"))
  }
}
