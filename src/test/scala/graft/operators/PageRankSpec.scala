package graft.operators

import graft.SparkSpec

/** [[PageRank]] against a driver-side fixed-point-integer simulation and
  * closed-form graphs. The operator's mass is exact integer arithmetic
  * (1e6 start, 85/100 damping, truncating division), so every assertion
  * here is equality — no float tolerance anywhere.
  *
  * Closed forms used:
  *   - k-CYCLE: every node has in/out-degree 1, so the uniform start IS the
  *     fixed point (1000000 = 150000 + (85*1000000)//100) and trainConverged
  *     proves it in one round.
  *   - STAR-OUT (center → L leaves): the center gets no inflow and settles
  *     at the teleport mass 150000 in round 1; leaves then settle at
  *     150000 + (85*(150000//L))//100 in round 2 (proven in round 3).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the exact integer round, iterated. Parallel
    * edges act as weights, matching the operator's contract. */
  private def simulate(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      edges.foreach { case (s, t) => inflow(t) += rank(s) / deg(s) }
      rank = nodes.map(n => n -> (150000L + 85L * inflow(n) / 100L)).toMap
    }
    rank
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.as[(String, Long)].collect().toMap

  test("ranks(k) matches the integer simulation on a seeded random multigraph, k=1..3") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}"))
      .filter { case (a, b) => a != b } // self-loops out, parallel edges kept
    for (k <- 1 to 3)
      assert(collect(PageRank.ranks(edges.toDF("src", "dst"), k)) ==
        simulate(edges, k), s"k=$k")
  }

  test("ranks requires at least one round") {
    intercept[IllegalArgumentException] {
      PageRank.ranks(Seq(("a", "b")).toDF("src", "dst"), 0)
    }
  }

  test("cycle: uniform start is the exact fixed point, proven in one round") {
    val cycle = (0 until 6).map(i => (s"n$i", s"n${(i + 1) % 6}"))
    val (ranks, rounds) = PageRank.trainConverged(cycle.toDF("src", "dst"))
    assert(rounds == 1)
    assert(collect(ranks) == (0 until 6).map(i => s"n$i" -> 1000000L).toMap)
  }

  test("star-out: center at teleport mass, leaves at the closed-form fixed point") {
    val star = (1 to 5).map(i => ("hub", s"leaf$i"))
    val (ranks, rounds) = PageRank.trainConverged(star.toDF("src", "dst"))
    // round 1 moves the center to 150000, round 2 settles the leaves,
    // round 3 proves no change.
    assert(rounds == 3)
    val leafRank = 150000L + 85L * (150000L / 5L) / 100L // = 175500
    val expected = Map("hub" -> 150000L) ++
      (1 to 5).map(i => s"leaf$i" -> leafRank)
    assert(collect(ranks) == expected)
    // sanity: the fixed point agrees with the simulation run past convergence
    assert(expected == simulate(star, 10))
  }

  test("2-node source→sink settles in two rounds (proven in three)") {
    val (ranks, rounds) = PageRank.trainConverged(Seq(("a", "b")).toDF("src", "dst"))
    assert(rounds == 3)
    assert(collect(ranks) ==
      Map("a" -> 150000L, "b" -> (150000L + 85L * 150000L / 100L)))
  }

  test("maxIters exhaustion throws instead of returning a truncated signal") {
    val star = (1 to 5).map(i => ("hub", s"leaf$i")) // needs 3 rounds
    val e = intercept[IllegalStateException] {
      PageRank.trainConverged(star.toDF("src", "dst"), maxIters = 2)
    }
    assert(e.getMessage.contains("fixed point"))
  }

  test("personalized: all-seeds equals standard; seed-restricted matches the simulation") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}"))
      .filter { case (a, b) => a != b }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    // all nodes as seeds reduces exactly to the standard variant
    val allSeeds = nodes.toDF("node")
    assert(collect(PageRank.ranksPersonalized(edges.toDF("src", "dst"), allSeeds, 2))
      == collect(PageRank.ranks(edges.toDF("src", "dst"), 2)))
    // a seed subset matches the seeded driver-side simulation
    val seedSet = nodes.filter(_.stripPrefix("n").toInt % 3 == 0).toSet
    def simSeeded(iters: Int): Map[String, Long] = {
      val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      var rank = nodes.map(n => n -> (if (seedSet(n)) 1000000L else 0L)).toMap
      for (_ <- 1 to iters) {
        val inflow = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        edges.foreach { case (s, t) => inflow(t) += rank(s) / deg(s) }
        rank = nodes.map(n =>
          n -> ((if (seedSet(n)) 150000L else 0L) + 85L * inflow(n) / 100L)).toMap
      }
      rank
    }
    for (k <- 1 to 3)
      assert(collect(PageRank.ranksPersonalized(
        edges.toDF("src", "dst"), seedSet.toSeq.toDF("node"), k)) == simSeeded(k),
        s"k=$k")
  }

  test("checkpointDir mode reaches the same fixed point (reliable-checkpoint path)") {
    val star = (1 to 5).map(i => ("hub", s"leaf$i"))
    val dir = tmpDir("graft-pr-ckpt")
    val (ranks, rounds) =
      PageRank.trainConverged(star.toDF("src", "dst"), checkpointDir = Some(dir))
    assert(rounds == 3)
    val (plain, _) = PageRank.trainConverged(star.toDF("src", "dst"))
    assert(collect(ranks) == collect(plain))
  }
}
