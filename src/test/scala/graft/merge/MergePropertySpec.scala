package graft.merge

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the upsert/dedup invariants (SURVEY.md §5).
  * ScalaCheck generators driven manually (the scalatest bridge artifact
  * isn't on the offline classpath), fixed seeds for reproducibility. */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0L, 9L), Gen.alphaStr.map(_.take(4))))

  private def cases(n: Int): Seq[(List[(Long, String)], List[(Long, String)])] =
    (0 until n).map { i =>
      (rowsGen.apply(Gen.Parameters.default, Seed(42L + i)).getOrElse(Nil),
        rowsGen.apply(Gen.Parameters.default, Seed(1042L + i)).getOrElse(Nil))
    }

  test("property: upsert result keys = target keys ∪ update keys; update keys hold update values") {
    cases(10).foreach { case (t0, u0) =>
      val target = t0.distinctBy(_._1)
      val updates = u0.distinctBy(_._1)
      val out = Merge.upsert(target.toDF("id", "v"), updates.toDF("id", "v"), Seq("id"))
        .as[(Long, String)].collect().toList
      val uMap = updates.toMap
      val expected = target.filterNot(r => uMap.contains(r._1)) ++ updates
      assert(out.sorted == expected.sorted, s"target=$target updates=$updates")
    }
  }

  test("property: upsert twice with the same updates equals upsert once") {
    cases(5).foreach { case (t0, u0) =>
      val target = t0.distinctBy(_._1).toDF("id", "v")
      val updates = u0.distinctBy(_._1).toDF("id", "v")
      val once = Merge.upsert(target, updates, Seq("id"))
      val twice = Merge.upsert(once, updates, Seq("id"))
      assert(once.as[(Long, String)].collect().sorted.toSeq ==
        twice.as[(Long, String)].collect().sorted.toSeq)
    }
  }

  test("property: dedupByKey output has unique keys and picks the min tie-break") {
    cases(5).map(_._1).filter(_.nonEmpty).foreach { rows =>
      val out = Merge.dedupByKey(rows.toDF("k", "v"), "k", "v")
        .as[(Long, String)].collect().toList
      assert(out.map(_._1).distinct.size == out.size)
      val expect = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      assert(out.toMap == expect, s"rows=$rows")
    }
  }
}
