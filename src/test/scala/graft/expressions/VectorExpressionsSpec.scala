package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_long_dot matches the interpreted aggregate/zip_with result") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 2L), Seq(3L, 9L, -1L)),
      (Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    val out = df.select(
      expr("graft_long_dot(a, b)").as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, z) -> acc + z)").as("ref"))
      .as[(Long, Long)].collect()
    assert(out.forall { case (f, r) => f == r }, out.mkString(","))
    assert(out.toSeq == Seq((32L, 32L), (-23L, -23L), (0L, 0L)))
  }

  test("null inputs propagate null") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(df.select(expr("graft_long_dot(a, b)")).collect()(0).isNullAt(0))
  }

  test("type mismatch is an analysis error, not a runtime crash") {
    GraftFunctions.register(spark)
    val df = Seq(("x", Seq(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(expr("graft_long_dot(a, b)")).collect()
    }
    assert(e.getMessage.contains("array<bigint>"), e.getMessage)
  }

  test("registration is idempotent") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_long_dot(array(2L), array(21L))")
      .first().getLong(0) == 42L)
  }

  test("property: graft_levenshtein == builtin on random string pairs (300 seeded cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    GraftFunctions.register(spark)
    // alphabet mixes repeats, a non-ASCII char, and a surrogate pair; short
    // lengths maximize boundary coverage (empty, full-overlap, disjoint)
    val strGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "é", "😀")).map(_.mkString))
    val pairs = (0 until 300).map { i =>
      (strGen(Gen.Parameters.default, Seed(7L + i)).getOrElse(""),
        strGen(Gen.Parameters.default, Seed(9007L + i)).getOrElse(""))
    }
    val out = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      expr("graft_levenshtein(a, b)").as("fast"),
      levenshtein(col("a"), col("b")).as("ref"))
      .as[(String, String, Int, Int)].collect()
    out.foreach { case (a, b, f, r) =>
      assert(f == r, s"mismatch on (\"$a\", \"$b\"): trimmed=$f builtin=$r")
    }
  }

  test("graft_levenshtein is bit-identical to the builtin on adversarial inputs") {
    GraftFunctions.register(spark)
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val cases = Seq(
      ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
      ("kitten", "sitting"), ("flaw", "lawn"),
      (base, base),                                        // full trim, no DP
      (base + "xyz", base + "abc"),                        // shared prefix
      ("xyz" + base, "abc" + base),                        // shared suffix
      (base + "MID" + base, base + "middle" + base),       // both ends shared
      ("ab", "ba"), ("aaaa", "aa"),                        // trim interacts with repeats
      ("café", "cafe"),                               // non-ASCII
      ("a😀b", "a😁b"),                // surrogate pairs mid-string
      ("😀abc", "😀abd"),              // surrogate prefix
      ("abc😀", "abd😀"))              // surrogate suffix
    val df = cases.toDF("a", "b")
    val out = df.select(
      expr("graft_levenshtein(a, b)").as("fast"),
      levenshtein(col("a"), col("b")).as("ref"))
      .as[(Int, Int)].collect()
    out.zip(cases).foreach { case ((f, r), c) =>
      assert(f == r, s"mismatch on $c: trimmed=$f builtin=$r")
    }
    // null propagation
    assert(Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(expr("graft_levenshtein(a, b)")).collect()(0).isNullAt(0))
  }

  test("graft_bucket equals the counting definition, duplicates and edges included") {
    // the binary search must return the COUNT OF CUTS STRICTLY BELOW the
    // value — the same id the comparison-ladder form yields — including
    // on duplicate cuts (flat quantile regions) and values at/outside
    // the cut range
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val cutSets = Seq(
      Array(1.0, 2.0, 3.0),
      Array(1.0, 1.0, 1.0, 5.0),                 // heavy duplicates
      Array(-3.5, -1.0, 0.0, 0.0, 2.5, 2.5, 9.0),
      Array.fill(63)(rnd.nextInt(20).toDouble).sorted) // quantile-like
    cutSets.foreach { cuts =>
      val vals = (cuts ++ cuts.map(_ - 0.5) ++ cuts.map(_ + 0.5) ++
        Array(-1e9, 1e9) ++ Array.fill(50)(rnd.nextDouble() * 12 - 3)).toSeq
      val got = vals.toDF("x")
        .select(col("x"), call_function("graft_bucket", col("x"), lit(cuts)).as("b"))
        .as[(Double, Int)].collect()
      got.foreach { case (x, b) =>
        assert(b == cuts.count(_ < x), s"x=$x cuts=${cuts.mkString(",")}")
      }
    }
    // null in → null out
    assert(Seq(Option.empty[java.lang.Double]).toDF("x")
      .select(call_function("graft_bucket", col("x"), lit(Array(1.0))))
      .collect()(0).isNullAt(0))
  }

  test("property: graft_md5_u32 == the conv(substring(md5)) chain on random strings (300 seeded cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    GraftFunctions.register(spark)
    // alphabet covers the library's actual seed keys (digits + ':') plus
    // multi-byte UTF-8; the equality must hold for EVERY string because
    // every oracle spells the chain with strpos-digit sums
    val strGen = Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("0", "7", ":", "a", "dp:", "é", "😀"))
        .map(_.mkString))
    val strs = (0 until 300).map(i =>
      strGen(Gen.Parameters.default, Seed(11L + i)).getOrElse(""))
    val out = strs.toDF("s").select(
      col("s"),
      expr("graft_md5_u32(s)").as("fast"),
      expr("cast(conv(substring(md5(encode(s, 'UTF-8')), 1, 8), 16, 10) as bigint)")
        .as("ref"))
      .as[(String, Long, Long)].collect()
    out.foreach { case (s, f, r) =>
      assert(f == r, s"mismatch on \"$s\": digest-read=$f conv-chain=$r")
    }
    // full unsigned 32-bit range is reachable (sanity of the byte math)
    assert(out.forall { case (_, f, _) => f >= 0L && f <= 0xffffffffL })
    // null propagates
    assert(Seq(Option.empty[String]).toDF("s")
      .select(expr("graft_md5_u32(s)")).collect()(0).isNullAt(0))
  }
}
