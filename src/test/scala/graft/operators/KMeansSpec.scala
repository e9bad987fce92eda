package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  private def vecs = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), intVec("embedding").as("v"))
    .withColumn("nv", normL("v"))

  test("centArgmaxData assigns bit-identically to the literal-expression argmax at k=8 and k=24") {
    // the data form exists so SemDeDup's conf-scaled k doesn't pay the
    // literal expression's ~per-centroid codegen cost — it must be a pure
    // execution-strategy swap: same IEEE arithmetic, same min-cid ties
    for (k <- Seq(8, 24)) {
      val model = KMeans.model(vecs, (1L to k.toLong).toSeq, updates = 2)
      val both = vecs
        .withColumn("lit_c", KMeans.centArgmax(model))
        .withColumn("dat_c", KMeans.centArgmaxData(model))
      val diff = both.filter(col("lit_c") =!= col("dat_c")).count()
      assert(diff == 0, s"k=$k: $diff rows assigned differently")
    }
  }

  test("train with iters=1 equals the registered single Lloyd step") {
    val step = graft.queries.Similarity.queries("q_kmeans_step")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val train1 = KMeans.train(vecs, (1L to 8L).toSeq, iters = 1)
      .select(col("cluster"), col("pos"), col("n"), col("mean"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(train1.toSeq == step.toSeq)
  }

  test("trainConverged reaches an exact fixed point within the cap") {
    val (model, rounds) = KMeans.trainConverged(vecs, (1L to 8L).toSeq, maxIters = 30)
    assert(rounds < 30, s"no convergence in $rounds rounds")
    // fixed point: one more round from the converged model changes nothing
    val (model2, roundsMore) = KMeans.trainConverged(vecs, (1L to 8L).toSeq, maxIters = rounds)
    assert(model.zip(model2).forall { case ((_, a, _), (_, b, _)) => a.sameElements(b) })
    // total mass conservation: cluster sizes sum to the corpus size
    val n = vecs.count()
    val sizes = KMeans.train(vecs, (1L to 8L).toSeq, iters = rounds)
      .filter(col("pos") === 0).agg(sum(col("n"))).collect()(0).getLong(0)
    assert(sizes == n, s"cluster sizes $sizes != corpus $n")
  }

  test("iterating strictly reduces or maintains movement: round 2+3 differ from seed only via reassignment") {
    // 3-round output is internally consistent: per-cluster n equal across dims
    val out = KMeans.train(vecs, (1L to 8L).toSeq, iters = 3).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).distinct.length == 1)
      assert(rows.length == 64)
    }
  }
}
