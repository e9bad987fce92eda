package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions.intVec
import graft.operators.KMeans
import org.apache.spark.sql.functions._

class VectorsStreamSpec extends SparkSpec {

  test("streamed PQ encode equals the batch encode under the same frozen codebooks") {
    val in = tmpDir("vecs-in")
    // stage the corpus as two parquet files → two micro-batches
    val vecs = Tables.load(spark, sf, "embeddings")
    val half = vecs.count() / 2
    vecs.filter(col("vec_id") < half).coalesce(1)
      .write.mode("append").parquet(in)
    vecs.filter(col("vec_id") >= half).coalesce(1)
      .write.mode("append").parquet(in)

    // train offline: the q_ann_pq codebooks (4 subspaces × 16 dims, k=4,
    // 2 Lloyd updates) from the STATIC table
    val models = (0 until 4).map { m =>
      val sub = vecs.select(col("vec_id"), intVec("embedding").as("v64"))
        .select(col("vec_id"), expr(s"slice(v64, ${m * 16 + 1}, 16)").as("v"))
        .withColumn("nv", expr("graft_long_dot(v, v)"))
      KMeans.model(sub, (1L to 4L).toSeq, updates = 2)
    }

    // serve online: encode the stream with the frozen models
    val q = VectorsStream.pqEncode(
        VectorsStream.readVecs(spark, in, maxFilesPerTrigger = Some(1)),
        models, subDims = 16)
      .writeStream.format("memory").queryName("pq_codes")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("pq_codes").collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getLong(i + 1)))
      .toMap

    // parity: the SAME pqEncode definition over the batch frame
    val batch = VectorsStream.pqEncode(vecs, models, subDims = 16)
      .collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getLong(i + 1)))
      .toMap

    assert(streamed.size == batch.size, "row count drift")
    assert(streamed == batch, "stream/batch code drift")
    // codes are in the codebook range
    streamed.values.flatten.foreach(c => assert(c >= 1L && c <= 4L))
    // multiple codes actually in use (the codebooks have signal)
    assert(streamed.values.flatten.toSet.size > 1)
  }
}
