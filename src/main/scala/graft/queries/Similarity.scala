package graft.queries

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (north-star extension,
  * SURVEY.md §2b `q_topk_similarity`).
  *
  * Two variants: brute-force exact top-k (the baseline — one broadcast of
  * the query vector, one pass over the table, TakeOrdered for the top-k;
  * embarrassingly parallel at 100 TB), and a sign-random-projection LSH
  * bucketed search (the scale path — candidates drop to ~N/2^planes before
  * the exact rerank; the bucket id is computable at ingest and usable as a
  * partition/cluster key so a query touches one bucket's files only).
  */
object Similarity {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Scaled int vectors + cached norms for the whole table. */
  private def intVecs(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"), col("label"), intVec("embedding").as("v"))
      .withColumn("nv", normL("v"))

  // Deterministic ±1 projection component for plane p, dimension j (1-based):
  // sign = +1 iff ((p+1)*(j+3)) mod 7 < 3. Arbitrary but fixed, and cheaply
  // expressible in both engines (no hashing needed). Materialized here as
  // literal arrays so each plane dot is one codegen'd LongDot pass.
  private val PLANES = 4

  private def planeLit(p: Int): String =
    (1 to 64).map(j => if ((p + 1) * (j + 3) % 7 < 3) "1L" else "-1L")
      .mkString("array(", ", ", ")")

  private def bucketExpr(v: String): org.apache.spark.sql.Column =
    (0 until PLANES).map { p =>
      when(dotL(v, planeLit(p)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  val queries: Map[String, QFn] = Map(

    // Exact brute-force cosine top-10 vs the vec_id=0 query vector.
    "q_topk_similarity" -> ((s, d) => {
      val iv = intVecs(s, d)
      val q = iv.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nv").as("nq"))
      iv.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          cosine(dotL("v", "qv"), col("nv"), col("nq")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)
    }),

    // LSH-bucketed ANN: sign-random-projection bucket (4 planes), candidates
    // = same bucket as the query, exact cosine rerank top-5.
    "q_ann_lsh" -> ((s, d) => {
      val iv = intVecs(s, d).withColumn("bucket", bucketExpr("v"))
      val q = iv.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nv").as("nq"), col("bucket").as("qbucket"))
      iv.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("bucket") === col("qbucket"))
        .select(col("vec_id"), col("bucket"),
          cosine(dotL("v", "qv"), col("nv"), col("nq")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(5)
    }),

    // IVF-style ANN: 8 fixed centroids (vec_ids 1..8), every vector assigned
    // to its max-cosine centroid (tie-break on centroid id), search probes
    // only the query's cluster, exact rerank inside it. At scale the
    // assignment happens once at ingest and `cluster` becomes a partition
    // key — a query reads one cluster's files, not the corpus.
    "q_ann_ivf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val iv = intVecs(s, d)
      val cents = iv.filter(col("vec_id").between(1, 8))
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nv").as("cn"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(cosine(dotL("v", "cv"), col("nv"), col("cn")).desc, col("cid").asc)
      val assigned = iv.crossJoin(broadcast(cents))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("nv"), col("cid").as("cluster"))
      val q = assigned.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nv").as("nq"), col("cluster").as("qcluster"))
      assigned.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("cluster") === col("qcluster"))
        .select(col("vec_id"), col("cluster"),
          cosine(dotL("v", "qv"), col("nv"), col("nq")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(5)
    }),

    // Embedding-cosine near-duplicate pairs (threshold tuned to the planted
    // near-dups in the synthetic data). The threshold lives INSIDE the join
    // condition: the nested-loop join then emits only surviving pairs
    // instead of materializing all N²/2 candidate rows (array payloads and
    // the GC debt they bring) just to filter them one operator later.
    "q_embed_neardup" -> ((s, d) => {
      val iv = intVecs(s, d)
      val a = iv.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nv").as("na"))
      val b = iv.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nv").as("nb"))
      val cos = cosine(dotL("va", "vb"), col("na"), col("nb"))
      a.join(b, col("vec_a") < col("vec_b") && cos >= 0.4)
        .select(col("vec_a"), col("vec_b"), cos.as("cos"))
        .orderBy(col("vec_a"), col("vec_b"))
    })
  )

  // Shared oracle scaffolding: scaled int vectors, index table 1..64.
  private val ivCte =
    s"""iv AS (SELECT vec_id, label, ${sqlIntVec("embedding")} AS v
       |      FROM embeddings),
       |idx AS (SELECT UNNEST(range(1, 65)) AS i)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_topk_similarity" ->
      s"""WITH $ivCte,
         |q AS (SELECT v AS qv FROM iv WHERE vec_id = 0),
         |sc AS (SELECT iv.vec_id, iv.label,
         |         SUM(iv.v[i] * q.qv[i]) AS dot,
         |         SUM(iv.v[i] * iv.v[i]) AS nv,
         |         SUM(q.qv[i] * q.qv[i]) AS nq
         |       FROM iv, q, idx GROUP BY iv.vec_id, iv.label)
         |SELECT vec_id, label,
         |  CAST(dot AS DOUBLE) / (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |FROM sc WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH $ivCte,
         |pl AS (SELECT UNNEST(range(0, ${PLANES})) AS p),
         |dots AS (SELECT iv.vec_id, p,
         |           SUM(iv.v[i] * (CASE WHEN ((p+1)*(i+3)) % 7 < 3 THEN 1 ELSE -1 END)) AS dp
         |         FROM iv, pl, idx GROUP BY iv.vec_id, p),
         |bk AS (SELECT vec_id,
         |         CAST(SUM(CASE WHEN dp >= 0 THEN CAST(POWER(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM dots GROUP BY vec_id),
         |q AS (SELECT iv.v AS qv, bk.bucket AS qbucket
         |      FROM iv JOIN bk USING (vec_id) WHERE vec_id = 0),
         |sc AS (SELECT iv.vec_id, bk.bucket,
         |         SUM(iv.v[i] * q.qv[i]) AS dot,
         |         SUM(iv.v[i] * iv.v[i]) AS nv,
         |         SUM(q.qv[i] * q.qv[i]) AS nq
         |       FROM iv JOIN bk USING (vec_id), q, idx
         |       WHERE bk.bucket = q.qbucket AND iv.vec_id <> 0
         |       GROUP BY iv.vec_id, bk.bucket)
         |SELECT vec_id, bucket,
         |  CAST(dot AS DOUBLE) / (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH $ivCte,
         |sc_c AS (SELECT iv.vec_id, c.vec_id AS cid,
         |           SUM(iv.v[i] * c.v[i]) AS dot,
         |           SUM(iv.v[i] * iv.v[i]) AS nv,
         |           SUM(c.v[i] * c.v[i]) AS cn
         |         FROM iv, iv c, idx
         |         WHERE c.vec_id BETWEEN 1 AND 8
         |         GROUP BY iv.vec_id, c.vec_id),
         |assign AS (SELECT vec_id, cid AS cluster FROM (
         |  SELECT vec_id, cid,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
         |           CAST(dot AS DOUBLE) / (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(cn AS DOUBLE))) DESC,
         |           cid ASC) AS rn
         |  FROM sc_c) z WHERE rn = 1),
         |q AS (SELECT iv.v AS qv, a.cluster AS qc
         |      FROM iv JOIN assign a USING (vec_id) WHERE iv.vec_id = 0),
         |sc AS (SELECT iv.vec_id, a.cluster,
         |         SUM(iv.v[i] * q.qv[i]) AS dot,
         |         SUM(iv.v[i] * iv.v[i]) AS nv,
         |         SUM(q.qv[i] * q.qv[i]) AS nq
         |       FROM iv JOIN assign a USING (vec_id), q, idx
         |       WHERE a.cluster = q.qc AND iv.vec_id <> 0
         |       GROUP BY iv.vec_id, a.cluster)
         |SELECT vec_id, cluster,
         |  CAST(dot AS DOUBLE) / (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin,

    "q_embed_neardup" ->
      s"""WITH $ivCte,
         |sc AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         SUM(a.v[i] * b.v[i]) AS dot,
         |         SUM(a.v[i] * a.v[i]) AS na,
         |         SUM(b.v[i] * b.v[i]) AS nb
         |       FROM iv a, iv b, idx WHERE a.vec_id < b.vec_id
         |       GROUP BY a.vec_id, b.vec_id)
         |SELECT vec_a, vec_b,
         |  CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cos
         |FROM sc
         |WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin
  )
}
