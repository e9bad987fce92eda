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

  /** Scaled int vectors + cached norms for the whole table. Fanned scan
    * (r14): the embedding-string parse + norm is the heavy map side every
    * ANN consumer pays. `fan = false` keeps the 1-task scan for the one
    * consumer the A/B showed regressing — the q_kmeans_train convergence
    * loop, whose per-round stages over the persisted input inherit the
    * fan-out width and pay ~rounds × 32 task floors on loop-sized data
    * (off 1.31 s vs on 2.21 s isolated; every non-loop consumer won). */
  private def intVecs(s: SparkSession, d: String, fan: Boolean = true): DataFrame =
    (if (fan) Tables.loadFan(s, d, "embeddings") else Tables.load(s, d, "embeddings"))
      .select(col("vec_id"), col("label"), intVec("embedding").as("v"))
      .withColumn("nv", normL("v"))

  // Deterministic ±1 projection component for plane p, dimension j (1-based):
  // sign = +1 iff ((p+1)*(j+3)) mod 7 < 3. Arbitrary but fixed, and cheaply
  // expressible in both engines (no hashing needed). Materialized here as
  // literal arrays so each plane dot is one codegen'd LongDot pass.
  // PLANES is the DEFAULT (and oracle) geometry; the arithmetic formula
  // only serves p < 4 — (p+1) mod 7 repeats (p=6 would be all-+1s), so
  // planes beyond the default draw seeded-independent signs instead
  // (lshExtraSigns below, the mtSigns discipline).
  private val PLANES = 4

  /** Hard ceiling on the LSH bit-width knob: 2^20 buckets is past any
    * corpus this library addresses at ~64 vectors/bucket, and the
    * pre-drawn extra sign pool is sized to it. */
  private val MaxPlanes = 20

  /** Scale-adaptive LSH bit-width (the round-13 sf1 audit's saturation
    * class): a FIXED plane count means a fixed 2^planes bucket space, so
    * LSH candidate volume grows ∝ N²/2^planes — quadratic again past the
    * geometry's design point. `graft.ann.lsh.planes` sets the bit-width
    * for the single-table bucket AND each of the L multi-table buckets:
    * an integer, or "auto" = ⌈log₂(N/64)⌉ clamped to [PLANES, MaxPlanes]
    * (mean bucket occupancy held at ~64 regardless of N, so candidates
    * grow ∝ 64·N — linear). PERF KNOB ONLY: the generated oracle SQL
    * embeds the DEFAULT geometry, so the driver's correctness gate (which
    * never sets the conf) replays planes = 4 bit-for-bit; a session that
    * sets the conf trades oracle comparability for the scale plan, and
    * recall per geometry is pinned in QueriesSpec on the clustered
    * fixture. */
  private def planesFor(s: SparkSession, d: String): Int =
    s.conf.get("graft.ann.lsh.planes", PLANES.toString) match {
      case "auto" =>
        val n = vecCount.getOrElseUpdate(d, t(s, d, "embeddings").count())
        math.min(MaxPlanes, math.max(PLANES,
          math.ceil(math.log(math.max(1.0, n / 64.0)) / math.log(2.0)).toInt))
      case v =>
        val p = v.toInt
        require(p >= 1 && p <= MaxPlanes,
          s"graft.ann.lsh.planes must be in [1, $MaxPlanes] or 'auto', got $p")
        p
    }

  /** Seeded ±1 signs for planes beyond the arithmetic default — drawn
    * from their own fixed stream so the DEFAULT geometry's buckets are
    * bit-identical whether or not the knob exists. */
  private lazy val lshExtraSigns: IndexedSeq[IndexedSeq[Int]] = {
    val rnd = new scala.util.Random(0x51C4A11)
    IndexedSeq.fill(MaxPlanes - PLANES, 64)(if (rnd.nextBoolean()) 1 else -1)
  }

  /** Graph-ANN geometry (q_ann_graph): beam width (default, overridable
    * via graft.ann.graph.beam — the oracle replays the default) and the
    * fixed greedy-search round count (fixed so the oracle can unroll). */
  private val GraphBeam = 8
  private val GraphRounds = 3

  /** PQ geometry (q_ann_pq): 4 contiguous subspaces × 16 dims over the
    * 64-dim embedding, k=4 codes per sub-codebook (seed subvectors of
    * vec_ids 1..4, 2 Lloyd updates). */
  private val PqM = 4
  private val PqSub = 16
  private val PqK = 4L

  /** The per-subspace PQ codebooks (q_ann_pq / q_ann_ivfpq training):
    * subspace m's k-means over `slice(v, m·16+1, 16)`, seeds = the
    * subvectors of vec_ids 1..k, 2 Lloyd updates — independent subspaces,
    * so the per-sub calls ARE joint PQ training. */
  private def pqModels(iv: DataFrame): Seq[graft.operators.KMeans.Model] =
    (0 until PqM).map { m =>
      val sub = iv.select(col("vec_id"),
          expr(s"slice(v, ${m * PqSub + 1}, $PqSub)").as("v"))
        .withColumn("nv", normL("v"))
      graft.operators.KMeans.model(sub, (1L to PqK).toSeq, updates = 2)
    }

  /** Trained models memoized per dataset dir — the signatureTable idiom
    * applied to MODEL state: production trains the coarse quantizer and
    * the PQ codebooks once and serves every probe from them, so each
    * consumer query (q_ann_ivf_trained, q_ann_pq, both IVF-PQ points,
    * SemDeDup, the vector pipeline) and every bench repeat reads the
    * same per-JVM trained literals instead of re-running Lloyd. The
    * model is k×d driver-side values (in-memory cache, nothing to
    * sweep); dataset dirs are immutable (the vecCount precedent);
    * training is deterministic, so a cache hit is bit-identical to a
    * rebuild — the oracles replay training unchanged. Build cost is
    * ledgered in [[graft.Assets]] (bench assets_s). Deliberately NOT
    * used by q_kmeans_train / q_kmeans_step, whose registered OUTPUT is
    * the training itself. A failed build (the empty-input seed guard)
    * caches nothing and re-throws on every call. */
  private val coarseCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.operators.KMeans.Model]

  private def coarseModel(s: SparkSession, d: String): graft.operators.KMeans.Model =
    coarseCache.synchronized {
      coarseCache.getOrElseUpdate(d, graft.Assets.timed("coarse_quantizer") {
        // fan = false: k-means update loop — same loop-floor trade as
        // q_kmeans_train (intVecs doc comment)
        graft.operators.KMeans.model(intVecs(s, d, fan = false),
          (1L to 8L).toSeq, updates = 2)
      })
    }

  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[graft.operators.KMeans.Model]]

  private def pqModelsFor(s: SparkSession, d: String): Seq[graft.operators.KMeans.Model] =
    pqCache.synchronized {
      pqCache.getOrElseUpdate(d, graft.Assets.timed("pq_codebooks") {
        pqModels(intVecs(s, d, fan = false)) // 4 sub-quantizer loops
      })
    }

  /** base (columns `v`, `qv`) + `code0..3` (in-row argmax against literal
    * sub-centroids) + `adc` (Σ_m of the query sub-vector's exact cosine
    * against the coded integer-SUM centroid — element_at picks the coded
    * one, cids 1..k are the array positions). The sum is an explicit
    * left-to-right reduce — the same IEEE addition order as the oracle's
    * parenthesized CASE pivots, so the doubles are identical. */
  private def pqScored(base: DataFrame,
                       models: Seq[graft.operators.KMeans.Model]): DataFrame = {
    val coded = (0 until PqM).foldLeft(base) { (df, m) =>
      val vm = s"slice(v, ${m * PqSub + 1}, $PqSub)"
      val qm = s"slice(qv, ${m * PqSub + 1}, $PqSub)"
      val terms = models(m).sortBy(_._1).map { case (_, cs, cn) =>
        val cLit = cs.mkString("array(", "L, ", "L)")
        expr(s"cast(graft_long_dot($qm, $cLit) as double)" +
          s" / (sqrt(cast(graft_long_dot($qm, $qm) as double))" +
          s" * sqrt(cast(${cn}L as double)))")
      }
      df.withColumn(s"code$m",
          graft.operators.KMeans.centArgmaxOn(models(m), vm,
            s"graft_long_dot($vm, $vm)"))
        .withColumn(s"term$m",
          element_at(array(terms: _*), col(s"code$m").cast("int")))
    }
    coded.withColumn("adc",
      (0 until PqM).map(m => col(s"term$m")).reduce(_ + _))
  }

  /** Per-dataset-dir embedding row counts for the q_knn_join scale guard —
    * one count job per dataset per JVM instead of one per query build.
    * A dataset dir is immutable in this engine's convention (testdata and
    * the GCS layout are append-by-new-partition), so staleness is not a
    * correctness risk for a guard. */
  private val vecCount = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def planeLit(p: Int): String =
    if (p < PLANES)
      (1 to 64).map(j => if ((p + 1) * (j + 3) % 7 < 3) "1L" else "-1L")
        .mkString("array(", ", ", ")")
    else lshExtraSigns(p - PLANES).map(s => s"${s}L")
      .mkString("array(", ", ", ")")

  private def bucketExpr(v: String, planes: Int = PLANES): org.apache.spark.sql.Column =
    (0 until planes).map { p =>
      when(dotL(v, planeLit(p)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-probe mask literal for a `planes`-bit bucket: the exact bucket
    * plus every Hamming-1 neighbor — `planes + 1` probes, scaling with
    * the bit-width so the probe scheme's recall character is
    * geometry-independent. */
  private def probeMasksLit(planes: Int): String =
    (Seq(0L) ++ (0 until planes).map(p => 1L << p))
      .map(m => s"${m}L").mkString("array(", ", ", ")")

  /** MMR rerank geometry (q_mmr_rerank): a FIXED 10-id request batch
    * (the q_colbert_maxsim `isin` discipline — all ids exist at every
    * tested sf), top-8 relevance pool, greedy-select 3 with λ = 0.7.
    * |Q| is a constant, NOT corpus-coupled: in production the batch is
    * whatever requests arrived, never a modulus of the corpus — so the
    * relevance pass is one O(N·|Q|) = O(N) corpus scan against a
    * constant-size broadcast, embarrassingly parallel at 100 TB, and
    * everything downstream of the pool is |Q|-sized. The λ and 1−λ
    * weights are SEPARATE double literals (0.7 / 0.3) in both engines —
    * computing 1−0.7 in IEEE would yield 0.30000000000000004 and break
    * bit-parity with the oracle's 0.3. */
  private[graft] val MmrQIds: Seq[Long] = (0L to 450L by 50L)
  private val MmrPool = 8
  private val MmrK = 3
  private val CoresetK = 8
  private val MmrLam = 0.7
  private val MmrDivW = 0.3

  /** JL projection geometry (q_jl_project): 64 → 16 dims, seeded ±1
    * signs shared verbatim with the oracle (the mtSigns discipline). */
  private val JlOut = 16

  private lazy val jlSigns: IndexedSeq[IndexedSeq[Int]] = {
    val rnd = new scala.util.Random(0x4A4C50)
    IndexedSeq.fill(JlOut, 64)(if (rnd.nextBoolean()) 1 else -1)
  }

  private def jlPlaneLit(r: Int): String =
    jlSigns(r).map(s => s"${s}L").mkString("array(", ", ", ")")

  /** Flattened sign list for the oracle: output dim r occupies 1-based
    * positions r*64+1 .. r*64+64. */
  private lazy val jlSqlLit: String = jlSigns.flatten.mkString("[", ", ", "]")

  /** Multi-table LSH (q_knn_join_ann_multi): L independent tables of
    * PLANES sign planes each. Signs are seeded-deterministic (fixed
    * java.util.Random LCG sequence, spec-stable across JVMs) and shared
    * VERBATIM between the Spark literals and the generated oracle SQL, so
    * the two engines can't disagree. Independent draws — unlike extending
    * the arithmetic formula above, whose (mult mod 7) sign patterns repeat
    * across plane indices and would correlate the tables' buckets. */
  private val MtTables = 4

  private lazy val mtSigns: IndexedSeq[IndexedSeq[IndexedSeq[Int]]] = {
    val rnd = new scala.util.Random(0x5EED)
    IndexedSeq.fill(MtTables, PLANES, 64)(if (rnd.nextBoolean()) 1 else -1)
  }

  /** Extra per-table planes for the knob, from their OWN seed — drawing
    * a wider fill from 0x5EED would shift the default tables' signs and
    * silently change every multi-table result under the default
    * geometry. */
  private lazy val mtExtraSigns: IndexedSeq[IndexedSeq[IndexedSeq[Int]]] = {
    val rnd = new scala.util.Random(0x5EED2)
    IndexedSeq.fill(MtTables, MaxPlanes - PLANES, 64)(
      if (rnd.nextBoolean()) 1 else -1)
  }

  private def mtPlaneLit(l: Int, p: Int): String =
    (if (p < PLANES) mtSigns(l)(p) else mtExtraSigns(l)(p - PLANES))
      .map(s => s"${s}L").mkString("array(", ", ", ")")

  /** Flattened per-table sign list for the oracle: plane p occupies
    * 1-based positions p*64+1 .. p*64+64. */
  private def mtSqlLit(l: Int): String =
    mtSigns(l).flatten.mkString("[", ", ", "]")

  private def mtBucketExpr(v: String, l: Int,
                           planes: Int = PLANES): org.apache.spark.sql.Column =
    (0 until planes).map { p =>
      when(dotL(v, mtPlaneLit(l, p)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The narrow (vec_id, l, bucket) relation behind both multi-table LSH
    * queries: all L×PLANES plane dots happen in ONE map pass over the
    * scan, then explode to one row per (vector, table) — so the per-table
    * candidate generation collapses to a single self-equi-join on
    * (l, bucket) instead of L separate joins each rescanning the corpus.
    * At 100 TB this is the difference between 2 scans and 2·L of them;
    * at real corpus scale you'd persist this table (it is the LSH index —
    * 3 longs/row·L) and bucket-partition it at ingest. */
  private def mtBucketTable(s: SparkSession, d: String): DataFrame = {
    val planes = planesFor(s, d)
    val iv = (0 until MtTables).foldLeft(intVecs(s, d)) { (df, l) =>
      df.withColumn(s"bk$l", mtBucketExpr("v", l, planes))
    }
    iv.select(col("vec_id"), explode(array((0 until MtTables).map(l =>
        struct(lit(l).as("l"), col(s"bk$l").as("bucket"))): _*)).as("x"))
      .select(col("vec_id"), col("x.l").as("l"), col("x.bucket").as("bucket"))
  }

  /** Shared tail of the exact and ANN kNN self-joins: each unordered
    * scored pair (ida, idb, cos) explodes into its two directed rows —
    * one dot per pair, never per direction — then the bounded typed
    * [[graft.functions.TopKAggregator]] keeps k neighbors per vector
    * (shuffle ≤ k rows per vector × map task, no window sort). */
  /** Exact all-pairs cosine scores via the balanced block self-join
    * (B×(B+1)/2 block pairs spread evenly across tasks, every unordered
    * id pair scored exactly once) — the shared candidate generator of
    * q_knn_join and q_label_noise. O(N²) by definition; callers guard.
    *
    * MEMOIZED as a per-dataset parquet asset (the Dedup signatureTable
    * idiom): the O(N²) scoring runs once per JVM, every consumer — both
    * queries and all bench repeats — probes the narrow (ida, idb, cos)
    * table. Dataset dirs are immutable by convention (the vecCount
    * precedent), temp dirs swept at JVM shutdown, build cost ledgered
    * in [[graft.Assets]] for the bench artifact's assets_s field. */
  private val pairCache = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The top-5 exact neighbor table derived from [[exactPairs]], itself
    * memoized: both exact-kNN consumers run the SAME bounded top-k
    * aggregation over the same pair table (q_knn_join wants k=3,
    * q_label_noise k=5), and the TopKAggregator's order is total and
    * deterministic (cos DESC, nbr ASC) — so the top-3 is literally rows
    * rnk ≤ 3 of the top-5. One aggregation pass per JVM builds the
    * (vec_id, nbr_id, cos, rnk≤5) asset; every consumer and bench repeat
    * probes the N×5-row parquet. Same lifecycle as the pair asset:
    * immutable dataset dirs, shutdown sweep, build cost ledgered. */
  private val nbrCache = scala.collection.concurrent.TrieMap.empty[String, String]

  /** SYMMETRIZED proximity-graph edge table for q_ann_graph — INDEX STATE
    * (r15): the walk probed `fwd ∪ reverse(fwd) → distinct` rebuilt from
    * the nnd asset on EVERY invocation; a production graph index stores
    * the bidirectional adjacency once (HNSW links are stored both ways).
    * Same lifecycle as the nnd asset it derives from (geometry-keyed,
    * shutdown sweep, build ledgered in assets_s). */
  private val graphEdgeCache = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Per-cluster ENTRY POINTS for q_ann_graph — k rows of index state
    * (r15): the per-invocation `entries` aggregate re-scanned the corpus
    * with the two literal-centroid expressions (argmax + centBestCos) per
    * row; the result is a k-row map, collected once per JVM like the
    * coarse-quantizer model it derives from. */
  private val graphEntryCache =
    scala.collection.concurrent.TrieMap.empty[String, Map[Long, Long]]

  /** q_ann_graph's query row (vector, norm, coarse cell) — 1 row of
    * serving state, deterministic per dataset dir; collected once per JVM
    * instead of once per invocation (the coarseModel precedent). */
  private val graphQueryCache =
    scala.collection.concurrent.TrieMap.empty[String, (Array[Long], Long, Long)]

  private val pairSweeper: Unit = sys.addShutdownHook {
    (pairCache.values ++ nbrCache.values ++ nndCache.values ++
      graphEdgeCache.values).foreach { p =>
      try {
        val root = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.exists(root))
          java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
      } catch { case _: Throwable => () }
    }
  }

  private[graft] def exactPairs(s: SparkSession, d: String): DataFrame = {
    val path = pairCache.synchronized {
      pairCache.getOrElseUpdate(d, graft.Assets.timed("exact_pairs") {
        val out = java.nio.file.Files.createTempDirectory("graft-exactpairs").toString
        computeExactPairs(s, d).write.mode("overwrite").parquet(out)
        out
      })
    }
    s.read.parquet(path)
  }

  /** One full neighbor-table build (the path [[neighborTable]] amortizes) —
    * exposed for the PlanSpec pin on the BUILD plan (bounded partial top-k,
    * no window sort) now that the registered queries' own plans are probes. */
  private[graft] def computeNeighbors(s: SparkSession, d: String): DataFrame =
    topKNeighbors(s, exactPairs(s, d), 5)

  private[graft] def neighborTable(s: SparkSession, d: String): DataFrame = {
    val path = nbrCache.synchronized {
      nbrCache.getOrElseUpdate(d, graft.Assets.timed("knn_neighbors") {
        val out = java.nio.file.Files.createTempDirectory("graft-knnnbrs").toString
        computeNeighbors(s, d).write.mode("overwrite").parquet(out)
        out
      })
    }
    s.read.parquet(path)
  }

  /** ANN-BUILT proximity graph (the NN-descent shape, Dong et al.
    * WWW'11): the exact `knn_neighbors` asset is quadratic by definition
    * (175.8 s at sf1, impossible at corpus scale), so the graph-ANN
    * index builds from ANN candidates instead —
    *   1. initialize each vector's top-5 from the multi-table LSH
    *      candidate pairs ([[mtCandIds]] — bounded equi-joins, inherits
    *      the `graft.ann.lsh.planes` geometry knob);
    *   2. ONE neighbor-of-neighbor refinement round: vectors sharing a
    *      neighbor in the current graph (either direction) become
    *      candidates — a bounded self-equi-join on the shared endpoint
    *      (≤ deg² rows per vertex, deg ≤ 10 after symmetrization);
    *      only genuinely NEW pairs pay a scoring dot;
    *   3. re-rank to top-5 under the same (cos DESC, nbr ASC) total
    *      order as the exact build.
    * Everything is deterministic (seeded planes, exact integer dots), so
    * the DuckDB oracle replays init + refinement bit-for-bit. The EXACT
    * asset stays as the quality reference (q_knn_join, q_label_noise,
    * the recall panel's ground truth); graph quality of the ANN build vs
    * the exact build is pinned in QueriesSpec on the clustered fixture. */
  private[graft] def computeNndNeighbors(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel.DISK_ONLY
    val iv = intVecs(s, d)
    val init = mtCandIds(s, d).persist(DISK_ONLY)
    val s0 = scoreIdPairs(iv, init).persist(DISK_ONLY)
    val n0 = topKNeighbors(s, s0, 5)
    val sym = n0.select(col("vec_id").as("vid"), col("nbr_id").as("nbr"))
      .unionByName(n0.select(col("nbr_id").as("vid"), col("vec_id").as("nbr")))
      .distinct()
    val non = sym.as("x")
      .join(sym.as("y"),
        col("x.vid") === col("y.vid") && col("x.nbr") < col("y.nbr"))
      .select(col("x.nbr").as("ida"), col("y.nbr").as("idb")).distinct()
    val freshScored = scoreIdPairs(iv,
      non.join(init, Seq("ida", "idb"), "left_anti"))
    topKNeighbors(s, s0.unionByName(freshScored), 5)
  }

  private val nndCache = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Memoized parquet path of the NN-descent graph asset — path-valued so
    * the q_ann_graph loop session can read it directly: the GEOMETRY part
    * of the cache key resolves from the PARENT session's conf (a fresh
    * clone would silently fall back to the default geometry and build a
    * second asset). */
  private[graft] def nndNeighborPath(s: SparkSession, d: String): String = {
    val planes = planesFor(s, d)
    nndCache.synchronized {
      nndCache.getOrElseUpdate(s"$d|p=$planes", graft.Assets.timed("nnd_neighbors") {
        val out = java.nio.file.Files.createTempDirectory("graft-nndnbrs").toString
        // the build persists its double-consumed intermediates; sweep
        // exactly those (and nothing a consumer query holds) once the
        // asset parquet is on disk
        val before = s.sparkContext.getPersistentRDDs.keySet
        computeNndNeighbors(s, d).write.mode("overwrite").parquet(out)
        (s.sparkContext.getPersistentRDDs.keySet -- before).foreach(id =>
          s.sparkContext.getPersistentRDDs.get(id)
            .foreach(_.unpersist(blocking = false)))
        out
      })
    }
  }

  private[graft] def nndNeighborTable(s: SparkSession, d: String): DataFrame =
    s.read.parquet(nndNeighborPath(s, d))

  /** Memoized parquet path of the symmetrized graph-ANN adjacency (see
    * [[graphEdgeCache]]) — built in the PARENT session (full width), read
    * by the walk's loop session. coalesce(1): ≤ 2·N·5 id pairs, one file
    * keeps the probe-side scan a single task (the asset-write layout
    * discipline of Dedup.assetParts). */
  private[graft] def graphEdgePath(s: SparkSession, d: String): String = {
    val planes = planesFor(s, d)
    // resolve the nnd dependency OUTSIDE the timed block: its own build is
    // already ledgered as nnd_neighbors, and nesting it here would double-
    // count it in assets_s
    val nndPath = nndNeighborPath(s, d)
    graphEdgeCache.synchronized {
      graphEdgeCache.getOrElseUpdate(s"$d|p=$planes",
        graft.Assets.timed("ann_graph_edges") {
          val out = java.nio.file.Files.createTempDirectory("graft-gedges").toString
          val fwd = s.read.parquet(nndPath)
            .filter(col("vec_id") =!= 0 && col("nbr_id") =!= 0)
            .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
          fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
            .distinct().coalesce(1).write.mode("overwrite").parquet(out)
          out
        })
    }
  }

  /** Memoized per-cluster entry points (see [[graphEntryCache]]): the
    * corpus member most aligned with its trained centroid, ties to the
    * smallest vec_id — byte-identical to the per-invocation aggregate it
    * replaces (same max-over-struct), built once per JVM at the parent
    * session's full scan width. */
  private def graphEntryPoints(s: SparkSession, d: String): Map[Long, Long] =
    graphEntryCache.getOrElseUpdate(d, graft.Assets.timed("ann_graph_entries") {
      val coarse = coarseModel(s, d)
      intVecs(s, d).filter(col("vec_id") =!= 0)
        .withColumn("cluster", graft.operators.KMeans.centArgmax(coarse))
        .withColumn("ccos", graft.operators.KMeans.centBestCos(coarse))
        .groupBy(col("cluster"))
        .agg(max(struct(col("ccos"), negate(col("vec_id")).as("nid"),
          col("vec_id"))).as("e"))
        .select(col("cluster"), col("e.vec_id").as("vec_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    })

  /** Memoized query serving state for q_ann_graph (see
    * [[graphQueryCache]]): vec 0's vector, norm and coarse cell. */
  private def graphQueryState(s: SparkSession, d: String): (Array[Long], Long, Long) =
    graphQueryCache.getOrElseUpdate(d, {
      val coarse = coarseModel(s, d)
      val qRows = intVecs(s, d).filter(col("vec_id") === 0)
        .withColumn("cluster", graft.operators.KMeans.centArgmax(coarse))
        .select(col("v"), col("nv"), col("cluster")).limit(1).collect()
      require(qRows.nonEmpty,
        "q_ann_graph: query vector vec_id=0 missing from the embeddings table")
      (qRows(0).getSeq[Long](0).toArray, qRows(0).getLong(1), qRows(0).getLong(2))
    })

  /** One full pair-scoring build (the path [[exactPairs]] amortizes). */
  private[graft] def computeExactPairs(s: SparkSession, d: String): DataFrame = {
    val B = 8
    val iv = intVecs(s, d).withColumn("blk", pmod(col("vec_id"), lit(B)))
    val a = iv.select(col("vec_id").as("ida"), col("v").as("va"),
        col("nv").as("na"), col("blk").as("ba"),
        explode(expr(s"sequence(blk, ${B - 1})")).as("pj"))
      .withColumn("pk", col("ba") * B + col("pj"))
    val b = iv.select(col("vec_id").as("idb"), col("v").as("vb"),
        col("nv").as("nb"), col("blk").as("bb"),
        explode(expr("sequence(0, blk)")).as("pi"))
      .withColumn("pk", col("pi") * B + col("bb"))
    val cos = cosine(dotL("va", "vb"), col("na"), col("nb"))
    a.join(b, a("pk") === b("pk") &&
        (col("ba") < col("bb") || col("ida") < col("idb")))
      .select(col("ida"), col("idb"), cos.as("cos"))
  }

  /** Multi-table LSH candidate id pairs (ida < idb) — pairs sharing a
    * bucket in ANY of the L tables, deduped on the pair key while
    * id-only (16 bytes/row). */
  private def mtCandIds(s: SparkSession, d: String): DataFrame = {
    val bk = mtBucketTable(s, d)
    bk.select(col("vec_id").as("ida"), col("l"), col("bucket"))
      .join(bk.select(col("vec_id").as("idb"), col("l"), col("bucket")),
        Seq("l", "bucket"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).distinct()
  }

  /** Exact cosine for an id-pair set: shuffle-by-id vector fetch, one dot
    * per pair — the shared scoring tail of the LSH candidate machinery
    * and the NN-descent rounds. */
  private def scoreIdPairs(iv: DataFrame, ids: DataFrame): DataFrame = {
    val va = iv.select(col("vec_id").as("ida"), col("v").as("va"), col("nv").as("na"))
    val vb = iv.select(col("vec_id").as("idb"), col("v").as("vb"), col("nv").as("nb"))
    ids.join(va, "ida").join(vb, "idb")
      .select(col("ida"), col("idb"),
        cosine(dotL("va", "vb"), col("na"), col("nb")).as("cos"))
  }

  /** Scored multi-table LSH candidate pairs — each surviving pair's exact
    * dot computed ONCE. Shared by q_knn_join_ann_multi, q_label_noise_ann,
    * q_hard_negatives, and the NN-descent graph build. */
  private[graft] def mtPairs(s: SparkSession, d: String): DataFrame =
    scoreIdPairs(intVecs(s, d), mtCandIds(s, d))

  /** The composed IVF-PQ probe (FAISS IndexIVFPQ shape) at a given probe
    * width — shared by q_ann_ivfpq (nprobe from conf, default 1) and the
    * registered q_ann_ivfpq_probe2 point of the recall/cost curve. The
    * trained coarse quantizer routes the query to its `nprobe` nearest
    * clusters (at scale: `cluster` is the partition key, the probe reads
    * nprobe clusters' files), candidates are ADC-scored (4 code lookups,
    * never a full-vector dot), the ADC top-10·nprobe pay the exact
    * rerank. Map + TakeOrdered; no window, no corpus shuffle. */
  private def ivfpqQuery(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    val iv = intVecs(s, d)
    val coarse = coarseModel(s, d)
    val assigned = iv
      .withColumn("cluster", graft.operators.KMeans.centArgmax(coarse))
    val q = assigned.filter(col("vec_id") === 0)
      .withColumn("qclusters", graft.operators.KMeans.centTopN(coarse, nprobe))
      .select(col("v").as("qv"), col("nv").as("nq"), col("qclusters"))
    val cand = assigned.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .filter(array_contains(col("qclusters"), col("cluster")))
    val coded = pqScored(cand, pqModelsFor(s, d))
    // rerank budget scales with the probe width (FAISS-style): nprobe
    // cells yield nprobe× candidates, so a FIXED ADC cut would dilute
    // recall as nprobe grows instead of trading cost for it
    val top = coded
      .select(col("vec_id") +: col("cluster") +: col("v") +: col("nv") +:
        col("nq") +: col("qv") +: col("adc") +:
        (0 until PqM).map(m => col(s"code$m")): _*)
      .orderBy(col("adc").desc, col("vec_id").asc).limit(10 * nprobe)
    top.select(col("vec_id"), col("cluster"), col("code0"), col("code1"),
        col("code2"), col("code3"), col("adc"),
        cosine(dotL("v", "qv"), col("nv"), col("nq")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc).limit(5)
  }

  /** Per-label 5-NN majority-vote flag census over a neighbor table —
    * the shared back half of q_label_noise (exact neighbors) and
    * q_label_noise_ann (multi-table LSH neighbors). Vectors absent from
    * `nbrs` (no candidate at all in the ANN path) are absent from the
    * census — the same absence semantics as the ANN kNN queries. */
  private def labelNoiseCensus(s: SparkSession, d: String,
                               nbrs: DataFrame): DataFrame = {
    val labels = t(s, d, "embeddings").select(col("vec_id"), col("label"))
    nbrs
      .join(labels.select(col("vec_id").as("nbr_id"),
        col("label").as("nbr_label")), "nbr_id")
      .join(labels.select(col("vec_id"), col("label").as("own_label")),
        "vec_id")
      .groupBy(col("vec_id"), col("own_label"))
      .agg(sum(when(col("nbr_label") === col("own_label"), 1L)
        .otherwise(0L)).as("agree"), count(lit(1)).as("kk"))
      .select(col("own_label"), (col("agree") * 2 < col("kk")).as("flagged"))
      .groupBy(col("own_label").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"))
      .select(col("label"), col("n_vecs"), col("n_flagged"),
        (col("n_flagged").cast("double") / col("n_vecs").cast("double"))
          .as("flag_rate"))
      .orderBy(col("label"))
  }

  private def topKNeighbors(s: SparkSession, pairs: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val topk = new graft.functions.TopKAggregator(k).toColumn
    pairs
      .select(explode(array(
        struct(col("ida").as("vid"), col("cos"), col("idb").as("nbr")),
        struct(col("idb").as("vid"), col("cos"), col("ida").as("nbr")))).as("e"))
      .select(col("e.vid"), col("e.cos"), col("e.nbr"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, c, n) => (c, n) }
      .agg(topk)
      .flatMap { case (vid, tops) =>
        tops.zipWithIndex.map { case ((c, n), i) => (vid, n, c, (i + 1).toLong) }
      }
      .toDF("vec_id", "nbr_id", "cos", "rnk")
      .orderBy(col("vec_id"), col("rnk"))
  }

  val queries: Map[String, QFn] = Map(

    // Symmetric int8 quantization of the embedding column — the 4× storage
    // cut a 100 TB vector corpus ships with. All arithmetic is EXACT:
    // vectors are ×1e6-scaled bigints (the library-wide convention), the
    // per-vector scale is the bigint abs-max, and round-half-up happens as
    // integer division ((2·127·|x| + s) div 2s) — no float ties, so the
    // DuckDB oracle reproduces bit-for-bit. Only the reported relative
    // reconstruction error takes one final double division. Pure map work,
    // no shuffle at any scale.
    "q_embed_quantize" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"), intVec("embedding").as("v"))
        .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
        .select(col("vec_id"), col("amax").as("scale"),
          expr("""transform(v, x -> cast(case
                   when amax = 0 then 0
                   when x >= 0 then (2*x*127 + amax) div (2*amax)
                   else -((2*(-x)*127 + amax) div (2*amax)) end as int))""").as("qvec"),
          col("v"))
        .withColumn("max_rel_err",
          when(col("scale") === 0, lit(0.0))
            .otherwise(expr("array_max(zip_with(v, qvec, (x, q) -> abs(127*x - q*scale)))")
              .cast("double") / (lit(127.0) * col("scale").cast("double"))))
        // the harness compares scalar columns — ship the int8 payload as CSV
        .select(col("vec_id"), col("scale"),
          concat_ws(",", col("qvec")).as("qvec_csv"), col("max_rel_err"))
        .orderBy(col("vec_id"))),

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

    // HYBRID retrieVAL — reciprocal-rank fusion of the two retrieval
    // paths the engine already has: BM25 over the text (TextOps'
    // bm25Scored, lexical) and cosine against the query vector
    // (semantic). Each path TakeOrders its own top-20 (distributed — no
    // global sort; the rank window then runs over the 20-row result),
    // and RRF combines them: score = Σ 1/(60 + rank), the standard
    // fusion that needs no score calibration between the two lists. A
    // doc in only one list keeps that list's term (the other
    // contributes 0). Modern RAG retrieval in one oracle-verified
    // query; everything is engine-deterministic, so the DuckDB twin
    // reproduces the fused ranking exactly.
    "q_hybrid_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bmTop = TextOps.bm25Scored(s, d)
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
        .withColumn("r_bm", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select(col("doc_id"), col("r_bm"))
      val vTop = intVecs(s, d).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(intVecs(s, d).filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("nv").as("nq"))))
        .select(col("vec_id"),
          cosine(dotL("v", "qv"), col("nv"), col("nq")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
        .withColumn("r_v", row_number().over(
          Window.orderBy(col("cos").desc, col("vec_id"))))
        .select(col("vec_id").as("doc_id"), col("r_v"))
      bmTop.join(vTop, Seq("doc_id"), "full")
        .select(col("doc_id"),
          (coalesce(lit(1.0) / (lit(60.0) + col("r_bm").cast("double")),
            lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("r_v").cast("double")),
              lit(0.0))).as("rrf"),
          col("r_bm").isNotNull.as("in_bm25"),
          col("r_v").isNotNull.as("in_vec"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
    }),

    // LSH-bucketed ANN: sign-random-projection bucket (4 planes default,
    // bit-width from graft.ann.lsh.planes at scale), candidates = same
    // bucket as the query, exact cosine rerank top-5.
    "q_ann_lsh" -> ((s, d) => {
      val iv = intVecs(s, d)
        .withColumn("bucket", bucketExpr("v", planesFor(s, d)))
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
    // only the query's cluster, exact rerank inside it. Assignment is pure
    // MAP work: the 8 centroids collapse into ONE array-valued row that is
    // broadcast onto the corpus (single-row BNLJ = row-count-preserving
    // map), and the argmax over the 8 cosines is an in-row
    // `array_max(transform(...))` over (cos, -cid) structs — max cos, ties
    // to the smallest cid. No Window, no corpus shuffle (PlanSpec pins
    // this): at 10⁹ vectors the old Window.partitionBy(vec_id) shape
    // shuffled N×8 rows purely to pick a per-row max. At scale the
    // assignment happens once at ingest and `cluster` becomes a partition
    // key — a query reads one cluster's files, not the corpus.
    "q_ann_ivf" -> ((s, d) => {
      val iv = intVecs(s, d)
      val cents = iv.filter(col("vec_id").between(1, 8))
        .agg(collect_list(struct(col("vec_id").as("cid"), col("v").as("cv"),
          col("nv").as("cn"))).as("cents"))
      val best = expr(
        """array_max(transform(cents, c -> named_struct(
          |  'cos', cast(graft_long_dot(v, c.cv) as double)
          |    / (sqrt(cast(nv as double)) * sqrt(cast(c.cn as double))),
          |  'negcid', -c.cid)))""".stripMargin)
      val assigned = iv.crossJoin(broadcast(cents))
        .withColumn("cluster", -best.getField("negcid"))
        .select(col("vec_id"), col("v"), col("nv"), col("cluster"))
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

    // Embedding-cosine near-duplicate pairs — EXACT, as a block-partitioned
    // equi-join rather than a single nested-loop join over the whole table.
    //
    // Why not LSH candidates: measured on this data (see SimilaritySpec),
    // the qualifying pairs sit at cos 0.40–0.63 (θ up to 66°), the vectors
    // are isotropic (8-centroid assignment radii ≈ 90°, centroid
    // separations ≈ 90°), and 4-plane sign-LSH buckets of qualifying pairs
    // span the FULL Hamming range 0..4 — no sub-quadratic candidate filter
    // (LSH, centroid blocking with angular triangle pruning) can keep
    // recall 1 at this threshold on this geometry. Exact all-pairs at low
    // cosine thresholds is inherently quadratic; the scalable fix is to
    // DISTRIBUTE the quadratic work evenly, not to pretend to prune it:
    //
    //   - every vector gets a block id (vec_id mod B);
    //   - side A replicates each vector to block-pair keys (blk, j≥blk),
    //     side B to keys (i≤blk, blk) — each unordered vector pair meets in
    //     EXACTLY one of the B(B+1)/2 keys;
    //   - the join is a shuffled EQUI-join on the key (no BNLJ, no
    //     cartesian); the threshold stays inside the join condition so
    //     losing pairs are never materialized;
    //   - per-task work is (N/B)² dots with bounded memory; at 100 TB you
    //     raise B so N/B stays constant — the canonical distributed
    //     all-pairs shape. The approximate scale path (when recall < 1 is
    //     acceptable) is q_embed_neardup_lsh below.
    "q_embed_neardup" -> ((s, d) => {
      val B = 8
      val iv = intVecs(s, d).withColumn("blk", pmod(col("vec_id"), lit(B)))
      val a = iv.select(col("vec_id").as("ida"), col("v").as("va"),
          col("nv").as("na"), col("blk").as("ba"),
          explode(expr(s"sequence(blk, ${B - 1})")).as("pj"))
        .withColumn("pk", col("ba") * B + col("pj"))
      val b = iv.select(col("vec_id").as("idb"), col("v").as("vb"),
          col("nv").as("nb"), col("blk").as("bb"),
          explode(expr("sequence(0, blk)")).as("pi"))
        .withColumn("pk", col("pi") * B + col("bb"))
      val cos = cosine(dotL("va", "vb"), col("na"), col("nb"))
      a.join(b, a("pk") === b("pk") &&
          (col("ba") < col("bb") || col("ida") < col("idb")) && cos >= 0.4)
        .select(least(col("ida"), col("idb")).as("vec_a"),
          greatest(col("ida"), col("idb")).as("vec_b"), cos.as("cos"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // One distributed Lloyd (k-means) iteration over the embedding corpus:
    // assign every vector to its max-cosine centroid (the SAME in-row
    // broadcast argmax as q_ann_ivf — pure map work, no shuffle), then
    // recompute per-cluster per-dimension means. The only shuffle is the
    // (cluster, dim)-keyed partial+final sum — integer sums, exact, with
    // map-side combine; this is the canonical distributed k-means step
    // that trains the IVF index at 100 TB (dims × clusters output rows,
    // independent of corpus size).
    "q_kmeans_step" -> ((s, d) => {
      // fan = false (r15): the single Lloyd step is loop-sized work — the
      // r14 bench showed the fanned scan REGRESSING it 0.47→0.91 (the same
      // task-floor trade that exempted the k-means training loops)
      val iv = intVecs(s, d, fan = false)
      val cents = iv.filter(col("vec_id").between(1, 8))
        .agg(collect_list(struct(col("vec_id").as("cid"), col("v").as("cv"),
          col("nv").as("cn"))).as("cents"))
      val best = expr(
        """array_max(transform(cents, c -> named_struct(
          |  'cos', cast(graft_long_dot(v, c.cv) as double)
          |    / (sqrt(cast(nv as double)) * sqrt(cast(c.cn as double))),
          |  'negcid', -c.cid)))""".stripMargin)
      iv.crossJoin(broadcast(cents))
        .withColumn("cluster", -best.getField("negcid"))
        .select(col("cluster"), posexplode(col("v")))
        .toDF("cluster", "pos", "x")
        .groupBy(col("cluster"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .select(col("cluster"), col("pos"), col("n"),
          (col("sx").cast("double") / col("n").cast("double")).as("mean"))
        .orderBy(col("cluster"), col("pos"))
    }),

    // IVF probe against TRAINED centroids — q_ann_ivf with the hardcoded
    // seed centroids replaced by the k-means model after 2 Lloyd updates
    // ([[graft.operators.KMeans.model]]): the full index story, train →
    // assign-at-ingest → probe one cluster. Assignment stays pure map
    // work (literal-centroid in-row argmax, same as q_ann_ivf's plan pin);
    // the integer-sum centroid identity keeps the trained model
    // oracle-exact.
    "q_ann_ivf_trained" -> ((s, d) => {
      val iv = intVecs(s, d)
      val cents = coarseModel(s, d)
      val assigned = iv
        .withColumn("cluster", graft.operators.KMeans.centArgmax(cents))
        .select(col("vec_id"), col("v"), col("nv"), col("cluster"))
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

    // RETRIEVAL-EVAL panel — recall@5 of each ANN family against the
    // exact brute-force top-5, AS A GATED QUERY (the q_ann_index_stats
    // "measurement as a query" theme): the recall/cost trade of every
    // index family is an oracle-verified artifact, not a spec-only
    // number. Composes the REGISTERED family queries verbatim (ivf
    // trained probe, LSH bucket, matryoshka prefix) so the panel can
    // never drift from what the engine actually serves; the exact
    // ground truth is ONE corpus pass whose top-5 ids are model-state
    // scale (collected, the MMR-pool precedent), and each leg is then a
    // 5-row aggregate. At 100 TB: the eval corpus pass is the one
    // deliberate full scan an index-quality audit pays. NOTE on the
    // numbers: the standard table's vectors are UNIFORM RANDOM, where
    // low ANN recall is the true answer (no neighborhood structure to
    // index — the panel honestly exposes it); the ≥0.8 recalls on
    // CLUSTERED data are measured in QueriesSpec on the planted-cluster
    // fixture. Watching this panel drop on real data is exactly the
    // signal it exists to produce.
    "q_ann_recall_panel" -> ((s, d) => {
      // exact ground truth from the MEMOIZED knn_neighbors asset (the
      // exact build q_ann_graph no longer pays — kept alive here and by
      // q_knn_join/q_label_noise as the quality reference): vec 0's rows
      // ARE its exact top-5 by the shared (cos DESC, nbr ASC) rule, so
      // the panel reads 5 rows of parquet instead of re-scoring the
      // corpus per invocation
      val exactIds = neighborTable(s, d)
        .filter(col("vec_id") === 0)
        .orderBy(col("rnk"))
        .collect().map(_.getAs[Long]("nbr_id")).toSeq
      def leg(family: String, res: DataFrame): DataFrame =
        res.select(col("vec_id"))
          .agg(sum(when(col("vec_id").isin(exactIds: _*), 1L).otherwise(0L))
            .as("h"))
          .select(lit(family).as("family"), lit(5L).as("k"),
            coalesce(col("h"), lit(0L)).as("hits"),
            (coalesce(col("h"), lit(0L)).cast("double") / lit(5.0))
              .as("recall"))
      // The five legs still compose the REGISTERED family queries verbatim
      // (the integrity property the panel exists for), but each leg's
      // frame is now BUILT AND MATERIALIZED on its own driver thread into
      // a cache the union then reads (guide §2.6 — the legs are
      // independent jobs, and the panel previously serialized them: the
      // graph walk's eager loop ran start-to-finish before any other
      // leg's first task, on a box with 31 idle cores). Job descriptions
      // are thread-local, so each leg labels its own jobs; results are
      // unchanged — the same five frames, just filled concurrently.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
      val legs =
        try {
          import scala.concurrent.{Await, ExecutionContext, Future}
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutorService(pool)
          def built(family: String, mk: => DataFrame) = Future {
            s.sparkContext.setJobDescription(s"q_ann_recall_panel: $family leg")
            val df = mk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            df.count()
            family -> df
          }
          Await.result(Future.sequence(Seq(
            built("ivf_trained", queries("q_ann_ivf_trained")(s, d)),
            built("lsh", queries("q_ann_lsh")(s, d)),
            built("prefix", queries("q_ann_prefix")(s, d)),
            built("graph", queries("q_ann_graph")(s, d)),
            // the NND index's own answer for the query: vec 0's top-5
            // list — the index-quality leg next to the walk that
            // searches it
            built("nnd_knn", queries("q_ann_nnd")(s, d)
              .filter(col("vec_id") === 0)
              .select(col("nbr_id").as("vec_id"))))),
            scala.concurrent.duration.Duration(10, "min"))
        } finally pool.shutdown()
      legs.map { case (f, df) => leg(f, df) }
        .reduce(_.unionByName(_))
        .orderBy(col("family"))
    }),

    // IVF INDEX-HEALTH panel — the operational dashboard a production
    // vector store watches next to the index itself: per-cluster
    // occupancy of the trained coarse quantizer, each cluster's corpus
    // share, and its imbalance factor (size / ideal size, k=8). Skewed
    // clusters are the IVF failure mode — a 10× cluster makes every
    // probe routed to it 10× more expensive and starves recall
    // elsewhere — so the panel is what triggers retraining. One in-row
    // assignment pass (literal-centroid argmax against the memoized
    // model) + ONE k-group aggregate; the 1-row total is a broadcast
    // scalar join. Map-side combined, no window, identical at 100 TB.
    "q_ann_index_stats" -> ((s, d) => {
      val iv = intVecs(s, d)
      val assigned = iv
        .withColumn("cluster", graft.operators.KMeans.centArgmax(coarseModel(s, d)))
      val tot = assigned.agg(count(lit(1)).as("n_total"))
      assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vecs"))
        .crossJoin(broadcast(tot))
        .select(col("cluster"), col("n_vecs"),
          (col("n_vecs").cast("double") / col("n_total").cast("double"))
            .as("share"),
          (col("n_vecs").cast("double") * lit(8.0) /
            col("n_total").cast("double")).as("imbalance"))
        .orderBy(col("cluster"))
    }),

    // PRODUCT-QUANTIZATION ANN (ADC probe + exact rerank) — the third
    // member of the index family (LSH buckets → IVF clusters → PQ codes),
    // the compression leg a vector store ships alongside coarse IVF
    // routing (Jégou et al., "Product Quantization for Nearest Neighbor
    // Search"). The 64-dim vector splits into 4 contiguous 16-dim
    // subspaces; each subspace trains its OWN k=4 spherical codebook via
    // [[graft.operators.KMeans.model]] (subspace Lloyd loops are
    // independent, so the per-sub calls ARE joint PQ training), and the
    // SAME integer-sum identity that keeps IVF training oracle-exact
    // (cos(v, s/n) = cos(v, s)) keeps every sub-codebook and the ADC
    // table exact. Every vector then compresses to 4 codes — a pure
    // in-row argmax against literal sub-centroids, no join/window/shuffle
    // over the corpus — and the query scores candidates by Asymmetric
    // Distance Computation: adc = Σ_m cos(q_m, c_m(code_m)), four lookups
    // into a 16-entry table instead of a 64-dim dot per pair. Top-20 ADC
    // candidates get an exact integer-cosine rerank to top-5. At 100 TB:
    // codebooks are 4×4×16 longs of model state; codes are computed once
    // at ingest and stored beside the parquet (4 bytes/vector — a 64×
    // read reduction for the probe, which scans codes only); the probe
    // plan is map + TakeOrdered, no corpus shuffle (PlanSpec pins it).
    "q_ann_pq" -> ((s, d) => {
      val iv = intVecs(s, d)
      val q = iv.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nv").as("nq"))
      val coded = pqScored(iv.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q)), pqModelsFor(s, d))
      val top = coded
        .select(col("vec_id") +: col("v") +: col("nv") +: col("nq") +:
          col("qv") +: col("adc") +:
          (0 until PqM).map(m => col(s"code$m")): _*)
        .orderBy(col("adc").desc, col("vec_id").asc).limit(20)
      top.select(col("vec_id"), col("code0"), col("code1"), col("code2"),
          col("code3"), col("adc"),
          cosine(dotL("v", "qv"), col("nv"), col("nq")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(5)
    }),

    // IVF-PQ — the two stages composed the way a production vector index
    // ships them (FAISS's IndexIVFPQ): the TRAINED coarse quantizer
    // routes the query to its nearest `nprobe` clusters (default 1 — the
    // registered/oracled configuration; `graft.ann.ivfpq.nprobe` raises
    // it, the standard FAISS recall/cost knob, measured in QueriesSpec —
    // at scale `cluster` is the partition key, so the probe reads nprobe
    // clusters' files), then candidates inside them are scored by the PQ
    // ADC table (4 code lookups, never a full-vector dot) and only the
    // ADC top-10 pay the exact integer-cosine rerank. Both models train
    // through the same integer-sum Lloyd identity, so the whole composed
    // index — router, codebooks, ADC, rerank — is oracle-exact at
    // nprobe=1 (the chained-CTE oracle replays coarse training, routing,
    // PQ training, ADC, and rerank). Probe plan: map (in-row assignment +
    // codes + ADC) → TakeOrdered; no window, no corpus shuffle (PlanSpec
    // pins it).
    "q_ann_ivfpq" -> ((s, d) =>
      ivfpqQuery(s, d, s.conf.get("graft.ann.ivfpq.nprobe", "1").toInt)),

    // The REGISTERED nprobe=2 point of the IVF-PQ recall/cost curve
    // (round-11 verdict #9): the knob and the QueriesSpec recall curve
    // existed; gating the second probe width makes the trade an
    // oracle-verified artifact instead of a spec-only claim. Router emits
    // the top-2 coarse clusters, candidates ~double, ADC budget widens to
    // 10·nprobe, output stays the exact top-5.
    "q_ann_ivfpq_probe2" -> ((s, d) => ivfpqQuery(s, d, nprobe = 2)),

    // PREFIX-DIMENSION ANN (truncated-dimension / "Matryoshka"-style
    // two-stage retrieval, Kusupati et al. 2022): rank the corpus by
    // cosine over the FIRST 16 of 64 dims, keep the top-50 prefix
    // candidates, exact full-dim rerank to top-5. The fourth index family
    // next to hashing (LSH), routing (IVF), and code compression (PQ):
    // no model at all — the "index" is a 4×-narrower COLUMN. At 100 TB
    // the prefix slice is stored as its own parquet column (or the
    // leading dims of a dim-ordered layout), so the candidate pass scans
    // 16/64 of the vector bytes with zero training, zero ingest compute,
    // and graceful recall (embeddings trained matryoshka-style
    // front-load variance into the prefix; measured recall on the
    // clustered fixture lives in QueriesSpec). Plan: map (in-row prefix
    // dot) → TakeOrdered(50) → map (full dot) → TakeOrdered(5); no
    // window, no corpus shuffle — candidates carry their full vector, so
    // the rerank needs NO join back to the corpus.
    "q_ann_prefix" -> ((s, d) => {
      val iv = intVecs(s, d)
        .withColumn("vp", expr("slice(v, 1, 16)"))
        .withColumn("np", normL("vp"))
      val q = iv.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nv").as("nq"),
          col("vp").as("qp"), col("np").as("nqp"))
      iv.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("v"), col("nv"), col("qv"), col("nq"),
          cosine(dotL("vp", "qp"), col("np"), col("nqp")).as("pcos"))
        .orderBy(col("pcos").desc, col("vec_id").asc).limit(50)
        .select(col("vec_id"), col("pcos"),
          cosine(dotL("v", "qv"), col("nv"), col("nq")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(5)
    }),

    // GRAPH-ANN retrieval (HNSW/NSG class — Malkov & Yashunin 2018): the
    // index family that dominates production vector serving, expressed
    // Spark-first as bounded frontier⋈edges equi-join rounds (the
    // q_bfs_reach discipline applied to a similarity graph). The GRAPH is
    // the memoized `knn_neighbors` asset — each corpus vector's exact
    // top-5 neighbors, the one-job-builds/many-jobs-read shape (a real
    // deployment builds the proximity graph offline exactly like this);
    // the ENTRY POINT is index state too: per coarse cell, the member
    // most aligned with its trained centroid (KMeans.centBestCos — the
    // medoid approximation), a k-row aggregate; the query routes to its
    // cell's entry via the literal-centroid argmax, then GREEDY BEAM
    // SEARCH runs 3 rounds: expand the frontier's graph neighbors
    // (equi-join into the N×5 edge table — at scale a point lookup into
    // a vec_id-bucketed parquet), drop already-visited ids (LEFT ANTI
    // against the ≤(1+5·beam·r)-row visited set), score survivors
    // against the query (equi-join to the vector table + 1-row broadcast
    // scalar join), keep the best `beam` as the next frontier. Every
    // join is frontier-bounded — the corpus is touched only by id-keyed
    // point lookups, never scanned, never shuffled; rounds are FIXED so
    // the DuckDB oracle replays the walk as chained CTEs. Output: top-5
    // of all scored nodes with the hop each was first reached at (each
    // id is scored exactly once, so hop is well-defined). Beam width via
    // graft.ann.graph.beam (the ivfpq-nprobe knob pattern; the oracle
    // replays the default). Recall vs the exact top-5 is a row in
    // q_ann_recall_panel, and ≥ the trained-IVF leg on the clustered
    // fixture (QueriesSpec) — the greedy walk reaches across Voronoi
    // boundaries the cell probe cannot.
    "q_ann_graph" -> ((s, d) => {
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val beam = s.conf.get("graft.ann.graph.beam", GraphBeam.toString).toInt
      // The walk is ≤(1+beam)·rounds TINY per-round stages — pure
      // orchestration latency under the session-width shuffle and AQE
      // stat jobs, so the PageRank/raking loop-session discipline
      // applies: clone the session, 1 shuffle partition, AQE off, and
      // read EVERY input directly in the clone (an RDD port from the
      // parent session would pay a row-encode round-trip per frame);
      // persist each round (its frame is read by the anti-join, the
      // frontier cut AND the final union — unpersisted lineage would
      // re-evaluate the whole walk ~3^r times), free superseded
      // predecessors eagerly. The persisted edge/vector frames are the
      // local stand-in for what production serves as vec_id-bucketed
      // index tables.
      val loopS = s.newSession()
      loopS.conf.set("spark.sql.shuffle.partitions", "1")
      loopS.conf.set("spark.sql.adaptive.enabled", "false")
      // the clone starts with a FRESH function registry — the scoring
      // expression (graft_long_dot) must be registered there explicitly
      // (Tables.load does it on first touch; this keeps it load-order-free)
      graft.expressions.GraftFunctions.register(loopS)
      // INDEX + SERVING STATE memoized per dataset (r15): the symmetrized
      // adjacency ([[graphEdgePath]] — HNSW links neighbors
      // bidirectionally; reverse edges make the kNN digraph navigable, and
      // vec 0 is the query, searched not indexed), the per-cell entry
      // points ([[graphEntryPoints]]) and the query row
      // ([[graphQueryState]]) were all rebuilt from corpus scans on EVERY
      // invocation; each is index state a production graph store serves,
      // so each gets the established asset discipline. Cell routing is a
      // map lookup on the k-row entry state; an empty cell keeps the old
      // empty-entry semantics (the walk starts, and stays, empty).
      val (qv, nq, qcl) = graphQueryState(s, d)
      val entry = graphEntryPoints(s, d).get(qcl) match {
        case Some(id) => loopS.range(1).select(lit(id).as("vec_id"))
        case None     => loopS.range(0).select(col("id").as("vec_id"))
      }
      val edges = loopS.read.parquet(graphEdgePath(s, d))
        .persist(MEMORY_AND_DISK)
      val vecs = intVecs(loopS, d).select(col("vec_id"), col("v"), col("nv"))
        .persist(MEMORY_AND_DISK)
      var visited = graphScore(entry, vecs, qv, nq, 0L)
        .persist(MEMORY_AND_DISK)
      var frontier = visited.select(col("vec_id"))
      for (r <- 1 to GraphRounds) {
        val scored = graphRound(edges, frontier, visited, vecs, qv, nq,
          r.toLong).persist(MEMORY_AND_DISK)
        // no eager count: the single final action fills each round's
        // cache on first touch (persist alone de-duplicates the ~3^r
        // lineage references); visited stays a LAZY union over the
        // per-round caches (≤171 rows total) — re-caching the union
        // each round would pay a persist for data already cached
        // piecewise
        visited = visited.unionByName(scored)
        if (r < GraphRounds)
          frontier = scored.orderBy(col("cos").desc, col("vec_id").asc)
            .limit(beam).select(col("vec_id"))
      }
      // ONE eager pass materializes the whole walk (every round cache
      // fills here); the index stand-ins are then dead weight — freed
      // now, so only the ≤171-row round caches feed the returned plan
      // (those are swept by the harness settle after consumption)
      visited.count()
      edges.unpersist(blocking = false)
      vecs.unpersist(blocking = false)
      visited.orderBy(col("cos").desc, col("vec_id").asc).limit(5)
        .select(col("vec_id"), col("hop"), col("cos"))
    }),

    // LATE-INTERACTION retrieval (ColBERT maxsim, Khattab & Zaharia
    // 2020): documents and queries are MULTI-vector — here the 64-dim
    // embedding read as 4 contiguous 16-dim "token" sub-vectors (the PQ
    // geometry, reused) — and score(q, doc) = Σ over q's sub-vectors of
    // the MAX cosine against any of doc's sub-vectors. The shape that
    // beats single-vector retrieval on long documents, and the third
    // retrieval scorer next to BM25 (lexical) and whole-vector cosine
    // (semantic). Plan at 100 TB: the query batch (|Q|×4 sub-vectors) is
    // a broadcast literal, so scoring is ONE corpus pass computing the
    // 4×4 dot grid IN-ROW (sub-norms precomputed per side, never per
    // pair), maxsim = greatest(), and the top-5 per query flows through
    // the bounded TopKAggregator — no corpus shuffle, no window; at real
    // scale the corpus pass sits behind any ANN candidate filter in this
    // file. Double discipline: max() is order-free and the 4-term sum is
    // an explicit left fold, matching the oracle's parenthesized pivot.
    "q_colbert_maxsim" -> ((s, d) => {
      import s.implicits._
      def subNorms(df: DataFrame, vc: String, pre: String): DataFrame =
        (0 until PqM).foldLeft(df) { (acc, m) =>
          val sl = s"slice($vc, ${m * PqSub + 1}, $PqSub)"
          acc.withColumn(s"$pre$m", expr(s"graft_long_dot($sl, $sl)"))
        }
      val subs = t(s, d, "embeddings")
        .select(col("vec_id"), intVec("embedding").as("v"))
      val corpus = subNorms(subs, "v", "nd")
      val qs = subNorms(subs.filter(col("vec_id").isin(1L, 2L, 3L))
        .select(col("vec_id").as("qid"), col("v").as("qv")), "qv", "nq")
      val scored = corpus
        .join(broadcast(qs), col("vec_id") =!= col("qid"))
        .withColumn("score",
          (0 until PqM).map { mq =>
            val qsl = s"slice(qv, ${mq * PqSub + 1}, $PqSub)"
            greatest((0 until PqM).map { md =>
              val dsl = s"slice(v, ${md * PqSub + 1}, $PqSub)"
              expr(s"cast(graft_long_dot($qsl, $dsl) as double)") /
                (sqrt(col(s"nq$mq").cast("double")) *
                  sqrt(col(s"nd$md").cast("double")))
            }: _*)
          }.reduce(_ + _))
      val topk = new graft.functions.TopKAggregator(5).toColumn
      scored.select(col("qid"), col("score"), col("vec_id"))
        .as[(Long, Double, Long)]
        .groupByKey(_._1).mapValues { case (_, sc, id) => (sc, id) }
        .agg(topk)
        .flatMap { case (qid, tops) =>
          tops.zipWithIndex.map { case ((sc, id), i) =>
            (qid, id, sc, (i + 1).toLong)
          }
        }
        .toDF("qid", "vec_id", "score", "rnk")
        .orderBy(col("qid"), col("rnk"))
    }),

    // The k-means TRAINING LOOP (3 Lloyd rounds) — q_kmeans_step iterated,
    // via [[graft.operators.KMeans]]: per-round assignment is in-row
    // literal-centroid argmax (pure map, no shuffle), the update is a
    // (cluster, dim)-keyed integer sum collected as k×d model state, and
    // the integer-sum centroid identity (cos(v, s/n) = cos(v, s)) keeps
    // every round exact — the DuckDB oracle replays all 3 rounds as
    // chained CTEs and matches bit-for-bit. Empty clusters keep their
    // previous centroid. This trains the IVF index q_ann_ivf probes.
    "q_kmeans_train" -> ((s, d) =>
      graft.operators.KMeans.train(intVecs(s, d, fan = false), (1L to 8L).toSeq,
        iters = 3)),

    // CORESET SELECTION — k-center greedy / farthest-point sampling (the
    // classical 2-approximation to the k-center cover, Gonzalez 1985; the
    // diverse-subset primitive behind data-pruning recipes that keep a
    // maximally spread representative sample instead of a uniform draw).
    // Seed = min vec_id; each of the K−1 rounds picks the vector FARTHEST
    // from the selected set (max over the corpus of min-over-selected
    // distance, ties to the smaller id) and reports that distance — the
    // sequence of picked radii is the coverage-radius curve. Exactness:
    // distances are whole-integer ‖a−b‖² = na + nb − 2·dot over the ×1e6
    // scaled vectors (no float ordering ambiguity in either engine).
    // Scale shape: K−1 corpus passes, each ONE codegen'd projection
    // (min over ≤K literal-center LongDots — the centArgmax discipline)
    // + a TakeOrdered(1); selected state is K rows of collected model
    // state (the KMeans k×d precedent). The DuckDB oracle replays every
    // round as chained CTEs, bit-for-bit.
    "q_coreset" -> ((s, d) => {
      import s.implicits._
      val vecs = intVecs(s, d).select(col("vec_id"), col("v"), col("nv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seed = vecs.orderBy(col("vec_id")).limit(1).collect()
      if (seed.isEmpty)
        Seq.empty[(Long, Long, Long)].toDF("rnk", "vec_id", "mind")
      else {
        var sel = Vector((seed(0).getLong(0),
          seed(0).getSeq[Long](1).toArray, seed(0).getLong(2)))
        var picks = Vector((1L, sel(0)._1, 0L))
        var k = 2
        var exhausted = false
        while (k <= CoresetK && !exhausted) {
          val mind = sel.map { case (_, cv, nc) =>
            col("nv") + lit(nc) - lit(2L) *
              expr(s"graft_long_dot(v, ${cv.mkString("array(", "L, ", "L)")})")
          }.reduce(least(_, _))
          val row = vecs
            .filter(!col("vec_id").isin(sel.map(_._1): _*))
            .select(col("vec_id"), col("v"), col("nv"), mind.as("mind"))
            .orderBy(col("mind").desc, col("vec_id")).limit(1).collect()
          if (row.isEmpty) exhausted = true
          else {
            sel = sel :+ ((row(0).getLong(0),
              row(0).getSeq[Long](1).toArray, row(0).getLong(2)))
            picks = picks :+ ((k.toLong, row(0).getLong(0),
              row(0).getAs[Long]("mind")))
            k += 1
          }
        }
        picks.toDF("rnk", "vec_id", "mind").orderBy(col("rnk"))
      }
    }),

    // kNN self-join: every vector's top-3 cosine neighbors. Exact kNN is
    // inherently all-pairs (same geometry argument as q_embed_neardup
    // above — no candidate filter keeps recall 1 here), so the pair
    // generation reuses the block-partitioned equi-join: quadratic work
    // distributed over B(B+1)/2 keys, never a BNLJ/cartesian. The per-key
    // top-3 then uses the typed [[graft.functions.TopKAggregator]] — a
    // bounded partial aggregate, so the post-pair shuffle carries at most
    // k rows per (vector × map task) instead of the window route's full
    // N×(N-1) row sort. At 100 TB: raise B for the pair stage, and the
    // top-k shuffle width stays N×k. The approximate scale path swaps the
    // block join for LSH/IVF candidates (q_ann_lsh / q_ann_ivf machinery).
    "q_knn_join" -> ((s, d) => {
      // SCALE GUARD (same discipline as q_dedup_ngram, Dedup.scala): this
      // is the exact all-pairs baseline — O(N²) dot products no matter how
      // evenly the block join spreads them. Refuse corpus-scale inputs
      // unless the caller explicitly raises the bound; the production twin
      // is q_knn_join_ann (LSH candidates, same bounded top-k tail).
      val maxVecs = s.conf.get("graft.knn.exact.maxVecs", "100000").toLong
      // Count cached per dataset dir: the guard runs at query-build time,
      // and an uncached count() here would add a full table scan (an eager
      // driver-blocking job) to EVERY build even when the guard passes.
      val nVecs = vecCount.getOrElseUpdate(d, t(s, d, "embeddings").count())
      require(nVecs <= maxVecs,
        s"q_knn_join is the exact all-pairs kNN baseline: $nVecs vectors " +
          s"exceed the guard ($maxVecs). Use q_knn_join_ann at corpus scale, " +
          "or raise graft.knn.exact.maxVecs explicitly.")
      // rnk ≤ 3 of the memoized top-5 asset IS TopKAggregator(3): the
      // aggregator's (cos DESC, nbr ASC) order is total, so a k-prefix is
      // rank-stable — one aggregation pass serves both exact-kNN queries.
      neighborTable(s, d).filter(col("rnk") <= 3)
        .orderBy(col("vec_id"), col("rnk"))
    }),

    // LABEL-NOISE audit (confident-learning style): flag every vector
    // whose own label loses the majority vote of its 5 nearest neighbors
    // — the standard geometric screen for mislabeled training examples
    // before a classifier ever sees them. Neighbors come from the same
    // exact scorer as q_knn_join (integer dots → deterministic ties →
    // the oracle reproduces the neighbor sets bit-for-bit), labels
    // arrive by two vec_id equi-joins (corpus-scale safe; at 100 TB the
    // candidate generator swaps to the ANN machinery like
    // q_knn_join_ann, same downstream shape). Output is the per-label
    // audit panel: how many vectors, how many flagged, the flag rate.
    // On the standard synthetic table labels are geometry-independent,
    // so the panel correctly reports ~everything flagged (flag_rate ≈
    // 0.96-1.0 — exactly the "these labels carry no signal" diagnosis);
    // the mechanism itself is proven in QueriesSpec on a clustered
    // fixture where it flags exactly five planted label flips.
    "q_label_noise" -> ((s, d) => {
      val maxVecs = s.conf.get("graft.knn.exact.maxVecs", "100000").toLong
      val nVecs = vecCount.getOrElseUpdate(d, t(s, d, "embeddings").count())
      require(nVecs <= maxVecs,
        s"q_label_noise scores exact all-pairs kNN: $nVecs vectors exceed " +
          s"the guard ($maxVecs). Swap in ANN candidates at corpus scale, " +
          "or raise graft.knn.exact.maxVecs explicitly.")
      labelNoiseCensus(s, d, neighborTable(s, d))
    }),

    // The AT-SCALE twin of q_label_noise — the documented ANN swap,
    // demonstrated: neighbors come from the multi-table LSH candidate
    // machinery (same [[mtPairs]] as q_knn_join_ann_multi, recall ≥ 0.8
    // on clustered vectors per QueriesSpec) instead of the guarded
    // exact all-pairs scorer; the flag census is the identical shared
    // back half. Vectors with no candidate in any table are absent —
    // the same absence semantics as the ANN kNN queries.
    "q_label_noise_ann" -> ((s, d) =>
      labelNoiseCensus(s, d, topKNeighbors(s, mtPairs(s, d), 5))),

    // HARD-NEGATIVE mining for contrastive training — every vector's
    // top-2 most-similar vectors carrying a DIFFERENT label: the batch
    // construction that makes embedding fine-tuning work (DPR/SimCSE
    // style — high-cosine wrong-label examples carry the gradient signal
    // random negatives don't; the random-draw counterpart is
    // q_negative_sample in Sampling). Candidates come from the shared
    // multi-table LSH machinery (mtPairs — the at-scale path, recall
    // measured in QueriesSpec); the different-label filter runs BEFORE
    // the bounded top-k, so the TopKAggregator shuffle still carries
    // ≤ k rows per (vector × task) and nothing is globally sorted.
    // Deterministic planes + exact integer cosines → the oracle replays
    // candidates and the (cos DESC, nbr ASC) tie rule bit-for-bit.
    "q_hard_negatives" -> ((s, d) => {
      import s.implicits._
      val labels = t(s, d, "embeddings").select(col("vec_id"), col("label"))
      val sym = mtPairs(s, d)
        .select(explode(array(
          struct(col("ida").as("vid"), col("cos"), col("idb").as("nbr")),
          struct(col("idb").as("vid"), col("cos"), col("ida").as("nbr")))).as("e"))
        .select(col("e.vid").as("vec_id"), col("e.cos").as("cos"),
          col("e.nbr").as("nbr_id"))
        .join(labels.select(col("vec_id").as("nbr_id"),
          col("label").as("nbr_label")), "nbr_id")
        .join(labels.select(col("vec_id"), col("label").as("own_label")),
          "vec_id")
        .filter(col("own_label") =!= col("nbr_label"))
      val topk = new graft.functions.TopKAggregator(2).toColumn
      sym.select(col("vec_id"), col("cos"), col("nbr_id"))
        .as[(Long, Double, Long)]
        .groupByKey(_._1)
        .mapValues { case (_, c, n) => (c, n) }
        .agg(topk)
        .flatMap { case (vid, tops) =>
          tops.zipWithIndex.map { case ((c, n), i) => (vid, n, c, (i + 1).toLong) }
        }
        .toDF("vec_id", "nbr_id", "cos", "rnk")
        .join(labels.select(col("vec_id"), col("label").as("own_label")), "vec_id")
        .join(labels.select(col("vec_id").as("nbr_id"),
          col("label").as("nbr_label")), "nbr_id")
        .select(col("vec_id"), col("own_label"), col("nbr_id"),
          col("nbr_label"), col("cos"), col("rnk"))
        .orderBy(col("vec_id"), col("rnk"))
    }),

    // MMR DIVERSITY RERANK — maximal marginal relevance (Carbonell &
    // Goldstein '98), the standard RAG-serving rerank: from each query's
    // top-8 relevance pool, greedily pick 3 results maximizing
    // 0.7·rel − 0.3·max-sim-to-already-picked, so near-duplicate hits
    // can't crowd the answer set. Execution shape: queries are a FIXED
    // |Q|=10 request batch (MmrQIds — constant at every scale, exactly
    // like a production serving batch), so relevance scoring is one
    // O(N) corpus pass against a constant-size broadcast —
    // embarrassingly parallel at 100 TB — and the bounded
    // TopKAggregator keeps 8 candidates per query with ≤8 rows per
    // (query × map task) of shuffle. Everything after the pool is
    // pool-sized (|Q|·8 rows) — request-batch-scale MODEL STATE, so the
    // greedy runs locally on the collected pool (the KMeans k×d collect
    // precedent) instead of paying MmrK−1 rounds of Spark scheduling
    // latency on 80-row frames. Deterministic: exact integer cosines,
    // (score DESC, cand ASC) tie rule, the identical IEEE expression
    // shapes — the unrolled DuckDB oracle replays every pick
    // bit-for-bit.
    "q_mmr_rerank" -> ((s, d) => {
      import s.implicits._
      val iv = intVecs(s, d)
      val q = iv.filter(col("vec_id").isin(MmrQIds: _*))
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nv").as("nq"))
      val rel = iv.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cand"),
          cosine(dotL("v", "qv"), col("nv"), col("nq")).as("rel"))
      val topk = new graft.functions.TopKAggregator(MmrPool).toColumn
      val pool = rel.as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues { case (_, c, r) => (r, c) }
        .agg(topk)
        .flatMap { case (qid, tops) => tops.map { case (r, c) => (qid, c, r) } }
        .toDF("qid", "cand", "rel")
      // BOUNDED MODEL-STATE COLLECT (the KMeans k×d precedent): the pool
      // is |Q|·MmrPool rows BY CONSTRUCTION (|Q| a fixed request batch,
      // MmrPool = 8), i.e. serving-request-sized, independent of corpus
      // size — so the greedy tail runs locally in one pass instead of
      // MmrK−1 rounds of pool-sized Spark jobs whose cost was pure
      // scheduling latency. Arithmetic is the exact expression shapes the
      // distributed rounds used (dot→double / (sqrt·sqrt), 0.7·rel −
      // 0.3·maxsim, score DESC / cand ASC ties), so the unrolled DuckDB
      // oracle still replays every pick bit-for-bit. At 100 TB the
      // distributed parts — ONE corpus pass against the broadcast batch
      // and the bounded TopKAggregator — are unchanged.
      val poolRows = pool.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val candIds = poolRows.map(_._2).distinct.toSeq
      val vecs =
        if (candIds.isEmpty) Map.empty[Long, (Array[Long], Long)]
        else iv.filter(col("vec_id").isin(candIds: _*))
          .select(col("vec_id"), col("v"), col("nv")).collect()
          .map(r => r.getLong(0) ->
            (r.getSeq[Long](1).toArray, r.getLong(2))).toMap
      def cosL(a: Long, b: Long): Double = {
        val (va, na) = vecs(a); val (vb, nb) = vecs(b)
        var dot = 0L; var i = 0
        while (i < va.length) { dot += va(i) * vb(i); i += 1 }
        dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      }
      val picks = poolRows.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        val cands = rows.map { case (_, c, r) => (c, r) }.toSeq
        var selected = Vector.empty[(Long, Double, Double)] // (sel, rel, score)
        for (_ <- 1 to MmrK) {
          val remaining = cands.filterNot { case (c, _) =>
            selected.exists(_._1 == c) }
          if (remaining.nonEmpty) {
            val scoredK = remaining.map { case (c, r) =>
              val score =
                if (selected.isEmpty) r
                else MmrLam * r - MmrDivW * selected.map(sl => cosL(c, sl._1)).max
              (c, r, score)
            }
            selected = selected :+ scoredK.minBy { case (c, _, sc) => (-sc, c) }
          }
        }
        selected.zipWithIndex.map { case ((c, r, sc), i) =>
          (qid, (i + 1).toLong, c, r, sc) }
      }.sortBy { case (qid, rnk, _, _, _) => (qid, rnk) }
      picks.toDF("query_id", "rnk", "vec_id", "rel", "score")
    }),

    // JOHNSON-LINDENSTRAUSS RANDOM PROJECTION — 64 → 16 dims against a
    // seeded ±1 sign matrix (Achlioptas '01: database-friendly random
    // projections; the signs are spec-stable literals shared verbatim
    // with the oracle, the mtSigns discipline). Each output coordinate
    // is ONE codegen'd graft_long_dot against a literal plane — exact
    // integer math, 16 dots per row, pure map work: no shuffle at any
    // scale, and at 100 TB this is the 4× I/O cut you take BEFORE the
    // ANN index (project at ingest, store both). `distortion` =
    // ‖y‖²/(16·‖v‖²), expected 1 under JL — the in-row self-audit; the
    // concentration property (pairwise, not just norms) is measured in
    // QueriesSpec.
    "q_jl_project" -> ((s, d) => {
      // fan = false (r15): 16 literal dots per row is light next to the
      // fan-out exchange of the vector column (r14 bench: 0.43→0.63
      // regressed under the fan; this restores the 1-task scan)
      val iv = intVecs(s, d, fan = false)
      val proj = array((0 until JlOut).map(r => dotL("v", jlPlaneLit(r))): _*)
      iv.withColumn("y", proj)
        .select(col("vec_id"), col("nv"),
          expr("aggregate(y, 0L, (acc, x) -> acc + x * x)").as("nproj"),
          concat_ws(",", col("y")).as("proj_csv"))
        .withColumn("distortion", col("nproj").cast("double") /
          (lit(JlOut.toDouble) * col("nv").cast("double")))
        .select(col("vec_id"), col("proj_csv"), col("nv"), col("nproj"),
          col("distortion"))
        .orderBy(col("vec_id"))
    }),

    // APPROXIMATE kNN self-join — the at-scale twin of q_knn_join: the
    // quadratic block join is replaced by multi-probe sign-LSH CANDIDATE
    // pairs (buckets equal or Hamming-1 apart, same probe scheme as
    // q_embed_neardup_lsh — each candidate pair matches exactly one probe
    // mask, so every pair's dot is computed ONCE), then the same bounded
    // [[graft.functions.TopKAggregator]] keeps each vector's top-3 among
    // its candidates. Compute is |candidate pairs| dots ≈ N²/2^planes on
    // isotropic data — tuned by adding planes — instead of N²/2; the
    // shuffle stays ≤ k rows per (vector × map task). Deterministic
    // candidates → the DuckDB oracle reproduces the result exactly;
    // recall vs the exact q_knn_join is measured in QueriesSpec. Vectors
    // with NO candidate in their probed buckets are absent from the
    // output (recall loss, visible in the measured number) — at scale you
    // add probes/tables until the miss rate is acceptable.
    "q_knn_join_ann" -> ((s, d) => {
      val planes = planesFor(s, d)
      val iv = intVecs(s, d).withColumn("bucket", bucketExpr("v", planes))
      val a = iv.select(col("vec_id").as("ida"), col("v").as("va"),
        col("nv").as("na"), col("bucket").as("bka"))
      val b = iv.select(col("vec_id").as("idb"), col("v").as("vb"),
          col("nv").as("nb"),
          explode(expr(
            s"transform(${probeMasksLit(planes)}, m -> bucket ^ m)")).as("pb"))
      val cos = cosine(dotL("va", "vb"), col("na"), col("nb"))
      val pairs = a.join(b, col("bka") === col("pb") && col("ida") < col("idb"))
        .select(col("ida"), col("idb"), cos.as("cos"))
      topKNeighbors(s, pairs, 3)
    }),

    // MULTI-TABLE LSH kNN join — the recall lever the single-table probe
    // scheme can't reach: L=4 INDEPENDENT plane sets (seeded-deterministic
    // ±1 signs, shared verbatim with the oracle as literals), one 4-bit
    // bucket per table, candidates = pairs sharing a bucket in ANY table.
    // Standard LSH amplification: a near pair missing one table's bucket
    // still collides in another (miss rate ε^L instead of ε), which is
    // what lifts top-k recall to ≥0.8 on clustered (real-corpus-shaped)
    // vectors — measured in QueriesSpec on a SemDeDup-style fixture.
    // Execution shape at 100 TB: buckets are computed once per vector
    // (map-side, codegen'd LongDot per plane); per-table candidate
    // generation is an EQUI-join on (table, bucket); the union is
    // deduped on the bare (ida, idb) PAIR KEY while still id-only
    // (16 bytes/row) so each surviving pair's exact dot is computed ONCE
    // after a shuffle-by-id vector fetch. Deterministic end-to-end → the
    // DuckDB oracle replays the same planes and matches bit-for-bit.
    // More tables or more bits/table tune the recall/cost point without
    // touching the shape.
    "q_knn_join_ann_multi" -> ((s, d) =>
      topKNeighbors(s, mtPairs(s, d), 3)),

    // The NN-DESCENT index itself as a GATE ROW: the (vec_id, nbr_id,
    // cos, rnk ≤ 5) proximity-graph asset q_ann_graph walks — registered
    // so the index BUILD (multi-table LSH init → one neighbor-of-neighbor
    // refinement round scoring only fresh pairs → re-rank under the
    // (cos DESC, nbr ASC) total order) is oracle-certified directly, not
    // only through the walk that consumes it. Probes read the memoized
    // parquet; the build runs once per JVM per geometry (assets_s).
    "q_ann_nnd" -> ((s, d) =>
      nndNeighborTable(s, d).orderBy(col("vec_id"), col("rnk"))),

    // Approximate near-dup via LSH candidates + exact rerank — the scale
    // path when recall < 1 is acceptable. Candidates = pairs whose
    // sign-random-projection buckets are equal or Hamming-1 apart
    // (multi-probe): side B explodes each vector to its 5 probe buckets
    // {bucket ⊕ m : m ∈ 0,1,2,4,8}, the join is an EQUI-join on
    // (a.bucket = b.probe) — each qualifying pair matches exactly one probe
    // mask, so no dedup pass is needed. The candidate set is
    // deterministic, so the DuckDB oracle reproduces it exactly; recall vs
    // the exact query is measured in QueriesSpec (~54% at cos≥0.4 on
    // this isotropic data, asserted ≥ 0.5). TEACHING BASELINE — like the
    // guarded q_knn_join, this single-table variant exists to make the
    // recall/cost trade measurable; the query to RUN at scale is
    // q_embed_neardup_lsh_multi (L=4 independent tables, same shape,
    // recall ≥ 0.8 asserted on the clustered fixture).
    "q_embed_neardup_lsh" -> ((s, d) => {
      val planes = planesFor(s, d)
      val iv = intVecs(s, d).withColumn("bucket", bucketExpr("v", planes))
      val a = iv.select(col("vec_id").as("vec_a"), col("v").as("va"),
        col("nv").as("na"), col("bucket").as("bka"))
      val b = iv.select(col("vec_id").as("vec_b"), col("v").as("vb"),
          col("nv").as("nb"),
          explode(expr(
            s"transform(${probeMasksLit(planes)}, m -> bucket ^ m)")).as("pb"))
      val cos = cosine(dotL("va", "vb"), col("na"), col("nb"))
      a.join(b, col("bka") === col("pb") && col("vec_a") < col("vec_b") && cos >= 0.4)
        .select(col("vec_a"), col("vec_b"), cos.as("cos"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Multi-table LSH near-dup — q_embed_neardup_lsh's recall lever, same
    // L=4 independent tables as q_knn_join_ann_multi: candidates = pairs
    // sharing a bucket in ANY table (deduped on the pair key while
    // id-only), exact cos ≥ 0.4 rerank — so emitted pairs are always TRUE
    // near-dups and only recall varies with the table count. Measured in
    // QueriesSpec on the clustered fixture alongside the kNN variant.
    "q_embed_neardup_lsh_multi" -> ((s, d) => {
      val bk = mtBucketTable(s, d)
      val cands = bk.select(col("vec_id").as("vec_a"), col("l"), col("bucket"))
        .join(bk.select(col("vec_id").as("vec_b"), col("l"), col("bucket")),
          Seq("l", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b")).distinct()
      val iv = intVecs(s, d)
      val va = iv.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nv").as("na"))
      val vb = iv.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nv").as("nb"))
      cands.join(va, "vec_a").join(vb, "vec_b")
        .select(col("vec_a"), col("vec_b"),
          cosine(dotL("va", "vb"), col("na"), col("nb")).as("cos"))
        .filter(col("cos") >= 0.4)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // SEMANTIC dedup (SemDeDup, Abbas et al. 2023): k-means-cluster the
    // embedding space, then near-dup prune WITHIN clusters only — drop
    // vector b iff some lower-id vector in b's cluster has cos ≥ τ. The
    // clustering bounds pair generation to Σ|cluster|² instead of N²: at
    // 100 TB you raise k with the corpus (k ≈ N / target-cluster-size,
    // the SemDeDup recipe), so per-cluster pair work stays constant and
    // each cluster's self-join is an EQUI-join on the cluster id — no
    // all-pairs stage anywhere. Assignment reuses the TRAINED k-means
    // model (2 Lloyd updates, the q_ann_ivf_trained machinery): pure map
    // argmax against literal centroids, so the only shuffles are the
    // cluster-keyed join and the dup-id distinct. Deterministic model +
    // deterministic drop rule → the DuckDB oracle replays training and
    // reproduces the verdict bit-for-bit.
    "q_semantic_dedup" -> ((s, d) =>
      semanticVerdict(s, d).orderBy(col("vec_id"))),

    // CORPUS CARTOGRAPHY (the data-map panel): label each trained
    // k-means cluster of the embedding space with its top-3
    // distinguishing TERMS — cluster-level TF-IDF over the documents
    // joined by vec_id = doc_id (the corpus convention). tf counts a
    // term's occurrences inside the cluster, df counts how many of the
    // k=8 clusters carry the term, score = tf·ln(k/df); terms in every
    // cluster are dropped up front (ln(k/k) = 0 — they distinguish
    // nothing). RANKING runs on exact DECIMAL products of tf and the 7
    // idf values embedded as shared literals (idfLits — the calibration
    // thresholds discipline): ln(8), ln(4), ln(2) are rationally
    // related, so live-libm scoring can REAL-tie across different
    // (tf, df) pairs and a 1-ulp ln() disagreement would flip the rank
    // cut between engines; the literal products make the order
    // bit-identical by construction. The ranking window is partitioned
    // by cluster over the SCORED VOCABULARY — vocab-bounded frames,
    // corpus-orders smaller than the document table (the q_tfidf
    // discipline). Training is the memoized coarse quantizer
    // (assignment = in-row literal-centroid argmax, no join); the
    // oracle replays Lloyd via the shared kmPrefix/kmRoundCtes chain.
    // The panel every corpus curation writeup ships: what IS each
    // region of the embedding space about.
    "q_cluster_topics" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val assigned = intVecs(s, d)
        .withColumn("cluster", graft.operators.KMeans.centArgmax(coarseModel(s, d)))
        .select(col("vec_id").as("doc_id"), col("cluster"))
      // BIGRAM terms: the fixture's unigram vocabulary is 31 tokens, all
      // present in every cluster (df = k for every term — an honest
      // empty panel); bigrams carry the distinguishing phrases
      val tok = t(s, d, "documents")
        .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 1), i -> " +
            "concat_ws(' ', element_at(w, i), element_at(w, i+1)))")).as("term"))
      val ct = tok.join(assigned, "doc_id")
        .groupBy(col("cluster"), col("term")).agg(count(lit(1)).as("tf"))
      val dfx = ct.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val byCluster = Window.partitionBy(col("cluster"))
        .orderBy(col("score_d").desc, col("term").asc)
      ct.join(dfx, "term").filter(col("df") < 8)
        .withColumn("score_d", expr(s"CAST(tf AS DECIMAL(20, 0)) * ($idfCase)"))
        .withColumn("rnk", row_number().over(byCluster).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("cluster"), col("term"), col("tf"), col("df"),
          col("score_d").cast("double").as("score"), col("rnk"))
        .orderBy(col("cluster"), col("rnk"))
    }),

    // END-TO-END vector-corpus build — the embedding-side capstone
    // mirroring q_pipeline_corpus: semantic-dedup the space (trained
    // k-means clusters, within-cluster cos prune), keep the survivors,
    // and emit them int8-QUANTIZED with their cluster id — exactly the
    // artifact an ANN index or training job consumes (4× smaller
    // payload, cluster = IVF partition key at ingest). One composition,
    // one oracle; the join on vec_id is the only stage added to the two
    // proven pipelines.
    "q_pipeline_vectors" -> ((s, d) => {
      val kept = semanticVerdict(s, d).filter(!col("is_dup"))
        .select(col("vec_id"), col("cluster"))
      val qv = t(s, d, "embeddings")
        .select(col("vec_id"), intVec("embedding").as("v"))
        .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
        .select(col("vec_id"), col("amax").as("scale"),
          expr("""transform(v, x -> cast(case
                   when amax = 0 then 0
                   when x >= 0 then (2*x*127 + amax) div (2*amax)
                   else -((2*(-x)*127 + amax) div (2*amax)) end as int))""").as("qvec"))
        .select(col("vec_id"), col("scale"), concat_ws(",", col("qvec")).as("qvec_csv"))
      kept.join(qv, "vec_id")
        .select(col("vec_id"), col("cluster"), col("scale"), col("qvec_csv"))
        .orderBy(col("vec_id"))
    }),

    // Embedding-space drift: per-label centroid agreement between two
    // deterministic halves of the corpus (vec_id parity standing in for
    // the before/after snapshots of a recurring ingest). q_psi_drift
    // watches scalar distributions; this is its embedding twin — the QA
    // gate that catches an encoder swap or a poisoned shard, which shift
    // centroid DIRECTION long before any scalar histogram moves. Exact
    // end-to-end: ×1e6 bigint vectors, per-(label,half,dim) component
    // sums, and DECIMAL(18,0)-promoted sums of component products, so
    // cos(Σa, Σb) — scale-invariant, so sums need no 1/n — takes doubles
    // only in the final divide and the oracle matches bit-for-bit. One
    // posexplode + one map-side-combined shuffle on (label, dim): the
    // reduced state is |labels|·64·2 cells regardless of corpus size, and
    // at 100 TB the same plan runs with DECIMAL(38,0) component sums.
    // EMBEDDING-INGEST QA PANEL — the gate a vector feed passes before it
    // joins the index: per label, the vector count, dimensionality extrema
    // (a ragged feed is a broken upstream encoder), zero vectors (no
    // direction — cosine poison), non-finite components, and the exact
    // integer norm² envelope (the scale-drift alarm). One
    // map-side-combined aggregate over the corpus; the norm² sum rides
    // DECIMAL(38,0) internally and surfaces as a double mean, so there is
    // no int64 overflow at any corpus size and no wide-decimal output
    // representation (the q_table_checksum lesson).
    "q_vector_quality" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val iv = t(s, d, "embeddings")
        .select(col("label"), size(col("embedding")).as("dim"),
          expr("exists(embedding, x -> isnan(x)" +
            " or cast(x as double) = cast('Infinity' as double)" +
            " or cast(x as double) = cast('-Infinity' as double))").as("bad"),
          intVec("embedding").as("v"))
        .withColumn("nv", normL("v"))
      iv.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          min(col("dim")).as("min_dim"), max(col("dim")).as("max_dim"),
          sum(when(col("nv") === 0L, 1L).otherwise(0L)).as("n_zero"),
          sum(when(col("bad"), 1L).otherwise(0L)).as("n_nonfinite"),
          min(col("nv")).as("min_norm2"), max(col("nv")).as("max_norm2"),
          (sum(col("nv").cast(dec)).cast("double") /
            count(lit(1)).cast("double")).as("avg_norm2"))
        .orderBy(col("label"))
    }),

    "q_embed_drift" -> ((s, d) => {
      val iv = t(s, d, "embeddings")
        .select(col("label"), (col("vec_id") % 2).as("half"),
          intVec("embedding").as("v"))
      // DECIMAL(38,0) component-sum casts: the cast itself can never
      // overflow (a 38-digit sum needs ~1e31 rows), and the (38,0)
      // product keeps the silent non-ANSI overflow point at |s| ~ 1e19
      // per operand instead of the 1e18 a narrower cast would impose
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val sums = iv
        .select(col("label"), col("half"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(when(col("half") === 0, col("x")).otherwise(0L)).as("s0"),
          sum(when(col("half") === 1, col("x")).otherwise(0L)).as("s1"))
      val geom = sums.groupBy(col("label"))
        .agg(sum(col("s0").cast(dec) * col("s1").cast(dec)).as("dot"),
          sum(col("s0").cast(dec) * col("s0").cast(dec)).as("q0"),
          sum(col("s1").cast(dec) * col("s1").cast(dec)).as("q1"))
      val ns = iv.groupBy(col("label"))
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"))
      geom.join(broadcast(ns), Seq("label"))
        // a half with a zero centroid (or no rows) has no direction:
        // emit an explicit NULL, never 0/0 → NaN (whose cross-engine
        // comparison semantics are undefined); NULLIF mirrors this in
        // the oracle
        .select(col("label"), col("n0"), col("n1"),
          when(col("q0") === 0 || col("q1") === 0, lit(null).cast("double"))
            .otherwise(col("dot").cast("double") /
              (sqrt(col("q0").cast("double")) * sqrt(col("q1").cast("double"))))
            .as("centroid_cos"))
        .orderBy(col("label"))
    })
  )

  /** (vec_id, cluster, is_dup) — the SemDeDup verdict (trained-model
    * cluster assignment + within-cluster cos-τ prune), shared by
    * q_semantic_dedup and the q_pipeline_vectors capstone. */
  /** SemDeDup cluster-count knob: within-cluster pair work is Σ|cluster|²
    * ≈ N²/k, so a FIXED k re-enters the quadratic regime as N grows — the
    * SemDeDup recipe (Abbas et al. 2023) scales k ∝ N / target-cluster-
    * size. `graft.semdedup.k`: an integer, or "auto" = max(8, ⌈N/256⌉)
    * (mean cluster size held at ~256, so pair volume grows ∝ 256·N —
    * linear). Seeds are vec_ids 1..k (present at every fixture scale),
    * 2 Lloyd updates, memoized per (dir, k) like the coarse quantizer —
    * k = 8 IS the coarse quantizer, so the default shares its cache and
    * the oracle (which replays k = 8 training) stays bit-exact. */
  private def semModel(s: SparkSession, d: String): graft.operators.KMeans.Model = {
    val k = s.conf.get("graft.semdedup.k", "8") match {
      case "auto" =>
        val n = vecCount.getOrElseUpdate(d, t(s, d, "embeddings").count())
        math.max(8L, (n + 255L) / 256L).toInt
      case v =>
        val kk = v.toInt
        require(kk >= 1, s"graft.semdedup.k must be >= 1 or 'auto', got $kk")
        kk
    }
    if (k == 8) coarseModel(s, d)
    else coarseCache.synchronized {
      coarseCache.getOrElseUpdate(s"$d|k=$k", graft.Assets.timed("semdedup_quantizer") {
        graft.operators.KMeans.model(intVecs(s, d), (1L to k.toLong).toSeq,
          updates = 2)
      })
    }
  }

  private def semanticVerdict(s: SparkSession, d: String): DataFrame = {
    // fan = false (r15): the verdict's map side is one argmax per row and
    // the within-cluster join re-pays the unpersisted fan exchange on both
    // sides (r14 bench: q_semantic_dedup 0.83→1.13, q_pipeline_vectors
    // 0.97→1.29 regressed under the fanned scan)
    val iv = intVecs(s, d, fan = false)
    val cents = semModel(s, d)
    // assignment form switches on k alone — bit-identical results (the
    // centArgmaxData contract): literal argmax for the default/oracle
    // k=8, the compiled-loop data form once the conf scales k with N
    // (the literal expression's cost grows ~0.3 s/centroid at sf1)
    val assign =
      if (cents.length > 16) graft.operators.KMeans.centArgmaxData(cents)
      else graft.operators.KMeans.centArgmax(cents)
    val assigned = iv
      .withColumn("cluster", assign)
      .select(col("vec_id"), col("v"), col("nv"), col("cluster"))
    val a = assigned.select(col("vec_id").as("ida"), col("v").as("va"),
      col("nv").as("na"), col("cluster").as("ca"))
    val b = assigned.select(col("vec_id").as("idb"), col("v").as("vb"),
      col("nv").as("nb"), col("cluster").as("cb"))
    val cos = cosine(dotL("va", "vb"), col("na"), col("nb"))
    val dups = a.join(b, col("ca") === col("cb") && col("ida") < col("idb")
        && cos >= lit(SemTau))
      .select(col("idb").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    assigned.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** SemDeDup cosine threshold — same τ as the near-dup family. */
  private val SemTau = 0.4

  /** q_cluster_topics idf weights ln(8/df), df = 1..7, as SHARED DECIMAL
    * literals (one generator feeds the Spark expression AND the oracle
    * SQL — the calibration-thresholds discipline): ranking on exact
    * decimal products sidesteps both the rational ln-tie class
    * (1·ln8 = 3·ln2 across different (tf, df) pairs) and cross-libm
    * 1-ulp drift at the rank cut. */
  private val idfCase: String = (1 to 7).map { df =>
    s"WHEN df = $df THEN CAST(${"%.15f".format(math.log(8.0 / df))} AS DECIMAL(16, 15))"
  }.mkString("CASE ", " ", " END")

  /** k-means oracle scaffolding shared by q_kmeans_train and
    * q_ann_ivf_trained: per-vector norms + seed centroids as per-dim rows. */
  private val kmPrefix =
    """vn AS (SELECT vec_id, SUM(v[i] * v[i]) AS nv FROM iv, idx GROUP BY 1),
      |cent0 AS (SELECT vec_id AS cid, i AS pos, v[i] AS s FROM iv, idx
      |          WHERE vec_id BETWEEN 1 AND 8)""".stripMargin

  /** Lloyd rounds 1..n as chained CTEs. Rounds < n emit sums+cent (the
    * model update); round n always emits the assignment `asg{n}`, plus
    * `sums{n}` when `sumsAtLast` (q_kmeans_train reads it; the trained-IVF
    * probe needs only the assignment). */
  private def kmRoundCtes(n: Int, sumsAtLast: Boolean): String =
    (1 to n).map { k =>
      val prev = s"cent${k - 1}"
      val asg =
        s"""nrm$k AS (SELECT cid, SUM(s * s) AS cn FROM $prev GROUP BY 1),
           |dot$k AS (SELECT iv.vec_id, c.cid, SUM(iv.v[c.pos] * c.s) AS dot
           |          FROM iv, $prev c GROUP BY 1, 2),
           |asg$k AS (SELECT vec_id, cid AS cluster FROM (
           |            SELECT d.vec_id, d.cid,
           |              ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
           |                CAST(d.dot AS DOUBLE) / (SQRT(CAST(vn.nv AS DOUBLE)) * SQRT(CAST(n.cn AS DOUBLE))) DESC,
           |                d.cid ASC) AS rn
           |            FROM dot$k d JOIN vn USING (vec_id) JOIN nrm$k n ON n.cid = d.cid) z
           |          WHERE rn = 1)""".stripMargin
      val sums =
        s"""sums$k AS (SELECT a.cluster AS cid, i AS pos, COUNT(*) AS n, SUM(iv.v[i]) AS s
           |           FROM iv JOIN asg$k a USING (vec_id), idx GROUP BY 1, 2)""".stripMargin
      // empty OR zero-norm clusters keep the previous centroid (zero-norm
      // mirrors KMeans.updated's NaN-cosine guard)
      val cent =
        s"""nsum$k AS (SELECT cid, SUM(s * s) AS cn2 FROM sums$k GROUP BY 1),
           |cent$k AS (SELECT c.cid, c.pos,
           |             CASE WHEN n2.cn2 IS NULL OR n2.cn2 = 0 THEN c.s ELSE s.s END AS s
           |           FROM $prev c
           |           LEFT JOIN sums$k s ON s.cid = c.cid AND s.pos = c.pos
           |           LEFT JOIN nsum$k n2 ON n2.cid = c.cid)""".stripMargin
      if (k < n) Seq(asg, sums, cent).mkString(",\n")
      else if (sumsAtLast) Seq(asg, sums).mkString(",\n")
      else asg
    }.mkString(",\n")

  /** PQ oracle chain (q_ann_pq): per-(sub m, vec) sliced vectors → per-sub
    * seed codebooks (subvectors of vec_ids 1..4) → 2 joint Lloyd updates
    * with `m` as an extra grouping key (independent subspaces, so the
    * joint replay equals the Spark side's per-sub KMeans.model calls) →
    * encode assignment `pasg3` under the trained `pcent2`. kmRoundCtes
    * with (m, cid) keys and a 16-dim index. */
  private lazy val pqCtes = {
    val rounds = (1 to 3).map { k =>
      val prev = s"pcent${k - 1}"
      val asg =
        s"""pnrm$k AS (SELECT m, cid, SUM(s * s) AS cn FROM $prev GROUP BY 1, 2),
           |pdot$k AS (SELECT sv.vec_id, sv.m, c.cid, SUM(sv.v[c.pos] * c.s) AS dot
           |           FROM sv, $prev c WHERE c.m = sv.m GROUP BY 1, 2, 3),
           |pasg$k AS (SELECT vec_id, m, cid AS code FROM (
           |             SELECT d.vec_id, d.m, d.cid,
           |               ROW_NUMBER() OVER (PARTITION BY d.vec_id, d.m ORDER BY
           |                 CAST(d.dot AS DOUBLE) / (SQRT(CAST(sn.nv AS DOUBLE)) * SQRT(CAST(n.cn AS DOUBLE))) DESC,
           |                 d.cid ASC) AS rn
           |             FROM pdot$k d JOIN sn ON sn.vec_id = d.vec_id AND sn.m = d.m
           |                  JOIN pnrm$k n ON n.m = d.m AND n.cid = d.cid) z
           |           WHERE rn = 1)""".stripMargin
      val sums =
        s"""psum$k AS (SELECT a.m, a.code AS cid, i AS pos, COUNT(*) AS n, SUM(sv.v[i]) AS s
           |           FROM sv JOIN pasg$k a ON a.vec_id = sv.vec_id AND a.m = sv.m, idx16
           |           GROUP BY 1, 2, 3)""".stripMargin
      val cent =
        s"""pns$k AS (SELECT m, cid, SUM(s * s) AS cn2 FROM psum$k GROUP BY 1, 2),
           |pcent$k AS (SELECT c.m, c.cid, c.pos,
           |              CASE WHEN n2.cn2 IS NULL OR n2.cn2 = 0 THEN c.s ELSE s.s END AS s
           |            FROM $prev c
           |            LEFT JOIN psum$k s ON s.m = c.m AND s.cid = c.cid AND s.pos = c.pos
           |            LEFT JOIN pns$k n2 ON n2.m = c.m AND n2.cid = c.cid)""".stripMargin
      if (k < 3) Seq(asg, sums, cent).mkString(",\n") else asg
    }.mkString(",\n")
    s"""$ivCte,
       |idx16 AS (SELECT UNNEST(range(1, 17)) AS i),
       |subm AS (SELECT UNNEST(range(0, 4)) AS m),
       |sv AS (SELECT vec_id, m, list_slice(v, m*16 + 1, (m+1)*16) AS v FROM iv, subm),
       |sn AS (SELECT vec_id, m, SUM(v[i] * v[i]) AS nv FROM sv, idx16 GROUP BY 1, 2),
       |pcent0 AS (SELECT m, vec_id AS cid, i AS pos, v[i] AS s FROM sv, idx16
       |           WHERE vec_id BETWEEN 1 AND 4),
       |$rounds""".stripMargin
  }

  /** Multi-table LSH oracle chain (q_knn_join_ann_multi /
    * q_embed_neardup_lsh_multi): per-(table, plane) sign dots → 4-bit
    * bucket per table → DISTINCT candidate pairs sharing any table's
    * bucket → exact integer dot/norms → `cs(vec_a, vec_b, cos)`. */
  /** The multi-table LSH candidate chain (buckets → distinct id pairs →
    * scored pairs), with `ns`-prefixed CTE names so it composes into
    * WITH-chains that already bind cand/cs (the recall panel). Requires
    * iv/idx upstream; ends in `${ns}cand` (vec_a < vec_b id pairs) and
    * `${ns}cs` (vec_a, vec_b, cos). */
  private def mtChainCtes(ns: String): String =
    s"""${ns}tbl AS (SELECT UNNEST(range(0, $MtTables)) AS l),
       |${ns}pl AS (SELECT UNNEST(range(0, ${PLANES})) AS p),
       |${ns}dots AS (SELECT iv.vec_id, l, p,
       |           SUM(iv.v[i] * list_extract(CASE l
       |             ${(0 until MtTables).map(l => s"WHEN $l THEN ${mtSqlLit(l)}").mkString(" ")}
       |             END, p*64 + i)) AS dp
       |         FROM iv, ${ns}tbl, ${ns}pl, idx GROUP BY iv.vec_id, l, p),
       |${ns}bk AS (SELECT vec_id, l,
       |         CAST(SUM(CASE WHEN dp >= 0 THEN CAST(POWER(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
       |       FROM ${ns}dots GROUP BY vec_id, l),
       |${ns}cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM ${ns}bk a JOIN ${ns}bk b
       |           ON a.l = b.l AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |${ns}sc AS (SELECT c.vec_a, c.vec_b,
       |         SUM(x.v[i] * y.v[i]) AS dot,
       |         SUM(x.v[i] * x.v[i]) AS na,
       |         SUM(y.v[i] * y.v[i]) AS nb
       |       FROM ${ns}cand c
       |       JOIN iv x ON x.vec_id = c.vec_a
       |       JOIN iv y ON y.vec_id = c.vec_b, idx
       |       GROUP BY c.vec_a, c.vec_b),
       |${ns}cs AS (SELECT vec_a, vec_b,
       |         CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cos
       |       FROM ${ns}sc)""".stripMargin

  private lazy val mtCtes = s"$ivCte,\n${mtChainCtes("")}"

  // Shared oracle scaffolding: scaled int vectors, index table 1..64.
  private val ivCte =
    s"""iv AS (SELECT vec_id, label, ${sqlIntVec("embedding")} AS v
       |      FROM embeddings),
       |idx AS (SELECT UNNEST(range(1, 65)) AS i)""".stripMargin

  /** Score an id set against the query: id-keyed point lookup into the
    * vector table with the query vector embedded as a LITERAL array (the
    * centArgmax discipline — the query is 1 row of serving state, so a
    * per-round broadcast join would pay a job for what a literal does in
    * codegen) — the only way the corpus is ever touched by the walk. */
  private def graphScore(ids: DataFrame, vecs: DataFrame, qv: Array[Long],
                         nq: Long, hop: Long): DataFrame =
    vecs.join(broadcast(ids), "vec_id")
      .select(col("vec_id"), lit(hop).as("hop"),
        cosine(expr(s"graft_long_dot(v, ${qv.mkString("array(", "L, ", "L)")})"),
          col("nv"), lit(nq)).as("cos"))

  /** One greedy-beam round of the graph-ANN walk: the frontier's graph
    * neighbors (frontier⋈edges equi-join), already-visited ids dropped
    * (LEFT ANTI against the bounded visited set), survivors scored via
    * [[graphScore]]. Exposed (with [[graphWalkRoundProbe]]) for the
    * PlanSpec structural pin — the registered query's own returned plan
    * reads the loop-session caches, so the round SHAPE is pinned here. */
  private[graft] def graphRound(edges: DataFrame, frontier: DataFrame,
      visited: DataFrame, vecs: DataFrame, qv: Array[Long], nq: Long,
      hop: Long): DataFrame = {
    // frontier (≤beam rows) and visited (≤1+beam·deg·rounds rows) are
    // BOUNDED walk state — broadcast both explicitly: the loop session
    // runs with AQE off, where an unhinted tiny join would static-plan
    // as a sort-merge with exchanges; at scale these broadcasts are the
    // correct plan outright (probe set → bucketed index table)
    val cand = edges
      .join(broadcast(frontier.select(col("vec_id").as("src"))), "src")
      .select(col("dst").as("vec_id")).distinct()
      .join(broadcast(visited.select(col("vec_id"))), Seq("vec_id"),
        "left_anti")
    graphScore(cand, vecs, qv, nq, hop)
  }

  /** One UNPERSISTED beam round over the real dataset (entry → round 1),
    * main session — the plan [[graphRound]] contributes to every round of
    * q_ann_graph, for the PlanSpec pin. */
  private[graft] def graphWalkRoundProbe(s: SparkSession, d: String): DataFrame = {
    val iv = intVecs(s, d)
    val coarse = coarseModel(s, d)
    val fwd = nndNeighborTable(s, d)
      .filter(col("vec_id") =!= 0 && col("nbr_id") =!= 0)
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
    val edges = fwd
      .unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val assigned = iv
      .withColumn("cluster", graft.operators.KMeans.centArgmax(coarse))
    val qRow = assigned.filter(col("vec_id") === 0)
      .select(col("v"), col("nv"), col("cluster")).limit(1).collect()(0)
    val (qv, nq, qcl) =
      (qRow.getSeq[Long](0).toArray, qRow.getLong(1), qRow.getLong(2))
    val entries = assigned.filter(col("vec_id") =!= 0)
      .withColumn("ccos", graft.operators.KMeans.centBestCos(coarse))
      .groupBy(col("cluster"))
      .agg(max(struct(col("ccos"), negate(col("vec_id")).as("nid"),
        col("vec_id"))).as("e"))
      .select(col("cluster").as("qcl"), col("e.vec_id").as("vec_id"))
    val entry = entries.filter(col("qcl") === lit(qcl)).select(col("vec_id"))
    val vecs = iv.select(col("vec_id"), col("v"), col("nv"))
    val v0 = graphScore(entry, vecs, qv, nq, 0L)
    graphRound(edges, v0.select(col("vec_id")), v0, vecs, qv, nq, 1L)
  }

  /** Graph-ANN oracle chain (q_ann_graph + the recall panel's graph leg)
    * — g/nd-namespaced so it composes with the panel's other families.
    * Requires iv/idx (ivCte), gcand/gcs (mtChainCtes("g") — the
    * multi-table LSH candidate replay), and vn/asg3/dot3/nrm3 (kmPrefix +
    * kmRoundCtes(3)) upstream. Replays: the NN-DESCENT `nnd_neighbors`
    * asset (LSH-candidate init top-5 → one neighbor-of-neighbor round
    * scoring only fresh pairs → re-rank, every rank by (cos DESC, nbr
    * ASC) — ranked INCLUDING vec 0, then both-endpoint-filtered,
    * matching the shared asset's build-then-filter), the per-cell entry
    * (argmax centroid cosine under the trained model, ties to smallest
    * vec_id), and [[GraphRounds]] unrolled beam rounds at beam
    * [[GraphBeam]], ending in `gv{GraphRounds}` = every scored
    * (vec_id, hop, cos). */
  /** The NN-descent index replay alone (nd0 .. ndrk/grk) — requires
    * iv/idx + gcand/gcs (mtChainCtes("g")) upstream; shared by the
    * q_ann_nnd gate row and the graph-walk chain below. */
  private lazy val nndCtes: String =
    s"""nd0 AS MATERIALIZED (SELECT vid, nbr FROM (
       |          SELECT vid, nbr, ROW_NUMBER() OVER (PARTITION BY vid
       |            ORDER BY cos DESC, nbr ASC) AS rnk
       |          FROM (SELECT vec_a AS vid, vec_b AS nbr, cos FROM gcs
       |                UNION ALL
       |                SELECT vec_b AS vid, vec_a AS nbr, cos FROM gcs) z0) z
       |        WHERE rnk <= 5),
       |nds AS MATERIALIZED (SELECT vid, nbr FROM nd0
       |       UNION SELECT nbr AS vid, vid AS nbr FROM nd0),
       |ndn AS MATERIALIZED (SELECT DISTINCT x.nbr AS vec_a, y.nbr AS vec_b
       |        FROM nds x JOIN nds y ON x.vid = y.vid AND x.nbr < y.nbr),
       |ndf AS MATERIALIZED (SELECT n.vec_a, n.vec_b FROM ndn n
       |        WHERE NOT EXISTS (SELECT 1 FROM gcand c
       |          WHERE c.vec_a = n.vec_a AND c.vec_b = n.vec_b)),
       |ndsc AS MATERIALIZED (SELECT f.vec_a, f.vec_b,
       |          SUM(x.v[i] * y.v[i]) AS dot,
       |          SUM(x.v[i] * x.v[i]) AS na,
       |          SUM(y.v[i] * y.v[i]) AS nb
       |        FROM ndf f JOIN iv x ON x.vec_id = f.vec_a
       |                   JOIN iv y ON y.vec_id = f.vec_b, idx
       |        GROUP BY f.vec_a, f.vec_b),
       |ndall AS MATERIALIZED (SELECT vec_a, vec_b, cos FROM gcs
       |        UNION ALL
       |        SELECT vec_a, vec_b, CAST(dot AS DOUBLE) /
       |          (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cos
       |        FROM ndsc),
       |ndrk AS MATERIALIZED (SELECT vid, nbr, cos, rnk FROM (
       |          SELECT vid, nbr, cos, ROW_NUMBER() OVER (PARTITION BY vid
       |            ORDER BY cos DESC, nbr ASC) AS rnk
       |          FROM (SELECT vec_a AS vid, vec_b AS nbr, cos FROM ndall
       |                UNION ALL
       |                SELECT vec_b AS vid, vec_a AS nbr, cos FROM ndall) z0) z
       |        WHERE rnk <= 5),
       |grk AS MATERIALIZED (SELECT vid, nbr FROM ndrk)""".stripMargin

  private lazy val graphCtes: String = {
    val rounds = (1 to GraphRounds).map { r =>
      val prevV = s"gv${r - 1}"
      val prevF = if (r == 1) "gv0" else s"gf${r - 1}"
      val step =
        s"""gc$r AS MATERIALIZED (SELECT DISTINCT g.nbr AS vec_id
           |         FROM gg g JOIN $prevF f ON g.vid = f.vec_id
           |         WHERE g.nbr NOT IN (SELECT vec_id FROM $prevV)),
           |gs$r AS MATERIALIZED (SELECT c.vec_id, CAST($r AS BIGINT) AS hop, q.cos
           |         FROM gc$r c JOIN gqs q USING (vec_id)),
           |gv$r AS MATERIALIZED (SELECT * FROM $prevV UNION ALL SELECT * FROM gs$r)""".stripMargin
      if (r < GraphRounds)
        step + s""",
           |gf$r AS MATERIALIZED (SELECT vec_id FROM gs$r
           |         ORDER BY cos DESC, vec_id ASC LIMIT $GraphBeam)""".stripMargin
      else step
    }.mkString(",\n")
    s"""$nndCtes,
       |gg AS MATERIALIZED (SELECT vid, nbr FROM grk WHERE vid <> 0 AND nbr <> 0
       |       UNION
       |       SELECT nbr AS vid, vid AS nbr FROM grk WHERE vid <> 0 AND nbr <> 0),
       |gqv AS MATERIALIZED (SELECT v AS qv FROM iv WHERE vec_id = 0),
       |gqs AS MATERIALIZED (SELECT iv.vec_id,
       |          CAST(SUM(iv.v[i] * q.qv[i]) AS DOUBLE) /
       |            (SQRT(CAST(SUM(iv.v[i] * iv.v[i]) AS DOUBLE)) *
       |             SQRT(CAST(SUM(q.qv[i] * q.qv[i]) AS DOUBLE))) AS cos
       |        FROM iv, gqv q, idx WHERE iv.vec_id <> 0 GROUP BY iv.vec_id),
       |gqc AS MATERIALIZED (SELECT cluster AS qcl FROM asg3 WHERE vec_id = 0),
       |gentry AS MATERIALIZED (SELECT d.vec_id FROM dot3 d
       |             JOIN vn ON vn.vec_id = d.vec_id
       |             JOIN nrm3 n ON n.cid = d.cid
       |             JOIN asg3 a ON a.vec_id = d.vec_id
       |             JOIN gqc ON d.cid = gqc.qcl AND a.cluster = gqc.qcl
       |           WHERE d.vec_id <> 0
       |           ORDER BY CAST(d.dot AS DOUBLE) /
       |             (SQRT(CAST(vn.nv AS DOUBLE)) * SQRT(CAST(n.cn AS DOUBLE))) DESC,
       |             d.vec_id ASC LIMIT 1),
       |gv0 AS MATERIALIZED (SELECT q.vec_id, CAST(0 AS BIGINT) AS hop, q.cos
       |        FROM gqs q JOIN gentry e ON e.vec_id = q.vec_id),
       |$rounds""".stripMargin
  }

  /** SemDeDup oracle chain ending in `asg3` + `dup` — shared by
    * q_semantic_dedup and the q_pipeline_vectors capstone. */
  private lazy val semCtes =
    s"""$ivCte,
       |$kmPrefix,
       |${kmRoundCtes(3, sumsAtLast = false)},
       |pc AS (SELECT a.vec_id AS ida, b.vec_id AS idb
       |       FROM asg3 a JOIN asg3 b
       |         ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
       |sc AS (SELECT pc.ida, pc.idb, SUM(x.v[i] * y.v[i]) AS dot
       |       FROM pc JOIN iv x ON x.vec_id = pc.ida
       |               JOIN iv y ON y.vec_id = pc.idb, idx
       |       GROUP BY pc.ida, pc.idb),
       |dup AS (SELECT DISTINCT sc.idb AS vec_id
       |        FROM sc JOIN vn a ON a.vec_id = sc.ida
       |                JOIN vn b ON b.vec_id = sc.idb
       |        WHERE CAST(dot AS DOUBLE) /
       |          (SQRT(CAST(a.nv AS DOUBLE)) * SQRT(CAST(b.nv AS DOUBLE))) >= $SemTau)""".stripMargin

  /** The composed IVF-PQ oracle at a given probe width: the router CTE
    * ranks ALL coarse clusters for the query by the SAME (cos DESC, cid
    * ASC) rule as KMeans.centTopN and keeps `nprobe`; the ADC cut is
    * 10*nprobe (the Spark side's FAISS-style budget). At nprobe=1 the
    * router reduces exactly to asg3's argmax cluster. */
  private def ivfpqOracle(nprobe: Int): String =
    s"""WITH $pqCtes,
       |$kmPrefix,
       |${kmRoundCtes(3, sumsAtLast = false)},
       |qc AS (SELECT cid AS qcl FROM (
       |         SELECT d.cid, ROW_NUMBER() OVER (ORDER BY
       |           CAST(d.dot AS DOUBLE) / (SQRT(CAST(vn.nv AS DOUBLE)) * SQRT(CAST(n.cn AS DOUBLE))) DESC,
       |           d.cid ASC) AS rn
       |         FROM dot3 d JOIN vn USING (vec_id) JOIN nrm3 n ON n.cid = d.cid
       |         WHERE d.vec_id = 0) z
       |       WHERE rn <= $nprobe),
       |cand AS (SELECT a.vec_id, a.cluster FROM asg3 a
       |         WHERE a.vec_id <> 0
       |           AND a.cluster IN (SELECT qcl FROM qc)),
       |ccn AS (SELECT m, cid, SUM(s * s) AS cn FROM pcent2 GROUP BY 1, 2),
       |qsv AS (SELECT m, v FROM sv WHERE vec_id = 0),
       |qsn AS (SELECT m, nv FROM sn WHERE vec_id = 0),
       |qdot AS (SELECT c.m, c.cid, SUM(q.v[c.pos] * c.s) AS dot
       |         FROM pcent2 c JOIN qsv q ON q.m = c.m GROUP BY 1, 2),
       |term AS (SELECT a.vec_id, cd.cluster, a.m, a.code,
       |           CAST(d.dot AS DOUBLE) / (SQRT(CAST(qs.nv AS DOUBLE)) * SQRT(CAST(cc.cn AS DOUBLE))) AS t
       |         FROM pasg3 a
       |         JOIN cand cd ON cd.vec_id = a.vec_id
       |         JOIN qdot d ON d.m = a.m AND d.cid = a.code
       |         JOIN qsn qs ON qs.m = a.m
       |         JOIN ccn cc ON cc.m = a.m AND cc.cid = a.code),
       |adct AS (SELECT vec_id, MAX(cluster) AS cluster,
       |           MAX(CASE WHEN m = 0 THEN code END) AS code0,
       |           MAX(CASE WHEN m = 1 THEN code END) AS code1,
       |           MAX(CASE WHEN m = 2 THEN code END) AS code2,
       |           MAX(CASE WHEN m = 3 THEN code END) AS code3,
       |           ((MAX(CASE WHEN m = 0 THEN t END) + MAX(CASE WHEN m = 1 THEN t END))
       |             + MAX(CASE WHEN m = 2 THEN t END)) + MAX(CASE WHEN m = 3 THEN t END) AS adc
       |         FROM term GROUP BY vec_id),
       |top AS (SELECT * FROM adct ORDER BY adc DESC, vec_id ASC LIMIT ${10 * nprobe}),
       |qv AS (SELECT v FROM iv WHERE vec_id = 0),
       |qn AS (SELECT SUM(v[i] * v[i]) AS nq FROM qv, idx),
       |rr AS (SELECT t.vec_id, t.cluster, t.code0, t.code1, t.code2, t.code3, t.adc,
       |         SUM(iv.v[i] * q.v[i]) AS dot, SUM(iv.v[i] * iv.v[i]) AS nv
       |       FROM top t JOIN iv ON iv.vec_id = t.vec_id, qv q, idx
       |       GROUP BY 1, 2, 3, 4, 5, 6, 7)
       |SELECT rr.vec_id, rr.cluster, rr.code0, rr.code1, rr.code2, rr.code3, rr.adc,
       |  CAST(rr.dot AS DOUBLE) / (SQRT(CAST(rr.nv AS DOUBLE)) * SQRT(CAST(qn.nq AS DOUBLE))) AS cos
       |FROM rr, qn ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_embed_quantize" ->
      s"""WITH iv AS (SELECT vec_id, ${sqlIntVec("embedding")} AS v FROM embeddings),
         |st AS (SELECT vec_id, v,
         |         list_max(list_transform(v, x -> abs(x))) AS amax
         |       FROM iv),
         |qt AS (SELECT vec_id, amax AS scale, v,
         |         list_transform(v, x -> CAST(CASE
         |           WHEN amax = 0 THEN 0
         |           WHEN x >= 0 THEN (2*x*127 + amax) // (2*amax)
         |           ELSE -((2*(-x)*127 + amax) // (2*amax)) END AS INTEGER)) AS qvec
         |       FROM st)
         |SELECT vec_id, scale, array_to_string(qvec, ',') AS qvec_csv,
         |  CASE WHEN scale = 0 THEN 0.0
         |       ELSE CAST(list_max(list_transform(range(1, 65),
         |              i -> abs(127*v[i] - qvec[i]*scale))) AS DOUBLE)
         |            / (127.0 * scale) END AS max_rel_err
         |FROM qt ORDER BY vec_id""".stripMargin,

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

    "q_ann_prefix" ->
      s"""WITH $ivCte,
         |pidx AS (SELECT UNNEST(range(1, 17)) AS i),
         |q AS (SELECT v AS qv FROM iv WHERE vec_id = 0),
         |psc AS (SELECT iv.vec_id,
         |          SUM(iv.v[i] * q.qv[i]) AS pdot,
         |          SUM(iv.v[i] * iv.v[i]) AS np,
         |          SUM(q.qv[i] * q.qv[i]) AS nqp
         |        FROM iv, q, pidx GROUP BY iv.vec_id),
         |cand AS (SELECT vec_id,
         |           CAST(pdot AS DOUBLE)
         |             / (SQRT(CAST(np AS DOUBLE)) * SQRT(CAST(nqp AS DOUBLE))) AS pcos
         |         FROM psc WHERE vec_id <> 0
         |         ORDER BY pcos DESC, vec_id ASC LIMIT 50),
         |sc AS (SELECT iv.vec_id, cand.pcos,
         |         SUM(iv.v[i] * q.qv[i]) AS dot,
         |         SUM(iv.v[i] * iv.v[i]) AS nv,
         |         SUM(q.qv[i] * q.qv[i]) AS nq
         |       FROM iv JOIN cand USING (vec_id), q, idx
         |       GROUP BY iv.vec_id, cand.pcos)
         |SELECT vec_id, pcos,
         |  CAST(dot AS DOUBLE) / (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin,

    // graph-ANN replay: trained coarse model (kmPrefix + 3 rounds, the
    // q_ann_ivf_trained chain verbatim) routes the query to its cell;
    // mtChainCtes("g") replays the LSH candidate init, graphCtes the
    // NN-descent refinement, the per-cell entry, and the unrolled beam
    // rounds — the final gv{R} holds every scored node with its
    // first-reached hop, cut by the same (cos, vec_id) rule
    "q_ann_graph" ->
      s"""WITH $ivCte,
         |$kmPrefix,
         |${kmRoundCtes(3, sumsAtLast = false)},
         |${mtChainCtes("g")},
         |$graphCtes
         |SELECT vec_id, hop, cos FROM gv$GraphRounds
         |ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin,

    // the NN-descent index replay standalone: LSH candidate chain → init
    // top-5 → fresh neighbor-of-neighbor pairs → union re-rank — the
    // ndrk table IS the asset
    "q_ann_nnd" ->
      s"""WITH $ivCte,
         |${mtChainCtes("g")},
         |$nndCtes
         |SELECT vid AS vec_id, nbr AS nbr_id, cos, rnk FROM ndrk
         |ORDER BY vec_id, rnk""".stripMargin,

    "q_colbert_maxsim" ->
      s"""WITH iv AS (SELECT vec_id, ${sqlIntVec("embedding")} AS v FROM embeddings),
         |idx16 AS (SELECT UNNEST(range(1, 17)) AS i),
         |subm AS (SELECT UNNEST(range(0, 4)) AS m),
         |sv AS (SELECT vec_id, m, list_slice(v, m*16 + 1, (m+1)*16) AS v FROM iv, subm),
         |sn AS (SELECT vec_id, m, SUM(v[i] * v[i]) AS nv FROM sv, idx16 GROUP BY 1, 2),
         |dots AS (SELECT q.vec_id AS qid, c.vec_id, q.m AS qm, c.m AS cm,
         |           SUM(q.v[i] * c.v[i]) AS dot
         |         FROM sv q JOIN sv c ON c.vec_id <> q.vec_id, idx16
         |         WHERE q.vec_id IN (1, 2, 3)
         |         GROUP BY 1, 2, 3, 4),
         |ms AS (SELECT d.qid, d.vec_id, d.qm,
         |         MAX(CAST(d.dot AS DOUBLE)
         |           / (SQRT(CAST(a.nv AS DOUBLE)) * SQRT(CAST(b.nv AS DOUBLE)))) AS m
         |       FROM dots d JOIN sn a ON a.vec_id = d.qid AND a.m = d.qm
         |                   JOIN sn b ON b.vec_id = d.vec_id AND b.m = d.cm
         |       GROUP BY 1, 2, 3),
         |sc AS (SELECT qid, vec_id,
         |         (((MAX(CASE WHEN qm = 0 THEN m END)
         |            + MAX(CASE WHEN qm = 1 THEN m END))
         |           + MAX(CASE WHEN qm = 2 THEN m END))
         |          + MAX(CASE WHEN qm = 3 THEN m END)) AS score
         |       FROM ms GROUP BY 1, 2),
         |rk AS (SELECT qid, vec_id, score,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rnk
         |       FROM sc)
         |SELECT qid, vec_id, score, rnk FROM rk WHERE rnk <= 5
         |ORDER BY qid, rnk""".stripMargin,

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

    "q_embed_neardup_lsh" ->
      s"""WITH $ivCte,
         |pl AS (SELECT UNNEST(range(0, ${PLANES})) AS p),
         |dots AS (SELECT iv.vec_id, p,
         |           SUM(iv.v[i] * (CASE WHEN ((p+1)*(i+3)) % 7 < 3 THEN 1 ELSE -1 END)) AS dp
         |         FROM iv, pl, idx GROUP BY iv.vec_id, p),
         |bk AS (SELECT vec_id,
         |         CAST(SUM(CASE WHEN dp >= 0 THEN CAST(POWER(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM dots GROUP BY vec_id),
         |probes AS (SELECT vec_id,
         |             UNNEST([bucket, xor(bucket, CAST(1 AS BIGINT)),
         |                     xor(bucket, CAST(2 AS BIGINT)), xor(bucket, CAST(4 AS BIGINT)),
         |                     xor(bucket, CAST(8 AS BIGINT))]) AS pb
         |           FROM bk),
         |cand AS (SELECT a.vec_id AS vec_a, p.vec_id AS vec_b
         |         FROM bk a JOIN probes p ON a.bucket = p.pb AND a.vec_id < p.vec_id),
         |sc AS (SELECT c.vec_a, c.vec_b,
         |         SUM(x.v[i] * y.v[i]) AS dot,
         |         SUM(x.v[i] * x.v[i]) AS na,
         |         SUM(y.v[i] * y.v[i]) AS nb
         |       FROM cand c
         |       JOIN iv x ON x.vec_id = c.vec_a
         |       JOIN iv y ON y.vec_id = c.vec_b, idx
         |       GROUP BY c.vec_a, c.vec_b)
         |SELECT vec_a, vec_b,
         |  CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cos
         |FROM sc
         |WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q_kmeans_step" ->
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
         |  FROM sc_c) z WHERE rn = 1)
         |SELECT a.cluster, i - 1 AS pos, COUNT(*) AS n,
         |  CAST(SUM(iv.v[i]) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean
         |FROM iv JOIN assign a USING (vec_id), idx
         |GROUP BY 1, 2 ORDER BY cluster, pos""".stripMargin,

    // k-center greedy replay: K−1 chained rounds, each a dist CTE to the
    // newest pick, a running LEAST fold, and a top-1 by (mind DESC, id).
    // All-integer (scaled dots), so LEAST/ORDER BY agree bit-for-bit.
    // Every round CTE is MATERIALIZED (the nd-chain precedent): the
    // chain references each round from two successors, and DuckDB's
    // default CTE inlining re-expands the whole subtree per reference —
    // exponential in K without the keyword.
    "q_coreset" -> {
      val nrm =
        "nrm AS MATERIALIZED (SELECT vec_id, CAST(SUM(v[i] * v[i]) AS BIGINT) AS nv " +
          "FROM iv, idx GROUP BY 1)"
      val p1 = "p1 AS MATERIALIZED (SELECT MIN(vec_id) AS id FROM iv)"
      val rounds = (2 to CoresetK).map { k =>
        val j = k - 1
        val prevIds = (1 to j).map(x => s"SELECT id FROM p$x").mkString(" UNION ALL ")
        val dj =
          s"""d$j AS MATERIALIZED (SELECT t.vec_id,
             |    CAST(tn.nv + cn.nv - 2 * SUM(t.v[i] * c.v[i]) AS BIGINT) AS dist
             |  FROM iv t
             |  CROSS JOIN p$j pj
             |  JOIN iv c ON c.vec_id = pj.id
             |  CROSS JOIN idx
             |  JOIN nrm tn ON tn.vec_id = t.vec_id
             |  JOIN nrm cn ON cn.vec_id = c.vec_id
             |  GROUP BY t.vec_id, tn.nv, cn.nv)""".stripMargin
        val mj =
          if (j == 1) s"m1 AS MATERIALIZED (SELECT vec_id, dist AS mind FROM d1)"
          else
            s"""m$j AS MATERIALIZED (SELECT a.vec_id, LEAST(a.mind, b.dist) AS mind
               |  FROM m${j - 1} a JOIN d$j b ON b.vec_id = a.vec_id)""".stripMargin
        val pk =
          s"""p$k AS MATERIALIZED (SELECT vec_id AS id, mind FROM m$j
             |  WHERE vec_id NOT IN ($prevIds)
             |  ORDER BY mind DESC, vec_id LIMIT 1)""".stripMargin
        s"$dj,\n$mj,\n$pk"
      }.mkString(",\n")
      val seedArm = "SELECT CAST(1 AS BIGINT) AS rnk, id AS vec_id, " +
        "CAST(0 AS BIGINT) AS mind FROM p1"
      val arms = seedArm +: (2 to CoresetK).map(k =>
        s"SELECT CAST($k AS BIGINT) AS rnk, id AS vec_id, " +
          s"CAST(mind AS BIGINT) AS mind FROM p$k")
      s"""WITH $ivCte,
         |$nrm,
         |$p1,
         |$rounds
         |${arms.mkString("", "\nUNION ALL ", "")}
         |ORDER BY rnk""".stripMargin
    },

    "q_kmeans_train" -> {
      val iters = 3
      s"""WITH $ivCte,
         |$kmPrefix,
         |${kmRoundCtes(iters, sumsAtLast = true)}
         |SELECT cid AS cluster, pos - 1 AS pos, n, CAST(s AS BIGINT) AS s,
         |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
         |FROM sums$iters ORDER BY cluster, pos""".stripMargin
    },

    "q_ann_ivf_trained" -> {
      // assignment round 3 runs under cent2 (the model after 2 updates);
      // then the probe is the q_ann_ivf shape against that assignment.
      s"""WITH $ivCte,
         |$kmPrefix,
         |${kmRoundCtes(3, sumsAtLast = false)},
         |q AS (SELECT iv.v AS qv, a.cluster AS qc
         |      FROM iv JOIN asg3 a USING (vec_id) WHERE iv.vec_id = 0),
         |sc AS (SELECT iv.vec_id, a.cluster,
         |         SUM(iv.v[i] * q.qv[i]) AS dot,
         |         SUM(iv.v[i] * iv.v[i]) AS nv,
         |         SUM(q.qv[i] * q.qv[i]) AS nq
         |       FROM iv JOIN asg3 a USING (vec_id), q, idx
         |       WHERE a.cluster = q.qc AND iv.vec_id <> 0
         |       GROUP BY iv.vec_id, a.cluster)
         |SELECT vec_id, cluster,
         |  CAST(dot AS DOUBLE) / (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin
    },

    "q_ann_pq" ->
      s"""WITH $pqCtes,
         |ccn AS (SELECT m, cid, SUM(s * s) AS cn FROM pcent2 GROUP BY 1, 2),
         |qsv AS (SELECT m, v FROM sv WHERE vec_id = 0),
         |qsn AS (SELECT m, nv FROM sn WHERE vec_id = 0),
         |qdot AS (SELECT c.m, c.cid, SUM(q.v[c.pos] * c.s) AS dot
         |         FROM pcent2 c JOIN qsv q ON q.m = c.m GROUP BY 1, 2),
         |term AS (SELECT a.vec_id, a.m, a.code,
         |           CAST(d.dot AS DOUBLE) / (SQRT(CAST(qs.nv AS DOUBLE)) * SQRT(CAST(cc.cn AS DOUBLE))) AS t
         |         FROM pasg3 a
         |         JOIN qdot d ON d.m = a.m AND d.cid = a.code
         |         JOIN qsn qs ON qs.m = a.m
         |         JOIN ccn cc ON cc.m = a.m AND cc.cid = a.code
         |         WHERE a.vec_id <> 0),
         |adct AS (SELECT vec_id,
         |           MAX(CASE WHEN m = 0 THEN code END) AS code0,
         |           MAX(CASE WHEN m = 1 THEN code END) AS code1,
         |           MAX(CASE WHEN m = 2 THEN code END) AS code2,
         |           MAX(CASE WHEN m = 3 THEN code END) AS code3,
         |           ((MAX(CASE WHEN m = 0 THEN t END) + MAX(CASE WHEN m = 1 THEN t END))
         |             + MAX(CASE WHEN m = 2 THEN t END)) + MAX(CASE WHEN m = 3 THEN t END) AS adc
         |         FROM term GROUP BY vec_id),
         |top AS (SELECT * FROM adct ORDER BY adc DESC, vec_id ASC LIMIT 20),
         |qv AS (SELECT v FROM iv WHERE vec_id = 0),
         |qn AS (SELECT SUM(v[i] * v[i]) AS nq FROM qv, idx),
         |rr AS (SELECT t.vec_id, t.code0, t.code1, t.code2, t.code3, t.adc,
         |         SUM(iv.v[i] * q.v[i]) AS dot, SUM(iv.v[i] * iv.v[i]) AS nv
         |       FROM top t JOIN iv ON iv.vec_id = t.vec_id, qv q, idx
         |       GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT rr.vec_id, rr.code0, rr.code1, rr.code2, rr.code3, rr.adc,
         |  CAST(rr.dot AS DOUBLE) / (SQRT(CAST(rr.nv AS DOUBLE)) * SQRT(CAST(qn.nq AS DOUBLE))) AS cos
         |FROM rr, qn ORDER BY cos DESC, vec_id ASC LIMIT 5""".stripMargin,

    // the two verified halves CHAINED: the coarse-router CTEs are
    // q_ann_ivf_trained's verbatim (kmPrefix + 3 rounds → asg3 = the
    // trained assignment, query routed at nprobe=1), the codebook/ADC/
    // rerank CTEs are q_ann_pq's verbatim (pqCtes → pasg3 codes under
    // pcent2) — composition only restricts the ADC scoring to the query
    // cluster's members and carries `cluster` through to the output.
    // recall panel replay: exact top-5 + each family's verbatim chain
    // (ivf-trained probe under asg3, LSH buckets, prefix two-stage) with
    // namespaced CTEs, then per-family IN-counts — same tie rules, same
    // LIMIT 5 everywhere, so the id sets match the Spark legs exactly
    "q_ann_recall_panel" ->
      s"""WITH $ivCte,
         |$kmPrefix,
         |${kmRoundCtes(3, sumsAtLast = false)},
         |xq AS (SELECT v AS qv FROM iv WHERE vec_id = 0),
         |xsc AS (SELECT iv.vec_id,
         |          SUM(iv.v[i] * q.qv[i]) AS dot,
         |          SUM(iv.v[i] * iv.v[i]) AS nv,
         |          SUM(q.qv[i] * q.qv[i]) AS nq
         |        FROM iv, xq q, idx WHERE iv.vec_id <> 0 GROUP BY iv.vec_id),
         |xtop AS (SELECT vec_id FROM (
         |           SELECT vec_id, CAST(dot AS DOUBLE) /
         |             (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |           FROM xsc) ORDER BY cos DESC, vec_id ASC LIMIT 5),
         |vq AS (SELECT iv.v AS qv, a.cluster AS qc
         |       FROM iv JOIN asg3 a USING (vec_id) WHERE iv.vec_id = 0),
         |vsc AS (SELECT iv.vec_id,
         |          SUM(iv.v[i] * q.qv[i]) AS dot,
         |          SUM(iv.v[i] * iv.v[i]) AS nv,
         |          SUM(q.qv[i] * q.qv[i]) AS nq
         |        FROM iv JOIN asg3 a USING (vec_id), vq q, idx
         |        WHERE a.cluster = q.qc AND iv.vec_id <> 0
         |        GROUP BY iv.vec_id),
         |vtop AS (SELECT vec_id FROM (
         |           SELECT vec_id, CAST(dot AS DOUBLE) /
         |             (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |           FROM vsc) ORDER BY cos DESC, vec_id ASC LIMIT 5),
         |lpl AS (SELECT UNNEST(range(0, ${PLANES})) AS p),
         |ldots AS (SELECT iv.vec_id, p,
         |            SUM(iv.v[i] * (CASE WHEN ((p+1)*(i+3)) % 7 < 3
         |              THEN 1 ELSE -1 END)) AS dp
         |          FROM iv, lpl, idx GROUP BY iv.vec_id, p),
         |lbk AS (SELECT vec_id,
         |          CAST(SUM(CASE WHEN dp >= 0 THEN CAST(POWER(2, p) AS BIGINT)
         |            ELSE 0 END) AS BIGINT) AS bucket
         |        FROM ldots GROUP BY vec_id),
         |lq AS (SELECT iv.v AS qv, lbk.bucket AS qbucket
         |       FROM iv JOIN lbk USING (vec_id) WHERE vec_id = 0),
         |lsc AS (SELECT iv.vec_id,
         |          SUM(iv.v[i] * q.qv[i]) AS dot,
         |          SUM(iv.v[i] * iv.v[i]) AS nv,
         |          SUM(q.qv[i] * q.qv[i]) AS nq
         |        FROM iv JOIN lbk USING (vec_id), lq q, idx
         |        WHERE lbk.bucket = q.qbucket AND iv.vec_id <> 0
         |        GROUP BY iv.vec_id),
         |ltop AS (SELECT vec_id FROM (
         |           SELECT vec_id, CAST(dot AS DOUBLE) /
         |             (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |           FROM lsc) ORDER BY cos DESC, vec_id ASC LIMIT 5),
         |ppidx AS (SELECT UNNEST(range(1, 17)) AS i),
         |ppsc AS (SELECT iv.vec_id,
         |           SUM(iv.v[i] * q.qv[i]) AS pdot,
         |           SUM(iv.v[i] * iv.v[i]) AS np,
         |           SUM(q.qv[i] * q.qv[i]) AS nqp
         |         FROM iv, xq q, ppidx GROUP BY iv.vec_id),
         |pcand AS (SELECT vec_id,
         |            CAST(pdot AS DOUBLE)
         |              / (SQRT(CAST(np AS DOUBLE)) * SQRT(CAST(nqp AS DOUBLE))) AS pcos
         |          FROM ppsc WHERE vec_id <> 0
         |          ORDER BY pcos DESC, vec_id ASC LIMIT 50),
         |prr AS (SELECT iv.vec_id,
         |          SUM(iv.v[i] * q.qv[i]) AS dot,
         |          SUM(iv.v[i] * iv.v[i]) AS nv,
         |          SUM(q.qv[i] * q.qv[i]) AS nq
         |        FROM iv JOIN pcand USING (vec_id), xq q, idx
         |        GROUP BY iv.vec_id),
         |ptop AS (SELECT vec_id FROM (
         |           SELECT vec_id, CAST(dot AS DOUBLE) /
         |             (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS cos
         |           FROM prr) ORDER BY cos DESC, vec_id ASC LIMIT 5),
         |${mtChainCtes("g")},
         |$graphCtes,
         |gtop AS (SELECT vec_id FROM gv$GraphRounds
         |         ORDER BY cos DESC, vec_id ASC LIMIT 5),
         |ntop AS (SELECT nbr AS vec_id FROM ndrk WHERE vid = 0
         |         ORDER BY rnk LIMIT 5)
         |SELECT * FROM (
         |  SELECT 'ivf_trained' AS family, CAST(5 AS BIGINT) AS k,
         |    (SELECT COUNT(*) FROM vtop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)) AS hits,
         |    CAST((SELECT COUNT(*) FROM vtop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)) AS DOUBLE) / 5.0 AS recall
         |  UNION ALL
         |  SELECT 'lsh', CAST(5 AS BIGINT),
         |    (SELECT COUNT(*) FROM ltop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)),
         |    CAST((SELECT COUNT(*) FROM ltop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)) AS DOUBLE) / 5.0
         |  UNION ALL
         |  SELECT 'prefix', CAST(5 AS BIGINT),
         |    (SELECT COUNT(*) FROM ptop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)),
         |    CAST((SELECT COUNT(*) FROM ptop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)) AS DOUBLE) / 5.0
         |  UNION ALL
         |  SELECT 'graph', CAST(5 AS BIGINT),
         |    (SELECT COUNT(*) FROM gtop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)),
         |    CAST((SELECT COUNT(*) FROM gtop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)) AS DOUBLE) / 5.0
         |  UNION ALL
         |  SELECT 'nnd_knn', CAST(5 AS BIGINT),
         |    (SELECT COUNT(*) FROM ntop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)),
         |    CAST((SELECT COUNT(*) FROM ntop
         |     WHERE vec_id IN (SELECT vec_id FROM xtop)) AS DOUBLE) / 5.0
         |) ORDER BY family""".stripMargin,

    // index-health replay: asg3 IS the trained assignment; counts per
    // cluster, the 1-row total as a scalar cross, same double op order
    "q_ann_index_stats" ->
      s"""WITH $ivCte,
         |$kmPrefix,
         |${kmRoundCtes(3, sumsAtLast = false)},
         |tot AS (SELECT COUNT(*) AS n_total FROM asg3)
         |SELECT a.cluster, COUNT(*) AS n_vecs,
         |  CAST(COUNT(*) AS DOUBLE) / CAST(tot.n_total AS DOUBLE) AS share,
         |  CAST(COUNT(*) AS DOUBLE) * 8.0 / CAST(tot.n_total AS DOUBLE)
         |    AS imbalance
         |FROM asg3 a, tot
         |GROUP BY a.cluster, tot.n_total
         |ORDER BY a.cluster""".stripMargin,

    "q_ann_ivfpq" -> ivfpqOracle(1),

    // the registered nprobe=2 point of the recall/cost curve: the router
    // emits the query's TOP-2 coarse clusters (same cos DESC, cid ASC
    // rule as centTopN), candidates double, the ADC cut widens to
    // 10*nprobe (the FAISS-style budget), the final top-5 is unchanged
    "q_ann_ivfpq_probe2" -> ivfpqOracle(2),

    "q_semantic_dedup" -> {
      // assignment = asg3 (the model after 2 updates, as in the trained
      // probe); pairs exist only within a cluster, norms come from vn.
      s"""WITH $semCtes
         |SELECT g.vec_id, g.cluster, (d.vec_id IS NOT NULL) AS is_dup
         |FROM asg3 g LEFT JOIN dup d USING (vec_id)
         |ORDER BY g.vec_id""".stripMargin
    },

    // Lloyd replayed via the shared chain; ranking on the same DECIMAL
    // idf-literal products as the Spark side (idfCase is ONE generator)
    "q_cluster_topics" ->
      s"""WITH $ivCte,
         |$kmPrefix,
         |${kmRoundCtes(3, sumsAtLast = false)},
         |toksct AS (SELECT doc_id,
         |    string_split_regex(lower(trim(text)), '\\s+') AS w
         |  FROM documents),
         |tok AS (SELECT doc_id,
         |    UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS term
         |  FROM toksct WHERE len(w) >= 2),
         |ct AS (SELECT a.cluster, t.term, COUNT(*) AS tf
         |       FROM tok t JOIN asg3 a ON a.vec_id = t.doc_id
         |       GROUP BY 1, 2),
         |dfx AS (SELECT term, COUNT(*) AS df FROM ct GROUP BY 1),
         |sc AS (SELECT ct.cluster, ct.term, ct.tf, dfx.df,
         |         CAST(ct.tf AS DECIMAL(20, 0)) * ($idfCase) AS score_d
         |       FROM ct JOIN dfx USING (term) WHERE dfx.df < 8),
         |r AS (SELECT cluster, term, tf, df, score_d,
         |        ROW_NUMBER() OVER (PARTITION BY cluster
         |          ORDER BY score_d DESC, term ASC) AS rnk
         |      FROM sc)
         |SELECT cluster, term, CAST(tf AS BIGINT) AS tf,
         |  CAST(df AS BIGINT) AS df, CAST(score_d AS DOUBLE) AS score,
         |  CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY cluster, rnk""".stripMargin,

    "q_pipeline_vectors" -> {
      s"""WITH $semCtes,
         |st AS (SELECT vec_id, v,
         |         list_max(list_transform(v, x -> abs(x))) AS amax
         |       FROM iv),
         |qt AS (SELECT vec_id, amax AS scale,
         |         list_transform(v, x -> CAST(CASE
         |           WHEN amax = 0 THEN 0
         |           WHEN x >= 0 THEN (2*x*127 + amax) // (2*amax)
         |           ELSE -((2*(-x)*127 + amax) // (2*amax)) END AS INTEGER)) AS qvec
         |       FROM st)
         |SELECT g.vec_id, g.cluster, qt.scale,
         |  array_to_string(qt.qvec, ',') AS qvec_csv
         |FROM asg3 g
         |LEFT JOIN dup d USING (vec_id)
         |JOIN qt USING (vec_id)
         |WHERE d.vec_id IS NULL
         |ORDER BY g.vec_id""".stripMargin
    },

    "q_knn_join" ->
      s"""WITH $ivCte,
         |sc AS (SELECT a.vec_id AS vid, b.vec_id AS nbr,
         |         SUM(a.v[i] * b.v[i]) AS dot,
         |         SUM(a.v[i] * a.v[i]) AS na,
         |         SUM(b.v[i] * b.v[i]) AS nb
         |       FROM iv a, iv b, idx WHERE a.vec_id <> b.vec_id
         |       GROUP BY a.vec_id, b.vec_id),
         |cs AS (SELECT vid, nbr,
         |         CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cos
         |       FROM sc),
         |rk AS (SELECT vid, nbr, cos,
         |         ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cos DESC, nbr ASC) AS rnk
         |       FROM cs)
         |SELECT vid AS vec_id, nbr AS nbr_id, cos, rnk
         |FROM rk WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin,

    // same exact scorer and (cos DESC, nbr ASC) tie rule as q_knn_join,
    // extended to k=5 and reduced to the per-label flag census
    "q_label_noise" ->
      s"""WITH $ivCte,
         |sc AS (SELECT a.vec_id AS vid, b.vec_id AS nbr,
         |         SUM(a.v[i] * b.v[i]) AS dot,
         |         SUM(a.v[i] * a.v[i]) AS na,
         |         SUM(b.v[i] * b.v[i]) AS nb
         |       FROM iv a, iv b, idx WHERE a.vec_id <> b.vec_id
         |       GROUP BY a.vec_id, b.vec_id),
         |cs AS (SELECT vid, nbr,
         |         CAST(dot AS DOUBLE)
         |           / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE)))
         |           AS cos
         |       FROM sc),
         |rk AS (SELECT vid, nbr,
         |         ROW_NUMBER() OVER (PARTITION BY vid
         |           ORDER BY cos DESC, nbr ASC) AS rnk
         |       FROM cs),
         |fl AS (SELECT rk.vid, o.label AS own_label,
         |         SUM(CASE WHEN nl.label = o.label THEN 1 ELSE 0 END) * 2
         |           < COUNT(*) AS flagged
         |       FROM rk
         |       JOIN iv o ON o.vec_id = rk.vid
         |       JOIN iv nl ON nl.vec_id = rk.nbr
         |       WHERE rnk <= 5
         |       GROUP BY rk.vid, o.label)
         |SELECT own_label AS label, COUNT(*) AS n_vecs,
         |  CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged,
         |  CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS flag_rate
         |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_knn_join_ann" ->
      s"""WITH $ivCte,
         |pl AS (SELECT UNNEST(range(0, ${PLANES})) AS p),
         |dots AS (SELECT iv.vec_id, p,
         |           SUM(iv.v[i] * (CASE WHEN ((p+1)*(i+3)) % 7 < 3 THEN 1 ELSE -1 END)) AS dp
         |         FROM iv, pl, idx GROUP BY iv.vec_id, p),
         |bk AS (SELECT vec_id,
         |         CAST(SUM(CASE WHEN dp >= 0 THEN CAST(POWER(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
         |       FROM dots GROUP BY vec_id),
         |probes AS (SELECT vec_id,
         |             UNNEST([bucket, xor(bucket, CAST(1 AS BIGINT)),
         |                     xor(bucket, CAST(2 AS BIGINT)), xor(bucket, CAST(4 AS BIGINT)),
         |                     xor(bucket, CAST(8 AS BIGINT))]) AS pb
         |           FROM bk),
         |cand AS (SELECT a.vec_id AS vec_a, p.vec_id AS vec_b
         |         FROM bk a JOIN probes p ON a.bucket = p.pb AND a.vec_id < p.vec_id),
         |sc AS (SELECT c.vec_a, c.vec_b,
         |         SUM(x.v[i] * y.v[i]) AS dot,
         |         SUM(x.v[i] * x.v[i]) AS na,
         |         SUM(y.v[i] * y.v[i]) AS nb
         |       FROM cand c
         |       JOIN iv x ON x.vec_id = c.vec_a
         |       JOIN iv y ON y.vec_id = c.vec_b, idx
         |       GROUP BY c.vec_a, c.vec_b),
         |cs AS (SELECT vec_a, vec_b,
         |         CAST(dot AS DOUBLE) / (SQRT(CAST(na AS DOUBLE)) * SQRT(CAST(nb AS DOUBLE))) AS cos
         |       FROM sc),
         |dir AS (SELECT vec_a AS vid, vec_b AS nbr, cos FROM cs
         |        UNION ALL SELECT vec_b, vec_a, cos FROM cs),
         |rk AS (SELECT vid, nbr, cos,
         |         ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cos DESC, nbr ASC) AS rnk
         |       FROM dir)
         |SELECT vid AS vec_id, nbr AS nbr_id, cos, rnk
         |FROM rk WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin,

    // Same plane signs as the Spark side, embedded as literal lists (the
    // CASE over l picks the table's flattened [plane*64 + dim] list);
    // chain shared with q_embed_neardup_lsh_multi via mtCtes.
    "q_knn_join_ann_multi" ->
      s"""WITH $mtCtes,
         |dir AS (SELECT vec_a AS vid, vec_b AS nbr, cos FROM cs
         |        UNION ALL SELECT vec_b, vec_a, cos FROM cs),
         |rk AS (SELECT vid, nbr, cos,
         |         ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cos DESC, nbr ASC) AS rnk
         |       FROM dir)
         |SELECT vid AS vec_id, nbr AS nbr_id, cos, rnk
         |FROM rk WHERE rnk <= 3 ORDER BY vec_id, rnk""".stripMargin,

    // same multi-table candidate CTEs; label joins + different-label
    // filter BEFORE the per-vector rank, same (cos DESC, nbr ASC) tie rule
    "q_hard_negatives" ->
      s"""WITH $mtCtes,
         |dir AS (SELECT vec_a AS vid, vec_b AS nbr, cos FROM cs
         |        UNION ALL SELECT vec_b, vec_a, cos FROM cs),
         |lbl AS (SELECT vec_id, label FROM embeddings),
         |neg AS (SELECT dir.vid, dir.nbr, dir.cos,
         |          a.label AS own_label, b.label AS nbr_label
         |        FROM dir JOIN lbl a ON a.vec_id = dir.vid
         |                 JOIN lbl b ON b.vec_id = dir.nbr
         |        WHERE a.label <> b.label),
         |rk AS (SELECT vid, nbr, cos, own_label, nbr_label,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY vid ORDER BY cos DESC, nbr ASC) AS rnk
         |       FROM neg)
         |SELECT vid AS vec_id, own_label, nbr AS nbr_id, nbr_label, cos, rnk
         |FROM rk WHERE rnk <= 2 ORDER BY vec_id, rnk""".stripMargin,

    // greedy MMR unrolled: pool = per-query relevance top-8 (rel DESC,
    // cand ASC), pairwise sims among the pool, then one CTE per pick —
    // the same 0.7·rel − 0.3·max-sim arithmetic and tie rule as the
    // Spark rounds, so every pick replays bit-for-bit
    "q_mmr_rerank" ->
      s"""WITH $ivCte,
         |q AS (SELECT vec_id AS qid, v AS qv FROM iv
         |      WHERE vec_id IN (${MmrQIds.mkString(", ")})),
         |sc AS (SELECT q.qid, iv.vec_id AS cand,
         |         SUM(iv.v[i] * q.qv[i]) AS dot,
         |         SUM(iv.v[i] * iv.v[i]) AS nv,
         |         SUM(q.qv[i] * q.qv[i]) AS nq
         |       FROM iv, q, idx WHERE iv.vec_id <> q.qid
         |       GROUP BY q.qid, iv.vec_id),
         |rl AS (SELECT qid, cand, CAST(dot AS DOUBLE) /
         |         (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))) AS rel
         |       FROM sc),
         |pool AS (SELECT qid, cand, rel FROM (
         |           SELECT qid, cand, rel, ROW_NUMBER() OVER (
         |             PARTITION BY qid ORDER BY rel DESC, cand ASC) AS rk
         |           FROM rl) WHERE rk <= $MmrPool),
         |ps AS (SELECT a.qid, a.cand AS ca, b.cand AS cb,
         |         CAST(SUM(x.v[i] * y.v[i]) AS DOUBLE) /
         |           (SQRT(CAST(SUM(x.v[i] * x.v[i]) AS DOUBLE)) *
         |            SQRT(CAST(SUM(y.v[i] * y.v[i]) AS DOUBLE))) AS sim
         |       FROM pool a JOIN pool b ON a.qid = b.qid AND a.cand <> b.cand
         |       JOIN iv x ON x.vec_id = a.cand
         |       JOIN iv y ON y.vec_id = b.cand, idx
         |       GROUP BY a.qid, a.cand, b.cand),
         |s1 AS (SELECT qid, cand AS sel, rel, rel AS score FROM (
         |         SELECT qid, cand, rel, ROW_NUMBER() OVER (
         |           PARTITION BY qid ORDER BY rel DESC, cand ASC) AS rk
         |         FROM pool) WHERE rk = 1),
         |m2 AS (SELECT p.qid, p.cand, p.rel,
         |         CAST($MmrLam AS DOUBLE) * p.rel -
         |           CAST($MmrDivW AS DOUBLE) * MAX(ps.sim) AS score
         |       FROM pool p JOIN s1 ON s1.qid = p.qid AND p.cand <> s1.sel
         |       JOIN ps ON ps.qid = p.qid AND ps.ca = p.cand AND ps.cb = s1.sel
         |       GROUP BY p.qid, p.cand, p.rel),
         |s2 AS (SELECT qid, cand AS sel, rel, score FROM (
         |         SELECT qid, cand, rel, score, ROW_NUMBER() OVER (
         |           PARTITION BY qid ORDER BY score DESC, cand ASC) AS rk
         |         FROM m2) WHERE rk = 1),
         |sel2 AS (SELECT qid, sel FROM s1 UNION ALL SELECT qid, sel FROM s2),
         |m3 AS (SELECT p.qid, p.cand, p.rel,
         |         CAST($MmrLam AS DOUBLE) * p.rel -
         |           CAST($MmrDivW AS DOUBLE) * MAX(ps.sim) AS score
         |       FROM pool p
         |       JOIN ps ON ps.qid = p.qid AND ps.ca = p.cand
         |       JOIN sel2 s ON s.qid = p.qid AND ps.cb = s.sel
         |       WHERE NOT EXISTS (SELECT 1 FROM sel2 z
         |                         WHERE z.qid = p.qid AND z.sel = p.cand)
         |       GROUP BY p.qid, p.cand, p.rel),
         |s3 AS (SELECT qid, cand AS sel, rel, score FROM (
         |         SELECT qid, cand, rel, score, ROW_NUMBER() OVER (
         |           PARTITION BY qid ORDER BY score DESC, cand ASC) AS rk
         |         FROM m3) WHERE rk = 1)
         |SELECT qid AS query_id, CAST(1 AS BIGINT) AS rnk, sel AS vec_id,
         |  rel, score FROM s1
         |UNION ALL SELECT qid, CAST(2 AS BIGINT), sel, rel, score FROM s2
         |UNION ALL SELECT qid, CAST(3 AS BIGINT), sel, rel, score FROM s3
         |ORDER BY query_id, rnk""".stripMargin,

    // same flattened ±1 sign list, same exact integer dots; list(y ORDER
    // BY r) rebuilds the projected vector in output-dim order
    "q_jl_project" ->
      s"""WITH $ivCte,
         |rdx AS (SELECT UNNEST(range(0, $JlOut)) AS r),
         |pj AS (SELECT vec_id, r,
         |         SUM(v[i] * list_extract($jlSqlLit, r*64 + i)) AS y
         |       FROM iv, rdx, idx GROUP BY vec_id, r),
         |ag AS (SELECT vec_id,
         |         array_to_string(list(y ORDER BY r), ',') AS proj_csv,
         |         CAST(SUM(y * y) AS BIGINT) AS nproj
         |       FROM pj GROUP BY vec_id),
         |vn2 AS (SELECT vec_id, CAST(SUM(v[i] * v[i]) AS BIGINT) AS nv
         |        FROM iv, idx GROUP BY vec_id)
         |SELECT ag.vec_id, proj_csv, nv, nproj,
         |  CAST(nproj AS DOUBLE) /
         |    (CAST($JlOut AS DOUBLE) * CAST(nv AS DOUBLE)) AS distortion
         |FROM ag JOIN vn2 ON vn2.vec_id = ag.vec_id
         |ORDER BY ag.vec_id""".stripMargin,

    // both rank lists recomputed from the shared CTEs; ROW_NUMBER with
    // the same (score DESC, id ASC) tie rule, fused identically
    "q_hybrid_rrf" ->
      s"""WITH ${graft.queries.TextOps.bm25Ctes},
         |$ivCte,
         |qv AS (SELECT v AS qv FROM iv WHERE vec_id = 0),
         |sc AS (SELECT iv.vec_id,
         |         SUM(iv.v[i] * qv.qv[i]) AS dot,
         |         SUM(iv.v[i] * iv.v[i]) AS nv,
         |         SUM(qv.qv[i] * qv.qv[i]) AS nq
         |       FROM iv, qv, idx WHERE iv.vec_id <> 0
         |       GROUP BY iv.vec_id),
         |vr AS (SELECT vec_id AS doc_id,
         |         ROW_NUMBER() OVER (ORDER BY
         |           CAST(dot AS DOUBLE) / (SQRT(CAST(nv AS DOUBLE))
         |             * SQRT(CAST(nq AS DOUBLE))) DESC, vec_id ASC) AS r_v
         |       FROM sc),
         |vtop AS (SELECT doc_id, r_v FROM vr WHERE r_v <= 20),
         |br AS (SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_bm
         |       FROM bscore),
         |btop AS (SELECT doc_id, r_bm FROM br WHERE r_bm <= 20)
         |SELECT COALESCE(btop.doc_id, vtop.doc_id) AS doc_id,
         |  COALESCE(1.0 / (60.0 + CAST(r_bm AS DOUBLE)), 0.0)
         |    + COALESCE(1.0 / (60.0 + CAST(r_v AS DOUBLE)), 0.0) AS rrf,
         |  btop.doc_id IS NOT NULL AS in_bm25,
         |  vtop.doc_id IS NOT NULL AS in_vec
         |FROM btop FULL OUTER JOIN vtop ON btop.doc_id = vtop.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    // the exact query's census over the multi-table candidate neighbors
    "q_label_noise_ann" ->
      s"""WITH $mtCtes,
         |dir AS (SELECT vec_a AS vid, vec_b AS nbr, cos FROM cs
         |        UNION ALL SELECT vec_b, vec_a, cos FROM cs),
         |rk AS (SELECT vid, nbr,
         |         ROW_NUMBER() OVER (PARTITION BY vid
         |           ORDER BY cos DESC, nbr ASC) AS rnk
         |       FROM dir),
         |fl AS (SELECT rk.vid, o.label AS own_label,
         |         SUM(CASE WHEN nl.label = o.label THEN 1 ELSE 0 END) * 2
         |           < COUNT(*) AS flagged
         |       FROM rk
         |       JOIN iv o ON o.vec_id = rk.vid
         |       JOIN iv nl ON nl.vec_id = rk.nbr
         |       WHERE rnk <= 5
         |       GROUP BY rk.vid, o.label)
         |SELECT own_label AS label, COUNT(*) AS n_vecs,
         |  CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_flagged,
         |  CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(COUNT(*) AS DOUBLE) AS flag_rate
         |FROM fl GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_embed_neardup_lsh_multi" ->
      s"""WITH $mtCtes
         |SELECT vec_a, vec_b, cos FROM cs
         |WHERE cos >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,

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
         |ORDER BY vec_a, vec_b""".stripMargin,

    // HUGEINT products mirror Spark's DECIMAL(18,0) promotion: both are
    // exact, and the single double division at the end sees identical
    // integers on both engines.
    "q_vector_quality" ->
      s"""WITH iv AS (SELECT label, len(embedding) AS dim,
         |    len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0 AS bad,
         |    ${sqlIntVec("embedding")} AS v
         |  FROM embeddings),
         |nv AS (SELECT label, dim, bad,
         |         list_aggregate(list_transform(v, x -> x * x), 'sum') AS nv
         |       FROM iv)
         |SELECT label, COUNT(*) AS n_vecs,
         |  MIN(dim) AS min_dim, MAX(dim) AS max_dim,
         |  CAST(SUM(CASE WHEN nv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
         |  CAST(MIN(nv) AS BIGINT) AS min_norm2, CAST(MAX(nv) AS BIGINT) AS max_norm2,
         |  CAST(SUM(nv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_norm2
         |FROM nv GROUP BY label ORDER BY label""".stripMargin,

    "q_embed_drift" ->
      s"""WITH iv AS (SELECT label, vec_id % 2 AS half,
         |             ${sqlIntVec("embedding")} AS v FROM embeddings),
         |idx AS (SELECT UNNEST(range(1, 65)) AS i),
         |sums AS (SELECT label, i AS pos,
         |           SUM(CASE WHEN half = 0 THEN v[i] ELSE 0 END) AS s0,
         |           SUM(CASE WHEN half = 1 THEN v[i] ELSE 0 END) AS s1
         |         FROM iv, idx GROUP BY 1, 2),
         |geom AS (SELECT label,
         |           SUM(CAST(s0 AS HUGEINT) * CAST(s1 AS HUGEINT)) AS dot,
         |           SUM(CAST(s0 AS HUGEINT) * CAST(s0 AS HUGEINT)) AS q0,
         |           SUM(CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)) AS q1
         |         FROM sums GROUP BY 1),
         |ns AS (SELECT label,
         |         CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |         CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
         |       FROM embeddings GROUP BY 1)
         |SELECT g.label, ns.n0, ns.n1,
         |  CASE WHEN q0 = 0 OR q1 = 0 THEN NULL
         |       ELSE CAST(dot AS DOUBLE)
         |         / (SQRT(CAST(q0 AS DOUBLE)) * SQRT(CAST(q1 AS DOUBLE)))
         |  END AS centroid_cos
         |FROM geom g JOIN ns USING (label) ORDER BY label""".stripMargin
  )
}
