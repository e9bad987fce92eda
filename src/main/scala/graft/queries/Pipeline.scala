package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus build — the pipeline a data-curation user
  * actually runs, composed from the library's own operators in ONE
  * oracle-verified query:
  *
  *   1. quality filter  ([[TextOps.qualityOkExpr]] — length/punct gates)
  *   2. language filter ([[TextOps.predLangExpr]] = 'en')
  *   3. LM perplexity gate ([[TextOps.docPerplexity]] ≤ [[TextOps.PplMax]]
  *      — the CCNet-style bigram-LM quality filter)
  *   4. exact dedup     (min doc_id per normalized-text md5 fingerprint,
  *      among GATED docs — gate before dedup, the streaming ingest's order)
  *   5. near-dup resolution (MinHash LSH pairs → connected components →
  *      component representative only, via the registered q_dedup_resolve)
  *
  * Shuffle budget at scale: the text predicates and fingerprint are pure
  * map work; the LM gate adds one bigram-keyed equi-join and one
  * doc_id-keyed aggregate (fanout 1 — see docPerplexity); exact dedup is
  * one window over the fingerprint hash; the near-dup and LM verdicts
  * join on doc_id (broadcastable — each verdict table is a handful of
  * narrow columns, tiny relative to the corpus with its text). Every
  * stage composes as a DataFrame, so Catalyst fuses the maps and prunes
  * `text` as soon as nothing downstream needs it.
  */
object Pipeline {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    "q_pipeline_corpus" -> ((s, d) => {
      val verdict = Dedup.queries("q_dedup_resolve")(s, d)
        .filter(col("keep") === 1L).select(col("doc_id"))
      val lmOk = TextOps.docPerplexity(s, d)
        .filter(col("ppl") <= TextOps.PplMax).select(col("doc_id"))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"),
          size(split(trim(col("text")), "\\s+")).as("n_words"),
          TextOps.qualityOkExpr.as("q_ok"),
          TextOps.predLangExpr.as("pred_lang"),
          TextOps.normFpExpr.as("fp"))
        // GATE BEFORE DEDUP: the fp representative is the min doc_id among
        // gated survivors, so a gate-failing duplicate can never erase its
        // whole content group — and the streaming ingest (gate →
        // dropDuplicates on the same fp) lands the same fp set by
        // construction.
        .filter(col("q_ok") && col("pred_lang") === "en")
        .withColumn("rep", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("rep"))
        .join(lmOk, "doc_id")    // LM perplexity gate
        .join(verdict, "doc_id") // near-dup survivors only
        .select(col("doc_id"), col("n_words"), col("fp"))
        .orderBy(col("doc_id"))
    }),

    // The events-family capstone: a TRAINING TABLE for a propensity
    // model, built time-split and leakage-free — features from strictly
    // BEFORE the cutoff (the last 7 calendar days are held out), the
    // label (did the user purchase?) from strictly AT/AFTER it. This is
    // the composition the events operators exist for: the cutoff is a
    // 1-row broadcast derived from the data, features are one user-keyed
    // aggregate over the feature window (counts, exact decimal purchase
    // value, active days, recency), the label is a distinct-user semi
    // set from the label window, attached LEFT so never-returning users
    // keep label=false. Two user-keyed shuffles total at any scale; no
    // feature can see past the cutoff by construction (same discipline
    // q_pit_join applies per-row).
    "q_pipeline_features" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          date_trunc("day", col("ts")).as("day"))
      val cutoff = ev.agg(max(col("day")).as("mx"))
        .select((col("mx") - expr("INTERVAL 6 DAYS")).as("cutoff"))
      val tagged = ev.crossJoin(broadcast(cutoff))
      val feat = tagged.filter(col("day") < col("cutoff"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"),
          graft.Num.dsum(when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0))).as("purchase_value"),
          countDistinct(col("day")).as("days_active"),
          datediff(max(col("cutoff")), max(col("day"))).cast("long")
            .as("recency_days"))
      val label = tagged
        .filter(col("day") >= col("cutoff") &&
          col("event_type") === "purchase")
        .select(col("user_id")).distinct()
        .withColumn("lbl", lit(true))
      feat.join(label, Seq("user_id"), "left")
        .select(col("user_id"), col("n_events"), col("n_purchases"),
          col("purchase_value"), col("days_active"), col("recency_days"),
          coalesce(col("lbl"), lit(false)).as("label_purchase"))
        .orderBy(col("user_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_corpus" ->
      s"""WITH RECURSIVE ${Dedup.resolveCtes},
         |${TextOps.pplCtes},
         |lmok AS (SELECT doc_id FROM pscore
         |         WHERE exp(-logprob / n_bigrams) <= ${TextOps.PplMax}),
         |survivors AS (
         |  SELECT d.doc_id
         |  FROM (SELECT DISTINCT doc_id FROM documents) d
         |  LEFT JOIN comp c ON c.doc = d.doc_id
         |  WHERE COALESCE(c.comp, d.doc_id) = d.doc_id),
         |meta AS (
         |  SELECT doc_id, text,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_words,
         |    length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS punct,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         |    CAST(len(regexp_extract_all(lower(text), '\\b(?:the|and|of|to|is|a)\\b')) AS INT) AS h_en,
         |    CAST(len(regexp_extract_all(lower(text), '\\b(?:el|la|de|que|y|es)\\b')) AS INT) AS h_es,
         |    CAST(len(regexp_extract_all(lower(text), '\\b(?:der|die|das|und|ist)\\b')) AS INT) AS h_de,
         |    CAST(len(regexp_extract_all(lower(text), '\\b(?:le|la|les|et|est)\\b')) AS INT) AS h_fr
         |  FROM documents),
         |scored AS (
         |  SELECT *,
         |    CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en > 0 THEN 'en'
         |         WHEN h_es >= h_de AND h_es >= h_fr AND h_es > 0 THEN 'es'
         |         WHEN h_de >= h_fr AND h_de > 0 THEN 'de'
         |         WHEN h_fr > 0 THEN 'fr'
         |         ELSE 'und' END AS pred_lang
         |  FROM meta),
         |gated AS (
         |  SELECT * FROM scored
         |  WHERE n_words BETWEEN 5 AND 1000 AND punct * 5 < length(text)
         |    AND pred_lang = 'en'),
         |reps AS (
         |  SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS rep FROM gated)
         |SELECT doc_id, n_words, fp
         |FROM reps JOIN survivors USING (doc_id) JOIN lmok USING (doc_id)
         |WHERE doc_id = rep
         |ORDER BY doc_id""".stripMargin,

    // same cutoff derivation and window split; the oracle states the
    // time-split contract the Spark aggregates implement
    "q_pipeline_features" ->
      s"""WITH ev AS (SELECT user_id, event_type, value,
         |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
         |ct AS (SELECT MAX(day) - INTERVAL 6 DAY AS cutoff FROM ev),
         |f AS (SELECT user_id, COUNT(*) AS n_events,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purchases,
         |    ${graft.Num.sqlDsum(
             "CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
         |      AS purchase_value,
         |    COUNT(DISTINCT day) AS days_active,
         |    CAST(date_diff('day', CAST(MAX(day) AS DATE),
         |      CAST(MAX(cutoff) AS DATE)) AS BIGINT) AS recency_days
         |  FROM ev, ct WHERE day < cutoff GROUP BY 1),
         |l AS (SELECT DISTINCT user_id FROM ev, ct
         |      WHERE day >= cutoff AND event_type = 'purchase')
         |SELECT f.user_id, n_events, n_purchases, purchase_value,
         |  days_active, recency_days,
         |  (l.user_id IS NOT NULL) AS label_purchase
         |FROM f LEFT JOIN l ON l.user_id = f.user_id
         |ORDER BY f.user_id""".stripMargin
  )
}
