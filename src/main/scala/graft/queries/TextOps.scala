package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis over the documents table — language ID, quality scoring,
  * token counting, fingerprinting (training-data-pipeline extensions).
  *
  * All per-document, embarrassingly parallel map work: no shuffle at any
  * scale, all counts integer, divisions double-at-the-end (deterministic
  * vs the DuckDB oracle).
  */
object TextOps {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // Stopword alternations per language (n-gram-free heuristic langid).
  private val Stops = Seq(
    "en" -> "(?:the|and|of|to|is|a)",
    "es" -> "(?:el|la|de|que|y|es)",
    "de" -> "(?:der|die|das|und|ist)",
    "fr" -> "(?:le|la|les|et|est)")

  private def hits(lang: String, pat: String) =
    size(regexp_extract_all(lower(col("text")), lit(s"\\b$pat\\b"), lit(0)))
      .as(s"h_$lang")

  /** Quality verdict over a `text` column (shared by q_text_quality and the
    * end-to-end corpus pipeline — one definition, no drift). */
  def qualityOkExpr: org.apache.spark.sql.Column = {
    val words = size(split(trim(col("text")), "\\s+"))
    val punct = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
    words >= 5 && words <= 1000 && punct * 5 < length(col("text"))
  }

  /** Predicted language over a `text` column (argmax stopword heuristic). */
  def predLangExpr: org.apache.spark.sql.Column = {
    val Seq(en, es, de, fr) = Stops.map { case (l, p) =>
      size(regexp_extract_all(lower(col("text")), lit(s"\\b$p\\b"), lit(0)))
    }
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  val queries: Map[String, QFn] = Map(

    // Token counting: whitespace tokens + a BPE-ish regex segmentation.
    "q_token_count" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
          size(regexp_extract_all(lower(col("text")),
            lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("bpe_tokens"),
          length(col("text")).as("chars"))
        .orderBy(col("doc_id"))),

    // Quality scoring: length/word/punctuation/stopword signals + verdict.
    "q_text_quality" -> ((s, d) => {
      val words = size(split(trim(col("text")), "\\s+"))
      val nonSpace = length(regexp_replace(col("text"), "\\s", ""))
      val punct = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
      val stop = size(regexp_extract_all(lower(col("text")),
        lit("\\b(?:the|and|of|to|is|a)\\b"), lit(0)))
      t(s, d, "documents")
        .select(col("doc_id"),
          length(col("text")).as("n_chars_m"),
          words.as("n_words"),
          (nonSpace.cast("double") / words.cast("double")).as("avg_word_len"),
          (punct.cast("double") / length(col("text")).cast("double")).as("punct_ratio"),
          (stop.cast("double") / words.cast("double")).as("stop_ratio"),
          (words >= 5 && words <= 1000 && punct * 5 < length(col("text"))).as("quality_ok"))
        .orderBy(col("doc_id"))
    }),

    // Language ID: argmax of per-language stopword hits, 'und' if all zero.
    "q_lang_id" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id") +: col("lang").as("lang_true") +:
          Stops.map { case (l, p) => hits(l, p) }: _*)
      val Seq(en, es, de, fr) = Stops.map { case (l, _) => col(s"h_$l") }
      base.withColumn("pred_lang",
          when(en >= es && en >= de && en >= fr && en > 0, "en")
            .when(es >= de && es >= fr && es > 0, "es")
            .when(de >= fr && de > 0, "de")
            .when(fr > 0, "fr")
            .otherwise("und"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprint: md5 over whitespace-normalized lowercase text,
    // plus a 16-bit shard bucket from the first 4 hex chars.
    "q_fingerprint" -> ((s, d) => {
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      t(s, d, "documents")
        .select(col("doc_id"), md5(encode(norm, "UTF-8")).as("fp"))
        .withColumn("bucket",
          conv(substring(col("fp"), 1, 4), 16, 10).cast("long"))
        .orderBy(col("doc_id"))
    })
  )

  private def sqlHits(pat: String) =
    s"CAST(len(regexp_extract_all(lower(text), '\\b$pat\\b')) AS INT)"

  val oracleSql: Map[String, String] = Map(
    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS bpe_tokens,
        |  CAST(length(text) AS INT) AS chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_m,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_words,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |    / len(string_split_regex(trim(text), '\s+')) AS avg_word_len,
        |  CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CAST(len(regexp_extract_all(lower(text), '\b(?:the|and|of|to|is|a)\b')) AS DOUBLE)
        |    / len(string_split_regex(trim(text), '\s+')) AS stop_ratio,
        |  (len(string_split_regex(trim(text), '\s+')) BETWEEN 5 AND 1000
        |   AND length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) * 5 < length(text)) AS quality_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_id" -> {
      val h = Stops.map { case (l, p) => s"${sqlHits(p)} AS h_$l" }.mkString(",\n  ")
      s"""WITH h AS (SELECT doc_id, lang AS lang_true,
         |  $h
         |FROM documents)
         |SELECT doc_id, lang_true, h_en, h_es, h_de, h_fr,
         |  CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en > 0 THEN 'en'
         |       WHEN h_es >= h_de AND h_es >= h_fr AND h_es > 0 THEN 'es'
         |       WHEN h_de >= h_fr AND h_de > 0 THEN 'de'
         |       WHEN h_fr > 0 THEN 'fr'
         |       ELSE 'und' END AS pred_lang
         |FROM h ORDER BY doc_id""".stripMargin
    },

    "q_fingerprint" ->
      """WITH f AS (SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents)
        |SELECT doc_id, fp,
        |  CAST((((strpos('0123456789abcdef', substr(fp, 1, 1)) - 1) * 4096)
        |      + ((strpos('0123456789abcdef', substr(fp, 2, 1)) - 1) * 256)
        |      + ((strpos('0123456789abcdef', substr(fp, 3, 1)) - 1) * 16)
        |      +  (strpos('0123456789abcdef', substr(fp, 4, 1)) - 1)) AS BIGINT) AS bucket
        |FROM f ORDER BY doc_id""".stripMargin
  )
}
