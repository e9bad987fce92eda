package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The corpus parquet is PII-free, so q_pii_scrub's counts are zero there
  * (oracle-verified but trivially). This spec exercises the SAME scrub
  * expressions on synthetic PII — the behavior contract lives here. */
class TextOpsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def scrub(texts: String*) = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    // staged counts, matching q_pii_scrub: each pass counts on the text
    // the PREVIOUS passes already redacted
    val afterEmail = regexp_replace(col("text"), TextOps.EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, TextOps.Ipv4Re, "<IP>")
    df.select(col("doc_id"),
        TextOps.piiCount(col("text"), TextOps.EmailRe).as("n_emails"),
        TextOps.piiCount(afterIp, TextOps.PhoneRe).as("n_phones"),
        TextOps.piiCount(afterEmail, TextOps.Ipv4Re).as("n_ips"),
        TextOps.piiScrub(col("text")).as("scrubbed"))
      .orderBy(col("doc_id")).collect()
  }

  test("emails are counted and redacted") {
    val r = scrub("contact alice.smith+x@example-corp.co.uk or bob@test.io today")
    assert(r(0).getAs[Int]("n_emails") == 2)
    assert(r(0).getAs[String]("scrubbed") == "contact <EMAIL> or <EMAIL> today")
  }

  test("phones and IPs are counted and redacted, plain text untouched") {
    val r = scrub(
      "call +1 (555) 123-4567 now",
      "server at 192.168.0.1 responded",
      "the quick brown fox")
    assert(r(0).getAs[Int]("n_phones") == 1)
    assert(r(0).getAs[String]("scrubbed") == "call <PHONE> now")
    assert(r(1).getAs[Int]("n_ips") == 1)
    assert(r(1).getAs[String]("scrubbed") == "server at <IP> responded")
    assert(r(2).getAs[Int]("n_emails") + r(2).getAs[Int]("n_phones") +
      r(2).getAs[Int]("n_ips") == 0)
    assert(r(2).getAs[String]("scrubbed") == "the quick brown fox")
  }

  test("mixed PII in one document: email collapses before the phone pass") {
    val r = scrub("mail 555123456789@relay.example.com or dial 555 123 4567 at 10.0.0.7")
    assert(r(0).getAs[Int]("n_emails") == 1)
    assert(r(0).getAs[Int]("n_ips") == 1)
    // the email's digit-heavy local part is NOT double-counted as a phone:
    // the phone count runs on the email/IP-scrubbed text
    assert(r(0).getAs[Int]("n_phones") == 1)
    assert(r(0).getAs[String]("scrubbed") == "mail <EMAIL> or dial <PHONE> at <IP>")
  }

  test("repetition filter flags a degenerate document") {
    val rep = ("spam " * 50).trim
    val ok = "the quick brown fox jumps over a lazy dog near the river bank today"
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(1L, rep), Row(2L, ok)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    // same shape as q_repetition_filter, against the in-memory frame
    val w = split(trim(lower(col("text"))), "\\s+")
    val tok = df.select(col("doc_id"), explode(w).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val top = tok.groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_word_frac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top(1L) == 1.0)      // all-one-word doc
    assert(top(2L) <= 0.15)     // natural text passes the gate
  }

  test("q_lang_id trigram tier beats the stopword tier on a planted multilingual fixture") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("langid-ml")
    // real prose per language; the last doc of each group carries NO full
    // stopword from its language's list (the stopword tier's blind spot —
    // it must fall through or misfire there), while trigram morphology
    // (affixes, accented clusters) still identifies it
    val fixture = Seq(
      "en" -> "the weather station reported heavy rainfall during the night and the morning",
      "en" -> "reading and writing are essential skills for learning throughout the whole life",
      "en" -> "the engineers tested the new bridge before opening it to the heavy traffic",
      "en" -> "walking every morning brings lasting benefits to the body and the mind",
      "es" -> "el perro corre por la calle cuando la niña come una manzana madura",
      "es" -> "la educación y la cultura son la base de una sociedad sana y libre",
      "es" -> "el gobierno anunció que los precios del mercado subieron demasiado rápido",
      "es" -> "pájaros cansados caminaban despacio buscando comida cerca del arroyo",
      "de" -> "der hund läuft durch die straße und das mädchen isst einen apfel",
      "de" -> "ich möchte ein schönes geschenk für die kleine schwester kaufen",
      "de" -> "die forschung und die wissenschaft entwickeln sich schnell und gründlich",
      "de" -> "schnelle entwicklung durch gründliche forschung ermöglicht nachhaltige verbesserungen",
      "fr" -> "le chien court dans la rue et la fille mange une pomme rouge",
      "fr" -> "les enfants aiment jouer dans le jardin pendant les longues vacances",
      "fr" -> "le lecteur attentif trouvait toujours une grande satisfaction dans les livres",
      "fr" -> "une bonne lecture apporte une grande satisfaction chaleureuse aux voyageurs",
      // round-14 tier widening: pt/it/nl, same pattern — last doc of each
      // group avoids its language's clearest function words
      "pt" -> "a educação do povo é uma das grandes missões da nação portuguesa",
      "pt" -> "o menino ganhou um livro da biblioteca e uma maçã do pomar vizinho",
      "pt" -> "as lições da história mostram que as nações crescem com educação",
      "pt" -> "coração apaixonado, canções antigas, tradições guardadas em cada geração",
      "it" -> "il ragazzo legge il giornale mentre gli amici giocano in piazza",
      "it" -> "la città offre una grande quantità di opportunità per gli studenti",
      "it" -> "il professore spiega la lezione di storia con grande passione",
      "it" -> "felicità, serenità, generosità: parole che illuminano ogni piazza italiana",
      "nl" -> "het meisje loopt door de straat en de jongen eet een appel",
      "nl" -> "het weerbericht voorspelt zware regen van de kust naar het oosten",
      "nl" -> "de leraar geeft een moeilijk boek aan de ijverige leerlingen van de klas",
      "nl" -> "prachtige vergezichten lijken eerlijk gezegd bijzonder rijk wanneer wandelaars tijdig vertrekken")
    val df = spark.createDataFrame(
      fixture.zipWithIndex.map { case ((l, t), i) => Row(i.toLong, t, l) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType))))
    df.write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_lang_id")(spark, dir).collect()
    val n = rows.length.toDouble
    val stopAcc = rows.count(r =>
      r.getAs[String]("pred_lang") == r.getAs[String]("lang_true")) / n
    val ngramAcc = rows.count(r =>
      r.getAs[String]("pred_lang_ngram") == r.getAs[String]("lang_true")) / n
    info(f"stopword-tier accuracy: $stopAcc%.2f, trigram-tier accuracy: $ngramAcc%.2f")
    assert(ngramAcc >= stopAcc,
      f"trigram tier $ngramAcc%.2f fell below the stopword tier $stopAcc%.2f")
    // deterministic fixture — the measured values, not hopeful floors
    assert(ngramAcc == 1.0, rows.map(r => (r.getAs[String]("lang_true"),
      r.getAs[String]("pred_lang_ngram"))).mkString(", "))
    assert(stopAcc < 1.0, "fixture no longer has a stopword-tier blind spot")
  }

  test("q_bpe_step rank-1 is the most frequent weighted pair on a known corpus") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("bpe-known")
    // words: aaab x3, cd x1, xy x1 → pairs (a,a):6 (a,b):3 (c,d):1 (x,y):1
    val df = spark.createDataFrame(
      Seq(Row(1L, "aaab aaab cd"), Row(2L, "aaab xy")).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    df.write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_bpe_step")(spark, dir).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("a", "a", 6L, 1L), ("a", "b", 3L, 2L), ("c", "d", 1L, 3L), ("x", "y", 1L, 4L)))
  }

  test("q_bpe_train learns the known merge sequence and stops when pairs run out") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("bpe-train")
    // aaab x3, cd, xy. Round 1: (a,a):6 → aa;a;b;. Round 2 ties (aa,a):3
    // vs (a,b):3 — pair-asc tie-break picks (a,b) → aa;ab;. Round 3:
    // (aa,ab):3 → aaab;. Rounds 4-5: (c,d), (x,y). Round 6: no pairs left
    // → the loop stops at 5 merges though 8 were requested.
    val df = spark.createDataFrame(
      Seq(Row(1L, "aaab aaab cd"), Row(2L, "aaab xy")).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    df.write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_bpe_train")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1L, "a", "a", "aa", 6L), (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 3L), (4L, "c", "d", "cd", 1L),
      (5L, "x", "y", "xy", 1L)))
    val enc = SparkEntry.queries("q_bpe_encode")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(enc.toSeq == Seq(("aaab", 3L, 1L), ("cd", 1L, 2L), ("xy", 1L, 3L)))
  }

  test("q_bpe_train round 1 IS q_bpe_step's rank-1 merge") {
    val step = SparkEntry.queries("q_bpe_step")(spark, sf)
      .filter(col("rank") === 1L).collect().head
    val train = SparkEntry.queries("q_bpe_train")(spark, sf)
      .filter(col("rank") === 1L).collect().head
    assert((train.getString(1), train.getString(2), train.getLong(4)) ==
      (step.getString(0), step.getString(1), step.getLong(2)))
  }

  test("q_bpe_step: word-weighted pair counts equal naive per-occurrence counts") {
    // the factorization under test: counting pairs once per DISTINCT word
    // weighted by word count must equal counting them on every occurrence
    val naive = graft.Tables.load(spark, sf, "documents")
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+"), lit(0))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> " +
          "struct(substring(w, i, 1) as l, substring(w, i + 1, 1) as r))")).as("p"))
      .groupBy(col("p.l").as("sym_l"), col("p.r").as("sym_r"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("sym_l"), col("sym_r"))
      .limit(TextOps.BpeTopPairs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val fact = SparkEntry.queries("q_bpe_step")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(fact == naive)
  }

  test("q_vocab_coverage matches brute-force prefix coverage and grows monotonically") {
    val Array(r) = SparkEntry.queries("q_vocab_coverage")(spark, sf).collect()
    val counts = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(row => "[a-z]+|[0-9]+".r.findAllIn(row.getString(0).toLowerCase))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val sorted = counts.toSeq.sortBy { case (w, c) => (-c, w) }.map(_._2)
    val total = sorted.sum.toDouble
    assert(r.getLong(0) === sorted.length.toLong)
    assert(r.getLong(1) === sorted.sum)
    val ks = Seq(64, 256, 1024, 4096)
    val covs = ks.indices.map(i => r.getDouble(2 + i))
    ks.zip(covs).foreach { case (k, got) =>
      val want = sorted.take(k).sum / total
      assert(math.abs(got - want) < 1e-12, s"top-$k coverage $got != $want")
    }
    // monotone in k, bounded by 1, and Zipf-fast at the head
    assert(covs === covs.sorted)
    assert(covs.last <= 1.0 + 1e-12 && covs.head > 0.0)
  }

  test("q_zipf_fit matches a brute-force log-log regression over word counts") {
    val Array(r) = SparkEntry.queries("q_zipf_fit")(spark, sf).collect()
    val counts = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(row => "[a-z]+|[0-9]+".r.findAllIn(row.getString(0).toLowerCase))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val ranked = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .zipWithIndex.map { case ((_, c), i0) => ((i0 + 1).toLong, c) }
    val n = ranked.length.toDouble
    val xs = ranked.map(e => math.log(e._1.toDouble))
    val ys = ranked.map(e => math.log(e._2.toDouble))
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert(r.getLong(0) === ranked.length.toLong)
    assert(r.getLong(1) === counts.values.sum)
    assert(r.getLong(2) === counts.values.count(_ == 1L).toLong)
    assert(math.abs(r.getDouble(5) - slope) < 1e-9)
    assert(r.getDouble(5) < 0.0, "frequency must fall with rank")
  }

  test("q_chi2_independence: observed and expected masses both sum to N; terms non-negative") {
    val rows = SparkEntry.queries("q_chi2_independence")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum === total)
    // expected cell masses reconstruct N when every (row, col) pair
    // present in the data is covered — allow the missing-cell defect
    val expectedSum = rows.map(_.getDouble(3)).sum
    assert(expectedSum <= total + 1e-6)
    assert(expectedSum > total * 0.9, "expected mass must cover most of N")
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("q_cooccur_pmi: every reported pair's pmi matches brute-force counts") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        "[a-z]+|[0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSet)
    val n = docs.length.toDouble
    val dfT = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val rows = SparkEntry.queries("q_cooccur_pmi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // columns are (a, b, df_ab, pmi) — read positionally
      val (ca, cb, dfAb) = (r.getString(0), r.getString(1), r.getLong(2))
      val expectedDfAb = docs.count { case (_, tks) => tks(ca) && tks(cb) }
      assert(dfAb === expectedDfAb.toLong, s"df_ab($ca,$cb)")
      val pmi = math.log(dfAb * n / (dfT(ca).toDouble * dfT(cb).toDouble))
      assert(math.abs(r.getDouble(3) - pmi) < 1e-9, s"pmi($ca,$cb)")
      assert(ca < cb, "canonical orientation")
    }
  }

  test("q_inverted_index: postings are sorted, truncated at 20, consistent with df") {
    val rows = SparkEntry.queries("q_inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val ids = r.getString(2).split(",").map(_.toLong)
      assert(df >= 5L)
      assert(ids.length <= 20, "posting list must be truncated at 20")
      assert(ids.sameElements(ids.sorted), "postings must ascend")
      assert(ids.distinct.length === ids.length, "postings must be distinct")
      if (df <= 20) assert(ids.length === df,
        s"untruncated postings must carry exactly df ids (${r.getString(0)})")
      else assert(ids.length === 20)
    }
  }

  test("q_quality_quantile keeps exactly the at-or-above-threshold docs") {
    val rows = SparkEntry.queries("q_quality_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    val thr = rows.head.getDouble(2)
    rows.foreach(r => assert(r.getLong(1) >= thr))
    // independent count of qualifying docs — nothing above the cut dropped
    val expected = graft.Tables.load(spark, sf, "documents")
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .filter(col("n") >= thr).count()
    assert(rows.length.toLong === expected)
    // the cut is a real quantile: keeps between 25% and ~50% of the corpus
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length.toLong * 4 >= total,
      "p75 cut must keep at least a quarter of the corpus")
  }

  test("q_model_calibration equals the panel rebuilt from the two underlying scorers") {
    val scores = graft.SparkEntry.queries("q_quality_model")(spark, sf)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val gates = graft.SparkEntry.queries("q_text_quality")(spark, sf)
      .select("doc_id", "quality_ok").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val want = scores.toSeq.groupBy { case (_, sc) =>
      math.min(math.floor(sc * 10).toLong, 9L)
    }.map { case (dec, g) =>
      val n = g.size
      val pass = g.count { case (id, _) => gates(id) }
      dec -> (n.toLong, g.map(_._2).sum / n, pass.toDouble / n)
    }
    val got = graft.SparkEntry.queries("q_model_calibration")(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == scores.size.toLong, "docs partitioned")
    got.foreach { r =>
      val (dec, n, ms, pr, gap) = (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (wn, wms, wpr) = want(dec)
      assert(n == wn, s"decile $dec n")
      assert(math.abs(ms - wms) < 1e-6, s"decile $dec mean score")
      assert(math.abs(pr - wpr) < 1e-12, s"decile $dec pass rate")
      assert(math.abs(gap - (ms - pr)) < 1e-12, s"decile $dec gap")
      // the bin mean lives inside its own bin (clamped top bin excepted)
      if (dec < 9) assert(ms >= dec / 10.0 - 1e-9 && ms < (dec + 1) / 10.0 + 1e-9)
    }
  }

  test("q_feature_hash equals the in-memory hashing-trick replay") {
    val got = graft.SparkEntry.queries("q_feature_hash")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(s: String): Long = {
      val b = md.digest(s.getBytes("UTF-8"))
      ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
        ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
    }
    docs.foreach { case (id, text) =>
      val buckets = scala.collection.mutable.Map.empty[Long, Long]
      text.trim.toLowerCase.split("\\s+").foreach { tkn =>
        val h = u32(tkn)
        val sgn = if ((h / 256) % 2 == 0) 1L else -1L
        buckets(h % 256) = buckets.getOrElse(h % 256, 0L) + sgn
      }
      val nz = buckets.values.filter(_ != 0L)
      val want = (nz.size.toLong, nz.map(math.abs).sum, nz.map(v => v * v).sum)
      assert(got(id) == want, s"doc $id")
      // signed-sum invariants: every nonzero contributes at least 1 to
      // both norms, and L1² bounds L2²
      val (n, l1, l2) = got(id)
      assert(l1 >= n && l2 >= n && l1 * l1 >= l2)
    }
  }

  test("q_preference_pairs pairs best vs worst per group; ties split to distinct docs") {
    import spark.implicits._
    // (en, A): doc 1 is clearly best (long, stopword-dense, no punct),
    // doc 2 clearly worst (short, punct-heavy), doc 3 in between.
    // (en, B): two IDENTICAL texts -> logit tie -> chosen = lower id,
    // rejected = higher id (still a valid distinct pair).
    // (fr, C): singleton group -> excluded (n_docs < 2).
    val good = ("the and of to is a " * 20).trim
    val bad = "!!! ??? ;;; ::: x"
    val mid = "the cat sat on the mat and looked to the door of a house"
    val same = "the same words every time and a few of them to it is"
    val docs = Seq(
      (1L, good, "en", "A"), (2L, bad, "en", "A"), (3L, mid, "en", "A"),
      (10L, same, "en", "B"), (11L, same, "en", "B"),
      (20L, mid, "fr", "C")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpDir("prefpairs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_preference_pairs")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))).toMap
    assert(got.keySet === Set(("en", "A"), ("en", "B")))
    val a = got(("en", "A"))
    assert(a._1 === 3L) // n_docs
    assert(a._2 === 1L && a._3 === 2L, s"chosen/rejected: $a")
    assert(a._4 > a._5, "chosen_score must exceed rejected_score")
    assert(a._6 > 0.0, "margin_logit must be positive")
    val b = got(("en", "B"))
    assert(b._2 === 10L && b._3 === 11L, s"tie pair: $b")
    assert(b._6 === 0.0, "identical texts -> zero margin")
  }

  test("q_auc matches the O(n²) pairwise Mann-Whitney definition") {
    // The query computes AUC via the grouped rank formulation (distributed,
    // tie-aware); the DEFINITION is the mean over all (pos, neg) pairs of
    // [z_p > z_n] with half-credit on ties. Brute-force the definition over
    // the same per-doc logits and demand agreement — formula vs meaning.
    val rows = graft.Tables.load(spark, sf, "documents")
      .filter(col("text").isNotNull && col("lang").isNotNull)
      .select(TextOps.qualityLogitExpr.as("z"), (col("lang") === "en").as("ok"))
      .collect()
    val pos = rows.filter(_.getBoolean(1)).map(_.getDouble(0))
    val neg = rows.filterNot(_.getBoolean(1)).map(_.getDouble(0))
    assert(pos.nonEmpty && neg.nonEmpty, "fixture corpus lost its class balance")
    var s = 0.0
    for (p <- pos; n <- neg)
      s += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val expected = s / (pos.length.toDouble * neg.length.toDouble)
    val r = SparkEntry.queries("q_auc")(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_pos") == pos.length.toLong)
    assert(r(0).getAs[Long]("n_neg") == neg.length.toLong)
    assert(math.abs(r(0).getAs[Double]("auc") - expected) < 1e-12,
      s"auc ${r(0).getAs[Double]("auc")} vs pairwise $expected")
    assert(math.abs(r(0).getAs[Double]("gini_coef") -
      (2.0 * expected - 1.0)) < 1e-12)
  }

  test("q_gate_agreement: hand-computed matrix, kappa and McNemar on a planted fixture") {
    import spark.implicits._
    // four doc archetypes hitting each confusion cell:
    val bothPass = "the cat and the dog went to the house of the friend and" // rule ok, z≈3.97
    val ruleOnly = "cat dog house friend river bank today"                   // rule ok, z≈−0.97
    val modelOnly = "the of to is"                                           // <5 words, z=7.0
    val bothFail = "%%%% @@@@"                                               // <5 words, z<0
    // multiplicities 3/2/1/2 → po=5/8, pa1=5/8, pb1=1/2, pe=1/2,
    // kappa=(5/8−1/2)/(1/2)=0.25, McNemar=(2−1)²/(2+1)=1/3
    val docs = (Seq.fill(3)(bothPass) ++ Seq.fill(2)(ruleOnly) ++
      Seq(modelOnly) ++ Seq.fill(2)(bothFail)).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en") }
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpDir("gate-agree")
    docs.write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_gate_agreement")(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_both_pass") == 3L, r(0).toString)
    assert(r(0).getAs[Long]("n_rule_only") == 2L, r(0).toString)
    assert(r(0).getAs[Long]("n_model_only") == 1L, r(0).toString)
    assert(r(0).getAs[Long]("n_both_fail") == 2L, r(0).toString)
    assert(r(0).getAs[Double]("p_agree") == 0.625)
    assert(r(0).getAs[Double]("kappa") == 0.25)
    assert(r(0).getAs[Double]("mcnemar_chi2") == 1.0 / 3.0)
  }

  test("q_isotonic_calibration equals the classic stack PAV and is monotone") {
    // The query uses the CLOSED-FORM max-min isotonic fit
    // (iso_i = max_{j<=i} min_{k>=i} mean(p)_{j..k}); the CLASSIC
    // algorithm is the stack PAV (merge the top block while it
    // violates). Both characterize the same unique weighted isotonic
    // regression, so they must land on the identical fit — replay the
    // stack on the query's own input bins and demand exact per-bin
    // equality. (An earlier unrolled adjacent-pooling formulation could
    // 2-cycle by splitting pooled blocks; this replay is what caught it.)
    val rows = SparkEntry.queries("q_isotonic_calibration")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.length >= 2, "corpus lost its decile spread")
    val ns = rows.map(_.getAs[Long]("n_docs"))
    val ps = rows.map(r =>
      math.round(r.getAs[Double]("raw_rate") * r.getAs[Long]("n_docs")))
    final case class Blk(n: Long, p: Long, width: Int) {
      def rate: Double = p.toDouble / n.toDouble
    }
    val st = scala.collection.mutable.ArrayBuffer.empty[Blk]
    for (i <- rows.indices) {
      var b = Blk(ns(i), ps(i), 1)
      while (st.nonEmpty && st.last.rate > b.rate) {
        val t = st.remove(st.length - 1)
        b = Blk(t.n + b.n, t.p + b.p, t.width + b.width)
      }
      st += b
    }
    val expected = st.flatMap(b => Seq.fill(b.width)(b.rate)).toArray
    val got = rows.map(_.getAs[Double]("iso_rate"))
    assert(got.length == expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"bin ${rows(i).getAs[Long]("bin")}: query $g vs stack $e")
    }
    // the defining property: the released map is monotone non-decreasing
    got.sliding(2).foreach { case Array(a, b) => assert(a <= b, got.mkString(",")) }
  }

  test("q_auc is 1.0 on a perfectly separated fixture and 0.5 on a fully tied one") {
    import spark.implicits._
    // long clean English text scores high z; punctuation-heavy short text
    // scores low — planted so every 'en' doc outranks every non-en doc
    val hi = ("the cat and the dog went to the house of the friend and " * 6).trim
    val lo = "%%%% @@@@ !!!! ???? &&&& ####"
    val sep = ((1 to 4).map(i => (i.toLong, hi, "en")) ++
      (5 to 8).map(i => (i.toLong, lo, "de"))).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")).cast("long"))
    val d1 = tmpDir("auc-sep")
    sep.write.parquet(s"$d1/documents.parquet")
    val r1 = SparkEntry.queries("q_auc")(spark, d1).collect()(0)
    assert(r1.getAs[Double]("auc") == 1.0, r1.toString)
    // identical text in both classes -> every pair ties -> exactly 0.5
    val tied = ((1 to 3).map(i => (i.toLong, hi, "en")) ++
      (4 to 6).map(i => (i.toLong, hi, "fr"))).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")).cast("long"))
    val d2 = tmpDir("auc-tied")
    tied.write.parquet(s"$d2/documents.parquet")
    val r2 = SparkEntry.queries("q_auc")(spark, d2).collect()(0)
    assert(r2.getAs[Double]("auc") == 0.5, r2.toString)
    assert(r2.getAs[Double]("gini_coef") == 0.0)
  }

  test("q_ppl_buckets: two-pass rank equals one-window semantics; thirds balanced per language") {
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q_ppl_buckets")(spark, sf).collect()
    assert(got.nonEmpty)
    // single-window replay of the reference semantics over the same asset
    val ppl = SparkEntry.queries("q_lm_perplexity")(spark, sf)
      .select(col("doc_id"), col("ppl"),
        (-col("logprob") / col("n_bigrams").cast("double")).as("nlp"))
      .join(graft.Tables.load(spark, sf, "documents").select("doc_id", "lang"), "doc_id")
    val w = Window.partitionBy(col("lang")).orderBy(col("nlp"), col("doc_id"))
    val want = ppl.withColumn("r", row_number().over(w).cast("long")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("r")).toMap
    got.foreach { r =>
      assert(r.getAs[Long]("r") == want(r.getAs[Long]("doc_id")),
        s"two-pass rank must equal the single-window rank: $r")
    }
    // exact thirds: per language, |head| and |tail| differ by at most 1 and
    // head ranks strictly precede middle which precede tail
    got.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_.getAs[String]("bucket"))
        .map { case (b, g) => b -> g.map(_.getAs[Long]("r")).sorted }
      val n = rows.length.toLong
      Seq("head", "middle", "tail").foreach(b => assert(byBucket.contains(b) || n < 3,
        s"$lang missing bucket $b"))
      if (n >= 3) {
        assert(math.abs(byBucket("head").length - byBucket("tail").length) <= 1, lang)
        assert(byBucket("head").max < byBucket("middle").min, lang)
        assert(byBucket("middle").max < byBucket("tail").min, lang)
        assert(byBucket("head").length == (n / 3).toInt, s"$lang head = floor(n/3)")
      }
    }
  }

  test("q_lang_mix flags concatenated-language docs; monolingual and short docs stay consistent") {
    import spark.implicits._
    val en = ("the thing is going to the end of the morning and " +
      "the sound of the thing is the song ") * 2
    val de = ("der schein und die schicht ein ding und die sache " +
      "der schule noch ich dich ein buch ") * 2
    val docs = Seq(
      (1L, en.trim, "en"),
      (2L, de.trim, "de"),
      (3L, (en + de).trim, "en"), // concatenated-crawl doc: en head, de tail
      (4L, "xyz", "en")           // too short for any trigram vote
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpDir("langmix")
    docs.write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_lang_mix")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    assert(got(1L) == (("en", "en", false)), got(1L).toString)
    assert(got(2L) == (("de", "de", false)), got(2L).toString)
    assert(got(3L) == (("en", "de", true)),
      s"concatenated doc must flag mixed: ${got(3L)}")
    assert(got(4L) == (("und", "und", false)), got(4L).toString)
    // whole-doc language ID PASSES the concatenated doc (the majority vote
    // hides the contamination) — the reason this operator exists
    val wholeDoc = SparkEntry.queries("q_lang_id")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred_lang_ngram")).toMap
    assert(wholeDoc(3L) != "und", "whole-doc vote resolves to SOME language")
  }

  /** Independent in-memory replay of q_url_canonical's generic algorithm
    * (regex parse → lowercase → default-port/utm/fragment/trailing-slash
    * strip → param sort) — written against the spec prose, not the query
    * code, so a drift in either shows up here. */
  private def canonOf(raw: String): String = {
    val noFrag = raw.replaceAll("#.*$", "")
    val base = noFrag.replaceAll("\\?.*$", "")
    val qs = if (noFrag.contains("?")) noFrag.replaceAll("^[^?]*\\?", "") else ""
    val m = java.util.regex.Pattern
      .compile("^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$").matcher(base)
    assert(m.matches(), s"unparseable fixture url: $raw")
    val scheme = m.group(1).toLowerCase
    val hostport = m.group(2).toLowerCase
    val host = scheme match {
      case "https" => hostport.replaceAll(":443$", "")
      case "http"  => hostport.replaceAll(":80$", "")
      case _       => hostport
    }
    val path = Option(m.group(3)).getOrElse("").replaceAll("/+$", "")
    val params = qs.split("&").filter(p => p.nonEmpty && !p.startsWith("utm_")).sorted
    val cq = if (params.isEmpty) "" else "?" + params.mkString("&")
    s"$scheme://$host$path$cq"
  }

  test("q_url_canonical equals the in-memory canonicalization replay; census exact") {
    val got = SparkEntry.queries("q_url_canonical")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    // no canonical key retains scheme/host case, default ports, fragments,
    // tracking params, or a trailing slash
    got.keys.foreach { u =>
      assert(u == u.toLowerCase.replaceAll(":443", "").replaceAll("#.*$", ""), u)
      assert(!u.contains("utm_") && !u.endsWith("/"), u)
    }
    // replay: rebuild every raw URL from the table and canonicalize in memory
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val raws = docs.map { case (id, src) =>
      val v = id % 4
      val host = s"www.$src.example.com"
      val sb = new StringBuilder
      sb ++= (if (v == 1) "HTTPS" else "https")
      sb ++= "://"
      sb ++= (if (v == 1) host.toUpperCase else host)
      if (v == 1) sb ++= ":443"
      sb ++= s"/articles/${id % 40}"
      if (v == 1) sb ++= "/"
      if (v == 2) sb ++= "?utm_source=feed&utm_campaign=x"
      if (v == 3) sb ++= "?b=2&a=1#frag"
      (id, sb.toString)
    }
    val want = raws.groupBy { case (_, raw) => canonOf(raw) }
      .map { case (c, g) =>
        c -> (g.length.toLong, g.map(_._2).distinct.length.toLong, g.map(_._1).min)
      }
    assert(got == want)
    // the three slash/port/utm variants of one page really collapse: every
    // v∈{0,1,2} group of one (source, pid) shares a query-less canonical
    assert(got.keys.exists(u => !u.contains("?")))
    assert(got.keys.exists(u => u.endsWith("?a=1&b=2")), "sorted params kept")
  }

  test("q_html_extract: round-trip recovers every doc; density strictly < 1") {
    val rows = SparkEntry.queries("q_html_extract")(spark, sf).collect()
    val docs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.length.toLong == docs)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("clean_roundtrip"),
        s"main-content extraction must recover the original text: $r")
      val (main, page) = (r.getAs[Long]("main_chars"), r.getAs[Long]("page_chars"))
      assert(main > 0 && page > main, s"chrome adds page mass: $r")
      val d = r.getAs[Double]("density")
      assert(d > 0 && d < 1 && math.abs(d - main.toDouble / page) < 1e-12)
    }
    // the injected <aside> really lands in the page: the ad third's chrome
    // (page − main) strictly exceeds the ad-free chrome everywhere (the ad
    // text is ~19 chars; the only other chrome variation is the title's
    // id digit count)
    val byMod = rows.groupBy(r => r.getLong(0) % 3 == 0)
    def chrome(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("page_chars") - r.getAs[Long]("main_chars")
    assert(byMod(true).map(chrome).min > byMod(false).map(chrome).max,
      "ad pages carry strictly more boilerplate than clean pages")
  }
}
