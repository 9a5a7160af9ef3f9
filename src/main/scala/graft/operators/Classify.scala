package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Trained-classifier rung (SURVEY.md §2.C92) — a multinomial Naive
  * Bayes language identifier TRAINED on the corpus itself (even
  * doc_ids) and evaluated on the held-out half (odd doc_ids),
  * emitting the confusion matrix. This is the fasttext-lite shape
  * every curation stack runs: q37's lang-id is a fixed heuristic;
  * this one learns its parameters from data, distributed, in two
  * map-side-combined aggregations.
  *
  * Scale shape: the model is |langs| × |bigrams| count rows (KB–MB —
  * bounded by alphabet², not corpus size) built in ONE training-scan
  * aggregation, then BROADCAST against the scan-side test bigram
  * stream; the per-(doc, lang) score re-agg is map-side combinable
  * and the argmax is one per-doc window over |langs| rows. No stage
  * carries more than (test bigrams × |langs|) rows.
  *
  * Determinism: every log term rounds to integer NANO-UNITS before
  * the (integer × count) per-doc sum, so scores are exact longs; the
  * argmax tie-breaks on lang byte order. A last-ulp libm ln
  * difference can flip one nano on a TERM, but the gate compares the
  * ARGMAX (confusion matrix) — a flip would need two langs' total
  * scores within a few nanos, which the prior alone separates.
  * Bigram representation differs per engine (packed codepoints here,
  * 2-char substrings in the mirror) but the mapping is bijective on
  * lowercased text, so counts, vocab size and every score agree —
  * the q137 pattern. Gate-side caveat (r9 review, the SURVEY §5 \\s
  * family): the LOWERCASING itself differs on special-cased
  * codepoints — Java full case mapping (U+0130 → "i" + U+0307, two
  * codepoints) vs DuckDB's utf8proc simple 1:1 mapping — so a corpus
  * containing such characters would produce different bigram streams
  * per engine. A parity-harness property only (production is
  * Spark-only); the synthetic corpora contain none.
  */
object Classify {

  /** Confusion matrix (lang_true, lang_pred, n) of a +1-smoothed
    * multinomial NB char-bigram classifier trained on docs where
    * `doc_id % 2 = 0` and scored on the rest. */
  def nbLangIdConfusion(docs: DataFrame): DataFrame = {
    val bigs = docs.filter(length(col("text")) >= 2)
      .withColumn("bigs", call_function("char_bigrams_packed", col("text")))
    val trainDocs = bigs.filter(col("doc_id") % 2 === 0)
    val testDocs = bigs.filter(col("doc_id") % 2 === 1)

    val priors = trainDocs.groupBy(col("lang").as("l"))
      .agg(count(lit(1)).as("nd"))
    val nTot = trainDocs.agg(count(lit(1)).as("ntot"))
    val model = trainDocs
      .select(col("lang").as("l"), explode(col("bigs")).as("bg"))
      .groupBy(col("l"), col("bg")).agg(count(lit(1)).as("c"))
    val tl = model.groupBy(col("l")).agg(sum(col("c")).as("t"))
    val vocab = model.select(col("bg")).distinct().agg(count(lit(1)).as("v"))

    val nano = lit(1000000000.0)
    val langs = priors.join(tl, Seq("l"))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(vocab))
      .select(col("l"), col("t"), col("v"),
        round(log(col("nd").cast("double") / col("ntot")) * nano, 0)
          .cast("long").as("prior_fp"),
        round(log(lit(1.0) / (col("t") + col("v")).cast("double")) * nano, 0)
          .cast("long").as("oov_fp"))
    val terms = model.join(langs, Seq("l"))
      .select(col("l"), col("bg"),
        round(log((col("c") + 1).cast("double") / (col("t") + col("v"))) *
          nano, 0).cast("long").as("lp_fp"))

    val dtoks = testDocs
      .select(col("doc_id"), col("lang").as("lang_true"),
        explode(col("bigs")).as("bg"))
      .groupBy(col("doc_id"), col("lang_true"), col("bg"))
      .agg(count(lit(1)).as("cnt"))
    val scored = dtoks
      .crossJoin(broadcast(langs.select(col("l"), col("prior_fp"), col("oov_fp"))))
      .join(broadcast(terms), Seq("l", "bg"), "left")
      .groupBy(col("doc_id"), col("lang_true"), col("l"))
      .agg((max(col("prior_fp")) +
        sum(coalesce(col("lp_fp"), col("oov_fp")) * col("cnt"))).as("score_fp"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("l"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("lang_true"), col("l").as("lang_pred"))
      .agg(count(lit(1)).as("n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_nb_langid" -> ((s, dir) =>
      nbLangIdConfusion(table(s, dir, "documents"))
        .orderBy(col("lang_true"), col("lang_pred")))
  )

  val oracle: Map[String, String] = Map(
    "q157_nb_langid" ->
      """WITH d AS (
        |  SELECT doc_id, lang, lower(text) AS lt FROM documents
        |  WHERE length(text) >= 2),
        |bgs AS (
        |  SELECT doc_id, lang, substr(lt, CAST(i AS INTEGER), 2) AS bg
        |  FROM d, UNNEST(generate_series(1, length(lt) - 1)) AS u(i)),
        |traindocs AS (SELECT doc_id, lang FROM d WHERE doc_id % 2 = 0),
        |priors AS (SELECT lang AS l, COUNT(*) AS nd FROM traindocs GROUP BY 1),
        |ntot AS (SELECT COUNT(*) AS ntot FROM traindocs),
        |model AS (
        |  SELECT lang AS l, bg, COUNT(*) AS c FROM bgs
        |  WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |tl AS (SELECT l, CAST(SUM(c) AS BIGINT) AS t FROM model GROUP BY 1),
        |vocab AS (SELECT COUNT(DISTINCT bg) AS v FROM model),
        |langs AS (
        |  SELECT l, t, v,
        |    CAST(ROUND(LN(CAST(nd AS DOUBLE) / ntot) * 1000000000.0)
        |      AS BIGINT) AS prior_fp,
        |    CAST(ROUND(LN(1.0 / (t + v)) * 1000000000.0)
        |      AS BIGINT) AS oov_fp
        |  FROM priors JOIN tl USING (l) CROSS JOIN ntot CROSS JOIN vocab),
        |terms AS (
        |  SELECT m.l, m.bg,
        |    CAST(ROUND(LN(CAST(m.c + 1 AS DOUBLE) / (g.t + g.v))
        |      * 1000000000.0) AS BIGINT) AS lp_fp
        |  FROM model m JOIN langs g USING (l)),
        |dtoks AS (
        |  SELECT doc_id, lang AS lang_true, bg, COUNT(*) AS cnt FROM bgs
        |  WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT dt.doc_id, dt.lang_true, g.l,
        |    MAX(g.prior_fp)
        |      + CAST(SUM(COALESCE(t.lp_fp, g.oov_fp) * dt.cnt) AS BIGINT)
        |      AS score_fp
        |  FROM dtoks dt CROSS JOIN langs g
        |  LEFT JOIN terms t ON t.l = g.l AND t.bg = dt.bg
        |  GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT doc_id, lang_true, l AS lang_pred,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score_fp DESC, l) AS rn
        |  FROM scored)
        |SELECT lang_true, lang_pred, COUNT(*) AS n FROM pred
        |WHERE rn = 1 GROUP BY 1, 2 ORDER BY lang_true, lang_pred""".stripMargin
  )
}
