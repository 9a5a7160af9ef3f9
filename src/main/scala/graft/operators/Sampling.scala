package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.GraftSession.table

/** Weighted sampling without replacement (SURVEY.md §2.C55) — the
  * Efraimidis–Spirakis A-ES scheme: each item draws a uniform u and
  * is ranked by u^(1/w); the top-k per stratum is an exact weighted
  * sample without replacement. This is how a training pipeline takes
  * "10k docs per domain, length-weighted" without ever sorting the
  * corpus by weight or doing k passes.
  *
  * Determinism: u is derived from md5 of the item id (the q66
  * seeded-sampling pattern), so the sample is a pure function of the
  * data — reproducible across runs, engines and partitionings. The
  * rank key is ln(u)/w (the monotone log of u^(1/w) — avoids
  * underflow for large weights).
  *
  * Scale shape: the key is computed scan-side (one md5 + one ln per
  * row, codegen'd); the only shuffle is the per-stratum top-k window
  * on a uniform key. k is small, so at 100 TB the dominant cost is
  * the scan itself.
  */
object Sampling {

  /** A-ES rank key for `id` under `weight`: ln(u)/w with
    * u ∈ (0,1] seeded from md5(id). Larger = more likely sampled;
    * heavier items get keys closer to 0.
    *
    * Weights MUST be > 0 and the key fails fast otherwise: a zero
    * weight divides to null/−inf (engines disagree on which) and a
    * negative weight silently flips the ordering to promote the row —
    * both are sampling bugs the caller should see, not absorb. */
  def aesKey(id: Column, weight: Column): Column = {
    val u = (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") + lit(1.0)) / lit(4294967297.0)
    val w = when(weight > 0, weight).otherwise(raise_error(concat(
      lit("weightedSample: weight must be > 0, got "),
      weight.cast("string"), lit(" for id "), id.cast("string"))))
    log(u) / w
  }

  /** Top-`k` weighted sample without replacement per stratum.
    * Returns the input columns plus `rk` (1-based rank within the
    * stratum). Ties (astronomically unlikely) break on `id`.
    * The cap runs through the native bounded-heap [[TopK.groupTopK]]
    * (≤ k rows per (stratum, partition) cross the exchange) — a
    * stratum-partitioned window would sort a hot domain's whole
    * frame on ONE reducer; the rank window that numbers the
    * survivors only ever sees k×|strata| rows. */
  def weightedSample(df: DataFrame, stratum: Column, id: Column,
      weight: Column, k: Int): DataFrame = {
    val keyed = df.withColumn("_ws_stratum", stratum)
      .withColumn("_ws_id", id)
      .withColumn("_ws_key", aesKey(id, weight))
    val top = TopK.groupTopK(keyed, Seq("_ws_stratum"),
      Seq(("_ws_key", true), ("_ws_id", false)), k)
    val w = Window.partitionBy(col("_ws_stratum"))
      .orderBy(col("_ws_key").desc, col("_ws_id"))
    top.withColumn("rk", row_number().over(w))
      .drop("_ws_stratum", "_ws_id", "_ws_key")
  }

  /** Temperature-scaled mixture weights (the multilingual-sampling
    * rule of mBERT/XLM-R and the domain-mixing rule of LLM data
    * recipes): domain d samples with p_d ∝ (tokens_d)^alpha, alpha<1
    * flattening the head so low-resource domains aren't drowned.
    * Returns per-domain token mass, unnormalized weight, sampling
    * probability, and effective epochs at `budgetTokens` (how many
    * times the domain's corpus is traversed to fill its share of the
    * budget — the over-sampling/repetition signal a mixing recipe
    * watches).
    *
    * Scale shape: one corpus scan with map-side-combined token sums
    * to a |domains|-row frame; everything after is KB-sized. The
    * normalizer sums ROUND-6 weights EXACTLY (decimal), so both
    * engines divide by the identical total — the one place a double
    * Σ could diverge cross-engine.
    */
  def mixtureWeights(docs: DataFrame, domain: Column, tokens: Column,
      alpha: Double, budgetTokens: Double): DataFrame = {
    val perDom = docs.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(tokens).as("n_tokens"))
      .withColumn("weight", round(pow(col("n_tokens"), alpha), 6))
    val tot = perDom.agg(
      sum(col("weight").cast(DecimalType(18, 6))).as("tw"))
    perDom.crossJoin(broadcast(tot))
      .withColumn("p_sample",
        round(col("weight") / col("tw").cast("double"), 6))
      .withColumn("eff_epochs",
        round(col("p_sample") * budgetTokens / col("n_tokens"), 6))
      .drop("tw")
  }

  /** UniMax budget allocation (Chung et al. 2023): distribute
    * `budgetTokens` across languages with a hard per-language repeat
    * cap of `maxEpochs` — low-resource languages get their full
    * (capped) corpus, and the surplus spreads UNIFORMLY over the
    * high-resource ones, instead of the α-rule's fixed power law
    * (q136). The greedy smallest-first allocation is exactly
    * water-filling, so it has a closed form over sorted caps:
    * language i (caps ascending, prefix sums P_i) is fully funded iff
    * cap_i·(n−i+1) ≤ B−P_{i−1}, and everyone past the last fully
    * funded language i* splits the remainder evenly:
    * θ = (B−P_{i*})/(n−i*).
    *
    * Exactness: token counts, caps, prefix sums and B are all
    * integers; θ is one division of two exact integers — both engines
    * compute the identical double. Scale shape: one corpus scan with
    * map-side-combined token sums to a |langs|-row frame; the sorted
    * windows run on those few rows (single-partition by design —
    * document-scale work ended at the first agg). */
  def unimaxAlloc(docs: DataFrame, language: Column, tokens: Column,
      maxEpochs: Int, budgetOfTotal: (Long, Long) = (4L, 5L)): DataFrame = {
    val per = docs.groupBy(language.as("lang"))
      .agg(sum(tokens).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
    // asc_nulls_last: a language whose docs all have NULL token
    // counts gets cap NULL, and Spark's ASC default (NULLS FIRST)
    // diverges from DuckDB's (NULLS LAST) — the null lang must rank
    // AFTER every funded one or prefix sums shift (tiny-corpus fuzz)
    val wOrd = Window.orderBy(col("cap").asc_nulls_last, col("lang"))
    val wAll = Window.partitionBy(lit(1))
    val flagged = per
      .withColumn("i", row_number().over(wOrd))
      .withColumn("prefix", sum(col("cap")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("budget",
        expr(s"(sum(n_tokens) over (partition by 1)) * ${budgetOfTotal._1}" +
          s" div ${budgetOfTotal._2}"))
      .withColumn("full",
        col("cap") * (col("n") - col("i") + 1) <=
          col("budget") - (col("prefix") - col("cap")))
    val istar = flagged.agg(
      coalesce(max(when(col("full"), col("i"))), lit(0L)).as("istar"),
      coalesce(max(when(col("full"), col("prefix"))), lit(0L)).as("pstar"),
      max(col("n")).as("nn"), max(col("budget")).as("bb"))
    flagged.crossJoin(broadcast(istar))
      .withColumn("alloc",
        when(col("full"), col("cap").cast("double"))
          .otherwise((col("bb") - col("pstar")).cast("double") /
            (col("nn") - col("istar"))))
      .select(col("lang"), col("n_tokens"), col("cap"), col("budget"),
        col("full").as("fully_funded"), round(col("alloc"), 6).as("alloc"),
        round(col("alloc") / col("n_tokens"), 6).as("epochs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q152_unimax" -> ((s, dir) => {
      // One epoch cap, budget = 80% of the corpus: the low-resource
      // languages are fully funded at one epoch and the head language
      // absorbs the truncation — UniMax's point, as one gated query.
      unimaxAlloc(table(s, dir, "documents"), col("lang"),
        size(split(col("text"), "\\s+")).cast("long"),
        maxEpochs = 1)
        .orderBy(col("lang"))
    }),

    "q136_mixture_weights" -> ((s, dir) => {
      // alpha=0.3 (the mBERT exponent), 1M-token budget: the mixing
      // table a pretraining sampler is configured from.
      mixtureWeights(table(s, dir, "documents"), col("source"),
        size(split(col("text"), "\\s+")).cast("long"),
        alpha = 0.3, budgetTokens = 1e6)
        .orderBy(col("domain"))
    }),

    "q137_dsir_weights" -> ((s, dir) => {
      // DSIR-style importance weights (Xie et al. 2023, NeurIPS —
      // data selection via importance resampling): score every doc by
      // the log-likelihood RATIO of a target-domain LM vs the corpus
      // LM, here the q109 char-bigram models with the 'en' slice as
      // target. A doc whose character statistics look like the target
      // gets log_ratio near 0 or above; out-of-domain text goes
      // sharply negative. Resampling by exp(log_ratio) is then the
      // q117 A-ES draw.
      // Scale shape (two-phase, q109's): both models collapse to
      // ≤|alphabet|² count rows via map-side combine; the ratio table
      // BROADCAST-joins the scan-side bigram stream (codegen'd hash
      // probe per bigram); the per-doc re-agg is map-side combinable.
      // Bigrams absent from the target slice get the q109 OOV floor
      // (-20) so the ratio is total over the corpus-model support.
      val docs = table(s, dir, "documents")
      val bigs = docs.filter(length(col("text")) >= 2)
        .withColumn("bigs", call_function("char_bigrams_packed", col("text")))
      val proxy = bigs.select(explode(col("bigs")).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cp"))
      val tgt = bigs.filter(col("lang") === "en")
        .select(explode(col("bigs")).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("ct"))
      val totP = proxy.agg(sum(col("cp")).cast("double").as("tp"))
      val totT = tgt.agg(sum(col("ct")).cast("double").as("tt"))
      val ratio = proxy.join(tgt, Seq("bg"), "left")
        .crossJoin(broadcast(totP)).crossJoin(broadcast(totT))
        .select(col("bg"),
          (coalesce(log(col("ct") / col("tt")), lit(-20.0))
            - log(col("cp") / col("tp"))).as("lr"))
      bigs.select(col("doc_id"), col("lang"), explode(col("bigs")).as("bg"))
        .join(broadcast(ratio), Seq("bg"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("lr")) / count(lit(1)), 6).as("log_ratio"))
        .orderBy(col("doc_id"))
    }),

    "q117_weighted_sample" -> ((s, dir) => {
      // 5 docs per source, length-weighted (longer docs proportionally
      // more likely): the per-domain quota draw a data-mixing pipeline
      // runs per snapshot. Output is the sampled ids — integers only,
      // the FP key never leaves the plan.
      // Zero/NULL-length docs are unsampleable (weight must be > 0 —
      // aesKey fails fast by contract); exclude them up front, same
      // WHERE as the oracle.
      weightedSample(table(s, dir, "documents").filter(col("n_chars") > 0),
        stratum = col("source"), id = col("doc_id"),
        weight = col("n_chars"), k = 5)
        .select(col("source"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("source"), col("rk"))
    })
  )

  val oracle: Map[String, String] = Map(
    // Water-filling closed form mirrored verbatim: caps/prefixes/B are
    // integers in both engines, θ is one bigint/bigint division.
    "q152_unimax" ->
      """WITH per AS (
        |  SELECT lang,
        |    CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY lang),
        |c AS (SELECT lang, n_tokens, n_tokens * 1 AS cap FROM per),
        |f AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY cap, lang) AS i,
        |    CAST(SUM(cap) OVER (ORDER BY cap, lang) AS BIGINT) AS prefix,
        |    COUNT(*) OVER () AS n,
        |    CAST((SUM(n_tokens) OVER ()) * 4 // 5 AS BIGINT) AS budget
        |  FROM c),
        |g AS (SELECT *,
        |  cap * (n - i + 1) <= budget - (prefix - cap) AS funded FROM f),
        |st AS (
        |  SELECT COALESCE(MAX(CASE WHEN funded THEN i END), 0) AS istar,
        |    CAST(COALESCE(MAX(CASE WHEN funded THEN prefix END), 0)
        |      AS BIGINT) AS pstar,
        |    MAX(n) AS nn, MAX(budget) AS bb
        |  FROM g)
        |SELECT lang, n_tokens, cap, budget, funded AS fully_funded,
        |  ROUND(CASE WHEN funded THEN CAST(cap AS DOUBLE)
        |    ELSE CAST(bb - pstar AS DOUBLE) / (nn - istar) END, 6) AS alloc,
        |  ROUND(CASE WHEN funded THEN CAST(cap AS DOUBLE)
        |    ELSE CAST(bb - pstar AS DOUBLE) / (nn - istar) END
        |    / n_tokens, 6) AS epochs
        |FROM g CROSS JOIN st ORDER BY lang""".stripMargin,

    "q136_mixture_weights" ->
      """WITH perdom AS (
        |  SELECT source AS domain, COUNT(*) AS n_docs,
        |    CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT *, ROUND(POWER(n_tokens, 0.3), 6) AS weight FROM perdom),
        |tot AS (
        |  SELECT CAST(SUM(CAST(weight AS DECIMAL(18, 6))) AS DOUBLE) AS tw
        |  FROM w)
        |SELECT domain, n_docs, n_tokens, weight,
        |  ROUND(weight / tw, 6) AS p_sample,
        |  ROUND(ROUND(weight / tw, 6) * 1e6 / n_tokens, 6) AS eff_epochs
        |FROM w CROSS JOIN tot ORDER BY domain""".stripMargin,

    "q137_dsir_weights" ->
      """WITH t AS (
        |  SELECT doc_id, lang, lower(text) AS lt FROM documents
        |  WHERE length(text) >= 2),
        |bgs AS (
        |  SELECT doc_id, lang, substr(lt, CAST(i AS INTEGER), 2) AS bg
        |  FROM t, UNNEST(generate_series(1, length(lt) - 1)) AS u(i)),
        |proxy AS (SELECT bg, COUNT(*) AS cp FROM bgs GROUP BY bg),
        |tgt AS (SELECT bg, COUNT(*) AS ct FROM bgs
        |        WHERE lang = 'en' GROUP BY bg),
        |tp AS (SELECT CAST(SUM(cp) AS DOUBLE) AS tp FROM proxy),
        |tt AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt FROM tgt),
        |ratio AS (
        |  SELECT p.bg,
        |    COALESCE(LN(g.ct / tt.tt), -20.0) - LN(p.cp / tp.tp) AS lr
        |  FROM proxy p LEFT JOIN tgt g USING (bg)
        |  CROSS JOIN tp CROSS JOIN tt)
        |SELECT b.doc_id, b.lang, COUNT(*) AS n_bigrams,
        |  ROUND(SUM(r.lr) / COUNT(*), 6) AS log_ratio
        |FROM bgs b JOIN ratio r USING (bg)
        |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,

    "q117_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, source, n_chars,
        |    LN((('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
        |        + 1.0) / 4294967297.0) /
        |    CASE WHEN n_chars > 0 THEN n_chars
        |         ELSE error('weightedSample: weight must be > 0') END AS k
        |  FROM documents WHERE n_chars > 0),
        |ranked AS (
        |  SELECT doc_id, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY k DESC, doc_id) AS rk
        |  FROM keyed)
        |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id,
        |  CAST(n_chars AS BIGINT) AS n_chars
        |FROM ranked WHERE rk <= 5 ORDER BY source, rk""".stripMargin
  )
}
