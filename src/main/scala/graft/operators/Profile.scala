package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table
import graft.operators.TextOps

/** Column-level data profiling (SURVEY.md §2.C64) — the
  * schema-health summary a pipeline snapshots per ingest: row/null/
  * exact-distinct counts, lexical min/max and mean value length per
  * column, one output row per column. This is the "did the upstream
  * schema drift under me" check (a null-rate jump or a distinct-count
  * collapse is the classic silent breakage) and pairs with
  * [[Snapshot.diff]] (row-level) and [[Drift]] (distribution-level).
  *
  * Scale shape: values go through ONE explode to (column, value)
  * pairs — a |cols|× row multiplier that partial-aggregates map-side
  * into per-(column, value) counts, so the only real shuffle carries
  * distinct values, not rows; the per-column fold after it is |cols|
  * rows. Exact distincts are the oracle-checkable choice here; for
  * unbounded-cardinality columns at 100 TB use [[approxProfile]],
  * which replaces the distinct shuffle with one HLL++ pass and
  * reduces the shuffle to |cols| sketch rows.
  *
  * Values are compared/profiled AS STRINGS (cast once, scan-side):
  * cross-type output needs one column type, and lexical min/max is
  * well-defined and engine-portable. Timestamp columns should be
  * pre-formatted by the caller (engine-default renderings differ).
  */
object Profile {

  /** One profile row per column in `cols`: (col_name, n_rows, n_null,
    * n_distinct, min_str, max_str, avg_len). `avg_len` is null for an
    * all-null column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
    val lvl1 = pairs.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    // all-null column: avg_len is NULL by contract — the division must
    // be guarded or ANSI mode (the session default) aborts the whole
    // profiling query on exactly the schema-drift case profiling
    // exists to catch (r9 review fix)
    val nnChars = sum(when(col("v").isNotNull, length(col("v")) * col("cnt"))
      .otherwise(0L))
    val nnCnt = sum(when(col("v").isNotNull, col("cnt")).otherwise(0L))
    lvl1.groupBy(col("col_name"))
      .agg(sum(col("cnt")).as("n_rows"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        count(col("v")).as("n_distinct"),
        min(col("v")).as("min_str"),
        max(col("v")).as("max_str"),
        round(when(nnCnt > 0, nnChars.cast("double") / nnCnt), 6)
          .as("avg_len"))
  }

  /** The 100 TB variant: identical output shape, but `n_distinct` is
    * HLL++ (`approx_count_distinct`, `rsd` relative error) and the
    * whole profile is ONE aggregation pass — no per-(column, value)
    * distinct shuffle; the exchange carries |cols| partial sketches. */
  def approxProfile(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
    pairs.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        approx_count_distinct(col("v"), rsd).as("n_distinct"),
        min(col("v")).as("min_str"),
        max(col("v")).as("max_str"),
        round(avg(when(col("v").isNotNull, length(col("v")))), 6)
          .as("avg_len"))
  }

  /** Corpus manifest — the provenance fingerprint a pipeline publishes
    * with every snapshot so a re-run (or a consumer) can verify "same
    * corpus" without row-level diffing: per source, counts, token/char
    * mass, and an ORDER-INDEPENDENT content digest (sum of per-doc
    * 32-bit md5 images of id‖text — addition commutes, so the digest
    * is partitioning/engine-stable yet any changed/missing/extra doc
    * changes it). One map-side-combined scan; |sources| output rows.
    * Complements [[profile]] (schema health) with identity: profile
    * says the shape is right, the manifest says the BYTES are. */
  def manifest(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), "\\s+")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(graft.GraftSession.portableHash(
          concat(col("doc_id").cast("string"), lit("|"), col("text"))))
          .as("content_digest"))

  /** One-row dataset card — the publishable summary a corpus release
    * ships (HF dataset-card / datasheet numbers): sizes, token mass,
    * language-distribution entropy (diversity), source concentration
    * (Herfindahl index — is this corpus one crawl wearing twenty
    * source labels?), and the Gopher-rule keep rate (q145's gated
    * rules, passed in as a (doc_id, keep) frame so the card provably
    * summarizes the SAME filter the gate checks). Entropy/HHI terms
    * round to nano-units and sum as integers (order-independent).
    * Scale: two corpus scans (stats + rules) collapsing to
    * |langs|+|sources| rows before any math. */
  def datasetCard(docs: DataFrame, keep: DataFrame): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(size(split(col("text"), "\\s+")).cast("long")).as("n_tokens"))
    // ONE (lang, source) rollup feeds both distribution branches and
    // the total — previously each branch re-scanned the corpus just
    // to recount it (5 scans for a "two corpus scans" card — r9
    // review fix). The rollup is |langs×sources| rows; ckpt'd because
    // three consumers read it.
    val ls = graft.GraftSession.ckpt(
      docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c")))
    val nRow = ls.agg(sum(col("c")).as("n"))
    val langEnt = ls.groupBy(col("lang")).agg(sum(col("c")).as("c"))
      .crossJoin(broadcast(nRow))
      .select(round((col("c").cast("double") / col("n")) *
        log(col("n").cast("double") / col("c")) * lit(1e9), 0)
        .cast("long").as("t"))
      .agg(sum(col("t")).as("ent_fp"))
    val hhi = ls.groupBy(col("source")).agg(sum(col("c")).as("c"))
      .crossJoin(broadcast(nRow))
      .select(round((col("c").cast("double") / col("n")) *
        (col("c").cast("double") / col("n")) * lit(1e9), 0)
        .cast("long").as("t"))
      .agg(sum(col("t")).as("hhi_fp"))
    val keepRate = keep.agg(
      round(sum(col("keep").cast("long")).cast("double") / count(lit(1)), 6)
        .as("keep_rate"))
    base.crossJoin(broadcast(langEnt)).crossJoin(broadcast(hhi))
      .crossJoin(broadcast(keepRate))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6)
          .as("mean_doc_tokens"),
        round(col("ent_fp") / lit(1e9), 6).as("lang_entropy_nats"),
        round(col("hhi_fp") / lit(1e9), 6).as("source_hhi"),
        col("keep_rate"))
  }

  /** Pearson chi² independence test over the (source × lang)
    * contingency table: is the language mix the SAME across sources,
    * or do sources carry distinct language profiles? (The corpus-
    * design question behind per-source sampling: if independent, one
    * global language quota suffices; if not, quotas must be
    * per-source.) The statistic Σ(o−e)²/e assembles in double from
    * exact integer counts (e = row·col/total); one-row output with
    * dof and the large-sample significance flag (chi² > dof+4√(2·dof),
    * a conservative ~2σ normal-approximation cut — exact both
    * engines). The contingency table is |sources|×|langs| rows. */
  def langSourceChi2(docs: DataFrame): DataFrame = {
    val cell = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("o"))
    val rowT = docs.groupBy(col("source")).agg(count(lit(1)).as("rt"))
    val colT = docs.groupBy(col("lang")).agg(count(lit(1)).as("ct"))
    val tot = docs.agg(count(lit(1)).as("n"))
    val dims = docs.agg(
      countDistinct(col("source")).as("nr"),
      countDistinct(col("lang")).as("nc"))
    cell.join(broadcast(rowT), "source").join(broadcast(colT), "lang")
      .crossJoin(broadcast(tot))
      .select(
        (col("o").cast("double") -
          col("rt").cast("double") * col("ct") / col("n")).as("d"),
        (col("rt").cast("double") * col("ct") / col("n")).as("e"))
      // per-cell terms nano-round and sum as integers: the cell sum
      // is order-independent, so chi2 is bit-identical cross-engine
      .select(round(col("d") * col("d") / col("e") * lit(1e9), 0)
        .cast("long").as("t"))
      .agg(sum(col("t")).as("chi2_fp"))
      .crossJoin(broadcast(dims))
      .withColumn("dof", (col("nr") - 1) * (col("nc") - 1))
      .select(round(col("chi2_fp") / lit(1e9), 6).as("chi2"),
        col("dof"),
        (col("chi2_fp") / lit(1e9) > col("dof").cast("double") +
          lit(4.0) * sqrt(lit(2.0) * col("dof").cast("double")))
          .as("dependent"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q186_lang_source_chi2" -> ((s, dir) =>
      langSourceChi2(table(s, dir, "documents"))),

    "q172_dataset_card" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      datasetCard(docs,
        TextOps.gopherRules(docs).select(col("doc_id"), col("keep")))
    }),

    "q164_corpus_manifest" -> ((s, dir) =>
      manifest(table(s, dir, "documents")).orderBy(col("source"))),

    "q128_profile" -> ((s, dir) => {
      // Exact profile of the documents table's scalar columns. (text
      // is deliberately excluded from the GATED run: exact-distinct
      // on a long-text column is the case approxProfile exists for.)
      profile(table(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("col_name"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q186_lang_source_chi2" ->
      """WITH cell AS (
        |  SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2),
        |rt AS (SELECT source, COUNT(*) AS rt FROM documents GROUP BY 1),
        |ct AS (SELECT lang, COUNT(*) AS ct FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n FROM documents),
        |dims AS (
        |  SELECT COUNT(DISTINCT source) AS nr, COUNT(DISTINCT lang) AS nc
        |  FROM documents),
        |de AS (
        |  SELECT
        |    CAST(c.o AS DOUBLE)
        |      - CAST(r.rt AS DOUBLE) * ct.ct / tot.n AS d,
        |    CAST(r.rt AS DOUBLE) * ct.ct / tot.n AS e
        |  FROM cell c JOIN rt r USING (source) JOIN ct USING (lang)
        |  CROSS JOIN tot),
        |terms AS (
        |  SELECT CAST(ROUND(d * d / e * 1000000000.0) AS BIGINT) AS t
        |  FROM de),
        |s AS (SELECT CAST(SUM(t) AS BIGINT) AS chi2_fp FROM terms)
        |SELECT ROUND(chi2_fp / 1000000000.0, 6) AS chi2,
        |  CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
        |  chi2_fp / 1000000000.0 > CAST((nr - 1) * (nc - 1) AS DOUBLE)
        |    + 4.0 * SQRT(2.0 * (nr - 1) * (nc - 1)) AS dependent
        |FROM s CROSS JOIN dims""".stripMargin,

    // String-shares q145's rule CTEs so keep_rate provably summarizes
    // the gated filter; entropy/HHI terms mirror the nano-unit sums.
    "q172_dataset_card" ->
      ("WITH " + TextOps.gopherCtes + ",\n" +
       """base AS (
         |  SELECT COUNT(*) AS n_docs,
         |    COUNT(DISTINCT source) AS n_sources,
         |    COUNT(DISTINCT lang) AS n_langs,
         |    CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |lent AS (
         |  SELECT CAST(SUM(CAST(ROUND(
         |      (CAST(c AS DOUBLE) / n) * LN(CAST(n AS DOUBLE) / c)
         |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS ent_fp
         |  FROM (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang)
         |  CROSS JOIN (SELECT COUNT(*) AS n FROM documents)),
         |hhi AS (
         |  SELECT CAST(SUM(CAST(ROUND(
         |      (CAST(c AS DOUBLE) / n) * (CAST(c AS DOUBLE) / n)
         |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS hhi_fp
         |  FROM (SELECT source, COUNT(*) AS c FROM documents GROUP BY source)
         |  CROSS JOIN (SELECT COUNT(*) AS n FROM documents)),
         |kr AS (
         |  SELECT ROUND(CAST(SUM(CASE WHEN fail_mask = 0 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / COUNT(*), 6) AS keep_rate
         |  FROM m)
         |SELECT n_docs, n_sources, n_langs, n_tokens,
         |  ROUND(CAST(n_tokens AS DOUBLE) / n_docs, 6) AS mean_doc_tokens,
         |  ROUND(ent_fp / 1000000000.0, 6) AS lang_entropy_nats,
         |  ROUND(hhi_fp / 1000000000.0, 6) AS source_hhi,
         |  keep_rate
         |FROM base CROSS JOIN lent CROSS JOIN hhi CROSS JOIN kr""".stripMargin),

    "q164_corpus_manifest" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
        |    AS n_tokens,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  CAST(SUM(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
        |    || text), 1, 8))::BIGINT) AS BIGINT) AS content_digest
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q128_profile" ->
      """WITH pairs AS (
        |  SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS v
        |  FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)
        |  FROM documents)
        |SELECT col_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null,
        |  COUNT(DISTINCT v) AS n_distinct,
        |  MIN(v) AS min_str, MAX(v) AS max_str,
        |  ROUND(SUM(CASE WHEN v IS NOT NULL THEN LENGTH(v) ELSE 0 END)
        |    / CAST(COUNT(v) AS DOUBLE), 6) AS avg_len
        |FROM pairs GROUP BY col_name ORDER BY col_name""".stripMargin
  )
}
