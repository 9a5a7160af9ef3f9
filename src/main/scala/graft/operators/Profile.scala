package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table

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
    lvl1.groupBy(col("col_name"))
      .agg(sum(col("cnt")).as("n_rows"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_null"),
        count(col("v")).as("n_distinct"),
        min(col("v")).as("min_str"),
        max(col("v")).as("max_str"),
        round(
          sum(when(col("v").isNotNull, length(col("v")) * col("cnt"))
            .otherwise(0L)).cast("double") /
            sum(when(col("v").isNotNull, col("cnt")).otherwise(0L)),
          6).as("avg_len"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
