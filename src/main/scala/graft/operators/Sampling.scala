package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * stratum). Ties (astronomically unlikely) break on `id`. */
  def weightedSample(df: DataFrame, stratum: Column, id: Column,
      weight: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(aesKey(id, weight).desc, id)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_weighted_sample" -> ((s, dir) => {
      // 5 docs per source, length-weighted (longer docs proportionally
      // more likely): the per-domain quota draw a data-mixing pipeline
      // runs per snapshot. Output is the sampled ids — integers only,
      // the FP key never leaves the plan.
      weightedSample(table(s, dir, "documents"),
        stratum = col("source"), id = col("doc_id"),
        weight = col("n_chars"), k = 5)
        .select(col("source"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("source"), col("rk"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q117_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, source, n_chars,
        |    LN((('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
        |        + 1.0) / 4294967297.0) /
        |    CASE WHEN n_chars > 0 THEN n_chars
        |         ELSE error('weightedSample: weight must be > 0') END AS k
        |  FROM documents),
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
