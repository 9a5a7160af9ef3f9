package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Text featurization + corpus-shape diagnostics (SURVEY.md §2.C —
  * training-data pipeline pack, r8).
  *
  *   - q138 `featureHashEmbed`: signed feature hashing (the
  *     HashingTF / "hashing trick" of Weinberger et al. 2009) — every
  *     token md5-hashes to one of `dims` buckets with a ±1 sign from
  *     the independent second hash half, giving each doc a fixed-width
  *     integer vector with E[collision bias] = 0, no vocabulary pass,
  *     no dictionary state. The cheap dense embedding a pipeline uses
  *     before a learned encoder exists — and the 32-ints-per-doc
  *     output is SMALLER than the text, so this is the scale path
  *     (the sparse (doc, dim, v) form never needs densifying except
  *     at emission).
  *   - q139 `zipfFit`: OLS fit of ln(freq) ~ ln(rank) over the
  *     vocabulary head — natural text obeys Zipf (slope ≈ −1);
  *     machine-generated spam, template boilerplate, and tokenizer
  *     breakage all bend the curve, so the (slope, r²) pair is a
  *     one-row corpus-health check per ingest.
  *
  * Determinism: q138 is INTEGER end-to-end until the final norm
  * (signed counts; md5 dims/signs identical cross-engine); q139's
  * rank ties break on token byte order and the OLS sums round at 6.
  */
object Featurize {

  // native digest (Md5Hash64): one md5 per token, no hex round-trip;
  // hash >>> 32 == conv(substring(md5,1,8),16,10) and
  // hash & 0xFFFFFFFF == conv(substring(md5,9,8),16,10) byte-for-byte
  // (r14, guide §4.1 — the declarative twin digested every token twice)
  private def h32(c: Column): Column =
    shiftrightunsigned(call_function("portable_hash64", c), 32)
  private def h32hi(c: Column): Column =
    call_function("portable_hash64", c).bitwiseAND(lit(0xFFFFFFFFL))

  /** (doc_id, norm, nnz, vec) signed feature-hash embedding of a
    * (doc_id, text) frame; `vec` is the dense integer vector
    * comma-joined (the array-column gate convention). Scale shape:
    * tokens hash scan-side; ONE uniform (doc_id, dim) shuffle with
    * map-side combine; the dense spine is a broadcast `dims`-row
    * range. */
  def featureHashEmbed(docs: DataFrame, dims: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val tk = docs.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) >= 1)
    val sums = tk.select(col("doc_id"),
        (h32(col("tok")) % dims).as("dim"),
        when(h32hi(col("tok")) % 2 === 0, 1L).otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sgn")).as("v"))
    val spine = spark.range(0, dims).select(col("id").as("dim"))
    // doc-id set off the POST-shuffle sums frame (every doc with a
    // token has a (doc_id, dim) row), not a second full tokenize scan
    // + token-stream distinct (r9 review fix)
    sums.select(col("doc_id")).distinct()
      .crossJoin(broadcast(spine))
      .join(sums, Seq("doc_id", "dim"), "left")
      .na.fill(0L, Seq("v"))
      .groupBy(col("doc_id"))
      .agg(
        round(sqrt(sum(col("v") * col("v"))), 6).as("norm"),
        sum(when(col("v") =!= 0L, 1L).otherwise(0L)).as("nnz"),
        array_join(
          transform(array_sort(collect_list(struct(col("dim"), col("v")))),
            s => s.getField("v").cast("string")), ",").as("vec"))
  }

  /** One-row OLS fit of ln(freq) ~ ln(rank) over the top `head`
    * vocabulary terms: (n_terms, slope, intercept, r2). The vocab agg
    * is the only corpus shuffle (map-side combined); the head is a
    * TakeOrdered and the OLS folds over `head` rows. */
  def zipfFit(docs: DataFrame, head: Int = 1000): DataFrame = {
    val vocab = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) >= 1)
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(head)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("tok"))))
    vocab
      .select(log(col("rank").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(zipfOlsCols: _*)
  }

  /** The OLS output projection off the (n, sx, sy, sxy, sxx, syy)
    * sums row. Degenerate vocab (one distinct token, or all-equal
    * head freqs) zeroes the denominators: NULL slope/r2, matching the
    * oracle's NULLIF — Spark's NULL-on-/0 vs DuckDB's IEEE inf/NaN
    * would otherwise diverge (r9 review fix). */
  private def zipfOlsCols: Seq[Column] = {
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / denX
    Seq(col("n").cast("long").as("n_terms"),
      round(when(denX =!= 0, slope), 6).as("slope"),
      round(when(denX =!= 0,
        (col("sy") - slope * col("sx")) / col("n")), 6).as("intercept"),
      round(when(denX =!= 0 && denY =!= 0,
        pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
          (denX * denY)), 6).as("r2"))
  }

  /** md5-seeded ±1 sign for (dim d, output component k) — the same
    * arithmetic the DuckDB mirror runs in SQL, evaluated driver-side
    * here so the 64×16 sign matrix becomes a plan literal. */
  private def jlSign(d: Int, k: Int): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$k".getBytes("UTF-8"))
    val hex = dig.take(4).map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss signed random projection, d=`dims` →
    * k=`outDims`: y_k = Σ_d s(d,k)·x_d with s = ±1 seeded from
    * md5("d:k"), distortion ratio = ‖y‖/(√k·‖x‖) (Achlioptas 2003 —
    * ±1 entries are a database-friendly JL matrix; E[ratio²] = 1).
    * Returns the per-band distortion histogram (band, n, min_ratio,
    * max_ratio) — the empirical JL check a pipeline runs before
    * trusting a cheap projection for clustering/dedup prefilters.
    *
    * Scale shape: the sign matrix is a 64×16 plan literal, so the
    * whole projection is scan-side codegen (16 ordered zip-folds per
    * row, no join, no shuffle); the only shuffle carries one
    * ~10-row histogram. Exactness: folds are ORDERED (the q147
    * pattern — identical add order in both engines), so ratios are
    * bit-identical doubles. */
  def jlDistortion(emb: DataFrame, dims: Int = 64, outDims: Int = 16)
      : DataFrame = {
    val sgn: IndexedSeq[Seq[Double]] =
      (0 until outDims).map(k => (0 until dims).map(d => jlSign(d, k)).toSeq)
    val x = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("xv"))
    val yv = array((0 until outDims).map(k =>
      aggregate(zip_with(col("xv"), typedLit(sgn(k)), (a, b) => a * b),
        lit(0.0), (acc, e) => acc + e)): _*)
    val nx2 = aggregate(transform(col("xv"), t => t * t),
      lit(0.0), (acc, e) => acc + e)
    val ny2 = aggregate(transform(col("yv"), t => t * t),
      lit(0.0), (acc, e) => acc + e)
    x.withColumn("yv", yv)
      // try_divide: a zero vector has nx2 = 0; its ratio is NULL
      // (DuckDB x/0) and lands in the NULL band, not an ANSI crash.
      .withColumn("ratio",
        try_divide(sqrt(ny2 / lit(outDims.toDouble)), sqrt(nx2)))
      .groupBy(round(col("ratio"), 1).as("band"))
      .agg(count(lit(1)).as("n"),
        round(min(col("ratio")), 6).as("min_ratio"),
        round(max(col("ratio")), 6).as("max_ratio"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_rand_proj" -> ((s, dir) =>
      jlDistortion(table(s, dir, "embeddings"), dims = 64, outDims = 16)
        .orderBy(col("band"))),

    "q138_feature_hash" -> ((s, dir) =>
      featureHashEmbed(table(s, dir, "documents"), dims = 32)
        .orderBy(col("doc_id"))),

    "q139_zipf_fit" -> ((s, dir) =>
      zipfFit(table(s, dir, "documents"), head = 1000))
  )

  val oracle: Map[String, String] = Map(
    // Signs re-derived IN SQL from the same md5("d:k") parity; folds
    // ordered identically, so every ratio is the same double.
    "q153_rand_proj" ->
      """WITH x AS (
        |  SELECT vec_id,
        |    list_transform(embedding, e -> CAST(e AS DOUBLE)) AS xv
        |  FROM embeddings),
        |p AS (
        |  SELECT vec_id, xv,
        |    list_transform(generate_series(0, 15), k ->
        |      list_reduce(list_transform(generate_series(1, 64), i ->
        |        xv[i] * (CASE WHEN ('0x' || substr(md5(
        |            CAST(i - 1 AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
        |            1, 8))::BIGINT % 2 = 0 THEN 1.0 ELSE -1.0 END)),
        |      (a, b) -> a + b)) AS yv
        |  FROM x),
        |r AS (
        |  SELECT vec_id,
        |    SQRT(list_reduce(list_transform(yv, t -> t * t),
        |      (a, b) -> a + b) / 16.0) /
        |    SQRT(list_reduce(list_transform(xv, t -> t * t),
        |      (a, b) -> a + b)) AS ratio
        |  FROM p)
        |SELECT ROUND(ratio, 1) AS band, COUNT(*) AS n,
        |  ROUND(MIN(ratio), 6) AS min_ratio,
        |  ROUND(MAX(ratio), 6) AS max_ratio
        |FROM r GROUP BY 1 ORDER BY band""".stripMargin,

    "q138_feature_hash" ->
      """WITH tk AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, UNNEST(regexp_split_to_array(text, '\s+')) AS tok
        |    FROM documents)
        |  WHERE length(tok) >= 1),
        |hashed AS (
        |  SELECT doc_id,
        |    ('0x'||substr(md5(tok),1,8))::BIGINT % 32 AS dim,
        |    CASE WHEN ('0x'||substr(md5(tok),9,8))::BIGINT % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM tk),
        |sums AS (
        |  SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS v
        |  FROM hashed GROUP BY 1, 2),
        |spine AS (SELECT UNNEST(generate_series(0, 31)) AS dim),
        |ids AS (SELECT DISTINCT doc_id FROM tk),
        |dense AS (
        |  SELECT i.doc_id, s.dim, COALESCE(m.v, 0) AS v
        |  FROM ids i CROSS JOIN spine s
        |  LEFT JOIN sums m ON m.doc_id = i.doc_id AND m.dim = s.dim)
        |SELECT doc_id, ROUND(SQRT(SUM(v * v)), 6) AS norm,
        |  CAST(SUM(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
        |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY dim) AS vec
        |FROM dense GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q139_zipf_fit" ->
      """WITH vocab AS (
        |  SELECT tok, COUNT(*) AS freq FROM (
        |    SELECT UNNEST(regexp_split_to_array(lower(text), '\s+')) AS tok
        |    FROM documents)
        |  WHERE length(tok) >= 1
        |  GROUP BY tok ORDER BY freq DESC, tok LIMIT 1000),
        |ranked AS (
        |  SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok)
        |      AS DOUBLE)) AS x,
        |    LN(CAST(freq AS DOUBLE)) AS y
        |  FROM vocab),
        |s AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM ranked)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |  ROUND((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0), 6)
        |    AS slope,
        |  ROUND((sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
        |    * sx) / n, 6) AS intercept,
        |  ROUND(POWER(n * sxy - sx * sy, 2)
        |    / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) AS r2
        |FROM s""".stripMargin
  )
}
