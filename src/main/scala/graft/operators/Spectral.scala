package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.table

/** Spectral corpus diagnostics (SURVEY.md §2.C85) — distributed power
  * iteration for the dominant principal direction of the embedding
  * corpus.
  *
  * Why a pipeline wants this: the top PC of an (uncentered) embedding
  * matrix is the corpus's dominant semantic axis — its eigenvalue
  * share is a collapse/mode-dominance diagnostic (an embedding run
  * where one direction explains most variance is degenerate), and the
  * loadings are the projection axis for whitening or anisotropy
  * removal (the "all-but-the-top" trick, Mu & Viswanath 2018).
  *
  * Scale shape per iteration: v (dim doubles) is a PLAN LITERAL, so
  * the dot product d_j = x_j·v runs scan-side inside codegen with no
  * join; the per-dimension matvec Σ_j x_jd·d_j is one explode +
  * groupBy(dim) whose map-side partials collapse to `dims` rows per
  * task — the shuffle carries dims×tasks tiny rows regardless of
  * corpus size. The per-round collect is dims doubles (metadata, the
  * IVF-centroid pattern).
  *
  * Cross-engine exactness: row order must not matter, so each row's
  * contribution x_jd·d_j is rounded to integer NANO-UNITS and the
  * per-dim sum is an exact integer sum (order-independent), then
  * mapped back to double — both engines compute identical longs, so
  * everything downstream (norm, division) is bit-identical. The
  * per-row dot is an ORDERED zip-fold (same element order in both
  * engines). Nano-unit quantization biases each matvec component by
  * ≤ 0.5e-9·rows — at 1e9+ rows raise the unit (the tradeoff is
  * documented, not silent).
  */
object Spectral {

  /** `iters` power-iteration rounds over `emb` (vec_id,
    * embedding: array<float> of `dims`). Returns (dim, loading,
    * eigval): the unit dominant direction and its eigenvalue estimate
    * ‖X·v‖-style (the Rayleigh image under the final pre-normalized
    * matvec). Start vector is the exact-double uniform 1/√dims. */
  def topPc(emb: DataFrame, iters: Int, dims: Int): DataFrame = {
    val spark = emb.sparkSession
    val x = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("xv"))
    import spark.implicits._
    // Empty corpus → empty result (no dominant direction exists),
    // matching the oracle's empty fixed-point CTEs — not an error.
    val out = powerIter(x, iters, dims) match {
      case None => Seq.empty[(Int, Double, Double)]
      case Some((v, eig)) =>
        v.zipWithIndex.map { case (l, d) => (d, l, eig) }.toSeq
    }
    // round via the Spark expression so tie semantics match DuckDB's
    // ROUND (the suite-wide equivalence), not scala rint's half-even
    out.toDF("dim", "loading", "eigval")
      .select(col("dim"), round(col("loading"), 6).as("loading"),
        round(col("eigval"), 6).as("eigval"))
  }

  /** The power-iteration core over an `x` frame exposing `xv`
    * (array<double> of `dims`): returns the unit dominant direction
    * and its eigenvalue estimate. Each round's matvec is the nano-unit
    * integer-sum shape documented above. */
  private def powerIter(x: DataFrame, iters: Int, dims: Int)
      : Option[(Array[Double], Double)] = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require((dims & (dims - 1)) == 0,
      s"dims must be a power of two so 1/sqrt(dims) is an exact double: $dims")
    var v: Array[Double] = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var eig = 0.0
    (1 to iters).foreach { _ =>
      val vc = typedLit(v.toSeq)
      val matvec = x
        .withColumn("d", aggregate(zip_with(col("xv"), vc, (a, b) => a * b),
          lit(0.0), (acc, e) => acc + e))
        .select(posexplode(col("xv")).as(Seq("dim", "xd")), col("d"))
        .select(col("dim"),
          round((col("xd") * col("d")) * lit(1000000000.0), 0)
            .cast("long").as("c"))
        // Σc in DECIMAL: per-row contributions are nano-unit longs, so
        // a long per-dim sum wraps (silently, wrong-sign eigenvector)
        // near 1e9 rows while the HUGEINT oracle keeps going — decimal
        // matches it at every scale (r9 review fix)
        .groupBy(col("dim"))
        .agg(sum(col("c").cast("decimal(38,0)")).as("yfp"))
        .collect()
      if (matvec.isEmpty) return None // empty corpus: no direction
      val y = matvec.map(r => r.getAs[Int]("dim") ->
        r.getAs[java.math.BigDecimal]("yfp").doubleValue() / 1e9)
        .sortBy(_._1).map(_._2)
      require(y.length == dims, s"matvec returned ${y.length} dims, want $dims")
      // ordered fold, the exact shape of the oracle's list_reduce
      val nrm = math.sqrt(y.map(t => t * t).foldLeft(0.0)(_ + _))
      v = y.map(_ / nrm)
      eig = nrm
    }
    Some((v, eig))
  }

  /** All-but-the-top whitening plan (Mu & Viswanath 2018): the
    * per-dim corpus mean and the dominant principal direction of the
    * CENTERED corpus — subtracting μ and the projection on this axis
    * is the published post-processing that makes off-the-shelf
    * embeddings isotropic enough for cosine retrieval. This emits the
    * (μ, v) transform itself — the KB-sized artifact the scan-side
    * `x − μ − v·⟨x−μ,v⟩` rewrite is configured from.
    *
    * Exactness: μ comes from nano-unit integer per-dim sums (exact
    * longs, order-independent), centering is one exact double
    * subtract per element, and the centered power iteration is the
    * same integer-matvec core as topPc — every output is
    * bit-identical cross-engine. Scale: one extra scan for μ (64-long
    * collect), then topPc's per-round shape on the centered stream
    * (centering is scan-side codegen, never materialized). */
  def whitenPlan(emb: DataFrame, iters: Int, dims: Int): DataFrame = {
    val spark = emb.sparkSession
    val x = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("xv"))
    val sums = x.select(posexplode(col("xv")).as(Seq("dim", "xd")))
      .select(col("dim"),
        round(col("xd") * lit(1000000000.0), 0).cast("long").as("c"))
      .groupBy(col("dim"))
      .agg(sum(col("c").cast("decimal(38,0)")).as("sfp"), // decimal: the matvec rule
        count(lit(1)).as("n"))
      .collect()
    import spark.implicits._
    // Empty corpus → empty transform (nothing to whiten), matching
    // the oracle's empty CTEs — not an error. A PARTIAL dim count is
    // still real corruption and keeps failing fast.
    val out = if (sums.isEmpty) Seq.empty[(Int, Double, Double, Double)]
    else {
      require(sums.length == dims,
        s"mean returned ${sums.length} dims, want $dims")
      val mu: Array[Double] = sums
        .map(r => r.getAs[Int]("dim") ->
          r.getAs[java.math.BigDecimal]("sfp").doubleValue() / 1e9 /
            r.getAs[Long]("n"))
        .sortBy(_._1).map(_._2)
      val cx = x.withColumn("xv",
        zip_with(col("xv"), typedLit(mu.toSeq), (a, b) => a - b))
      val (v, eig) = powerIter(cx, iters, dims)
        .getOrElse((Array.fill(dims)(0.0), 0.0)) // unreachable: sums nonempty
      mu.zip(v).zipWithIndex.map { case ((m, l), d) => (d, m, l, eig) }.toSeq
    }
    out.toDF("dim", "mu", "loading", "eigval")
      .select(col("dim"), round(col("mu"), 6).as("mu"),
        round(col("loading"), 6).as("loading"),
        round(col("eigval"), 6).as("eigval"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_top_pc" -> ((s, dir) =>
      topPc(table(s, dir, "embeddings"), iters = 2, dims = 64)
        .orderBy(col("dim"))),

    "q154_whiten" -> ((s, dir) =>
      whitenPlan(table(s, dir, "embeddings"), iters = 2, dims = 64)
        .orderBy(col("dim")))
  )

  /** One unrolled power-iteration round: `prev` must expose vl (the
    * direction as a 1-row list); emits y{k} (per-dim matvec) and
    * v{k}l (normalized direction list). Verbatim SQL image of the
    * Spark round: ordered zip-fold dot, nano-unit integer row-sums,
    * ordered norm fold. */
  private def pirRound(k: Int, prevVl: String, src: String = "x"): String =
    s"""d$k AS (
       |  SELECT vec_id, xv,
       |    list_reduce(list_transform(generate_series(1, 64),
       |      i -> xv[i] * vl[i]), (a, b) -> a + b) AS d
       |  FROM $src CROSS JOIN $prevVl),
       |y$k AS (
       |  SELECT i - 1 AS dim,
       |    CAST(SUM(CAST(ROUND((xv[i] * d) * 1000000000.0) AS BIGINT))
       |      AS BIGINT) / 1000000000.0 AS y
       |  FROM d$k, UNNEST(generate_series(1, 64)) AS u(i)
       |  GROUP BY 1),
       |n$k AS (
       |  SELECT SQRT(list_reduce(
       |    list_transform(list(y ORDER BY dim), t -> t * t),
       |    (a, b) -> a + b)) AS nrm
       |  FROM y$k),
       |v${k}l AS (
       |  SELECT list_transform(list(y ORDER BY dim), t -> t / nrm) AS vl
       |  FROM y$k CROSS JOIN n$k GROUP BY nrm)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q147_top_pc" ->
      ("""WITH x AS (
         |  SELECT vec_id,
         |    list_transform(embedding, e -> CAST(e AS DOUBLE)) AS xv
         |  FROM embeddings),
         |v0l AS (SELECT list_transform(generate_series(1, 64),
         |  i -> 0.125) AS vl),
         |""".stripMargin +
        pirRound(1, "v0l") + ",\n" + pirRound(2, "v1l") + "\n" +
        """SELECT i - 1 AS dim, ROUND(vl[i], 6) AS loading,
          |  ROUND((SELECT nrm FROM n2), 6) AS eigval
          |FROM v2l, UNNEST(generate_series(1, 64)) AS u(i)
          |ORDER BY dim""".stripMargin),

    // Mean in nano-unit integer sums, centering one exact subtract per
    // element, then the SAME unrolled rounds over the centered stream.
    "q154_whiten" ->
      ("""WITH x AS (
         |  SELECT vec_id,
         |    list_transform(embedding, e -> CAST(e AS DOUBLE)) AS xv
         |  FROM embeddings),
         |msum AS (
         |  SELECT i,
         |    CAST(SUM(CAST(ROUND(xv[i] * 1000000000.0) AS BIGINT))
         |      AS BIGINT) AS sfp,
         |    COUNT(*) AS n
         |  FROM x, UNNEST(generate_series(1, 64)) AS u(i) GROUP BY i),
         |mul AS (
         |  SELECT list(CAST(sfp AS DOUBLE) / 1000000000.0 / n ORDER BY i)
         |    AS ml
         |  FROM msum),
         |cx AS (
         |  SELECT vec_id,
         |    list_transform(generate_series(1, 64), i -> xv[i] - ml[i]) AS xv
         |  FROM x CROSS JOIN mul),
         |v0l AS (SELECT list_transform(generate_series(1, 64),
         |  i -> 0.125) AS vl),
         |""".stripMargin +
        pirRound(1, "v0l", "cx") + ",\n" + pirRound(2, "v1l", "cx") + "\n" +
        """SELECT i - 1 AS dim, ROUND(ml[i], 6) AS mu,
          |  ROUND(vl[i], 6) AS loading,
          |  ROUND((SELECT nrm FROM n2), 6) AS eigval
          |FROM v2l CROSS JOIN mul, UNNEST(generate_series(1, 64)) AS u(i)
          |ORDER BY dim""".stripMargin)
  )
}
