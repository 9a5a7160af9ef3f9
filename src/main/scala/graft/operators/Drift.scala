package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.{eventsTable, table}

/** Distribution-drift monitoring between two corpus/stream snapshots
  * (SURVEY.md §2.C54) — the Population Stability Index, the standard
  * "did my data change under me" score a training pipeline runs
  * between crawl snapshots, before/after a filter change, or across
  * time windows of an event stream.
  *
  * PSI(A,B) = Σ_bins (p_A − p_B) · ln(p_A / p_B), over a fixed
  * binning, with additive smoothing (+0.5 per bin) so empty bins are
  * defined. Rule-of-thumb reading: < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted.
  *
  * Scale shape: ONE scan of the events computes (group, bin, window)
  * counts — a single uniform-key groupBy whose output is
  * groups × bins rows, KB-sized at any corpus scale; the per-group
  * totals and the PSI fold then run on that tiny frame (broadcast
  * joins). Nothing about the input size reaches the driver.
  */
object Drift {

  /** Per-group PSI between the `isA` and `!isA` halves of `df`.
    * `bin` should be an integer column in [0, nBins) (callers clamp;
    * out-of-range bins are dropped from totals AND fold together by
    * [[psiFromCounts]], so a stray bin can never skew psi silently);
    * the bin spine is completed per group so a bin populated in only
    * one window still contributes. Returns (group, n_a, n_b, psi)
    * with psi rounded to 6 (ln is genuinely FP). */
  def psi(df: DataFrame, group: Column, bin: Column, isA: Column,
      nBins: Int): DataFrame = {
    val binned = df.select(group.as("g"), bin.as("bin"),
      when(isA, lit("a")).otherwise(lit("b")).as("win"))
    val cnt = binned.groupBy(col("g"), col("bin"))
      .agg(sum(when(col("win") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("win") === "b", 1L).otherwise(0L)).as("cb"))
    psiFromCounts(cnt, nBins)
  }

  /** PSI fold over an already-aggregated (g, bin, ca, cb) count frame —
    * the shared tail of [[psi]], public so a STREAMING histogram (see
    * [[windowedHistogram]]) can be scored with byte-identical
    * arithmetic: accumulate windowed counts live, pivot two windows
    * into (ca, cb), fold here. The frame is groups × populated-bins
    * rows — KB-sized — so everything below is broadcast work. */
  def psiFromCounts(cntRaw: DataFrame, nBins: Int): DataFrame = {
    val spark = cntRaw.sparkSession
    // Guard the contract instead of trusting callers: an out-of-range
    // bin (e.g. a negative value under a top-only clamp) would
    // otherwise enter the totals but leave the spine-filled fold,
    // silently skewing psi away from the oracle. Drop it from BOTH.
    val cnt = cntRaw.filter(col("bin") >= 0 && col("bin") < nBins)
    // complete the (group × bin) spine, carrying the per-group totals
    // through it: ONE aggregate over cnt cross-joined with the nBins
    // range (both tiny — broadcast, no real shuffle), then one left
    // join back. cnt is referenced exactly twice (Aggregate + leaf),
    // the self-join shape Catalyst's relation dedup handles for any
    // source — including a streaming memory sink.
    val tot = cnt.groupBy(col("g"))
      .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
    val spine = tot.crossJoin(broadcast(
      spark.range(nBins.toLong).select(col("id").as("bin"))))
    val filled = spine.join(cnt, Seq("g", "bin"), "left")
      .select(col("g"), col("bin"), col("ta"), col("tb"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val sm = lit(0.5 * nBins)
    val pa = (col("ca") + lit(0.5)) / (col("ta") + sm)
    val pb = (col("cb") + lit(0.5)) / (col("tb") + sm)
    filled.groupBy(col("g"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        round(sum((pa - pb) * log(pa / pb)), 6).as("psi"))
  }

  /** The live face: per-(event-time window, group, bin) counts of a
    * stream, append-emitted when the watermark closes each window.
    * State is one count per (window, group, bin) — bounded by the
    * watermark horizon × groups × bins, independent of stream volume.
    * Score drift by pivoting two emitted windows (or a window against
    * a broadcast baseline histogram) into (ca, cb) and folding with
    * [[psiFromCounts]] — same arithmetic as batch [[psi]],
    * spec-proved identical. (One test-only caveat: the fold references
    * its input twice, and Spark's MEMORY-sink relation is the one
    * source that can't be self-joined — snapshot such a frame first;
    * parquet/topic sinks need nothing.) */
  def windowedHistogram(stream: DataFrame, group: Column, bin: Column,
      tsCol: String = "ts", windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"),
        group.as("g"), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("g"), col("bin"), col("n"))

  /** PSI over EQUI-DEPTH bins: bin edges are the baseline (`isA`)
    * window's own exact quantiles, so every bin carries ~equal
    * baseline mass — the statistically standard PSI binning (fixed-
    * width bins under/over-resolve the tails and can hide drift in a
    * fat bin). Edges are rounded to 6 dp in BOTH engines before the
    * comparison (the q43 parity convention for interpolated
    * quantiles). Scale shape: the edge table is groups × (nBins−1)
    * doubles — broadcast onto the second scan; the per-row bin is a
    * counted linear probe of that tiny array, codegen'd scan-side;
    * then the same KB-sized count fold as [[psi]]. Groups absent from
    * the baseline window have no edges and drop out (inner join) —
    * there is no baseline to drift FROM. Two scans total (one to
    * aggregate edges, one to bin), the unavoidable minimum for
    * data-dependent bins. */
  def quantileBinPsi(df: DataFrame, group: Column, value: Column,
      isA: Column, nBins: Int = 10): DataFrame = {
    val tagged = df.select(group.as("g"), value.as("v"),
      when(isA, lit("a")).otherwise(lit("b")).as("win"))
    val qsList = (1 until nBins).map(i => i.toDouble / nBins).mkString(", ")
    // typed dispatch (r14 verdict ask #8): double-typed values take the
    // primitive-map percentile_exact (value-identical to the built-in
    // on doubles — PercentileExactSpec pins it — minus the boxed
    // per-row OpenHashMap); any other input type keeps the built-in,
    // whose generic-typed buffer is the safe path for e.g. bigints
    // beyond 2^53 that a double cast would silently round.
    val pctFn =
      if (tagged.schema("v").dataType ==
          org.apache.spark.sql.types.DoubleType) "percentile_exact"
      else "percentile"
    val edges = tagged.filter(col("win") === "a")
      .groupBy(col("g"))
      .agg(expr(s"transform($pctFn(v, array($qsList)), e -> round(e, 6))")
        .as("edges"))
    val cnt = tagged.join(broadcast(edges), Seq("g"))
      .withColumn("bin",
        expr("aggregate(edges, 0, (acc, e) -> acc + if(v >= e, 1, 0))")
          .cast("long"))
      .groupBy(col("g"), col("bin"))
      .agg(sum(when(col("win") === "a", 1L).otherwise(0L)).as("ca"),
        sum(when(col("win") === "b", 1L).otherwise(0L)).as("cb"))
    psiFromCounts(cnt, nBins)
  }

  /** Exact two-sample Kolmogorov–Smirnov D per group: the max gap
    * between the two windows' empirical CDFs — the binning-free drift
    * test (PSI needs a bin scheme; KS reads the raw distributions, so
    * it can't be gamed by a bin boundary). Scale shape: one scan →
    * per-(group, value) counts; the CDF prefix sums run through
    * [[ShardedCum]] (range-sharded local windows + broadcast shard
    * offsets — no single-reducer-per-group funnel even when a group
    * holds millions of distinct values); totals are a broadcast; D is
    * one more max fold. Groups missing either window drop — a
    * one-sided sample has no two-sample statistic. */
  def ksTest(df: DataFrame, group: Column, value: Column,
      isA: Column): DataFrame = {
    // NULL samples are excluded: a missing value has no CDF position
    // (and the engines disagree on where NULL sorts — Spark ASC puts
    // it first, DuckDB last — so including it would also be
    // non-portable). n_a/n_b are therefore non-null sample sizes.
    val cnt = df.select(group.as("g"), value.as("v"),
        when(isA, 1L).otherwise(0L).as("ia"))
      .filter(col("v").isNotNull)
      .groupBy(col("g"), col("v"))
      .agg(sum(col("ia")).as("ca"), sum(lit(1L) - col("ia")).as("cb"))
    val cum = ShardedCum.cumSums(cnt, Seq("g"), Seq(col("v")),
      Seq((col("ca"), "cum_a"), (col("cb"), "cum_b")))
    val tot = cnt.groupBy(col("g"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    cum.join(broadcast(tot), "g")
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .groupBy(col("g"), col("n_a"), col("n_b"))
      .agg(round(max(abs(
        col("cum_a").cast("double") / col("n_a") -
          col("cum_b").cast("double") / col("n_b"))), 6).as("ks_d"))
      .select(col("g"), col("n_a"), col("n_b"), col("ks_d"))
  }

  /** Two-sample chi-square drift statistic for a CATEGORICAL column —
    * the PSI/KS complement when the monitored column is a label
    * (language, source, event type), where "bins" are the categories
    * themselves. Σ over (category × window) cells of (o − e)²/e with
    * e the pooled expectation; df = n_cats − 1 for the reader's
    * p-value lookup. Scale shape: identical to [[psi]] — one scan to
    * a groups × categories count frame, everything after is broadcast
    * work on KBs. Groups missing either window drop. */
  def chi2Drift(df: DataFrame, group: Column, category: Column,
      isA: Column): DataFrame = {
    val cnt = df.select(group.as("g"), category.as("cat"),
        when(isA, 1L).otherwise(0L).as("ia"))
      .groupBy(col("g"), col("cat"))
      .agg(sum(col("ia")).as("ca"), sum(lit(1L) - col("ia")).as("cb"))
    val tot = cnt.groupBy(col("g"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        count(lit(1)).as("n_cats"))
    val grand = (col("n_a") + col("n_b")).cast("double")
    val ea = (col("ca") + col("cb")) * col("n_a") / grand
    val eb = (col("ca") + col("cb")) * col("n_b") / grand
    cnt.join(broadcast(tot), "g")
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("cell",
        (col("ca") - ea) * (col("ca") - ea) / ea +
          (col("cb") - eb) * (col("cb") - eb) / eb)
      .groupBy(col("g"), col("n_a"), col("n_b"), col("n_cats"))
      .agg(round(sum(col("cell")), 6).as("chi2"))
      .select(col("g"), col("n_a"), col("n_b"), col("n_cats"),
        col("chi2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_ks_test" -> ((s, dir) => {
      // Binning-free twin of q116/q122 on the same split: exact KS D
      // between the half-months' value CDFs per event_type.
      val ev = eventsTable(s, dir)
      ksTest(ev,
        group = col("event_type"),
        value = col("value"),
        isA = col("ts") < expr("timestamp'2024-01-16 00:00:00'"))
        .select(col("g").as("event_type"), col("n_a"), col("n_b"),
          col("ks_d"))
        .orderBy(col("event_type"))
    }),

    "q124_chi2_drift" -> ((s, dir) => {
      // Categorical drift: does the language mix differ between two
      // pseudo-random halves of each source's corpus? The split is an
      // md5 bit of doc_id (q66 seeding pattern) — doc_id PARITY would
      // be useless here: the synthetic generator derives source from
      // doc_id mod, so parity is constant within a source and every
      // group would be one-sided.
      val docs = graft.GraftSession.table(s, dir, "documents")
      chi2Drift(docs,
        group = col("source"),
        category = col("lang"),
        isA = substring(md5(col("doc_id").cast("string")), 1, 1) < "8")
        .select(col("g").as("source"), col("n_a"), col("n_b"),
          col("n_cats"), col("chi2"))
        .orderBy(col("source"))
    }),

    "q122_drift_quantile_psi" -> ((s, dir) => {
      // The equi-depth twin of q116: deciles of the FIRST half-month's
      // value distribution per event_type define the bins; PSI then
      // reads the second half-month's deviation off ~0.1-mass bins.
      val ev = eventsTable(s, dir)
      quantileBinPsi(ev,
        group = col("event_type"),
        value = col("value"),
        isA = col("ts") < expr("timestamp'2024-01-16 00:00:00'"),
        nBins = 10)
        .select(col("g").as("event_type"), col("n_a"), col("n_b"),
          col("psi"))
        .orderBy(col("event_type"))
    }),

    "q116_drift_psi" -> ((s, dir) => {
      // Drift between the first and second half-month of the event
      // stream: per event_type, PSI over 10 fixed-width value bins
      // (floor(value/50) clamped to [0, 9] — floor on BOTH engines; a
      // bare double→int cast rounds in DuckDB and truncates in Spark;
      // the low clamp folds any negative value into bin 0 identically
      // in both engines instead of leaking a bin −1).
      val ev = eventsTable(s, dir)
      psi(ev,
        group = col("event_type"),
        bin = greatest(
          least(floor(col("value") / lit(50.0)).cast("long"), lit(9L)),
          lit(0L)),
        isA = col("ts") < expr("timestamp'2024-01-16 00:00:00'"),
        nBins = 10)
        .select(col("g").as("event_type"), col("n_a"), col("n_b"),
          col("psi"))
        .orderBy(col("event_type"))
    }),

    "q165_filter_bias" -> ((s, dir) => {
      // Filter-bias audit: per language, PSI between the LENGTH
      // distributions of the docs the q145 Gopher rules keep vs drop —
      // hard quality rules are known to disproportionately remove
      // short docs and non-head scripts (the published critique of
      // rule filters), and this is the per-snapshot report that makes
      // that bias visible instead of silent. Composes the gated q145
      // rules (oracle string-shares their CTEs) with the q116 PSI
      // fold; bin = n_chars div 60 clamped to [0, 9]. One rules scan
      // + one KB-sized count fold.
      val docs = table(s, dir, "documents")
      val keep = TextOps.gopherRules(docs).select(col("doc_id"), col("keep"))
      psi(docs.join(keep, "doc_id"),
        group = col("lang"),
        bin = least(expr("n_chars div 60"), lit(9L)),
        isA = col("keep") === 1,
        nBins = 10)
        .select(col("g").as("lang"), col("n_a").as("n_kept"),
          col("n_b").as("n_dropped"), col("psi"))
        .orderBy(col("lang"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q123_ks_test" ->
      """WITH t AS (
        |  SELECT event_type AS g, value AS v,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS ia
        |  FROM events WHERE value IS NOT NULL),
        |cnt AS (SELECT g, v, SUM(ia) AS ca, SUM(1 - ia) AS cb
        |        FROM t GROUP BY 1, 2),
        |tot AS (SELECT g, SUM(ca) AS n_a, SUM(cb) AS n_b
        |        FROM cnt GROUP BY 1),
        |cum AS (
        |  SELECT g, v,
        |    SUM(ca) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
        |    SUM(cb) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
        |  FROM cnt)
        |SELECT c.g AS event_type, CAST(t.n_a AS BIGINT) AS n_a,
        |  CAST(t.n_b AS BIGINT) AS n_b,
        |  ROUND(MAX(ABS(c.cum_a / CAST(t.n_a AS DOUBLE) -
        |                c.cum_b / CAST(t.n_b AS DOUBLE))), 6) AS ks_d
        |FROM cum c JOIN tot t USING (g)
        |WHERE t.n_a > 0 AND t.n_b > 0
        |GROUP BY 1, 2, 3 ORDER BY event_type""".stripMargin,

    "q124_chi2_drift" ->
      """WITH t AS (
        |  SELECT source AS g, lang AS cat,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 1 ELSE 0 END AS ia
        |  FROM documents),
        |cnt AS (SELECT g, cat, SUM(ia) AS ca, SUM(1 - ia) AS cb
        |        FROM t GROUP BY 1, 2),
        |tot AS (SELECT g, SUM(ca) AS n_a, SUM(cb) AS n_b,
        |          COUNT(*) AS n_cats
        |        FROM cnt GROUP BY 1),
        |cells AS (
        |  SELECT c.g, t.n_a, t.n_b, t.n_cats, c.ca, c.cb,
        |    (c.ca + c.cb) * t.n_a / CAST(t.n_a + t.n_b AS DOUBLE) AS ea,
        |    (c.ca + c.cb) * t.n_b / CAST(t.n_a + t.n_b AS DOUBLE) AS eb
        |  FROM cnt c JOIN tot t USING (g)
        |  WHERE t.n_a > 0 AND t.n_b > 0)
        |SELECT g AS source, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b, n_cats,
        |  ROUND(SUM((ca - ea) * (ca - ea) / ea +
        |            (cb - eb) * (cb - eb) / eb), 6) AS chi2
        |FROM cells GROUP BY 1, 2, 3, 4 ORDER BY source""".stripMargin,

    "q122_drift_quantile_psi" ->
      """WITH t AS (
        |  SELECT event_type AS g, value AS v,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END AS win
        |  FROM events),
        |e AS (
        |  SELECT g, list_transform(
        |    quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    x -> round(x, 6)) AS edges
        |  FROM t WHERE win = 'a' GROUP BY g),
        |b AS (
        |  SELECT t.g, t.win,
        |    len(list_filter(e.edges, x -> t.v >= x)) AS bin
        |  FROM t JOIN e USING (g)),
        |cnt AS (
        |  SELECT g, bin,
        |    COUNT(*) FILTER (WHERE win = 'a') AS ca,
        |    COUNT(*) FILTER (WHERE win = 'b') AS cb
        |  FROM b GROUP BY 1, 2),
        |tot AS (SELECT g, SUM(ca) AS ta, SUM(cb) AS tb FROM cnt GROUP BY g),
        |spine AS (
        |  SELECT tot.g, tot.ta, tot.tb, r.range AS bin
        |  FROM tot CROSS JOIN range(10) r),
        |filled AS (
        |  SELECT s.g, s.bin, s.ta, s.tb,
        |    COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
        |  FROM spine s LEFT JOIN cnt c ON s.g = c.g AND s.bin = c.bin)
        |SELECT g AS event_type,
        |  CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
        |  ROUND(SUM(
        |    ((ca + 0.5) / (ta + 5.0) - (cb + 0.5) / (tb + 5.0)) *
        |    LN(((ca + 0.5) / (ta + 5.0)) / ((cb + 0.5) / (tb + 5.0)))
        |  ), 6) AS psi
        |FROM filled GROUP BY g ORDER BY g""".stripMargin,

    "q116_drift_psi" ->
      """WITH binned AS (
        |  SELECT event_type,
        |    GREATEST(LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9), 0) AS bin,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END AS win
        |  FROM events),
        |spine AS (
        |  SELECT DISTINCT event_type, r.range AS bin
        |  FROM binned CROSS JOIN range(10) r),
        |cnt AS (
        |  SELECT event_type, bin,
        |    COUNT(*) FILTER (WHERE win = 'a') AS ca,
        |    COUNT(*) FILTER (WHERE win = 'b') AS cb
        |  FROM binned GROUP BY 1, 2),
        |filled AS (
        |  SELECT s.event_type, s.bin,
        |    COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
        |  FROM spine s LEFT JOIN cnt c
        |    ON s.event_type = c.event_type AND s.bin = c.bin),
        |tot AS (
        |  SELECT event_type, SUM(ca) AS ta, SUM(cb) AS tb
        |  FROM filled GROUP BY 1)
        |SELECT f.event_type,
        |  CAST(SUM(f.ca) AS BIGINT) AS n_a, CAST(SUM(f.cb) AS BIGINT) AS n_b,
        |  ROUND(SUM(
        |    ((f.ca + 0.5) / (t.ta + 5.0) - (f.cb + 0.5) / (t.tb + 5.0)) *
        |    LN(((f.ca + 0.5) / (t.ta + 5.0)) / ((f.cb + 0.5) / (t.tb + 5.0)))
        |  ), 6) AS psi
        |FROM filled f JOIN tot t ON f.event_type = t.event_type
        |GROUP BY f.event_type ORDER BY f.event_type""".stripMargin,

    // String-shares q145's rule CTEs (TextOps.gopherCtes) so the keep
    // split is provably the gated rules' own, then the q116 PSI fold.
    "q165_filter_bias" ->
      ("WITH " + TextOps.gopherCtes + ",\n" +
       """binned AS (
         |  SELECT d2.lang AS g, LEAST(d2.n_chars // 60, 9) AS bin,
         |    CASE WHEN m.fail_mask = 0 THEN 'a' ELSE 'b' END AS win
         |  FROM documents d2 JOIN m ON m.doc_id = d2.doc_id),
         |spine AS (
         |  SELECT DISTINCT g, r.range AS bin
         |  FROM binned CROSS JOIN range(10) r),
         |cnt AS (
         |  SELECT g, bin,
         |    COUNT(*) FILTER (WHERE win = 'a') AS ca,
         |    COUNT(*) FILTER (WHERE win = 'b') AS cb
         |  FROM binned GROUP BY 1, 2),
         |filled AS (
         |  SELECT s.g, s.bin, COALESCE(c.ca, 0) AS ca,
         |    COALESCE(c.cb, 0) AS cb
         |  FROM spine s LEFT JOIN cnt c ON s.g = c.g AND s.bin = c.bin),
         |tot AS (SELECT g, SUM(ca) AS ta, SUM(cb) AS tb
         |        FROM filled GROUP BY 1)
         |SELECT f.g AS lang,
         |  CAST(SUM(f.ca) AS BIGINT) AS n_kept,
         |  CAST(SUM(f.cb) AS BIGINT) AS n_dropped,
         |  ROUND(SUM(
         |    ((f.ca + 0.5) / (t.ta + 5.0) - (f.cb + 0.5) / (t.tb + 5.0)) *
         |    LN(((f.ca + 0.5) / (t.ta + 5.0)) / ((f.cb + 0.5) / (t.tb + 5.0)))
         |  ), 6) AS psi
         |FROM filled f JOIN tot t ON f.g = t.g
         |GROUP BY f.g ORDER BY lang""".stripMargin)
  )
}
