package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.{ckpt, eventsTable}

/** Statistical event analytics (SURVEY.md §2.B53–B56) — the
  * experiment/monitoring layer over the event log: A/B testing,
  * behavior transition modelling, co-occurrence lift, and
  * change-point detection. Every operator reduces the log to a
  * KB-sized frame in ONE map-side-combined pass before any math, and
  * all statistics assemble in double from EXACT integer/decimal
  * aggregates — bit-identical across engines and partitionings.
  */
object EventStats {

  /** Welch's two-sample t-test per event type between user cohorts
    * (user_id parity = the assignment hash): n/mean per cohort, the
    * t statistic, Welch–Satterthwaite df, and the |t| > 1.96 flag.
    * Sums are exact decimals (value is 2-dp money), variances and t
    * assemble in double from those exact values. One scan,
    * |types|×2-row shuffle. */
  def abTest(events: DataFrame): DataFrame = {
    val g = events
      .withColumn("cohort", (col("user_id") % 2).cast("int"))
      .groupBy(col("event_type"), col("cohort"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("s"),
        sum((col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("decimal(38,4)")).as("s2"))
      .withColumn("mean", col("s").cast("double") / col("n"))
      // n = 1 leaves the variance undefined (NULL), not a divide-by-
      // zero: ANSI mode (Spark 4 default) would otherwise abort the
      // whole job on one single-event cohort (the saxMotifs guard rule)
      .withColumn("variance", when(col("n") > 1,
        (col("s2").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n")) /
          (col("n") - 1)))
    val a = g.filter(col("cohort") === 0)
      .select(col("event_type"), col("n").as("n0"), col("mean").as("mean0"),
        col("variance").as("v0"))
    val b = g.filter(col("cohort") === 1)
      .select(col("event_type"), col("n").as("n1"), col("mean").as("mean1"),
        col("variance").as("v1"))
    val se2 = col("v0") / col("n0") + col("v1") / col("n1")
    a.join(b, Seq("event_type"))
      // se2 = 0 (both cohorts constant) leaves t/df undefined rather
      // than dividing by zero; a NULL variance (n = 1) propagates NULL
      // through se2 and both stats on its own
      .withColumn("t_stat",
        when(se2 > 0, (col("mean0") - col("mean1")) / sqrt(se2)))
      .withColumn("df", when(se2 > 0,
        (se2 * se2) /
          ((col("v0") / col("n0")) * (col("v0") / col("n0")) / (col("n0") - 1) +
           (col("v1") / col("n1")) * (col("v1") / col("n1")) / (col("n1") - 1))))
      .select(col("event_type"), col("n0"), col("n1"),
        round(col("mean0"), 6).as("mean0"), round(col("mean1"), 6).as("mean1"),
        round(col("t_stat"), 6).as("t_stat"), round(col("df"), 2).as("df"),
        (abs(col("t_stat")) > 1.96).as("significant"))
  }

  /** First-order behavior model: per-user event-type transition
    * counts and row-normalized probabilities — the Markov chain a
    * session-prediction / anomaly screen is scored against. One
    * user_id shuffle for the lag, one uniform (from, to) re-agg. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wf = Window.partitionBy(col("from_type"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") / sum(col("n")).over(wf), 6))
  }

  /** Co-occurrence lift between event-type pairs over user audiences:
    * lift(a,b) = P(a∧b)/(P(a)·P(b)) on distinct users — the
    * market-basket affinity matrix. The log collapses to distinct
    * (user, type) once; the pair join is |types|²-bounded. Lift
    * assembles from four exact integers. */
  def typeLift(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    val nTot = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val per = ut.groupBy(col("event_type")).agg(count(lit(1)).as("na"))
    val both = ut.as("x").join(ut.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(per.select(col("event_type").as("type_a"),
        col("na").as("n_a"))), Seq("type_a"))
      .join(broadcast(per.select(col("event_type").as("type_b"),
        col("na").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nTot))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round((col("n_both").cast("double") * col("n_users")) /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
  }

  /** CUSUM change-point scan per event type over the DAILY count
    * series: S_k = D·prefix_k − k·T stays INTEGER (the mean-centered
    * cumulative sum scaled by D to avoid the rational mean), the
    * change point is the argmax of |S_k| (earliest day on ties), and
    * the normalized statistic |S|/( D·T ) ∈ [0, 1) flags a level
    * shift. One scan to a |types|×|days| frame; windows run per type.
    */
  def cusumChangepoint(events: DataFrame, threshold: Double = 0.05)
      : DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val s = daily
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("prefix", sum(col("c")).over(wOrd))
      .withColumn("d_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("c")).over(wAll))
      .withColumn("s_k",
        col("d_days") * col("prefix") - col("k") * col("total"))
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("s_k")).desc, col("day"))
    // shifted tests the UNROUNDED fraction — the oracle compares the
    // raw value against the threshold, so testing the round(...,6)
    // output would flip the boolean for values within 5e-7 of the
    // threshold (latent parity break, r9 review fix)
    val frac = abs(col("s_k")).cast("double") /
      (col("d_days").cast("double") * col("total"))
    s.withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
      .select(col("event_type"), col("d_days").as("n_days"), col("total"),
        col("day").as("peak_day"), abs(col("s_k")).as("s_abs"),
        round(frac, 6).as("cusum_frac"),
        (frac > threshold).as("shifted"))
  }

  /** Conversion latency from each user's FIRST `fromType` to their
    * FIRST `toType`, for users whose first `toType` does not precede
    * their first `fromType` (strict funnel order — a user who
    * purchased before ever viewing is not a conversion of the view
    * funnel and is excluded): per-cohort (user parity) exact
    * interpolated latency percentiles in seconds — the experiment
    * readout that goes beyond q158's mean shift (latency is
    * heavy-tailed; the median and p90 are what move decisions). One
    * scan to per-user (first_from, first_to) pairs (map-side
    * combinable min aggregates), then a |cohorts|-row percentile
    * fold. */
  def conversionLatency(events: DataFrame, fromType: String,
      toType: String): DataFrame = {
    val firsts = events
      .filter(col("event_type").isin(fromType, toType))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === fromType, col("ts").cast("long")))
          .as("t_from"),
        min(when(col("event_type") === toType, col("ts").cast("long")))
          .as("t_to"))
      .filter(col("t_from").isNotNull && col("t_to").isNotNull &&
        col("t_to") >= col("t_from"))
      .select((col("user_id") % 2).cast("int").as("cohort"),
        (col("t_to") - col("t_from")).as("latency_s"))
    firsts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_converted"),
        // percentile_exact (native double twin of the built-in): the
        // integer-second latency casts losslessly (seconds << 2^53),
        // same distinct keys, same interpolation values
        expr("percentile_exact(cast(latency_s as double), array(0.5, 0.9))")
          .as("qp"))
      .select(col("cohort"), col("n_converted"),
        round(col("qp")(0), 6).as("p50_s"),
        round(col("qp")(1), 6).as("p90_s"))
  }

  /** Burstiness (Fano factor) per event type over hourly counts:
    * var/mean of the count series across the GLOBAL hour span
    * (absent hours count as zero — computed via the span length, not
    * a spine). Poisson traffic ⇒ ~1; schedulers/batch jobs ≫ 1.
    * Exact: Fano = (T·Σc² − (Σc)²) / (T·Σc) from integer sums; the
    * span is a 1-row broadcast aggregate. */
  def burstiness(events: DataFrame): DataFrame = {
    val hc = events
      .select(col("event_type"), expr("cast(ts as long) div 3600").as("t"))
      .groupBy(col("event_type"), col("t")).agg(count(lit(1)).as("c"))
    val span = hc.agg((max(col("t")) - min(col("t")) + 1).as("span_h"))
    hc.groupBy(col("event_type"))
      .agg(sum(col("c")).as("sc"),
        // Σc² in decimal: long accumulation overflows near 1e19 (a
        // corpus-scale type at ~2.5e8/hour crosses it); the DuckDB
        // mirror already accumulates in HUGEINT (abTest's s2 rule)
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("sc2"),
        count(lit(1)).as("active_h"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("sc").as("n_events"),
        col("active_h"), col("span_h"),
        round((col("span_h").cast("double") * col("sc2") -
          col("sc").cast("double") * col("sc")) /
          (col("span_h").cast("double") * col("sc")), 6).as("fano"))
  }

  /** Top session paths: the most frequent first-3-event-type
    * sequences over 30-minute-gap sessions — the product-analytics
    * "how do sessions start" report. Sessionization is the q27 shape
    * (one user_id shuffle serves lag + session id + rank); the path
    * agg is uniform-key with map-side combine. */
  def topSessionPaths(events: DataFrame, k: Int = 10): DataFrame = {
    val wu = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("new_sess",
        when(col("ts").cast("long") -
          lag(col("ts").cast("long"), 1).over(wu) > 1800, 1L)
          .otherwise(when(lag(col("ts"), 1).over(wu).isNull, 1L).otherwise(0L)))
      .withColumn("sess_id", sum(col("new_sess")).over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(col("user_id"), col("sess_id"))
      .orderBy(col("ts"), col("event_id"))
    sess.withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(array_join(array_sort(collect_list(struct(col("rn"), col("event_type")))
        .cast("array<struct<rn:int,event_type:string>>"))
        .getField("event_type"), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Engagement concentration: the Gini coefficient and top-decile
    * share of per-user event counts — the one-row "is this product
    * ten whales or a community" readout (and, over a training corpus's
    * per-source token mass, the data-concentration twin of the q172
    * HHI). Exact: counts are integers, the Lorenz sum Σ i·x_(i) uses
    * the rank window's total order (count asc, user_id), and
    * G = 2Σi·x_i/(n·Σx) − (n+1)/n assembles in double from exact
    * integers. The ranked frame is |users| rows — KB-scale after the
    * one map-side-combined per-user count. */
  def engagementGini(events: DataFrame): DataFrame = {
    // The Lorenz rank i is a GLOBAL row_number over |users| rows — an
    // unpartitioned window funnels a billion-user frame through one
    // reducer, so the rank is ShardedCum's range-sharded prefix count
    // and n rides a 1-row broadcast instead of a global count window.
    val per = events.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val nTot = per.agg(count(lit(1)).as("n"))
    val ranked = ShardedCum
      .globalRank(per, Seq(col("c"), col("user_id")), "i")
      .crossJoin(broadcast(nTot))
      .withColumn("decile_cut", expr("(n * 9 + 9) div 10")) // ceil(0.9n)
    ranked.agg(
        max(col("n")).as("n_users"),
        sum(col("c")).as("total_events"),
        // Σ i·c in decimal: rank×count products sum past Long range on
        // billion-user logs (the burstiness Σc² rule)
        sum((col("i") * col("c")).cast("decimal(38,0)")).as("lorenz"),
        sum(when(col("i") > col("decile_cut"), col("c")).otherwise(0L))
          .as("top_events"))
      .select(col("n_users"), col("total_events"),
        round(lit(2.0) * col("lorenz") /
          (col("n_users").cast("double") * col("total_events")) -
          (col("n_users") + 1).cast("double") / col("n_users"), 6)
          .as("gini"),
        round(col("top_events").cast("double") / col("total_events"), 6)
          .as("top_decile_share"))
  }

  /** RFM segmentation (recency / frequency / monetary — the classic
    * user-value grid): per user, days since last event (vs the
    * corpus's max date, a 1-row broadcast), event count, and exact
    * decimal value volume; each metric quartiled by NTILE(4) with a
    * TOTAL order (metric, user_id) so segment assignment is
    * deterministic; output = the 4×4×4 segment grid with counts and
    * mean value. Quartile 1 = best (most recent / most frequent /
    * highest spend). Scale: the log collapses to one row per user
    * map-side; each metric's rank then comes from a range-sharded
    * ShardedCum prefix count (32 reducers per metric) — never an
    * unpartitioned ntile window's single-reducer sort. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(col("value").cast("decimal(18,2)")).as("mon"))
    val refDay = events.agg(max(to_date(col("ts"))).as("ref_day"))
    val base = perUser.crossJoin(broadcast(refDay))
      .withColumn("recency_d", datediff(col("ref_day"), col("last_day")))
    // Each quartile is a GLOBAL ntile over |users| rows; three
    // unpartitioned windows would each funnel the whole frame through
    // one reducer. Instead: range-sharded ShardedCum ranks + arithmetic
    // buckets off a broadcast n.
    //
    // r14 (guide §2.4 — share one exchange): the three per-metric
    // ranks formerly ran as three SEPARATE cumSums passes (3 ckpt
    // materializations + 3 range-sampling jobs + 3 offset broadcasts —
    // 34 fixed jobs at sf0.1). They now ride ONE pass over a
    // metric-tagged union (3n rows, same shuffle BYTES as 3 passes of
    // n rows, two fewer barriers): group = metric tag, order =
    // (nullflag, key, user_id) where key is the metric cast to
    // decimal(38,6) — an order-preserving exact cast — negated for the
    // desc metrics, and nullflag reproduces each ordering's null
    // placement (asc = nulls FIRST, desc = nulls LAST) so the total
    // order per tag is EXACTLY the old per-metric (metric, user_id)
    // order and every rank is byte-identical. The pivot back to one
    // row per user is a plain (user_id) max-when aggregate.
    val nTot = base.agg(count(lit(1)).as("_n"))
    def ascKey(v: Column) = struct(
      when(v.isNull, 0).otherwise(1).as("nf"),
      v.cast("decimal(38,6)").as("k"))
    def descKey(v: Column) = struct(
      when(v.isNull, 1).otherwise(0).as("nf"),
      (-v).cast("decimal(38,6)").as("k"))
    val tagged = base.select(col("user_id"), col("mon"),
      explode(array(
        struct(lit(0).as("m"), ascKey(col("recency_d")).as("key")),
        struct(lit(1).as("m"), descKey(col("freq")).as("key")),
        struct(lit(2).as("m"), descKey(col("mon")).as("key")))).as("t"))
      .select(col("user_id"), col("mon"),
        col("t.m").as("_m"), col("t.key").as("_key"))
    val ranked = ShardedCum.cumSums(tagged, Seq("_m"),
        Seq(col("_key"), col("user_id")), Seq((lit(1L), "_rn")))
      .groupBy(col("user_id"))
      .agg(max(col("mon")).as("mon"),
        max(when(col("_m") === 0, col("_rn"))).as("_r_rn"),
        max(when(col("_m") === 1, col("_rn"))).as("_f_rn"),
        max(when(col("_m") === 2, col("_rn"))).as("_m_rn"))
    ranked.crossJoin(broadcast(nTot))
      .withColumn("r_q", ShardedCum.ntileFromRank("_r_rn", "_n", 4))
      .withColumn("f_q", ShardedCum.ntileFromRank("_f_rn", "_n", 4))
      .withColumn("m_q", ShardedCum.ntileFromRank("_m_rn", "_n", 4))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("mon")).cast("double") / count(lit(1)), 6)
          .as("mean_monetary"))
  }

  /** Hour-of-day activity profile per event type: share of the
    * type's events per UTC hour plus its peak hour (ties → earliest)
    * — the diurnal shape behind the cadence score (B51 says
    * "24h-periodic"; this says WHEN). One map-side-combined scan to
    * |types|×24 rows; shares from exact integers. */
  def diurnalProfile(events: DataFrame): DataFrame = {
    val hc = events
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type"))
    hc.withColumn("share",
        round(col("c").cast("double") / sum(col("c")).over(w), 6))
      .withColumn("is_peak",
        rank().over(Window.partitionBy(col("event_type"))
          .orderBy(col("c").desc, col("hod"))) === 1)
      .select(col("event_type"), col("hod"), col("c").as("n_events"),
        col("share"), col("is_peak"))
  }

  /** Entropy rate of the first-order behavior chain (conditional
    * entropy of next-type given current, weighted by state
    * occupancy): H = Σ_{from,to} (n/T)·ln(n_from/n) nats — the
    * predictability score of the event stream (0 = deterministic
    * bots, ln|types| = uniform noise). Per-transition terms round to
    * nano-units and sum as integers (order-independent), so H is
    * bit-stable; composes [[markovTransitions]]' count table. */
  def entropyRate(events: DataFrame): DataFrame = {
    val trans = markovTransitions(events)
      .select(col("from_type"), col("to_type"), col("n"))
    val nf = trans.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    val tot = trans.agg(sum(col("n")).as("t"))
    trans.join(broadcast(nf), Seq("from_type"))
      .crossJoin(broadcast(tot))
      .select(round((col("n").cast("double") / col("t")) *
        log(col("n_from").cast("double") / col("n")) * lit(1e9), 0)
        .cast("long").as("term_fp"), col("t"))
      .groupBy(col("t"))
      .agg(sum(col("term_fp")).as("h_fp"))
      .select(col("t").as("n_transitions"),
        round(col("h_fp") / lit(1e9), 6).as("entropy_nats"),
        round(exp(col("h_fp") / lit(1e9)), 6).as("perplexity"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_conversion_latency" -> ((s, dir) =>
      conversionLatency(eventsTable(s, dir), "view", "purchase")
        .orderBy(col("cohort"))),

    "q168_burstiness" -> ((s, dir) =>
      burstiness(eventsTable(s, dir)).orderBy(col("event_type"))),

    "q169_session_paths" -> ((s, dir) =>
      topSessionPaths(eventsTable(s, dir), k = 10)),

    "q170_entropy_rate" -> ((s, dir) =>
      entropyRate(eventsTable(s, dir))),

    "q185_engagement_gini" -> ((s, dir) =>
      engagementGini(eventsTable(s, dir))),

    "q175_rfm_segments" -> ((s, dir) =>
      rfmSegments(eventsTable(s, dir))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))),

    "q173_diurnal_profile" -> ((s, dir) =>
      diurnalProfile(eventsTable(s, dir))
        .orderBy(col("event_type"), col("hod"))),

    "q171_kll_quantiles" -> ((s, dir) => {
      // KLL quantile-sketch rung with the q102/q115-style in-artifact
      // evidence: one combinable sketch pass per event type (O(k)
      // state, the shape that replaces a full per-group sort at
      // 100 TB), quantiles read off the sketch, then the EXACT rank of
      // each estimate computed with one more scan (15-row broadcast) —
      // rows outside the ±0.05 normalized-rank bound are FILTERED, so
      // a sketch regression shows up as a row-count drop in the
      // rows-only gate. Estimates are merge-order dependent (like
      // Misra-Gries); the bound is not.
      val ev = eventsTable(s, dir)
      val est = ckpt(ev.groupBy(col("event_type"))
        .agg(expr("kll_sketch_agg(value, 200)").as("sk"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"), col("sk"),
          explode(typedLit(Seq(0.5, 0.9, 0.99))).as("p"))
        .withColumn("est", expr("kll_quantile(sk, p)"))
        .drop("sk"))
      ev.select(col("event_type"), col("value"))
        .join(broadcast(est), Seq("event_type"))
        .groupBy(col("event_type"), col("p"), col("est"), col("n"))
        .agg(sum(when(col("value") <= col("est"), 1L).otherwise(0L))
          .as("rank_le"))
        .withColumn("rank_frac", col("rank_le").cast("double") / col("n"))
        .withColumn("within_bounds", abs(col("rank_frac") - col("p")) <= 0.05)
        .filter(col("within_bounds"))
        .select(col("event_type"), col("p"), round(col("est"), 3).as("est"),
          round(col("rank_frac"), 4).as("rank_frac"), col("within_bounds"))
        .orderBy(col("event_type"), col("p"))
    }),

    "q158_ab_ttest" -> ((s, dir) =>
      abTest(eventsTable(s, dir)).orderBy(col("event_type"))),

    "q159_markov_transitions" -> ((s, dir) =>
      markovTransitions(eventsTable(s, dir))
        .orderBy(col("from_type"), col("to_type"))),

    "q160_type_lift" -> ((s, dir) =>
      typeLift(eventsTable(s, dir)).orderBy(col("type_a"), col("type_b"))),

    "q161_cusum_changepoint" -> ((s, dir) =>
      cusumChangepoint(eventsTable(s, dir)).orderBy(col("event_type")))
  )

  val oracle: Map[String, String] = Map(
    "q185_engagement_gini" ->
      """WITH per AS (
        |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
        |r AS (
        |  SELECT c,
        |    CAST(ROW_NUMBER() OVER (ORDER BY c, user_id) AS BIGINT) AS i,
        |    COUNT(*) OVER () AS n
        |  FROM per),
        |a AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n_users,
        |    CAST(SUM(c) AS BIGINT) AS total_events,
        |    CAST(SUM(i * c) AS BIGINT) AS lorenz,
        |    CAST(SUM(CASE WHEN i > (n * 9 + 9) // 10 THEN c ELSE 0 END)
        |      AS BIGINT) AS top_events
        |  FROM r)
        |SELECT n_users, total_events,
        |  ROUND(2.0 * lorenz / (CAST(n_users AS DOUBLE) * total_events)
        |    - CAST(n_users + 1 AS DOUBLE) / n_users, 6) AS gini,
        |  ROUND(CAST(top_events AS DOUBLE) / total_events, 6)
        |    AS top_decile_share
        |FROM a""".stripMargin,

    "q175_rfm_segments" ->
      """WITH pu AS (
        |  SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day,
        |    COUNT(*) AS freq,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS mon
        |  FROM events GROUP BY user_id),
        |ref AS (SELECT MAX(CAST(ts AS DATE)) AS ref_day FROM events),
        |base AS (
        |  SELECT pu.*, DATEDIFF('day', last_day, ref_day) AS recency_d
        |  FROM pu CROSS JOIN ref),
        |q AS (
        |  SELECT user_id, mon,
        |    CAST(NTILE(4) OVER (ORDER BY recency_d, user_id) AS INTEGER)
        |      AS r_q,
        |    CAST(NTILE(4) OVER (ORDER BY freq DESC, user_id) AS INTEGER)
        |      AS f_q,
        |    CAST(NTILE(4) OVER (ORDER BY mon DESC, user_id) AS INTEGER)
        |      AS m_q
        |  FROM base)
        |SELECT r_q, f_q, m_q, COUNT(*) AS n_users,
        |  ROUND(CAST(SUM(mon) AS DOUBLE) / COUNT(*), 6) AS mean_monetary
        |FROM q GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin,

    "q173_diurnal_profile" ->
      """WITH hc AS (
        |  SELECT event_type, EXTRACT(hour FROM ts) AS hod, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(hod AS INTEGER) AS hod, c AS n_events,
        |  ROUND(CAST(c AS DOUBLE) /
        |    SUM(c) OVER (PARTITION BY event_type), 6) AS share,
        |  RANK() OVER (PARTITION BY event_type ORDER BY c DESC, hod) = 1
        |    AS is_peak
        |FROM hc ORDER BY event_type, hod""".stripMargin,

    "q167_conversion_latency" ->
      """WITH f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view'
        |      THEN CAST(FLOOR(EPOCH(ts)) AS BIGINT) END) AS t_from,
        |    MIN(CASE WHEN event_type = 'purchase'
        |      THEN CAST(FLOOR(EPOCH(ts)) AS BIGINT) END) AS t_to
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY user_id),
        |l AS (
        |  SELECT CAST(user_id % 2 AS INTEGER) AS cohort,
        |    t_to - t_from AS latency_s
        |  FROM f WHERE t_from IS NOT NULL AND t_to IS NOT NULL
        |    AND t_to >= t_from)
        |SELECT cohort, COUNT(*) AS n_converted,
        |  ROUND(quantile_cont(latency_s, 0.5), 6) AS p50_s,
        |  ROUND(quantile_cont(latency_s, 0.9), 6) AS p90_s
        |FROM l GROUP BY cohort ORDER BY cohort""".stripMargin,

    "q168_burstiness" ->
      """WITH hc AS (
        |  SELECT event_type,
        |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600 AS t, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT MAX(t) - MIN(t) + 1 AS span_h FROM hc),
        |g AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS sc,
        |    CAST(SUM(c * c) AS BIGINT) AS sc2, COUNT(*) AS active_h
        |  FROM hc GROUP BY 1)
        |SELECT event_type, sc AS n_events, active_h,
        |  CAST(span_h AS BIGINT) AS span_h,
        |  ROUND((CAST(span_h AS DOUBLE) * sc2 - CAST(sc AS DOUBLE) * sc)
        |    / (CAST(span_h AS DOUBLE) * sc), 6) AS fano
        |FROM g CROSS JOIN span ORDER BY event_type""".stripMargin,

    "q169_session_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT)
        |        - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT), 1)
        |          OVER w > 1800 THEN 1
        |      WHEN LAG(ts, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM e),
        |r AS (
        |  SELECT user_id, sess_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, sess_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM s),
        |p AS (
        |  SELECT user_id, sess_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY 1, 2)
        |SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,

    "q170_entropy_rate" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |nf AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        |       FROM c GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tt FROM c),
        |terms AS (
        |  SELECT CAST(ROUND((CAST(n AS DOUBLE) / tt)
        |      * LN(CAST(n_from AS DOUBLE) / n) * 1000000000.0) AS BIGINT)
        |      AS term_fp, tt
        |  FROM c JOIN nf USING (from_type) CROSS JOIN tot)
        |SELECT tt AS n_transitions,
        |  ROUND(CAST(SUM(term_fp) AS BIGINT) / 1000000000.0, 6)
        |    AS entropy_nats,
        |  ROUND(EXP(CAST(SUM(term_fp) AS BIGINT) / 1000000000.0), 6)
        |    AS perplexity
        |FROM terms GROUP BY tt""".stripMargin,

    "q158_ab_ttest" ->
      """WITH g AS (
        |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS cohort,
        |    COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS s,
        |    SUM(CAST(CAST(value AS DECIMAL(18,2)) *
        |      CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS s2
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, cohort, n,
        |    CAST(s AS DOUBLE) / n AS mean,
        |    (CAST(s2 AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)
        |      AS variance
        |  FROM g),
        |j AS (
        |  SELECT a.event_type, a.n AS n0, b.n AS n1,
        |    a.mean AS mean0, b.mean AS mean1,
        |    a.variance AS v0, b.variance AS v1,
        |    a.variance / a.n + b.variance / b.n AS se2
        |  FROM m a JOIN m b USING (event_type)
        |  WHERE a.cohort = 0 AND b.cohort = 1)
        |SELECT event_type, n0, n1,
        |  ROUND(mean0, 6) AS mean0, ROUND(mean1, 6) AS mean1,
        |  ROUND((mean0 - mean1) / SQRT(se2), 6) AS t_stat,
        |  ROUND((se2 * se2) /
        |    ((v0 / n0) * (v0 / n0) / (n0 - 1)
        |      + (v1 / n1) * (v1 / n1) / (n1 - 1)), 2) AS df,
        |  ABS((mean0 - mean1) / SQRT(se2)) > 1.96 AS significant
        |FROM j ORDER BY event_type""".stripMargin,

    "q159_markov_transitions" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  ROUND(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    "q160_type_lift" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |ntot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
        |per AS (SELECT event_type, COUNT(*) AS na FROM ut GROUP BY 1),
        |pr AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    COUNT(*) AS n_both
        |  FROM ut x JOIN ut y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT b.type_a, b.type_b, pa.na AS n_a, pb.na AS n_b, b.n_both,
        |  ROUND((CAST(b.n_both AS DOUBLE) * n.n_users) /
        |    (CAST(pa.na AS DOUBLE) * pb.na), 6) AS lift
        |FROM pr b
        |JOIN per pa ON pa.event_type = b.type_a
        |JOIN per pb ON pb.event_type = b.type_b
        |CROSS JOIN ntot n
        |ORDER BY type_a, type_b""".stripMargin,

    "q161_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, day, c,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
        |    CAST(SUM(c) OVER w AS BIGINT) AS prefix,
        |    CAST(COUNT(*) OVER wt AS BIGINT) AS d_days,
        |    CAST(SUM(c) OVER wt AS BIGINT) AS total
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day),
        |    wt AS (PARTITION BY event_type)),
        |sk AS (
        |  SELECT *, d_days * prefix - k * total AS s_k FROM s),
        |pick AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY ABS(s_k) DESC, day) AS rn
        |  FROM sk)
        |SELECT event_type, d_days AS n_days, total, day AS peak_day,
        |  ABS(s_k) AS s_abs,
        |  ROUND(CAST(ABS(s_k) AS DOUBLE) /
        |    (CAST(d_days AS DOUBLE) * total), 6) AS cusum_frac,
        |  CAST(ABS(s_k) AS DOUBLE) /
        |    (CAST(d_days AS DOUBLE) * total) > 0.05 AS shifted
        |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin
  )
}
