package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession.eventsTable

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
      .withColumn("variance",
        (col("s2").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n")) /
          (col("n") - 1))
    val a = g.filter(col("cohort") === 0)
      .select(col("event_type"), col("n").as("n0"), col("mean").as("mean0"),
        col("variance").as("v0"))
    val b = g.filter(col("cohort") === 1)
      .select(col("event_type"), col("n").as("n1"), col("mean").as("mean1"),
        col("variance").as("v1"))
    val se2 = col("v0") / col("n0") + col("v1") / col("n1")
    a.join(b, Seq("event_type"))
      .withColumn("t_stat", (col("mean0") - col("mean1")) / sqrt(se2))
      .withColumn("df",
        (se2 * se2) /
          ((col("v0") / col("n0")) * (col("v0") / col("n0")) / (col("n0") - 1) +
           (col("v1") / col("n1")) * (col("v1") / col("n1")) / (col("n1") - 1)))
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
    s.withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
      .select(col("event_type"), col("d_days").as("n_days"), col("total"),
        col("day").as("peak_day"), abs(col("s_k")).as("s_abs"),
        round(abs(col("s_k")).cast("double") /
          (col("d_days").cast("double") * col("total")), 6).as("cusum_frac"))
      .withColumn("shifted", col("cusum_frac") > threshold)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
