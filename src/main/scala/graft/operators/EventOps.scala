package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.GraftSession.{ckpt, dec, dsum, eventsTable, table}

/** Pack B — event-log / kafkaish semantics over the `events` table
  * (SURVEY.md §2.B). Each query is the batch face of a reference
  * behavior (replay, ack/lag, latest, compaction, windows, live
  * enrichment); the live faces live in graft.streaming.TopicStream.
  *
  * The `events` table maps onto the topic model (SURVEY.md §3):
  * event_id = offset, event_type = event, user_id = key.
  *
  * Scale notes: replay predicates (offset > watermark, event = X) push
  * into the parquet scan; the subscriber table is broadcast (never
  * shuffles the log); windows/sessionization shuffle once on the
  * grouping key with AQE handling skew.
  */
object EventOps {

  /** Gap-based sessions (30 min) per user: lag -> new-session flag ->
    * running sum = session id; then per-session rollup. One shuffle on
    * user_id serves both windows and the final groupBy. UNSORTED —
    * q27's gate adds its output orderBy; internal consumers (q110's
    * checkpoint) must not pay a global range sort whose order the next
    * shuffle destroys (r9 review fix). */
  private def sessionRollup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    eventsTable(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("t_start"),
        max(col("ts")).as("t_end"),
        dsum(col("value")).as("sum_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_replay_from_offset" -> ((s, dir) => {
      // Durable replay (topic.js:142-197): resume after acked offset 500,
      // one event type, in offset order.
      eventsTable(s, dir)
        .filter(col("event_id") > 500 && col("event_type") === "click")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    }),

    "q21_replay_all" -> ((s, dir) => {
      // New-subscriber replay from the beginning (topic.js:129-135).
      eventsTable(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value"), col("props"))
        .orderBy(col("event_id"))
    }),

    "q22_consumer_lag" -> ((s, dir) => {
      // Backlog per named subscriber = records past its acked watermark
      // (ack: topic.js:198-223). Subscriber table broadcast: the log
      // never shuffles. INNER broadcast join + a subs-spine fill for
      // zero-backlog subscribers — an OUTER join preserving the
      // broadcast side can't take BNLJ's fast streamed path in either
      // orientation (LeftOuter needs BuildRight, RightOuter BuildLeft),
      // so the old broadcast(subs)+left shape silently fell into the
      // non-codegen defaultJoin (r9 review fix).
      import s.implicits._
      val subs = Seq(("analytics", 100L), ("audit", 0L), ("billing", 750L))
        .toDF("sub_name", "last_offset")
      val events = eventsTable(s, dir)
      val counted = events
        .join(broadcast(subs), col("event_id") > col("last_offset"))
        .groupBy(col("sub_name"), col("last_offset"))
        .agg(count(lit(1)).as("n"))
      subs.join(broadcast(counted), Seq("sub_name", "last_offset"), "left")
        .select(col("sub_name"), col("last_offset"),
          coalesce(col("n"), lit(0L)).as("backlog"))
        .orderBy(col("sub_name"))
    }),

    "q23_latest_offsets" -> ((s, dir) => {
      // latest() head lookup (topic.js:224-250), per event type.
      eventsTable(s, dir)
        .groupBy(col("event_type"))
        .agg(max(col("event_id")).as("head_offset"),
          count(lit(1)).as("n_records"),
          max(col("ts")).as("last_ts"))
        .orderBy(col("event_type"))
    }),

    "q24_compaction" -> ((s, dir) => {
      // Kafka-style compaction: latest record per (key, event type).
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("event_id").desc)
      eventsTable(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    "q25_tumbling_window" -> ((s, dir) => {
      eventsTable(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    "q26_sliding_window" -> ((s, dir) => {
      // Native hopping window (1h window, 30min slide): each event lands
      // in 2 windows; Spark expands scan-side, no extra shuffle.
      eventsTable(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    "q27_sessionize" -> ((s, dir) =>
      sessionRollup(s, dir).orderBy(col("user_id"), col("session_id"))),

    "q28_enrich_join" -> ((s, dir) => {
      // Stream-table enrichment: events (the stream face) ⋈ broadcast
      // customer dim -> per-segment behavior profile.
      eventsTable(s, dir)
        .join(broadcast(table(s, dir, "customer")),
          col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("c_mktsegment"), col("event_type"))
    }),

    "q58_range_join_binned" -> ((s, dir) => {
      // Interval join at scale: promo windows (7 days per region,
      // staggered) joined to events by DAY BIN equi-key + in-window
      // filter — the binning turns an O(events x windows) range probe
      // into a hash join on the bin. The oracle states the same join
      // as a plain range predicate.
      val windows = table(s, dir, "region")
        .withColumn("w_start",
          date_add(lit("2024-01-01").cast("date"),
            (col("r_regionkey") * 5).cast("int")).cast("timestamp"))
        .withColumn("w_end",
          date_add(lit("2024-01-01").cast("date"),
            (col("r_regionkey") * 5 + 7).cast("int")).cast("timestamp"))
      val expanded = windows.withColumn("day",
        explode(sequence(col("w_start").cast("date"),
          date_add(col("w_end").cast("date"), -1))))
      eventsTable(s, dir)
        .withColumn("day", col("ts").cast("date"))
        .join(broadcast(expanded), Seq("day"))
        .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("r_name"))
    }),

    "q55_funnel" -> ((s, dir) => {
      // Conversion funnel over the event log: per-user first times of
      // view -> click -> purchase, then ordered-stage counts. One
      // shuffle (user_id), conditional mins map-side.
      eventsTable(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        .agg(
          count(col("tv")).as("n_viewed"),
          sum(when(col("tv").isNotNull && col("tc").isNotNull
            && col("tc") > col("tv"), 1).otherwise(0)).as("n_click_after_view"),
          sum(when(col("tv").isNotNull && col("tc").isNotNull
            && col("tp").isNotNull && col("tc") > col("tv")
            && col("tp") > col("tc"), 1).otherwise(0)).as("n_full_funnel"))
    }),

    "q56_cohort_retention" -> ((s, dir) => {
      // Cohort retention: users grouped by first-seen day, distinct
      // active users per (cohort_day, day_offset) for the first week.
      val e = eventsTable(s, dir)
      val firstSeen = e.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).cast("date").as("cohort_day"))
      e.join(broadcast(firstSeen), Seq("user_id"))
        .withColumn("day_offset",
          datediff(date_trunc("day", col("ts")).cast("date"), col("cohort_day")))
        .filter(col("day_offset").between(0, 7))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    "q52_partition_stats" -> ((s, dir) => {
      // Topic partition-assignment math (SURVEY §3: log_part =
      // portable_hash(key) % N), applied to the events key space —
      // shows the assignment is deterministic, portable, and balanced.
      eventsTable(s, dir)
        .withColumn("part",
          pmod(graft.GraftSession.portableHash(col("user_id").cast("string")),
            lit(8)))
        .groupBy(col("part"))
        .agg(count(lit(1)).as("n_records"),
          countDistinct(col("user_id")).as("n_keys"))
        .orderBy(col("part"))
    }),

    "q47_json_extract" -> ((s, dir) => {
      // Semi-structured payload extraction (the props JSON column),
      // aggregated per event type — the "message is opaque JSON" face
      // of the topic model.
      eventsTable(s, dir)
        // try_cast: a props payload whose $.k is a non-numeric scalar
        // (or an object) must yield NULL, not an ANSI cast error —
        // mirrored by TRY_CAST + json_valid in the oracle.
        .withColumn("k",
          expr("try_cast(get_json_object(props, '$.k') AS long)"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    "q42_asof_join" -> ((s, dir) => {
      // As-of join: each event enriched with the customer's most recent
      // order at event time. Composed Spark-first: equi hash join on the
      // key (never a cartesian range join) + per-event argmax window.
      // At scale both sides co-partition on the key; the range predicate
      // filters inside the join.
      val e = eventsTable(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"))
      val o = table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
      // argmax as hash aggregation (max of a lexicographic struct) —
      // no per-event sort, one map-side-combinable shuffle.
      e.join(o, col("user_id") === col("o_custkey")
          && col("o_orderdate") <= col("ts"), "left")
        .groupBy(col("event_id"), col("user_id"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice"))).as("best"))
        .select(col("event_id"), col("user_id"),
          col("best.o_orderkey").as("o_orderkey"),
          col("best.o_orderdate").as("o_orderdate"),
          col("best.o_totalprice").as("o_totalprice"))
        .orderBy(col("event_id"))
    }),

    "q79_asof_native" -> ((s, dir) => {
      // Same enrichment as q42 through the whole-operator merge as-of
      // join ([[graft.plans.AsofJoinExec]]): one exchange per side and
      // a single streaming merge pass — the join output is never
      // inflated with earlier matches, and no post-join argmax
      // aggregation exists to shuffle again.
      val e = eventsTable(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"))
      val o = table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
      AsofNative.asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        rightTiebreak = Seq("o_orderkey"), hint = graft.plans.AsofMerge)
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("event_id"))
    }),

    "q98_asof_skew" -> ((s, dir) => {
      // The q79 enrichment through the SKEW-SAFE salted merge path
      // ([[AsofNative.asofJoinSkewSafe]]): fact side salted 8 ways on
      // event_id, right side replicated per salt, join key (user, salt).
      // Same results as q79 (same oracle); what changes is the task
      // layout — a pathologically hot user spreads over 8 reducers
      // instead of pinning one straggler. The variant for when the
      // right side outgrows the broadcast threshold AND keys are
      // power-law.
      val e = eventsTable(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"))
      val o = table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
      AsofNative.asofJoinSkewSafe(e, o, "user_id", "o_custkey",
        "ts", "o_orderdate", rightTiebreak = Seq("o_orderkey"),
        discriminator = "event_id", buckets = 8)
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("event_id"))
    }),

    "q80_asof_broadcast" -> ((s, dir) => {
      // The fact-dim face of the as-of join: right side auto-broadcast
      // (it fits autoBroadcastJoinThreshold at test SFs), so the event
      // side needs NO exchange and NO sort — per-row binary search
      // against the broadcast time-sorted index, the as-of analogue of
      // a broadcast hash join.
      val e = eventsTable(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"))
      val o = table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
      AsofNative.asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        rightTiebreak = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("event_id"))
    }),

    "q87_attribution" -> ((s, dir) => {
      // Last-touch attribution: every purchase joined to the same
      // user's LATEST click at-or-before purchase time — a fact-fact
      // self as-of where the touch side is the same event stream, so
      // broadcasting is off the table at scale and the co-partitioned
      // merge operator is the only shuffle-once plan (the composed
      // alternative inflates every purchase with ALL prior clicks).
      // event-vs-event times need sub-second resolution: compare
      // explicit micros, not the API's default epoch-second cast
      val ev = eventsTable(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
          col("event_id").as("click_id"), col("value").as("click_value"),
          unix_micros(col("ts")).as("click_us"))
      AsofNative.asofJoin(purchases, clicks, "user_id", "c_user",
        "ts_us", "click_us", rightTiebreak = Seq("click_id"),
        hint = graft.plans.AsofMerge)
        .select(col("event_id"), col("user_id"), col("click_id"),
          col("click_ts"), col("click_value"))
        .orderBy(col("event_id"))
    }),

    "q99_resample" -> ((s, dir) => {
      // Time-series resampling: per-user HOURLY grid over the user's
      // own [min, max] span, forward-filled with the latest event
      // at-or-before each grid point — the gap-fill step before
      // training on regular sequences. The grid explode is bounded by
      // each user's time span (never the corpus); the fill itself is
      // the native merge as-of (one exchange per side, no
      // join-then-argmax inflation). Grid points before the user's
      // first event (the truncated first hour) keep left-outer nulls.
      // Micros comparison: an event 0.5 s after the hour must NOT fill
      // that hour's point, so epoch-second casts are too coarse.
      val ev = eventsTable(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"), expr("interval 1 hour")))
            .as("grid_ts"))
        .withColumn("grid_us", unix_micros(col("grid_ts")))
      val evm = ev.select(col("user_id").as("e_user"),
        unix_micros(col("ts")).as("e_us"), col("event_id"), col("value"))
      AsofNative.asofJoin(grid, evm, "user_id", "e_user", "grid_us", "e_us",
        rightTiebreak = Seq("event_id"), hint = graft.plans.AsofMerge)
        .select(col("user_id"), col("grid_ts"),
          col("value").as("ffill_value"), col("event_id").as("src_event"))
        .orderBy(col("user_id"), col("grid_ts"))
    }),

    "q101_robust_outliers" -> ((s, dir) => {
      // Robust per-type outlier detection: modified z-score
      // 0.6745*(x - median)/MAD — the median/MAD version of q91 that
      // heavy-tailed values don't poison. Two 5-row aggregates (median,
      // then MAD of the residuals) broadcast back onto the unshuffled
      // fact scan — the same never-shuffle-the-corpus shape as q91;
      // exact percentile on the tiny per-type groups, round(6) before
      // the threshold so the kept set is cross-engine deterministic.
      val ev = eventsTable(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      // percentile_exact: value-identical native twin of the built-in
      // on doubles (PercentileExactAgg), minus the boxed map updates
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile_exact(value, 0.5)").as("med"))
      val withMed = ev.join(broadcast(med), "event_type")
      val mad = withMed.groupBy(col("event_type").as("m_type"))
        .agg(expr("percentile_exact(abs(value - med), 0.5)").as("mad"))
      // try_divide: a constant-valued type has MAD = 0 and DuckDB's
      // x/0 yields NULL (row filtered) — ANSI Spark would abort the
      // job instead (tiny-corpus fuzz find)
      withMed.join(broadcast(mad), col("event_type") === col("m_type"))
        .withColumn("robust_z",
          round(try_divide(lit(0.6745) * (col("value") - col("med")),
            col("mad")), 6))
        .filter(abs(col("robust_z")) > 3.5)
        .select(col("event_id"), col("event_type"), col("value"),
          col("robust_z"))
        .orderBy(col("event_id"))
    }),

    "q110_session_overlap" -> ((s, dir) => {
      // Interval-INTERVAL overlap count (q58 is point-in-interval): for
      // every gap-based session, how many OTHER users' sessions overlap
      // it in time — co-activity, the concurrency feature.
      //
      // Sweep-line plan (r4 verdict ask): the r4 binned pair self-join
      // materialized Σ_bin c² pair rows before DISTINCT — quadratic in
      // per-bin concurrency c, a scale-killer for a query whose output
      // is just a per-session count. Overlap counting needs NO pair
      // list: session Y overlaps X  iff  y_start <= x_end AND
      // y_end >= x_start, so
      //   overlaps(X) = |starts <= x_end| − |ends < x_start|
      // (the subtracted set is a subset of the first), and the
      // other-user count subtracts the same formula restricted to X's
      // own user (which also cancels X itself). Both cumulative counts
      // come off ONE boundary stream of 2 rows per session, ordered by
      // (v, is_end) — starts sort before ends at equal timestamps, so
      // the <= / < tie semantics fall out of the sort order:
      //   cum_starts read at X's END row   = |starts <= x_end|
      //   cum_ends   read at X's START row = |ends   <  x_start|.
      // Global cums use the two-phase sharded prefix sum (ShardedCum:
      // range shards + broadcast offsets — no single-reducer sort);
      // per-user cums are ordinary per-user windows. O(n log n), three
      // linear shuffles, zero joins over session pairs.
      // The per-session base is consumed three times (range-partitioner
      // sampling, local-cum branch, shard-totals branch) and is tiny —
      // one row per session, ~1% of the event log — so it checkpoints
      // once (q93's rule: checkpoint when the shared base is consumed
      // repeatedly; r4's measurement only rejected checkpointing the
      // exploded per-BIN stream, which was 10-50x larger).
      val sess = ckpt(sessionRollup(s, dir)
        .select(col("user_id"), col("session_id"),
          col("t_start"), col("t_end")))
      val bounds = sess.select(col("user_id"), col("session_id"),
          explode(array(
            struct(col("t_start").as("v"), lit(0).as("is_end")),
            struct(col("t_end").as("v"), lit(1).as("is_end")))).as("b"))
        .select(col("user_id"), col("session_id"),
          col("b.v").as("v"), col("b.is_end").as("is_end"))
      // Bucket = absolute hour index: monotone in v, so the sampling-
      // free bucketed prefix sum applies; per-bucket volume is bounded
      // by sessions-touching-an-hour, the same bound the r4 bin join
      // relied on — but here each contributes 2 rows, not c² pairs.
      val cum = ShardedCum.cumSumsBucketed(bounds, Nil,
        Seq(col("v"), col("is_end")),
        floor(unix_micros(col("v")) / (3600L * 1000000L)),
        Seq((lit(1) - col("is_end")) -> "cum_starts",
          col("is_end") -> "cum_ends"))
      // Same-user correction: gap sessionization makes one user's
      // sessions DISJOINT by construction (within a session consecutive
      // events are <= 1800 s apart; a new session opens only after a
      // > 1800 s gap, so next.t_start > prev.t_end + 1800 s). A user's
      // only session overlapping X is therefore X itself — the
      // correction is exactly 1, no per-user pass needed. The
      // SweepLineSpec differential against the pair-join formulation
      // (which counts cross-user pairs explicitly) pins this invariant.
      cum.groupBy(col("user_id"), col("session_id")).agg(
          max(when(col("is_end") === 1, col("cum_starts"))).as("se"),
          max(when(col("is_end") === 0, col("cum_ends"))).as("es"))
        .withColumn("n_overlap", col("se") - col("es") - 1)
        .filter(col("n_overlap") > 0)
        .select(col("user_id"), col("session_id"), col("n_overlap"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    "q105_trailing_rate" -> ((s, dir) => {
      // Trailing-window rate metering: for every event, how many
      // events (and how much value) its user produced in the trailing
      // hour INCLUDING it — the rate-limit / burst-detection feature,
      // and the suite's RANGE-frame window (q12's running sum is a
      // ROWS frame; a range frame bounds by ORDER-BY VALUE distance,
      // so ties and gaps behave differently). Ordered by epoch micros
      // with the frame in micros; one per-user window, no other
      // shuffle. Value sums ride decimal for cross-engine exactness.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      eventsTable(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("n_trailing_1h", count(lit(1)).over(w))
        .withColumn("sum_trailing_1h",
          sum(dec(col("value"))).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("n_trailing_1h"), col("sum_trailing_1h"))
        .orderBy(col("event_id"))
    }),

    "q90_autocorr" -> ((s, dir) => {
      // Time-series feature: lag-1 autocorrelation of each user's
      // value series (is behavior trending or mean-reverting?). One
      // per-user window for the lag + one map-side-combinable moment
      // aggregation. The correlation assembles in DOUBLE from EXACT
      // decimal moment sums (the q158 abTest rule, oracle-mirrored
      // term for term) rather than corr(): Spark's corr aggregate
      // divides by the variance internally and ABORTS under ANSI on a
      // constant series (tiny-corpus fuzz find), where DuckDB's CORR
      // yields NULL — try_divide over explicit moments gives the NULL
      // and keeps the sums order-independent exact.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val both = col("value").isNotNull && col("prev_value").isNotNull
      val vx = when(both, col("value").cast("decimal(18,2)"))
      val vy = when(both, col("prev_value").cast("decimal(18,2)"))
      val m = eventsTable(s, dir)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          count(vx).cast("double").as("np"),
          sum(vx).cast("double").as("sx"),
          sum(vy).cast("double").as("sy"),
          sum((vx * vy).cast("decimal(38,4)")).cast("double").as("sxy"),
          sum((vx * vx).cast("decimal(38,4)")).cast("double").as("sxx"),
          sum((vy * vy).cast("decimal(38,4)")).cast("double").as("syy"))
      // greatest(_, 0): the double products can round a zero variance
      // a hair negative; sqrt of that must be 0, not NaN/error
      m.withColumn("lag1_corr", round(try_divide(
          col("np") * col("sxy") - col("sx") * col("sy"),
          sqrt(greatest(col("np") * col("sxx") - col("sx") * col("sx"),
            lit(0.0))) *
          sqrt(greatest(col("np") * col("syy") - col("sy") * col("sy"),
            lit(0.0)))), 6))
        .filter(col("n_events") >= 3)
        .select(col("user_id"), col("n_events"), col("lag1_corr"))
        .orderBy(col("user_id"))
    }),

    "q91_zscore" -> ((s, dir) => {
      // Per-group feature normalization: z-score of value within its
      // event type — the standard scaling step before training. The
      // stats table is a 5-row aggregate (one event_type per row)
      // broadcast back onto the unshuffled fact scan: a
      // `PARTITION BY event_type` window would funnel the whole corpus
      // through 5 reducers at 100 TB; this plan's only fact-side agg is
      // map-side-combinable into 5 rows, and the fact rows themselves
      // never shuffle.
      val ev = eventsTable(s, dir)
      val stats = ev.groupBy(col("event_type"))
        .agg(avg(col("value")).as("mu"),
          stddev_samp(col("value")).as("sigma"))
      // try_divide: a constant-valued (or single-event) type has
      // sigma 0/NULL; DuckDB's /0 yields NULL z — ANSI Spark would
      // abort the job (tiny-corpus fuzz find)
      ev.join(broadcast(stats), "event_type")
        .withColumn("z",
          round(try_divide(col("value") - col("mu"), col("sigma")), 6))
        .select(col("event_id"), col("event_type"), col("z"))
        .orderBy(col("event_id"))
    }),

    "q89_event_deltas" -> ((s, dir) => {
      // Per-user lag/lead features: gap to the previous event (micros),
      // value change, and the next event type — one per-user window
      // (uniform key), no other shuffle.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      eventsTable(s, dir)
        .withColumn("us_since_prev",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("value_delta", col("value") - lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("us_since_prev"),
          col("value_delta"), col("next_type"))
        .orderBy(col("event_id"))
    }),

    "q88_hll_rollup" -> ((s, dir) => {
      // Mergeable-sketch rollup — the incremental distinct-count
      // pattern at 100 TB: per-DAY HLL sketches of the user set are
      // small persistent state (one buffer per day, built map-side);
      // any date range's distinct count is a UNION of sketches, never
      // a re-scan of raw events. Here: daily sketches -> weekly
      // distinct-user estimates. Sketch estimates have no DuckDB
      // mirror -> rows-only gate (like q19); HllRollupSpec bounds the
      // estimate against exact counts instead.
      // IN-ARTIFACT EVIDENCE (r4 verdict ask #7): an exact weekly
      // distinct-user twin joins in (weeks are few — broadcast), and
      // out-of-bounds weeks are FILTERED so a sketch regression shows
      // as a row-count drop in the rows-only gate. Bound = 10% (the
      // lgK=12 sketch's RSE is ~1.6%, so 10% is >5 sigma; sketches
      // are deterministic on fixed data — no flapping). The exact twin
      // is gate evidence only: the sketch rollup exists precisely so
      // production never re-scans raw events for a range count.
      val weekly = eventsTable(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events"))
        .groupBy(weekofyear(col("day")).as("week"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
          sum(col("n_events")).as("n_events"))
      val exact = eventsTable(s, dir)
        .groupBy(weekofyear(to_date(col("ts"))).as("week"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      weekly.join(broadcast(exact), Seq("week"))
        .withColumn("within_bounds",
          abs(col("est_users") - col("exact_users")) <=
            lit(0.10) * col("exact_users"))
        .filter(col("within_bounds"))
        .select(col("week"), col("est_users"), col("n_events"),
          col("exact_users"), col("within_bounds"))
        .orderBy(col("week"))
    }),

    "q84_ewma" -> ((s, dir) => {
      // Rolling EWMA feature per event (trailing 20 events per user):
      // collect the bounded frame and FOLD the recurrence —
      // numerically stable at any history length, unlike the
      // closed-form (1-a)^i trick whose exponent under/overflows.
      // Frame is 20 rows so state is bounded; the only shuffle is the
      // per-user window, a uniform key. Alpha is fixed at 0.5 ON
      // PURPOSE: multiplying by 0.5 is an exact binary operation
      // (exponent shift, no rounding, immune to FMA contraction), so
      // the fold produces BIT-IDENTICAL doubles in any engine and the
      // result needs no rounding at all — a non-dyadic alpha (0.3)
      // diverged from DuckDB by 1 ulp at sf0.1 and flipped round(6)
      // boundaries.
      // NULL measures are SKIPPED, not poisoning: collect_list drops
      // them (oracle mirrors with FILTER (WHERE value IS NOT NULL)),
      // and an all-NULL frame yields ewma NULL — the size(xs)=0 guard
      // also keeps element_at/slice off an empty array (ANSI error).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
      eventsTable(s, dir)
        .withColumn("xs", collect_list(col("value")).over(w))
        .withColumn("ewma", expr(
          "CASE WHEN size(xs) = 0 THEN CAST(NULL AS DOUBLE) ELSE " +
            "aggregate(slice(xs, 2, size(xs) - 1), element_at(xs, 1)," +
            " (acc, v) -> 0.5D * acc + 0.5D * v) END"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("ewma"))
        .orderBy(col("event_id"))
    }),

    "q29_event_dedup" -> ((s, dir) => {
      // At-least-once -> exactly-once: redelivered events (union with
      // itself simulates redelivery) deduped on the offset before stats.
      val events = eventsTable(s, dir)
      events.union(events)
        .dropDuplicates("event_id")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("user_id"))
    }),

    "q115_segment_overlap" -> ((s, dir) => {
      // Audience overlap between event-type segments via KMV sketches
      // (functions/KmvSketch.scala) — the set operation the HLL family
      // (q19/q88) cannot express: |users(A) ∩ users(B)| for every
      // segment pair from one combinable scan pass (k longs per
      // partial buffer, no user-key shuffle), then pairwise
      // intersection estimates over the tiny per-segment sketch table.
      // At 100 TB the sketch table is segments × 8 KB and every pair
      // is answerable without touching raw events again.
      // IN-ARTIFACT EVIDENCE (q19 pattern): exact pairwise overlaps
      // ride a distinct-(user, segment) self-join — evidence only, the
      // exact path is precisely the user-key shuffle the sketch
      // avoids — and out-of-bounds pairs are FILTERED. KMV estimates
      // are MERGE-ORDER INDEPENDENT (the k smallest of a set are the
      // k smallest under any partitioning), so the check cannot flap.
      // Bound: 5·union/√k on the intersection estimator's combined
      // binomial + union-estimate noise.
      val k = 1024
      val ev = eventsTable(s, dir)
      val sk = ev.groupBy(col("event_type"))
        .agg(expr(s"kmv_sketch_agg(user_id, $k)").as("sk"))
      // NOTE the BNLJ in this plan is THIS inequality self-join over
      // the per-segment sketch table — |segments|² rows of k longs
      // (five rows here), the same bounded class as the 1-row scalar
      // broadcasts elsewhere; the raw event stream is never nested-looped
      val pairs = sk.as("a").join(sk.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("seg_a"),
          col("b.event_type").as("seg_b"),
          expr(s"kmv_intersect_estimate(a.sk, b.sk, $k)").as("est_overlap"))
      val ue = ev.select(col("event_type"), col("user_id")).distinct()
      val exact = ue.as("x").join(ue.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("seg_a"),
          col("y.event_type").as("seg_b"))
        .agg(count(lit(1)).as("exact_overlap"))
      val exactSeg = ue.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_seg"))
      pairs
        // LEFT join + coalesce(0): the exact table only has pairs with
        // ≥1 common user, so an inner join would silently DROP a
        // zero-overlap pair — and a sketch falsely reporting overlap
        // for disjoint segments would never hit the bound check.
        .join(broadcast(exact), Seq("seg_a", "seg_b"), "left")
        .withColumn("exact_overlap", coalesce(col("exact_overlap"), lit(0L)))
        .join(broadcast(exactSeg.select(col("event_type").as("seg_a"),
          col("n_seg").as("n_a"))), Seq("seg_a"))
        .join(broadcast(exactSeg.select(col("event_type").as("seg_b"),
          col("n_seg").as("n_b"))), Seq("seg_b"))
        .withColumn("union_exact", col("n_a") + col("n_b") - col("exact_overlap"))
        .withColumn("within_bounds",
          abs(col("est_overlap") - col("exact_overlap")) <=
            lit(5.0) * col("union_exact") / lit(math.sqrt(k)))
        .filter(col("within_bounds"))
        .select(col("seg_a"), col("seg_b"),
          round(col("est_overlap"), 3).as("est_overlap"),
          col("exact_overlap"), col("within_bounds"))
        .orderBy(col("seg_a"), col("seg_b"))
    }),

    "q150_cadence_spectrum" -> ((s, dir) =>
      cadenceSpectrum(eventsTable(s, dir))
        .orderBy(col("event_type"), col("period_h"))),

    "q151_interarrival_bots" -> ((s, dir) =>
      interarrivalRegularity(eventsTable(s, dir))
        .orderBy(col("user_id")))
  )

  /** Traffic-periodicity diagnostic per event type: correlate the
    * hourly count series against quadrature SQUARE waves at 24 h /
    * 168 h periods (Walsh correlation, the bot/cron-cadence signal a
    * log pipeline watches). Square waves instead of a true DFT on
    * purpose: the phase signs are pure integer arithmetic (t mod P),
    * so both engines sum IDENTICAL longs and the gate stays
    * hash-exact — libm cos/sin differ across engines in the last ulp.
    * Scale: one scan -> hourly (type, hour) pre-agg (map-side
    * combined, output |types|x|hours| rows), then a |rows|x2 explode
    * and a |types|x2-row re-agg. Nothing downstream of the first
    * shuffle scales with the event count. */
  def cadenceSpectrum(events: DataFrame): DataFrame = {
    val hc = events
      .select(col("event_type"), expr("cast(ts as long) div 3600").as("t"))
      .groupBy(col("event_type"), col("t"))
      .agg(count(lit(1)).as("c"))
    hc.select(col("event_type"), col("t"), col("c"),
        explode(array(lit(24L), lit(168L))).as("period_h"))
      .withColumn("s1",
        when(pmod(col("t"), col("period_h")) < expr("period_h div 2"), 1L)
          .otherwise(-1L))
      .withColumn("s2",
        when(pmod(col("t") + expr("period_h div 4"), col("period_h")) <
          expr("period_h div 2"), 1L).otherwise(-1L))
      .groupBy(col("event_type"), col("period_h"))
      .agg(sum(col("c") * col("s1")).as("a"),
        sum(col("c") * col("s2")).as("b"),
        sum(col("c")).as("total"))
      .select(col("event_type"), col("period_h"), col("a"), col("b"),
        col("total"),
        round(sqrt(col("a").cast("double") * col("a") +
          col("b").cast("double") * col("b")) / col("total"), 6).as("score"))
  }

  /** Inter-arrival regularity per user: the coefficient of variation
    * of consecutive-event gaps. Organic (Poisson-ish) traffic has
    * cv ~ 1; schedulers and bots fire metronomically (cv << 1), so
    * (n >= 20, cv < 0.3) is the classic bot screen. Exactness: gaps
    * are integer SECONDS, Σg fits a long, Σg² is summed in
    * DECIMAL(38,0) (a 30-day gap squared is ~7e12 — fine here, but
    * decimal keeps the operator correct at any retention), variance
    * then assembles in double from exact integers — bit-identical
    * across engines and partitionings. One shuffle on user_id
    * serves the lag window and the per-user rollup. */
  def interarrivalRegularity(events: DataFrame, minEvents: Int = 20,
      cvThreshold: Double = 0.3): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("long").as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("gap")).as("m"),
        sum(col("gap")).as("sg"),
        sum((col("gap") * col("gap")).cast("decimal(38,0)")).as("sg2"))
      .filter(col("n_events") >= minEvents)
      .withColumn("mean_d", col("sg").cast("double") / col("m"))
      .withColumn("var_d",
        (col("m").cast("double") * col("sg2").cast("double") -
          col("sg").cast("double") * col("sg").cast("double")) /
          (col("m").cast("double") * col("m").cast("double")))
      .withColumn("cv", round(sqrt(col("var_d")) / col("mean_d"), 6))
      .select(col("user_id"), col("n_events"),
        round(col("mean_d"), 6).as("mean_gap_s"), col("cv"),
        (col("cv") < cvThreshold).as("regular"))
  }

  val oracle: Map[String, String] = Map(
    "q20_replay_from_offset" ->
      """SELECT event_id, ts, user_id, value FROM events
        |WHERE event_id > 500 AND event_type = 'click'
        |ORDER BY event_id""".stripMargin,

    "q21_replay_all" ->
      """SELECT event_id, user_id, value, props FROM events
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q22_consumer_lag" ->
      """SELECT s.sub_name, s.last_offset, COUNT(e.event_id) AS backlog
        |FROM (VALUES ('analytics', CAST(100 AS BIGINT)),
        |             ('audit', CAST(0 AS BIGINT)),
        |             ('billing', CAST(750 AS BIGINT))) s(sub_name, last_offset)
        |LEFT JOIN events e ON e.event_id > s.last_offset
        |GROUP BY s.sub_name, s.last_offset ORDER BY s.sub_name""".stripMargin,

    "q23_latest_offsets" ->
      """SELECT event_type, MAX(event_id) AS head_offset,
        | COUNT(*) AS n_records, MAX(ts) AS last_ts
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q24_compaction" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q25_tumbling_window" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q26_sliding_window" ->
      """WITH b AS (
        |  SELECT make_timestamp(CAST(FLOOR(EPOCH(ts)/1800) AS BIGINT)*1800*1000000) AS h,
        |    event_type, value FROM events),
        |w AS (
        |  SELECT h AS win_start, event_type, value FROM b
        |  UNION ALL
        |  SELECT h - INTERVAL 30 MINUTE, event_type, value FROM b)
        |SELECT win_start, event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "q27_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
        |          - CAST(FLOOR(EPOCH(LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)) > 1800
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | MIN(ts) AS t_start, MAX(ts) AS t_end,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q28_enrich_join" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,

    "q58_range_join_binned" ->
      """WITH w AS (
        |  SELECT r_name,
        |    CAST(DATE '2024-01-01' + (r_regionkey*5) * INTERVAL '1 day' AS TIMESTAMP) AS w_start,
        |    CAST(DATE '2024-01-01' + (r_regionkey*5 + 7) * INTERVAL '1 day' AS TIMESTAMP) AS w_end
        |  FROM region)
        |SELECT w.r_name, COUNT(*) AS n_events,
        | CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
        |GROUP BY w.r_name ORDER BY w.r_name""".stripMargin,

    "q55_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv,
        |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS tc,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(tv) AS n_viewed,
        | CAST(SUM(CASE WHEN tv IS NOT NULL AND tc IS NOT NULL AND tc > tv
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
        | CAST(SUM(CASE WHEN tv IS NOT NULL AND tc IS NOT NULL AND tp IS NOT NULL
        |   AND tc > tv AND tp > tc THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM u""".stripMargin,

    "q56_cohort_retention" ->
      """WITH fs AS (
        |  SELECT user_id, DATE_TRUNC('day', MIN(ts)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |j AS (
        |  SELECT e.user_id, fs.cohort_day,
        |    CAST(date_diff('day', fs.cohort_day, DATE_TRUNC('day', e.ts)) AS INT) AS day_offset
        |  FROM events e JOIN fs ON e.user_id = fs.user_id)
        |SELECT cohort_day, day_offset, COUNT(DISTINCT user_id) AS n_users
        |FROM j WHERE day_offset BETWEEN 0 AND 7
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q52_partition_stats" ->
      """SELECT ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT % 8 AS part,
        | COUNT(*) AS n_records, COUNT(DISTINCT user_id) AS n_keys
        |FROM events GROUP BY 1 ORDER BY part""".stripMargin,

    "q47_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    TRY_CAST(CASE WHEN json_valid(props)
        |      THEN json_extract_string(props, '$.k') END AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, COUNT(k) AS n_with_k,
        | CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q42_asof_join" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q79_asof_native" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q98_asof_skew" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q80_asof_broadcast" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |    o.o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q87_attribution" ->
      """SELECT event_id, user_id, click_id, click_ts, click_value
        |FROM (
        |  SELECT p.event_id, p.user_id, c.event_id AS click_id,
        |    c.ts AS click_ts, c.value AS click_value,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |      ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts
        |) WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q99_resample" ->
      """WITH spans AS (
        |  SELECT user_id, date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1
        |  FROM events GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |    UNNEST(generate_series(t0, t1, INTERVAL 1 HOUR)) AS grid_ts
        |  FROM spans),
        |j AS (
        |  SELECT g.user_id, g.grid_ts, e.value, e.event_id,
        |    ROW_NUMBER() OVER (PARTITION BY g.user_id, g.grid_ts
        |      ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM grid g LEFT JOIN events e
        |    ON g.user_id = e.user_id AND e.ts <= g.grid_ts)
        |SELECT user_id, grid_ts, value AS ffill_value, event_id AS src_event
        |FROM j WHERE rn = 1 ORDER BY user_id, grid_ts""".stripMargin,

    "q101_robust_outliers" ->
      """WITH med AS (
        |  SELECT event_type, MEDIAN(value) AS med FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, MEDIAN(ABS(e.value - m.med)) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  ROUND(0.6745 * (e.value - m.med) / d.mad, 6) AS robust_z
        |FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
        |WHERE ABS(ROUND(0.6745 * (e.value - m.med) / d.mad, 6)) > 3.5
        |ORDER BY event_id""".stripMargin,

    "q110_session_overlap" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR (CAST(FLOOR(EPOCH(ts)) AS BIGINT)
        |          - CAST(FLOOR(EPOCH(LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)) > 1800
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged),
        |s AS (
        |  SELECT user_id, session_id, MIN(ts) AS t_start, MAX(ts) AS t_end
        |  FROM sess GROUP BY user_id, session_id),
        |b AS (
        |  SELECT user_id, session_id, t_start, t_end,
        |    UNNEST(generate_series(date_trunc('hour', t_start), t_end,
        |      INTERVAL 1 HOUR)) AS bin
        |  FROM s),
        |p AS (
        |  SELECT DISTINCT a.user_id AS u1, a.session_id AS s1,
        |    b2.user_id AS u2, b2.session_id AS s2
        |  FROM b a JOIN b b2 ON a.bin = b2.bin AND a.user_id < b2.user_id
        |    AND a.t_start <= b2.t_end AND b2.t_start <= a.t_end),
        |dirs AS (
        |  SELECT u1 AS user_id, s1 AS session_id FROM p
        |  UNION ALL SELECT u2, s2 FROM p)
        |SELECT user_id, session_id, COUNT(*) AS n_overlap
        |FROM dirs GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q105_trailing_rate" ->
      """SELECT event_id, user_id, ts,
        | COUNT(*) OVER w AS n_trailing_1h,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |   AS sum_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q90_autocorr" ->
      """WITH l AS (
        |  SELECT user_id,
        |    CASE WHEN value IS NOT NULL AND prev_value IS NOT NULL
        |      THEN CAST(value AS DECIMAL(18,2)) END AS vx,
        |    CASE WHEN value IS NOT NULL AND prev_value IS NOT NULL
        |      THEN CAST(prev_value AS DECIMAL(18,2)) END AS vy
        |  FROM (SELECT user_id, value,
        |      LAG(value, 1) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_value
        |    FROM events) l0),
        |m AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    CAST(COUNT(vx) AS DOUBLE) AS np,
        |    CAST(SUM(vx) AS DOUBLE) AS sx,
        |    CAST(SUM(vy) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(vx * vy AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(vx * vx AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(vy * vy AS DECIMAL(38,4))) AS DOUBLE) AS syy
        |  FROM l GROUP BY user_id)
        |SELECT user_id, n_events,
        | ROUND((np * sxy - sx * sy) /
        |   (SQRT(GREATEST(np * sxx - sx * sx, 0.0)) *
        |    SQRT(GREATEST(np * syy - sy * sy, 0.0))), 6) AS lag1_corr
        |FROM m WHERE n_events >= 3
        |ORDER BY user_id""".stripMargin,

    "q91_zscore" ->
      """SELECT event_id, event_type,
        | ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 6) AS z
        |FROM events
        |WINDOW w AS (PARTITION BY event_type)
        |ORDER BY event_id""".stripMargin,

    "q89_event_deltas" ->
      """SELECT event_id, user_id,
        | epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS us_since_prev,
        | value - LAG(value, 1) OVER w AS value_delta,
        | LEAD(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q84_ewma" ->
      """SELECT event_id, user_id, ts, value,
        | CASE WHEN xs IS NULL THEN NULL
        |      ELSE list_reduce(xs, (acc, v) -> 0.5 * acc + 0.5 * v)
        | END AS ewma
        |FROM (
        |  SELECT event_id, user_id, ts, value,
        |    list(value) FILTER (WHERE value IS NOT NULL)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
        |  FROM events)
        |ORDER BY event_id""".stripMargin,

    "q29_event_dedup" ->
      """SELECT user_id, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Integer square-wave phases (t mod P tests) mirror the Spark side
    // verbatim, so a and b are identical longs in both engines.
    "q150_cadence_spectrum" ->
      """WITH hc AS (
        |  SELECT event_type,
        |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600 AS t, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |e AS (SELECT hc.*, p FROM hc, (VALUES (24), (168)) AS ps(p)),
        |s AS (
        |  SELECT event_type, p,
        |    CAST(SUM(c * (CASE WHEN t % p < p // 2 THEN 1 ELSE -1 END))
        |      AS BIGINT) AS a,
        |    CAST(SUM(c * (CASE WHEN (t + p // 4) % p < p // 2 THEN 1 ELSE -1 END))
        |      AS BIGINT) AS b,
        |    CAST(SUM(c) AS BIGINT) AS total
        |  FROM e GROUP BY 1, 2)
        |SELECT event_type, CAST(p AS BIGINT) AS period_h, a, b, total,
        |  ROUND(SQRT(CAST(a AS DOUBLE) * a + CAST(b AS DOUBLE) * b)
        |    / total, 6) AS score
        |FROM s ORDER BY event_type, period_h""".stripMargin,

    "q151_interarrival_bots" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CAST(FLOOR(EPOCH(ts)) AS BIGINT)
        |      - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT), 1)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |u AS (
        |  SELECT user_id, COUNT(*) AS n_events, COUNT(gap) AS m,
        |    CAST(SUM(gap) AS BIGINT) AS sg,
        |    CAST(SUM(CAST(gap * gap AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg2
        |  FROM g GROUP BY user_id HAVING COUNT(*) >= 20),
        |v AS (
        |  SELECT user_id, n_events,
        |    CAST(sg AS DOUBLE) / m AS mean_d,
        |    (CAST(m AS DOUBLE) * CAST(sg2 AS DOUBLE)
        |      - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |      / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS var_d
        |  FROM u)
        |SELECT user_id, n_events, ROUND(mean_d, 6) AS mean_gap_s,
        |  ROUND(SQRT(var_d) / mean_d, 6) AS cv,
        |  ROUND(SQRT(var_d) / mean_d, 6) < 0.3 AS regular
        |FROM v ORDER BY user_id""".stripMargin
  )
}
