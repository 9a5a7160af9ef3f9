package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventStats

/** Statistical event analytics: Welch A/B t-test (q158), Markov
  * transitions (q159), co-occurrence lift (q160), CUSUM change-point
  * (q161).
  */
class EventStatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def at(hour: Long): Timestamp = new Timestamp(hour * 3600L * 1000L)

  private def ev(rows: Seq[(Long, Long, Long, String, Double)]) =
    rows.map { case (id, h, uid, t, v) => (id, at(h), uid, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("ab t-test: a 10-point mean shift is significant, means exact") {
    // cohort 0 (even users): values 10/12 alternating; cohort 1: 20/22
    val rows = (0 until 20).map(i =>
        (i.toLong, i.toLong, 2L, "buy", if (i % 2 == 0) 10.0 else 12.0)) ++
      (0 until 20).map(i =>
        (100L + i, i.toLong, 1L, "buy", if (i % 2 == 0) 20.0 else 22.0))
    val got = EventStats.abTest(ev(rows)).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Double]("mean0") == 11.0 && r.getAs[Double]("mean1") == 21.0)
    assert(r.getAs[Double]("t_stat") < -10.0, s"t: ${r.getAs[Double]("t_stat")}")
    assert(r.getAs[Boolean]("significant"))
  }

  test("markov: transition rows count ordered pairs, p normalizes per from") {
    val rows = Seq(
      (1L, 1L, 7L, "A", 0.0), (2L, 2L, 7L, "B", 0.0),
      (3L, 3L, 7L, "A", 0.0), (4L, 4L, 7L, "B", 0.0))
    val got = EventStats.markovTransitions(ev(rows)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Double]("p"))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(("A", "B", 2L, 1.0), ("B", "A", 1L, 1.0)),
      got.mkString(", "))
  }

  test("lift: known audiences give the exact closed-form lift") {
    // users: 1:{a,b} 2:{a} 3:{b} 4:{a,b} -> lift = 2*4/(3*3)
    val rows = Seq(
      (1L, 1L, 1L, "a", 0.0), (2L, 1L, 1L, "b", 0.0),
      (3L, 1L, 2L, "a", 0.0), (4L, 1L, 3L, "b", 0.0),
      (5L, 1L, 4L, "a", 0.0), (6L, 1L, 4L, "b", 0.0),
      (7L, 2L, 4L, "a", 0.0)) // duplicate (4,a): distinct collapses it
    val got = EventStats.typeLift(ev(rows)).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getAs[String]("type_a"), r.getAs[String]("type_b")) == (("a", "b")))
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("n_both")) == ((3L, 3L, 2L)))
    assert(r.getAs[Double]("lift") == math.rint(2.0 * 4 / 9 * 1e6) / 1e6)
  }

  test("cusum: a mid-series level shift peaks at the shift day; flat series is 0") {
    // "shift": 10/day for days 0-9, then 20/day for days 10-19
    // "flat": 5/day throughout
    val rows =
      (for (d <- 0 until 20; i <- 0 until (if (d < 10) 10 else 20))
        yield (d * 100L + i, d * 24L, 1L, "shift", 0.0)) ++
      (for (d <- 0 until 20; i <- 0 until 5)
        yield (10000 + d * 100L + i, d * 24L, 1L, "flat", 0.0))
    val got = EventStats.cusumChangepoint(ev(rows)).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("s_abs"), r.getAs[Double]("cusum_frac"),
          r.getAs[Boolean]("shifted"), r.getAs[java.sql.Date]("peak_day"))))
      .toMap
    // S_10 = 20*100 - 10*300 = -1000; frac = 1000/(20*300)
    val sh = got("shift")
    assert(sh._1 == 1000L && sh._3, s"shift: $sh")
    assert(sh._2 == math.rint(1000.0 / 6000 * 1e6) / 1e6)
    assert(sh._4.toString == "1970-01-10")
    val fl = got("flat")
    assert(fl._1 == 0L && fl._2 == 0.0 && !fl._3, s"flat: $fl")
    assert(fl._4.toString == "1970-01-01") // tie -> earliest day
  }

  test("gated q158-q161 shapes at sf") {
    Seq("q158_ab_ttest", "q159_markov_transitions", "q160_type_lift",
      "q161_cusum_changepoint").foreach { q =>
      assert(SparkEntry.queries(q)(spark, sf).count() > 0, q)
    }
  }

  test("conversion latency: strict funnel order, exact percentiles per cohort") {
    def sec(s: Long) = new Timestamp(s * 1000L)
    // even users 2/4 (cohort 0): latencies 100 s and 200 s -> p50 = 150;
    // odd user 3: purchase BEFORE any view -> excluded (strict funnel);
    // odd user 5: view only -> excluded
    val ev2 = Seq(
      (1L, sec(0), 2L, "view", 0.0, "{}"),
      (2L, sec(100), 2L, "purchase", 0.0, "{}"),
      (3L, sec(86400), 4L, "view", 0.0, "{}"),
      (4L, sec(86600), 4L, "purchase", 0.0, "{}"),
      (5L, sec(0), 3L, "purchase", 0.0, "{}"),
      (6L, sec(18000), 3L, "view", 0.0, "{}"),
      (7L, sec(0), 5L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventStats.conversionLatency(ev2, "view", "purchase").collect()
      .map(r => r.getAs[Int]("cohort") ->
        ((r.getAs[Long]("n_converted"), r.getAs[Double]("p50_s")))).toMap
    assert(got == Map(0 -> ((2L, 150.0))), s"got: $got")
  }

  test("burstiness: flat hourly traffic is 0, single-burst traffic is T-1") {
    val rows =
      (0 until 100).map(h => (h.toLong, h.toLong, 1L, "flat", 0.0)) ++
      (0 until 100).map(i => (1000L + i, 0L, 1L, "burst", 0.0)) ++
      Seq((2000L, 99L, 1L, "burst", 0.0)) // pin burst's span to 100h too
    val got = EventStats.burstiness(ev(rows)).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("fano")).toMap
    assert(got("flat") == 0.0, s"flat: ${got("flat")}")
    // burst: counts (100 at h0, 1 at h99): fano = (100*10001-101^2)/(100*101)
    val expect = math.rint((100.0 * 10001 - 101.0 * 101) / (100.0 * 101) * 1e6) / 1e6
    assert(got("burst") == expect, s"burst: ${got("burst")} want $expect")
  }

  test("session paths: 30-min gaps split sessions, paths truncate at 3") {
    val rows = Seq(
      (1L, 0L, 1L, "A", 0.0), (2L, 0L, 1L, "B", 0.0), (3L, 0L, 1L, "C", 0.0),
      (4L, 0L, 1L, "D", 0.0), // same session, 4th event ignored by path
      (5L, 10L, 1L, "D", 0.0), (6L, 10L, 1L, "E", 0.0), // new session
      (7L, 20L, 2L, "A", 0.0), (8L, 20L, 2L, "B", 0.0), (9L, 20L, 2L, "C", 0.0))
    val got = EventStats.topSessionPaths(ev(rows)).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_sessions")))
    assert(got.toSeq == Seq(("A>B>C", 2L), ("D>E", 1L)), got.mkString(", "))
  }

  test("entropy rate: a deterministic alternating chain scores exactly 0") {
    val rows = (0 until 20).map(i =>
      (i.toLong, i.toLong, 1L, if (i % 2 == 0) "A" else "B", 0.0))
    val r = EventStats.entropyRate(ev(rows)).collect()(0)
    assert(r.getAs[Long]("n_transitions") == 19L)
    assert(r.getAs[Double]("entropy_nats") == 0.0)
    assert(r.getAs[Double]("perplexity") == 1.0)
  }

  test("diurnal profile: single-hour type has share 1 at its hour, ties peak earliest") {
    // "night" fires only at 03:00 UTC (two days); "flat" splits 05/06
    val rows = Seq(
      (1L, 3L, 1L, "night", 0.0), (2L, 27L, 1L, "night", 0.0),
      (3L, 5L, 1L, "flat", 0.0), (4L, 6L, 1L, "flat", 0.0))
    val got = EventStats.diurnalProfile(ev(rows)).collect()
      .map(r => (r.getString(0), r.getAs[Int]("hod")) ->
        ((r.getAs[Double]("share"), r.getAs[Boolean]("is_peak")))).toMap
    assert(got(("night", 3)) == ((1.0, true)))
    assert(got(("flat", 5)) == ((0.5, true)), "tie must peak at the earliest hour")
    assert(got(("flat", 6)) == ((0.5, false)))
  }

  test("dataset card: balanced synthetic corpus hits the closed forms") {
    import graft.operators.{Profile, TextOps}
    val stops = "the a of to and in is"
    val keeper = stops + " " + (1 to 38).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, keeper, "aa", "s1"), (2L, "tiny", "aa", "s1"),
      (3L, keeper, "bb", "s2"), (4L, "tiny", "bb", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val card = Profile.datasetCard(docs,
      TextOps.gopherRules(docs).select(col("doc_id"), col("keep"))).collect()(0)
    assert(card.getAs[Long]("n_docs") == 4L)
    assert(card.getAs[Long]("n_sources") == 2L && card.getAs[Long]("n_langs") == 2L)
    // 2 langs balanced -> entropy ln 2; 2 sources balanced -> HHI 0.5
    assert(card.getAs[Double]("lang_entropy_nats") ==
      math.rint(math.log(2.0) * 1e6) / 1e6)
    assert(card.getAs[Double]("source_hhi") == 0.5)
    assert(card.getAs[Double]("keep_rate") == 0.5)
  }

  test("rfm: aligned metrics produce the diagonal segment grid") {
    // user u (1..8): events on day 9-u (u=1 most recent), 9-u events,
    // value 10 each -> recency, frequency and monetary all rank user 1
    // best; quartiles of 8 users hold 2 each -> four diagonal segments
    val rows = for (u <- 1 to 8; e <- 0 until (9 - u))
      yield ((u * 100 + e).toLong, (9L - u) * 24, u.toLong, "buy", 10.0)
    val got = EventStats.rfmSegments(ev(rows)).collect()
      .map(r => ((r.getAs[Int]("r_q"), r.getAs[Int]("f_q"), r.getAs[Int]("m_q")),
        r.getAs[Long]("n_users"))).toMap
    assert(got == Map((1, 1, 1) -> 2L, (2, 2, 2) -> 2L,
      (3, 3, 3) -> 2L, (4, 4, 4) -> 2L), s"got: $got")
  }

  test("engagement gini: uniform activity scores 0, one whale scores 0.81") {
    val uniform = for (u <- 1 to 10; e <- 0 until 2)
      yield ((u * 10 + e).toLong, u.toLong, u.toLong, "e", 0.0)
    val gu = EventStats.engagementGini(ev(uniform)).collect()(0)
    assert(gu.getAs[Double]("gini") == 0.0)
    assert(gu.getAs[Double]("top_decile_share") == 0.1)
    // 9 users with 1 event + 1 whale with 91: G = 2*955/1000 - 1.1
    val skewed = (1 to 9).map(u => (u.toLong, u.toLong, u.toLong, "e", 0.0)) ++
      (0 until 91).map(e => (100L + e, 10L, 10L, "e", 0.0))
    val gs = EventStats.engagementGini(ev(skewed)).collect()(0)
    assert(gs.getAs[Double]("gini") == 0.81, s"gini: ${gs.getAs[Double]("gini")}")
    assert(gs.getAs[Double]("top_decile_share") == 0.91)
  }

  test("stitch detection finds overlapped boundaries, skips short docs") {
    import graft.operators.Extract
    val boundary = "X" * 40
    val docs = Seq(
      (1L, "a" * 60 + boundary),        // ends with the boundary
      (2L, boundary + "b" * 60),        // starts with it -> pair (1, 2)
      (3L, "c" * 100),                  // unrelated
      (4L, boundary)                    // 40 chars: too short, excluded
    ).toDF("doc_id", "text")
    val got = Extract.stitchCandidates(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(got.toSeq == Seq((1L, 2L)), got.mkString(", "))
  }
}
