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
}
