package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventOps, Featurize, Sampling, Spectral}

/** The round-8 continuation batch: event-cadence spectrum (q150),
  * inter-arrival bot screen (q151), UniMax budget allocation (q152),
  * JL projection distortion (q153), all-but-the-top whitening (q154).
  */
class DiagnosticsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def at(hour: Long, sec: Long = 0): Timestamp =
    new Timestamp((hour * 3600L + sec) * 1000L)

  // ---- q150 cadence spectrum ----------------------------------------

  test("cadence: a 12h-on/12h-off cron signal scores ~1 at 24h, flat scores 0") {
    // "cron": one event per hour but only during hours [0,12) of each
    // day for 14 days; "flat": one event EVERY hour for 14 days.
    val rows =
      (for (d <- 0 until 14; h <- 0 until 12)
        yield (d.toLong * 24 + h, "cron")) ++
      (for (h <- 0 until 14 * 24) yield (h.toLong, "flat"))
    val ev = rows.zipWithIndex.map { case ((h, t), i) =>
      (i.toLong, at(h), 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.cadenceSpectrum(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Double]("score"))
      .toMap
    // every cron event sits in the +1 phase of the 24h square wave:
    // a = total, b = 0 -> score exactly 1
    assert(got(("cron", 24L)) == 1.0, s"cron@24h: ${got(("cron", 24L))}")
    // a flat series cancels both phases exactly
    assert(got(("flat", 24L)) == 0.0, s"flat@24h: ${got(("flat", 24L))}")
    assert(got(("flat", 168L)) == 0.0, s"flat@168h: ${got(("flat", 168L))}")
  }

  // ---- q151 inter-arrival regularity --------------------------------

  test("interarrival: metronome flagged, bursty not, short histories dropped") {
    def user(uid: Long, gaps: Seq[Long], base: Long = 0): Seq[(Long, Timestamp, Long)] = {
      val ts = gaps.scanLeft(base)(_ + _)
      ts.zipWithIndex.map { case (t, i) => (uid * 1000 + i, at(0, t), uid) }
    }
    val rows = user(1, Seq.fill(29)(60L)) ++                  // bot: cv = 0
      user(2, (0 until 29).map(i => if (i % 2 == 0) 10L else 1000L)) ++
      user(3, Seq.fill(5)(60L))                               // too short
    val ev = rows.map { case (id, ts, uid) => (id, ts, uid, "e", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.interarrivalRegularity(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("cv"), r.getAs[Boolean]("regular"))))
      .toMap
    assert(got.keySet == Set(1L, 2L), s"users: ${got.keySet}")
    assert(got(1L) == ((0.0, true)), s"metronome: ${got(1L)}")
    assert(got(2L)._1 > 0.9 && !got(2L)._2, s"bursty: ${got(2L)}")
  }

  // ---- q152 UniMax ---------------------------------------------------

  test("unimax water-filling: smalls fully funded, head truncated, sums to budget") {
    // token masses 10/10/80, cap = 1 epoch, budget = 80% of 100 = 80:
    // water-filling funds a and b fully (10 each) and c gets θ = 60.
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "a"),
      (2L, Seq.fill(10)("w").mkString(" "), "b"),
      (3L, Seq.fill(80)("w").mkString(" "), "c")
    ).toDF("doc_id", "text", "lang")
    val got = Sampling.unimaxAlloc(docs, col("lang"),
        size(split(col("text"), "\\s+")).cast("long"), maxEpochs = 1)
      .orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getAs[Double]("alloc"),
        r.getAs[Boolean]("fully_funded"), r.getAs[Double]("epochs")))
    assert(got.toSeq == Seq(
      ("a", 10.0, true, 1.0), ("b", 10.0, true, 1.0),
      ("c", 60.0, false, 0.75)), got.mkString(", "))
    assert(got.map(_._2).sum == 80.0)
  }

  test("unimax: budget above total caps funds everyone fully") {
    // cap = 2 epochs, masses 10/10 -> total caps 40 vs budget 16?
    // No: budget = 4/5 of 20 = 16 < caps. Use maxEpochs high enough
    // that caps exceed budget for all: the equal-split branch.
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "a"),
      (2L, Seq.fill(10)("w").mkString(" "), "b")
    ).toDF("doc_id", "text", "lang")
    // caps = 10 each (1 epoch); budget = 16 ≥ Σcaps? 16 < 20 -> b
    // truncated? both caps equal: a funded iff 10*2 <= 16 false ->
    // nobody full -> both get 16/2 = 8.
    val got = Sampling.unimaxAlloc(docs, col("lang"),
        size(split(col("text"), "\\s+")).cast("long"), maxEpochs = 1)
      .orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getAs[Double]("alloc"),
        r.getAs[Boolean]("fully_funded")))
    assert(got.toSeq == Seq(("a", 8.0, false), ("b", 8.0, false)),
      got.mkString(", "))
  }

  // ---- q153 JL distortion -------------------------------------------

  test("jl: one-hot vectors land exactly on ratio band 1.0, and runs are bit-stable") {
    // e_d one-hot: ‖y‖² = Σ_k (±x)² = k·x² so the ratio is exactly 1.
    val emb = (0 until 64).map { d =>
      val v = Array.fill(64)(0.0f); v(d) = 2.5f
      (d.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val got = Featurize.jlDistortion(emb).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Double]("band") == 1.0)
    assert(got(0).getAs[Long]("n") == 64L)
    assert(got(0).getAs[Double]("min_ratio") == 1.0)
    assert(got(0).getAs[Double]("max_ratio") == 1.0)
  }

  test("gated q153 shape: ratios concentrate near 1 at sf") {
    val rows = SparkEntry.queries("q153_rand_proj")(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n > 0)
    // all mass within the JL bands a k=16 projection should give
    rows.foreach { r =>
      val b = r.getAs[Double]("band")
      assert(b > 0.3 && b < 1.7, s"band $b out of range")
    }
  }

  // ---- q154 whitening -----------------------------------------------

  test("whiten: mean recovered exactly, centered top PC is the wiggle axis") {
    // constant 3.0 on dim 0 (killed by centering), ±2 wiggle on dim 1
    val emb = (0 until 100).map { i =>
      val v = Array.fill(8)(0.0f)
      v(0) = 3.0f
      v(1) = if (i % 2 == 0) 2.0f else -2.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val got = Spectral.whitenPlan(emb, iters = 2, dims = 8)
      .orderBy(col("dim")).collect()
      .map(r => (r.getAs[Double]("mu"), r.getAs[Double]("loading")))
    assert(got(0)._1 == 3.0 && got(1)._1 == 0.0,
      s"mu: ${got.map(_._1).mkString(",")}")
    assert(math.abs(got(1)._2) > 0.999, s"dim1 loading: ${got(1)._2}")
    assert(math.abs(got(0)._2) < 1e-6, s"dim0 loading: ${got(0)._2}")
  }

  test("gated q154 shape: 64 dims, unit direction") {
    val rows = SparkEntry.queries("q154_whiten")(spark, sf).collect()
    assert(rows.length == 64)
    val norm2 = rows.map(r => math.pow(r.getAs[Double]("loading"), 2)).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"norm^2 = $norm2")
  }

  // ---- q164 corpus manifest -----------------------------------------

  test("manifest digest is order/partitioning-independent but byte-sensitive") {
    import graft.operators.Profile
    val docs = Seq((1L, "alpha beta", "s1"), (2L, "gamma", "s1"),
      (3L, "delta", "s2")).toDF("doc_id", "text", "source")
    def digest(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Profile.manifest(df).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("content_digest")).toMap
    val base = digest(docs)
    assert(digest(docs.orderBy(col("doc_id").desc).repartition(7)) == base,
      "digest must not depend on row order or partitioning")
    val flipped = digest(Seq((1L, "alpha betb", "s1"), (2L, "gamma", "s1"),
      (3L, "delta", "s2")).toDF("doc_id", "text", "source"))
    assert(flipped("s1") != base("s1"), "one changed byte must change s1")
    assert(flipped("s2") == base("s2"), "untouched source must not change")
  }

  // ---- q165 filter-bias audit ---------------------------------------

  test("filter bias: length-skewed drops score high psi, same-bin drops exactly 0") {
    import graft.operators.{Drift, TextOps}
    val stops = "the a of to and in is"
    // keeper: 45 distinct words, stopwords present, mwl ~5.6 -> passes
    val keeper = stops + " " + (1 to 38).map(i => s"word$i").mkString(" ")
    // fair dropper: same length BIN as keeper but zero stopwords ->
    // fails only the stopword rule
    val fairDrop = (1 to 45).map(i => s"wrd$i").mkString(" ")
    assert(keeper.length / 60 == fairDrop.length / 60, "must share a bin")
    val tiny = "tiny doc" // fails word count; lands in bin 0
    val rows =
      (1 to 20).map(i => (i.toLong, keeper, "biased")) ++
      (21 to 40).map(i => (i.toLong, tiny, "biased")) ++
      (41 to 60).map(i => (i.toLong, keeper, "fair")) ++
      (61 to 80).map(i => (i.toLong, fairDrop, "fair"))
    val docs = rows.map { case (id, t, l) => (id, t, l, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
    val keep = TextOps.gopherRules(docs).select(col("doc_id"), col("keep"))
    val got = Drift.psi(docs.join(keep, "doc_id"),
        group = col("lang"),
        bin = least(expr("n_chars div 60"), lit(9L)),
        isA = col("keep") === 1, nBins = 10)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("psi"))))
      .toMap
    assert(got("biased")._1 == 20L && got("biased")._2 == 20L)
    assert(got("biased")._3 > 3.0, s"biased psi: ${got("biased")._3}")
    assert(got("fair") == ((20L, 20L, 0.0)), s"fair: ${got("fair")}")
  }
}
