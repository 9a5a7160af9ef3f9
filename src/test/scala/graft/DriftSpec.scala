package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

/** PSI drift monitoring: zero for identical distributions, large for
  * a real shift, defined (smoothed) when a bin is one-sided.
  */
class DriftSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("identical windows score exactly zero PSI") {
    // every (group, bin) occurs identically in both windows → p_a and
    // p_b are equal term-by-term and the fold is exactly 0.0
    val rows = for (g <- Seq("x", "y"); b <- 0 until 5; w <- Seq(true, false);
      _ <- 0 until (b + 1)) yield (g, b, w)
    val out = Drift.psi(rows.toDF("g0", "bin0", "wa"),
      col("g0"), col("bin0"), col("wa"), nBins = 5)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("psi")).toMap
    assert(out == Map("x" -> 0.0, "y" -> 0.0))
  }

  test("out-of-range bins leave totals AND the fold together (no silent skew)") {
    // a bin outside [0, nBins) — e.g. bin −1 from a negative value
    // under a top-only clamp — must not sit in the psi denominator
    // while being absent from the spine-filled fold
    val base = Seq(("g", 0L, 40L, 40L), ("g", 1L, 60L, 60L))
    val withStray = base ++ Seq(("g", -1L, 25L, 0L), ("g", 5L, 0L, 7L))
    def run(rows: Seq[(String, Long, Long, Long)]) =
      Drift.psiFromCounts(rows.toDF("g", "bin", "ca", "cb"), nBins = 2)
        .collect().head
    val clean = run(base)
    val strayed = run(withStray)
    assert(strayed.getAs[Double]("psi") == clean.getAs[Double]("psi"))
    assert(strayed.getAs[Long]("n_a") == clean.getAs[Long]("n_a"))
    assert(strayed.getAs[Long]("n_b") == clean.getAs[Long]("n_b"))
  }

  test("q116's two-ended clamp folds negative values into bin 0 deterministically") {
    // same frame once with negative raw values, once pre-clamped: the
    // q116 bin expression must map both to identical psi (this is the
    // cross-engine contract — DuckDB's GREATEST/LEAST mirror does the
    // same fold)
    val bin = (v: org.apache.spark.sql.Column) => greatest(
      least(floor(v / lit(50.0)).cast("long"), lit(9L)), lit(0L))
    val neg = (Seq(-120.0, -3.0, 20.0, 70.0).map(v => ("g", v, true)) ++
      Seq(10.0, 480.0, 700.0).map(v => ("g", v, false)))
      .toDF("g0", "v", "wa")
    val pre = (Seq(0.0, 0.0, 20.0, 70.0).map(v => ("g", v, true)) ++
      Seq(10.0, 480.0, 499.0).map(v => ("g", v, false)))
      .toDF("g0", "v", "wa")
    def run(df: org.apache.spark.sql.DataFrame) =
      Drift.psi(df, col("g0"), bin(col("v")), col("wa"), nBins = 10)
        .collect().head.getAs[Double]("psi")
    assert(run(neg) == run(pre))
  }

  test("a shifted distribution scores above the 0.25 rule-of-thumb") {
    // window a mass in bins 0-1, window b mass in bins 3-4
    val rows = (0 until 500).map(i => ("g", i % 2, true)) ++
      (0 until 500).map(i => ("g", 3 + i % 2, false))
    val psi = Drift.psi(rows.toDF("g0", "bin0", "wa"),
      col("g0"), col("bin0"), col("wa"), nBins = 5)
      .collect().head.getAs[Double]("psi")
    assert(psi > 0.25, s"disjoint supports must read as shifted: $psi")
  }

  test("one-sided bins are smoothed, not NaN, and bounded windows count") {
    // bin 4 only ever appears in window a
    val rows = (0 until 100).map(i => ("g", if (i < 10) 4 else 0, true)) ++
      (0 until 90).map(_ => ("g", 0, false))
    val r = Drift.psi(rows.toDF("g0", "bin0", "wa"),
      col("g0"), col("bin0"), col("wa"), nBins = 5).collect().head
    assert(r.getAs[Long]("n_a") == 100 && r.getAs[Long]("n_b") == 90)
    val psi = r.getAs[Double]("psi")
    assert(!psi.isNaN && !psi.isInfinite && psi > 0.0)
  }

  test("quantile bins: baseline window is ~uniform over its own deciles, shift reads high") {
    // window a: values 0..999 (its own deciles cut it into 10 equal
    // bins -> psi contribution from a is ~0 against itself); window b
    // identical -> psi == 0; window b shifted far right -> psi large
    val same = ((0 until 1000).map(i => ("g", i.toDouble, true)) ++
      (0 until 1000).map(i => ("g", i.toDouble, false)))
      .toDF("g0", "v0", "wa")
    val r0 = Drift.quantileBinPsi(same, col("g0"), col("v0"), col("wa"))
      .collect().head
    assert(r0.getAs[Long]("n_a") == 1000 && r0.getAs[Long]("n_b") == 1000)
    assert(r0.getAs[Double]("psi") == 0.0,
      s"identical windows must score 0: ${r0.getAs[Double]("psi")}")
    val shifted = ((0 until 1000).map(i => ("g", i.toDouble, true)) ++
      (0 until 1000).map(i => ("g", 5000.0 + i, false)))
      .toDF("g0", "v0", "wa")
    val r1 = Drift.quantileBinPsi(shifted, col("g0"), col("v0"), col("wa"))
      .collect().head.getAs[Double]("psi")
    assert(r1 > 0.25, s"fully shifted window must read as drifted: $r1")
    // a group with no baseline rows has no edges to bin against
    val noBase = (0 until 10).map(i => ("only_b", i.toDouble, false))
      .toDF("g0", "v0", "wa")
    assert(Drift.quantileBinPsi(noBase, col("g0"), col("v0"), col("wa"))
      .count() == 0L)
  }

  test("KS: identical CDFs score 0, disjoint supports score 1") {
    val same = ((0 until 100).map(i => ("g", i.toDouble, true)) ++
      (0 until 100).map(i => ("g", i.toDouble, false)))
      .toDF("g0", "v0", "wa")
    val r0 = Drift.ksTest(same, col("g0"), col("v0"), col("wa"))
      .collect().head
    assert(r0.getAs[Long]("n_a") == 100 && r0.getAs[Long]("n_b") == 100)
    assert(r0.getAs[Double]("ks_d") == 0.0)
    // window b entirely to the right of window a: at a's max the CDF
    // gap is 1 − 0 — the statistic's ceiling
    val disjoint = ((0 until 100).map(i => ("g", i.toDouble, true)) ++
      (0 until 100).map(i => ("g", 1000.0 + i, false)))
      .toDF("g0", "v0", "wa")
    assert(Drift.ksTest(disjoint, col("g0"), col("v0"), col("wa"))
      .collect().head.getAs[Double]("ks_d") == 1.0)
    // a one-window group has no two-sample statistic
    val oneSided = (0 until 10).map(i => ("only_b", i.toDouble, false))
      .toDF("g0", "v0", "wa")
    assert(Drift.ksTest(oneSided, col("g0"), col("v0"), col("wa"))
      .count() == 0L)
  }

  test("chi2: identical category mixes score 0, a flipped mix reads large") {
    // equal window sizes with identical per-category counts → every
    // expected cell equals its observed count exactly → chi2 == 0.0
    val same = (for (c <- Seq("en", "de", "fr"); w <- Seq(true, false);
      i <- 0 until 20) yield ("g", c, w)).toDF("g0", "c0", "wa")
    val r0 = Drift.chi2Drift(same, col("g0"), col("c0"), col("wa"))
      .collect().head
    assert(r0.getAs[Long]("n_a") == 60 && r0.getAs[Long]("n_b") == 60)
    assert(r0.getAs[Long]("n_cats") == 3)
    assert(r0.getAs[Double]("chi2") == 0.0)
    // 90/10 vs 10/90 on n=100 each: chi2 = 128 analytically
    val flipped = ((0 until 90).map(_ => ("g", "en", true)) ++
      (0 until 10).map(_ => ("g", "de", true)) ++
      (0 until 10).map(_ => ("g", "en", false)) ++
      (0 until 90).map(_ => ("g", "de", false))).toDF("g0", "c0", "wa")
    val chi2 = Drift.chi2Drift(flipped, col("g0"), col("c0"), col("wa"))
      .collect().head.getAs[Double]("chi2")
    assert(chi2 == 128.0, s"90/10 flip on n=100+100 is exactly 128: $chi2")
  }

  test("streaming windowed histogram scores byte-identical PSI to batch") {
    import graft.log.TopicLog
    import graft.streaming.TopicStream
    // two hour-windows with shifted bin distributions, published to a
    // live topic; the APPEND-mode histogram accumulates (window, g,
    // bin) counts, then the SAME psiFromCounts fold scores the two
    // emitted windows — must equal batch psi() on the identical rows.
    val dir = java.nio.file.Files.createTempDirectory("drift-stream").toString
    val topic = TopicLog.prepare(spark, dir, numPartitions = 2)
    val t0 = 1700000000000L / 3600000L * 3600000L
    val winA = (0 until 40).map(i =>
      ("evt", s"k$i", (i % 2).toString, new java.sql.Timestamp(t0 + i * 1000L)))
    val winB = (0 until 60).map(i =>
      ("evt", s"k$i", (3 + i % 2).toString, new java.sql.Timestamp(t0 + 3600000L + i * 1000L)))
    topic.publish((winA ++ winB).toDF("event", "key", "message", "ts"))
    val hist = Drift.windowedHistogram(
      TopicStream.subscribe(topic, fromNow = false),
      group = col("event"), bin = expr("cast(message as long)"),
      tsCol = "ts", windowLen = "1 hour", watermark = "2 hours")
    val q = hist.writeStream.format("memory").queryName("drift_hist")
      .outputMode("complete").start()
    // snapshot the sink table: psiFromCounts references its input twice
    // (totals + fill), and the memory-sink relation is the one source
    // that cannot be self-joined (no MultiInstanceRelation) — real
    // sinks (parquet, topics) need no snapshot
    val streamed = try {
      q.processAllAvailable()
      graft.GraftSession.ckpt(spark.sql("SELECT * FROM drift_hist"))
    } finally q.stop()
    val cnt = streamed.groupBy(col("g"), col("bin"))
      .agg(sum(when(col("win_start") === new java.sql.Timestamp(t0), col("n"))
        .otherwise(0L)).as("ca"),
        sum(when(col("win_start") === new java.sql.Timestamp(t0 + 3600000L), col("n"))
          .otherwise(0L)).as("cb"))
    val fromStream = Drift.psiFromCounts(cnt, nBins = 5).collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("psi")))).toMap
    val batchRows = (winA ++ winB)
      .map { case (g, _, bin, ts) => (g, bin.toLong, ts.getTime < t0 + 3600000L) }
      .toDF("g0", "bin0", "wa")
    val fromBatch = Drift.psi(batchRows, col("g0"), col("bin0"), col("wa"), nBins = 5)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("psi")))).toMap
    assert(fromStream == fromBatch,
      s"stream $fromStream != batch $fromBatch")
    assert(fromStream("evt")._3 > 0.25, "disjoint bins must read as shifted")
  }
}
