package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KllSketch

/** KLL quantile sketch: exactness below capacity, rank-error bounds
  * at volume, weight conservation under compaction, merge bounds,
  * and the SQL surface (kll_sketch_agg / kll_quantile) through a
  * repartitioned aggregation (exercises serialize + merge).
  */
class KllSketchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("below capacity the sketch is exact (single weight-1 level)") {
    val s = new KllSketch.State(200)
    (1 to 100).foreach(v => s.update(v.toDouble))
    assert(s.quantile(0.5) == 50.0)
    assert(s.quantile(0.01) == 1.0)
    assert(s.quantile(1.0) == 100.0)
  }

  test("kll_quantile rejects a non-sketch array at analysis time") {
    // r9 advisor fix: array<string> used to pass the type check and
    // die mid-execution with getDouble garbage; now it's a clean
    // AnalysisException before any task runs.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Array("a", "b"))).toDF("notSketch")
        .select(call_function("kll_quantile", col("notSketch"), lit(0.5)))
        .collect()
    }
    assert(e.getMessage.contains("kll_quantile"), e.getMessage)
  }

  test("rank error stays within bounds on a 100k stream, weight conserved") {
    val s = new KllSketch.State(200)
    // deterministic pseudo-shuffled permutation of 0..99999
    (0 until 100000).foreach { i =>
      s.update(((i.toLong * 2654435761L + 12345L) % 100000L).toDouble)
    }
    val totalW = s.levels.zipWithIndex
      .map { case (lvl, i) => lvl.length.toLong * (1L << i) }.sum
    assert(totalW == 100000L, s"compaction must conserve weight: $totalW")
    Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { p =>
      val est = s.quantile(p)
      // values are the uniform permutation of 0..99999, so the exact
      // rank of `est` is est/100000
      val rankErr = math.abs(est / 100000.0 - p)
      assert(rankErr <= 0.02, s"p=$p est=$est rankErr=$rankErr")
    }
  }

  test("merged halves stay within bounds") {
    val a = new KllSketch.State(200)
    val b = new KllSketch.State(200)
    (0 until 50000).foreach { i =>
      val v = ((i.toLong * 2654435761L + 999L) % 100000L).toDouble
      if (i % 2 == 0) a.update(v) else b.update(v)
    }
    a.merge(b)
    Seq(0.25, 0.5, 0.75).foreach { p =>
      val est = a.quantile(p)
      // ~uniform over [0, 100000)
      val rankErr = math.abs(est / 100000.0 - p)
      assert(rankErr <= 0.03, s"p=$p est=$est rankErr=$rankErr")
    }
  }

  test("serialization round-trips the full state") {
    val s = new KllSketch.State(64)
    (0 until 10000).foreach(i => s.update((i % 997).toDouble))
    val back = KllSketch.deserialize(KllSketch.serialize(s))
    assert(back.k == s.k && back.n == s.n)
    assert(back.levels.map(_.toSeq) == s.levels.map(_.toSeq))
    assert(back.quantile(0.5) == s.quantile(0.5))
  }

  test("SQL surface through a repartitioned agg: bounds hold, same-layout rerun is stable") {
    val df = spark.range(100000L)
      .select((pmod(col("id") * 2654435761L + 7L, lit(100000L)))
        .cast("double").as("v"))
      .repartition(8)
    def run(): Seq[(Double, Double)] = {
      df.agg(expr("kll_sketch_agg(v, 200)").as("sk"))
        .select(explode(typedLit(Seq(0.25, 0.5, 0.75))).as("p"),
          col("sk"))
        .select(col("p"), expr("kll_quantile(sk, p)").as("est"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    }
    val got = run()
    got.foreach { case (p, est) =>
      assert(math.abs(est / 100000.0 - p) <= 0.03, s"p=$p est=$est")
    }
    assert(run() == got, "same layout must reproduce identical estimates")
  }

  test("gated q171 shape: all 15 (type, p) rows inside the rank bound") {
    val rows = SparkEntry.queries("q171_kll_quantiles")(spark, sf).collect()
    assert(rows.length == 15, s"rows: ${rows.length} (a drop = bound violation)")
    rows.foreach(r => assert(r.getAs[Boolean]("within_bounds")))
  }
}
