package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** A-ES weighted sampling: deterministic, quota-exact per stratum, and
  * actually weight-biased (heavier items overrepresented vs their
  * count share).
  */
class SamplingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val items = (0L until 1000L)
    .map(i => (i, if (i < 500) "s0" else "s1", if (i % 2 == 0) 1 else 100))
    .toDF("id", "stratum", "w")

  test("sample is a pure function of the data (same result across runs and layouts)") {
    def run(parts: Int) = Sampling.weightedSample(
      items.repartition(parts), col("stratum"), col("id"), col("w"), k = 20)
      .select(col("stratum"), col("rk"), col("id")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(run(2) == run(13))
  }

  test("exactly k per stratum with dense ranks 1..k") {
    val got = Sampling.weightedSample(items, col("stratum"), col("id"),
      col("w"), k = 20)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), min(col("rk")).as("lo"),
        max(col("rk")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toSet == Set(("s0", 20L, 1, 20), ("s1", 20L, 1, 20)))
  }

  test("zero or negative weight fails fast with a clear message") {
    val bad = Seq((1L, "s0", 5), (2L, "s0", 0)).toDF("id", "stratum", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(bad, col("stratum"), col("id"), col("w"), k = 2)
        .collect()
    }
    assert(e.getMessage.contains("weight must be > 0"), e.getMessage)
    val neg = Seq((1L, "s0", 5), (2L, "s0", -3)).toDF("id", "stratum", "w")
    val e2 = intercept[Exception] {
      Sampling.weightedSample(neg, col("stratum"), col("id"), col("w"), k = 2)
        .collect()
    }
    assert(e2.getMessage.contains("weight must be > 0"), e2.getMessage)
  }

  test("100x-weight items dominate the sample far beyond their count share") {
    // half the items carry weight 100, half weight 1 — an unweighted
    // draw would pick ~50% heavy; A-ES must pick nearly all heavy
    val heavy = Sampling.weightedSample(items, col("stratum"), col("id"),
      col("w"), k = 50)
      .filter(col("w") === 100).count()
    assert(heavy >= 80, s"expected >=80/100 heavy picks, got $heavy")
  }
}
