package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Featurize

class FeaturizeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("feature hash: identical docs embed identically; vec is dense dims-wide") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val got = Featurize.featureHashEmbed(docs, dims = 32).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    got.values.foreach { case (norm, nnz, vec) =>
      assert(vec.split(",", -1).length == 32)
      assert(nnz >= 1 && norm > 0.0)
    }
  }

  test("feature hash: repeated token accumulates signed counts") {
    // one token repeated 5x -> exactly one nonzero dim of magnitude 5
    val docs = Seq((1L, "tok tok tok tok tok")).toDF("doc_id", "text")
    val r = Featurize.featureHashEmbed(docs, dims = 32).collect().head
    assert(r.getAs[Long]("nnz") == 1L)
    assert(r.getAs[Double]("norm") == 5.0)
    assert(r.getAs[String]("vec").split(",", -1).map(_.toLong.abs).max == 5L)
  }

  test("zipf fit on the synthetic corpus: structurally sane, flags non-Zipfian text") {
    // sf0.001's documents draw near-uniformly from a ~31-token vocab —
    // exactly the "machine-generated" shape the diagnostic exists to
    // flag: slope barely negative, r² near zero (natural text sits
    // near slope -1 with high r² — the exact-power-law test below).
    val fit = SparkEntry.queries("q139_zipf_fit")(spark, sf).collect().head
    assert(fit.getAs[Long]("n_terms") > 0)
    val slope = fit.getAs[Double]("slope")
    val r2 = fit.getAs[Double]("r2")
    assert(slope < 0.0, s"rank-ordered freqs can't slope up, got $slope")
    assert(slope > -0.5 && r2 < 0.5,
      s"synthetic uniform corpus should NOT look Zipfian (slope=$slope r2=$r2)")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("zipf fit: exact power law recovers its exponent") {
    // freq = round(1e6 * rank^-1): slope must come out ~ -1
    val docs = Seq((1L, (1 to 200).flatMap(r =>
      Seq.fill(math.max(1, (10000.0 / r).round.toInt))(s"w$r"))
      .mkString(" "))).toDF("doc_id", "text")
    val fit = Featurize.zipfFit(docs, head = 200).collect().head
    val slope = fit.getAs[Double]("slope")
    assert(math.abs(slope + 1.0) < 0.05, s"expected ~-1, got $slope")
    assert(fit.getAs[Double]("r2") > 0.99)
  }
}
