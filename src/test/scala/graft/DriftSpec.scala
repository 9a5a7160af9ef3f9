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
}
