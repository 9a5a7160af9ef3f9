package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Spectral

class SpectralSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def syntheticEmb(n: Int) = {
    // dominant axis = dim 0 (amplitude 5), orthogonal wiggle on dim 1
    (0 until n).map { i =>
      val v = Array.fill(8)(0.0f)
      v(0) = 5.0f
      v(1) = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("power iteration finds the dominant axis, unit-norm, bit-stable") {
    val run = () => Spectral.topPc(syntheticEmb(100), iters = 2, dims = 8)
      .orderBy(col("dim")).collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Double]("loading"),
        r.getAs[Double]("eigval")))
    val got = run()
    assert(got.length == 8)
    // dim 0 carries the direction; wiggle cancels, noise dims are zero
    assert(math.abs(got(0)._2) > 0.999, s"dim0 loading: ${got(0)._2}")
    (2 until 8).foreach(d => assert(math.abs(got(d)._2) < 1e-6, s"dim$d"))
    // unit norm within rounding
    val norm2 = got.map(t => t._2 * t._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"norm^2 = $norm2")
    // eigenvalue estimate is positive and shared across rows
    assert(got.forall(_._3 == got(0)._3) && got(0)._3 > 0.0)
    assert(run().toSeq == got.toSeq, "not bit-stable")
  }

  test("gated q147 shape: 64 dims, unit direction") {
    val rows = SparkEntry.queries("q147_top_pc")(spark, sf).collect()
    assert(rows.length == 64)
    val norm2 = rows.map(r => math.pow(r.getAs[Double]("loading"), 2)).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"norm^2 = $norm2")
  }

  test("empty corpus yields an empty transform, not an abort") {
    // the empty-corpus fuzz contract: no dominant direction exists,
    // so topPc/whitenPlan return ZERO rows with the full schema (a
    // PARTIAL dim count is still corruption and still throws)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val pc = graft.operators.Spectral.topPc(empty, iters = 2, dims = 64)
    assert(pc.count() === 0 &&
      pc.columns.toSeq == Seq("dim", "loading", "eigval"))
    val wh = graft.operators.Spectral.whitenPlan(empty, iters = 2, dims = 64)
    assert(wh.count() === 0 &&
      wh.columns.toSeq == Seq("dim", "mu", "loading", "eigval"))
  }
}
