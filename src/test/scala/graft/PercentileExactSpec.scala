package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** percentile_exact (primitive-map exact percentile, r14) must be
  * VALUE-identical to Spark's built-in `percentile` on double inputs —
  * the q43/q101/q167 gates ride on it. */
class PercentileExactSpec extends AnyFunSuite {
  import SparkTestSession._

  test("matches the built-in on real lineitem doubles, scalar and array") {
    val li = GraftSession.table(spark, "/root/testdata/sf0.01", "lineitem")
    val a = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_quantity, array(0.5, 0.95))").as("qp"),
      expr("percentile(l_extendedprice, 0.5)").as("p"))
    val b = li.groupBy(col("l_returnflag")).agg(
      expr("percentile_exact(l_quantity, array(0.5, 0.95))").as("qp"),
      expr("percentile_exact(l_extendedprice, 0.5)").as("p"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "percentile_exact diverged from the built-in on lineitem")
  }

  test("edge cases: nulls skipped, empty null, frequency weighting, p=0/1") {
    import spark.implicits._
    val df = Seq[(Integer, java.lang.Double)](
      (1, 1.0), (1, null), (1, 2.0), (1, 2.0), (1, 100.5),
      (2, -3.25), (2, 0.0)
    ).toDF("g", "v")
    val a = df.groupBy(col("g")).agg(
      expr("percentile(v, array(0.0, 0.3, 1.0))").as("qp"))
    val b = df.groupBy(col("g")).agg(
      expr("percentile_exact(v, array(0.0, 0.3, 1.0))").as("qp"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // all-null group -> null (nullable semantics match)
    val nulls = Seq[(Integer, java.lang.Double)]((1, null)).toDF("g", "v")
    assert(nulls.groupBy(col("g"))
      .agg(expr("percentile_exact(v, 0.5)").as("p"))
      .head().isNullAt(1))
    // explicit frequency == the same values repeated
    val freq = Seq((1.0, 3L), (2.0, 1L), (7.5, 2L)).toDF("v", "f")
    val flat = Seq(1.0, 1.0, 1.0, 2.0, 7.5, 7.5).toDF("v")
    val pf = freq.agg(expr("percentile_exact(v, array(0.25, 0.5, 0.9), f)"))
      .head().getSeq[Double](0)
    val pl = flat.agg(expr("percentile(v, array(0.25, 0.5, 0.9))"))
      .head().getSeq[Double](0)
    assert(pf == pl, s"freq-weighted $pf != flat $pl")
  }
}
