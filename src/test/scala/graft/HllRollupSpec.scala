package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q88's mergeable-sketch contract: union-of-daily-sketches must
  * estimate the same population as sketching the range directly, and
  * both must sit near the exact distinct count — that is what makes
  * per-day sketches a safe persistent rollup state at 100 TB.
  */
class HllRollupSpec extends AnyFunSuite {
  import SparkTestSession._

  test("weekly union-of-daily estimates track exact distinct users within 5%") {
    // q88 now carries its own exact twin + within_bounds column (the
    // r4 in-artifact-evidence ask); the spec checks a TIGHTER 5% bound
    // than the query's 10% gate filter, and that no week was filtered
    val ev = GraftSession.eventsTable(spark, sf)
    val nWeeks = ev.select(weekofyear(to_date(col("ts")))).distinct().count()
    val est = SparkEntry.queries("q88_hll_rollup")(spark, sf).collect()
    assert(est.length == nWeeks, "a week fell out of the bounds filter")
    est.foreach { r =>
      val e = r.getAs[Long]("est_users").toDouble
      val x = r.getAs[Long]("exact_users").toDouble
      assert(r.getAs[Boolean]("within_bounds"))
      assert(math.abs(e - x) / x <= 0.05,
        s"week ${r.getAs[Int]("week")}: est $e vs exact $x")
    }
  }

  test("merging daily sketches estimates like sketching the week directly") {
    val ev = GraftSession.eventsTable(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .withColumn("week", weekofyear(col("day")))
    val merged = ev
      .groupBy(col("week"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev
      .groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"))
    val both = merged.join(direct, "week").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val a = r.getAs[Long]("est").toDouble
      val b = r.getAs[Long]("est_direct").toDouble
      assert(math.abs(a - b) / math.max(b, 1.0) <= 0.01,
        s"week ${r.getAs[Int]("week")}: merged $a vs direct $b")
    }
  }
}
