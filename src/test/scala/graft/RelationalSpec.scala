package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("driver contract integrity: no pack key collisions, oracle keys subset") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    assert(q.size >= 58, s"query map shrank (collision?): ${q.size}")
    val orphans = o.keySet -- q.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    // sketch queries have no DuckDB mirror by design (estimates, not
    // exact values) -> rows-only gate
    val weak = q.keySet -- o.keySet
    assert(weak == Set("q19_approx_distinct", "q88_hll_rollup",
      "q102_heavy_hitters"),
      s"unexpected rows-only queries: $weak")
  }

  test("every declared query has matching oracle alias coverage and runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("q01 aggregates are exact decimals cast to double") {
    val row = SparkEntry.queries("q01_agg")(spark, sf).collect().head
    assert(row.getAs[Double]("sum_qty") > 0.0)
    assert(row.getAs[Long]("count_order") > 0L)
  }

  test("q03 topk is ordered descending") {
    val prices = SparkEntry.queries("q03_topk")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q05 broadcast join plan contains BroadcastHashJoin") {
    val plan = SparkEntry.queries("q05_join_broadcast")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("q02 pushes filters into the parquet scan") {
    val plan = SparkEntry.queries("q02_filter_project")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_discount"), plan)
  }

  test("q44 grouping sets expand each row exactly twice (no cube x4)") {
    val df = SparkEntry.queries("q44_grouping_sets")(spark, sf)
    val expands = df.queryExecution.optimizedPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }
    assert(expands.nonEmpty, "grouping sets should plan an Expand")
    assert(expands.forall(_.projections.size == 2),
      s"Expand factor ${expands.map(_.projections.size)} — asked for 2 sets")
  }
}
