package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val li = GraftSession.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = GraftSession.table(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketing.materializeBucketed(li, "li_bkt", "l_orderkey", buckets = 8)
    Bucketing.materializeBucketed(o, "o_bkt", "o_orderkey", buckets = 8)

    val joined = Bucketing.bucketedJoin(spark, "li_bkt", "o_bkt",
      "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString

    // co-located: no hash-repartition exchange feeding the join
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // and it is the same result as the plain (shuffling) join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)
  }
}
