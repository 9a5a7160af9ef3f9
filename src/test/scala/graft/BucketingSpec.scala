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
    // drop any prior table AND its orphaned warehouse dir (a fresh
    // in-memory catalog won't know the table, but the dir survives)
    Seq("li_bkt", "o_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      val dir = new java.io.File(wh, t)
      if (dir.exists()) rm(dir)
    }
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
