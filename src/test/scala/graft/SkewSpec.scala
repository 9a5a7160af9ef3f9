package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 90% of fact rows on one hot key
    val fact = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 100)
        .otherwise(lit(7L)).as("k"), col("id").as("rowid"))
    val dim = (0L until 100L).map(k => (k, s"name-$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("rowid", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", "rowid", buckets = 8)
      .select("rowid", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val hot = spark.range(1000).select(lit(7L).as("k"), col("id").as("rowid"))
    val buckets = hot.select(Skew.salt(col("rowid"), 8).as("s"))
      .groupBy("s").count().collect()
    assert(buckets.length == 8, s"expected all 8 salt buckets used: ${buckets.mkString(",")}")
  }
}
